"""Phase 6 tests: maintenance procedures — reference :256-279 — plus
ANALYZE/SHOW STATS (:46-49)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.sources.catalog import Catalog


@pytest.fixture()
def t(spark, tmp_path, sf_dir):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_schema("demo")
    cat.use("demo")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.ctas("nation", nation)
    return cat.table("nation")


def _insert_n(t, n, start=9000):
    for i in range(n):
        t.insert([{"n_nationkey": start + i, "n_name": f"X{i}", "n_regionkey": 0}])


def test_optimize_compacts_small_files(t):
    """Reference :263: bin-pack small files; row count and content unchanged,
    file count reduced, lineage preserved."""
    _insert_n(t, 4)
    before_files = len(t.io.read_manifest(t._resolve()).data_files)
    before_rows = t.df().count()
    before_ids = {r._row_id for r in t.df(hidden=True).select("_row_id").collect()}

    snap = t.optimize(file_size_threshold=100 * 1024 * 1024)
    assert snap is not None and snap.operation == "replace"

    after_files = len(t.io.read_manifest(t._resolve()).data_files)
    assert after_files < before_files
    assert t.df().count() == before_rows
    after_ids = {r._row_id for r in t.df(hidden=True).select("_row_id").collect()}
    assert after_ids == before_ids, "optimize must preserve row lineage"


def test_optimize_where_modified_time(t):
    """Reference :267-268: scoped compaction decided on manifest metadata
    only — a future cutoff excludes every file, so nothing is rewritten."""
    _insert_n(t, 3)
    import time

    future = int(time.time() * 1000) + 10_000
    assert t.optimize(modified_after_ms=future) is None


def test_expire_snapshots(t):
    _insert_n(t, 3)
    n_snaps = len(t.meta.snapshots)
    assert n_snaps >= 4
    rows = t.df().count()
    # retention 0: everything unreachable from refs goes
    dropped = t.expire_snapshots(retention_ms=0)
    assert dropped == n_snaps - 1
    assert len(t.meta.snapshots) == 1
    assert t.df().count() == rows, "current state must survive expiry"
    # history no longer references expired snapshots
    hist_ids = {r.snapshot_id for r in t.meta_df("history").collect()}
    assert hist_ids == {t.meta.refs["main"]}


def test_remove_orphan_files(t):
    _insert_n(t, 2)
    # plant an orphan in the data dir, backdated past the retention window
    orphan = os.path.join(t.location, "data", "orphan.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    old = 10_000
    os.utime(orphan, (old, old))
    removed = t.remove_orphan_files(retention_ms=1000)
    assert removed == 1
    assert not os.path.exists(orphan)
    # live files untouched
    assert t.df().count() > 0


def test_analyze_show_stats(t):
    """Reference :48-49."""
    t.analyze()
    stats = t.show_stats()
    rows = {r.column_name: r for r in stats.collect()}
    assert rows["n_nationkey"].distinct_values_count >= 20
    assert rows["n_nationkey"].nulls_fraction == 0.0
    assert rows[None].row_count == t.df().count()
    # low/high surfaced from the parquet-footer manifest stats (:49 shows
    # min/max per column), data_size from column-chunk compressed sizes
    mn = t.df().agg(F.min("n_nationkey"), F.max("n_nationkey")).head()
    assert rows["n_nationkey"].low_value == str(mn[0])
    assert rows["n_nationkey"].high_value == str(mn[1])
    assert rows["n_name"].low_value is not None
    assert rows["n_nationkey"].data_size > 0


def test_optimize_preserves_sorted_by_clustering(spark, tmp_path, sf_dir):
    """Compaction of a sorted_by table must re-sort its output: after
    optimize(), a point lookup on the sort column still prunes to one
    file via footer min/max (the clustering the property exists for)."""
    from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
    from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
    from iceberg_trino_sql_demo_spark.sources.table import Table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
    )
    t = Table.ctas(
        spark,
        str(tmp_path / "sorted_orders"),
        orders.repartitionByRange(4, "orderkey"),
        sort_order=["orderkey"],
    )
    # fragment: several small inserts, then compact everything.  The
    # threshold is sized to a third of the table so the bin-pack emits
    # MULTIPLE output files — compaction of a sorted table range-partitions
    # on the sort key, so those files carry disjoint [min,max] ranges.
    rows = [{"orderkey": 900000 + i, "totalprice": float(i)} for i in range(6)]
    for r in rows:
        t.insert([r])
    total = sum(
        f.file_size_bytes for f in t._manifest(t._resolve("main")).data_files
    )
    t.optimize(file_size_threshold=max(1024, total // 3))

    files = t._manifest(t._resolve("main")).data_files
    assert len(files) > 1, "bin-pack should emit multiple files at this threshold"
    preds = parse_simple_predicates("orderkey = 17")
    pruned = prune_files(files, t.meta, preds)
    assert len(pruned) < len(files)
    assert t.df(where="orderkey = 17").count() == 1


def test_optimize_zorder_prunes_on_every_dimension(spark, tmp_path, sf_dir):
    """Z-order clustering rewrite: after optimize(zorder_by=[a, b]) the
    manifest pruner skips files for a narrow predicate on EITHER column —
    the property a single-column sort order cannot provide — while row
    content and lineage are invariant under the rewrite."""
    from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
    from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
    from iceberg_trino_sql_demo_spark.sources.table import Table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_extendedprice").alias("price"),
    )
    t = Table.ctas(spark, str(tmp_path / "zli"), li)
    before = sorted(
        tuple(r) for r in t.df().collect()
    )
    before_ids = {r._row_id for r in t.df(hidden=True).select("_row_id").collect()}

    files0 = t._manifest(t._resolve("main")).data_files
    total = sum(f.file_size_bytes for f in files0)
    snap = t.optimize(
        zorder_by=["partkey", "suppkey"], file_size_threshold=max(1, total // 8)
    )
    assert snap is not None and snap.operation == "replace"
    assert t.meta.properties.get("zorder-by") == "partkey,suppkey"

    files = t._manifest(t._resolve("main")).data_files
    assert len(files) >= 4, "threshold=total/8 must split into several files"

    # content + lineage invariant
    after = sorted(tuple(r) for r in t.df().collect())
    assert after == before
    after_ids = {r._row_id for r in t.df(hidden=True).select("_row_id").collect()}
    assert after_ids == before_ids

    # narrow range predicates on EACH dimension prune independently
    pk_lo = min(r[0] for r in spark.read.parquet(
        f"{sf_dir}/lineitem.parquet").select("l_partkey").collect())
    sk_lo = min(r[0] for r in spark.read.parquet(
        f"{sf_dir}/lineitem.parquet").select("l_suppkey").collect())
    kept_pk = prune_files(
        files, t.meta, parse_simple_predicates(f"partkey <= {pk_lo}"))
    kept_sk = prune_files(
        files, t.meta, parse_simple_predicates(f"suppkey <= {sk_lo}"))
    assert len(kept_pk) < len(files), "partkey predicate must skip files"
    assert len(kept_sk) < len(files), "suppkey predicate must skip files"
    # and the box predicate composes both prunes
    kept_box = prune_files(
        files,
        t.meta,
        parse_simple_predicates(f"partkey <= {pk_lo} AND suppkey <= {sk_lo}"),
    )
    assert len(kept_box) <= min(len(kept_pk), len(kept_sk))
    # results on the pruned read stay correct
    assert (
        t.df(where=f"partkey <= {pk_lo}").count()
        == spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_partkey") <= pk_lo)
        .count()
    )


def test_optimize_zorder_guards(spark, tmp_path, sf_dir):
    """Unknown and non-linear column types are rejected loudly."""
    from iceberg_trino_sql_demo_spark.sources.table import Table

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    t = Table.ctas(spark, str(tmp_path / "zn"), n)
    with pytest.raises(ValueError, match="not in schema"):
        t.optimize(zorder_by=["nope"])
    with pytest.raises(ValueError, match="linear scale"):
        t.optimize(zorder_by=["n_name"])


def test_optimize_zorder_partitioned_table(spark, tmp_path, sf_dir):
    """Partitioned tables z-order WITHIN each hidden partition: partition
    dirs survive, content and lineage are invariant, and a z-dimension
    predicate prunes files inside the partitions."""
    from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
    from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
    from iceberg_trino_sql_demo_spark.sources.table import Table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_extendedprice").alias("price"),
    )
    t = Table.ctas(
        spark, str(tmp_path / "zpart"), li, partitioning=["returnflag"]
    )
    before = sorted(tuple(r) for r in t.df().collect())
    files0 = t._manifest(t._resolve("main")).data_files
    total = sum(f.file_size_bytes for f in files0)
    snap = t.optimize(
        zorder_by=["partkey", "suppkey"], file_size_threshold=max(1, total // 12)
    )
    assert snap is not None
    files = t._manifest(t._resolve("main")).data_files
    assert len(files) >= 6
    # every file belongs to exactly one partition value
    parts = {f"{f.partition}" for f in files}
    flags = {r[0] for r in li.select("returnflag").distinct().collect()}
    assert len(parts) == len(flags)
    # content invariant
    assert sorted(tuple(r) for r in t.df().collect()) == before
    # a z-dimension predicate prunes within partitions...
    pk_lo = li.agg(F.min("partkey")).first()[0]
    kept = prune_files(files, t.meta, parse_simple_predicates(f"partkey <= {pk_lo}"))
    assert len(kept) < len(files)
    # ...and composes with partition pruning
    kept_both = prune_files(
        files, t.meta,
        parse_simple_predicates(f"returnflag = 'R' AND partkey <= {pk_lo}"),
    )
    assert len(kept_both) <= len(kept)
    assert (
        t.df(where=f"partkey <= {pk_lo}").count()
        == li.where(F.col("partkey") <= pk_lo).count()
    )


def test_branch_scoped_retention_min_keep(t):
    """VERDICT r4 #8: a dev branch carrying min_snapshots_to_keep pins its
    newest N ancestors through a retention-0 main-side expire; snapshots
    outside every window still go, and clearing the override restores the
    global head-only behavior."""
    _insert_n(t, 1)               # s2 (s1 = ctas seed)
    t.create_branch("dev")
    t.insert([{"n_nationkey": 9500, "n_name": "D0", "n_regionkey": 1}], ref="dev")  # s3
    t.insert([{"n_nationkey": 9501, "n_name": "D1", "n_regionkey": 1}], ref="dev")  # s4
    snaps = [s.snapshot_id for s in t.meta.snapshots]
    assert len(snaps) == 4
    s1, s2, s3, s4 = snaps
    dev_rows = t.df(ref="dev").count()

    t.set_branch_retention("dev", min_snapshots_to_keep=3)
    dropped = t.expire_snapshots(retention_ms=0)
    # kept: main head s2, dev head s4 + 2 ancestors (s3 and s2); dropped: s1
    assert dropped == 1
    remaining = {s.snapshot_id for s in t.meta.snapshots}
    assert remaining == {s2, s3, s4}
    # dev history is still time-travelable within its window
    assert t.df(version=s3).count() == dev_rows - 1
    assert t.df(ref="dev").count() == dev_rows
    # ice_expire semantics unchanged for main: current state survives
    assert t.df().count() > 0

    # clearing the override: global behavior drops the now-unpinned ancestor
    t.set_branch_retention("dev", None, None)
    assert t.expire_snapshots(retention_ms=0) == 1  # s3 goes (s2 is main head)
    assert {s.snapshot_id for s in t.meta.snapshots} == {s2, s4}


def test_branch_scoped_retention_max_age(t):
    """An age window on the branch keeps every young ancestor (all of them,
    in a fresh-built table) even under global retention 0 — and survives a
    metadata round-trip (persisted in ref_retention, not session state)."""
    from iceberg_trino_sql_demo_spark.sources.table import Table

    _insert_n(t, 2)
    t.create_branch("dev")
    t.insert([{"n_nationkey": 9600, "n_name": "E0", "n_regionkey": 2}], ref="dev")
    t.set_branch_retention("dev", max_snapshot_age_ms=3_600_000)
    # reload from disk: the override must be durable metadata
    t2 = Table(t.spark, t.location)
    assert t2.meta.ref_retention["dev"] == {"max_snapshot_age_ms": 3_600_000}
    # every snapshot is an ancestor of dev's head and younger than 1h
    assert t2.expire_snapshots(retention_ms=0) == 0
    assert len(t2.meta.snapshots) == len(t.refresh().meta.snapshots)


# -- add_files adoption ------------------------------------------------------

def test_add_files_adopts_in_place(spark, tmp_path, sf_dir, t):
    """Adopted parquet is referenced at its ORIGINAL path (no copy), its
    rows are readable with harvested stats, and lineage ranges assign."""
    staging = str(tmp_path / "staged")
    spark.createDataFrame(
        [(9100, "ADOPT_A", 1), (9101, "ADOPT_B", 2)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ).coalesce(1).write.parquet(staging)

    before = t.df().count()
    snap = t.add_files(staging)
    assert snap.summary["adopted"] == "true"

    man = t.io.read_manifest(t._resolve())
    adopted = [f for f in man.data_files if f.path.startswith(staging)]
    assert adopted, "manifest must point at the staged paths (no copy)"
    assert all(f.record_count > 0 for f in adopted)
    assert all(f.first_row_id >= 0 for f in adopted)  # lineage assigned
    # harvested min/max present for the key column of adopted files
    keyid = str(t.meta.schema.field_by_name("n_nationkey").id)
    assert all(f.stats[keyid]["min"] == 9100 for f in adopted)

    after = t.df()
    assert after.count() == before + 2
    assert after.where(F.col("n_name") == "ADOPT_A").count() == 1


def test_add_files_guards(spark, tmp_path, sf_dir, t):
    # missing column is loud
    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [(9200,)], "n_nationkey bigint"
    ).coalesce(1).write.parquet(bad)
    with pytest.raises(ValueError, match="lacks schema columns"):
        t.add_files(bad)
    # partitioned tables refuse (v1)
    t.set_partitioning(["n_regionkey"])
    ok = str(tmp_path / "ok")
    spark.createDataFrame(
        [(9201, "X", 1)], "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).coalesce(1).write.parquet(ok)
    with pytest.raises(ValueError, match="unpartitioned"):
        t.add_files(ok)


def test_add_files_via_frontend_call(spark, tmp_path, sf_dir):
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh2"))
    eng.sql("CREATE SCHEMA adopt")
    eng.sql("USE adopt")
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation_src")
    eng.sql("CREATE TABLE nat AS SELECT * FROM nation_src")
    staging = str(tmp_path / "staged2")
    spark.createDataFrame(
        [(9300, "CALLED", 0)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    ).coalesce(1).write.parquet(staging)
    n0 = eng.sql("SELECT count(*) AS n FROM nat").collect()[0].n
    eng.sql(
        "CALL system.add_files(schema_name => 'adopt', table_name => 'nat', "
        f"source_dir => '{staging}')"
    )
    assert eng.sql("SELECT count(*) AS n FROM nat").collect()[0].n == n0 + 1


def test_forget_user_purges_disk(spark, tmp_path, sf_dir, t):
    """MoR delete -> optimize(rewrite_deletes) -> expire(0): the deleted
    key must be absent from EVERY parquet byte on disk, not just the read
    view, and the fully-applied delete files must leave the manifest."""
    import pyarrow.parquet as pq

    _insert_n(t, 3)  # keys 9000..9002
    t.delete("n_nationkey = 9001")
    man = t.io.read_manifest(t._resolve())
    assert man.delete_files, "precondition: MoR delete produced a vector"

    t.optimize(rewrite_deletes=True)
    man = t.io.read_manifest(t._resolve())
    assert not man.delete_files, "rewrite must materialize the deletes"

    t.expire_snapshots(retention_ms=0)
    # read view correct
    assert t.df().where(F.col("n_nationkey") == 9001).count() == 0
    assert t.df().where(F.col("n_nationkey") == 9000).count() == 1
    # and the bytes are gone: scan every surviving parquet file
    for root, _dirs, files in os.walk(os.path.join(t.location, "data")):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            tbl = pq.read_table(os.path.join(root, fn))
            cols = [c.split(".")[0] for c in tbl.column_names]
            if "n_nationkey" in cols:
                vals = tbl.column(cols.index("n_nationkey")).to_pylist()
                assert 9001 not in vals, f"purged key survives in {fn}"


def test_optimize_partition_scoped(spark, tmp_path, sf_dir):
    """ALTER TABLE t EXECUTE optimize WHERE <identity partition> = 'X':
    only the named partition compacts; every other partition's files are
    byte-identical (same paths); content unchanged."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE SCHEMA po")
    eng.sql("USE po")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cust.createOrReplaceTempView("cust_src")
    eng.sql("CREATE TABLE pc WITH (partitioning = ARRAY['c_mktsegment']) "
            "AS SELECT c_custkey, c_name, c_mktsegment FROM cust_src")
    t = eng.catalog.table("pc")
    # small-file inserts into two partitions
    for i in range(3):
        t.insert([{"c_custkey": 90000 + i, "c_name": f"A{i}",
                   "c_mktsegment": "AUTOMOBILE"}])
        t.insert([{"c_custkey": 91000 + i, "c_name": f"B{i}",
                   "c_mktsegment": "BUILDING"}])
    before = {f.path: f.partition for f in t.io.read_manifest(t._resolve()).data_files}
    n_before = t.df().count()
    seg = lambda fs, s: {p for p, part in fs.items() if part.get("c_mktsegment") == s}

    eng.sql("ALTER TABLE pc EXECUTE optimize WHERE c_mktsegment = 'AUTOMOBILE'")
    t = eng.catalog.table("pc")
    after = {f.path: f.partition for f in t.io.read_manifest(t._resolve()).data_files}
    # AUTOMOBILE compacted: fewer files, different paths
    assert len(seg(after, "AUTOMOBILE")) < len(seg(before, "AUTOMOBILE"))
    # every other partition untouched, path-for-path
    for s in ("BUILDING", "MACHINERY", "HOUSEHOLD", "FURNITURE"):
        assert seg(after, s) == seg(before, s), s
    assert t.df().count() == n_before
    # unknown / transform columns are loud
    with pytest.raises(ValueError, match="identity"):
        t.optimize(partition_filter={"c_name": "x"})


# ---------------------------------------------------------------------------
# cherry-pick / zero-copy clone / branch diff (round 5 sixth batch)
# ---------------------------------------------------------------------------


def test_cherrypick_shares_files_and_skips_rest(t):
    t.create_branch("dev")
    picked = t.insert([{"n_nationkey": 9100, "n_name": "PICK", "n_regionkey": 0}],
                      ref="dev")
    t.insert([{"n_nationkey": 9101, "n_name": "SKIP", "n_regionkey": 0}], ref="dev")
    base_rows = t.df().count()
    t.cherrypick(picked.snapshot_id)
    names = {r.n_name for r in t.df().collect()}
    assert "PICK" in names and "SKIP" not in names
    assert t.df().count() == base_rows + 1
    # zero-copy: the picked snapshot's added file path is literally shared
    dev_paths = {f.path for f in t.io.read_manifest(t._resolve("dev")).data_files}
    main_paths = {f.path for f in t.io.read_manifest(t._resolve()).data_files}
    picked_paths = {
        f.path for f in t.io.read_manifest(picked).data_files
    } - {f.path for f in t.io.read_manifest(
        t.meta.snapshot_by_id(picked.parent_id)).data_files}
    assert picked_paths and picked_paths <= main_paths and picked_paths <= dev_paths


def test_cherrypick_guards(t):
    t.create_branch("dev")
    s = t.insert([{"n_nationkey": 9200, "n_name": "A", "n_regionkey": 0}], ref="dev")
    # delete-file delta is not cherry-pickable
    d = t.delete("n_nationkey = 9200", ref="dev")
    with pytest.raises(ValueError, match="delete-file delta"):
        t.cherrypick(d.snapshot_id)
    # double-pick is rejected (added files already live on target)
    t.cherrypick(s.snapshot_id)
    with pytest.raises(ValueError, match="already"):
        t.cherrypick(s.snapshot_id)


def test_clone_is_zero_copy_and_isolated(t, tmp_path):
    import glob

    src_rows = t.df().count()
    c = t.clone(str(tmp_path / "clone"))
    # zero-copy: no parquet bytes under the clone's own data dir yet
    assert not glob.glob(str(tmp_path / "clone" / "data" / "**" / "*.parquet"),
                         recursive=True)
    clone_paths = {f.path for f in c.io.read_manifest(c._resolve()).data_files}
    src_paths = {f.path for f in t.io.read_manifest(t._resolve()).data_files}
    assert clone_paths == src_paths
    # divergence is invisible cross-table
    c.insert([{"n_nationkey": 9300, "n_name": "CLONEROW", "n_regionkey": 1}])
    t.insert([{"n_nationkey": 9301, "n_name": "SRCROW", "n_regionkey": 1}])
    assert c.df().count() == src_rows + 1
    assert t.refresh().df().count() == src_rows + 1
    assert {r.n_name for r in c.df().collect()} - {r.n_name for r in t.df().collect()} == {"CLONEROW"}


def test_clone_expire_never_reaps_source_files(t, tmp_path):
    c = t.clone(str(tmp_path / "clone"))
    # churn the clone so its history has droppable snapshots, then expire
    # everything: gc_scope=own_location must leave source-owned bytes alone
    c.insert([{"n_nationkey": 9400, "n_name": "X", "n_regionkey": 1}])
    c.truncate()
    c.insert([{"n_nationkey": 9401, "n_name": "Y", "n_regionkey": 1}])
    src_paths = {f.path for f in t.io.read_manifest(t._resolve()).data_files}
    c.expire_snapshots(retention_ms=0)
    for p in src_paths:
        assert os.path.exists(p), "clone expire deleted a source-owned file"
    assert t.df().count() > 0


def test_branch_diff_cancels_shared_files(t):
    base_paths = {f.path for f in t.io.read_manifest(t._resolve()).data_files}
    t.create_branch("dev")
    t.insert([{"n_nationkey": 9500, "n_name": "DEVROW", "n_regionkey": 2}],
             ref="dev")
    d = t.branch_diff("main", "dev")
    rows = d.collect()
    assert {(r.side, r.n_name) for r in rows} == {("right", "DEVROW")}
    # manifest-first cancellation: the untouched shared base files are not
    # in the diff's scan set
    scanned = set(d.inputFiles())
    assert not (scanned & {p for p in base_paths})


def test_branch_diff_multiset_counts(t):
    t.create_branch("dev")
    row = {"n_nationkey": 9600, "n_name": "DUP", "n_regionkey": 2}
    t.insert([row], ref="dev")
    t.insert([row], ref="dev")  # identical row twice -> n_copies = 2
    d = t.branch_diff("main", "dev").collect()
    assert len(d) == 1 and d[0].side == "right" and d[0].n_copies == 2


def test_cherrypick_and_snapshot_via_frontend(spark, tmp_path, sf_dir):
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh3"))
    eng.sql("CREATE SCHEMA pick")
    eng.sql("USE pick")
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "nation_src3"
    )
    eng.sql("CREATE TABLE nat AS SELECT * FROM nation_src3")
    eng.sql("CREATE BRANCH dev IN TABLE nat")
    eng.sql("INSERT INTO nat @ dev(n_nationkey, n_name, n_regionkey) "
            "VALUES (9700, 'PICKME', 0)")
    n0 = eng.sql("SELECT count(*) AS n FROM nat").collect()[0].n
    t = eng.catalog.table("nat")
    sid = t.refresh().meta.refs["dev"]
    eng.sql(f"CALL system.cherrypick_snapshot('pick', 'nat', {sid})")
    assert eng.sql("SELECT count(*) AS n FROM nat").collect()[0].n == n0 + 1
    # zero-copy clone through CALL system.snapshot, then diverge the clone
    loc = str(tmp_path / "nat_clone")
    eng.sql(
        "CALL system.snapshot(schema_name => 'pick', source_table => 'nat', "
        f"table_name => 'nat_clone', table_location => '{loc}')"
    )
    assert eng.sql("SELECT count(*) AS n FROM nat_clone").collect()[0].n == n0 + 1
    eng.sql("INSERT INTO nat_clone(n_nationkey, n_name, n_regionkey) "
            "VALUES (9701, 'CLONESIDE', 1)")
    assert eng.sql("SELECT count(*) AS n FROM nat_clone").collect()[0].n == n0 + 2
    assert eng.sql("SELECT count(*) AS n FROM nat").collect()[0].n == n0 + 1


# ---------------------------------------------------------------------------
# deletion vectors (rewrite_position_deletes)
# ---------------------------------------------------------------------------


@pytest.fixture()
def mor(spark, tmp_path, sf_dir):
    cat = Catalog(spark, str(tmp_path / "whdv"))
    cat.create_schema("dv")
    cat.use("dv")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cat.ctas("cust", cust, properties={"merge_mode": "merge-on-read"})
    return cat.table("cust")


def test_dv_consolidation_preserves_state_and_history(mor):
    """K MoR delete commits -> one content='dv' entry; reads identical,
    time travel across the (data-invariant) consolidation exact, a fresh
    post-consolidation delete applies alongside the DV, and a second
    consolidation folds it in."""
    t = mor
    for k in (5, 17, 29, 41):
        t.delete(f"c_custkey = {k}")
    t.update({"c_acctbal": "0.0"}, "c_custkey = 8")
    man = t.io.read_manifest(t._resolve())
    assert len([d for d in man.delete_files if d.content == "position"]) >= 5
    pre = t.meta.refs["main"]
    before = sorted(tuple(r) for r in t.df().collect())

    assert t.rewrite_position_deletes() is not None
    man = t.io.read_manifest(t._resolve())
    assert [d.content for d in man.delete_files] == ["dv"]
    assert sorted(tuple(r) for r in t.df().collect()) == before
    assert sorted(tuple(r) for r in t.df(version=pre).collect()) == before
    # idempotent
    assert t.rewrite_position_deletes() is None

    t.delete("c_custkey = 53")
    mid = sorted(tuple(r) for r in t.df().collect())
    assert len(mid) == len(before) - 1
    assert sorted(d.content for d in
                  t.io.read_manifest(t._resolve()).delete_files) == [
        "dv", "position"]
    assert t.rewrite_position_deletes() is not None
    man = t.io.read_manifest(t._resolve())
    assert [d.content for d in man.delete_files] == ["dv"]
    assert sorted(tuple(r) for r in t.df().collect()) == mid


def test_dv_artifacts_survive_expiry_sweeps(mor):
    """expire_snapshots + remove_orphan_files must treat the DV pack AND
    its index parquet as referenced."""
    t = mor
    t.delete("c_custkey = 5")
    t.delete("c_custkey = 17")
    t.rewrite_position_deletes()
    dv = [d for d in t.io.read_manifest(t._resolve()).delete_files
          if d.content == "dv"][0]
    before = sorted(tuple(r) for r in t.df().collect())
    assert t.expire_snapshots(retention_ms=0) > 0
    t.refresh()
    assert t.remove_orphan_files(retention_ms=0) >= 0
    assert os.path.exists(dv.path) and os.path.exists(dv.index_path)
    t.refresh()
    assert sorted(tuple(r) for r in t.df().collect()) == before


def test_dv_consolidation_is_cdc_invisible(mor):
    """table_changes across the consolidation window emits only the real
    row-level changes, nothing for the data-invariant rewrite commit."""
    t = mor
    s0 = t.meta.refs["main"]
    t.delete("c_custkey = 5")
    t.rewrite_position_deletes()
    t.delete("c_custkey = 17")
    end = t.meta.refs["main"]
    ch = t.table_changes(s0, end)
    rows = ch.select("c_custkey", "_change_type").collect()
    assert sorted((r.c_custkey, r._change_type) for r in rows) == [
        (5, "delete"), (17, "delete")]


def test_dv_drops_tombstones_of_dead_files(mor):
    """Tombstones referencing data files a rewrite replaced are inert —
    consolidation must not resurrect or retain them."""
    t = mor
    t.delete("c_custkey = 5")
    # compact everything: the delete-referenced file is rewritten, the
    # position delete becomes garbage
    t.optimize(file_size_threshold=1 << 40, rewrite_deletes=True)
    man = t.io.read_manifest(t._resolve())
    before = sorted(tuple(r) for r in t.df().collect())
    t.delete("c_custkey = 17")
    t.rewrite_position_deletes()
    man = t.io.read_manifest(t._resolve())
    dvs = [d for d in man.delete_files if d.content == "dv"]
    assert len(dvs) == 1 and dvs[0].record_count == 1
    assert sorted(tuple(r) for r in t.df().collect()) == [
        r for r in before if r[0] != 17]


def test_rewrite_position_deletes_via_frontend(spark, tmp_path, sf_dir):
    """ALTER TABLE ... EXECUTE rewrite_position_deletes through Engine.sql."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whsql"))
    eng.sql("CREATE SCHEMA demo")
    eng.sql("USE demo")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cust.createOrReplaceTempView("cust_src")
    eng.sql(
        "CREATE TABLE cust WITH (merge_mode = 'merge-on-read') AS "
        "SELECT * FROM cust_src"
    )
    eng.sql("DELETE FROM cust WHERE c_custkey = 5")
    eng.sql("DELETE FROM cust WHERE c_custkey = 17")
    before = sorted(tuple(r) for r in eng.sql("SELECT * FROM cust").collect())
    eng.sql("ALTER TABLE cust EXECUTE rewrite_position_deletes")
    t = eng.catalog.table("cust")
    assert [d.content for d in t.io.read_manifest(t._resolve()).delete_files] \
        == ["dv"]
    assert sorted(tuple(r) for r in eng.sql("SELECT * FROM cust").collect()) \
        == before


# ---------------------------------------------------------------------------
# spilled history (bounded metadata.json)
# ---------------------------------------------------------------------------


def test_history_spill_keeps_semantics(spark, tmp_path, sf_dir, monkeypatch):
    """With all-but-the-tail history spilled to snaplog-* archives, time
    travel, $snapshots/$history/$metadata_log_entries, expiry, and orphan
    sweeps behave exactly as with inline history."""
    from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

    monkeypatch.setattr(MetadataIO, "HISTORY_KEEP", 5)
    monkeypatch.setattr(MetadataIO, "HISTORY_CHUNK", 5)
    cat = Catalog(spark, str(tmp_path / "whspill"))
    cat.create_schema("sp")
    cat.use("sp")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.ctas("n", nation.limit(2))
    t = cat.table("n")
    early = t.meta.refs["main"]
    for i in range(24):
        t.insert([{"n_nationkey": 900 + i, "n_name": f"S{i}", "n_regionkey": 0}])
    assert t.meta.snapshot_archives, "expected spilled archives"
    assert len(t.meta.snapshots) <= 10
    # the pointer file carries only the tail
    import json as _json

    with open(t.io.metadata_file(t.io.current_version())) as fh:
        doc = _json.load(fh)
    assert len(doc["snapshots"]) == len(t.meta.snapshots)

    # archived-range time travel from a FRESH handle (no warm caches)
    fresh = cat.table("n")
    assert fresh.df(version=early).count() == 2
    assert fresh.meta_df("snapshots").count() == 25
    assert fresh.meta_df("history").count() == 25
    # one metadata version per commit PLUS the table-creation version
    assert fresh.meta_df("metadata_log_entries").count() == 26
    assert len(fresh.meta.all_snapshots()) == 25

    # expiry sees the full history (drops archived snapshots too)
    dropped = fresh.expire_snapshots(retention_ms=0)
    assert dropped == 24
    fresh.refresh()
    assert len(fresh.meta.all_snapshots()) == 1
    assert fresh.df().count() == 26
    # detached archives are sweepable; reads stay intact
    fresh.remove_orphan_files(retention_ms=0)
    fresh.refresh()
    assert fresh.df().count() == 26


def test_orphan_sweep_preserves_live_archives(spark, tmp_path, sf_dir, monkeypatch):
    """remove_orphan_files on a table with LIVE snapshot archives (no prior
    expire) must keep every archived snapshot's snap-*.json / seg-*.parquet:
    those snapshots stay reachable via time travel and the $snapshots /
    $files meta tables, so sweeping them would corrupt the archived range."""
    from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

    monkeypatch.setattr(MetadataIO, "HISTORY_KEEP", 5)
    monkeypatch.setattr(MetadataIO, "HISTORY_CHUNK", 5)
    cat = Catalog(spark, str(tmp_path / "wharch"))
    cat.create_schema("ar")
    cat.use("ar")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.ctas("n", nation.limit(2))
    t = cat.table("n")
    early = t.meta.refs["main"]
    for i in range(24):
        t.insert([{"n_nationkey": 700 + i, "n_name": f"A{i}", "n_regionkey": 0}])
    assert t.meta.snapshot_archives, "expected spilled archives"
    # sweep with zero retention while the archives are LIVE
    t.remove_orphan_files(retention_ms=0)
    # archived-range reads from a FRESH handle must still work
    fresh = cat.table("n")
    assert fresh.df(version=early).count() == 2
    assert fresh.meta_df("snapshots").count() == 25
    mid = fresh.meta.all_snapshots()[10].snapshot_id
    assert fresh.df(version=mid).count() > 0


def test_history_spill_stream_watermark_survives(spark, tmp_path, sf_dir, monkeypatch):
    """The exactly-once sink's (stream, batch) watermark lives in snapshot
    summaries; once those snapshots spill, re-delivered batches must STILL
    be dropped (a lost watermark would double-apply)."""
    from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO
    from iceberg_trino_sql_demo_spark.streaming.ingest import table_sink

    monkeypatch.setattr(MetadataIO, "HISTORY_KEEP", 3)
    monkeypatch.setattr(MetadataIO, "HISTORY_CHUNK", 3)
    cat = Catalog(spark, str(tmp_path / "whwm"))
    cat.create_schema("wm")
    cat.use("wm")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.ctas("n", nation.limit(1))
    t = cat.table("n")
    sink = table_sink(t, "s1")
    batch = spark.createDataFrame(
        [(990, "W", 0)], "n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    sink(batch, 7)
    for i in range(10):  # push the watermark snapshot into the archive
        t.refresh()
        t.insert([{"n_nationkey": 800 + i, "n_name": f"F{i}", "n_regionkey": 0}])
    t.refresh()
    assert t.meta.snapshot_archives
    n_before = t.df().count()
    sink(batch, 7)  # re-delivery of an ARCHIVED batch: must be a no-op
    t.refresh()
    assert t.df().count() == n_before
