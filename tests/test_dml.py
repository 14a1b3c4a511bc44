"""Phase 4-5 tests: row-level DML, row lineage, time travel, rollback,
branching, CDC — replaying the reference script's scenario sequence
(/root/reference/iceberg_trino_sqldemo.sql :99-157 and :211-253) against
both merge modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.sources.catalog import Catalog

ROWS = [
    {"custkey": 2001, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
     "account_balance": 1.0, "nation": "FRANCE"},
    {"custkey": 2002, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
     "account_balance": 2.0, "nation": "FRANCE"},
    {"custkey": 2003, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
     "account_balance": 3.0, "nation": "FRANCE"},
]


@pytest.fixture(scope="module", params=["merge-on-read", "copy-on-write"])
def t(request, spark, tmp_path_factory, sf_dir):
    """The demo customer table seeded like :19-40, in both merge modes."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat = Catalog(spark, str(tmp_path_factory.mktemp(f"wh_{request.param}")))
    cat.create_schema("demo")
    cat.use("demo")
    cat.ctas(
        "customer",
        customer_pipeline(spark, sf_dir),
        partitioning=["mktsegment"],
        properties={"merge_mode": request.param},
    )
    return cat.table("customer")


def test_full_dml_scenario(t):
    base = t.df().count()

    # :103-106 INSERT 3 rows
    t.insert(ROWS)
    assert t.df().count() == base + 3

    # :129 UPDATE ... SET account_balance = 1000 WHERE custkey = 2001
    t.update({"account_balance": 1000.0}, "custkey = 2001")
    got = {r.custkey: r.account_balance for r in t.df(where="mktsegment='SQLENGINE'").collect()}
    assert got == {2001: 1000.0, 2002: 2.0, 2003: 3.0}
    assert t.df().count() == base + 3

    # :133-135 row lineage: updated row keeps _row_id, bumps last-updated seq
    h = {r.custkey: r for r in t.df(hidden=True).where("mktsegment='SQLENGINE'").collect()}
    assert h[2001]["_last_updated_sequence_number"] > h[2002]["_last_updated_sequence_number"]
    n = t.df(hidden=True).count()
    assert t.df(hidden=True).select("_row_id").distinct().count() == n

    # remember pre-delete snapshot for time travel
    pre_delete = t.meta.refs["main"]

    # :137 DELETE WHERE custkey IN (2001,2002,2003)
    t.delete("custkey IN (2001, 2002, 2003)")
    assert t.df().count() == base
    assert t.df(where="mktsegment='SQLENGINE'").count() == 0

    # :143 deletion vectors visible in $files for merge-on-read
    files = t.meta_df("files").collect()
    if t.merge_mode == "merge-on-read":
        assert any(r.content == 1 for r in files)

    # :216 time travel sees pre-delete state
    assert t.df(version=pre_delete).count() == base + 3

    # :218 rollback, then current state is pre-delete again
    t.rollback_to_snapshot(pre_delete)
    assert t.df().count() == base + 3
    # rollback adds a history entry but no new snapshot
    hist = t.meta_df("history").collect()
    assert hist[-1].snapshot_id == pre_delete


def test_branch_scenario(t):
    """Reference :224-253: diverge dev from main, DML on dev only, compare,
    then fast-forward main to dev."""
    # :228-230 reset segment content on main
    t.delete("mktsegment='SQLENGINE'")
    t.insert([{"custkey": 200000, "name": "TRINO", "mktsegment": "SQLENGINE",
               "account_balance": 10000.0, "nation": "FRANCE"}])
    t.insert([{"custkey": 200001, "name": "STARBURST", "mktsegment": "SQLENGINE",
               "account_balance": 10000.0, "nation": "FRANCE"}])

    # :234-236 branch management
    t.drop_branch("dev", if_exists=True)
    t.create_branch("dev")
    assert set(t.branches()) == {"main", "dev"}

    # :238-241 DML on dev only
    t.insert([{"custkey": 200005, "name": "SPARK", "mktsegment": "SQLENGINE",
               "account_balance": 1.0, "nation": "ITALY"}], ref="dev")
    t.insert([{"custkey": 200006, "name": "CLICKHOUSE", "mktsegment": "SQLENGINE",
               "account_balance": 2.0, "nation": "SPAIN"}], ref="dev")
    t.delete("custkey = 200001", ref="dev")
    t.update({"account_balance": 0.0}, "custkey = 200000", ref="dev")

    seg = "mktsegment='SQLENGINE'"
    dev = {r.custkey: r.account_balance for r in t.df(ref="dev", where=seg).collect()}
    main = {r.custkey: r.account_balance for r in t.df(ref="main", where=seg).collect()}
    # :243 dev state
    assert dev == {200000: 0.0, 200005: 1.0, 200006: 2.0}
    # :245 main unchanged
    assert main == {200000: 10000.0, 200001: 10000.0}

    # :249 fast-forward main to dev
    t.fast_forward("main", "dev")
    main2 = {r.custkey: r.account_balance for r in t.df(where=seg).collect()}
    assert main2 == dev


def test_merge_upsert(t):
    """Reference :146-157 MERGE shape: matched-and-changed -> update,
    not-matched -> insert."""
    spark = t.spark
    seg = t.df(where="mktsegment='SQLENGINE'")
    base_all = t.df().count()

    src = spark.createDataFrame(
        [
            (200000, "TRINO-NEW", "SQLENGINE", 42.0, "FRANCE"),   # matched, name differs
            (900001, "DUCKDB", "SQLENGINE", 7.0, "GERMANY"),      # not matched -> insert
        ],
        "custkey bigint, name string, mktsegment string, account_balance double, nation string",
    )
    t.merge(
        src,
        on="custkey",
        matched_set={"name": "__src_name", "account_balance": "__src_account_balance"},
        matched_condition="name != __src_name",
    )
    got = {r.custkey: (r.name, r.account_balance)
           for r in t.df(where="mktsegment='SQLENGINE'").collect()}
    assert got[200000] == ("TRINO-NEW", 42.0)
    assert got[900001] == ("DUCKDB", 7.0)
    assert t.df().count() == base_all + 1


def test_merge_into_branch(t):
    """merge(ref=...) targets a branch like every other DML (M5 symmetry,
    VERDICT r2 "What's wrong" #4): the branch carries the upsert, main is
    byte-identical to its pre-merge state."""
    spark = t.spark
    any_key = t.df().select("custkey").orderBy("custkey").head()[0]
    before_main = {(r.custkey, r.name, r.account_balance) for r in t.df().collect()}
    t.create_branch("devm")
    src = spark.createDataFrame(
        [
            (any_key, "BRANCHED", "SQLENGINE", 42.5, "FRANCE"),   # matched
            (900002, "DUCKDB", "SQLENGINE", 7.0, "GERMANY"),      # not matched
        ],
        "custkey bigint, name string, mktsegment string, account_balance double, nation string",
    )
    t.merge(
        src,
        on="custkey",
        matched_set={"name": "__src_name", "account_balance": "__src_account_balance"},
        ref="devm",
    )
    dev = {r.custkey: (r.name, r.account_balance) for r in t.df(ref="devm").collect()}
    assert dev[any_key] == ("BRANCHED", 42.5)
    assert dev[900002] == ("DUCKDB", 7.0)
    after_main = {(r.custkey, r.name, r.account_balance) for r in t.df().collect()}
    assert after_main == before_main


def test_table_changes_cdc(t):
    """Reference :110-125: row-level diff between snapshots."""
    start = t.meta.refs["main"]
    t.insert([{"custkey": 555001, "name": "CDC_A", "mktsegment": "SQLENGINE",
               "account_balance": 1.0, "nation": "FRANCE"}])
    t.insert([{"custkey": 555002, "name": "CDC_B", "mktsegment": "SQLENGINE",
               "account_balance": 2.0, "nation": "FRANCE"}])
    t.delete("custkey = 555001")
    end = t.meta.refs["main"]

    ch = t.table_changes(start, end).orderBy("_change_ordinal")
    rows = [(r.custkey, r._change_type, r._change_ordinal) for r in ch.collect()
            if r.custkey in (555001, 555002)]
    assert (555001, "insert", 0) in rows
    assert (555002, "insert", 1) in rows
    assert (555001, "delete", 2) in rows
    # ordinals are contiguous commit indexes
    assert {r[2] for r in rows} == {0, 1, 2}


def test_merge_large_source_never_collects_keys(spark, tmp_path, sf_dir):
    """MERGE planning must stay distributed: with a 100k-row source, nothing
    data-sized may be collect()ed to the driver (only file paths, which are
    manifest-cardinality).  Guards against the isin(key-list) regression."""
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is an
    # abstract base in Spark 4 whose collect the classic session overrides)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older pyspark
        from pyspark.sql import DataFrame

    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
    from iceberg_trino_sql_demo_spark.sources.table import Table

    t = Table.ctas(
        spark,
        str(tmp_path / "merge_big"),
        customer_pipeline(spark, sf_dir),
        partitioning=["mktsegment"],
        properties={"merge_mode": "copy-on-write"},
    )
    n_files = len(t._manifest(t._resolve("main")).data_files)

    src = spark.range(100_000).select(
        (F.col("id") + 1_000_000).alias("custkey"),
        F.concat(F.lit("BULK_"), F.col("id")).alias("name"),
        F.lit("SQLENGINE").alias("mktsegment"),
        F.lit(1.0).alias("account_balance"),
        F.lit("FRANCE").alias("nation"),
    )

    collected_sizes: list[int] = []
    orig_collect = DataFrame.collect

    def spy_collect(self):
        out = orig_collect(self)
        collected_sizes.append(len(out))
        return out

    DataFrame.collect = spy_collect
    try:
        t.merge(src, on="custkey", matched_set={"account_balance": "__src_account_balance"})
    finally:
        DataFrame.collect = orig_collect

    # every driver round-trip during MERGE is bounded: manifest-sized
    # (file paths) or the HARD-CAPPED runtime-filter key probe (LIMIT
    # _MERGE_RF_MAX_KEYS+1 rows — the probe that proves the source is NOT
    # small and disables pruning); never source-sized
    from iceberg_trino_sql_demo_spark.sources.table import Table as _T

    cap = _T._MERGE_RF_MAX_KEYS + 1
    assert collected_sizes, "expected at least the affected-file probe"
    assert all(
        n <= max(n_files, 16) or n == cap for n in collected_sizes
    ), collected_sizes
    assert t.df().count() == 100_000 + t.df(where="custkey < 1000000").count()


def test_mor_bulk_delete_writes_parallel_delete_files(spark, tmp_path, sf_dir):
    """A MoR DELETE spanning many data files must not funnel its position
    deletes through one task/file: expect >1 delete file, with disjoint
    referenced data files."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
    from iceberg_trino_sql_demo_spark.sources.table import Table

    t = Table.ctas(
        spark,
        str(tmp_path / "bulk_del"),
        customer_pipeline(spark, sf_dir),
        partitioning=["mktsegment"],
        properties={"merge_mode": "merge-on-read"},
    )
    before = t.df().count()
    even_before = t.df().where("custkey % 2 = 0").count()
    n_data_files = len(t._manifest(t._resolve("main")).data_files)
    assert n_data_files > 1, "need a multi-file table for this test"

    t.delete("custkey % 2 = 0")  # hits every partition/file

    m = t._manifest(t._resolve("main"))
    assert len(m.delete_files) > 1, "bulk delete serialized into one file"
    refsets = [set(d.referenced_files) for d in m.delete_files]
    for i, a in enumerate(refsets):
        for b in refsets[i + 1:]:
            assert not (a & b), "delete files reference overlapping data files"
    # correctness: surviving rows are exactly the odd custkeys
    assert t.df().where("custkey % 2 = 0").count() == 0
    assert t.df().count() == before - even_before


def test_timestamp_time_travel(spark, tmp_path, sf_dir):
    """FOR TIMESTAMP AS OF: newest snapshot at or before the instant —
    both the Table API (as_of_ms) and the Trino SQL form."""
    import time as _time

    from iceberg_trino_sql_demo_spark.engine import Engine
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    eng = Engine(spark, str(tmp_path / "wh_ts"))
    eng.sql("CREATE SCHEMA demo")
    eng.sql("USE demo")
    eng.catalog.ctas("customer", customer_pipeline(spark, sf_dir))
    t = eng.catalog.table("customer")
    base = t.df().count()

    _time.sleep(0.02)
    mid_ms = int(_time.time() * 1000)
    _time.sleep(0.02)
    t.insert(ROWS)

    # API: at mid_ms only the CTAS snapshot existed
    assert t.df(as_of_ms=mid_ms).count() == base
    assert t.df().count() == base + 3

    # SQL form (UTC ISO instant)
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(mid_ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    got = eng.sql(
        f"SELECT count(*) AS n FROM customer FOR TIMESTAMP AS OF TIMESTAMP '{iso}+00:00'"
    ).head()
    assert got.n == base

    # before the table existed -> error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.df(as_of_ms=1)


def test_tags_immutable_refs(t):
    """Tags: pinned reads survive further DML; every write path refuses a
    tag; expire_snapshots keeps tagged snapshots; ref type round-trips
    through metadata serde; $refs reports the type."""
    import pytest as _pytest

    base_n = t.df().count()
    t.create_tag("rel-1")
    assert t.tags() == {"rel-1": t.meta.refs["main"]}
    t.insert([{"custkey": 880001, "name": "TAGPROBE", "mktsegment": "SQLENGINE",
               "account_balance": 9.0, "nation": "FRANCE"}])
    assert t.df().count() == base_n + 1
    assert t.df(ref="rel-1").count() == base_n          # pinned
    for attempt in (
        lambda: t.insert([{"custkey": 880002, "name": "X", "mktsegment": "S",
                           "account_balance": 1.0, "nation": "FRANCE"}], ref="rel-1"),
        lambda: t.delete("custkey = 880001", ref="rel-1"),
        lambda: t.fast_forward("rel-1", "main"),
        lambda: t.drop_branch("rel-1"),
    ):
        with _pytest.raises(ValueError):
            attempt()
    # serde round-trip: a fresh Table object sees the tag as a tag
    t2 = t.refresh()
    assert t2.meta.ref_type("rel-1") == "tag"
    refs = {r.name: r.type for r in t.meta_df("refs").collect()}
    assert refs["rel-1"] == "TAG" and refs["main"] == "BRANCH"
    # expire keeps the tagged snapshot even at zero retention
    t.expire_snapshots(retention_ms=0)
    assert t.df(ref="rel-1").count() == base_n
    # cleanup is type-checked too
    t.drop_tag("rel-1")
    assert "rel-1" not in t.meta.refs
    t.delete("custkey = 880001")


def test_dynamic_overwrite_replaces_only_touched_partitions(
    spark, tmp_path, sf_dir
):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
    from iceberg_trino_sql_demo_spark.sources.table import Table

    t = Table.ctas(
        spark,
        str(tmp_path / "dynovr"),
        customer_pipeline(spark, sf_dir),
        partitioning=["mktsegment"],
        properties={"merge_mode": "merge-on-read"},
    )
    before = {
        f.path: tuple(sorted(f.partition.items()))
        for f in t._manifest(t._resolve("main")).data_files
    }
    segs_before = {r.mktsegment for r in t.df().select("mktsegment").distinct().collect()}
    assert "AUTOMOBILE" in segs_before and len(segs_before) > 1

    src = spark.createDataFrame(
        [(9001, "X", "AUTOMOBILE", 1.0, "FRANCE")],
        t.df().schema,
    )
    t.dynamic_overwrite(src)
    after = t._manifest(t._resolve("main")).data_files
    auto = [f for f in after if dict(f.partition).get("mktsegment") == "AUTOMOBILE"]
    other = [f for f in after if dict(f.partition).get("mktsegment") != "AUTOMOBILE"]
    # replaced partition carries only the new file(s)
    assert all(f.path not in before for f in auto)
    # untouched partitions keep their exact files
    assert all(f.path in before for f in other)
    assert {r.custkey for r in t.df().where("mktsegment = 'AUTOMOBILE'").collect()} == {9001}
    # one atomic snapshot, operation=overwrite, summary records the scope
    snap = t.meta.snapshots[-1]
    assert snap.operation == "overwrite"
    assert snap.summary["replaced-partitions"] == 1


def test_dynamic_overwrite_unpartitioned_is_full_replace(spark, tmp_path, sf_dir):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
    from iceberg_trino_sql_demo_spark.sources.table import Table

    t = Table.ctas(
        spark,
        str(tmp_path / "dynovr_unpart"),
        customer_pipeline(spark, sf_dir),
        partitioning=[],
        properties={"merge_mode": "merge-on-read"},
    )
    src = spark.createDataFrame([(1, "Y", "S", 1.0, "N")], t.df().schema)
    t.dynamic_overwrite(src)
    assert [r.custkey for r in t.df().collect()] == [1]


def test_dynamic_overwrite_refuses_old_spec_files(spark, tmp_path, sf_dir):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
    from iceberg_trino_sql_demo_spark.sources.table import Table

    t = Table.ctas(
        spark,
        str(tmp_path / "dynovr_spec"),
        customer_pipeline(spark, sf_dir),
        partitioning=["mktsegment"],
        properties={"merge_mode": "merge-on-read"},
    )
    t.set_partitioning(["nation"])
    src = spark.createDataFrame([(1, "Y", "S", 1.0, "FRANCE")], t.df().schema)
    with pytest.raises(ValueError, match="older partition spec"):
        t.dynamic_overwrite(src)


def test_merge_not_matched_by_source_delete(spark, tmp_path, sf_dir):
    """Full-sync MERGE: after WHEN NOT MATCHED BY SOURCE THEN DELETE the
    target's key set equals the source's — updates applied, missing keys
    inserted, stranded keys deleted, matched-but-condition-false rows
    kept un-updated (not deleted)."""
    from iceberg_trino_sql_demo_spark.sources.table import Table

    t = Table.create(
        spark, str(tmp_path / "sync"),
        [("k", "bigint"), ("v", "string")],
    )
    t.insert([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}])
    src = spark.createDataFrame(
        [(1, "a2"), (3, "c"), (4, "d")], "k long, v string"
    )
    t.merge(
        src, on="k",
        matched_set={"v": "__src_v"},
        matched_condition="v <> __src_v",   # k=3 matches but v equal: kept
        delete_not_matched_by_source=True,
    )
    got = {(r.k, r.v) for r in t.df().collect()}
    assert got == {(1, "a2"), (3, "c"), (4, "d")}, got


def test_apply_changes_net_compression_and_noop_delete(spark, tmp_path, sf_dir):
    """CDC apply: update compresses to the new image, insert+delete of the
    same key nets out entirely, and a delete for a key the replica never
    had is a no-op (not an insert of the tombstone's old image)."""
    from iceberg_trino_sql_demo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_schema("cdc")
    cat.use("cdc")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    t = cat.ctas("nation", nation)
    s0 = t._resolve().snapshot_id
    replica = t.clone(str(tmp_path / "replica"))
    # replica diverges: drop one source row so a later source-side delete
    # of it must be a no-op on the replica
    replica.delete("n_nationkey = 0")

    t.insert([{"n_nationkey": 9800, "n_name": "EPHEMERAL", "n_regionkey": 1}])
    t.delete("n_nationkey = 9800")  # insert+delete -> nets out
    t.update({"n_name": "'RENAMED'"}, "n_nationkey = 1")
    t.delete("n_nationkey = 0")     # replica already lacks key 0 -> no-op

    replica.apply_changes(t.table_changes(s0, t.meta.refs["main"]), on="n_nationkey")
    rows = {r.n_nationkey: r.n_name for r in replica.refresh().df().collect()}
    assert 9800 not in rows
    assert rows[1] == "RENAMED"
    assert 0 not in rows
    src = {r.n_nationkey: r.n_name for r in t.df().collect()}
    src.pop(0, None)  # the replica's own divergence, never re-inserted
    assert rows == src


# ---------------------------------------------------------------------------
# Equality deletes (round 6): blind upserts, sequence strictness, CDC
# ---------------------------------------------------------------------------
def test_equality_delete_lifecycle(spark, tmp_path, sf_dir):
    """upsert_by_key/delete_by_key semantics: same-commit exemption,
    cross-commit strictness, interop with position deletes and time
    travel, survival through optimize."""
    cat = Catalog(spark, str(tmp_path / "wh_eq"))
    cat.create_schema("eq")
    cat.use("eq")
    rows = [{"k": i, "v": f"v{i}"} for i in range(10)]
    t = cat.ctas("tbl", spark.createDataFrame(rows))
    s0 = t._resolve().snapshot_id

    # one commit: delete keys {2,4} everywhere older + insert new rows —
    # the new rows share the commit sequence and must survive
    up = spark.createDataFrame(
        [{"k": 2, "v": "N2"}, {"k": 4, "v": "N4"}, {"k": 77, "v": "N77"}]
    )
    t.upsert_by_key(up, ["k"])
    got = {r.k: r.v for r in t.df().collect()}
    assert got[2] == "N2" and got[4] == "N4" and got[77] == "N77"
    assert len(got) == 11

    # strictness across commits: a second upsert replaces the first's rows
    t.upsert_by_key(spark.createDataFrame([{"k": 2, "v": "NN2"}]), ["k"])
    assert {r.v for r in t.df().where("k = 2").collect()} == {"NN2"}

    # pure equality delete; absent key is a no-op
    t.delete_by_key(spark.createDataFrame([(0,), (999,)], "k bigint"), ["k"])
    assert {r.k for r in t.df().collect()} == set(range(1, 10)) | {77}

    # position delete on top of equality deletes
    t.delete("k = 7")
    live = {r.k for r in t.refresh().df().collect()}
    assert live == set(range(1, 10)) - {7} | {77}

    # time travel: the pre-upsert snapshot is untouched
    assert t.df(version=s0).count() == 10

    # optimize must KEEP equality deletes (they apply table-wide) and
    # preserve visible state exactly
    before = {(r.k, r.v) for r in t.df().collect()}
    t.optimize(file_size_threshold=10**9)
    after = {(r.k, r.v) for r in t.refresh().df().collect()}
    assert before == after


def test_equality_delete_cdc_and_stream_key_rows(spark, tmp_path, sf_dir):
    """Batch table_changes materializes full values of equality-deleted
    rows; the cdc-mode stream reader emits key-only delete rows, and both
    net to the same replica state."""
    from iceberg_trino_sql_demo_spark.sources.pyds import IceChangesStreamReader

    cat = Catalog(spark, str(tmp_path / "wh_eqcdc"))
    cat.create_schema("eqcdc")
    cat.use("eqcdc")
    rows = [{"k": i, "v": f"v{i}"} for i in range(6)]
    t = cat.ctas("tbl", spark.createDataFrame(rows))
    s0 = t._resolve().snapshot_id
    t.upsert_by_key(spark.createDataFrame([{"k": 1, "v": "N1"}]), ["k"])
    t.delete_by_key(spark.createDataFrame([(3,)], "k bigint"), ["k"])
    s2 = t._resolve().snapshot_id

    ch = t.table_changes(s0, s2).collect()
    tagged = sorted((r._change_ordinal, r._change_type, r.k, r.v) for r in ch)
    assert tagged == [
        (0, "delete", 1, "v1"),
        (0, "insert", 1, "N1"),
        (1, "delete", 3, "v3"),
    ]

    # cdc-mode stream (one drain to head): the upsert commit emits a
    # key-only delete (non-key columns None — O(delta), no old-file scan)
    # plus the full insert; the key-delete commit emits its key row
    r = IceChangesStreamReader(t.location, s0, mode="cdc")
    rows_out, off = r.read({"snapshot_id": s0})
    assert off == {"snapshot_id": s2}
    kinds = sorted((x[-2], x[0], x[1]) for x in rows_out)
    assert kinds == [
        ("delete", 1, None),
        ("delete", 3, None),
        ("insert", 1, "N1"),
    ]
    strict = IceChangesStreamReader(t.location, s0)
    with pytest.raises(ValueError, match="append-only"):
        strict.read({"snapshot_id": s0})


def test_rewrite_equality_deletes_materializes_positions(spark, tmp_path, sf_dir):
    """eq->position compaction: visible state identical, equality files
    gone, suppressed rows now ordinary position deletes, and later
    upserts keep working on the compacted table."""
    cat = Catalog(spark, str(tmp_path / "wh_eqrw"))
    cat.create_schema("eqrw")
    cat.use("eqrw")
    rows = [{"k": i, "v": f"v{i}"} for i in range(12)]
    t = cat.ctas("tbl", spark.createDataFrame(rows))
    t.upsert_by_key(spark.createDataFrame([{"k": 3, "v": "N3"}, {"k": 30, "v": "N30"}]), ["k"])
    t.delete_by_key(spark.createDataFrame([(5,)], "k bigint"), ["k"])
    t.delete("k = 7")  # a position delete in the mix
    before = {(r.k, r.v) for r in t.df().collect()}

    snap = t.rewrite_equality_deletes()
    assert snap is not None
    t.refresh()
    man = t._manifest(t._resolve())
    assert not [d for d in man.delete_files if d.content == "equality"]
    assert [d for d in man.delete_files if d.content == "position"]
    assert {(r.k, r.v) for r in t.df().collect()} == before

    # idempotent: nothing left to rewrite
    assert t.rewrite_equality_deletes() is None

    # the compacted table still takes upserts
    t.upsert_by_key(spark.createDataFrame([{"k": 3, "v": "NN3"}]), ["k"])
    after = {(r.k, r.v) for r in t.refresh().df().collect()}
    assert after == (before - {(3, "N3")}) | {(3, "NN3")}


def test_compaction_is_cdc_invisible(spark, tmp_path, sf_dir):
    """Compaction (optimize), z-order and equality-rewrite commits are
    data-invariant: table_changes and the CDC stream emit NOTHING for
    them (a 100 TB compaction must not re-stream the table), and a
    compaction no longer breaks an append-only CDC stream."""
    from iceberg_trino_sql_demo_spark.sources.pyds import IceChangesStreamReader

    cat = Catalog(spark, str(tmp_path / "wh_cdcinv"))
    cat.create_schema("ci")
    cat.use("ci")
    t = cat.ctas("tbl", spark.createDataFrame([{"k": i, "v": f"v{i}"} for i in range(6)]))
    s0 = t._resolve().snapshot_id
    t.insert([{"k": 10, "v": "v10"}])
    assert t.optimize(file_size_threshold=10**9) is not None
    t.insert([{"k": 11, "v": "v11"}])
    s3 = t._resolve().snapshot_id

    ch = t.table_changes(s0, s3).collect()
    assert sorted((r._change_type, r.k) for r in ch) == [
        ("insert", 10), ("insert", 11)
    ]
    # append-only stream hops over the compaction instead of raising
    r = IceChangesStreamReader(t.location, s0)
    rows, off = r.read({"snapshot_id": s0})
    assert off == {"snapshot_id": s3}
    assert sorted(x[0] for x in rows) == [10, 11]

    # equality-rewrite is likewise invisible
    t.upsert_by_key(spark.createDataFrame([{"k": 3, "v": "N3"}]), ["k"])
    s4 = t._resolve().snapshot_id
    t.rewrite_equality_deletes()
    s5 = t._resolve().snapshot_id
    assert t.table_changes(s4, s5).count() == 0


def test_merge_small_source_prunes_affected_file_planning(spark, tmp_path, monkeypatch):
    """A provably-small MERGE source becomes a manifest runtime filter:
    the affected-file probe and the NOT-MATCHED anti-join scan only files
    whose key ranges can match, never the whole table — and the result is
    identical to the unpruned plan."""
    from iceberg_trino_sql_demo_spark.sources import table as tmod
    from iceberg_trino_sql_demo_spark.sources.table import Table

    # four range-disjoint key batches -> four+ files with tight min/max
    t = Table.ctas(
        spark, str(tmp_path / "mrf"),
        spark.createDataFrame(
            [(k, "base", k * 10) for k in range(100)],
            "k long, tag string, v long",
        ).coalesce(1),
    )
    for lo in (100, 200, 300):
        t.insert([{"k": k, "tag": "base", "v": k * 10} for k in range(lo, lo + 100)])
    man = t._manifest(t._resolve("main"))
    n_total = len(man.data_files)
    assert n_total >= 4

    src = spark.createDataFrame(
        [(250, "upd", 1), (260, "upd", 2), (999, "new", 3)],
        "k long, tag string, v long",
    )
    keys = t._merge_filter_keys(src, "k")
    assert keys == [250, 260, 999]
    # the probe must never see more files than the runtime filter admits
    from iceberg_trino_sql_demo_spark.plans.pruning import Predicate

    n_pruned = len(t.prune(man, [Predicate("k", "in", keys)]).data_files)
    assert n_pruned < n_total

    seen: list[int] = []
    real = tmod.snapshot_df

    def spy(spark_, meta, manifest, **kw):
        seen.append(len(manifest.data_files))
        return real(spark_, meta, manifest, **kw)

    monkeypatch.setattr(tmod, "snapshot_df", spy)
    t.merge(src, on="k", matched_set={"tag": "__src_tag", "v": "__src_v"})
    monkeypatch.setattr(tmod, "snapshot_df", real)
    assert seen and max(seen) <= n_pruned, (seen, n_pruned, n_total)

    rows = {r.k: (r.tag, r.v) for r in t.df().collect()}
    assert len(rows) == 401
    assert rows[250] == ("upd", 1) and rows[260] == ("upd", 2)
    assert rows[999] == ("new", 3)
    assert rows[0] == ("base", 0) and rows[399] == ("base", 3990)

    # unprovably-small source (cap exceeded) falls back to the full probe
    big = spark.range(0, tmod.Table._MERGE_RF_MAX_KEYS + 50).selectExpr(
        "id AS k", "'bulk' AS tag", "id AS v"
    )
    assert t._merge_filter_keys(big, "k") is None
    t.merge(big, on="k", matched_set={"tag": "__src_tag"})
    assert t.df().where("tag = 'bulk'").count() == tmod.Table._MERGE_RF_MAX_KEYS + 50
