"""Phase-2 tests: table format core — CTAS, insert, snapshots, metadata
tables, partition transforms, pruning (SURVEY.md §5.2 item 2: mutate ->
inspect data -> inspect metadata, mirroring the reference script's
golden-inspection pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
from iceberg_trino_sql_demo_spark.sources.catalog import Catalog
from iceberg_trino_sql_demo_spark.sources.table import Table


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    c = Catalog(spark, str(tmp_path_factory.mktemp("warehouse")))
    c.create_schema("demo")
    c.use("demo")
    return c


@pytest.fixture(scope="module")
def customer(spark, cat, sf_dir):
    # reference :19-40 — CTAS partitioned by identity(mktsegment), MoR, v3
    src = customer_pipeline(spark, sf_dir)
    cat.ctas(
        "customer",
        src,
        partitioning=["mktsegment"],
        properties={"merge_mode": "merge-on-read", "format_version": 3},
    )
    return cat.table("customer")


def test_ctas_roundtrip(spark, customer, sf_dir):
    src = customer_pipeline(spark, sf_dir)
    got = customer.df()
    assert got.count() == src.count()
    assert sorted(got.columns) == sorted(src.columns)
    # identical multiset of rows
    assert got.exceptAll(src).count() == 0 and src.exceptAll(got).count() == 0


def test_partition_layout(customer):
    files = customer.meta_df("files")
    rows = files.collect()
    assert all(r.content == 0 for r in rows)
    # every data file belongs to exactly one mktsegment partition
    assert all('"mktsegment"' in r.partition for r in rows)


def test_snapshots_and_history(customer):
    snaps = customer.meta_df("snapshots").collect()
    assert len(snaps) >= 1
    assert snaps[0].operation == "append"
    hist = customer.meta_df("history").collect()
    assert hist[-1].is_current_ancestor


def test_insert_values(customer):
    # reference :103-106
    before = customer.df().count()
    customer.insert(
        [
            {"custkey": 2001, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
             "account_balance": 1.0, "nation": "FRANCE"},
            {"custkey": 2002, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
             "account_balance": 2.0, "nation": "FRANCE"},
            {"custkey": 2003, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
             "account_balance": 3.0, "nation": "FRANCE"},
        ]
    )
    after = customer.df()
    assert after.count() == before + 3
    assert after.where("mktsegment='SQLENGINE'").count() == 3
    ops = [s.operation for s in customer.meta_df("snapshots").collect()]
    assert ops[-1] == "append"


def test_hidden_columns(customer):
    # reference :65-72
    df = customer.df(hidden=True)
    row = df.where("custkey = 2001").collect()[0]
    assert row["_row_id"] is not None
    assert row["_last_updated_sequence_number"] is not None
    assert row["_path"].startswith("file:")
    assert "SQLENGINE" in row["_partition"]
    assert row["_file_modified_time"] is not None
    # row ids unique across the table
    n = df.count()
    assert df.select("_row_id").distinct().count() == n


def test_show_create(customer):
    ddl = customer.show_create("customer")
    assert "partitioning = ARRAY['mktsegment']" in ddl
    assert "merge_mode = 'merge-on-read'" in ddl
    assert "custkey bigint" in ddl


def test_year_transform_and_pruning(spark, cat, sf_dir):
    # reference :13-15 — orders partitioned by year(orderdate)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("orderdate"),
        F.col("o_totalprice").alias("totalprice"),
    )
    cat.ctas("orders", orders, partitioning=["year(orderdate)"])
    t = cat.table("orders")

    all_files = t.io.read_manifest(t._resolve()).data_files
    years = {f.partition.get("orderdate_year") for f in all_files}
    assert len(years) > 1, "expected multiple year partitions"

    where = "orderdate >= DATE '1995-11-01' AND orderdate < DATE '1996-01-01'"
    preds = parse_simple_predicates(where)
    assert len(preds) == 2
    pruned = prune_files(all_files, t.meta, preds)
    kept_years = {f.partition["orderdate_year"] for f in pruned}
    assert kept_years == {1995}, kept_years

    # pruned read returns exactly the filtered rows
    expect = orders.where(
        (F.col("orderdate") >= "1995-11-01") & (F.col("orderdate") < "1996-01-01")
    ).count()
    assert t.df(where=where).count() == expect


def test_stats_pruning_on_unpartitioned_column(spark, cat, sf_dir):
    # range-clustered files -> footer min/max stats skip files on a point
    # lookup even without any partition spec (SURVEY.md §4 file skipping;
    # the reference's sorted_by knob, :27, exists for exactly this effect)
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("orderkey"), F.col("o_totalprice").alias("totalprice"))
        .repartitionByRange(4, "orderkey")
    )
    cat.ctas("orders_ranged", orders)
    t = cat.table("orders_ranged")
    files = t.io.read_manifest(t._resolve()).data_files
    assert len(files) == 4
    preds = parse_simple_predicates("orderkey = 17")
    pruned = prune_files(files, t.meta, preds)
    assert len(pruned) == 1
    assert t.df(where="orderkey = 17").count() == 1


def test_metadata_tables_render(customer):
    for kind in (
        "properties", "snapshots", "history", "manifests",
        "partitions", "files", "refs", "entries", "metadata_log_entries",
    ):
        df = customer.meta_df(kind)
        assert df.count() >= 0, kind
    refs = {r["name"] for r in customer.meta_df("refs").collect()}
    assert "main" in refs


def test_register_table(spark, cat, customer):
    t = cat.register_table("demo", "new_customer", customer.location)
    assert t.df().count() == customer.df().count()


def test_concurrent_append_retries(spark, cat, sf_dir):
    """Two Table handles appending interleaved: the stale handle must rebase
    onto the new head instead of failing (appends commute); a stale
    DISJOINT update also rebases — its file delta (new delete file + new
    data file under merge-on-read) doesn't overlap the concurrent append.
    Overlapping-removal refusal is covered in test_concurrency.py."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.ctas("nation_cc", nation)
    a = cat.table("nation_cc")
    b = cat.table("nation_cc")  # separate handle, same table on disk

    a.insert([{"n_nationkey": 901, "n_name": "A1", "n_regionkey": 0}])
    # b's view is now stale; its append must rebase and succeed
    b.insert([{"n_nationkey": 902, "n_name": "B1", "n_regionkey": 0}])
    merged = cat.table("nation_cc").df()
    keys = {r.n_nationkey for r in merged.where("n_nationkey >= 900").collect()}
    assert keys == {901, 902}, "both appends must survive the race"

    # stale disjoint row-level DML rebases over the newer append
    a.insert([{"n_nationkey": 903, "n_name": "A2", "n_regionkey": 0}])
    b.update({"n_name": "'X'"}, "n_nationkey = 901")
    final = cat.table("nation_cc").df().where("n_nationkey >= 900")
    rows = {(r.n_nationkey, r.n_name) for r in final.collect()}
    assert rows == {(901, "X"), (902, "B1"), (903, "A2")}


def test_bucket_transform_pruning(spark, cat, sf_dir):
    """bucket(8, custkey): a point lookup prunes to the files of one bucket
    (the literal's bucket id is resolved by a one-row JVM hash probe)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )
    cat.ctas("cust_bucketed", c, partitioning=["bucket(8, custkey)"])
    t = cat.table("cust_bucketed")
    files = t.io.read_manifest(t._resolve()).data_files
    buckets = {f.partition["custkey_bucket_8"] for f in files}
    assert len(buckets) == 8

    preds = parse_simple_predicates("custkey = 42")
    pruned = prune_files(files, t.meta, preds, spark)
    assert len({f.partition["custkey_bucket_8"] for f in pruned}) == 1
    assert len(pruned) < len(files)
    assert t.df(where="custkey = 42").count() == 1


def test_predicate_parser_or_between():
    """OR / BETWEEN / nested shapes parse into prunable predicates, and
    un-analyzable text safely yields none."""
    from iceberg_trino_sql_demo_spark.plans.pruning import Predicate

    # BETWEEN desugars to the two bounds (was previously unparsed: the AND
    # splitter cut it in half)
    p = parse_simple_predicates("orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'")
    assert p == [
        Predicate("orderdate", ">=", "1995-01-01"),
        Predicate("orderdate", "<=", "1995-12-31"),
    ]

    # top-level OR: one disjunction predicate with two branches
    [d] = parse_simple_predicates("mktsegment = 'BUILDING' OR mktsegment = 'MACHINERY'")
    assert d.op == "or" and len(d.value) == 2

    # OR nested under AND prunes on both conjuncts
    preds = parse_simple_predicates("custkey = 7 AND (mktsegment = 'A' OR mktsegment = 'B')")
    assert preds[0] == Predicate("custkey", "=", 7)
    assert preds[1].op == "or"

    # quote/paren safety: AND inside a string literal or IN-list survives
    [p] = parse_simple_predicates("name = 'BRAND AND CO'")
    assert p.value == "BRAND AND CO"
    [p] = parse_simple_predicates("custkey IN (1, 2, 3)")
    assert p.op == "in" and p.value == [1, 2, 3]

    # an OR with an un-parsable branch abandons the disjunction (no
    # partial extraction — that would under-keep files)
    assert parse_simple_predicates("custkey = 1 OR length(name) > 3") == []
    # NOT bails entirely
    assert parse_simple_predicates("NOT custkey = 1") == []

    # BETWEEN-looking text INSIDE a string literal is NOT rewritten
    # (ADVICE r2 medium: the in-place mutation made pruning compare
    # against a literal no row contains)
    [p] = parse_simple_predicates("name = 'X BETWEEN 1 AND 2'")
    assert p == Predicate("name", "=", "X BETWEEN 1 AND 2")
    # ...while string-typed BETWEEN bounds still desugar normally
    p = parse_simple_predicates("name BETWEEN 'AAA' AND 'MMM'")
    assert p == [
        Predicate("name", ">=", "AAA"),
        Predicate("name", "<=", "MMM"),
    ]
    # both at once: the literal survives verbatim, the real BETWEEN prunes
    preds = parse_simple_predicates(
        "note = 'A BETWEEN 3 AND 4' AND custkey BETWEEN 10 AND 20"
    )
    assert preds == [
        Predicate("note", "=", "A BETWEEN 3 AND 4"),
        Predicate("custkey", ">=", 10),
        Predicate("custkey", "<=", 20),
    ]


def test_or_pruning_unions_branch_file_sets(spark, cat, sf_dir):
    """`seg='A' OR seg='B'` must keep exactly the union of both branches'
    partitions — and the pruned read still returns correct rows."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    cat.ctas("cust_orpr", cust, partitioning=["mktsegment"])
    t = cat.table("cust_orpr")
    files = t.io.read_manifest(t._resolve()).data_files
    assert len({f.partition["mktsegment"] for f in files}) >= 3

    where = "mktsegment = 'BUILDING' OR mktsegment = 'MACHINERY'"
    preds = parse_simple_predicates(where)
    pruned = prune_files(files, t.meta, preds)
    assert {f.partition["mktsegment"] for f in pruned} == {"BUILDING", "MACHINERY"}

    expect = cust.where("mktsegment IN ('BUILDING','MACHINERY')").count()
    assert t.df(where=where).count() == expect

    # BETWEEN end-to-end on a stats-pruned column
    w2 = "custkey BETWEEN 100 AND 200"
    assert t.df(where=w2).count() == cust.where(w2).count()


def test_runtime_filter_join_prunes_buckets(spark, cat, sf_dir):
    """The dim-derived IN list must prune the bucketed fact to a strict
    file subset (one key -> one bucket of 8), and past max_keys the scan
    falls back to the full file set rather than a 10^6-literal predicate."""
    from iceberg_trino_sql_demo_spark.operators.table_format_ops import (
        runtime_filter_scan,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("custkey"), F.col("o_totalprice").alias("tp")
    )
    cat.ctas("orders_rtf", o, partitioning=["bucket(8, custkey)"])
    t = cat.table("orders_rtf")
    all_files = len(t.io.read_manifest(t._resolve()).data_files)
    assert all_files >= 8

    one = runtime_filter_scan(t, "custkey", [42])
    n_scanned = len(
        {r[0] for r in one.select(F.input_file_name()).distinct().collect()}
    )
    assert n_scanned < all_files, "single key must skip other buckets"
    assert one.count() == o.where("custkey = 42").count()

    # past the bound: full scan, same results as no filter
    many = runtime_filter_scan(t, "custkey", list(range(5000)), max_keys=10)
    assert many.count() == o.count()


def test_runtime_filter_key_collect_is_bounded(spark, cat, sf_dir):
    """VERDICT r4 #3: the dim-key harvest must enforce max_keys BEFORE
    materializing — an unselective dim returns None via a LIMIT
    max_keys+1 collect (driver holds at most max_keys+1 rows), and the
    scan falls back to the full file set with unchanged results."""
    from iceberg_trino_sql_demo_spark.operators.table_format_ops import (
        collect_runtime_filter_keys,
        runtime_filter_scan,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert cust.count() > 11
    # unselective: overflow detected from a bounded collect
    assert collect_runtime_filter_keys(cust, "c_custkey", max_keys=10) is None
    # the LIMIT is in the plan the collect runs, not applied after
    plan = cust.select("c_custkey").limit(11)._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit 11" in plan
    # selective: keys come back and prune
    sel = cust.where(F.col("c_acctbal") > 9000)
    keys = collect_runtime_filter_keys(sel, "c_custkey", max_keys=1000)
    assert keys is not None and 0 < len(keys) <= 1000

    t = cat.table("orders_rtf")  # built by the bucket-pruning test above
    full = t.df().count()
    assert runtime_filter_scan(t, "custkey", None).count() == full


def test_analyze_stats_drive_broadcast_flip(spark, tmp_path, sf_dir):
    """VERDICT r5 #8: engine ANALYZE stats reach Catalyst as a physical
    hint.  Spark sizes a parquet scan by FILE bytes and cannot see that an
    equality filter keeps ~rows/NDV of them; the engine can.  With the
    broadcast threshold pinned below the fact's on-disk size and AQE's
    runtime rescue disabled, the same 3-way join flips SortMergeJoin ->
    BroadcastHashJoin exactly when the table has been ANALYZEd."""
    from iceberg_trino_sql_demo_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_stats"))
    cat.create_schema("st")
    cat.use("st")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fact = cat.ctas("li_fact", li)
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")

    def plan_of():
        f = fact.df(where="l_suppkey = 3")
        j = (
            f.join(ords, f["l_orderkey"] == ords["o_orderkey"])
            .join(sup, f["l_suppkey"] == sup["s_suppkey"])
            .groupBy("s_name")
            .count()
        )
        return j._jdf.queryExecution().executedPlan().toString()

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # no ANALYZE yet: the filtered fact is sized by file bytes -> SMJ
        before = plan_of()
        assert "SortMergeJoin" in before, before
        fact.analyze()
        fact.refresh()
        after = plan_of()
        assert "BroadcastHashJoin" in after, after
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_struct_map_columns_roundtrip(spark, cat):
    """Nested-typed columns (struct/map/array) CTAS, read back
    value-exact, and survive DML — their leaves carry NO per-file stats
    entry (heterogeneous struct leaves previously poisoned the parent's
    min/max accumulator and crashed the harvest, r12), while sibling
    top-level primitives keep full stats/pruning."""
    df = spark.sql(
        "SELECT id AS k, "
        "named_struct('a', id * 2, 'b', concat('s', id)) AS st, "
        "map('m', id) AS mp, array(id, id + 1) AS ar FROM range(20)")
    cat.ctas("nested_t", df)
    t = cat.table("nested_t")
    assert [f.type for f in t.meta.schema.fields] == [
        "bigint", "struct<a:bigint,b:string>", "map<string,bigint>",
        "array<bigint>"]
    got = sorted((r.k, r.st.a, r.st.b, dict(r.mp), list(r.ar))
                 for r in t.df().collect())
    assert got == [(i, i * 2, f"s{i}", {"m": i}, [i, i + 1])
                   for i in range(20)]
    # top-level primitive k keeps stats; nested fields carry none
    man = t.io.read_manifest(t._resolve())
    for f in man.data_files:
        assert f.stats.get("1", {}).get("min") is not None
        assert "2" not in f.stats and "3" not in f.stats
    # DML over nested columns
    t.delete("k % 5 = 0")
    t = t.refresh()
    assert {r.k for r in t.df().collect()} == {
        i for i in range(20) if i % 5}
    assert {r.st.b for r in t.df(where="k = 7").collect()} == {"s7"}
