"""Bloom-filter file skipping (sources/bloom.py): point-lookup pruning
for equality/IN predicates on high-cardinality columns.

Contract under test:
- NO FALSE NEGATIVES ever: a value present in a file must always probe
  as "may contain" (pruning must stay conservative);
- the JVM-built bloom (md5/conv/substring expressions) and the Python
  probe (hashlib.md5) compute the identical bit positions;
- a table with ``bloom_filter_columns`` prunes point lookups on absent
  keys down to zero files while returning identical query results;
- non-int/string bloom columns are refused loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
from iceberg_trino_sql_demo_spark.sources.bloom import (
    M_BITS,
    bloom_hex,
    build_file_blooms,
    contains,
    positions,
)
from iceberg_trino_sql_demo_spark.sources.catalog import Catalog


def test_bloom_pure_python_roundtrip():
    vals = list(range(500)) + [f"key_{i}" for i in range(500)]
    bits = bloom_hex(p for v in vals for p in positions(v))
    assert len(bits) == M_BITS // 4
    # no false negatives, by construction
    assert all(contains(bits, v) for v in vals)
    # absent probes are mostly rejected (FPR well under 50% even at
    # 1000 values in an 8192-bit filter)
    misses = sum(not contains(bits, f"absent_{i}") for i in range(500))
    assert misses > 350


def test_jvm_and_python_hashes_agree(spark, tmp_path):
    rows = [(i, f"name_{i * 7}") for i in range(300)]
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(rows, "k bigint, s string").coalesce(1).write.parquet(p)
    import glob

    files = sorted(glob.glob(p + "/*.parquet"))
    blooms = build_file_blooms(spark, files, [("1", "k"), ("2", "s")])
    assert set(blooms) == set(files)
    for f in files:
        for k, s in rows:
            assert contains(blooms[f]["1"], k), "false negative on int"
            assert contains(blooms[f]["2"], s), "false negative on string"
        # definitely-absent values prune
        assert not all(
            contains(blooms[f]["1"], 10_000 + i) for i in range(50)
        )


@pytest.fixture(scope="module")
def bloom_table(spark, sf_dir, tmp_path_factory):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_bloom")))
    cat.create_schema("demo")
    cat.use("demo")
    cat.ctas(
        "cust_bloom",
        customer_pipeline(spark, sf_dir),
        partitioning=["mktsegment"],
        properties={"bloom_filter_columns": "custkey,name"},
    )
    return cat.table("cust_bloom")


def test_table_blooms_prune_point_lookups(bloom_table, spark):
    t = bloom_table
    manifest = t._manifest(t._resolve())
    files = manifest.data_files
    assert files and all("bloom" in f.stats.get("1", {}) for f in files), (
        "every data file must carry a custkey bloom"
    )

    present = [r.custkey for r in t.df().select("custkey").limit(5).collect()]
    # present keys: the containing file is never pruned (no false negatives)
    for k in present:
        kept = prune_files(
            files, t.meta, parse_simple_predicates(f"custkey = {k}"), spark
        )
        got = {r.custkey for r in t.df(where=f"custkey = {k}").collect()}
        assert got == {k}
        assert kept, "bloom pruned the file that holds the key"

    # absent keys: every file is pruned (custkey cardinality is far below
    # the bloom's ~1% FPR knee, so 0 kept is deterministic here — if the
    # FPR ever admits a file, the filter stage still returns zero rows)
    kept = prune_files(
        files, t.meta, parse_simple_predicates("custkey = 987654321"), spark
    )
    assert len(kept) <= max(1, len(files) // 10)
    assert t.df(where="custkey = 987654321").count() == 0

    # IN-list: union of probes, still conservative
    in_where = f"custkey IN ({present[0]}, 987654321)"
    got = {r.custkey for r in t.df(where=in_where).collect()}
    assert got == {present[0]}


def test_blooms_survive_dml_and_optimize(bloom_table):
    t = bloom_table
    t.insert([
        {"custkey": 990001, "name": "BLOOMY", "mktsegment": "SQLENGINE",
         "account_balance": 1.0, "nation": "FRANCE"}
    ])
    got = t.df(where="custkey = 990001").collect()
    assert [r.name for r in got] == ["BLOOMY"]
    t.optimize()
    manifest = t._manifest(t._resolve())
    assert all("bloom" in f.stats.get("1", {}) for f in manifest.data_files), (
        "optimize rewrite must rebuild blooms for the compacted files"
    )
    assert t.df(where="custkey = 990001").count() == 1


def test_bloom_on_float_column_refused(spark, sf_dir, tmp_path_factory):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_bloom_bad")))
    cat.create_schema("demo")
    cat.use("demo")
    with pytest.raises(ValueError, match="bloom_filter_columns"):
        cat.ctas(
            "cust_bad",
            customer_pipeline(spark, sf_dir),
            properties={"bloom_filter_columns": "account_balance"},
        )


def test_rename_bloom_column_keeps_working(spark, sf_dir, tmp_path_factory):
    """Renaming a bloom-filtered (and sorted-by) column must carry the
    name-based references along — later writes keep building blooms and
    point lookups keep pruning under the new name."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_bloom_rn")))
    cat.create_schema("demo")
    cat.use("demo")
    cat.ctas(
        "cust_rn_bloom",
        customer_pipeline(spark, sf_dir),
        properties={"bloom_filter_columns": "custkey"},
        sort_order=["custkey"],
    )
    t = cat.table("cust_rn_bloom")
    t.rename_column("custkey", "customer_id")
    assert t.meta.properties["bloom_filter_columns"] == "customer_id"
    assert t.meta.sort_order == ["customer_id"]
    t.insert([{"customer_id": 990100, "name": "RN BLOOM",
               "mktsegment": "SQLENGINE", "account_balance": 1.0,
               "nation": "FRANCE"}])
    manifest = t._manifest(t._resolve())
    cid = str(t.meta.schema.field_by_name("customer_id").id)
    assert all("bloom" in f.stats.get(cid, {}) for f in manifest.data_files)
    kept = prune_files(
        manifest.data_files, t.meta,
        parse_simple_predicates("customer_id = 987654321"), spark,
    )
    assert len(kept) <= max(1, len(manifest.data_files) // 10)
    assert t.df(where="customer_id = 990100").count() == 1
