"""Live JDBC federation (Engine.attach_jdbc_catalog + sources/jdbc_fed).

The reference's federation statements — the 3-source CTAS
(iceberg_trino_sqldemo.sql:19-40) and the flagship aggregation over
``postgresql.demo.orders`` (:286-295) — replayed against a REAL external
database (embedded Derby, the JDBC engine bundled with Spark) instead of
the testdata stand-in views, value-compared to the parquet path.
"""
from __future__ import annotations

import os

import pytest

from iceberg_trino_sql_demo_spark.engine import Engine
from iceberg_trino_sql_demo_spark.session import register_views, table_path
from iceberg_trino_sql_demo_spark.sources.jdbc_fed import (
    DERBY_DRIVER,
    derby_from_sf_dir,
)

_CTAS = """CREATE OR REPLACE TABLE customer
       WITH (
         partitioning = ARRAY['mktsegment'],
         format='parquet',
         format_version = 3,
         merge_mode = 'merge-on-read'
       ) AS
       SELECT
           c.c_custkey AS custkey,
           c.c_name AS name,
           c.c_mktsegment AS mktsegment,
           ROUND(c.c_acctbal) as account_balance,
           n.n_name as nation
       FROM
           postgresql.demo.customer c
           join oracle.demo.nation n on c.c_nationkey = n.n_nationkey
           join snowflake_parallel.demo.region r on r.r_regionkey = n.n_regionkey
       WHERE r.r_name = 'EUROPE'
       LIMIT 500"""

_FLAGSHIP = """SELECT
                   c.nation as nation,
                   round(sum(o.o_totalprice)) as total_price
               FROM
                   customer c
                   join postgresql.demo.orders o on c.custkey = o.o_custkey
               WHERE
                   c.mktsegment='AUTOMOBILE'
               GROUP BY c.nation
               ORDER BY total_price"""


@pytest.fixture(scope="module")
def fed_eng(spark, tmp_path_factory, sf_dir):
    """Engine whose foreign catalogs are LIVE Derby-backed JDBC sources;
    the reference's demo.<table> names resolve through table_map."""
    register_views(spark, sf_dir)
    db_dir = os.path.join(str(tmp_path_factory.mktemp("derby")), "db")
    url = derby_from_sf_dir(spark, db_dir, sf_dir)
    eng = Engine(spark, str(tmp_path_factory.mktemp("wh_fed")))
    for cat, tmap in (
        ("postgresql", {"demo.customer": "customer", "demo.orders": "orders"}),
        ("oracle", {"demo.nation": "nation"}),
        ("snowflake_parallel", {"demo.region": "region"}),
    ):
        eng.attach_jdbc_catalog(cat, url, driver=DERBY_DRIVER, table_map=tmap)
    eng.sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg "
            "WITH (location = 's3://victorc-data/iceberg/')")
    eng.sql("USE iceberg_glue.victorc_iceberg")
    return eng


def test_ctas_federates_through_jdbc(fed_eng, spark, sf_dir):
    """The :19-40 CTAS value-matches the parquet path when its three
    sources read through live JDBC."""
    fed_eng.sql(_CTAS)
    got = {
        (r.custkey, r.name, r.mktsegment, r.account_balance, r.nation)
        for r in fed_eng.sql("SELECT * FROM customer").collect()
    }
    want_df = spark.sql("""
        SELECT c.c_custkey AS custkey, c.c_name AS name,
               c.c_mktsegment AS mktsegment,
               ROUND(c.c_acctbal) AS account_balance, n.n_name AS nation
          FROM customer c
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
         WHERE r.r_name = 'EUROPE'
    """)
    want = {tuple(r) for r in want_df.collect()}
    # LIMIT 500 against a sub-500 EUROPE population makes the sets equal
    assert len(want) <= 500 and got == want


def test_flagship_agg_federates_and_pushes_down(fed_eng):
    """The :286-295 flagship query joins a live-JDBC orders table; the
    JDBC scan shows pushed filters/pruned columns, not select-star."""
    agg = fed_eng.sql(_FLAGSHIP)
    rows = agg.collect()
    assert rows and rows[0].total_price <= rows[-1].total_price
    # pushdown evidence on a predicated JDBC read through the frontend
    probe = fed_eng.sql(
        "SELECT o_orderkey FROM postgresql.demo.orders WHERE o_orderkey = 7")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan
    assert "PushedFilters: [" in plan and "EqualTo(o_orderkey,7)" in plan, plan
    assert "ReadSchema: struct<o_orderkey" in plan


def test_jdbc_values_roundtrip(fed_eng, spark, sf_dir):
    """Row-level value fidelity through Derby: orders via JDBC equals
    orders via parquet (keys, doubles, dates)."""
    jdbc = fed_eng.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate "
        "FROM postgresql.demo.orders WHERE o_orderkey < 100")
    pq = spark.read.parquet(table_path(sf_dir, "orders")).where(
        "o_orderkey < 100").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    got = {tuple(r) for r in jdbc.collect()}
    want = {tuple(r) for r in pq.collect()}
    assert got == want and got


def test_jdbc_partitioned_parallel_read(fed_eng, spark, sf_dir):
    """At scale a JDBC read is a SINGLE task unless partitioned —
    attach_jdbc_catalog's options pass-through must support Spark's
    partitionColumn/numPartitions bounds so a big dimension load
    parallelizes.  4-way partitioned read: plan shows numPartitions=4,
    values identical to the unpartitioned read."""
    cfg = fed_eng.jdbc_catalogs["postgresql"]
    fed_eng.attach_jdbc_catalog(
        "pg_par", cfg["url"], driver=cfg["driver"],
        table_map={"demo.orders": "orders"},
        options={
            "partitionColumn": "o_orderkey",
            "lowerBound": "1",
            "upperBound": "60000",
            "numPartitions": "4",
        },
    )
    par = fed_eng.sql(
        "SELECT o_orderkey, o_totalprice FROM pg_par.demo.orders")
    plan = par._jdf.queryExecution().executedPlan().toString()
    assert "numPartitions=4" in plan, plan
    assert par.rdd.getNumPartitions() == 4
    flat = fed_eng.sql(
        "SELECT o_orderkey, o_totalprice FROM postgresql.demo.orders")
    assert sorted(map(tuple, par.collect())) == sorted(map(tuple, flat.collect()))


def test_jdbc_writeback_roundtrip(fed_eng, spark, sf_dir):
    """Engine table -> JDBC sink -> re-federated read (VERDICT r10 #7):
    publish an engine CTAS result into the live database under a fresh
    foreign name, read it back through the attached catalog, and get
    value equality — including a pushed-down string predicate on the
    re-federated table (the VARCHAR publish rule keeps Derby comparable).
    Append mode adds rows without clobbering."""
    fed_eng.sql(
        "CREATE OR REPLACE TABLE wb_src AS "
        "SELECT c_custkey AS k, c_name AS nm, c_mktsegment AS seg "
        "FROM postgresql.demo.customer WHERE c_custkey <= 50")
    src = fed_eng.sql("SELECT k, nm, seg FROM wb_src")
    n_src = src.count()
    assert 0 < n_src <= 51  # custkeys start at 0 in the testdata
    fed_eng.jdbc_catalogs["postgresql"]["table_map"][
        "demo.wb_copy"] = "wb_copy"
    fed_eng.publish_to_jdbc("postgresql", "demo.wb_copy", src)
    back = fed_eng.sql("SELECT k, nm, seg FROM postgresql.demo.wb_copy")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect()))
    # pushed-down string predicate works on the written-back table
    probe = fed_eng.sql(
        "SELECT k FROM postgresql.demo.wb_copy WHERE seg = 'AUTOMOBILE'")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(seg,AUTOMOBILE)" in plan, plan
    assert probe.count() == src.where("seg = 'AUTOMOBILE'").count()
    # append mode
    fed_eng.publish_to_jdbc(
        "postgresql", "demo.wb_copy",
        spark.createDataFrame([(9999, "x", "NONE")], "k long, nm string, seg string"),
        mode="append")
    assert fed_eng.sql(
        "SELECT count(*) AS n FROM postgresql.demo.wb_copy").head().n == n_src + 1


def test_publish_partitioned_batched_roundtrip(spark, fed_eng):
    """VERDICT r11 #6: publish_to_jdbc's partitioned/batched options —
    num_partitions executor connections + JDBC batchsize — produce a
    value-identical foreign table through a full re-federation read,
    with pushdown intact.  (Embedded Derby bounds the SPEEDUP, not the
    semantics; SCALING.md's Federation plane records the measured
    grid.)"""
    fed_eng.sql(
        "CREATE OR REPLACE TABLE wbp_src AS "
        "SELECT c_custkey AS k, c_name AS nm, c_mktsegment AS seg "
        "FROM postgresql.demo.customer")
    src = fed_eng.sql("SELECT k, nm, seg FROM wbp_src")
    fed_eng.jdbc_catalogs["postgresql"]["table_map"][
        "demo.wbp_copy"] = "wbp_copy"
    fed_eng.publish_to_jdbc("postgresql", "demo.wbp_copy", src,
                            num_partitions=4, batchsize=5000)
    back = fed_eng.sql("SELECT k, nm, seg FROM postgresql.demo.wbp_copy")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect()))
    probe = fed_eng.sql(
        "SELECT k FROM postgresql.demo.wbp_copy WHERE seg = 'MACHINERY'")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(seg,MACHINERY)" in plan, plan
    assert probe.count() == src.where("seg = 'MACHINERY'").count()
