"""Full-script replay: the reference demo
(/root/reference/iceberg_trino_sqldemo.sql) executed statement-by-statement
through Engine.sql — adapted only where the sandbox requires it:

- federation sources (tpch.sf1.*, postgresql/oracle/snowflake *.demo.*)
  resolve to the registered testdata views;
- the demo's hard-coded snapshot ids are fetched from "$snapshots" at replay
  time (Trino prints them interactively; we replay programmatically);
- the commented-out MERGE block (:146-157) is replayed uncommented.

Line citations in comments refer to the reference file.
"""

from __future__ import annotations

import pytest

from iceberg_trino_sql_demo_spark.engine import Engine
from iceberg_trino_sql_demo_spark.session import register_views


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory, sf_dir):
    register_views(spark, sf_dir)  # testdata stands in for every connector
    e = Engine(spark, str(tmp_path_factory.mktemp("wh_sql")))
    return e


def test_full_reference_script_replay(eng):
    sql = eng.sql

    # :1 session knob (accepted no-op)
    sql("SET SESSION skip_results_cache=true")

    # :4 (the reference carries it commented; replayed uncommented) —
    # IF EXISTS on a missing schema succeeds silently
    sql("DROP SCHEMA IF EXISTS victorc_iceberg")

    # :6-9 schema DDL + USE
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    assert "CREATE SCHEMA" in sql('SHOW CREATE SCHEMA "iceberg_glue"."victorc_iceberg"').head()[0]
    sql("USE iceberg_glue.victorc_iceberg")

    # :11 CTAS nation
    sql("CREATE OR REPLACE TABLE nation AS SELECT * FROM tpch.sf1.nation")
    assert sql("SELECT * FROM nation").count() == 25

    # :13-15 CTAS orders partitioned by year + range scan
    sql("""CREATE OR REPLACE TABLE orders WITH (partitioning = ARRAY['year(o_orderdate)'])
           AS SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
                     o_totalprice FROM tpch.sf1.orders""")
    n = sql("SELECT o_orderdate FROM orders WHERE o_orderdate>=date('1995-11-01') and o_orderdate<date('1996-01-01')").count()
    assert n > 0

    # :17-40 customer CTAS (full WITH props + federation join + LIMIT)
    sql("DROP TABLE IF EXISTS customer")
    sql("""CREATE OR REPLACE TABLE customer
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
           LIMIT 500""")

    # :42 SHOW CREATE TABLE round-trip
    ddl = sql("SHOW CREATE TABLE customer").head()[0]
    assert "partitioning = ARRAY['mktsegment']" in ddl and "merge-on-read" in ddl

    # :44 ordered inspection
    base = sql("SELECT * FROM customer ORDER BY name").count()
    assert base > 0

    # :48-49 ANALYZE + SHOW STATS
    sql("ANALYZE customer")
    stats = {r.column_name: r for r in sql("SHOW STATS FOR customer").collect()}
    assert stats["custkey"].distinct_values_count > 0

    # :53-61 views + materialized views
    sql("CREATE OR REPLACE VIEW my_view AS SELECT * FROM tpch.sf1.nation")
    assert sql("SELECT * FROM my_view").count() == 25
    sql("""CREATE OR REPLACE MATERIALIZED VIEW my_mv
           WITH (refresh_schedule = '30 04 * * 0')
           AS SELECT * FROM tpch.sf1.nation""")
    sql("REFRESH MATERIALIZED VIEW my_mv")
    assert sql("SELECT * FROM my_mv").count() == 25

    # :65-72 hidden columns
    hid = sql("""SELECT custkey, "$row_id", "$last_updated_sequence_number",
                        "$partition", "$path" as file, "$file_modified_time" as filedatetime
                 FROM customer""").head()
    assert hid["_row_id"] is not None and hid["file"].startswith("file:")

    # :74-82 all nine metadata tables
    for meta in ("properties", "snapshots", "history", "manifests", "partitions",
                 "files", "refs", "entries", "metadata_log_entries"):
        assert sql(f'SELECT * FROM "customer${meta}"').count() >= 0

    # :85-96 curr_ver_dets view joining $snapshots x $history x $refs
    sql("""CREATE OR REPLACE VIEW curr_ver_dets AS
           SELECT concat_ws(' > ', r.name, r.type) AS curr_ver,
                  date_format(s.committed_at, '%Y/%m/%d-%T') AS committed_at,
                  s.snapshot_id, s.parent_id, h.is_current_ancestor, s.operation
             FROM "customer$snapshots" AS s
             JOIN "customer$history" AS h
               ON (s.snapshot_id = h.snapshot_id)
             LEFT JOIN "customer$refs" AS r
               ON (h.snapshot_id = r.snapshot_id)
           ORDER BY s.committed_at""")
    dets = sql("select * from curr_ver_dets").collect()
    assert dets[-1].curr_ver == "main > BRANCH"
    assert "/" in dets[-1].committed_at  # %Y/%m/%d-%T dialect translated

    # :103-106 INSERT 3 rows
    sql("""INSERT INTO customer (custkey, name, mktsegment, account_balance, nation)
           VALUES (2001 , 'COMMANDER BUN BUN', 'SQLENGINE', 1, 'FRANCE'),
           (2002 , 'COMMANDER BUN BUN', 'SQLENGINE', 2, 'FRANCE'),
           (2003 , 'COMMANDER BUN BUN', 'SQLENGINE', 3, 'FRANCE')""")
    assert sql("SELECT * FROM customer ORDER BY name").count() == base + 3

    # :112-125 CDC between the first and latest snapshot
    snaps = sql('SELECT * FROM "customer$snapshots" ORDER BY committed_at ASC').collect()
    start_id, end_id = snaps[0].snapshot_id, snaps[-1].snapshot_id
    changes = sql(f"""SELECT * FROM TABLE(
                        system.table_changes(
                          schema_name => 'victorc_iceberg',
                          table_name => 'customer',
                          start_snapshot_id => {start_id},
                          end_snapshot_id => {end_id}))
                      ORDER BY _change_ordinal ASC""").collect()
    assert {r._change_type for r in changes} == {"insert"}
    assert len(changes) == 3

    # :129-131 UPDATE
    sql("UPDATE customer SET account_balance = 1000 WHERE custkey = 2001")
    got = {r.custkey: r.account_balance
           for r in sql("SELECT * FROM customer WHERE mktsegment='SQLENGINE'").collect()}
    assert got[2001] == 1000.0

    # :135 row lineage inspection
    lin = sql("""SELECT name, custkey,"$row_id", "$last_updated_sequence_number"
                 FROM customer ORDER BY name""").collect()
    assert all(r["_row_id"] is not None for r in lin)

    # :137-139 DELETE with IN list
    pre_delete = sql('SELECT * FROM "customer$snapshots" ORDER BY committed_at DESC').head().snapshot_id
    sql("DELETE FROM customer WHERE custkey IN (2001,2002,2003)")
    assert sql("SELECT * FROM customer ORDER BY name").count() == base

    # :143 deletion vectors visible
    files = sql('SELECT file_path, file_format FROM "customer$files"').collect()
    assert any("deletes/" in r.file_path for r in files)

    # :146-157 MERGE (commented in the reference; replayed here)
    eng.spark.sql("""SELECT 2005 AS custkey, 'MERGED' AS name, 'SQLENGINE' AS mktsegment,
                            5.0 AS account_balance, 'FRANCE' AS nation"""
                  ).createOrReplaceTempView("customer_land")
    sql("""MERGE INTO customer AS b
           USING customer_land AS l
           ON (b.custkey = l.custkey)
           WHEN MATCHED and b.name != l.name
           THEN UPDATE
           SET name = l.name
           WHEN NOT MATCHED
                 THEN INSERT (custkey, name, mktsegment, account_balance, nation)
                       VALUES(l.custkey, l.name, l.mktsegment, l.account_balance, l.nation)""")
    assert sql("SELECT * FROM customer WHERE custkey = 2005").head().name == "MERGED"
    sql("DELETE FROM customer WHERE custkey = 2005")

    # :166-171 ADD COLUMN DEFAULT + insert omitting it
    sql("ALTER TABLE customer ADD COLUMN phone varchar DEFAULT '+33606060606'")
    sql("""INSERT INTO customer (custkey,name,mktsegment,account_balance,nation)
           VALUES (200000, 'COMMANDER BUN BUN', 'SQLENGINE', 1, 'FRANCE')""")
    assert sql("SELECT * FROM customer WHERE custkey=200000").head().phone == "+33606060606"

    # :175-181 variant column lifecycle
    sql("ALTER TABLE customer ADD COLUMN message JSON")
    sql("""INSERT INTO customer (custkey,name,mktsegment,account_balance,nation,message)
           VALUES (200010, 'COMMANDER BUN BUN', 'SQLENGINE', 1, 'FRANCE',JSON '{"company": "Starburst"}')""")
    row = eng.spark.sql(
        "SELECT variant_get(message, '$.company', 'string') AS c FROM "
        + eng._tmp_view(eng.catalog.table("customer").df(), "chk")
        + " WHERE custkey = 200010"
    ).head()
    assert row.c == "Starburst"
    sql("ALTER TABLE customer DROP COLUMN message")

    # :185-189 nanosecond column
    sql("ALTER TABLE customer ADD COLUMN nanos TIMESTAMP(9)")
    sql("""INSERT INTO customer (custkey,name,mktsegment,account_balance,nation,nanos)
           VALUES (200020, 'COMMANDER BUN BUN', 'SQLENGINE', 1, 'FRANCE',TIMESTAMP '2025-08-21 12:34:56.123456789')""")
    from iceberg_trino_sql_demo_spark.functions.trino import format_ns_timestamp

    raw = sql("SELECT * FROM customer WHERE custkey = 200020").head().nanos
    assert format_ns_timestamp(raw) == "2025-08-21 12:34:56.123456789"

    # :193-207 partition evolution
    sql("ALTER TABLE customer SET PROPERTIES partitioning = ARRAY['mktsegment', 'custkey']")
    sql("INSERT INTO customer (custkey,name,mktsegment,account_balance,nation) VALUES (200001, 'TRINO', 'SQLENGINE', 1, 'FRANCE')")
    sql("ALTER TABLE customer SET PROPERTIES partitioning = ARRAY['nation']")
    sql("INSERT INTO customer (custkey,name,mktsegment,account_balance,nation) VALUES (200002, 'STARBURST', 'SQLENGINE', 2, 'SPAIN')")
    parts = sql('SELECT * FROM "customer$partitions"').collect()
    assert len({r.spec_id for r in parts}) == 3

    # :213-221 time travel + rollback
    seg_now = sql("SELECT * FROM customer where mktsegment='SQLENGINE'").count()
    tt = sql(f"SELECT * FROM customer FOR VERSION AS OF {pre_delete} where mktsegment='SQLENGINE'  ORDER BY name").count()
    assert tt == 3  # the three :103-106 rows existed then
    sql(f"CALL system.rollback_to_snapshot('victorc_iceberg', 'customer', {pre_delete})")
    assert sql("SELECT * FROM customer where mktsegment='SQLENGINE'").count() == 3
    # roll forward again to the latest state for the branch scenario
    latest = sql('SELECT * FROM "customer$snapshots" ORDER BY committed_at DESC').head().snapshot_id
    sql(f"CALL system.rollback_to_snapshot('victorc_iceberg', 'customer', {latest})")
    assert sql("SELECT * FROM customer where mktsegment='SQLENGINE'").count() == seg_now

    # :228-253 branching
    sql("DELETE FROM customer where mktsegment='SQLENGINE'")
    sql("INSERT INTO customer (custkey, name, mktsegment, account_balance, nation) VALUES (200000, 'TRINO', 'SQLENGINE', 10000, 'FRANCE')")
    sql("INSERT INTO customer (custkey, name, mktsegment, account_balance, nation) VALUES (200001, 'STARBURST', 'SQLENGINE', 10000, 'FRANCE')")
    sql("DROP BRANCH IF EXISTS dev IN TABLE customer")
    sql("CREATE BRANCH IF NOT EXISTS dev IN TABLE customer")
    branches = {r["name"] for r in sql("SHOW BRANCHES FROM TABLE customer").collect()}
    assert branches == {"main", "dev"}

    sql("INSERT INTO customer @ dev(custkey,name,mktsegment,account_balance,nation) VALUES (200005, 'SPARK', 'SQLENGINE', 1, 'ITALY')")
    sql("INSERT INTO customer @ dev(custkey,name,mktsegment,account_balance,nation) VALUES (200006, 'CLICKHOUSE', 'SQLENGINE', 2, 'SPAIN')")
    sql("DELETE FROM customer @ dev WHERE custkey = 200001")
    sql("UPDATE customer @ dev SET account_balance = 0 WHERE custkey = 200000")

    dev = {r.custkey: r.account_balance for r in sql(
        "SELECT * FROM customer FOR VERSION AS OF 'dev' where mktsegment='SQLENGINE'").collect()}
    main = {r.custkey: r.account_balance for r in sql(
        "SELECT * FROM customer FOR VERSION AS OF 'main' where mktsegment='SQLENGINE'").collect()}
    assert dev == {200000: 0.0, 200005: 1.0, 200006: 2.0}
    assert main == {200000: 10000.0, 200001: 10000.0}

    sql("ALTER BRANCH main IN TABLE customer FAST FORWARD TO dev")
    after = {r.custkey: r.account_balance for r in sql(
        "SELECT * FROM customer where mktsegment='SQLENGINE'").collect()}
    assert after == dev

    # :258-268 maintenance
    sql("ALTER TABLE customer EXECUTE expire_snapshots(retention_threshold => '7d')")
    sql("ALTER TABLE customer EXECUTE remove_orphan_files(retention_threshold => '7d')")
    sql("ALTER TABLE customer EXECUTE optimize(file_size_threshold => '100MB')")
    assert sql('SELECT * FROM "customer$files"').count() > 0
    sql("""ALTER TABLE customer EXECUTE optimize
           WHERE "$file_modified_time" > CAST(now() - INTERVAL '2' DAY AS DATE)""")
    # content stable through maintenance
    assert {r.custkey for r in sql("SELECT * FROM customer where mktsegment='SQLENGINE'").collect()} \
        == set(dev)

    # :272-281 register_table
    sql("DROP TABLE IF EXISTS new_customer")
    loc = eng.catalog.table("customer").location
    sql(f"""CALL system.register_table(
          schema_name => 'victorc_iceberg',
          table_name => 'new_customer',
          table_location => '{loc}')""")
    assert sql("SELECT * FROM new_customer").count() == sql("SELECT * FROM customer").count()

    # :286-295 federation aggregation (flagship)
    agg = sql("""SELECT
                     c.nation as nation,
                     round(sum(o.o_totalprice)) as total_price
                 FROM
                     customer c
                     join postgresql.demo.orders o on c.custkey = o.o_custkey
                 WHERE
                     c.mktsegment='AUTOMOBILE'
                 GROUP BY c.nation
                 ORDER BY total_price""").collect()
    assert len(agg) > 0 and agg[0].total_price <= agg[-1].total_price


def test_for_timestamp_as_of_literal_forms(eng):
    """ADVICE r2: a plain quoted instant ('2024-01-01 00:00:00') previously
    fell through the FOR-clause regex and died as an opaque Spark parse
    error, and Trino-style '... UTC' literals broke fromisoformat.  Both
    now resolve; garbage raises a clear unsupported-literal error."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS tt_probe")
    sql("CREATE OR REPLACE TABLE tt_probe AS SELECT * FROM tpch.sf1.nation")
    sql("""INSERT INTO tt_probe (n_nationkey, n_name, n_regionkey, n_comment)
           VALUES (777, 'ATLANTIS', 0, 'x')""")
    snaps = sql('SELECT * FROM "tt_probe$snapshots" ORDER BY committed_at').collect()
    iso = snaps[0].committed_at.strftime("%Y-%m-%d %H:%M:%S.%f")
    # plain quoted instant
    assert sql(f"SELECT * FROM tt_probe FOR TIMESTAMP AS OF '{iso}'").count() == 25
    # Trino-rendered zoned literal
    assert sql(f"SELECT * FROM tt_probe FOR TIMESTAMP AS OF TIMESTAMP '{iso} UTC'").count() == 25
    # current read still sees the insert
    assert sql("SELECT * FROM tt_probe").count() == 26
    with pytest.raises(ValueError, match="unsupported FOR TIMESTAMP AS OF"):
        sql("SELECT * FROM tt_probe FOR TIMESTAMP AS OF 'not-a-time'")


def test_execute_optimize_zorder(eng):
    """The clustering form of OPTIMIZE: zorder_by => ARRAY[...] routes to
    the Morton rewrite (unpartitioned table), content is invariant, and
    the clustering is recorded in table properties."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS z_probe")
    sql("CREATE OR REPLACE TABLE z_probe AS SELECT * FROM tpch.sf1.nation")
    before = {tuple(r) for r in sql("SELECT * FROM z_probe").collect()}
    sql("""ALTER TABLE z_probe EXECUTE optimize(
             file_size_threshold => '100MB',
             zorder_by => ARRAY['n_nationkey', 'n_regionkey'])""")
    t = eng.catalog.table("z_probe")
    assert t.meta.properties.get("zorder-by") == "n_nationkey,n_regionkey"
    assert {tuple(r) for r in sql("SELECT * FROM z_probe").collect()} == before


def test_alter_table_rename_column(eng):
    """ALTER TABLE ... RENAME COLUMN routes to the metadata-only rename:
    values survive under the new name, the old name is gone, and inserts
    address the new name."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS rn_probe")
    sql("CREATE OR REPLACE TABLE rn_probe AS SELECT * FROM tpch.sf1.nation")
    before = {(r.n_nationkey, r.n_name) for r in sql("SELECT * FROM rn_probe").collect()}
    sql("ALTER TABLE rn_probe RENAME COLUMN n_name TO nation_name")
    rows = sql("SELECT * FROM rn_probe").collect()
    assert {(r.n_nationkey, r.nation_name) for r in rows} == before
    assert "n_name" not in rows[0].asDict()


def test_insert_into_select(eng):
    """INSERT INTO ... SELECT appends the query result by position, works
    branch-targeted, and refuses an arity mismatch."""
    import pytest as _pytest

    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS ins_sel")
    sql("CREATE OR REPLACE TABLE ins_sel AS SELECT * FROM tpch.sf1.nation")
    n0 = sql("SELECT * FROM ins_sel").count()
    sql("""INSERT INTO ins_sel
           SELECT n_nationkey + 1000, n_name, n_regionkey
             FROM tpch.sf1.nation""")
    assert sql("SELECT * FROM ins_sel").count() == 2 * n0
    # branch-targeted: dev gets the extra rows, main does not
    sql("CREATE BRANCH IF NOT EXISTS dev IN TABLE ins_sel")
    sql("""INSERT INTO ins_sel @ dev
           SELECT n_nationkey + 2000, n_name, n_regionkey
             FROM tpch.sf1.nation""")
    assert sql("SELECT * FROM ins_sel FOR VERSION AS OF 'dev'").count() == 3 * n0
    assert sql("SELECT * FROM ins_sel").count() == 2 * n0
    with _pytest.raises(ValueError, match="arity"):
        sql("INSERT INTO ins_sel SELECT n_nationkey FROM tpch.sf1.nation")


def test_insert_overwrite_dynamic(eng):
    """INSERT OVERWRITE replaces exactly the partitions the SELECT
    produces (dynamic mode); unpartitioned tables fully replace."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS ovr")
    sql("CREATE OR REPLACE TABLE ovr WITH (partitioning = ARRAY['regionkey']) AS "
        "SELECT n_name AS name, n_regionkey AS regionkey FROM tpch.sf1.nation")
    n0 = sql("SELECT * FROM ovr").count()
    r0 = sql("SELECT * FROM ovr WHERE regionkey = 0").count()
    assert 0 < r0 < n0
    sql("INSERT OVERWRITE ovr SELECT 'REPLACED', 0")
    assert sql("SELECT * FROM ovr WHERE regionkey = 0").count() == 1
    # every other partition untouched
    assert sql("SELECT * FROM ovr").count() == n0 - r0 + 1
    assert sql("SELECT * FROM ovr WHERE name = 'REPLACED'").count() == 1


def test_truncate_table(eng):
    """TRUNCATE drops every row in one metadata-only commit; history and
    time travel survive; expire_snapshots can reclaim the files later."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS trunc_t")
    sql("CREATE OR REPLACE TABLE trunc_t AS SELECT * FROM tpch.sf1.nation")
    n0 = sql("SELECT * FROM trunc_t").count()
    assert n0 > 0
    t = eng.catalog.table("trunc_t")
    pre = t.meta.snapshots[-1].snapshot_id
    sql("TRUNCATE TABLE trunc_t")
    assert sql("SELECT * FROM trunc_t").count() == 0
    # time travel still sees the pre-truncate rows
    assert sql(f"SELECT * FROM trunc_t FOR VERSION AS OF {pre}").count() == n0
    snap = t.refresh().meta.snapshots[-1]
    assert snap.operation == "delete" and snap.summary["truncate"] == "true"


def test_show_and_describe(eng):
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS desc_t")
    sql("CREATE OR REPLACE TABLE desc_t AS SELECT * FROM tpch.sf1.nation")
    sql("ALTER TABLE desc_t ADD COLUMN phone varchar DEFAULT '+33606060606'")
    schemas = {r.schema for r in sql("SHOW SCHEMAS").collect()}
    assert "victorc_iceberg" in schemas
    tables = {r.table for r in sql("SHOW TABLES").collect()}
    assert "desc_t" in tables
    cols = {r.column: (r.type, r.default) for r in sql("DESCRIBE desc_t").collect()}
    assert cols["phone"] == ("string", "+33606060606")
    assert "n_nationkey" in cols


def test_frontend_where_prunes_manifest(eng):
    """VERDICT r4 #1: the statement's WHERE must reach the manifest pruner
    through Engine.sql — a partition predicate lists strictly fewer files
    than the snapshot total (``inputFiles()`` reflects the pruned scan, not
    a post-scan filter), with values identical to the unpruned read."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS prune_t")
    sql("CREATE OR REPLACE TABLE prune_t WITH (partitioning = ARRAY['regionkey']) AS "
        "SELECT n_name AS name, n_nationkey AS nationkey, n_regionkey AS regionkey "
        "FROM tpch.sf1.nation")
    full = sql("SELECT * FROM prune_t")
    total_files = len(full.inputFiles())
    assert total_files >= 5  # at least one file per region partition
    q = sql("SELECT name FROM prune_t WHERE regionkey = 2 ORDER BY name")
    assert 0 < len(q.inputFiles()) < total_files
    expect = sorted(r.name for r in full.collect() if r.regionkey == 2)
    assert [r.name for r in q.collect()] == expect
    # IN-list prunes to the union of the matching partitions
    q2 = sql("SELECT name FROM prune_t WHERE regionkey IN (0, 3)")
    assert len(q.inputFiles()) <= len(q2.inputFiles()) < total_files
    # version-pinned reads prune too
    q3 = sql("SELECT name FROM prune_t FOR VERSION AS OF 'main' WHERE regionkey = 2")
    assert len(q3.inputFiles()) == len(q.inputFiles())
    assert sorted(r.name for r in q3.collect()) == expect


def test_frontend_join_where_prunes_each_side(eng):
    """In a join block, each engine table is pruned only by the conjuncts
    naming ITS OWN columns; predicates on the other table's columns are
    skipped for that side (schema-membership filter)."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS jp_nation")
    sql("DROP TABLE IF EXISTS jp_region")
    sql("CREATE OR REPLACE TABLE jp_nation WITH (partitioning = ARRAY['nregion']) AS "
        "SELECT n_name AS nname, n_regionkey AS nregion FROM tpch.sf1.nation")
    sql("CREATE OR REPLACE TABLE jp_region WITH (partitioning = ARRAY['rkey']) AS "
        "SELECT r_regionkey AS rkey, r_name AS rname FROM tpch.sf1.region")
    nation_total = len(sql("SELECT * FROM jp_nation").inputFiles())
    region_total = len(sql("SELECT * FROM jp_region").inputFiles())
    q = sql("SELECT nname, rname FROM jp_nation JOIN jp_region ON nregion = rkey "
            "WHERE nregion = 1 AND rname = 'AMERICA' ORDER BY nname")
    # both sides pruned: nregion=1 prunes jp_nation partitions, rname's
    # min/max stats prune jp_region files; the combined scan shrinks
    assert len(q.inputFiles()) < nation_total + region_total
    rows = q.collect()
    assert len(rows) == 5 and all(r.rname == "AMERICA" for r in rows)


def test_frontend_subquery_where_stays_in_its_block(eng):
    """A subquery's WHERE must not prune the outer table (and vice versa):
    the inner block's predicate names a column that ALSO exists on the
    outer table — attributing it outward would wrongly drop partitions."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS sq_outer")
    sql("DROP TABLE IF EXISTS sq_inner")
    sql("CREATE OR REPLACE TABLE sq_outer WITH (partitioning = ARRAY['regionkey']) AS "
        "SELECT n_name AS name, n_regionkey AS regionkey FROM tpch.sf1.nation")
    sql("CREATE OR REPLACE TABLE sq_inner WITH (partitioning = ARRAY['regionkey']) AS "
        "SELECT r_regionkey AS regionkey, r_name AS rname FROM tpch.sf1.region")
    outer_total = len(sql("SELECT * FROM sq_outer").inputFiles())
    q = sql("SELECT name FROM sq_outer WHERE regionkey IN "
            "(SELECT regionkey FROM sq_inner WHERE regionkey = 2)")
    # outer scan NOT pruned (its block's WHERE is the unparsable IN-subquery);
    # results still correct
    files = q.inputFiles()
    outer_files = [f for f in files if "sq_outer" in f]
    assert len(outer_files) == outer_total
    assert sorted(r.name for r in q.collect()) == sorted(
        r.name for r in sql("SELECT name FROM sq_outer WHERE regionkey = 2").collect())


def test_frontend_foreign_disjunct_does_not_prune(eng):
    """A disjunction mixing this table's column with another table's must
    not prune (one foreign branch invalidates the whole OR) — and the
    answer still matches the unpruned evaluation."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS fd_nation")
    sql("DROP TABLE IF EXISTS fd_region")
    sql("CREATE OR REPLACE TABLE fd_nation WITH (partitioning = ARRAY['nregion']) AS "
        "SELECT n_name AS nname, n_regionkey AS nregion FROM tpch.sf1.nation")
    sql("CREATE OR REPLACE TABLE fd_region AS "
        "SELECT r_regionkey AS rkey, r_name AS rname FROM tpch.sf1.region")
    nation_total = len(sql("SELECT * FROM fd_nation").inputFiles())
    q = sql("SELECT nname FROM fd_nation JOIN fd_region ON nregion = rkey "
            "WHERE nregion = 1 OR rname = 'ASIA'")
    files = [f for f in q.inputFiles() if "fd_nation" in f]
    assert len(files) == nation_total  # no pruning on the mixed OR
    got = sorted(r.nname for r in q.collect())
    expect = sorted(
        r.nname for r in sql(
            "SELECT nname, nregion, rname FROM fd_nation "
            "JOIN fd_region ON nregion = rkey").collect()
        if r.nregion == 1 or r.rname == "ASIA")
    assert got == expect


def test_explain_select(eng):
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS exp_t")
    sql("CREATE OR REPLACE TABLE exp_t AS SELECT * FROM tpch.sf1.nation")
    plan = sql("EXPLAIN SELECT n_name FROM exp_t WHERE n_nationkey = 3").collect()[0].plan
    assert "Physical Plan" in plan and "Scan parquet" in plan


def test_trino_function_dialect(eng):
    """Trino->Spark function translation in the SELECT rewriter (missing
    #1 from the r4 verdict): renames, arg-shuffles and semantic shims,
    checked against hand-computed values.  Unmapped complex calls fall
    through verbatim and fail loudly in Spark, never silently."""
    sql = eng.sql
    row = sql(
        "SELECT approx_distinct(n_regionkey) AS ad,"
        "       arbitrary(n_regionkey) AS arb,"
        "       strpos('hello world', 'world') AS sp,"
        "       day_of_year(DATE '2024-02-01') AS doy,"
        "       week_of_year(DATE '2024-01-08') AS woy,"
        "       levenshtein_distance('kitten', 'sitting') AS lev,"
        "       codepoint('A') AS cp,"
        "       starts_with('spark', 'sp') AS sw,"
        "       to_hex(CAST('f' AS BINARY)) AS th,"
        "       to_unixtime(TIMESTAMP '1970-01-01 00:01:00 UTC') AS tu,"
        "       date_add('day', 3, DATE '2024-01-01') AS da,"
        "       date_diff('day', DATE '2024-01-01', DATE '2024-01-31') AS dd,"
        "       day_of_week(DATE '2024-01-01') AS dw_mon,"
        "       day_of_week(DATE '2024-01-07') AS dw_sun,"
        "       bitwise_and(12, 10) AS ba,"
        "       bitwise_or(12, 10) AS bo,"
        "       bitwise_xor(12, 10) AS bx,"
        "       date_parse('2024/01/15', '%Y/%m/%d') AS dp "
        "FROM tpch.sf1.nation"
    ).head()
    assert row.ad == 5 and row.arb in (0, 1, 2, 3, 4)
    assert row.sp == 7
    assert row.doy == 32 and row.woy == 2
    assert row.lev == 3 and row.cp == 65 and row.sw is True
    assert row.th == "66"
    assert row.tu == 60.0
    assert str(row.da).startswith("2024-01-04")
    assert row.dd == 30
    assert row.dw_mon == 1 and row.dw_sun == 7  # ISO numbering
    assert (row.ba, row.bo, row.bx) == (8, 14, 6)
    assert str(row.dp).startswith("2024-01-15")


def test_alter_branch_set_retention(eng):
    """ALTER BRANCH ... SET RETENTION wires the per-ref expire window
    (VERDICT r4 #8) through the SQL surface: the override lands in table
    metadata and a retention-0 expire keeps the branch's young history."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS rt_probe")
    sql("CREATE OR REPLACE TABLE rt_probe AS SELECT * FROM tpch.sf1.nation")
    sql("INSERT INTO rt_probe (n_nationkey, n_name, n_regionkey, n_comment) VALUES (900, 'A', 0, 'x')")
    sql("CREATE BRANCH IF NOT EXISTS dev IN TABLE rt_probe")
    sql("INSERT INTO rt_probe @ dev(n_nationkey, n_name, n_regionkey, n_comment) VALUES (901, 'B', 0, 'x')")
    sql("ALTER BRANCH dev IN TABLE rt_probe SET RETENTION "
        "(max_snapshot_age => '7d', min_snapshots_to_keep => 2)")
    t = eng.catalog.table("rt_probe")
    assert t.meta.ref_retention["dev"] == {
        "max_snapshot_age_ms": 7 * 86_400_000, "min_snapshots_to_keep": 2}
    n_before = len(t.meta.snapshots)
    sql("ALTER TABLE rt_probe EXECUTE expire_snapshots(retention_threshold => '0s')")
    # every snapshot is young (7d window) and an ancestor of dev: all kept
    assert len(t.refresh().meta.snapshots) == n_before


def test_unnest_rewrite(eng):
    """CROSS JOIN UNNEST(arr) AS t(x) flattens via LATERAL VIEW explode."""
    rows = eng.sql(
        "SELECT n_nationkey, x "
        "FROM tpch.sf1.nation CROSS JOIN UNNEST(sequence(1, 2)) AS u(x) "
        "WHERE n_nationkey = 0 ORDER BY x"
    ).collect()
    assert [(r.n_nationkey, r.x) for r in rows] == [(0, 1), (0, 2)]


def test_frontend_alias_qualified_where_prunes(eng):
    """The reference's flagship filter shape — ``FROM customer c WHERE
    c.mktsegment='X'`` — must prune through the alias: the qualifier is
    stripped for THIS table only (other tables' qualifiers are left and
    skipped), and string literals are mask-protected from the rewrite."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS al_t")
    sql("CREATE OR REPLACE TABLE al_t WITH (partitioning = ARRAY['regionkey']) AS "
        "SELECT n_name AS name, n_regionkey AS regionkey FROM tpch.sf1.nation")
    total = len(sql("SELECT * FROM al_t").inputFiles())
    q = sql("SELECT a.name FROM al_t AS a WHERE a.regionkey = 2 ORDER BY a.name")
    assert 0 < len(q.inputFiles()) < total
    expect = sorted(r.name for r in sql("SELECT name FROM al_t WHERE regionkey = 2").collect())
    assert [r.name for r in q.collect()] == expect
    # bare-alias form (no AS) prunes too
    q2 = sql("SELECT a.name FROM al_t a WHERE a.regionkey = 2")
    assert len(q2.inputFiles()) == len(q.inputFiles())
    # a literal containing an alias-dot pattern must NOT be rewritten:
    # correct empty result, and no pruning on the corrupted-literal column
    q3 = sql("SELECT a.name FROM al_t a WHERE a.name = 'a.name' AND a.regionkey = 2")
    assert q3.count() == 0


def test_sql_comments_stripped(eng):
    """Comments are lexed away before dispatch: a commented-out WHERE must
    neither reach the pruner nor break statement-shape matching, and
    comment markers inside string literals are content."""
    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS cm_t")
    sql("""-- create the probe table
        CREATE OR REPLACE TABLE cm_t WITH (partitioning = ARRAY['regionkey']) AS
        SELECT n_name AS name, n_regionkey AS regionkey /* all regions */
        FROM tpch.sf1.nation""")
    total = len(sql("SELECT * FROM cm_t").inputFiles())
    # the commented WHERE must not prune or filter anything
    q = sql("SELECT name FROM cm_t -- WHERE regionkey = 2\n ORDER BY name")
    assert len(q.inputFiles()) == total
    assert q.count() == 25
    # a '--' inside a literal is content, not a comment
    r = sql("SELECT '--not a comment' AS v").head()
    assert r.v == "--not a comment"
    # block comment containing parens must not corrupt depth tracking
    q2 = sql("SELECT name FROM cm_t /* ( WHERE ) */ WHERE regionkey = 2")
    assert 0 < len(q2.inputFiles()) < total and q2.count() == 5


def test_explain_analyze(eng):
    """EXPLAIN ANALYZE executes and reports the AQE-final plan + metrics —
    WITHOUT materializing the profiled query's result set driver-side
    (VERDICT r9 #1: the old ``len(df.collect())`` made the profiling
    statement itself the OOM on a 100 TB SELECT; the row count now comes
    from a JVM-side RDD.count over the query's own executed plan)."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:  # older pyspark
        from pyspark.sql import DataFrame as _CDF

    sql = eng.sql
    sql("CREATE SCHEMA IF NOT EXISTS iceberg_glue.victorc_iceberg WITH (location = 's3://victorc-data/iceberg/')")
    sql("USE iceberg_glue.victorc_iceberg")
    sql("DROP TABLE IF EXISTS ea_t")
    sql("CREATE OR REPLACE TABLE ea_t AS SELECT * FROM tpch.sf1.nation")
    collected: list[int] = []
    orig_collect = _CDF.collect

    def spy_collect(self):
        out = orig_collect(self)
        collected.append(len(out))
        return out

    _CDF.collect = spy_collect
    try:
        res = sql("EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n FROM ea_t GROUP BY n_regionkey")
    finally:
        _CDF.collect = orig_collect
    assert collected == [], f"EXPLAIN ANALYZE collect()ed: {collected}"
    row = res.head()
    assert row.n_rows == 5 and row.elapsed_ms >= 0
    assert "Initial Plan" not in row.plan
    assert "HashAggregate" in row.plan or "Aggregate" in row.plan


def test_execute_rewrite_equality_deletes(spark, tmp_path):
    """ALTER TABLE ... EXECUTE rewrite_equality_deletes: the SQL surface of
    the eq->position compaction (state unchanged, equality files gone)."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_eqsql"))
    eng.sql("CREATE SCHEMA s")
    eng.sql("USE s")
    t = eng.catalog.ctas(
        "tbl", spark.createDataFrame([{"k": i, "v": f"v{i}"} for i in range(6)])
    )
    t.upsert_by_key(spark.createDataFrame([{"k": 2, "v": "N2"}]), ["k"])
    eng.sql("ALTER TABLE tbl EXECUTE rewrite_equality_deletes")
    t.refresh()
    man = t._manifest(t._resolve())
    assert not [d for d in man.delete_files if d.content == "equality"]
    got = {r.k: r.v for r in eng.sql("SELECT * FROM tbl").collect()}
    assert got[2] == "N2" and len(got) == 6


def test_keyword_split_ignores_double_quoted_identifiers():
    """ADVICE r8 (low): _top_keyword_index must skip keyword matches inside
    double-quoted identifiers, not just single-quoted literals — a column
    named "WHERE" or "WHERE_FLAG" must not terminate the SET list; same for
    the MERGE WHEN/THEN/AND scan.  _split_top likewise must not split on a
    comma inside a quoted identifier."""
    from iceberg_trino_sql_demo_spark.engine import (
        _split_top,
        _top_keyword_index,
    )

    s = '"WHERE_FLAG" = 1 WHERE k = 1'
    idx = _top_keyword_index(s, "WHERE")
    assert s[idx:].startswith("WHERE k"), s[idx:]
    s2 = 'a = "WHERE" WHERE k = 2'
    assert s2[_top_keyword_index(s2, "WHERE"):] == "WHERE k = 2"
    # single-quote behavior unchanged
    s3 = "s = 'a WHERE b' WHERE k = 1"
    assert s3[_top_keyword_index(s3, "WHERE"):] == "WHERE k = 1"
    # a double quote inside a string literal must NOT open identifier mode
    s4 = "s = 'he said \"x' WHERE k = 3"
    assert s4[_top_keyword_index(s4, "WHERE"):] == "WHERE k = 3"
    assert _top_keyword_index('x = "AND,THEN"', "AND") == -1
    assert _split_top('a = "x,y", b = 2') == ['a = "x,y"', "b = 2"]


def test_frontend_select_projects_segment_scan(spark, tmp_path, monkeypatch):
    """A narrow frontend SELECT over a pyds-routed table plans a NARROW
    BatchScan (VERDICT r9 #5): _projected_for's identifier extraction
    reaches Table.df(columns=...), so unreferenced columns never cross
    the Arrow boundary.  Star queries keep the full width."""
    from iceberg_trino_sql_demo_spark.engine import Engine
    from iceberg_trino_sql_demo_spark.sources import table as tmod

    eng = Engine(spark, str(tmp_path / "wh_proj"))
    eng.sql("CREATE SCHEMA p")
    eng.sql("USE p")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    eng.catalog.ctas("orders_p", src)

    monkeypatch.setattr(tmod, "_PYDS_SCAN_FILES", 1)
    q = eng.sql("SELECT o_orderkey, sum(o_totalprice) AS s FROM orders_p "
                "WHERE o_custkey > 0 GROUP BY o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan ice_table" in plan
    # scanned: the referenced trio; never decoded: the rest
    assert "o_orderdate" not in plan and "o_orderpriority" not in plan
    assert q.count() > 0
    # count(*)-only still answers (fn(*) is not a star projection bail...
    # it simply projects nothing and keeps full width conservatively)
    n_all = eng.sql("SELECT count(*) AS n FROM orders_p").head().n
    assert n_all == src.count()
    # SELECT * keeps every column
    star = eng.sql("SELECT * FROM orders_p")
    assert [f.name for f in star.schema.fields] == [f.name for f in src.schema.fields]
    assert star.count() == n_all


def test_analyze_stats_reorder_joins(spark, tmp_path):
    """VERDICT r9 #6: ANALYZE row counts now drive the frontend's join
    ORDER.  A 3-join chain written biggest-first is rebuilt smallest-
    first once every table carries stats — and left exactly as written
    when any table lacks them, when the chain has outer joins, or when
    the reorder would dangle an ON reference.  Values are identical
    either way (inner joins commute)."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_cbo"))
    eng.sql("CREATE SCHEMA cbo")
    eng.sql("USE cbo")
    big = spark.range(1000).selectExpr("id AS k", "id % 10 AS grp")
    mid = spark.range(100).selectExpr("id AS k", "id % 5 AS k2")
    small = spark.range(10).selectExpr("id AS k2", "id * 100 AS bonus")
    eng.catalog.ctas("big_t", big)
    eng.catalog.ctas("mid_t", mid)
    eng.catalog.ctas("small_t", small)

    q = ("SELECT b.grp, count(b.k) AS n, sum(t.bonus) AS s "
         "FROM big_t b join mid_t m on b.k = m.k "
         "join small_t t on m.k2 = t.k2 "
         "GROUP BY b.grp ORDER BY b.grp")

    # without stats: untouched
    assert eng._reorder_joins(q) == q
    before = [tuple(r) for r in eng.sql(q).collect()]

    for t in ("big_t", "mid_t", "small_t"):
        eng.sql(f"ANALYZE {t}")
    rewritten = eng._reorder_joins(q)
    assert rewritten != q
    order = [rewritten.index(t) for t in ("small_t", "mid_t", "big_t")]
    assert order == sorted(order), rewritten
    # every ON condition survives, attached where its aliases are in scope
    assert "b.k = m.k" in rewritten and "m.k2 = t.k2" in rewritten
    after = [tuple(r) for r in eng.sql(q).collect()]
    assert after == before and len(after) == 10

    # outer joins / subqueries / pins stay as written even with stats
    lj = q.replace("join small_t", "left join small_t")
    assert eng._reorder_joins(lj) == lj
    sub = ("SELECT * FROM (SELECT k FROM big_t) b join mid_t m on b.k = m.k "
           "join small_t t on m.k2 = t.k2")
    assert eng._reorder_joins(sub) == sub
    pin = q.replace("FROM big_t b", "FROM big_t FOR VERSION AS OF 1 b")
    assert eng._reorder_joins(pin) == pin


def test_r10_review_fix_regressions(spark, tmp_path):
    """Pins for the r10 review findings on the frontend surfaces:
    (1) a join chain whose ON condition carries an UNQUALIFIED column
    stays in written order (reordering could emit it out of scope);
    (2) projection extraction is case-insensitive (Spark SQL is);
    (3) FOR VERSION AS OF on a JDBC catalog raises loudly instead of
    silently returning current rows."""
    from iceberg_trino_sql_demo_spark.engine import Engine
    from iceberg_trino_sql_demo_spark.sources.jdbc_fed import (
        DERBY_DRIVER, derby_from_sf_dir,
    )

    eng = Engine(spark, str(tmp_path / "wh_rev"))
    eng.sql("CREATE SCHEMA rv")
    eng.sql("USE rv")
    for nm, n in (("big_r", 1000), ("mid_r", 100), ("small_r", 10)):
        eng.catalog.ctas(nm, spark.range(n).selectExpr(
            "id AS k", "id % 5 AS k2", "id * 2 AS v"))
        eng.sql(f"ANALYZE {nm}")
    # (1) unqualified 'k2' in the second ON: bail, keep written order
    q = ("SELECT b.k FROM big_r b join mid_r m on b.k = m.k "
         "join small_r t on t.k2 = k2")
    assert eng._reorder_joins(q) == q
    # fully-qualified chain still reorders smallest-first
    q2 = ("SELECT b.k FROM big_r b join mid_r m on b.k = m.k "
          "join small_r t on m.k2 = t.k2")
    assert eng._reorder_joins(q2) != q2

    # (2) mixed-case column references survive the declared projection
    from iceberg_trino_sql_demo_spark.sources import table as tmod
    import unittest.mock as mock

    with mock.patch.object(tmod, "_PYDS_SCAN_FILES", 1):
        rows = eng.sql("SELECT K, V FROM big_r WHERE k2 = 3").collect()
    assert rows and all(r.V == r.K * 2 for r in rows)

    # (3) time travel over JDBC is refused loudly
    db = str(tmp_path / "derby" / "db")
    url = derby_from_sf_dir(spark, db, "/root/testdata/sf0.001",
                            tables=("nation",))
    eng.attach_jdbc_catalog("postgresql", url, driver=DERBY_DRIVER,
                            table_map={"demo.nation": "nation"})
    with pytest.raises(ValueError, match="JDBC"):
        eng.sql("SELECT * FROM postgresql.demo.nation FOR VERSION AS OF 3")


def test_drop_schema_semantics(spark, tmp_path):
    """DROP SCHEMA (r11, VERDICT r10 #5): empty schema drops its registry
    entry; a non-empty schema refuses loudly (no CASCADE); IF EXISTS on a
    missing name is silent while a bare DROP raises; recreating a dropped
    schema does NOT resurrect old tables."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_ds"))
    eng.sql("CREATE SCHEMA ds1")
    eng.sql("USE ds1")
    eng.catalog.ctas("t1", spark.range(3).selectExpr("id AS k"))
    with pytest.raises(ValueError, match="not empty"):
        eng.sql("DROP SCHEMA ds1")
    eng.sql("DROP TABLE t1")
    eng.sql("DROP SCHEMA ds1")
    assert "ds1" not in eng.catalog.data["schemas"]
    # current schema was ds1 -> cleared, so unqualified names now refuse
    with pytest.raises(ValueError, match="no current schema"):
        eng.catalog.table("t1")
    eng.sql("DROP SCHEMA IF EXISTS ds1")  # silent
    with pytest.raises(KeyError):
        eng.sql("DROP SCHEMA ds1")
    # recreate: a fresh schema with no inherited tables
    eng.sql("CREATE SCHEMA ds1")
    eng.sql("USE ds1")
    with pytest.raises(KeyError):
        eng.catalog.table("t1")


def test_r11_reorder_star_and_stats_guards(spark, tmp_path):
    """Pins for the r11 advice findings on the stats-driven join reorder:
    (1) a bare projection star (SELECT * / alias.*) bails the reorder —
    star projections materialize columns in FROM-clause order, so a
    table reorder would silently change the output column order;
    count(*) and arithmetic '*' do NOT bail.  (2) merged ON conditions
    are emitted parenthesized so a top-level OR keeps its scope.
    (3) _table_rows refuses catalog-qualified foreign names instead of
    resolving them to a same-named engine table's stats."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_r11"))
    eng.sql("CREATE SCHEMA rx")
    eng.sql("USE rx")
    for nm, n in (("big_x", 1000), ("mid_x", 100), ("small_x", 10)):
        eng.catalog.ctas(nm, spark.range(n).selectExpr(
            "id AS k", "id % 5 AS k2", "id * 2 AS v"))
        eng.sql(f"ANALYZE {nm}")

    chain = ("FROM big_x b join mid_x m on b.k = m.k "
             "join small_x t on m.k2 = t.k2")
    # (1) star projections: written order preserved
    for head in ("SELECT * ", "SELECT b.* ", "SELECT DISTINCT * ",
                 "SELECT b.k, t.* "):
        q = head + chain
        assert eng._reorder_joins(q) == q, head
        # and the result shape is the written-order shape
        if head == "SELECT * ":
            cols = [f.name for f in eng.sql(q).schema.fields]
            assert cols[0] == "k" and len(cols) == 9
    # aggregate star and arithmetic star still reorder
    q_agg = "SELECT count(*) AS n " + chain
    assert eng._reorder_joins(q_agg) != q_agg
    q_arith = "SELECT b.k * 2 AS kk, t.v AS tv " + chain
    assert eng._reorder_joins(q_arith) != q_arith
    # a string literal containing '*' is not a projection star
    q_lit = "SELECT concat(',*', t.v) AS s " + chain
    assert eng._reorder_joins(q_lit) != q_lit

    # (2) every emitted ON condition is parenthesized, so a top-level OR
    # keeps its own scope even if two pool conditions merge on one join
    q_or = ("SELECT b.k AS bk " + chain).replace(
        "on m.k2 = t.k2", "on m.k2 = t.k2 OR m.k = t.k2")
    rw = eng._reorder_joins(q_or)
    assert rw != q_or
    assert "(m.k2 = t.k2 OR m.k = t.k2)" in rw, rw
    assert sorted(tuple(r) for r in eng.sql(q_or).collect()) == sorted(
        tuple(r) for r in spark.sql(
            "SELECT b.id AS bk FROM range(1000) b "
            "JOIN (SELECT id, id % 5 AS k2 FROM range(100)) m ON b.id = m.id "
            "JOIN (SELECT id % 5 AS k2 FROM range(10)) t "
            "ON m.k2 = t.k2 OR m.id = t.k2").collect())

    # (3) catalog-qualified names never borrow engine-table stats
    assert eng._table_rows("big_x") == 1000
    assert eng._table_rows("rx.big_x") == 1000
    assert eng._table_rows("otherschema.big_x") is None
    eng.jdbc_catalogs["postgresql"] = {"url": "x", "driver": None,
                                       "table_map": {}, "options": {}}
    assert eng._table_rows("postgresql.rx.big_x") is None


def test_drop_schema_name_containing_if_and_qualified(spark, tmp_path):
    """ADVICE r11: IF EXISTS must be its own capture group — substring
    probing the whole match turned ``DROP SCHEMA shift`` (name contains
    'IF') into a silent no-op on a MISSING schema; and a qualified
    ``memory.sales`` must reduce through _last like every other schema
    handler instead of never matching the registry."""
    from iceberg_trino_sql_demo_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_dsn"))
    # name containing IF: a missing-schema bare drop must RAISE
    with pytest.raises(KeyError):
        eng.sql("DROP SCHEMA shift")
    eng.sql("CREATE SCHEMA shift")
    eng.sql("DROP SCHEMA shift")  # and an existing one drops
    assert "shift" not in eng.catalog.data["schemas"]
    # qualified name resolves to the schema registry entry
    eng.sql("CREATE SCHEMA sales")
    eng.sql("DROP SCHEMA memory.sales")
    assert "sales" not in eng.catalog.data["schemas"]
    eng.sql("DROP SCHEMA IF EXISTS memory.sales")  # silent
