"""Phase 6 tests: schema evolution (defaults, variant, nanos), partition
evolution, views/MVs — reference :159-207 and :51-61."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.functions.trino import (
    format_ns_timestamp,
    parse_ns_timestamp,
)
from iceberg_trino_sql_demo_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    c = Catalog(spark, str(tmp_path_factory.mktemp("wh_evo")))
    c.create_schema("demo")
    c.use("demo")
    return c


@pytest.fixture(scope="module")
def t(cat, spark, sf_dir):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat.ctas("customer", customer_pipeline(spark, sf_dir), partitioning=["mktsegment"])
    return cat.table("customer")


def test_add_column_with_default(t):
    """Reference :164-171: ADD COLUMN phone varchar DEFAULT '+33606060606';
    old rows AND inserts omitting the column read the default back."""
    base = t.df().count()
    t.add_column("phone", "string", default="+33606060606")
    # old rows surface the default (initial-default, not NULL)
    vals = t.df().select("phone").distinct().collect()
    assert [r.phone for r in vals] == ["+33606060606"]
    # :168 insert omitting phone
    t.insert([{"custkey": 200000, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
               "account_balance": 1.0, "nation": "FRANCE"}])
    got = t.df(where="custkey = 200000").collect()[0]
    assert got.phone == "+33606060606"
    assert t.df().count() == base + 1


def test_variant_column(t):
    """Reference :173-181: ADD COLUMN message JSON, insert a JSON literal,
    query it, then DROP COLUMN."""
    t.add_column("message", "variant")
    t.insert([{"custkey": 200010, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
               "account_balance": 1.0, "nation": "FRANCE",
               "message": '{"company": "Starburst"}'}])
    row = (
        t.df(where="custkey = 200010")
        .select(F.variant_get("message", "$.company", "string").alias("company"))
        .collect()[0]
    )
    assert row.company == "Starburst"
    # old rows: variant is null
    assert t.df(where="custkey = 200000").select("message").collect()[0].message is None

    t.drop_column("message")
    assert "message" not in t.df().columns
    # files are NOT rewritten by drop (reference: metadata-only op)
    assert t.df().count() > 0


def test_readd_after_drop_does_not_resurface_old_bytes(t):
    """Dropping then re-adding a same-named column must not leak old values
    out of existing files (SURVEY.md §1.4 stable column ids)."""
    t.add_column("message", "string")
    vals = {r.message for r in t.df(where="custkey = 200010").select("message").collect()}
    assert vals == {None}, "old variant bytes must not resurface"
    t.drop_column("message")


def test_nanos_timestamp(t):
    """Reference :183-189: TIMESTAMP(9) survives with full nanosecond
    precision (stored as long nanos; Spark's native ceiling is micros)."""
    t.add_column("nanos", "timestamp_ns")
    lit = "2025-08-21 12:34:56.123456789"
    t.insert([{"custkey": 200020, "name": "COMMANDER BUN BUN", "mktsegment": "SQLENGINE",
               "account_balance": 1.0, "nation": "FRANCE", "nanos": lit}])
    raw = t.df(where="custkey = 200020").collect()[0].nanos
    assert raw == parse_ns_timestamp(lit)
    assert format_ns_timestamp(raw) == lit  # all nine digits intact


def test_rename_column_metadata_only(cat, spark, sf_dir):
    """RENAME COLUMN (beyond the reference's add/drop surface): old files
    resolve under the new name through the by-id projection, no data file
    is rewritten, partition transforms on the renamed column keep
    pruning, and a rename onto an existing name is refused."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat.ctas(
        "cust_rn", customer_pipeline(spark, sf_dir), partitioning=["mktsegment"]
    )
    t2 = cat.table("cust_rn")
    files0 = {f.path for f in t2._manifest(t2._resolve()).data_files}
    before = {(r.custkey, r.account_balance) for r in t2.df().collect()}

    # rename the PARTITION SOURCE column itself — spec references by id
    t2.rename_column("mktsegment", "segment")
    t2.rename_column("account_balance", "balance")
    files1 = {f.path for f in t2._manifest(t2._resolve()).data_files}
    assert files1 == files0, "rename must not rewrite data files"

    after = {(r.custkey, r.balance) for r in t2.df().collect()}
    assert after == before
    assert "account_balance" not in t2.df().columns
    # writes under the new names land in the same columns/partitions
    t2.insert([{"custkey": 900100, "name": "RN", "segment": "SQLENGINE",
                "balance": 3.5, "nation": "FRANCE"}])
    got = t2.df(where="segment = 'SQLENGINE' AND custkey = 900100").collect()
    assert [r.balance for r in got] == [3.5]

    with pytest.raises(ValueError):
        t2.rename_column("balance", "segment")
    with pytest.raises(KeyError):
        t2.rename_column("no_such_col", "x")


def test_partition_evolution(t):
    """Reference :191-209: change spec twice; old files keep their old spec;
    $partitions shows rows grouped per spec."""
    spec0 = t.meta.default_spec_id
    t.set_partitioning(["mktsegment", "custkey"])
    t.insert([{"custkey": 200001, "name": "TRINO", "mktsegment": "SQLENGINE",
               "account_balance": 1.0, "nation": "FRANCE"}])
    t.set_partitioning(["nation"])
    t.insert([{"custkey": 200002, "name": "STARBURST", "mktsegment": "SQLENGINE",
               "account_balance": 2.0, "nation": "SPAIN"}])

    parts = t.meta_df("partitions").collect()
    spec_ids = {r.spec_id for r in parts}
    assert len(spec_ids) == 3, f"expected 3 specs live, got {spec_ids}"
    # all rows still readable across specs
    seg = {r.custkey for r in t.df(where="mktsegment='SQLENGINE'").collect()}
    assert {200000, 200010, 200020, 200001, 200002} <= seg
    # new-spec files carry nation partition values
    files = t.meta_df("files").collect()
    assert any('"nation"' in r.partition for r in files if r.content == 0)
    assert spec0 != t.meta.default_spec_id


def test_views_and_mvs(cat, spark, sf_dir):
    """Reference :51-61: view re-executes; MV materializes + refreshes."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation_src")
    cat.create_view("my_view", "SELECT * FROM nation_src")
    assert cat.read_view("my_view").count() == 25

    cat.create_materialized_view("my_mv", "SELECT * FROM nation_src",
                                 refresh_schedule="30 04 * * 0")
    mv = cat.table("my_mv")
    assert mv.df().count() == 25
    assert mv.meta.properties.get("refresh_schedule") == "30 04 * * 0"

    # refresh re-runs the stored SQL and commits a replace snapshot
    cat.refresh_materialized_view("my_mv")
    mv = cat.table("my_mv")
    ops = [s.operation for s in mv.meta.snapshots]
    assert ops[-1] == "replace"
    assert mv.df().count() == 25


def test_mv_refresh_schedule_evaluation(cat):
    """The stored cron is evaluated, not just retained: due_materialized_views
    reports the MV exactly when a '30 04 * * 0' (Sun 04:30) fire lies
    between its last refresh commit and now (reference :57-59)."""
    from datetime import datetime, timedelta

    from iceberg_trino_sql_demo_spark.plans.cron import is_due, next_fire

    # 2024-01-01 is a Monday; next Sunday 04:30 is Jan 7
    assert next_fire("30 04 * * 0", datetime(2024, 1, 1)) == datetime(2024, 1, 7, 4, 30)
    # ranges/steps/lists + the vixie dom-OR-dow rule
    assert next_fire("*/15 8-9 * * *", datetime(2024, 3, 1, 8, 50)) == datetime(
        2024, 3, 1, 9, 0
    )
    assert next_fire("0 0 1 * 3", datetime(2024, 1, 1)) == datetime(2024, 1, 3)
    # a stepped dom ('*/2') still sets the vixie star flag, so dom AND dow
    # apply together: next odd-numbered Monday after Jan 1 2024 is Jan 15
    # (Jan 8 is a Monday but an even day)
    assert next_fire("0 0 */2 * 1", datetime(2024, 1, 1)) == datetime(2024, 1, 15)
    assert is_due("30 04 * * 0", datetime(2024, 1, 1), datetime(2024, 1, 8))
    assert not is_due("30 04 * * 0", datetime(2024, 1, 7, 5, 0), datetime(2024, 1, 8))

    # the catalog wires the last snapshot timestamp into the same check;
    # probe one minute after the MV's refresh commit (a pinned instant —
    # the wall clock could legitimately cross a Sunday-04:30 fire mid-suite)
    last_ms = max(
        s.timestamp_ms for s in cat.table("my_mv").meta.snapshots
    )
    just_after = datetime.utcfromtimestamp(last_ms / 1000.0) + timedelta(minutes=1)
    assert cat.due_materialized_views(now=just_after) == []
    # ...but a far-future probe instant shows it due (next Sunday passes)
    assert cat.due_materialized_views(now=datetime(2100, 1, 8)) == ["demo.my_mv"]

    # one ticker beat at that fake instant refreshes it: a new replace
    # snapshot lands and the MV is no longer due at that instant
    snaps_before = len(cat.table("my_mv").meta.snapshots)
    assert cat.run_due_refreshes(now=datetime(2100, 1, 8)) == ["demo.my_mv"]
    mv = cat.table("my_mv")
    assert len(mv.meta.snapshots) == snaps_before + 1
    assert mv.meta.snapshots[-1].operation == "replace"
    # the refresh commit carries the REAL wall-clock time, so probe due-ness
    # just after that commit (not the fake 2100 instant, after which more
    # Sundays legitimately fire)
    refreshed_ms = max(s.timestamp_ms for s in mv.meta.snapshots)
    probe = datetime.utcfromtimestamp(refreshed_ms / 1000.0) + timedelta(minutes=1)
    assert cat.due_materialized_views(now=probe) == []
    assert mv.df().count() == 25

    # the opt-in in-process ticker drives the same beat from a thread
    tick = cat.start_refresh_ticker(interval_s=0.05)
    try:
        import time as _time

        _time.sleep(0.2)  # a few beats with nothing due — must be a no-op
    finally:
        tick.stop()
    assert len(cat.table("my_mv").meta.snapshots) == snaps_before + 1


def test_show_create_schema_roundtrip(cat):
    ddl = cat.show_create_schema("demo")
    assert ddl.startswith("CREATE SCHEMA demo")
    assert "location" in ddl


def test_incremental_mv_refresh_per_row(cat, spark, sf_dir):
    """A base-tracked per-row MV refreshes by APPENDING only the delta
    rows when the base history is append-only, matches the full re-run
    row-for-row, and falls back to full refresh after a base DELETE."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat.ctas("mv_base", customer_pipeline(spark, sf_dir))
    cat.register_table_view("mv_base")
    cat.create_materialized_view(
        "mv_rows",
        "SELECT custkey, name FROM mv_base WHERE mktsegment = 'SQLENGINE'",
        base_table="mv_base",
    )
    bt = cat.table("mv_base")
    bt.insert([
        {"custkey": 910001, "name": "INC ONE", "mktsegment": "SQLENGINE",
         "account_balance": 1.0, "nation": "FRANCE"},
        {"custkey": 910002, "name": "OTHER SEG", "mktsegment": "AUTOMOBILE",
         "account_balance": 2.0, "nation": "FRANCE"},
    ])
    mv = cat.refresh_materialized_view("mv_rows")
    e = cat.data["mviews"][cat._qualify("mv_rows")]
    assert e["last_refresh_mode"] == "incremental-append"
    got = {(r.custkey, r.name) for r in mv.df().collect()}
    cat.register_table_view("mv_base")
    want = {
        (r.custkey, r.name)
        for r in spark.sql(
            "SELECT custkey, name FROM mv_base WHERE mktsegment = 'SQLENGINE'"
        ).collect()
    }
    assert got == want and (910001, "INC ONE") in got
    # no new base data -> noop, nothing committed
    v_before = mv.version
    mv = cat.refresh_materialized_view("mv_rows")
    assert cat.data["mviews"][cat._qualify("mv_rows")]["last_refresh_mode"] == "noop"
    assert cat.table("mv_rows").version == v_before
    # base DELETE breaks append-only history -> full fallback, still correct
    bt.delete("custkey = 910001")
    mv = cat.refresh_materialized_view("mv_rows")
    assert cat.data["mviews"][cat._qualify("mv_rows")]["last_refresh_mode"] == "full"
    got = {(r.custkey, r.name) for r in mv.df().collect()}
    assert (910001, "INC ONE") not in got


def test_incremental_mv_refresh_aggregate_merge(cat, spark, sf_dir):
    """A base-tracked aggregate MV with an aggregate_merge spec refreshes
    by aggregating ONLY the delta and merging by key arithmetic; result
    equals the full re-computation."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat.ctas("agg_base", customer_pipeline(spark, sf_dir))
    cat.register_table_view("agg_base")
    mv_sql = """SELECT nation,
                       CAST(count(*) AS BIGINT) AS n_customers,
                       CAST(sum(CAST(account_balance AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
                  FROM agg_base GROUP BY nation"""
    cat.create_materialized_view(
        "mv_agg", mv_sql, base_table="agg_base",
        aggregate_merge={"keys": ["nation"],
                         "counts": ["n_customers"],
                         "sums": ["total_balance"]},
    )
    bt = cat.table("agg_base")
    bt.insert([
        {"custkey": 920001, "name": "AGG NEW NATION", "mktsegment": "SQLENGINE",
         "account_balance": 10.0, "nation": "ATLANTIS"},
        {"custkey": 920002, "name": "AGG EXISTING", "mktsegment": "SQLENGINE",
         "account_balance": 5.5, "nation": "FRANCE"},
    ])
    mv = cat.refresh_materialized_view("mv_agg")
    e = cat.data["mviews"][cat._qualify("mv_agg")]
    assert e["last_refresh_mode"] == "incremental-merge"
    got = {(r.nation, r.n_customers, round(r.total_balance, 2))
           for r in mv.df().collect()}
    cat.register_table_view("agg_base")
    want = {(r.nation, r.n_customers, round(r.total_balance, 2))
            for r in spark.sql(mv_sql).collect()}
    assert got == want
    assert any(n == "ATLANTIS" and c == 1 for n, c, _b in got)


def test_incremental_mv_spec_must_cover_columns(cat, spark, sf_dir):
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline
    import pytest as _pytest

    cat.ctas("cov_base", customer_pipeline(spark, sf_dir))
    cat.register_table_view("cov_base")
    with _pytest.raises(ValueError, match="aggregate_merge"):
        cat.create_materialized_view(
            "mv_cov",
            "SELECT nation, CAST(count(*) AS BIGINT) AS n FROM cov_base GROUP BY nation",
            base_table="cov_base",
            aggregate_merge={"keys": ["nation"], "counts": []},
        )


def test_incremental_mv_multiple_beats(cat, spark, sf_dir):
    """Three consecutive append+refresh beats each take the incremental
    path and stay equal to the full recomputation — the watermark chain
    (base_snapshot_id advancing per refresh) works across rounds, not
    just once."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat.ctas("beat_base", customer_pipeline(spark, sf_dir))
    cat.register_table_view("beat_base")
    mv_sql = ("SELECT custkey, account_balance FROM beat_base "
              "WHERE account_balance > 0")
    cat.create_materialized_view("mv_beats", mv_sql, base_table="beat_base")
    bt = cat.table("beat_base")
    q = cat._qualify("mv_beats")
    for beat in range(3):
        bt.insert([
            {"custkey": 930000 + beat, "name": f"BEAT {beat}",
             "mktsegment": "SQLENGINE", "account_balance": 1.0 + beat,
             "nation": "FRANCE"},
        ])
        mv = cat.refresh_materialized_view("mv_beats")
        assert cat.data["mviews"][q]["last_refresh_mode"] == "incremental-append"
        got = {(r.custkey, r.account_balance) for r in mv.df().collect()}
        cat.register_table_view("beat_base")
        want = {(r.custkey, r.account_balance)
                for r in spark.sql(mv_sql).collect()}
        assert got == want, f"beat {beat} diverged"


def test_incremental_mv_merge_min_max(cat, spark, sf_dir):
    """aggregate_merge also merges MIN/MAX extremes (least/greatest of
    the two sides), including keys present on only one side."""
    from iceberg_trino_sql_demo_spark.operators.relational import customer_pipeline

    cat.ctas("mm_base", customer_pipeline(spark, sf_dir))
    cat.register_table_view("mm_base")
    mv_sql = """SELECT nation,
                       CAST(count(*) AS BIGINT) AS n_customers,
                       min(account_balance) AS min_bal,
                       max(account_balance) AS max_bal
                  FROM mm_base GROUP BY nation"""
    cat.create_materialized_view(
        "mv_minmax", mv_sql, base_table="mm_base",
        aggregate_merge={"keys": ["nation"], "counts": ["n_customers"],
                         "mins": ["min_bal"], "maxs": ["max_bal"]},
    )
    bt = cat.table("mm_base")
    bt.insert([
        # new extreme low for an existing nation + a brand-new nation
        {"custkey": 940001, "name": "MIN NEW", "mktsegment": "SQLENGINE",
         "account_balance": -99999.0, "nation": "FRANCE"},
        {"custkey": 940002, "name": "NEW NATION", "mktsegment": "SQLENGINE",
         "account_balance": 7.0, "nation": "LEMURIA"},
    ])
    mv = cat.refresh_materialized_view("mv_minmax")
    assert (
        cat.data["mviews"][cat._qualify("mv_minmax")]["last_refresh_mode"]
        == "incremental-merge"
    )
    got = {(r.nation, r.n_customers, r.min_bal, r.max_bal)
           for r in mv.df().collect()}
    cat.register_table_view("mm_base")
    want = {(r.nation, r.n_customers, r.min_bal, r.max_bal)
            for r in spark.sql(mv_sql).collect()}
    assert got == want
    assert any(n == "LEMURIA" for n, *_rest in got)
