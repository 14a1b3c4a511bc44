"""Structured Streaming parity: the streaming tumbling aggregation must
produce exactly the batch result (one plan, two execution modes)."""

from __future__ import annotations

from iceberg_trino_sql_demo_spark import operators as ops
from iceberg_trino_sql_demo_spark.streaming.ingest import stream_tumbling_counts

ops.load_all()

SF = "/root/testdata/sf0.001"


def _key(rows):
    return sorted(
        (r.window_start.isoformat(), r.event_type, r.n_events, r.total_value) for r in rows
    )


def test_stream_equals_batch(spark):
    batch = ops.QUERIES["events_tumbling_hourly"](spark, SF).collect()
    stream = stream_tumbling_counts(spark, SF, "t_stream_parity").collect()
    assert _key(stream) == _key(batch)
    assert len(batch) > 0


def test_stateful_operator_equals_batch(spark):
    """applyInPandasWithState running totals must equal the batch groupBy."""
    out = {r.user_id: (r.n_events, r.total_value, r.last_event_id)
           for r in ops.QUERIES["events_stateful_user_totals"](spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from pyspark.sql import functions as F

    batch = {r.user_id: (r.n, round(r.tv, 2), r.last) for r in
             ev.groupBy("user_id").agg(
                 F.count(F.lit(1)).alias("n"),
                 (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tv"),
                 F.max("event_id").alias("last"),
             ).collect()}
    assert {k: (v[0], round(v[1], 2), v[2]) for k, v in out.items()} == batch


def test_stream_ingestion_into_engine_table(spark, tmp_path):
    """foreachBatch -> Table.insert: every micro-batch is an atomic snapshot;
    the drained table holds exactly the source rows."""
    from iceberg_trino_sql_demo_spark.sources.table import Table
    from iceberg_trino_sql_demo_spark.streaming.ingest import stream_into_table

    t = Table.create(
        spark, str(tmp_path / "events_ice"),
        [("event_id", "bigint"), ("ts", "bigint"), ("user_id", "bigint"),
         ("event_type", "string"), ("value", "double"), ("props", "string")],
        partitioning=["event_type"],
    )
    stream_into_table(spark, SF, t)
    src_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert t.df().count() == src_n
    ops_seq = [s.operation for s in t.meta.snapshots]
    assert ops_seq and all(o == "append" for o in ops_seq)
    # streaming appends are CDC-able like any other write
    changes = t.table_changes(t.meta.snapshots[0].snapshot_id,
                              t.meta.refs["main"]) if len(t.meta.snapshots) > 1 else None
    assert changes is None or changes.count() >= 0
