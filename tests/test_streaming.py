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
