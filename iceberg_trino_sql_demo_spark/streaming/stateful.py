"""Custom stateful streaming operators (SURVEY.md §2.8 extension surface:
``applyInPandasWithState`` is the escape hatch when F.window/session_window
can't express the state machine).

``stream_running_user_totals`` keeps an arbitrary per-key accumulator (event
count + value total + last-seen event id) across micro-batches — the shape
of any custom streaming aggregate: fraud counters, rate limiters,
per-session feature builders.  State is a tuple per user; each batch emits
the updated totals (update semantics).

Scale notes: state lives in the state store keyed by the shuffle partition
of ``user_id`` — the same hash shuffle a batch groupBy would use; Arrow
batches flow per key-group, so Python sees columnar chunks, never rows.
Watermark bounds state growth for event-time cleanup in production.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from iceberg_trino_sql_demo_spark.streaming.ingest import EVENTS_SCHEMA, _drain

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_event_id bigint"
STATE_SCHEMA = "n bigint, total double, last_id bigint"


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_id = state.get if state.exists else (0, 0.0, -1)
    for pdf in pdfs:
        n += len(pdf)
        # exact accumulation: integer cents, so replays/batch boundaries
        # can never drift the total
        total += int(round(float(pdf["value"].sum()) * 100))  # cents
        last_id = max(last_id, int(pdf["event_id"].max()))
    state.update((n, int(total), last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total / 100.0],
            "last_event_id": [last_id],
        }
    )


def stream_running_user_totals(
    spark: SparkSession, sf_dir: str, query_name: str = "stateful_totals"
) -> DataFrame:
    """Drain events as micro-batches through a custom stateful operator;
    return the final per-user running totals."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    updated = (
        src.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_state_")
    q = (
        updated.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt)
    # update-mode memory sink appends one row per key per batch: the running
    # totals are monotone, so the final state per user is the max row
    sink = spark.table(query_name)
    return (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
            F.max("last_event_id").alias("last_event_id"),
        )
    )
