"""Structured Streaming surface (SURVEY.md §2.8: none in the reference — the
demo's stream-adjacent concepts are CDC and MV refresh — so this module is
the §7 extension: micro-batch ingestion + stateful event-time aggregation).

``stream_tumbling_counts`` runs the SAME window expression as the batch
operator (operators/windows_ops.events_tumbling_hourly) through
``readStream`` with a watermark, using ``availableNow`` so it terminates
after draining the input — the batch/stream parity test in
tests/test_streaming.py is the correctness check (one codepath, two
execution modes, identical results).

Scale notes: file-source streaming with maxFilesPerTrigger is how a 100 TB
backfill replays through the same stateful operators as the live stream;
watermarks bound state; the memory sink here stands in for an engine-table
sink (foreachBatch -> Table.insert would be the production path).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_trino_sql_demo_spark.functions.trino import decimal_sum
from iceberg_trino_sql_demo_spark.session import parquet_ts_unit, pinned_conf, table_path

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # raw int64 of the parquet TIMESTAMP column, whatever its unit —
        # scaled to µs via ts_micros()/parquet_ts_unit (a ns column has no
        # lossless Spark type, so every events reader takes the long route)
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def ts_micros(unit: str, col: str = "ts"):
    """Epoch-µs long from a raw int64 timestamp read in ``unit``.

    ns uses integer ``div`` (not ``/1000``: nanos exceed double's 2^53 exact
    range and float division flips the last µs digit on some rows)."""
    if unit == "ns":
        return F.expr(f"{col} div 1000")
    if unit == "us":
        return F.col(col)
    if unit == "ms":
        return F.col(col) * F.lit(1000)
    raise ValueError(f"unsupported parquet timestamp unit {unit!r}")


def events_ts_unit(sf_dir: str) -> str:
    return parquet_ts_unit(table_path(sf_dir, "events"))


def windowed_counts(
    events: DataFrame, watermark: bool = False, unit: str = "us"
) -> DataFrame:
    """The shared batch/stream plan: 1h tumbling count+sum per event type."""
    df = events.withColumn("ts", F.timestamp_micros(ts_micros(unit)))
    if watermark:
        df = df.withWatermark("ts", "2 hours")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum(F.col("value"), "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


def windowed_ohlc(
    events: DataFrame, watermark: bool = False, unit: str = "us"
) -> DataFrame:
    """Shared batch/stream OHLC plan: per (1h window, event_type) candles.
    min_by/max_by are declarative aggregates, so the identical expressions
    run under a watermark in a streaming query — open/close resolve
    incrementally without buffering the window's rows."""
    df = events.withColumn("ts", F.timestamp_micros(ts_micros(unit)))
    if watermark:
        df = df.withWatermark("ts", "2 hours")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def stream_ohlc(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_ohlc"
) -> DataFrame:
    """The OHLC candle aggregation executed as a Structured Streaming query
    (readStream + watermark + availableNow into a memory sink); after the
    drain, candles equal the batch aggregate (same oracle)."""
    with pinned_conf(spark, {"spark.sql.session.timeZone": "UTC"}):
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        agg = windowed_ohlc(src, watermark=True, unit=events_ts_unit(sf_dir))
        ckpt = tempfile.mkdtemp(prefix="ckpt_")
        q = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, ckpt)
    return spark.table(query_name)


def windowed_sessions(
    events: DataFrame, watermark: bool = False, unit: str = "us"
) -> DataFrame:
    """Shared batch/stream sessionization plan: per-user sessions closed by
    a 30-minute inactivity gap (native session_window — the same state
    machine the batch operator and its gaps-and-islands oracle encode).
    Under a watermark the session state is bounded: a session closes for
    good once the watermark passes its gap-extended end."""
    df = events.withColumn("ts", F.timestamp_micros(ts_micros(unit)))
    if watermark:
        df = df.withWatermark("ts", "2 hours")
    return (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


def stream_sessionization(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_sessions"
) -> DataFrame:
    """Sessionization executed as a Structured Streaming query: merging
    session windows are a native stateful operator, so sessions extend /
    merge incrementally across micro-batches; after the availableNow drain
    the session set equals the batch session_window aggregate (same
    gaps-and-islands oracle)."""
    with pinned_conf(spark, {"spark.sql.session.timeZone": "UTC"}):
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        agg = windowed_sessions(src, watermark=True, unit=events_ts_unit(sf_dir))
        ckpt = tempfile.mkdtemp(prefix="ckpt_")
        q = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, ckpt)
    return spark.table(query_name)


def _drain(q, checkpoint_dir: str | None, timeout: int = 300) -> None:
    """Block until the availableNow query finishes; fail loudly on timeout
    (a silently partial drain would surface as a wrong-but-plausible result)
    and remove the checkpoint dir when it was a throwaway (None = caller
    owns it and wants restartability)."""
    try:
        if not q.awaitTermination(timeout=timeout):
            q.stop()
            raise TimeoutError(
                f"stream {q.name!r} did not drain within {timeout}s"
            )
    finally:
        if checkpoint_dir is not None:
            shutil.rmtree(checkpoint_dir, ignore_errors=True)


#: snapshot-summary keys the exactly-once sink writes; the pair (stream,
#: batch) is committed atomically WITH the appended files
STREAM_ID_KEY = "streaming-query-id"
STREAM_BATCH_KEY = "streaming-batch-id"


def table_sink(table, stream_id: str, cols: list[str] | None = None):
    """foreachBatch callback appending micro-batches to a versioned table
    EXACTLY-ONCE.

    foreachBatch is at-least-once: after a driver crash the restarted
    query re-delivers the last in-flight batch id.  The sink therefore
    commits the (stream_id, batch_id) watermark in the snapshot summary —
    the SAME atomic metadata CAS as the data files (Table.insert
    summary=...) — and drops any batch at or below the stream's committed
    high-water mark.  A batch is either fully committed together with its
    id or absent entirely; there is no half state to make idempotence
    heuristic.  This is the standard Spark exactly-once foreachBatch
    recipe (batchId-keyed idempotent writes) fused with the table
    format's optimistic commit.

    ``stream_id`` must be stable across restarts of the same checkpoint
    (derive it from the checkpoint location) and distinct across
    different logical streams into the same table — batch ids restart at
    0 per checkpoint, so the watermark is tracked per stream."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = table.refresh()
        seen = max(
            (
                int(s.summary[STREAM_BATCH_KEY])
                for s in t.meta.all_snapshots()
                if s.summary.get(STREAM_ID_KEY) == stream_id
                and STREAM_BATCH_KEY in s.summary
            ),
            default=-1,
        )
        if batch_id <= seen:
            return  # re-delivered (or replayed) batch: already committed
        out = batch_df.select(*cols) if cols else batch_df
        t.insert(
            out,
            summary={STREAM_ID_KEY: stream_id, STREAM_BATCH_KEY: str(batch_id)},
        )

    return sink


def cdc_upsert_sink(replica, key_cols: list[str], stream_id: str):
    """foreachBatch callback applying a ``mode='cdc'`` ice_table_changes
    micro-batch to a replica table BY KEY, exactly-once.

    Per batch: keep the LAST change per key (ordered by the source's
    ``_commit_sequence_number``; within one commit 'insert' outranks
    'delete' — an upsert commit emits both and the insert is the final
    state), then land everything in ONE atomic snapshot via
    ``Table.upsert_by_key`` — an equality delete over (upserted ∪ deleted)
    keys plus the new rows, with the (stream, batch) watermark in the same
    commit summary.  Re-delivered batches are dropped by the watermark;
    there is no half-applied state because the apply IS one commit.

    This closes what position deletes cannot: a replica of a table taking
    UPDATE/DELETE ingests each micro-batch with NO read of existing
    replica data (VERDICT r5 #3/#5)."""
    from pyspark.sql import Window

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t = replica.refresh()
        seen = max(
            (
                int(s.summary[STREAM_BATCH_KEY])
                for s in t.meta.all_snapshots()
                if s.summary.get(STREAM_ID_KEY) == stream_id
                and STREAM_BATCH_KEY in s.summary
            ),
            default=-1,
        )
        if batch_id <= seen:
            return
        cols = [f.name for f in t.meta.schema.fields]
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc("_commit_sequence_number"), F.desc("_change_type")
        )
        last = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .cache()
        )
        ups = last.where(F.col("_change_type") == "insert").select(*cols)
        dels = last.where(F.col("_change_type") == "delete").select(*key_cols)
        wm = {STREAM_ID_KEY: stream_id, STREAM_BATCH_KEY: str(batch_id)}
        t.upsert_by_key(ups, key_cols, extra_delete_keys=dels, summary=wm)
        last.unpersist()
        _maybe_rewrite_deletes(t)

    return sink


#: default live-delete-file count past which the sink folds accumulated
#: deletes between batches (override per table with the
#: ``delete_rewrite_threshold`` property; 0 disables)
DELETE_REWRITE_THRESHOLD = 32


def _maybe_rewrite_deletes(t) -> None:
    """Bound the replica's read cost inside the ingest loop (VERDICT
    r6/r7 #8): every upsert batch adds one equality-delete file, and
    without maintenance a long-running sink accumulates them forever —
    each scan of older files pays one anti-join per live delete file.
    Past the threshold, materialize equality deletes to position form and
    consolidate the position side into one deletion-vector pack.  Both
    rewrites are data-invariant single commits (CDC-invisible, watermark
    untouched), so they can land between any two batches; a racing writer
    just triggers the normal CAS/rebase path."""
    t.refresh()
    thr = int(
        t.meta.properties.get(
            "delete_rewrite_threshold", DELETE_REWRITE_THRESHOLD
        )
    )
    if thr <= 0:
        return
    man = t.io.read_manifest(t._resolve())
    if len(man.delete_files) >= thr:
        t.rewrite_equality_deletes()
        t.refresh()
        t.rewrite_position_deletes()
        t.refresh()


def stream_cdc_to_replica_by_key(
    spark: SparkSession,
    source,
    replica,
    key_cols: list[str],
    checkpoint_dir: str | None = None,
    start_snapshot_id: int | None = None,
) -> None:
    """Drain a full-CDC stream (inserts AND row-level deletes/updates) from
    ``source`` into ``replica`` by key — readStream(mode='cdc') ->
    cdc_upsert_sink, availableNow."""
    from iceberg_trino_sql_demo_spark.sources.pyds import (
        STREAM_FORMAT_NAME,
        IceChangesDataSource,
    )

    spark.dataSource.register(IceChangesDataSource)  # idempotent re-register
    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_cdcfull_")
    stream_id = os.path.basename(ckpt.rstrip("/"))
    reader = (
        spark.readStream.format(STREAM_FORMAT_NAME)
        .option("path", source.location)
        .option("mode", "cdc")
    )
    if start_snapshot_id is not None:
        reader = reader.option("start_snapshot_id", start_snapshot_id)
    q = (
        reader.load()
        .writeStream.foreachBatch(cdc_upsert_sink(replica, key_cols, stream_id))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt if owned else None)


def stream_into_table(
    spark: SparkSession, sf_dir: str, table, checkpoint_dir: str | None = None
) -> None:
    """Production ingestion path: micro-batches append to a versioned engine
    table via foreachBatch — every batch is one atomic snapshot commit, so
    the stream's progress is time-travelable and CDC-able like any other
    write (reference surface: CDC :114-125 over streaming appends), and
    the batch-id watermark in each snapshot's summary makes re-delivered
    batches no-ops (see table_sink).  Pass a caller-owned
    ``checkpoint_dir`` to make the stream restartable; throwaway
    checkpoints are cleaned up after the drain."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    cols = [f.name for f in table.meta.schema.fields]
    owned = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_ingest_")
    # stable across restarts of the same checkpoint, distinct across streams
    stream_id = os.path.basename(ckpt.rstrip("/"))
    q = (
        src.writeStream.foreachBatch(table_sink(table, stream_id, cols))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt if owned else None)
    table.refresh()


def stream_tumbling_counts(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_tumbling"
) -> DataFrame:
    """Drain events.parquet as a micro-batch stream into a memory sink and
    return the final aggregate as a DataFrame."""
    # Window keys are epoch-aligned, so the tz conf cannot move buckets —
    # but the whole stream EXECUTES inside this function, so a scoped pin
    # over the drain is effective for any execution-time tz sensitivity
    # and free; it is restored before returning (no caller-session
    # mutation).  Rendering of the returned memory-sink timestamps happens
    # at the CALLER's collection and follows its session (see
    # operators/windows_ops._events for the measured rendering rules).
    with pinned_conf(spark, {"spark.sql.session.timeZone": "UTC"}):
        # the file source wants a directory: stream the sf dir, globbed to
        # the events table file(s)
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        agg = windowed_counts(src, watermark=True, unit=events_ts_unit(sf_dir))
        ckpt = tempfile.mkdtemp(prefix="ckpt_")
        q = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, ckpt)
    return spark.table(query_name)


def stream_dedup_events(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_dedup"
) -> DataFrame:
    """Streaming exact deduplication: emit each distinct
    (user_id, event_type, value) tuple once, across micro-batches.

    ``dropDuplicates`` keys the state store on the dedup columns — the same
    hash shuffle a batch DISTINCT uses — so after draining (availableNow)
    the emitted set equals batch DISTINCT exactly, which is the oracle.
    Unbounded state is deliberate here (exact global dedup over a replay);
    a live 100 TB pipeline bounds it with dropDuplicatesWithinWatermark,
    trading exactness beyond the watermark horizon for O(window) state.
    """
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dedup = src.select("user_id", "event_type", "value").dropDuplicates(
        ["user_id", "event_type", "value"]
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        dedup.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt)
    return spark.table(query_name)


def stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_dedup_wm"
) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    evicts dedup state once the event-time watermark passes a key, so state
    is O(watermark window), not O(distinct keys) — the ONLY dedup that
    survives an unbounded 100 TB stream.  With a horizon wider than the
    replayed dataset's event-time span nothing is evicted early, so the
    drained result still equals batch DISTINCT exactly — which is the
    oracle; production narrows the horizon to its dedup SLA.
    """
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dedup = (
        src.select(
            "user_id",
            "event_type",
            "value",
            F.timestamp_micros(ts_micros(events_ts_unit(sf_dir))).alias("event_time"),
        )
        .withWatermark("event_time", "365 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "value"])
        .drop("event_time")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        dedup.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt)
    return spark.table(query_name)


def stream_interval_join(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_ij"
) -> DataFrame:
    """Stream-stream interval join: purchases joined to same-user clicks
    from the preceding hour, both sides arriving as streams.

    The time-range condition plus a watermark on each side lets Spark
    bound the join state (clicks older than the watermark minus the hour
    can never match a future purchase and are evicted) — this is THE
    pattern for attribution joins over unbounded streams.  Draining with
    availableNow makes the emitted pairs equal the batch inner join,
    which is the oracle.
    """
    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.timestamp_micros(ts_micros(events_ts_unit(sf_dir))).alias(
                    f"{prefix}_ts"
                ),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    purchases = side("purchase", "p")
    clicks = side("click", "c")
    joined = purchases.join(
        clicks,
        F.expr(
            "c_user = p_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"
        ),
    ).select(F.col("p_id").alias("purchase_id"), F.col("c_id").alias("click_id"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt)
    return spark.table(query_name)


def _flushed_events_dir(sf_dir: str, unit: str,
                        instants: list[int] | None = None) -> str:
    """A temp source directory: the real events file (symlinked) plus tiny
    "flush" parquets at the given raw-``unit`` instants, which advance the
    watermark past every real event so final-window state can be emitted
    before an availableNow drain stops (each instant drives its own
    micro-batch, so the watermark update from one is applied while the
    next still runs).  Default: two far-future instants — enough for a
    SINGLE stateful operator.  Chained stateful operators need a staged
    LADDER instead (see stream_chained_agg): a one-batch watermark jump
    past an intermediate row's event time makes the downstream operator
    drop it as late, so each rung must advance the watermark by less
    than the gap it finalizes.  Flush rows carry negative ids; callers
    filter them AFTER the watermark operator."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mult = {"ns": 10**9, "us": 10**6, "ms": 10**3}[unit]
    if instants is None:
        instants = [4102444800 * mult, 4102531200 * mult]  # 2100-01-01, +1d
    src_dir = tempfile.mkdtemp(prefix="flush_src_")
    os.symlink(table_path(sf_dir, "events"), os.path.join(src_dir, "events.parquet"))
    for i, inst in enumerate(instants):
        tbl = pa.table(
            {
                "event_id": pa.array([-1 - 2 * i, -2 - 2 * i], pa.int64()),
                "ts": pa.array([int(inst)] * 2, pa.int64()),
                "user_id": pa.array([-1, -2], pa.int64()),
                "event_type": pa.array(["purchase", "click"], pa.string()),
                "value": pa.array([0.0, 0.0], pa.float64()),
                "props": pa.array(["{}", "{}"], pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(src_dir, f"zz_flush_{i}.parquet"))
    return src_dir


def stream_left_outer_join(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_loj"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase emits — with
    its preceding-hour same-user clicks when they exist, with NULL when
    none arrived.

    Outer stream-stream joins have a semantics trap the inner variant
    doesn't: an unmatched row is emitted only when the WATERMARK passes
    the point where a match is provably impossible, and the watermark
    only advances when later data arrives — an availableNow drain of a
    finite source can end with the final hour's unmatched purchases still
    parked in state, silently missing from the output.  The standard
    production fix is replayed here: the source directory is the real
    events file plus tiny far-future "flush" files (two, so the watermark
    update from the first is applied while the second still drives a
    batch), which push the watermark past every real event and finalize
    all state before the drain stops.  Flush rows carry negative ids and
    are filtered from the emitted frame; the oracle is the batch LEFT
    JOIN over the real events only.
    """
    unit = events_ts_unit(sf_dir)
    src_dir = _flushed_events_dir(sf_dir, unit)

    # ONE watermark, assigned BEFORE the event-type split (then a stream
    # self-join of the two filtered branches).  The inner variant's
    # per-side watermark-after-filter shape silently breaks the OUTER
    # join: the sides are separate file sources whose batches interleave
    # asymmetrically, so one side's watermark operator can miss the flush
    # rows entirely and the min-policy global watermark never advances —
    # measured: 4 final-window NULLs never emitted.  With the watermark
    # upstream of both filters, every admitted row advances both branches
    # together (verified: drained count equals the batch left join).
    base = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(ts_micros(unit)).alias("ets"),
        )
        .withWatermark("ets", "1 hour")
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ets").alias("p_ts"),
    )
    clicks = base.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ets").alias("c_ts"),
    )
    joined = (
        purchases.join(
            clicks,
            F.expr(
                "c_user = p_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"
            ),
            "leftOuter",
        )
        .where(F.col("p_id") >= 0)
        .select(F.col("p_id").alias("purchase_id"), F.col("c_id").alias("click_id"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        _drain(q, ckpt)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
    return spark.table(query_name)


def stream_full_outer_join(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_foj"
) -> DataFrame:
    """Stream-stream FULL OUTER interval join: unmatched rows on BOTH
    sides emit NULL-padded once the watermark proves no partner can
    arrive — purchases with no preceding-hour click AND clicks no
    purchase followed within the hour.

    Same two traps, same fixes as the LEFT variant above: one watermark
    assigned BEFORE the event-type split (per-side watermarks strand the
    min-policy), and far-future flush files so the availableNow drain
    finalizes BOTH state stores' tails (full outer parks unmatched rows
    on both sides, so a stranded watermark silently loses rows from
    each).  Flush rows carry negative ids on either side and are
    NULL-safely filtered from the emitted frame."""
    unit = events_ts_unit(sf_dir)
    src_dir = _flushed_events_dir(sf_dir, unit)

    base = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            "event_id", "user_id", "event_type",
            F.timestamp_micros(ts_micros(unit)).alias("ets"),
        )
        .withWatermark("ets", "1 hour")
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ets").alias("p_ts"),
    )
    clicks = base.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ets").alias("c_ts"),
    )
    joined = (
        purchases.join(
            clicks,
            F.expr(
                "c_user = p_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"
            ),
            "fullOuter",
        )
        .where(
            (F.col("p_id").isNull() | (F.col("p_id") >= 0))
            & (F.col("c_id").isNull() | (F.col("c_id") >= 0))
        )
        .select(F.col("p_id").alias("purchase_id"), F.col("c_id").alias("click_id"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        _drain(q, ckpt)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
    return spark.table(query_name)


def stream_chained_agg(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_chain"
) -> DataFrame:
    """CHAINED stateful aggregation (Spark 3.4+ multi-stateful support):
    a 30-minute (window, user) count re-aggregated into hourly rollups —
    two stateful operators in ONE streaming query, the shape a
    continuous-aggregation hierarchy needs (raw -> fine grain -> coarse
    grain without leaving the stream).

    The second aggregate buckets on window_time(w) (= w.end - 1 us), the
    supported chained-window pattern.  Both operators finalize in append
    mode only when the watermark passes them, so the drain needs flush
    rows — staged as a LADDER (max+2h/max+4h/max+6h): a one-batch
    watermark jump past an intermediate row's event time can drop it as
    late at the second aggregate, so each rung advances the watermark
    across the tail windows gradually.

    Flush-row hygiene differs from the outer join's: a pre-aggregation
    ``event_id >= 0`` filter does NOT work here, because Catalyst pushes
    that deterministic filter BELOW the EventTimeWatermark node — the
    flush rows then never reach the watermark tracker and the drain
    stalls at max-1h (measured: the final 2 hourly rollups missing, with
    the watermark pinned at 22:57 across every flush batch).  Instead
    the flush rows flow through BOTH aggregates and their far-future
    windows are cut after the final aggregate (hour_start <= the real
    corpus max — flush windows start >= max+2h, so the cut is exact).
    Drained output equals the batch two-level rollup, which is the
    oracle.
    """
    unit = events_ts_unit(sf_dir)
    max_raw = (
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(table_path(sf_dir, "events"))
        .agg(F.max("ts").alias("m")).head().m
    )
    mult = {"ns": 10**9, "us": 10**6, "ms": 10**3}[unit]
    hour = 3600 * mult
    src_dir = _flushed_events_dir(
        sf_dir, unit, [max_raw + 2 * hour, max_raw + 4 * hour, max_raw + 6 * hour]
    )
    max_us = {"ns": max_raw // 1000, "us": max_raw, "ms": max_raw * 1000}[unit]
    base = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            "user_id",
            F.timestamp_micros(ts_micros(unit)).alias("ets"),
        )
        .withWatermark("ets", "1 hour")
    )
    b30 = base.groupBy(
        F.window("ets", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    hourly = (
        b30.groupBy(F.window(F.window_time("w"), "1 hour").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_user_buckets"),
            F.max("cnt").alias("max_bucket_events"),
        )
        .select(
            F.col("h.start").alias("hour_start"),
            "n_user_buckets",
            "max_bucket_events",
        )
        .where(F.col("hour_start") <= F.timestamp_micros(F.lit(max_us)))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        hourly.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        _drain(q, ckpt)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
    return spark.table(query_name)


def stream_static_enrich(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_enrich"
) -> DataFrame:
    """Stream-static join: the event stream enriched with a STATIC
    dimension (customer → market segment) before a watermarked tumbling
    aggregate per (hour, segment).

    The static side is a batch DataFrame joined into a streaming plan —
    Spark re-plans it per micro-batch with no state: this is the
    zero-state enrichment shape (dim lookup) every streaming pipeline
    runs, distinct from the stream-stream interval joins (state-bounded
    by watermarks) already covered.  The dim is broadcast: per-batch it
    ships once per executor and the join never shuffles the stream side.
    At 100 TB/day the same plan holds — the dim's size, not the stream's,
    bounds the broadcast; for dims past broadcast scale the join falls
    back to a shuffled stream-batch join, still stateless.

    After the availableNow drain the emitted aggregate equals the batch
    join+group — which is exactly the registered oracle.
    """
    unit = events_ts_unit(sf_dir)
    dim = (
        spark.read.parquet(table_path(sf_dir, "customer"))
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    with pinned_conf(spark, {"spark.sql.session.timeZone": "UTC"}):
        src = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        df = (
            src.withColumn("ts", F.timestamp_micros(ts_micros(unit)))
            .withWatermark("ts", "2 hours")
            .join(F.broadcast(dim), "user_id")
        )
        agg = (
            df.groupBy(F.window("ts", "1 hour").alias("w"), "segment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                decimal_sum(F.col("value"), "total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "segment",
                "n_events",
                "total_value",
            )
        )
        ckpt = tempfile.mkdtemp(prefix="ckpt_")
        q = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, ckpt)
    return spark.table(query_name)


def stream_ndv_sketch(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_ndv"
) -> DataFrame:
    """The HLL register sketch built BY THE STREAM (events_ndv_hll_sketch's
    execution-mode twin): per-(event_type, bucket) register MAXes as the
    stateful streaming aggregate.

    Duplicate-insensitivity is what makes the sketch streamable: max(rho)
    over re-observed keys equals max(rho) over distinct keys, so the plan
    needs NO pre-aggregate distinct (which an append-mode stream could not
    express without watermark-bounded state in the key cardinality).  The
    stateful operator's state is groups x 64 six-bit registers — constant
    for the life of the stream, at any volume; this is why production
    streaming NDV is always a sketch, never COUNT(DISTINCT).

    After the availableNow drain, the estimate derived from the streamed
    registers equals the batch pipeline's (same oracle); the exact NDV for
    the ok band comes from a batch read of the same corpus."""
    from iceberg_trino_sql_demo_spark.operators.windows_ops import (
        _HLL_EST,
        _HLL_P40,
        _events,
        _hll_registers,
    )

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    h = src.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hx")
    )
    # nk from a NON-distinct stream counts observations, not keys — only
    # the duplicate-insensitive register column m is consumed downstream
    reg = _hll_registers(h).select("event_type", "bucket", "m")
    ckpt = tempfile.mkdtemp(prefix="ckpt_ndv_")
    q = (
        reg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q, ckpt)
    streamed = spark.table(query_name)
    z = streamed.groupBy("event_type").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - m)"))
            + (64 - F.count(F.lit(1))) * F.lit(_HLL_P40)
        ).alias("zsum"),
        F.count(F.lit(1)).cast("long").alias("m_nonzero"),
    )
    est = z.select(
        "event_type", F.expr(_HLL_EST).alias("hll_est"), "m_nonzero"
    )
    exact = (
        _events(spark, sf_dir)
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("ndv_exact"))
    )
    ok = (
        100 * F.abs(F.col("hll_est") - F.col("ndv_exact"))
        <= 35 * F.col("ndv_exact")
    ) | (F.abs(F.col("hll_est") - F.col("ndv_exact")) <= 10)
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type", "ndv_exact", "hll_est", "m_nonzero",
        ok.alias("ok_est"),
    )
