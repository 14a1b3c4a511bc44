"""As-of and range joins over event time — custom operators the reference
engine family offers (time-series SQL surface) that Spark lacks as
primitives (SURVEY.md §2.4 notes the gap; BASELINE.json north-star).

Both are expressed as *compositions of built-in DataFrame ops* — no Python
UDFs — so they stay inside whole-stage codegen and scale linearly:

- **as-of join** (``events_asof_attribution``): for every ``purchase``
  event, the most recent ``click`` by the same user at-or-before it.
  Implemented the shuffle-minimal way: UNION both sides, one window
  ``last(..., ignorenulls=True)`` pass per user ordered by time.  That is
  ONE shuffle on the join key + a sort within partitions — never the
  O(n*m) inequality join Spark would otherwise plan.  At 100 TB this is
  the same plan: hash-partition by user, sort-merge within partition,
  stream.  Skewed users can be range-partitioned by (user, ts-bucket)
  with boundary carry-over; not needed at bench scale.

- **range join** (``events_range_join_1h``): clicks within the hour
  before each purchase, same user.  Implemented as a *bucketed* range
  join: both sides get an hour-bucket key; the probe (purchase) side
  explodes to its 2 candidate buckets, the join is a plain equi-join on
  (user, bucket) followed by the exact range filter.  Expansion factor is
  2 on the small side instead of joining each purchase against the user's
  whole click history — the standard interval-join decomposition (same
  trick Flink's interval join and DuckDB's IEJoin avoid differently).

Determinism: ties are broken by (ts, side, event_id) — a total order —
so the as-of winner is stable across engines; oracles replicate the
identical formulation (DuckDB's native ASOF JOIN would match too, but has
unspecified tie behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.operators import register
from iceberg_trino_sql_demo_spark.operators.windows_ops import _events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tiebreak: str = "event_id",
) -> DataFrame:
    """Generic as-of join: for each row of ``left``, attach the latest
    ``right`` row with the same ``on`` key and ``right.ts <= left.ts``.

    Plan shape: union → window(partitionBy key, orderBy ts) → filter.
    One exchange, one sort; no inequality join."""
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(c.dataType).alias(c.name)
          for c in left.schema if c.name not in {on, ts}],
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        *[F.col(c.name) for c in left.schema if c.name not in {on, ts}],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = r.unionByName(l).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
          for c in right_cols],
    )
    keep = [on, ts] + [c.name for c in left.schema if c.name not in {on, ts}]
    return matched.where(F.col("_side") == 1).select(
        *keep, *[F.col(f"r_{c}") for c in right_cols]
    )


_ASOF_ORACLE = """
    WITH u AS (
      SELECT user_id, ts, 0 AS side, event_id AS tb,
             event_id AS r_event_id, ts AS r_ts,
             CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value
        FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 1 AS side, event_id AS tb,
             NULL, NULL, event_id, value
        FROM events WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT *,
             last_value(r_event_id IGNORE NULLS) OVER win AS click_event_id,
             last_value(r_ts IGNORE NULLS) OVER win AS click_ts
        FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value, click_event_id, click_ts
      FROM w WHERE side = 1
"""


@register("events_asof_attribution", oracle=_ASOF_ORACLE)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases, clicks, on="user_id", right_cols=("event_id", "ts")
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("r_event_id").alias("click_event_id"),
        F.col("r_ts").alias("click_ts"),
    )


_RANGE_ORACLE = """
    WITH p AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR
       AND c.ts <  p.ts
     GROUP BY p.event_id, p.user_id, p.ts
"""


@register("events_range_join_1h", oracle=_RANGE_ORACLE)
def events_range_join_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        (F.unix_timestamp("ts") / 3600).cast("long").alias("bucket"),
    )
    # probe side explodes to its two candidate hour-buckets; the join is a
    # pure equi-join on (user, bucket) — the range predicate only filters
    probe = purchases.select(
        "event_id", "user_id", "ts",
        F.explode(
            F.array(
                (F.unix_timestamp("ts") / 3600).cast("long") - 1,
                (F.unix_timestamp("ts") / 3600).cast("long"),
            )
        ).alias("bucket"),
    )
    counts = (
        probe.join(clicks, (probe.user_id == clicks.c_user)
                   & (probe.bucket == clicks.bucket))
        .where(
            (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("ts"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
    )
    return (
        purchases.join(counts, "event_id", "left")
        .select(
            "event_id", "user_id", "ts",
            F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"),
        )
    )


# ---------------------------------------------------------------------------
# salted join — the manual skew weapon for when AQE's runtime skew-split
# can't help (e.g. the skew is in a broadcast-ineligible dim, or the
# engine runs with AQE off).  The dim side is replicated SALT ways, the
# fact side picks a uniform salt from a high-cardinality column, and the
# join key becomes (key, salt): a key holding 40% of the fact table now
# lands on SALT reducers instead of one.
# ---------------------------------------------------------------------------
SALT = 8


def salted_join(fact: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` on ``on`` with SALT-way key salting.
    ``dim`` is exploded SALT times (it must be the small side); ``fact``
    salts uniformly via a hash of all its columns."""
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(SALT)).cast("int")
    )
    return fact_salted.join(dim_salted, [on, "_salt"]).drop("_salt")


@register(
    "events_salted_skew_join",
    oracle="""
    WITH fact AS (
      SELECT event_id, user_id % 5 AS segment, value FROM events
    ),
    dim(segment, segment_name) AS (
      VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma'), (3, 'delta'), (4, 'omega')
    )
    SELECT d.segment_name,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(f.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM fact f JOIN dim d ON f.segment = d.segment
     GROUP BY d.segment_name
    """,
)
def events_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathological skew on purpose: 60k events collapse onto 5 join keys,
    so an unsalted shuffle join puts ~20% of the table on each of 5 tasks
    regardless of cluster size.  The salted join spreads each key over
    SALT reducers; results are identical (oracle = the plain join).
    The demo dim is forced out of broadcast (the realistic case where
    salting is needed at all)."""
    ev = _events(spark, sf_dir).select(
        "event_id", (F.col("user_id") % 5).alias("segment"), "value"
    )
    dim = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "delta"), (4, "omega")],
        "segment bigint, segment_name string",
    ).hint("shuffle_hash")
    joined = salted_join(ev, dim, on="segment")
    from iceberg_trino_sql_demo_spark.functions.trino import scaled_long_sum

    return joined.groupBy("segment_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        scaled_long_sum(F.col("value"), "total_value"),
    )
