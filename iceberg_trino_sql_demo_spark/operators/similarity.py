"""Similarity search over an embedding column (SURVEY.md §7 Phase 7).

- **brute-force cosine top-k** — the correctness baseline: one pass over
  the table, dot/norm computed JVM-side via zip_with/aggregate (no Python
  in the loop), top-k via orderBy+limit (Spark runs this as a per-partition
  TakeOrdered, so nothing but k rows per partition ever moves);
- **LSH-bucketed top-k** — the scale path: sign-random-hyperplane buckets
  computed once per row; the query only scans buckets within hamming
  distance <= 1 of the query's bucket.  At 100 TB the bucket column is a
  partition/cluster key and a probe touches a fixed fraction of the data.

The query vector is the embedding of ``vec_id = 0`` (deterministic; the
oracle picks the same row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.operators import register
from iceberg_trino_sql_demo_spark.session import table_path

K = 10
N_PLANES = 8
PROBE_RADIUS = 3


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "embeddings"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = _emb(spark, sf_dir).where(F.col("vec_id") == 0).select("embedding").head()
    return [float(x) for x in row[0]]


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
      SELECT vec_id,
             list_dot_product(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q))
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product((SELECT qe FROM q), (SELECT qe FROM q))))
             AS cosine
        FROM embeddings
       WHERE vec_id != 0
    )
    SELECT vec_id, round(cosine, 6) AS cosine
      FROM scored
     ORDER BY cosine DESC, vec_id
     LIMIT {K}
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vector(spark, sf_dir)
    q = F.array(*[F.lit(v) for v in qv])
    e = F.col("embedding")
    cosine = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    return (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select("vec_id", cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(K)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplanes(dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded; no numpy needed at
    executor side — these are query-time literals broadcast in the plan)."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((N_PLANES, dim)).tolist()


def lsh_bucket_col(planes: list[list[float]]):
    """Sign-bit bucket id for the embedding column."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(v) for v in p])
        bit = F.when(_dot(F.col("embedding"), pc) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long") * F.lit(2 ** i).cast("long")
    return bucket


#: embeddings dimension in the testdata (uniform across sf0.001/0.01/0.1);
#: the hyperplanes are seeded so the oracle can inline them as literals
_DIM = 64


def _bucket_sql(planes: list[list[float]]) -> str:
    """The sign-LSH bucket as a SQL expression over DOUBLE[] column ``e`` —
    same plane literals (repr() round-trips doubles exactly) and same
    bit weights as lsh_bucket_col."""
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(v) for v in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(e, {lit}) >= 0 THEN {2 ** i} ELSE 0 END)"
        )
    return "(" + "\n       + ".join(terms) + ")"


_LSH_ORACLE = f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (
      SELECT e AS qe, {_bucket_sql(_hyperplanes(_DIM))}::BIGINT AS qb
        FROM base WHERE vec_id = 0
    ),
    cand AS (
      SELECT vec_id, e
        FROM base, q
       WHERE vec_id != 0
         AND bit_count(xor({_bucket_sql(_hyperplanes(_DIM))}::BIGINT, qb)) <= {PROBE_RADIUS}
    ),
    scored AS (
      SELECT vec_id,
             list_dot_product(e, (SELECT qe FROM q))
             / (sqrt(list_dot_product(e, e))
                * sqrt(list_dot_product((SELECT qe FROM q), (SELECT qe FROM q))))
             AS cosine
        FROM cand
    )
    SELECT vec_id, round(cosine, 6) AS cosine
      FROM scored
     ORDER BY cosine DESC, vec_id
     LIMIT {K}
"""


@register("ann_topk_lsh", oracle=_LSH_ORACLE)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates are rows whose sign-LSH signature is
    within hamming distance PROBE_RADIUS of the query's (popcount of XOR —
    a pure integer filter; the 64-float cosine only runs on survivors).

    Sign-LSH guarantees: a vector at angle theta from the query disagrees
    with each hyperplane with probability theta/pi, so true near-duplicates
    (cos >= 0.9 => theta <= 26 deg => p ~ 0.14) pass an r=3-of-8 filter with
    probability > 0.99, while the bulk of a random corpus is rejected before
    any vector math.  At 100 TB the signature is a cluster/partition key and
    this filter becomes partition pruning.  Oracle-checked end-to-end (the
    seeded hyperplanes are inlined as double literals in the SQL); recall
    vs brute force is additionally asserted in tests/test_extensions.py.
    """
    qv = _query_vector(spark, sf_dir)
    planes = _hyperplanes(len(qv))
    e = _emb(spark, sf_dir).where(F.col("vec_id") != 0)
    bucketed = e.withColumn("bucket", lsh_bucket_col(planes))

    q_bucket = 0
    for i, p in enumerate(planes):
        dot = sum(a * b for a, b in zip(qv, p))
        q_bucket += (1 if dot >= 0 else 0) * (2 ** i)

    hamming = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(q_bucket)))
    q = F.array(*[F.lit(v) for v in qv])
    emb = F.col("embedding")
    cosine = _dot(emb, q) / (F.sqrt(_dot(emb, emb)) * F.sqrt(_dot(q, q)))
    return (
        bucketed.where(hamming <= PROBE_RADIUS)
        .select("vec_id", cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(K)
        .select("vec_id", F.round("cosine", 6).alias("cosine"))
    )
