"""Candidate-set diagnostics for the dedup family.

Rebuilds each operator's CANDIDATE frame — the set of pairs it actually
compares — from the same internals the operators use (shared hashed
shingles, the _phash permutation family, the simhash signature pipeline,
the sign-LSH bucket projection).  The scaling harness
(scripts/scaling_bench.py, tests/test_scaling.py) counts these to verify
the central 100 TB design claim empirically: candidate pairs grow
~linearly with corpus size because generation is always banded / blocked /
bucketed, never all-pairs.

These functions intentionally return un-persisted plans: callers count
them once and discard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.operators.dedup import (
    BANDS,
    NUM_PERM,
    ROWS_PER_BAND,
    _phash,
    _SIMHASH_BITS,
    _SIMHASH_CHUNK_BITS,
    hashed_shingles,
    simhash_signatures,
)


def jaccard_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct doc pairs sharing >= 1 capped hashed shingle — the pairs the
    exact-jaccard groupBy aggregates over (dedup.py dedup_shingle_jaccard).
    Bounded by the DF cap: a shingle shared by c docs contributes C(c,2)
    pairs with c <= max_df, so the total is O(n_shingles * max_df)."""
    sh = hashed_shingles(spark, sf_dir)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.ha") == F.col("b.ha"))
               & (F.col("a.hb") == F.col("b.hb"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct doc pairs sharing >= 1 LSH band bucket — the verify input of
    dedup_minhash_lsh (same signature + banding construction)."""
    sh = hashed_shingles(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(
        *[F.min(_phash(i)).alias(f"h{i}") for i in range(NUM_PERM)]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(band)),
                *[
                    F.col(f"h{band * ROWS_PER_BAND + r}").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
        ).alias(f"b{band}")
        for band in range(BANDS)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bucket"))
    return (
        banded.alias("x")
        .join(banded.alias("y"),
              (F.col("x.bucket") == F.col("y.bucket"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )


def simhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct doc pairs sharing >= 1 simhash block key — the
    hamming-verify input of dedup_simhash (same size-adaptive blocking:
    4 single chunks below the multi-index threshold, 15 chunk pairs
    above it)."""
    from iceberg_trino_sql_demo_spark.operators.dedup import (
        _docs,
        _simhash_block_keys,
    )

    sig = simhash_signatures(spark, sf_dir)
    chunks = _simhash_block_keys(sig, _docs(spark, sf_dir).count()).select(
        "doc_id", "chunk_id", "chunk"
    )
    return (
        chunks.alias("x")
        .join(chunks.alias("y"),
              (F.col("x.chunk_id") == F.col("y.chunk_id"))
              & (F.col("x.chunk") == F.col("y.chunk"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )


def prefiltered_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vec pairs sharing a sign-LSH bucket — the exact-cosine input of
    dedup_embedding_prefiltered.  Uses the operator's OWN corpus+bucket
    construction (prefiltered_bucketed_corpus), so the measured candidate
    set can never drift from the compared one."""
    from iceberg_trino_sql_demo_spark.operators.dedup import (
        prefiltered_bucketed_corpus,
    )

    bucketed, _ = prefiltered_bucketed_corpus(spark, sf_dir, persist=False)
    a = bucketed.select(F.col("vec_id").alias("id_a"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("id_b"), "bucket")
    return a.join(b, ["bucket"]).where(F.col("id_a") < F.col("id_b"))


def multiprobe_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vec pairs within hamming<=1 of each other's sign-LSH bucket — the
    exact-cosine input of dedup_embedding_prefiltered_multiprobe.  Same
    shared corpus+bucket construction; candidate volume should track
    (n_planes + 1) x the single-probe count's order, still O(n*occupancy)."""
    from iceberg_trino_sql_demo_spark.operators.dedup import (
        prefiltered_bucketed_corpus,
    )

    bucketed, n_planes = prefiltered_bucketed_corpus(spark, sf_dir, persist=False)
    probe_keys = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    probes = bucketed.select(
        F.col("vec_id").alias("id_a"), F.explode(probe_keys).alias("probe")
    )
    b = bucketed.select(F.col("vec_id").alias("id_b"), "bucket")
    return probes.join(b, probes["probe"] == b["bucket"]).where(
        F.col("id_a") < F.col("id_b")
    )


def semantic_cluster_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vec pairs sharing a coarse-quantizer cluster — the exact-cosine
    input of dedup_semantic_clusters.  Rebuilt from the operator's OWN
    corpus + assignment kernel (emb_corpus_with_dups + similarity._assign
    with the adaptive sqrt(n) centroid count), so the measured candidate
    set can never drift from the compared one.  Expected volume is
    sum over clusters of C(size, 2) ~ n * sqrt(n) / 2 with balanced
    clusters — the deliberately balanced exponent between assignment cost
    and verify cost (see the operator's header comment)."""
    from iceberg_trino_sql_demo_spark.operators.dedup import emb_corpus_with_dups
    from iceberg_trino_sql_demo_spark.operators.similarity import (
        _CENT_RESIDUE,
        _adaptive_cent_mod,
        _assign,
    )

    corpus = emb_corpus_with_dups(spark, sf_dir)
    cent_mod = _adaptive_cent_mod(corpus.count())
    cent = corpus.where(F.col("vec_id") % cent_mod == _CENT_RESIDUE).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    assigned = _assign(corpus, cent).select("vec_id", "cluster")
    a = assigned.select(F.col("vec_id").alias("id_a"), "cluster")
    b = assigned.select(F.col("vec_id").alias("id_b"), "cluster")
    return a.join(b, ["cluster"]).where(F.col("id_a") < F.col("id_b"))
