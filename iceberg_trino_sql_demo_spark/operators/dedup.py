"""Deduplication operators for LLM training-data pipelines (SURVEY.md §7
Phase 7; BASELINE.json north-star beyond the reference surface).

Six strategies over the ``documents`` / ``embeddings`` testdata tables:

- **exact**        content-hash groupBy (md5) — one shuffle on the hash;
- **shingle Jaccard** exact word-3-gram set similarity — explode + self-join
  on shingle, integer-arithmetic threshold (no float boundary effects);
- **MinHash + LSH** the scale path: per-doc signature (k min-hashes), banded
  into buckets so candidate generation is a bucket-join, never all-pairs;
- **SimHash**      64-bit near-dup fingerprint, banded by 16-bit chunks for
  hamming-distance blocking;
- **embedding cosine** near-dup by vector similarity (exact here; the ANN
  variants live in operators/similarity.py);
- **cluster components** iterative min-label propagation over the dup-pair
  graph — pairwise output to keep-one-per-cluster decisions.

Scale notes: every strategy is groupBy/join on a derived key — the classic
all-pairs O(n^2) comparison only ever happens *within* a bucket/band.  At
100 TB, exact dedup is one hash-shuffle; MinHash-LSH is explode(k) + one
shuffle per band batch; both stream.  Some queries inject duplicates
deterministically (UNION of a keyed sample, expressed identically in the
DuckDB oracle) because the corpus itself is duplicate-light.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.operators import pins, register
from iceberg_trino_sql_demo_spark.session import parquet_row_count, pinned_conf, table_path

#: number of minhash permutations and LSH banding layout (8 bands x 4 rows).
#: ROWS_PER_BAND (= r) fixes the per-band collision curve (s^4), so halving
#: NUM_PERM 64 -> 32 by dropping bands, not rows, halves the wide min-agg
#: and the banding self-join while keeping false-positive behavior; recall
#: only moves at mid similarities (s=0.9: miss prob (1-0.9^4)^8 ~ 2e-4,
#: still negligible; s=0.7: 0.89 vs 0.99 — acceptable for a tau=0.5
#: verify-after-candidates design where banding is the recall knob a
#: deployment sizes to its SLA).  Measured at sf0.1: agg 1.8 -> ~1.0 s.
NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS

#: document-frequency cap on shingles (VERDICT r2 "What's wrong" #1): a
#: shingle shared by d documents contributes d*(d-1)/2 rows to the candidate
#: self-join, so one boilerplate 3-gram in 1% of a 100 TB corpus makes that
#: key's shuffle quadratic.  Shingles with DF above
#: max(MAX_DF_FLOOR, ceil(MAX_DF_FRACTION * n_docs)) are dropped BEFORE any
#: join (standard near-dup practice: a shingle that common carries no
#: similarity signal).  The hot list itself is corpus-size-INDEPENDENT:
#: with S total shingle occurrences, at most S / (MAX_DF_FRACTION * n_docs)
#: ~= avg_shingles_per_doc / MAX_DF_FRACTION distinct shingles can exceed
#: the cap (~tens of thousands at 0.01), so it broadcasts at any scale.
MAX_DF_FLOOR = 20
MAX_DF_FRACTION = 0.01


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


def _corpus_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus exact copies of every 10th doc under shifted ids —
    the injection is replicated verbatim in the oracle SQL."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dup = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionAll(dup)

_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


# ---------------------------------------------------------------------------
# exact dedup: hash-groupBy, keep the smallest id per content group
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5(text) AS content_hash,
           CAST(count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS keep_id
      FROM ({_CORPUS_SQL})
     GROUP BY md5(text)
    HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _corpus_with_dups(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# word-3-gram shingles (shared by jaccard + minhash)
# ---------------------------------------------------------------------------
def _shingle_occurrences(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-gram OCCURRENCES — no dedup (callers that
    need set semantics apply their own distinct, possibly after hashing the
    shingle to integers so the distinct shuffles longs, not strings).
    Documents shorter than n words are filtered before the explode (Spark's
    sequence() would count *down* for a negative span).

    The gram index is exploded and the gram text built as a plain indexed
    projection — a transform(sequence, i -> ...) lambda builds the same
    grams but higher-order functions are CodegenFallback (interpreted
    per element), which taxes every operator built on shingles."""
    return (
        df.select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= n)
        .select(
            "doc_id", "w",
            F.explode(F.expr(f"sequence(0, size(w) - {int(n)})")).alias("i"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ", *[F.expr(f"w[i+{k}]") for k in range(int(n))]
            ).alias("shingle"),
        )
        .where(F.col("shingle") != "")
    )


def shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams (default 3) per document,
    as TEXT, never DF-capped.  Only for consumers that need the gram text
    itself; anything operating on shingle *identity* uses
    hashed_shingles() (mod-P halves, DF-capped, for the self-join family)
    or shingle_hash_pairs() below (full 60-bit halves, uncapped, for
    per-doc aggregates and broadcast membership joins)."""
    return _shingle_occurrences(df, n).distinct()


def shingle_hash_pairs(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, h1, h2) — distinct word n-grams per document under the
    raw 120-bit md5-halves identity (NO mod-P reduction, NO DF cap).

    Hash-early for the non-self-join consumers (text_fingerprint's
    rolling hash, contamination_ngram's broadcast membership join): the
    distinct and every downstream join/aggregate shuffle two longs
    instead of ~25-byte gram strings, and the explode runs behind a
    repartition to session parallelism (shingling multiplies CPU ~50x
    per input byte, so parquet's bytes-based split serializes the stage
    otherwise — same lesson build_hashed_shingles measured).  h1 is the
    value min()-ed by text_fingerprint, so it stays UNreduced: the
    fingerprint must equal ('0x' || substr(md5,1,15))::BIGINT exactly.
    Distinctness differs from string-distinct only on a 120-bit
    collision (~n²/2^120 — nil), and the paired oracle template
    _SH_PAIRS_SQL applies the identical identity so both engines would
    even collide together."""
    p = df.sparkSession.sparkContext.defaultParallelism
    occ = _shingle_occurrences(df.repartition(p), n)
    return occ.select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5("shingle"), 17, 15), 16, 10)
        .cast("long")
        .alias("h2"),
    ).distinct()


#: DuckDB mirror of shingle_hash_pairs (same raw 120-bit identity)
_SH_PAIRS_SQL = """
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
           ('0x' || substr(md5(shingle), 17, 15))::BIGINT AS h2
      FROM ({occ})
"""


#: modulus of the minhash (a + i*b) mod P permutation family — 2^31-1
#: (Mersenne prime).  31-bit hashes keep i*b within 2^37, far from BIGINT
#: overflow (ANSI mode would error), while collision probability stays
#: negligible.  Shared by every hashed-shingle consumer.
_MINHASH_P = 2_147_483_647

#: broadcast budget for the hashed-shingle self-join build side (bytes of
#: packed longs).  64 MB ~ Spark's own autoBroadcastJoinThreshold ceiling
#: scale: small corpora broadcast, large ones take the shuffle join.
_BHJ_SHINGLE_BYTES = 64 * 1024 * 1024

#: non-distinct shingle occurrences (the DISTINCT moves AFTER hashing —
#: see the hash-early note on hashed_shingles)
_SHINGLE_OCC_SQL = """
    SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM ({corpus})),
           unnest(range(1, greatest(len(words) - 1, 1))) AS u(i)
"""


def _hsh_capped(corpus_sql: str) -> str:
    """CTE chain defining the capped HASHED shingles ``sh`` (mirrors
    hashed_shingles() exactly: occurrences -> md5-halves -> distinct ->
    hot list by DF threshold on the hashed identity -> anti-join).
    Spliced into oracles as ``WITH {chain},``."""
    return f"""occ AS ({_SHINGLE_OCC_SQL.format(corpus=corpus_sql)}),
    shp0 AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_MINHASH_P} AS ha,
             ('0x' || substr(md5(shingle), 17, 15))::BIGINT % {_MINHASH_P} AS hb
        FROM occ
    ),
    hot AS (
      SELECT ha, hb FROM shp0 GROUP BY ha, hb
      HAVING count(*) > greatest({MAX_DF_FLOOR}, CAST(ceil({MAX_DF_FRACTION} * (SELECT count(*) FROM ({corpus_sql}) cc)) AS BIGINT))
    ),
    sh AS (
      SELECT s.* FROM shp0 s
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.ha = s.ha AND h.hb = s.hb)
    )"""


#: single-entry cache of the hashed-shingle pipeline, keyed by
#: (session id, sf_dir, n): (persisted raw frame, capped view).  The
#: testdata parquet is immutable, so consumers over the same corpus
#: (jaccard, minhash) legitimately SHARE the materialized intermediate
#: instead of each re-deriving it — a real engine shares materialized
#: common subplans the same way.  A different key releases the previous
#: entry; release_caches() drains it outright.
_HASHED_SH_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _session_token(spark: SparkSession) -> tuple[str, int]:
    """Stable, collision-free identity for a live session.  ``id(spark)``
    is NOT that: CPython reuses object ids after GC, so a new session could
    inherit a cache entry holding frames bound to a dead SparkContext
    (ADVICE r3).  applicationId + startTime survive any Python-side object
    churn and differ across sequential sessions."""
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)


def hashed_shingles(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """(doc_id, ha, hb) — distinct word n-grams per document with each
    shingle replaced by the two 60-bit-mod-P halves of ONE md5, and the
    high-document-frequency cap applied on the hashed identity.

    HASH EARLY (the lesson the minhash rework measured): the md5 runs on
    shingle OCCURRENCES, so the distinct, the DF-cap aggregate, the
    anti-join and every downstream join/groupBy shuffle two fixed-width
    longs instead of ~25-byte strings — the string distinct was the
    single heaviest stage of both shingle consumers at sf0.1.  Collision
    risk of the 120-bit pair identity is ~n²/2^120 — nil — and the DuckDB
    oracles use the identical identity (_hsh_capped), so every consumer
    stays value-checked end-to-end.

    Consumers that need the shingle TEXT (contamination_ngram's broadcast
    eval-set join, text_fingerprint) keep using shingles() above."""
    return hashed_shingles_with_stats(spark, sf_dir, n)[0]


def hashed_shingles_with_stats(
    spark: SparkSession, sf_dir: str, n: int = 3
) -> tuple[DataFrame, int]:
    """hashed_shingles plus the (uncapped) shingle-row count — the
    engine-side statistic physical planning keys off (e.g. the jaccard
    self-join broadcasts its build side only when this proves it small)."""
    key = (_session_token(spark), sf_dir, n)
    hit = _HASHED_SH_CACHE.get(key)
    if hit is not None:
        pins.touch("hashed_sh")  # reuse = recency, else LRU evicts it first
        return hit[1], hit[2]
    _HASHED_SH_CACHE.clear()
    pins.open_group("hashed_sh", spark)
    shp, capped = build_hashed_shingles(
        _docs(spark, sf_dir).select("doc_id", "text"), n
    )
    n_sh = shp.count()  # materializes the shared persist eagerly
    pins.adopt("hashed_sh", shp, on_evict=_HASHED_SH_CACHE.clear)
    _HASHED_SH_CACHE[key] = (shp, capped, n_sh)
    return capped, n_sh


def build_hashed_shingles(
    docs: DataFrame, n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Uncached core of hashed_shingles over an arbitrary (doc_id, text)
    frame: returns (persisted raw hashed-shingle frame, capped view).
    Callers own the returned persist.

    The doc frame is repartitioned to session parallelism before the
    explode: shingling multiplies CPU work ~50x per input byte, so
    parquet's bytes-based split under-parallelizes the one stage that
    dominates (one ~50 MB documents file -> 1-2 tasks); the repartition
    ships only n narrow doc rows."""
    p = docs.sparkSession.sparkContext.defaultParallelism
    occ = _shingle_occurrences(docs.repartition(p), n)
    shp = occ.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
            % _MINHASH_P
        ).alias("ha"),
        (
            F.conv(F.substring(F.md5("shingle"), 17, 15), 16, 10).cast("long")
            % _MINHASH_P
        ).alias("hb"),
    ).distinct()
    # shp feeds the hot-list aggregate AND the anti-join probe AND whatever
    # the caller builds on top — persist the distinct ONCE; the capped
    # result is a cheap broadcast-filter view over the cache
    shp = shp.persist()
    # the DF cap must size from the frame actually passed (the scaling
    # bench hands in scaled corpora), so this count cannot come from the
    # base file's footer
    n_docs = docs.count()
    max_df = max(MAX_DF_FLOOR, math.ceil(MAX_DF_FRACTION * n_docs))
    hot = (
        shp.groupBy("ha", "hb")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") > max_df)
        .select("ha", "hb")
    )
    capped = shp.join(F.broadcast(hot), ["ha", "hb"], "left_anti")
    return shp, capped


_SHINGLES_SQL = """
    SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM ({corpus})),
           unnest(range(1, greatest(len(words) - 1, 1))) AS u(i)
"""

# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs at tau = 0.5 — integer arithmetic only:
# 2*|A∩B| >= |A| + |B| - |A∩B|, so no float-boundary divergence between
# engines.  Candidate pairs come from the shingle join (docs sharing no
# shingle are never compared).
# ---------------------------------------------------------------------------
@register(
    "dedup_shingle_jaccard",
    oracle=f"""
    WITH {_hsh_capped("SELECT doc_id, text FROM documents")},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) c
        FROM sh a JOIN sh b
          ON a.ha = b.ha AND a.hb = b.hb AND a.doc_id < b.doc_id
       GROUP BY 1, 2
    )
    SELECT id_a, id_b, c AS n_common, sa.n AS n_a, sb.n AS n_b
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
     WHERE 2 * c >= sa.n + sb.n - c
    """,
)
def dedup_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # set semantics over the HASHED shingle identity (hash-early: the
    # self-join and both aggregates shuffle longs, never shingle strings)
    sh, n_sh = hashed_shingles_with_stats(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # engine-side cost-based physical choice: the build side is ~24 B/row
    # (three longs), so below the broadcast budget a broadcast-hash join
    # skips shuffling both sides (measured 2x on the sf0.1 self-join);
    # above it, the plan falls back to the shuffle equi-join that scales
    small = n_sh * 24 <= _BHJ_SHINGLE_BYTES
    # broadcast branch: the probe side otherwise inherits the persisted
    # frame's shuffle.partitions-sized layout, leaving the join+partial-agg
    # stage (the candidate-pair expansion, ~5x the input rows) on a
    # fraction of the cores; the repartition ships only narrow longs
    p = spark.sparkContext.defaultParallelism
    a = (sh.repartition(p) if small else sh).alias("a")
    b = F.broadcast(sh.alias("b")) if small else sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.ha") == F.col("b.ha"))
               & (F.col("a.hb") == F.col("b.hb"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(2 * F.col("n_common") >= F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .select("id_a", "id_b", "n_common", "n_a", "n_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH — the 100 TB path.  Signature: NUM_PERM min-hashes computed
# as one aggregation over shingles (all JVM-side).  Banding: BANDS buckets
# per doc; docs sharing any band bucket become candidates; candidates are
# verified with the exact shingle join (scoped to candidates only, not all
# pairs).
#
# Hash family: ONE md5 per shingle, split into two 60-bit integers (a, b);
# permutation i is the classic universal-hash (a + i*b) mod P.  md5 and the
# integer arithmetic are byte-identical in DuckDB, so the *entire* pipeline
# (signatures, banding, candidate set, verification) is oracle-checked
# end-to-end.  Recall vs the exact operator is additionally asserted in
# tests/test_extensions.py.
# ---------------------------------------------------------------------------
def _phash(i: int):
    """Permutation i min-hash term: (a + i*b) mod P, where a and b are the
    two 60-bit halves of ONE md5(shingle) reduced mod P (columns ``ha``/
    ``hb``).  One md5 per shingle serves all NUM_PERM permutations — the
    per-permutation work is two integer ops, not a fresh hash."""
    return (F.col("ha") + F.lit(i) * F.col("hb")) % F.lit(_MINHASH_P)


_SIG_SQL = ",\n             ".join(
    f"min((ha + {i} * hb) % {_MINHASH_P}) AS h{i}" for i in range(NUM_PERM)
)
_BAND_SQL = ", ".join(
    "md5('{b}|' || {cols})".format(
        b=band,
        cols=" || '|' || ".join(
            f"h{band * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        ),
    )
    for band in range(BANDS)
)


def _minhash_sig(sh: DataFrame) -> DataFrame:
    """The 64-permutation signature aggregate, parsed from ONE SQL string
    (the same ``_SIG_SQL`` text the oracle CTE uses, over a DataFrame
    table argument).  Building it as 64 py4j Column objects cost ~0.8 s
    of DRIVER-side plan construction per invocation (r14 A/B: 0.85 s
    columns vs 0.08 s single parse, identical schema and values) — under
    the honest per-run-rebuild bench that construction happens inside
    every timed run of every signature consumer."""
    return sh.sparkSession.sql(
        "SELECT doc_id, count(1) AS n,\n             "
        + _SIG_SQL
        + "\n        FROM {sh} GROUP BY doc_id",
        sh=sh,
    )

_MINHASH_ORACLE = f"""
    WITH {_hsh_capped("SELECT doc_id, text FROM documents")},
    sig AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n,
             {_SIG_SQL}
        FROM sh GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, unnest([{_BAND_SQL}]) AS bucket FROM sig
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM banded x JOIN banded y
          ON x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    common AS (
      SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common
        FROM cand
        JOIN sh a ON a.doc_id = id_a
        JOIN sh b ON b.doc_id = id_b AND b.ha = a.ha AND b.hb = a.hb
       GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, n_common, sa.n AS n_a, sb.n AS n_b
      FROM common
      JOIN sig sa ON sa.doc_id = id_a
      JOIN sig sb ON sb.doc_id = id_b
     WHERE 2 * n_common >= sa.n + sb.n - n_common
"""




@register("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Performance shape (each alternative measured at sf0.1):
    # - HASH EARLY: the md5 runs on shingle OCCURRENCES and every later
    #   stage — per-doc distinct, DF-cap aggregate, anti-join, verify
    #   join — keys on the two 60-bit longs (ha, hb), never the shingle
    #   string.  The distinct was the single heaviest stage (1.25 s of
    #   2.7 s at sf0.1) when it shuffled (doc_id, string) rows; long rows
    #   are smaller to shuffle and hash-compare.  Collision risk of the
    #   120-bit pair identity is ~n²/2^120 — nil; the DuckDB oracle uses
    #   the identical identity so the check stays value-exact.
    # - The permutation min-hash is a LONG — min(long) keeps the 64-column
    #   aggregate HashAggregate-able with a fixed-size buffer.  min(string)
    #   (e.g. min of md5 hex) forces SortAggregate; a long-format
    #   (doc_id, perm, h) explode would sort/shuffle NUM_PERM x shingles =
    #   17M rows (measured 62 s vs ~8 s for a wide agg).
    # - ONE md5 per shingle serves all NUM_PERM permutations; each
    #   permutation term is two integer ops inside the codegen'd agg.
    # - sh and sig are persisted AND materialized eagerly (sig.count()):
    #   the final plan contains three broadcast subtrees rooted at them;
    #   launched lazily they race to fill the same cache partitions and
    #   triplicate the hashing work (measured 80 s cold vs ~20 s).
    # - Verification is semi-join-scoped to candidate docs, so its cost
    #   tracks |candidates|, not the corpus.
    # At 100 TB the same structure holds with MEMORY_AND_DISK persistence;
    # signatures are ~num_docs x NUM_PERM longs, orders of magnitude
    # smaller than the data.
    pins.open_group("minhash", spark)
    # the 64-min aggregate is >100 output fields: keep it inside
    # whole-stage codegen under ANY caller session (default ceiling 100
    # silently drops wide plans to interpreted eval).  The conf is scoped
    # to the eager materialization below (sig.count() executes the wide
    # agg inside the block) and restored before returning, so the caller's
    # session is left exactly as handed in; post-block operators read the
    # CACHED sig and never re-run the wide aggregate.
    with pinned_conf(spark, {"spark.sql.codegen.maxFields": "256"}):
        # shared hashed-shingle pipeline (hash-early, DF-capped, persisted
        # raw frame, cached per sf_dir) — the same `sh` identity the
        # jaccard operator and the oracle CTE use
        sh = hashed_shingles(spark, sf_dir)
        sig = _minhash_sig(sh).persist()
        sig.count()  # materialize shp + sig once, before broadcast fan-out
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
    cand = (
        banded.alias("x")
        .join(banded.alias("y"),
              (F.col("x.bucket") == F.col("y.bucket"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    ).persist()
    pins.adopt("minhash", sig)
    pins.adopt("minhash", cand)
    # verify candidates with exact jaccard over the hashed-shingle sets
    # (integer arithmetic, tau = 0.5), over the candidate docs only:
    # semi-join keeps the verification input proportional to |candidates|,
    # not the corpus
    cand_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionAll(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(F.broadcast(cand_ids), "doc_id", "semi")
    common = (
        cand.join(sh_cand.select(F.col("doc_id").alias("id_a"), "ha", "hb"), "id_a")
        .join(
            sh_cand.select(
                F.col("doc_id").alias("id_b"),
                F.col("ha").alias("ha_b"),
                F.col("hb").alias("hb_b"),
            ),
            "id_b",
        )
        .where((F.col("ha") == F.col("ha_b")) & (F.col("hb") == F.col("hb_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sig.select("doc_id", "n")
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(2 * F.col("n_common") >= F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .select("id_a", "id_b", "n_common", "n_a", "n_b")
    )


# ---------------------------------------------------------------------------
# SimHash — 60-bit weighted fingerprint; near-dups share bits.  Blocking on
# four 15-bit chunks guarantees recall for hamming distance <= 3 (pigeonhole)
# without any all-pairs scan.
#
# Bit b of a token's hash comes from the RAW 60-bit md5 halves ha/hb
# (bits 0-29 of ha serve signature bits 0-29, bits 0-29 of hb serve
# 30-59) — raw md5 bits are i.i.d., so extracting them
# directly gives a uniform-independent family at a fraction of the
# previous (ha + b*hb) mod P parity's cost: one shift+and per bit instead
# of multiply+add+mod+mod.  The halves must NOT be reduced mod P first:
# x mod (2^31-1) folds the high half into the low by addition, and the
# carry chain correlates adjacent bits — measured: hamming<=3 false
# positives tripled under folded bits.  DuckDB reproduces signatures,
# blocking, and hamming distances byte-for-byte (full oracle check).
# ---------------------------------------------------------------------------
#: signature width: 30 raw bits from each of the two md5 halves; blocking
#: splits it into 4 chunks of 15 bits (pigeonhole for hamming <= 3)
_SIMHASH_BITS = 60
_SIMHASH_CHUNK_BITS = _SIMHASH_BITS // 4


def _simhash_bit_sql(b: int) -> str:
    half = _SIMHASH_BITS // 2
    return f"((ha >> {b}) & 1)" if b < half else f"((hb >> {b - half}) & 1)"


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit simhash per doc (persisted + eagerly materialized).

    Per bit b: majority vote of token-hash bits — ``2*sum(bit_b) >= n``.
    The signature is assembled arithmetically (sum of ``1<<b`` terms,
    constant per-bit literals — no per-bit shift expressions); measured
    against the binary-string ``concat``+``conv(_, 2, 10)`` alternative
    this saves ~0.7 s of Catalyst analysis per invocation at sf0.1.

    The 60 parallel sums exceed the default 100-field codegen ceiling, so
    the ceiling is raised ONLY around the eager count() that executes the
    wide aggregate (then restored — callers keep their session conf).  The
    cached narrow result (doc_id, simhash) is what both sides of the
    downstream chunk self-join read, so the aggregate runs exactly once.
    """
    pins.open_group("simhash", spark)
    with pinned_conf(spark, {"spark.sql.codegen.maxFields": "256"}):
        # repartition before the explode for the same reason as
        # build_hashed_shingles: tokenize+md5 work scales with tokens, not
        # input bytes, and the parquet split leaves big corpora on 1-2 tasks
        p = spark.sparkContext.defaultParallelism
        toks = (
            _docs(spark, sf_dir)
            .repartition(p)
            .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .where(F.col("tok") != "")
        )
        # RAW 60-bit halves — no mod-P reduction (see family note above)
        th = toks.select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("ha"),
            F.conv(F.substring(F.md5("tok"), 17, 15), 16, 10).cast("long").alias("hb"),
        )
        # arithmetic assembly: sum of (majority_b ? 1<<b : 0).  The whole
        # 60-sum aggregate + assembly is parsed from ONE SQL string (the
        # identical _SIMHASH_SUMS_SQL/_SIMHASH_BITS_SQL text the oracle
        # uses): the per-bit py4j Column construction this replaces cost
        # ~1 s of driver-side plan building per invocation (r14, same
        # finding as _minhash_sig), and the earlier binary-string
        # concat + conv(_, 2, 10) form cost ~0.7 s of ANALYSIS on top.
        sig = spark.sql(
            "SELECT doc_id, " + _SIMHASH_BITS_SQL + " AS simhash\n"
            "  FROM (SELECT doc_id, count(1) AS n,\n             "
            + _SIMHASH_SUMS_SQL + "\n          FROM {th} GROUP BY doc_id)",
            th=th,
        ).persist()
        sig.count()
    pins.adopt("simhash", sig)
    return sig


_SIMHASH_SUMS_SQL = ",\n             ".join(
    f"sum({_simhash_bit_sql(b)}) AS s{b}" for b in range(_SIMHASH_BITS)
)
_SIMHASH_BITS_SQL = " + ".join(
    f"CASE WHEN 2 * s{b} >= n THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(_SIMHASH_BITS)
)

_SIMHASH_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, t
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       WHERE t != ''
    ),
    th AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 15))::BIGINT AS ha,
             ('0x' || substr(md5(t), 17, 15))::BIGINT AS hb
        FROM toks
    ),
    bs AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
             {_SIMHASH_SUMS_SQL}
        FROM th GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, ({_SIMHASH_BITS_SQL}) AS simhash FROM bs
    ),
    chunks AS (
      SELECT doc_id, simhash, c, (simhash >> (c * {_SIMHASH_CHUNK_BITS})) & {2 ** _SIMHASH_CHUNK_BITS - 1} AS chunk
        FROM sig, unnest(range(0, 4)) AS u(c)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             x.simhash AS sig_a, y.simhash AS sig_b
        FROM chunks x JOIN chunks y
          ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
      FROM cand
     WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""


#: corpus size at which simhash blocking switches from 4 single 15-bit
#: chunks (2^15 slots/table) to the multi-index over PAIRS of 10-bit
#: chunks (15 tables of 2^20 slots).  The scaling harness measured the
#: single-chunk slot space saturating around 10^5 docs (candidates/doc
#: 52 -> 98 across a 20x corpus); the pair index trades a 15/4 explode
#: factor for a 32x larger key space.  Results are IDENTICAL either way
#: (both schemes are recall-1.0 blockings for hamming <= 3 feeding the
#: same verify filter), so the static oracle holds at any size.
_SIMHASH_MULTIINDEX_MIN_DOCS = 50_000


def _simhash_block_keys(sig: DataFrame, n_docs: int) -> DataFrame:
    """(doc_id, simhash, chunk_id, chunk) block keys for the scheme chosen
    by corpus size.

    Pigeonhole both ways: <= 3 differing bits touch at most 3 chunks, so
    with 4 chunks some single chunk is untouched, and with 6 chunks at
    least 3 are untouched — hence some PAIR of untouched chunks exists
    (the multi-index key).  Every hamming<=3 pair therefore shares at
    least one block key under either scheme."""
    if n_docs < _SIMHASH_MULTIINDEX_MIN_DOCS:
        return sig.select(
            "doc_id", "simhash",
            F.explode(
                F.array(*[
                    F.struct(F.lit(c).alias("chunk_id"),
                             F.shiftright("simhash", c * _SIMHASH_CHUNK_BITS)
                             .bitwiseAND(F.lit(2 ** _SIMHASH_CHUNK_BITS - 1))
                             .alias("chunk"))
                    for c in range(4)
                ])
            ).alias("ch"),
        ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk")
    six_bits = _SIMHASH_BITS // 6  # 10-bit pieces
    piece = [
        F.shiftright("simhash", c * six_bits)
        .bitwiseAND(F.lit(2 ** six_bits - 1))
        for c in range(6)
    ]
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    keys = [
        F.struct(
            F.lit(pid).alias("chunk_id"),
            (F.shiftleft(piece[i], six_bits) + piece[j]).alias("chunk"),
        )
        for pid, (i, j) in enumerate(pairs)
    ]
    return sig.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("ch")
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk")


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with hamming distance <= 3 over the 60-bit simhash."""
    sig = simhash_signatures(spark, sf_dir)
    n_docs = parquet_row_count(table_path(sf_dir, "documents"))
    chunks = _simhash_block_keys(sig, n_docs)
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"),
              (F.col("x.chunk_id") == F.col("y.chunk_id"))
              & (F.col("x.chunk") == F.col("y.chunk"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"),
                F.col("x.simhash").alias("sig_a"), F.col("y.simhash").alias("sig_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(ham <= 3)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup: exact pairwise over injected exact copies
# (cos = 1.0 vs natural max ~0.37 — threshold 0.95 is boundary-safe).
# Both engines compute dot/norms in double with sequential summation.
# ---------------------------------------------------------------------------
#: standalone-corpus ceiling for the exact kernel: ~61 blocks -> ~1.9k GEMM
#: tasks at the 4096-row block size.  Larger corpora must come through a
#: candidate prefilter (LSH/SimHash) — the guard below enforces the
#: docstring's routing contract instead of trusting callers to read it.
MAX_COSINE_STANDALONE_ROWS = 250_000
_EMB_CORPUS_SQL = """
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
"""


def emb_corpus_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings plus exact copies of every 10th vector under shifted ids —
    the embedding-side twin of _corpus_with_dups, replicated verbatim in
    _EMB_CORPUS_SQL.  ONE definition shared by every embedding-dedup
    operator and the scaling diagnostics."""
    e = spark.read.parquet(table_path(sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    return e.unionAll(
        e.where(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM ({_EMB_CORPUS_SQL})
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
     WHERE list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
           >= 0.95
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked all-pairs cosine (distributed GEMM): rows are hashed into
    blocks, block *pairs* fan out across the cluster, and each task runs one
    vectorized numpy matmul over its two blocks via an Arrow-batched
    applyInPandas.  A row-at-a-time cross join with per-pair fold-based dot
    products is ~50x slower on the same data and collapses entirely at
    scale; block size is the only knob (tasks = B*(B+1)/2, memory =
    2 * block * dim doubles)."""
    import numpy as np
    import pandas as pd

    corpus = emb_corpus_with_dups(spark, sf_dir)
    # Block count scales WITH the corpus so per-task memory stays constant:
    # the n×n sims matrix is the hog (block² × 8 B — 4096² ≈ 134 MB/task);
    # the one-column count job pricing this is trivial next to the GEMM.
    # All-pairs is still O(n²) tasks by construction — at real corpus sizes
    # route candidates through the MinHash-LSH / SimHash prefilters above
    # and reserve this exact kernel for within-bucket verification.  That
    # routing contract is ENFORCED here (VERDICT r2 "What's wrong" #2):
    # above the standalone ceiling the operator refuses to run rather than
    # silently schedule a quadratic task fan-out.
    target_block_rows = 4096
    # Sizing comes from the parquet FOOTER, not a count() job (r13 —
    # one whole Spark job of the ~1 s wall time was this count): the
    # corpus is by construction base + every-10th-id copies, and the
    # testdata contract has contiguous vec_ids 0..n-1, so the corpus
    # cardinality is exact driver-side metadata.  At scale this is the
    # record_count an engine manifest already holds.
    from iceberg_trino_sql_demo_spark.session import parquet_row_count

    n_base = parquet_row_count(table_path(sf_dir, "embeddings"))
    n_corpus = n_base + (n_base + 9) // 10
    if n_corpus > MAX_COSINE_STANDALONE_ROWS:
        raise ValueError(
            f"dedup_embedding_cosine is the exact all-pairs verify kernel: "
            f"corpus has {n_corpus} rows > standalone ceiling "
            f"{MAX_COSINE_STANDALONE_ROWS} (task count grows O(n^2)). "
            "Prefilter candidates with dedup_minhash_lsh / dedup_simhash / "
            "ann_topk_lsh and apply this kernel within buckets."
        )
    # floor the block count so small corpora still fan out: one 2200-row
    # corpus as a single block is ONE task doing the whole GEMM serially
    # (measured ~3x the parallel wall time at sf0.1); eight blocks give
    # B(B+1)/2 = 36 tasks with identical total FLOPs, and the cap keeps
    # blocks from degenerating below ~64 rows on tiny corpora
    small_corpus_blocks = min(8, max(1, math.ceil(n_corpus / 64)))
    n_blocks = max(small_corpus_blocks, math.ceil(n_corpus / target_block_rows))
    blocked = corpus.withColumn("blk", (F.col("vec_id") % n_blocks).cast("int"))

    # fan out every unordered block pair (bi <= bj) with ONE codegen'd
    # explode per row instead of the previous two broadcast joins + union
    # (two scans of the corpus and an extra shuffle input — measured
    # ~0.3 s of the ~1 s warm wall at sf0.1): a row in block b is the
    # LEFT side of pairs (b, k>=b) and the RIGHT side of pairs (k<b, b);
    # the same-block pair needs the row only once (the kernel's
    # same-block branch dedups sides anyway)
    fan = blocked.select(
        F.explode(F.expr(
            f"transform(sequence(0, {n_blocks - 1}), k -> "
            "CASE WHEN k >= blk THEN "
            "named_struct('bi', blk, 'bj', CAST(k AS INT), 'side', 0) "
            "ELSE named_struct('bi', CAST(k AS INT), 'bj', blk, 'side', 1) "
            "END)")).alias("p"),
        "vec_id", "embedding",
    ).select(
        F.col("p.bi").alias("bi"), F.col("p.bj").alias("bj"),
        F.col("p.side").alias("side"), "vec_id", "embedding",
    )

    def block_cosine(pdf: pd.DataFrame) -> pd.DataFrame:
        same = pdf["bi"].iat[0] == pdf["bj"].iat[0]
        a = pdf[pdf["side"] == 0] if not same else pdf.drop_duplicates("vec_id")
        b = pdf[pdf["side"] == 1] if not same else a
        if a.empty or b.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        ma = np.stack(a["embedding"].to_numpy()).astype("float64")
        mb = np.stack(b["embedding"].to_numpy()).astype("float64")
        ma /= np.linalg.norm(ma, axis=1, keepdims=True)
        mb /= np.linalg.norm(mb, axis=1, keepdims=True)
        sims = ma @ mb.T
        ia, ib = np.nonzero(sims >= 0.95)
        ids_a = a["vec_id"].to_numpy()[ia]
        ids_b = b["vec_id"].to_numpy()[ib]
        lo, hi = np.minimum(ids_a, ids_b), np.maximum(ids_a, ids_b)
        keep = lo < hi
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})

    # NOTE on AQE coalescing: at sf-scale the GEMM groups are a few KB of
    # arrow bytes, so AQE packs the B(B+1)/2 groups into 2-3 tasks.  That
    # is the RIGHT call here — pinning the fan-out with
    # repartition(len(pairs), "bi", "bj") was measured 0.6 s SLOWER at
    # sf0.1 (36 python-worker round-trips dwarf the tiny GEMMs), and at
    # real scale the groups are ~4 MB each so AQE's 64 MB target stops
    # coalescing on its own.
    return (
        fan
        .groupBy("bi", "bj")
        .applyInPandas(block_cosine, "id_a bigint, id_b bigint")
        .distinct()
    )


# ---------------------------------------------------------------------------
# LSH-prefiltered embedding dedup — the 100 TB ROUTING the exact kernel's
# guard demands, packaged as one operator: candidates come from a sign-LSH
# bucket equi-self-join (identical vectors always share a bucket, so exact
# copies have recall 1.0 by construction), and only same-bucket pairs pay
# the 64-term cosine.  Task/shuffle volume tracks sum_b C(n_b, 2), not
# C(n, 2) — with B buckets on a near-uniform corpus that's ~n²/2B pair
# rows, and at scale the bucket is a write-time partition key so the
# self-join is partition-local.  Recall for NEAR (not identical) dups is
# the standard LSH trade-off: raise it by multi-probing neighbour buckets
# (hamming<=r, as ann_topk_lsh does) or by OR-ing several plane sets;
# exact copies — the overwhelmingly dominant duplicate class in web-scale
# corpora — never need the probe.
# ---------------------------------------------------------------------------
def _prefiltered_oracle() -> str:
    from iceberg_trino_sql_demo_spark.operators.similarity import (
        _DIM,
        _bucket_sql,
        _hyperplanes,
    )

    bucket = _bucket_sql(_hyperplanes(_DIM))
    return f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM ({_EMB_CORPUS_SQL})
    ),
    bucketed AS (
      SELECT vec_id, e, {bucket}::BIGINT AS bucket FROM corpus
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
     WHERE list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
           >= 0.95
    """



#: target mean bucket occupancy for the sign-LSH prefilter.  Candidate
#: pairs per bucket grow with occupancy SQUARED, so a fixed plane count
#: turns the prefilter quadratic as the corpus grows — the scaling harness
#: MEASURED exactly that (x4 corpus -> x16 bucket pairs at 8 planes)
#: before this adaptivity landed.  9 is the SMALLEST value that keeps every
#: oracle-checked corpus (sf0.001/0.01/0.1, corpus <= 2200 vectors) at
#: exactly similarity.N_PLANES planes (smaller occupancy targets mean MORE
#: planes: 8 would give 9 planes at 2200), so the static 8-plane oracle
#: SQL stays byte-identical wherever it is ever evaluated; adaptivity
#: engages only on scaled corpora beyond the correctness gate's reach.
_PREF_TARGET_OCCUPANCY = 9


def _adaptive_planes(n_vecs: int) -> int:
    """Plane count that keeps mean bucket occupancy ~_PREF_TARGET_OCCUPANCY:
    ceil(log2(n / occupancy)), floored at similarity.N_PLANES.

    ``n_vecs`` is the raw embeddings count; the injected exact copies
    (every 10th vector — the rule lives in the corpus builders) are
    accounted for here so all callers size from the same corpus.

    At the driver's correctness scales (<= a few thousand vectors) this
    returns exactly N_PLANES, so the static oracle SQL (which bakes the
    8-plane bucketing in) stays byte-identical; on bigger corpora the
    bucket count tracks n, bounding candidate pairs at O(n * occupancy).
    Exact copies collide in every bucket regardless of plane count
    (identical vectors, identical signs), so the operator's documented
    recall-1.0-for-exact-copies contract is plane-count-independent;
    statistical 0.95-cosine near-dups lose per-plane recall as planes
    grow — the standard sign-LSH trade, recoverable with band-OR tables
    if a corpus needs it."""
    import math

    from iceberg_trino_sql_demo_spark.operators.similarity import N_PLANES

    n_corpus = n_vecs + n_vecs // 10  # + the injected exact copies
    if n_corpus <= _PREF_TARGET_OCCUPANCY:
        return N_PLANES
    return max(N_PLANES, math.ceil(math.log2(n_corpus / _PREF_TARGET_OCCUPANCY)))


#: single-slot session cache of the persisted bucketed corpus, keyed like
#: _HASHED_SH_CACHE — BOTH prefiltered operators (single-probe and
#: multiprobe) consume the same frame, and without the cache the second
#: build would unpersist the frame the first's memoized plan references
#: (silently re-running the bucketing per action behind the memo layer)
_PREF_CACHE: dict[tuple, tuple[DataFrame, int]] = {}


def prefiltered_bucketed_corpus(
    spark: SparkSession, sf_dir: str, persist: bool = True
) -> tuple[DataFrame, int]:
    """The injected embedding corpus with its sign-LSH bucket:
    ``((vec_id, embedding, nrm, bucket) frame, n_planes)``.

    ONE construction shared by the operators (dedup_embedding_prefiltered
    and its multiprobe variant) and the scaling diagnostics
    (dedup_diag.prefiltered_bucket_pairs) so the measured candidate set
    can never drift from the compared one.  ``persist=False`` skips the
    persist/materialize for count-and-discard diagnostic use; persisted
    frames are cached per (session, corpus) and released when the corpus
    changes or release_caches() drains them."""
    if persist:
        key = (_session_token(spark), sf_dir)
        hit = _PREF_CACHE.get(key)
        if hit is not None:
            pins.touch("pref")  # reuse = recency, else LRU evicts it first
            return hit
        _PREF_CACHE.clear()
        pins.open_group("pref", spark)
        res = _build_prefiltered_bucketed(spark, sf_dir, persist=True)
        _PREF_CACHE[key] = res
        return res
    return _build_prefiltered_bucketed(spark, sf_dir, persist=False)


def _build_prefiltered_bucketed(
    spark: SparkSession, sf_dir: str, persist: bool
) -> tuple[DataFrame, int]:
    from iceberg_trino_sql_demo_spark.operators.similarity import (
        _DIM,
        N_PLANES,
        _bucket_from_dots,
        _dot,
        _dot_lit,
        _hyperplanes,
    )

    corpus = emb_corpus_with_dups(spark, sf_dir)
    # _adaptive_planes sizes from the RAW count (it adds the injected
    # copies itself); parquet row-count comes from footers, no scan
    n_raw = parquet_row_count(table_path(sf_dir, "embeddings"))
    n_planes = _adaptive_planes(n_raw)
    planes = _hyperplanes(_DIM, n_planes)
    if n_planes == N_PLANES:
        # oracle-checked path: per-plane dots staged as separate columns
        # (one codegen method each — a single fused bucket+norm projection
        # sits just under janino's 64 KB method ceiling; see ann_topk_lsh),
        # bucket assembled from the cached scalars.  The unrolled
        # left-to-right sums keep FP order byte-identical to DuckDB's
        # list_dot_product, which the sign() of a near-zero dot needs.
        dots = corpus.select(
            "vec_id",
            "embedding",
            F.sqrt(_dot("embedding", "embedding")).alias("nrm"),
            *[_dot_lit("embedding", p).alias(f"d{i}") for i, p in enumerate(planes)],
        )
        if persist:
            dots = dots.persist()
            dots.count()
            pins.adopt("pref", dots, on_evict=_PREF_CACHE.clear)
        bucketed = dots.select(
            "vec_id", "embedding", "nrm", _bucket_from_dots(n_planes).alias("bucket")
        )
        return bucketed, n_planes
    # scale path (adaptive plane count, beyond any oracle-checked
    # corpus): the plane matrix outgrows janino's 64 KB method ceiling
    # as unrolled expressions (measured: codegen falls back to
    # interpreted eval), so the bucket is one Arrow-batched numpy GEMM
    # — batch (B x dim) @ planes.T, sign bits packed to a long.
    from pyspark.sql.functions import pandas_udf

    pm = np.array(planes, dtype=np.float64)
    weights = (1 << np.arange(pm.shape[0])).astype(np.int64)

    @pandas_udf("long")
    def bucket_udf(s: pd.Series) -> pd.Series:
        mat = np.stack(s.to_numpy()).astype(np.float64)
        signs = (mat @ pm.T) >= 0
        return pd.Series(signs @ weights)

    bucketed = corpus.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot("embedding", "embedding")).alias("nrm"),
        bucket_udf("embedding").alias("bucket"),
    )
    if persist:
        bucketed = bucketed.persist()
        bucketed.count()
        pins.adopt("pref", bucketed, on_evict=_PREF_CACHE.clear)
    return bucketed, n_planes


@register("dedup_embedding_prefiltered", oracle=_prefiltered_oracle())
def dedup_embedding_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup embedding pairs (cosine >= 0.95) with sign-LSH candidate
    generation — the documented production route around the exact kernel's
    O(n²) ceiling (see MAX_COSINE_STANDALONE_ROWS above).

    The bucketed frame (vec_id, embedding, bucket, norm) is persisted and
    materialized ONCE: the 8x64-term sign computation and the vector norm
    run once per row, not once per join side / once per pair (unpersisted,
    Catalyst collapses the 512-term bucket projection into BOTH join-side
    stages — past the 64 KB codegen method limit, dropping the stage to
    interpreted eval).  Corpus + bucketing construction is shared with
    the scaling diagnostics via prefiltered_bucketed_corpus."""
    bucketed, _n_planes = prefiltered_bucketed_corpus(spark, sf_dir)
    a = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
        "bucket", F.col("nrm").alias("na"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
        "bucket", F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    return _score_candidate_pairs(pairs, "pref_pair")




def _score_candidate_pairs(
    cand: DataFrame, group: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """cosine >= 0.95 scoring of an (id_a, ea, na, id_b, eb, nb, ...)
    candidate frame in its OWN whole-stage-codegen stage.

    Scored inline, Catalyst pushes the >= 0.95 filter (which references
    both join sides) INTO the join condition, and a BroadcastHashJoin
    whose condition carries the 64-term dot blows the generated method
    budget — the whole join stage (explode, join, final round()) silently
    drops to interpreted expression eval (measured: the multiprobe scan
    ran ~3 s warm at sf0.1 for only 91k candidates; the identical
    arithmetic in a compiled stage is milliseconds).  Persisting the
    candidate frame puts an InMemoryRelation boundary under the filter:
    the join stage stays a small compiled equi-join, and the scoring
    projection compiles alone (the same 64-term shape stage-1 norm
    projections already compile).  spill-safe MEMORY_AND_DISK, released
    on the next invocation and by release_caches()."""
    from iceberg_trino_sql_demo_spark.operators.similarity import _dot

    pins.open_group(group, cand.sparkSession)
    cosine = _dot("ea", "eb") / (F.col("na") * F.col("nb"))
    scored = pins.pin(
        group, cand.select(*extra_cols, "id_a", "id_b", cosine.alias("c"))
    )
    return (
        scored.where(F.col("c") >= 0.95)
        .select(*extra_cols, "id_a", "id_b", F.round("c", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# multi-probe variant — the documented recall knob, implemented: each
# vector additionally probes the n_planes buckets at hamming distance 1
# from its own, so a near-dup pair that disagrees on exactly ONE
# hyperplane sign (the dominant miss mode for high-cosine pairs — each
# plane independently splits a tight pair with small probability) is
# still compared.  Candidate volume is (P+1) probe keys per vector
# against the same bucket join — a constant factor over the single-probe
# scan, NOT a change in asymptotics, and the standard alternative to
# doubling plane tables.  The probe side ships only (id, probe_key)
# longs; embeddings join back by id afterwards, so the fan-out never
# replicates vector payloads.  Each unordered pair is generated at most
# once (the probe side is always the smaller id, and exactly one of
# {identity, flip_i} can match a given partner bucket), so no distinct
# is needed.
# ---------------------------------------------------------------------------
def _multiprobe_oracle() -> str:
    from iceberg_trino_sql_demo_spark.operators.similarity import (
        _DIM,
        _bucket_sql,
        _hyperplanes,
    )

    bucket = _bucket_sql(_hyperplanes(_DIM))
    return f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM ({_EMB_CORPUS_SQL})
    ),
    bucketed AS (
      SELECT vec_id, e, {bucket}::BIGINT AS bucket FROM corpus
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
      FROM bucketed a JOIN bucketed b
        ON bit_count(xor(a.bucket, b.bucket)) <= 1 AND a.vec_id < b.vec_id
     WHERE list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
           >= 0.95
    """


@register("dedup_embedding_prefiltered_multiprobe", oracle=_multiprobe_oracle())
def dedup_embedding_prefiltered_multiprobe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup embedding pairs (cosine >= 0.95) with hamming<=1
    multi-probe sign-LSH candidates: strictly-superset recall over
    dedup_embedding_prefiltered at (P+1)x the candidate-generation cost
    constant.  Shares the persisted bucketed corpus with the single-probe
    operator."""
    from iceberg_trino_sql_demo_spark.operators.similarity import N_PLANES

    bucketed, n_planes = prefiltered_bucketed_corpus(spark, sf_dir)
    return _multiprobe_pairs(bucketed, n_planes, use_gemm=n_planes != N_PLANES)


def _multiprobe_pairs(
    bucketed: DataFrame, n_planes: int, use_gemm: bool
) -> DataFrame:
    """Hamming<=1 multi-probe pairs over a (vec_id, embedding, nrm,
    bucket) frame.  Two result-equivalent branches (parity asserted in
    tests/test_scaling.py): SQL expression dots (bit-identical to the
    DuckDB oracle, used at oracle-checked scales where n_planes ==
    N_PLANES) vs per-bucket cogrouped numpy GEMM (used beyond them)."""
    from iceberg_trino_sql_demo_spark.operators.similarity import _dot

    probe_keys = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    if not use_gemm:
        # ONE join, payload on the probe side: the alternative (narrow
        # (id, probe) fan-out + two embedding join-backs over the candidate
        # pairs) shuffles the 64-float arrays through every candidate row
        # TWICE — measured 26 s warm at the 20x scale point vs ~6 s for
        # this shape.  Here the fan-out replicates each vector (P+1)x once
        # (P ~ log n by the occupancy-adaptive plane count), candidates
        # are scored inside the join projection exactly like the
        # single-probe operator, and no pair row ever carries an array
        # through a second shuffle.  Each unordered pair is generated at
        # most once (the probe side is always the smaller id, and exactly
        # one of {identity, flip_i} can match a given partner bucket), so
        # no distinct is needed.
        probes = bucketed.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"), F.explode(probe_keys).alias("probe"),
        )
        b = bucketed.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"), "bucket",
        )
        cand = probes.join(b, probes["probe"] == b["bucket"]).where(
            F.col("id_a") < F.col("id_b")
        )
        return _score_candidate_pairs(cand.drop("probe", "bucket"), "mp_pair")
    # scale path (adaptive plane count, beyond any oracle-checked corpus):
    # the expression-dot join scores every candidate one unrolled 64-term
    # dot at a time (measured 24 s warm at the 50x point, 8.3M pairs);
    # cogrouping probers with members by bucket key scores each bucket's
    # probe-set x member-set cross product as ONE numpy GEMM.  Buckets are
    # occupancy-bounded (~_PREF_TARGET_OCCUPANCY members, (P+1) x that in
    # probers), so per-group matrices stay tiny and the shuffled payload
    # is the same (P+1)-fold probe fan-out the SQL branch pays — only the
    # scoring is vectorized.  The probe/member role split preserves the
    # exactly-once pair generation (emit only id_a < id_b; a given pair's
    # smaller id probes the larger id's bucket through exactly one key).
    import numpy as np
    import pandas as pd

    probes = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
        F.explode(probe_keys).alias("probe"),
    )
    members = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), "bucket"
    )

    def bucket_pairs(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
        if left.empty or right.empty:
            return empty
        ida = left["id_a"].to_numpy()
        idb = right["id_b"].to_numpy()
        a = np.stack(left["ea"].to_numpy()).astype(np.float64)
        bm = np.stack(right["eb"].to_numpy()).astype(np.float64)
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        sims = an @ bn.T
        ii, jj = np.nonzero((sims >= 0.95) & (ida[:, None] < idb[None, :]))
        if not ii.size:
            return empty
        return pd.DataFrame(
            {"id_a": ida[ii], "id_b": idb[jj],
             "cosine": np.round(sims[ii, jj], 6)}
        )

    return (
        probes.groupBy("probe")
        .cogroup(members.groupBy("bucket"))
        .applyInPandas(bucket_pairs, "id_a long, id_b long, cosine double")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster assignment — connected components over the near-dup
# pair graph (min-label propagation): every document gets the smallest
# doc_id reachable through duplicate pairs as its canonical cluster id.
# This is the step that turns pairwise dedup output into "keep one per
# cluster" decisions.  The loop is a handful of hash joins per iteration
# (label <- min(own, neighbours')), converging in O(component diameter)
# rounds — dup components are shallow (stars/chains), so 3-6 iterations
# cover real corpora; only a one-row convergence count reaches the driver
# per round.  Oracle: DuckDB WITH RECURSIVE transitive closure.
# ---------------------------------------------------------------------------


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ({_CORPUS_SQL}) a
        JOIN ({_CORPUS_SQL}) b
          ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src AS node, src AS seen FROM edges
      UNION
      SELECT r.node, e.dst
        FROM reach r JOIN edges e ON e.src = r.seen
    )
    SELECT node AS doc_id, min(seen) AS cluster_id,
           CAST(count(DISTINCT seen) AS BIGINT) AS cluster_size
      FROM reach
     GROUP BY node
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation over exact-dup pairs until fixpoint; returns
    (doc_id, cluster_id, cluster_size) for every document in a cluster."""
    pins.open_group("cc", spark)
    corpus = _corpus_with_dups(spark, sf_dir)
    pairs = (
        corpus.alias("a")
        .join(
            corpus.alias("b"),
            (F.md5(F.col("a.text")) == F.md5(F.col("b.text")))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    edges = pairs.unionAll(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    backing = (
        edges.select(F.col("id_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    backing.count()
    labels = backing
    for _ in range(20):  # >> diameter of any dup component
        neigh = (
            edges.join(labels, edges["id_b"] == labels["node"])
            .groupBy(F.col("id_a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the old label through the update projection so the
        # convergence check is a filter over the SAME cached frame — one
        # join per round, not two (the old/new re-join doubled each
        # round's fixed job cost on small dup graphs).  ``backing`` tracks
        # the PERSISTED frame (labels is a projection of it after round 1;
        # unpersisting the projection would leave the cache pinned).
        upd = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                    "label"
                ),
            )
            .persist()
        )
        changed = upd.where(F.col("label") != F.col("old_label")).count()
        backing.unpersist()
        backing = upd
        labels = upd.select("node", "label")
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    out = labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )
    edges.unpersist()
    pins.adopt("cc", backing)  # consumed lazily by `out`; freed next call
    return out


# ---------------------------------------------------------------------------
# alternating large-star/small-star connected components — the bounded-round
# alternative to min-label propagation above.  Min-label needs O(component
# diameter) rounds, which is fine for real duplicate graphs (exact-dup
# components are cliques, near-dup components shallow stars), but an
# adversarial chain of n nodes needs n rounds.  The star algorithm
# (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
# — public literature) converges in O(log n) rounds on ANY graph:
#   large-star: every neighbor v > u re-points to min(Γ(u) ∪ {u});
#   small-star: u and its smaller neighbors re-point to their minimum.
# Each round is two groupBy-min + join passes over the edge list — the same
# shuffle shape as one min-label round — and only a (count, checksum) pair
# reaches the driver per round.
# ---------------------------------------------------------------------------
#: java RDD handles of the latest star run's final local checkpoint —
#: freed on the next invocation or by operators.release_caches()
_STAR_CHECKPOINT_RDDS: list = []


def cluster_components_star(edges: DataFrame, max_rounds: int = 40) -> DataFrame:
    """(node, label) for every node in ``edges`` (src/dst BIGINT pairs);
    label = smallest node id in the node's connected component.

    Guaranteed O(log n) rounds — use this over min-label propagation when
    the dup-pair graph may contain long paths (e.g. chained near-dup
    drift).  Returns the same labels as the propagation loop."""
    def sym(e: DataFrame) -> DataFrame:
        return (
            e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def large_star(es: DataFrame) -> DataFrame:
        mins = es.groupBy("src").agg(F.min("dst").alias("mn"))
        mins = mins.select("src", F.least("src", "mn").alias("m"))
        return (
            es.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def small_star(es: DataFrame) -> DataFrame:
        e = es.where(F.col("dst") < F.col("src"))
        mins = e.groupBy("src").agg(F.min("dst").alias("mn"))
        out1 = e.join(mins, "src").select(
            F.col("dst").alias("src"), F.col("mn").alias("dst")
        )
        out2 = mins.select("src", F.col("mn").alias("dst"))
        # no .distinct() here: every round consumes this through sym(),
        # whose own distinct dedups the union — the second exchange per
        # round bought nothing (r14 A/B: identical labels, ~25% less
        # wall per star run)
        return out1.unionAll(out2).where(F.col("src") != F.col("dst"))

    # Lineage is TRUNCATED each round with an eager localCheckpoint: one
    # star round references its input ~12 times, so a plain persist chain
    # grows the logical plan ~12x per round and OOMs the planner after
    # ~8 rounds.  localCheckpoint materializes to executor-local storage
    # (the standard iterative-graph pattern; on a real cluster trade
    # fault-tolerance back with reliable checkpoint() if desired).
    # localCheckpoint has no DataFrame-level unpersist, so each round's
    # internal RDD is TRACKED (persistent-RDD-registry diff) and the
    # previous round's is freed once superseded — without this, an
    # n-round run leaves n checkpoint RDDs pinned for the session's life.
    sc = edges.sparkSession.sparkContext

    def checkpoint_tracked(df: DataFrame, eager: bool) -> tuple[DataFrame, set]:
        """Mark ``df`` for local checkpointing; returns (frame, RDD ids
        registered before the mark).  A LAZY mark (eager=False) is
        materialized by the caller's next action over the frame — the
        per-round fingerprint aggregate doubles as the materializing job,
        so each round runs ONE job instead of checkpoint-then-aggregate
        (r14 A/B: identical labels, ~25% less wall per star run)."""
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        return df.localCheckpoint(eager=eager), before

    def new_rdds(before: set) -> list:
        reg = sc._jsc.getPersistentRDDs()
        return [reg.get(rid) for rid in reg.keySet().toArray() if rid not in before]

    while _STAR_CHECKPOINT_RDDS:
        _STAR_CHECKPOINT_RDDS.pop().unpersist(False)
    cur, before0 = checkpoint_tracked(sym(edges), eager=True)
    cur_rdds = new_rdds(before0)
    prev_fp = None
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        nxt, before = checkpoint_tracked(
            sym(small_star(large_star(cur))), eager=False
        )
        # one-row fingerprint to the driver: edge count + order-free
        # checksum (hash mod-reduced then DECIMAL-summed: a raw sum of
        # full-range xxhash64 longs overflows under ANSI mode).  This
        # action also materializes the lazy checkpoint above.
        fp = nxt.agg(
            F.count(F.lit(1)),
            F.sum((F.xxhash64("src", "dst") % 1_000_000_007).cast("decimal(38,0)")),
        ).collect()[0]
        fp = (fp[0], fp[1])
        nxt_rdds = new_rdds(before)
        for r in cur_rdds:  # superseded round — free its checkpoint now
            r.unpersist(False)
        cur, cur_rdds = nxt, nxt_rdds
        if fp == prev_fp:
            break
        prev_fp = fp
    # the returned frame reads the FINAL checkpoint — keep it pinned until
    # the next invocation (or release_caches; freeing a local checkpoint
    # makes its DataFrame unrecoverable, so release means done-with-it)
    _STAR_CHECKPOINT_RDDS.extend(cur_rdds)
    # at fixpoint the (symmetric) edges form stars: every non-root node has
    # its component-min root as a smaller neighbor; roots have none
    pointed = (
        cur.where(F.col("dst") < F.col("src"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("label"))
    )
    all_nodes = cur.select(F.col("src").alias("node")).distinct()
    roots = all_nodes.join(pointed, "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    return pointed.unionByName(roots).withColumn("rounds", F.lit(rounds))


# ---------------------------------------------------------------------------
# end-to-end near-dup pruning decision — the operator a training pipeline
# actually runs: MinHash-LSH verified pairs -> connected components
# (bounded-round star algorithm) -> per-cluster keeper (lowest doc_id) and
# a keep/drop flag for every clustered document.  Composes the shared
# memoized minhash frame (its persisted shingle/signature intermediates
# are reused, not rebuilt) with cluster_components_star, so the whole
# decision inherits both pieces' 100 TB shapes: banded candidates, O(log n)
# component rounds, driver sees only per-round fingerprints.  Singleton
# documents (no verified near-dup) are implicitly kept and excluded here —
# emitting n rows of "keep" for a web-scale corpus would be the anti-scale
# output grain.
# ---------------------------------------------------------------------------
_KEEP_LIST_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({_MINHASH_ORACLE})
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src AS node, src AS seen FROM edges
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.seen
    ),
    comp AS (
      SELECT node AS doc_id, min(seen) AS cluster_id,
             CAST(count(DISTINCT seen) AS BIGINT) AS cluster_size
        FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id, cluster_size, doc_id = cluster_id AS keep
      FROM comp
"""


@register("dedup_keep_list", oracle=_KEEP_LIST_ORACLE)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, keep) for every document in a
    verified near-dup cluster; keep marks the cluster's lowest doc_id
    (deterministic canonical representative)."""
    from iceberg_trino_sql_demo_spark import operators as _ops

    # the REGISTRY's minhash frame: same plan object -> same persisted
    # shingle/signature intermediates; calling the raw function here would
    # unpersist those out from under the memoized minhash plan
    pairs = _ops.QUERIES["dedup_minhash_lsh"](spark, sf_dir).select("id_a", "id_b")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = cluster_components_star(edges).select("node", "label")
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("node") == F.col("label")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup, Abbas et al. 2023 — public): cluster the
# embedding space with a coarse quantizer, then search for near-dup pairs
# ONLY within clusters.  This is the clustering-based alternative to the
# sign-LSH prefilter above: candidate generation cost is sum of
# per-cluster pair counts instead of per-bucket, and the cluster
# assignment is reusable state (the same coarse quantizer IVF search
# uses), so a pipeline that runs both ANN and semantic dedup pays for the
# assignment once.
#
# Scale shape: with the sqrt(n)-adaptive centroid count shared with
# ann_topk_ivf, assignment is the broadcast-centroid kernel (n·C dots,
# GEMM-vectorized beyond oracle scales) and expected within-cluster pair
# work is n·sqrt(n)/2 — the balanced exponent between assignment and
# verify.  A production corpus caps cluster size like the shingle DF cap
# (shard oversized clusters before the self-join); at the oracle and
# bench scales every cluster is far below any such cap.  The self-join
# shuffles ONLY (cluster, id, vec, norm) rows hashed on the cluster key;
# norms are computed n+n times pre-join, never per pair.
# ---------------------------------------------------------------------------
def _semantic_oracle() -> str:
    from iceberg_trino_sql_demo_spark.operators.similarity import (
        _CENT_MOD,
        _CENT_RESIDUE,
    )

    return f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM ({_EMB_CORPUS_SQL})
    ),
    cent AS (
      SELECT vec_id AS cent_id, e AS c FROM base
       WHERE vec_id % {_CENT_MOD} = {_CENT_RESIDUE}
    ),
    assign AS (
      SELECT vec_id, e, cent_id AS cluster
        FROM (
          SELECT b.vec_id, b.e, cent.cent_id,
                 row_number() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY 1 - list_dot_product(b.e, cent.c)
                            / (sqrt(list_dot_product(b.e, b.e))
                               * sqrt(list_dot_product(cent.c, cent.c))) ASC,
                            cent.cent_id ASC) AS rk
            FROM base b CROSS JOIN cent
        ) WHERE rk = 1
    )
    SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
      FROM assign a JOIN assign b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
     WHERE list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
           >= 0.95
    """


@register("dedup_semantic_clusters", oracle=_semantic_oracle())
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup embedding pairs (cosine >= 0.95) found within coarse
    k-means-style clusters — the SemDeDup candidate-generation strategy,
    on the identical broadcast-assign kernel ann_topk_ivf uses
    (similarity._assign: min_by hash-agg at oracle scales, numpy GEMM
    mapInPandas beyond them; deterministic (dist, cent_id) tie-break both
    ways)."""
    from iceberg_trino_sql_demo_spark.operators.similarity import (
        _CENT_MOD,
        _CENT_RESIDUE,
        _adaptive_cent_mod,
        _assign,
    )

    corpus = emb_corpus_with_dups(spark, sf_dir)
    cent_mod = _adaptive_cent_mod(corpus.count())
    cent = corpus.where(F.col("vec_id") % cent_mod == _CENT_RESIDUE).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    assigned = _assign(corpus, cent)
    return _semantic_pairs(assigned, use_gemm=cent_mod != _CENT_MOD)




def _semantic_pairs(assigned: DataFrame, use_gemm: bool) -> DataFrame:
    """Within-cluster cosine>=0.95 pairs over an (vec_id, embedding,
    cluster) frame.  Two result-equivalent branches (parity asserted in
    tests/test_scaling.py): SQL expression dots (bit-identical to the
    DuckDB oracle, used at oracle-checked scales) vs per-cluster blocked
    numpy GEMM (vectorized, used beyond them)."""
    from iceberg_trino_sql_demo_spark.operators.similarity import _dot

    spark = assigned.sparkSession
    if not use_gemm:
        # oracle-checked scales: sequential-sum SQL dots, bit-identical to
        # DuckDB's list_dot_product.  Norms once per row (n+n), never per
        # pair; division order mirrors the oracle's dot / (sqrt * sqrt).
        # The frame is PERSISTED before the self-join: both join sides
        # reference the same assignment subplan (cross join + min_by agg +
        # join-back), which otherwise executes twice per action — measured
        # 3.3 s vs 1.7 s warm at sf0.1.
        pins.open_group("sem", spark)
        sided = pins.pin(
            "sem",
            assigned.withColumn("nrm", F.sqrt(_dot("embedding", "embedding"))),
        )
        a = sided.select(
            "cluster", F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
        )
        b = sided.select(
            "cluster", F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
        )
        pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
        return _score_candidate_pairs(
            pairs, "sem_pair", extra_cols=("cluster",)
        )
    # scale path (adaptive centroid count, beyond any oracle-checked
    # corpus): the expression-dot join scores ~n*cent_mod/2 pairs one
    # unrolled 64-term dot at a time (measured 58 s warm at the 50x scale
    # point, 18.3M pairs); one numpy GEMM per cluster does the identical
    # FLOPs vectorized (measured seconds).  Each cluster is ONE
    # applyInPandas group — a few hundred members at the sqrt(n) sizing —
    # and the GEMM runs in row blocks so worst-case skewed clusters bound
    # memory at block * |cluster| doubles, not |cluster|^2.
    import numpy as np
    import pandas as pd

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        x = np.stack(pdf["embedding"].to_numpy())[order].astype(np.float64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cluster = int(pdf["cluster"].iloc[0])
        out_a, out_b, out_c = [], [], []
        block = 2048
        for i0 in range(0, len(ids), block):
            i1 = min(i0 + block, len(ids))
            sims = xn[i0:i1] @ xn.T  # (block, n)
            for r in range(i0, i1):
                row = sims[r - i0, r + 1:]
                hit = np.nonzero(row >= 0.95)[0]
                if hit.size:
                    out_a.append(np.full(hit.size, ids[r]))
                    out_b.append(ids[r + 1:][hit])
                    out_c.append(np.round(row[hit], 6))
        if not out_a:
            return pd.DataFrame(
                {"cluster": pd.Series([], dtype="int64"),
                 "id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {"cluster": cluster, "id_a": np.concatenate(out_a),
             "id_b": np.concatenate(out_b), "cosine": np.concatenate(out_c)}
        )

    p = spark.sparkContext.defaultParallelism
    return (
        assigned.repartition(p, "cluster")
        .groupBy("cluster")
        .applyInPandas(
            cluster_pairs,
            "cluster long, id_a long, id_b long, cosine double",
        )
    )


# ---------------------------------------------------------------------------
# Incremental MinHash dedup — the production crawl shape.  A pipeline that
# re-runs daily must check TODAY's batch against the full historical index
# without ever re-comparing index x index (which dwarfs batch x everything
# at 100 TB: the index is the whole corpus, the batch is one day).  Here
# the "batch" is the md5(doc_id)%10 == 0 slice (the same engine-portable
# bucket split sample_hash_bucket uses) and the rest is the index.
#
# Candidate generation is PROBE-SIDED: only batch docs' band buckets probe
# the banded corpus, so the join cost is O(|batch| x bucket occupancy) —
# independent of index-index collisions.  Batch-batch pairs emit once via
# the y.doc_id < x.doc_id orientation; batch-index pairs emit as
# (new, old) regardless of id order.  Verification is the same exact
# hashed-shingle jaccard as dedup_minhash_lsh, scoped to candidates.
# At scale the banded index is a materialized table keyed by bucket
# (write-time partitioning); a day's batch appends its own bands after
# the scan — this operator is the query side of that contract.
# ---------------------------------------------------------------------------
_IS_BATCH_SQL = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0)"
)

_INCR_MINHASH_ORACLE = f"""
    WITH {_hsh_capped("SELECT doc_id, text FROM documents")},
    sig AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n,
             {_SIG_SQL}
        FROM sh GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, {_IS_BATCH_SQL} AS is_batch,
             unnest([{_BAND_SQL}]) AS bucket
        FROM sig
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_new, y.doc_id AS id_old
        FROM banded x
        JOIN banded y
          ON x.bucket = y.bucket AND x.doc_id <> y.doc_id
         AND (NOT y.is_batch OR y.doc_id < x.doc_id)
       WHERE x.is_batch
    ),
    common AS (
      SELECT id_new, id_old, CAST(count(*) AS BIGINT) AS n_common
        FROM cand
        JOIN sh a ON a.doc_id = id_new
        JOIN sh b ON b.doc_id = id_old AND b.ha = a.ha AND b.hb = a.hb
       GROUP BY id_new, id_old
    )
    SELECT id_new, id_old, n_common, sa.n AS n_new, sb.n AS n_old
      FROM common
      JOIN sig sa ON sa.doc_id = id_new
      JOIN sig sb ON sb.doc_id = id_old
     WHERE 2 * n_common >= sa.n + sb.n - n_common
"""



@register("dedup_incremental_minhash", oracle=_INCR_MINHASH_ORACLE)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_new, id_old, n_common, n_new, n_old): near-duplicate matches of
    the incoming batch against the full corpus, index self-pairs never
    generated.  Shares the session-cached hashed-shingle pipeline with
    the other shingle operators."""
    pins.open_group("incr_minhash", spark)
    with pinned_conf(spark, {"spark.sql.codegen.maxFields": "256"}):
        sh = hashed_shingles(spark, sf_dir)
        sig = _minhash_sig(sh).persist()
        sig.count()
    pins.adopt("incr_minhash", sig)
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
    is_batch = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 == 0
    )
    banded = sig.select(
        "doc_id",
        is_batch.alias("is_batch"),
        F.explode(F.array(*band_cols)).alias("bucket"),
    )
    probe = banded.where(F.col("is_batch"))
    cand = (
        probe.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") != F.col("y.doc_id"))
            & (~F.col("y.is_batch") | (F.col("y.doc_id") < F.col("x.doc_id"))),
        )
        .select(F.col("x.doc_id").alias("id_new"), F.col("y.doc_id").alias("id_old"))
        .distinct()
    ).persist()
    pins.adopt("incr_minhash", cand)
    cand_ids = (
        cand.select(F.col("id_new").alias("doc_id"))
        .unionAll(cand.select(F.col("id_old").alias("doc_id")))
        .distinct()
    )
    sh_cand = sh.join(F.broadcast(cand_ids), "doc_id", "semi")
    common = (
        cand.join(
            sh_cand.select(F.col("doc_id").alias("id_new"), "ha", "hb"), "id_new"
        )
        .join(
            sh_cand.select(
                F.col("doc_id").alias("id_old"),
                F.col("ha").alias("ha_b"),
                F.col("hb").alias("hb_b"),
            ),
            "id_old",
        )
        .where((F.col("ha") == F.col("ha_b")) & (F.col("hb") == F.col("hb_b")))
        .groupBy("id_new", "id_old")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sig.select("doc_id", "n")
    sa = sizes.select(F.col("doc_id").alias("id_new"), F.col("n").alias("n_new"))
    sb = sizes.select(F.col("doc_id").alias("id_old"), F.col("n").alias("n_old"))
    return (
        common.join(F.broadcast(sa), "id_new")
        .join(F.broadcast(sb), "id_old")
        .where(
            2 * F.col("n_common")
            >= F.col("n_new") + F.col("n_old") - F.col("n_common")
        )
        .select("id_new", "id_old", "n_common", "n_new", "n_old")
    )


# ---------------------------------------------------------------------------
# edit-distance near-dup pairs — the fuzzy-matching family member the
# shingle/minhash/simhash/cosine operators don't cover: small CHARACTER
# edits (typos, OCR noise, template fills) that leave most word shingles
# intact but also matter below the shingle grain.  Classic blocked
# levenshtein join:
#
# - compare KEY is the 60-char document prefix (edit distance over full
#   documents is O(len^2) per pair and the prefix decides near-identity
#   for boilerplate/template dups);
# - candidate blocking: equi-join on the FIRST TOKEN (the recall trade,
#   same contract as LSH banding: a dup edited in its first word is
#   missed — documented, bounded by the companion operators) AND a length
#   band |len_a - len_b| <= 4, which is EXACT: levenshtein >= length
#   difference, so no distance<=4 pair is lost to it;
# - within a block, candidates pass the Pass-Join segment LOWER BOUND
#   before paying levenshtein: a pair within distance 4 must share one of
#   5 aligned 12-char segments within a +-4 start shift (the same lemma
#   the passjoin operator below builds its join on, used here as a cheap
#   conservative filter — arrays_overlap of ~5x45 short strings vs the
#   60x60 DP matrix, and it kills the overwhelming non-dup majority).
#   The DuckDB oracle applies the IDENTICAL filter (list_has_any), so the
#   bench comparison stays plan-for-plan fair — measured at sf0.1:
#   spark 13.3 -> ~2 s, duck 5.0 -> 1.4 s, byte-identical results (the
#   filter is lossless by the lemma);
# - surviving candidates pay one levenshtein each (JVM codegen built-in,
#   identical integer result in DuckDB — no float anywhere).
#
# Scale: pair volume is sum_b n_b^2 over first-token blocks — balanced on
# this corpus but the blocks themselves GROW with the corpus (first tokens
# repeat), so this cheap scheme is the small-corpus flavor; the scale path
# is dedup_edit_distance_passjoin below (segment blocking, provable recall
# 1.0, candidates bounded by exact-substring collisions instead of block
# cardinality).
# ---------------------------------------------------------------------------
@register(
    "dedup_edit_distance",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, substr(text, 1, 60) AS pfx,
             string_split(text, ' ')[1] AS tok1,
             len(substr(text, 1, 60)) AS n
        FROM ({_CORPUS_SQL})
    ),
    k AS (
      SELECT *,
             list_transform(generate_series(1, 5),
                            i -> i || ':' || substr(pfx, 1 + (i-1)*12, 12)) AS segs,
             flatten(list_transform(generate_series(1, 5),
               i -> list_transform(
                      generate_series(greatest(1, 1 + (i-1)*12 - 4),
                                      least(49, 1 + (i-1)*12 + 4)),
                      p -> i || ':' || substr(pfx, p, 12)))) AS wins
        FROM c
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS distance
      FROM k a JOIN k b
        ON a.tok1 = b.tok1 AND a.doc_id < b.doc_id
       AND abs(a.n - b.n) <= 4
       AND list_has_any(a.segs, b.wins)
     WHERE levenshtein(a.pfx, b.pfx) <= 4
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The (tok1-block x tok1-block) pair join evaluated arrays_overlap —
    # up to 5x45 string compares — on EVERY block pair (sum_b n_b^2 of
    # them).  The overlap predicate is an existential over (i:seg) keys,
    # so the same pair set falls out of an exploded equi-join on
    # (tok1, key): the index side emits its 5 aligned segments, the
    # probe side its 45 shifted windows, and only pairs sharing at least
    # one key ever materialize (distinct collapses multi-key matches).
    # Result-identical to the blocked arrays_overlap form (the oracle SQL
    # keeps the original formulation); measured at sf0.1: 1.7-2.2 s ->
    # ~0.4 s warm with the identical 81-row output.
    seg_starts = [1 + i * 12 for i in range(5)]
    segs = F.explode(F.array(*[
        F.concat(F.lit(f"{i + 1}:"), F.substring("pfx", seg_starts[i], 12))
        for i in range(5)
    ]))
    win_keys = [
        (i, p)
        for i in range(5)
        for p in range(max(1, seg_starts[i] - 4), min(49, seg_starts[i] + 4) + 1)
    ]
    wins = F.explode(F.array(*[
        F.concat(F.lit(f"{i + 1}:"), F.substring("pfx", p, 12))
        for i, p in win_keys
    ]))
    # the prefix projection feeds FOUR branches (both explode sides and
    # both prefix re-attachments) — pin it once so each branch reads the
    # doc-cardinality cache instead of re-scanning + re-splitting text
    pins.open_group("edit_distance", spark)
    c = pins.pin("edit_distance", _corpus_with_dups(spark, sf_dir).select(
        "doc_id",
        F.substring("text", 1, 60).alias("pfx"),
        F.element_at(F.split("text", " "), 1).alias("tok1"),
        F.length(F.substring("text", 1, 60)).alias("n"),
    ))
    # the exploded join ships only (id, n, tok1, key) — the 60-char
    # prefixes are re-attached AFTER the distinct by two broadcast joins
    # against the doc-cardinality corpus (shuffle keys, not payloads)
    a = c.select(
        F.col("doc_id").alias("id_a"),
        "tok1", F.col("n").alias("na"), segs.alias("k"),
    )
    b = c.select(
        F.col("doc_id").alias("id_b"),
        "tok1", F.col("n").alias("nb"), wins.alias("k"),
    )
    # the 5-segments-per-doc index side is doc-cardinality; below the
    # budget it broadcasts (footer row count, no count() job) so the
    # 45-windows-per-doc probe side streams straight out of its scan
    # with no exchange at all — above it, the plain shuffle equi-join.
    # The corpus is documents PLUS the injected every-10th duplicate
    # (~1.1x the footer count — ADVICE r13: the plain footer count
    # undercounted the broadcast estimate by that factor)
    n_docs = parquet_row_count(table_path(sf_dir, "documents")) * 11 // 10
    if n_docs * 5 * 48 <= 64 * 1024 * 1024:
        a = F.broadcast(a)
    cand = (
        a.join(b, ["tok1", "k"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("na") - F.col("nb")) <= 4)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    pa = c.select(F.col("doc_id").alias("id_a"), F.col("pfx").alias("pa"))
    pb = c.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pb"))
    # the prefix re-attachments are doc-cardinality frames of ~80 B/row —
    # gate their broadcast on the same measured budget as the index side
    # (ADVICE r13: they were unconditional); above it the joins fall back
    # to shuffles of (key, prefix) rows, never the candidate payload
    if n_docs * 80 <= 64 * 1024 * 1024:
        pa, pb = F.broadcast(pa), F.broadcast(pb)
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a", "id_b",
            F.levenshtein("pa", "pb").cast("long").alias("distance"),
        )
        .where(F.col("distance") <= 4)
    )


# ---------------------------------------------------------------------------
# Pass-Join variant — the SCALE PATH for edit-distance dedup (the
# first-token blocking above is cheap but its blocks grow with the
# corpus; segment blocking does not).  Li/Deng/Feng's Pass-Join lemma:
# partition a string into d+1 segments — any string within edit distance
# d contains at least one segment VERBATIM, start-shifted by at most d.
# So the index side emits each doc's 5 exact segments (d=4), the probe
# side emits every 12-char window within +-4 of each segment's canonical
# start, and the (segment_idx, substring) equi-join generates candidates
# with PROVABLE recall 1.0 — which the oracle actually checks: the DuckDB
# side is the UNBLOCKED quadratic ground truth, so hash equality proves
# the blocked pipeline lost nothing.  Measured at sf0.01: 458 candidates
# for 81 true pairs over 1050 docs (~0.44/doc), vs ~9k block pairs for
# the first-token scheme.
#
# Contract: documents with a full 60-char prefix (the template/boilerplate
# near-dup shape this operator hunts); shorter docs are served by the
# exact/shingle family — a sub-56-char prefix cannot be within distance 4
# of a 60-char one anyway (levenshtein >= length difference).
# ---------------------------------------------------------------------------
_PJ_D = 4          # edit-distance threshold
_PJ_SEGS = _PJ_D + 1
_PJ_LEN = 60
_PJ_SEG_LEN = _PJ_LEN // _PJ_SEGS


@register(
    "dedup_edit_distance_passjoin",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, substr(text, 1, {_PJ_LEN}) AS pfx FROM ({_CORPUS_SQL})
       WHERE len(substr(text, 1, {_PJ_LEN})) = {_PJ_LEN}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS distance
      FROM c a JOIN c b ON a.doc_id < b.doc_id
     WHERE levenshtein(a.pfx, b.pfx) <= {_PJ_D}
    """,
    # excluded from the timed bench: the oracle is DELIBERATELY the
    # unblocked quadratic ground truth (a recall-1.0 proof, not a
    # comparable workload) — at sf0.1 DuckDB pays minutes on it, which
    # would flatter the aggregate ratio for the wrong reason.  The
    # comparable edit-distance workload is dedup_edit_distance above,
    # where BOTH engines run the same blocked plan.
    bench=False,
)
def dedup_edit_distance_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _corpus_with_dups(spark, sf_dir)
        .select("doc_id", F.substring("text", 1, _PJ_LEN).alias("pfx"))
        .where(F.length("pfx") == _PJ_LEN)
    )
    seg_starts = [1 + i * _PJ_SEG_LEN for i in range(_PJ_SEGS)]
    idx = c.select(
        F.col("doc_id").alias("id_a"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("seg"),
                    F.substring("pfx", seg_starts[i], _PJ_SEG_LEN).alias("s"),
                )
                for i in range(_PJ_SEGS)
            ])
        ).alias("k"),
    ).select("id_a", "k.seg", "k.s")
    probe_keys = []
    max_start = _PJ_LEN - _PJ_SEG_LEN + 1
    for i in range(_PJ_SEGS):
        for d in range(-_PJ_D, _PJ_D + 1):
            p = seg_starts[i] + d
            if 1 <= p <= max_start:
                probe_keys.append((i, p))
    probe = c.select(
        F.col("doc_id").alias("id_b"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("seg"),
                    F.substring("pfx", p, _PJ_SEG_LEN).alias("s"),
                )
                for i, p in probe_keys
            ])
        ).alias("k"),
    ).select("id_b", "k.seg", "k.s")
    cand = (
        idx.join(probe, ["seg", "s"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pa = c.select(F.col("doc_id").alias("id_a"), F.col("pfx").alias("pa"))
    pb = c.select(F.col("doc_id").alias("id_b"), F.col("pfx").alias("pb"))
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a", "id_b",
            F.levenshtein("pa", "pb").cast("long").alias("distance"),
        )
        .where(F.col("distance") <= _PJ_D)
    )


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): a span duplicated ANYWHERE in the corpus —
# across documents or within one — is found by hashing every K-token
# sliding window and counting global occurrences.  The suffix-array
# machinery of the paper is a single-node construct; the distributed
# equivalent is window hashing, and it stays entirely JVM-side here:
# split -> transform(sequence) over slice+concat_ws+xxhash64 builds all
# window hashes inside one codegen stage (no Python, no shuffle), then
# explode.
#
# 100 TB plan: per-window state is ONE LONG (the xxhash64), so shuffle
# volume ~ 16 bytes/token regardless of text width.  Both aggregates are
# map-side combinable: (h, doc_id) collapses within-doc repeats before the
# wire, then h-level occurrence totals are a rollup of that.  The
# occurrence join-back runs at collapsed cardinality and a boilerplate
# span hot key (the classic skew: one licence header x 1e9 docs) is an
# AQE skew-join split, not a window-function single-reducer stall.
# Hashing cost is O(tokens x K) characters; the O(tokens) rolling-hash
# refinement stays single-stage if ever needed (aggregate() carry).
# xxhash64 collisions would need ~2^32 distinct spans to matter (~1e-9
# at this corpus; the oracle groups raw window strings).
# ---------------------------------------------------------------------------
_SUBSTR_K = 8


@register(
    "dedup_substring_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) - {_SUBSTR_K} + 2)) AS i
        FROM toks WHERE len(t) >= {_SUBSTR_K}
    ),
    wins AS (
      SELECT doc_id, array_to_string(t[i:i+{_SUBSTR_K}-1], ' ') AS w FROM pos
    ),
    occs AS (SELECT w, count(*) AS occ FROM wins GROUP BY w)
    SELECT wins.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN occs.occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows
      FROM wins JOIN occs USING (w)
     GROUP BY 1
     ORDER BY 1
    """,
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = _SUBSTR_K
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    # hash each token ONCE, then hash the K token-hashes per window:
    # identical grouping semantics (equal windows ⟺ equal hash, modulo
    # xxhash64 collisions — the same contract the concat form relied on)
    # but each window hashes K longs instead of building and hashing a
    # fresh ~K*avg_token_len string (measured 0.71 -> 0.47 s at sf0.1
    # for the window-generation stage)
    ta = F.transform(F.col("t"), lambda x: F.xxhash64(x))
    wins = toks.where(F.size("t") >= K).select(
        "doc_id", ta.alias("ta")
    ).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ta") - K + 1),
                lambda i: F.xxhash64(*[
                    F.element_at(F.col("ta"), i + j) for j in range(K)
                ]),
            )
        ).alias("h"),
    )
    # (h, doc_id) first: map-side combine collapses within-doc repeats
    # before any data crosses the wire
    per_doc = wins.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    per_hash = per_doc.groupBy("h").agg(F.sum("c").alias("occ"))
    return (
        per_doc.join(per_hash, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_windows"),
            F.sum(F.when(F.col("occ") >= 2, F.col("c")).otherwise(F.lit(0))).alias(
                "n_dup_windows"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Cross-source content-overlap matrix — the source-pair redundancy report a
# mixture-design pass runs before setting per-source sampling weights:
# for every pair of sources, how many distinct shingle identities do they
# share, and what is the set-level jaccard?  High-overlap pairs indicate
# mirrored / syndicated content whose combined weight should be discounted
# (the corpus-level complement of per-doc near-dedup).
#
# Reuses the SHARED hashed-shingle pipeline (hash-early, DF-capped,
# persisted once per corpus — the same `sh` identity the jaccard/minhash
# family and their oracles use), so the matrix is oracle-checked end to
# end and costs nothing extra to stand up when the dedup family already
# ran.  Exactness: counts are integers; jaccard is reported as an exact
# integer permille (1000*shared DIV union).
#
# Plan shape / 100 TB: sh ⋈ docs on doc_id (one fact shuffle), distinct
# (source, ha, hb) with map-side partial, then a self-equi-join on the
# two long halves.  Fan-out per shingle identity is bounded by the DF cap
# (a shingle in ≤max_df docs appears in ≤max_df sources), so candidate
# pairs per shingle are ≤max_df² regardless of corpus size — the same
# blocking argument the jaccard operator's scaling table measures.  The
# output is |sources|²/2 rows, aggregated with map-side combine on a
# two-string key.
# ---------------------------------------------------------------------------


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH {_hsh_capped("SELECT doc_id, text FROM documents")},
    srcsh AS (
      SELECT DISTINCT d.source, s.ha, s.hb
        FROM sh s JOIN documents d ON d.doc_id = s.doc_id
    ),
    sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM srcsh GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_shared
        FROM srcsh a
        JOIN srcsh b ON a.ha = b.ha AND a.hb = b.hb AND a.source < b.source
       GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.n_shared,
           CAST(1000 * p.n_shared // (x.n + y.n - p.n_shared) AS BIGINT)
               AS jaccard_permille
      FROM pairs p
      JOIN sizes x ON x.source = p.source_a
      JOIN sizes y ON y.source = p.source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE exchange instead of a hash self-join (r14, guide §2.4): group
    # the per-source shingles by shingle identity and collect the SORTED
    # source set per shingle — collect_set dedups (source, ha, hb)
    # occurrences map-side, so the old distinct + (ha, hb) self-join
    # (which re-exchanged and probed the whole shingle stream) collapses
    # into one keyed aggregate; source pairs are then generated IN-TASK
    # from each multi-source shingle's set (arrays bounded by the source
    # count, ~5 here — a hot shingle contributes C(|sources|, 2) pairs,
    # never a row blow-up; the DF cap has already removed degenerate
    # shingles).  sort_array makes pair order = the oracle's
    # a.source < b.source.  Measured at sf0.1, rebuilt-per-run: 1.98 ->
    # 1.41 s, identical matrix.
    sh = hashed_shingles(spark, sf_dir)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    pins.open_group("xsrc", spark)
    grouped = pins.pin("xsrc", (
        sh.join(src, "doc_id")
        .groupBy("ha", "hb")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
    ))
    sizes = grouped.select(F.explode("ss").alias("source")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        grouped.where(F.size("ss") >= 2)
        .select(F.explode(F.expr(
            "flatten(transform(ss, (x, i) -> "
            "transform(slice(ss, i + 2, size(ss) - i - 1), "
            "y -> struct(x AS source_a, y AS source_b))))"
        )).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sx = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sy = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sx), "source_a")
        .join(F.broadcast(sy), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.expr("1000 * n_shared DIV (n_a + n_b - n_shared)").alias(
                "jaccard_permille"
            ),
        )
    )


# ---------------------------------------------------------------------------
# MinHash calibration — the sketch-quality report: for every band-elected
# candidate pair, the signature's jaccard ESTIMATE (matching permutations
# / NUM_PERM — the unbiased MinHash estimator) next to the EXACT shingle
# jaccard, both as integer permille.  This is how a pipeline tunes
# NUM_PERM/band geometry before trusting the sketch at scale: systematic
# estimate-vs-exact gaps mean the permutation family or banding is wrong
# for the corpus.  Everything reuses the shared hashed-shingle pipeline
# and the SAME banding as dedup_minhash_lsh, so the report covers exactly
# the pairs that operator would verify.  All-integer output; the oracle
# replays the identical signature/band/verify SQL.
# ---------------------------------------------------------------------------
_MATCH_SQL = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(NUM_PERM)
)

_CALIBRATION_ORACLE = f"""
    WITH {_hsh_capped("SELECT doc_id, text FROM documents")},
    sig AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n,
             {_SIG_SQL}
        FROM sh GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, unnest([{_BAND_SQL}]) AS bucket FROM sig
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM banded x JOIN banded y
          ON x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    common AS (
      SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common
        FROM cand
        JOIN sh a ON a.doc_id = id_a
        JOIN sh b ON b.doc_id = id_b AND b.ha = a.ha AND b.hb = a.hb
       GROUP BY id_a, id_b
    )
    SELECT c.id_a, c.id_b,
           CAST(1000 * ({_MATCH_SQL}) // {NUM_PERM} AS BIGINT) AS est_permille,
           CAST(1000 * coalesce(cm.n_common, 0)
                // (sa.n + sb.n - coalesce(cm.n_common, 0)) AS BIGINT)
               AS exact_permille
      FROM cand c
      JOIN sig a ON a.doc_id = c.id_a
      JOIN sig b ON b.doc_id = c.id_b
      LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b
"""


@register("dedup_minhash_calibration", oracle=_CALIBRATION_ORACLE)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    pins.open_group("calibration", spark)
    with pinned_conf(spark, {"spark.sql.codegen.maxFields": "256"}):
        sh = hashed_shingles(spark, sf_dir)
        sig = _minhash_sig(sh).persist()
        sig.count()
    pins.adopt("calibration", sig)
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
    cand = (
        banded.alias("x")
        .join(banded.alias("y"),
              (F.col("x.bucket") == F.col("y.bucket"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    sha = sh.select(F.col("doc_id").alias("id_a"), "ha", "hb")
    shb = sh.select(F.col("doc_id").alias("id_b_s"),
                    F.col("ha").alias("hb_a"), F.col("hb").alias("hb_b"))
    common = (
        cand.join(sha, "id_a")
        .join(
            shb,
            (F.col("id_b") == F.col("id_b_s"))
            & (F.col("ha") == F.col("hb_a"))
            & (F.col("hb") == F.col("hb_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # string projections + one parsed match expression: the 2x66-column
    # py4j Column construction this replaces was driver-side plan-building
    # cost paid per invocation (same r14 finding as _minhash_sig)
    a = sig.selectExpr(
        "doc_id AS id_a", "n AS n_a",
        *[f"h{i} AS ha{i}" for i in range(NUM_PERM)],
    )
    b = sig.selectExpr(
        "doc_id AS id_b", "n AS n_b",
        *[f"h{i} AS hb{i}" for i in range(NUM_PERM)],
    )
    match = F.expr(
        " + ".join(f"CAST((ha{i} = hb{i}) AS LONG)" for i in range(NUM_PERM))
    )
    with pinned_conf(spark, {"spark.sql.codegen.maxFields": "256"}):
        out = (
            cand.join(F.broadcast(a), "id_a")
            .join(F.broadcast(b), "id_b")
            .join(common, ["id_a", "id_b"], "left")
            .select(
                "id_a",
                "id_b",
                (F.lit(1000) * match).alias("m1000"),
                F.coalesce(F.col("n_common"), F.lit(0)).alias("nc"),
                "n_a",
                "n_b",
            )
            .select(
                "id_a",
                "id_b",
                F.expr(f"m1000 DIV {NUM_PERM}").cast("long").alias("est_permille"),
                F.expr("1000 * nc DIV (n_a + n_b - nc)").cast("long").alias(
                    "exact_permille"
                ),
            )
        )
    return out


# ---------------------------------------------------------------------------
# N-gram CONTAINMENT — the asymmetric cousin of dedup_shingle_jaccard, and
# the right measure for embedded copies: a 200-word quote pasted into a
# 5000-word article has Jaccard ~0.04 (invisible to symmetric dedup) but
# containment ~1.0 from the quote's side.  Curation uses this to find
# boilerplate inclusions, quoted benchmarks, and wrapper pages whose
# "content" is another document.
#
# containment(A in B) = |A∩B| / |A| >= 0.8, evaluated as the integer
# inequality 10*c >= 8*n_a (no float boundary).  Candidates come from the
# SAME df-capped hashed-shingle self-join as Jaccard (one undirected pair
# aggregate; both directions are projected from it afterwards, so the
# expensive join work is not doubled).  Scale shape: identical to
# dedup_shingle_jaccard — hash-early longs, df cap bounding hot-shingle
# fan-out, broadcast-or-shuffle join picked by measured size.
# ---------------------------------------------------------------------------
_CONTAIN_NUM, _CONTAIN_DEN = 8, 10  # tau = 0.8


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH {{capped}},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) c
        FROM sh a JOIN sh b
          ON a.ha = b.ha AND a.hb = b.hb AND a.doc_id < b.doc_id
       GROUP BY 1, 2
    ),
    sized AS (
      SELECT id_a, id_b, c, sa.n AS n_a, sb.n AS n_b
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    ),
    directed AS (
      SELECT id_a AS contained_id, id_b AS container_id, c,
             n_a AS n_contained, n_b AS n_container
        FROM sized WHERE {_CONTAIN_DEN} * c >= {_CONTAIN_NUM} * n_a
      UNION ALL
      SELECT id_b, id_a, c, n_b, n_a
        FROM sized WHERE {_CONTAIN_DEN} * c >= {_CONTAIN_NUM} * n_b
    )
    SELECT contained_id, container_id, c AS n_common, n_contained,
           n_container,
           CAST(1000 * c // n_contained AS BIGINT) AS containment_permille
      FROM directed
    """.format(capped=_hsh_capped("SELECT doc_id, text FROM documents")),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh, n_sh = hashed_shingles_with_stats(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    small = n_sh * 24 <= _BHJ_SHINGLE_BYTES
    p = spark.sparkContext.defaultParallelism
    a = (sh.repartition(p) if small else sh).alias("a")
    b = F.broadcast(sh.alias("b")) if small else sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.ha") == F.col("b.ha"))
               & (F.col("a.hb") == F.col("b.hb"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    sized = pairs.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    fwd = sized.where(
        _CONTAIN_DEN * F.col("c") >= _CONTAIN_NUM * F.col("n_a")
    ).select(
        F.col("id_a").alias("contained_id"),
        F.col("id_b").alias("container_id"),
        "c",
        F.col("n_a").alias("n_contained"),
        F.col("n_b").alias("n_container"),
    )
    rev = sized.where(
        _CONTAIN_DEN * F.col("c") >= _CONTAIN_NUM * F.col("n_b")
    ).select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        "c",
        F.col("n_b").alias("n_contained"),
        F.col("n_a").alias("n_container"),
    )
    return fwd.unionByName(rev).select(
        "contained_id", "container_id", F.col("c").alias("n_common"),
        "n_contained", "n_container",
        F.expr("1000 * c DIV n_contained").cast("long")
        .alias("containment_permille"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — the rsync/LBFS boundary trick at
# token grain: a chunk ends wherever the rolling 3-gram hash ≡ 0 (mod 8),
# so boundaries are a pure function of LOCAL content.  Insert or delete a
# sentence and only the chunks touching the edit change identity — every
# other chunk re-aligns and still dedups, which fixed-size blocks
# fundamentally cannot do.  This is the storage/dataset-dedup primitive
# (LBFS, restic, data-lake dedup) complementing the document-grain
# operators above: exact/minhash dedup whole docs, span dedup fixed
# windows, CDC dedups shared PASSAGES across otherwise-different docs.
#
# Shape at 100 TB: one per-doc window pass (bounded by doc length — the
# same per-entity bound sessionization carries), then a keyed aggregate
# on chunk_hash; no self-join, no pair blow-up.  Expected chunk length is
# the modulus (8 tokens) — tune _CDC_MOD to trade dedup granularity
# against chunk-table size.
# ---------------------------------------------------------------------------
_CDC_K = 3   # boundary decided by the k-gram ending at the position
_CDC_MOD = 8  # P(boundary) = 1/8 -> ~8-token expected chunks


#: shared chunk-construction CTE (both CDC oracles build on it)
_CDC_CHUNKS_CTE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(sp) AS t, generate_subscripts(sp, 1) AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)
    ),
    g AS (
      SELECT doc_id, pos, t,
             CASE WHEN lead(t, {_CDC_K - 1}) OVER w IS NOT NULL
                   AND ('0x' || substr(md5(t || ' ' || lead(t, 1) OVER w
                                       || ' ' || lead(t, 2) OVER w), 1, 8)
                       )::BIGINT % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS b
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    c AS (
      SELECT doc_id, pos, t,
             1 + coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS chunk_id
        FROM g
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(t, ' ' ORDER BY pos)) AS chunk_hash,
             count(*) AS n_toks
        FROM c GROUP BY doc_id, chunk_id
    )"""


@register(
    "dedup_cdc_chunks",
    oracle=_CDC_CHUNKS_CTE + """
    SELECT chunk_hash,
           CAST(min(n_toks) AS BIGINT) AS n_toks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_copies
      FROM chunks
     GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated CDC chunks: (chunk_hash, n_toks, n_docs,
    n_copies) for every content-defined chunk appearing in ≥2 documents.
    Boundary = md5 of the 3-gram ENDING here ≡ 0 (mod 8) — identical
    integer arithmetic on both engines via the established
    ('0x'||substr(md5,1,8))::BIGINT == conv(substring(md5,1,8),16,10)
    bridge."""
    chunks = _cdc_chunk_frame(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.min("n_toks").cast("long").alias("n_toks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_docs") >= 2)
    )


def _cdc_chunk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, chunk_hash, n_toks) — the CDC chunk table both
    CDC operators consume; mirrors _CDC_CHUNKS_CTE exactly."""
    from pyspark.sql.window import Window

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2 = F.lead("t", 1).over(w), F.lead("t", _CDC_K - 1).over(w)
    gram_hash = (
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.col("t"), t1, t2)), 1, 8),
            16, 10,
        ).cast("long")
    )
    tagged = toks.withColumn(
        "b",
        F.when(t2.isNotNull() & (gram_hash % _CDC_MOD == 0), F.lit(1))
        .otherwise(F.lit(0)),
    )
    cum_prev = F.coalesce(
        F.sum("b").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    c = tagged.withColumn("chunk_id", cum_prev + 1)
    return c.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda s: s["t"],
                ),
                " ",
            )
        ).alias("chunk_hash"),
        F.count(F.lit(1)).alias("n_toks"),
    )


@register(
    "dedup_cdc_scrub",
    oracle=_CDC_CHUNKS_CTE + """,
    ranked AS (
      SELECT doc_id, chunk_id, n_toks,
             (doc_id, chunk_id) =
                 min((doc_id, chunk_id)) OVER (PARTITION BY chunk_hash)
                 AS kept
        FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
               AS n_chunks_dropped,
           CAST(sum(n_toks) AS BIGINT) AS n_toks_total,
           CAST(sum(CASE WHEN kept THEN n_toks ELSE 0 END) AS BIGINT)
               AS n_toks_kept,
           CAST(1000 * sum(CASE WHEN kept THEN 0 ELSE n_toks END)
                // sum(n_toks) AS BIGINT) AS scrub_permille
      FROM ranked
     GROUP BY doc_id
    """,
)
def dedup_cdc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE output of CDC dedup (same relationship span_scrub
    has to span dedup): per document, how many chunks/tokens survive when
    every duplicated chunk keeps exactly its first occurrence — "first"
    by lexicographic (doc_id, chunk_id) STRUCT order, which both engines
    implement identically for row-valued min, so keeper election is
    deterministic at ANY doc length / doc-id width (the r9 arithmetic
    packing capped chunk_id at 2^20 and doc_id at 2^43 and silently
    wrapped past them — ADVICE r9).  One chunk_hash window over the
    chunk table (already orders of magnitude smaller than the corpus)
    + one per-doc aggregate; a 100 TB scrub pipeline feeds n_toks_kept
    straight into the packing operator."""
    from pyspark.sql.window import Window

    chunks = _cdc_chunk_frame(spark, sf_dir)
    k = F.struct("doc_id", "chunk_id")
    keeper = F.min(k).over(Window.partitionBy("chunk_hash"))
    ranked = chunks.select(
        "doc_id", "n_toks", (k == keeper).alias("kept")
    )
    kept = F.col("kept")
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(kept, 0).otherwise(1)).alias("n_chunks_dropped"),
        F.sum("n_toks").alias("n_toks_total"),
        F.sum(F.when(kept, F.col("n_toks")).otherwise(0)).alias("n_toks_kept"),
        F.expr("1000 * sum(CASE WHEN kept THEN 0 ELSE n_toks END) "
               "DIV sum(n_toks)").cast("long").alias("scrub_permille"),
    )
