"""Scaling validation harness: measure the dedup/ANN family at several
corpus scale points and write SCALING.md (VERDICT r3 next-round #1).

For each multiplier m the harness builds a deterministic scaled corpus
(scripts/scale_corpus.py), runs every family query twice (cold includes
Catalyst analysis + the shared-intermediate build; warm is steady state),
counts each operator's CANDIDATE pairs (operators/dedup_diag.py), and
records rows to SCALING.md plus one JSON line on stdout.

Usage::

    python scripts/scaling_bench.py                       # m = 1, 5, 20
    SPARK_GRAFT_SCALE_POINTS=1,4 python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
POINTS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALE_POINTS", "1,5,20").split(",")
]

FAMILY = [
    "dedup_exact",
    "dedup_span_exact",
    "dedup_shingle_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_prefiltered",
    "dedup_embedding_prefiltered_multiprobe",
    "dedup_semantic_clusters",
    "dedup_cluster_components",
    "dedup_incremental_minhash",
    # dedup_edit_distance* are deliberately ABSENT: the scaled corpus's
    # per-replica word-suffix perturbation is a WORD-level rewrite that is
    # sub-threshold for d=4 CHARACTER edits (replicas of the same doc
    # differ only in suffix digits, ~4-5 chars in a 60-char prefix), so
    # cross-replica pairs land within the edit threshold and TRUE pairs
    # grow ~m^2 by data construction — the linear-growth premise of this
    # harness doesn't hold for character-level similarity.  The operator's
    # scale argument is its candidate bound (Pass-Join exact-substring
    # collisions), oracle-proven recall 1.0 against the unblocked ground
    # truth.
    # substring-window dedup scales like the token count: window hashes
    # are longs, both aggregates map-side combine (dedup.py docstring)
    "dedup_substring_windows",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_sq8",
    "ann_topk_pq",
    "ann_knn_join",
    "ann_knn_join_lsh",
    # linear text/pipeline representatives: one tokenize-explode shape,
    # one broadcast-eval-set scan, and the composed corpus-selection DAG
    "text_token_stats",
    "contamination_ngram",
    # r5 batch-4 curation ops — all scan + one keyed aggregate; the bloom
    # variant additionally pins that the bitset prefilter stays effective
    # as the corpus grows (same result as contamination_ngram, smaller
    # join input)
    "contamination_bloom_prefilter",
    "text_quality_classifier",
    "split_leakage_safe",
    "url_normalize_dedup",
    "source_temperature_resample",
    "training_corpus_select",
    # r5 batch-5: the source-pair overlap matrix (pair fan-out bounded by
    # the DF cap regardless of corpus size), tokenizer-coverage OOV scan
    # (two scans + keyed agg), range search (no-window probe-batch scan;
    # the GEMM branch engages past 32 probes), and the per-label
    # centroid-distance filter (label×dim agg + one label window)
    "dedup_cross_source_matrix",
    "text_oov_rate",
    "ann_range_search",
    "embedding_outlier_filter",
    # sketch-calibration report rides the same signature/band pipeline as
    # dedup_minhash_lsh — its cost must track the candidate set, not n²
    "dedup_minhash_calibration",
    # r5 batch-6: the inverted-index build (posexplode + two keyed aggs,
    # output bounded by the df cut) and the IVF+PQ composition (probe
    # pruning means the ADC stage's input is ~N_PROBE/sqrt(n) of the
    # corpus — wall time should grow SLOWER than the brute-force row)
    "text_inverted_index",
    "ann_topk_ivfpq",
    # r5 batch-7: containment rides the same df-capped shingle join as
    # jaccard (pair fan-out bounded identically); the aHash bucket pass is
    # one scan + one signature-keyed aggregate — both must stay linear
    "dedup_ngram_containment",
    "multimodal_ahash_near_dup",
    # r9: CDC chunk dedup (doc-partitioned window pass + chunk-hash keyed
    # aggregate — join-free, so pair count is undefined and wall time must
    # track tokens) and the unigram-LM perplexity scorer (vocab broadcast
    # + per-doc hash aggregate) — both must stay ~linear
    "dedup_cdc_chunks",
    "text_perplexity_unigram",
]

DIAG = {
    "dedup_shingle_jaccard": "jaccard_candidate_pairs",
    "dedup_minhash_lsh": "minhash_candidate_pairs",
    "dedup_simhash": "simhash_candidate_pairs",
    "dedup_embedding_prefiltered": "prefiltered_bucket_pairs",
    "dedup_embedding_prefiltered_multiprobe": "multiprobe_bucket_pairs",
    "dedup_semantic_clusters": "semantic_cluster_pairs",
}


def main() -> None:
    from scripts.scale_corpus import build_scaled_corpus
    from iceberg_trino_sql_demo_spark import operators as ops
    from iceberg_trino_sql_demo_spark.operators import dedup_diag
    from iceberg_trino_sql_demo_spark.session import get_spark

    ops.load_all()
    spark = get_spark("scaling")
    results: list[dict] = []
    work = tempfile.mkdtemp(prefix="scaling_")
    try:
        for m in POINTS:
            sf_dir = os.path.join(work, f"x{m}")
            if m == 1:
                os.makedirs(sf_dir, exist_ok=True)
                for f in ("documents.parquet", "embeddings.parquet"):
                    shutil.copy(os.path.join(BASE, f), os.path.join(sf_dir, f))
            else:
                build_scaled_corpus(BASE, sf_dir, m)
            n_docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).count()
            for name in FAMILY:
                fn = ops.QUERIES[name]
                runs, rows = [], 0
                for _ in range(2):
                    t0 = time.perf_counter()
                    rows = fn(spark, sf_dir).count()
                    runs.append(time.perf_counter() - t0)
                cand = None
                if name in DIAG:
                    cand = getattr(dedup_diag, DIAG[name])(spark, sf_dir).count()
                rec = {
                    "query": name,
                    "multiplier": m,
                    "n_docs": n_docs,
                    "cold_s": round(runs[0], 3),
                    "warm_s": round(min(runs), 3),
                    "result_rows": rows,
                    "candidate_pairs": cand,
                }
                results.append(rec)
                print(f"# {rec}", file=sys.stderr)
            ops.release_caches()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()

    write_scaling_md(results)
    print(json.dumps({"base": BASE, "points": POINTS, "results": results}))


def write_scaling_md(results: list[dict]) -> None:
    by_q: dict[str, list[dict]] = {}
    for r in results:
        by_q.setdefault(r["query"], []).append(r)
    lines = [
        "# SCALING — measured scale behavior of the dedup/ANN family",
        "",
        f"Base corpus: `{BASE}` (documents x multiplier via",
        "`scripts/scale_corpus.py`: per-replica word perturbation preserves",
        "within-replica duplicate structure and zeroes cross-replica shingle",
        "overlap, so TRUE duplicate pairs grow ~linearly by construction —",
        "any super-linear growth below would be the algorithm's fault, not",
        "the data's).  `candidate pairs` is the operator's actual compare",
        "set, rebuilt by `operators/dedup_diag.py` from the same internals.",
        "Times from `local[32]`; cold includes Catalyst analysis + shared-",
        "intermediate build, warm is steady state (min of 2).",
        "",
        "| query | multiplier | docs | cold s | warm s | result rows | candidate pairs | pairs/doc |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for q, rs in by_q.items():
        for r in sorted(rs, key=lambda x: x["multiplier"]):
            cp = r["candidate_pairs"]
            per_doc = f"{cp / r['n_docs']:.2f}" if cp is not None else "—"
            lines.append(
                f"| {q} | {r['multiplier']}x | {r['n_docs']} | {r['cold_s']} "
                f"| {r['warm_s']} | {r['result_rows']} "
                f"| {cp if cp is not None else '—'} | {per_doc} |"
            )
    lines += [
        "",
        "Reading the table: for each instrumented operator, `pairs/doc`",
        "(candidate pairs per document) should stay ~flat as the corpus",
        "grows — that is the O(n·avg_bucket) bound the banded/blocked/",
        "bucketed candidate generation promises, and the property that keeps",
        "the 100 TB plan shape viable.  Wall-times should grow near-linearly",
        "(sub-linearly for the probe-style ANN queries).",
        "`tests/test_scaling.py` asserts the pairs/doc bound mechanically.",
        "",
        "Two operators are deliberately NOT flat, and their growth is the",
        "documented contract, not a regression:",
        "`dedup_embedding_prefiltered_multiprobe` probes P+1 buckets per",
        "vector with P = the occupancy-adaptive plane count ~ log2(n), so",
        "pairs/doc grows logarithmically — O(n log n) total, the price of",
        "the hamming<=1 recall guarantee (the flat-line alternative is the",
        "single-probe operator above it).  `dedup_semantic_clusters`",
        "compares all pairs within coarse-quantizer clusters of ~cent_mod",
        "members, so pairs/doc ~ cent_mod/2 (constant 50 under the",
        "oracle-stability floor, sqrt(n)/2 asymptotically) — the SemDeDup",
        "trade of assignment cost against verify cost;",
        "`tests/test_scaling.py` asserts the n*cent_mod ceiling.",
        "",
        "`ann_range_search`'s driver footprint is BOUNDED, not",
        "corpus-proportional (r11): the probe-set collect sits behind a",
        "LIMIT 4097, so driver/broadcast bytes cap at 4096 probes x 64",
        "dims x 8 B = 2 MiB at ANY corpus size, and a probe set past the",
        "cap refuses loudly (a corpus-scaled probe set is an all-pairs",
        "workload — that's dedup_embedding_prefiltered / ann_knn_join).",
        "tests/test_scaling.py::test_range_search_probe_collect_is_bounded",
        "collect-spies the bound.",
        "",
        "## What this harness caught (fixed before these numbers)",
        "",
        "Running it the first time falsified three scale claims that had",
        "only been argued from plan shape:",
        "",
        "1. **Sign-LSH prefilter was quadratic.** Fixed 8 planes = fixed 256",
        "   buckets, so bucket pairs grew with corpus² (measured x16 pairs",
        "   for x4 corpus).  Fix: corpus-size-adaptive plane count",
        "   (`dedup._adaptive_planes`, occupancy-targeted), with a numpy-GEMM",
        "   bucket UDF beyond the 8-plane codegen path.  Now ~2 pairs/doc",
        "   flat across 20x.",
        "2. **IVF assignment failed at scale twice.** First: centroid count",
        "   grew linearly (fixed sampling modulus -> n²/MOD work) and the",
        "   expansion ran on 1-2 tasks (parquet's bytes-based split saw one",
        "   ~50 MB file) — 0.7 s -> 66 s at 20x.  After sqrt(n) centroids +",
        "   repartition, the 50x point exposed the deeper flaw: the n x C",
        "   row expansion itself carries two 64-float arrays per joined row",
        "   (~17 GB of payload at 100k vectors x 316 centroids; 49 s).",
        "   Fix: beyond the oracle-checked centroid counts, assignment is a",
        "   broadcast-centroid-matrix numpy GEMM in one Arrow-batched",
        "   mapInPandas — no expansion, no shuffle (49 s -> ~1 s warm at",
        "   50x).  The SQL-expression branch stays byte-identical to the",
        "   DuckDB oracle where the oracle is evaluated.",
        "3. **CPU-expansion stages under-parallelized.** Shingling and",
        "   tokenization multiply work ~50x per input byte; one big parquet",
        "   file -> 1-2 tasks serialized exactly the dominant stage.",
        "   Repartition-to-parallelism before the explode (n narrow rows",
        "   moved) cut 20x-corpus cold times 2-4x.",
        "",
        "4. **simhash's 4x15-bit chunk space saturated** around 10^5 docs",
        "   (candidates/doc grew 52 -> 98 across the 20x range; mean slot",
        "   occupancy ~3).  Fixed with the standard escalation: above",
        "   `_SIMHASH_MULTIINDEX_MIN_DOCS` the blocking switches to a",
        "   multi-index over PAIRS of 10-bit chunks (15 tables of 2^20",
        "   slots; hamming<=3 touches <=3 of 6 chunks, so an untouched",
        "   pair always exists — same recall-1.0 pigeonhole, 32x the key",
        "   space).  Candidates/doc now FALL across the range (60.7 ->",
        "   34.8) and `tests/test_scaling.py` proves the two blockings",
        "   yield identical hamming<=3 results, so the static oracle",
        "   holds at any size.",
        "",
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    # preserve every section maintained by the OTHER harnesses
    # (relational_scaling, metadata_scaling, dv_scaling,
    # reader_throughput) — this writer owns only the dedup/ANN family
    # header + tables + "What this harness caught"
    tail = ""
    if os.path.exists(path):
        with open(path) as fh:
            old = fh.read()
        from scripts.relational_scaling import SECTION_BEGIN, SECTION_END

        if SECTION_BEGIN in old and SECTION_END in old:
            b = old.index(SECTION_BEGIN)
            e = old.index(SECTION_END) + len(SECTION_END)
            tail += "\n" + old[b:e] + "\n"
            # slice the relational span OUT of `old` before locating the
            # first foreign head — if a future writer re-appends the
            # relational section AFTER a foreign head, the old logic
            # duplicated it into the tail on every run (ADVICE r9)
            old = old[:b] + old[e:]
        foreign_heads = [
            "## Metadata plane",
            "## End-to-end read path",
            "## Deletion vectors",
            "## Commit chain",
            "## Reader throughput",
            "## Maintenance plane",
            "## Adoption plane",
            "## Federation plane",
        ]
        first = min(
            (old.index(h) for h in foreign_heads if h in old), default=None
        )
        if first is not None:
            tail += "\n" + old[first:].rstrip() + "\n"
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + tail)


if __name__ == "__main__":
    main()
