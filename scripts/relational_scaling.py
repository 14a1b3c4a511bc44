"""Relational-family scaling validation (VERDICT r4 #6): measure the
TPC-H-shape join+agg plans at several lineitem/orders scale points and
replace the marked relational section of SCALING.md.

The dedup/ANN 100x story is measured by scripts/scaling_bench.py; this
harness applies the same method to the §2/TPC-H shapes that were still
argued from plan shape: pricing_summary (single-fact agg), q3 (fact x
fact x dim with date cuts), q18 (HAVING-aggregate semi-join),
q21 (collapse + window over one fact exchange), federation_agg
(fact x dims broadcast agg); round 6 adds q9 (the widest join tree in
the registry) and training_corpus_select (the end-to-end pipeline DAG
over documents: quality aggs + keeper election + broadcast decontam +
md5 split) — the two DAGs most likely to hide a shuffle that only
hurts past MB scale (VERDICT r5 #7) — and training_pack_sequences
(the distributed prefix scan: wall time must track corpus linearly
with NO single-partition stage growing).

Corpus: scripts/scale_corpus.build_scaled_relational — lineitem+orders
replicated with per-replica orderkey shifts (join output provably linear
by construction), dims verbatim.

Usage::

    python scripts/relational_scaling.py                  # m = 1, 5, 20, 50
    SPARK_GRAFT_SCALE_POINTS=1,4 python scripts/relational_scaling.py
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
    for x in os.environ.get("SPARK_GRAFT_SCALE_POINTS", "1,5,20,50").split(",")
]

FAMILY = [
    "pricing_summary",
    "q3_unshipped_revenue",
    "q18_large_volume_customer",
    "q21_sole_late_supplier",
    "federation_agg",
    "q9_product_type_profit",
    "training_corpus_select",
    "training_pack_sequences",
]

SECTION_BEGIN = "<!-- relational-scaling:begin -->"
SECTION_END = "<!-- relational-scaling:end -->"


def main() -> None:
    from scripts.scale_corpus import build_scaled_corpus, build_scaled_relational
    from iceberg_trino_sql_demo_spark import operators as ops
    from iceberg_trino_sql_demo_spark.session import get_spark

    ops.load_all()
    spark = get_spark("rel_scaling")
    results: list[dict] = []
    work = tempfile.mkdtemp(prefix="rel_scaling_")
    try:
        for m in POINTS:
            sf_dir = os.path.join(work, f"x{m}")
            build_scaled_relational(BASE, sf_dir, m)
            # training_corpus_select runs over documents — scale it too
            build_scaled_corpus(BASE, sf_dir, m)
            n_li = spark.read.parquet(
                os.path.join(sf_dir, "lineitem.parquet")
            ).count()
            for name in FAMILY:
                fn = ops.QUERIES[name]
                runs, rows = [], 0
                for _ in range(3):
                    t0 = time.perf_counter()
                    rows = fn(spark, sf_dir).count()
                    runs.append(time.perf_counter() - t0)
                rec = {
                    "query": name,
                    "multiplier": m,
                    "n_lineitem": n_li,
                    "cold_s": round(runs[0], 3),
                    "warm_s": round(min(runs), 3),
                    "result_rows": rows,
                }
                results.append(rec)
                print(f"# {rec}", file=sys.stderr)
            ops.release_caches()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()

    write_section(results)
    print(json.dumps({"base": BASE, "points": POINTS, "results": results}))


def render_section(results: list[dict]) -> str:
    by_q: dict[str, list[dict]] = {}
    for r in results:
        by_q.setdefault(r["query"], []).append(r)
    lines = [
        SECTION_BEGIN,
        "",
        "## Relational family (TPC-H shapes) — measured scale behavior",
        "",
        f"Base: `{BASE}` lineitem+orders replicated with per-replica",
        "orderkey shifts (`scripts/scale_corpus.build_scaled_relational`:",
        "each replica joins only itself, so join OUTPUT grows linearly by",
        "construction and any super-linear wall-time is the plan's fault);",
        "dims verbatim, so per-dim-key fan-in grows m-fold.  Times from",
        "`local[32]`; cold includes Catalyst analysis, warm = min of 3.",
        "Harness: `scripts/relational_scaling.py`.",
        "",
        "| query | multiplier | lineitem rows | cold s | warm s | result rows |",
        "|---|---|---|---|---|---|",
    ]
    for q, rs in by_q.items():
        for r in sorted(rs, key=lambda x: x["multiplier"]):
            lines.append(
                f"| {q} | {r['multiplier']}x | {r['n_lineitem']} "
                f"| {r['cold_s']} | {r['warm_s']} | {r['result_rows']} |"
            )
    lines += [
        "",
        "Reading the table: warm wall-time should grow at-most-linearly in",
        "the fact size once past the scheduler floor (the 1x points are",
        "mostly floor); result rows are fixed by construction (every family",
        "member aggregates to dim cardinality or a LIMIT), so the rows",
        "column is a stability check, not a scale signal.",
        "`tests/test_scaling.py::test_relational_family_scales_linearly`",
        "asserts exact M-fold pricing_summary aggregates, scale-invariant",
        "plan shape for q18/q21, and a loose warm-time ceiling at 1x vs 4x.",
        "",
        SECTION_END,
    ]
    return "\n".join(lines)


def write_section(results: list[dict]) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    section = render_section(results)
    text = ""
    if os.path.exists(path):
        with open(path) as fh:
            text = fh.read()
    if SECTION_BEGIN in text and SECTION_END in text:
        pre = text[: text.index(SECTION_BEGIN)]
        post = text[text.index(SECTION_END) + len(SECTION_END):]
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as fh:
        fh.write(text)


if __name__ == "__main__":
    main()
