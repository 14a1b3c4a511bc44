"""Z-order pruning benchmark: measure what the clustering rewrite actually
buys at the file-skipping layer, against the same data laid out three ways.

Builds the sf0.1 lineitem table (~600k rows) as an engine table in three
layouts — unclustered (hash-split), single-column sorted (range-split on
l_partkey), and z-ordered on (l_partkey, l_suppkey) — then replays a fixed
set of seeded box/point predicates against each and records how many data
files manifest min/max pruning keeps, plus the pruned-read wall time.

Writes ZORDER.md and prints one JSON line.  Usage::

    python scripts/zorder_bench.py
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 16
N_BOX = 12


def main() -> None:
    from pyspark.sql import functions as F

    from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
    from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
    from iceberg_trino_sql_demo_spark.session import get_spark
    from iceberg_trino_sql_demo_spark.sources.table import Table

    spark = get_spark("zorder_bench")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
    )
    bounds = li.agg(
        F.min("partkey"), F.max("partkey"), F.min("suppkey"), F.max("suppkey")
    ).first()
    pk_lo, pk_hi, sk_lo, sk_hi = bounds
    root = tempfile.mkdtemp(prefix="zbench_")

    tables = {}
    # unclustered: hash-split into N files (what a parallel ingest writes)
    tables["unclustered"] = Table.ctas(
        spark, os.path.join(root, "plain"), li.repartition(N_FILES)
    )
    # single-column sort: the classic sorted_by layout
    tables["sorted_partkey"] = Table.ctas(
        spark,
        os.path.join(root, "sorted"),
        li.repartitionByRange(N_FILES, "partkey"),
        sort_order=["partkey"],
    )
    # z-order: same rows, Morton-clustered on both predicate columns
    tz = Table.ctas(spark, os.path.join(root, "zorder"), li.repartition(N_FILES))
    files0 = tz._manifest(tz._resolve("main")).data_files
    total_bytes = sum(f.file_size_bytes for f in files0)
    tz.optimize(zorder_by=["partkey", "suppkey"],
                file_size_threshold=max(1, total_bytes // N_FILES))
    tables["zorder_pk_sk"] = tz

    # seeded predicate set: 5%-wide boxes on both dims, plus single-dim
    # 5% ranges on each column alone
    rng = random.Random(20260814)
    span_pk, span_sk = pk_hi - pk_lo, sk_hi - sk_lo
    preds: list[tuple[str, str]] = []
    for i in range(N_BOX):
        p0 = pk_lo + rng.random() * span_pk * 0.95
        s0 = sk_lo + rng.random() * span_sk * 0.95
        preds.append((
            "box",
            f"partkey >= {int(p0)} AND partkey <= {int(p0 + span_pk * 0.05)} "
            f"AND suppkey >= {int(s0)} AND suppkey <= {int(s0 + span_sk * 0.05)}",
        ))
    for i in range(N_BOX // 2):
        p0 = pk_lo + rng.random() * span_pk * 0.95
        preds.append(("partkey_only",
                      f"partkey >= {int(p0)} AND partkey <= {int(p0 + span_pk * 0.05)}"))
        s0 = sk_lo + rng.random() * span_sk * 0.95
        preds.append(("suppkey_only",
                      f"suppkey >= {int(s0)} AND suppkey <= {int(s0 + span_sk * 0.05)}"))

    stats: dict[str, dict[str, dict]] = {}
    expected: dict[str, int] = {}
    for layout, t in tables.items():
        man = t._manifest(t._resolve("main")).data_files
        per_kind: dict[str, dict] = {}
        for kind, where in preds:
            kept = len(prune_files(man, t.meta, parse_simple_predicates(where)))
            # timed pruned read (count forces the scan over kept files)
            t0 = time.perf_counter()
            n = t.df(where=where).count()
            dt = time.perf_counter() - t0
            k = per_kind.setdefault(kind, {"kept": 0, "preds": 0, "s": 0.0, "rows": 0})
            k["kept"] += kept
            k["preds"] += 1
            k["s"] += dt
            k["rows"] += n
            key = f"{kind}|{where}"
            if key in expected:
                assert expected[key] == n, f"layouts disagree on {where}: {expected[key]} != {n}"
            else:
                expected[key] = n
        stats[layout] = {
            "n_files": len(man),
            **{
                kind: {
                    "avg_files_kept": round(v["kept"] / v["preds"], 2),
                    "avg_scan_s": round(v["s"] / v["preds"], 4),
                    "rows": v["rows"],
                }
                for kind, v in per_kind.items()
            },
        }

    lines = [
        "# ZORDER — measured file-skipping from the clustering rewrite",
        "",
        f"Data: sf0.1 lineitem ({li.count()} rows) written as a {N_FILES}-file",
        "engine table in three layouts; predicates are seeded 5%-wide ranges",
        "(12 two-dimensional boxes, 6 single-dimension ranges per column).",
        "`files kept` is what manifest min/max pruning (plans/pruning.py)",
        "leaves for Spark to scan; every layout returns identical row counts",
        "(asserted) — clustering changes IO, never results.",
        "",
        "| layout | files | box: files kept | box: scan s | partkey-only: kept | suppkey-only: kept |",
        "|---|---|---|---|---|---|",
    ]
    for layout, s in stats.items():
        lines.append(
            f"| {layout} | {s['n_files']} | {s['box']['avg_files_kept']} "
            f"| {s['box']['avg_scan_s']} | {s['partkey_only']['avg_files_kept']} "
            f"| {s['suppkey_only']['avg_files_kept']} |"
        )
    lines += [
        "",
        "Reading the table: the unclustered layout keeps every file for every",
        "predicate (hash split -> every file spans the full value range).",
        "The single-column sort prunes hard on its sort column and not at all",
        "on the other.  The z-order layout prunes on BOTH dimensions — the",
        "multi-dimensional trade: neither column prunes quite as hard as a",
        "dedicated sort on it, both prune well, and a conjunctive box",
        "predicate composes the two.  At 100 TB the same manifest arithmetic",
        "runs driver-side over file counts, so skipped files are skipped",
        "scan tasks — the win scales with data, not with this benchmark.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ZORDER.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({"layouts": stats, "n_predicates": len(preds)}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
