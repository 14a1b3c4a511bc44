"""Warm in-process DuckDB timing over the benched oracle SQLs — the other
half of the aggregate-ratio measurement BASELINE.md reports.

Methodology (BASELINE.md "Round 4 final"): bench.py reports Spark
min-of-RUNS warm per query; this script times the IDENTICAL oracle SQL
(operators.ORACLE) warm in-process (min-of-2) over the same parquet at
the same sf_dir, so ratio = sum(spark)/sum(duck) over the common names.
Run the two back-to-back on an idle box — host speed drifts (the
calibration probes in bench.py's JSON quantify it).

    python bench.py > /tmp/spark.json
    python scripts/duck_bench.py > /tmp/duck.json

Prints one JSON line: {"total": s, "n": k, "queries": {name: s}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from iceberg_trino_sql_demo_spark import operators as ops
from iceberg_trino_sql_demo_spark.session import table_path

ops.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_DUCK_RUNS", "2"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    names = sorted(
        n for n in ops.QUERIES if n not in ops.NO_BENCH and n in ops.ORACLE
    )
    timings: dict[str, float] = {}
    for n in names:
        runs = []
        for _ in range(max(1, RUNS)):
            t0 = time.perf_counter()
            con.execute(ops.ORACLE[n]).fetchall()
            runs.append(time.perf_counter() - t0)
        timings[n] = round(min(runs), 4)
        print(f"# {n}: {timings[n]:.3f}", file=sys.stderr)
    # frozen-core totals (bench_core.json; VERDICT r5 #6) so the core
    # ratio is computable from the two JSON lines alone
    core_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_core.json",
    )
    core_names = (
        set(json.load(open(core_path))["names"]) if os.path.exists(core_path) else set()
    )
    core = {k: v for k, v in timings.items() if k in core_names}
    print(
        json.dumps(
            {
                "total": round(sum(timings.values()), 4),
                "n": len(names),
                "core_total": round(sum(core.values()), 4),
                "core_n": len(core),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
