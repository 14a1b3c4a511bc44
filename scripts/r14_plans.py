"""Capture .explain('formatted') for named queries into plans/r14/.

Usage: python scripts/r14_plans.py before q1 q2 ...   (suffix, then names)
Writes plans/r14/<name>_<suffix>.txt with the EXECUTED (AQE-final) plan:
the query is materialized via the noop sink first so AdaptiveSparkPlan
reports isFinalPlan=true, mirroring what the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_trino_sql_demo_spark import operators as _ops
from iceberg_trino_sql_demo_spark.session import get_spark

_ops.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r14_plans")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = _ops.QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
