"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in iceberg_trino_sql_demo_spark.operators.*; this
module only aggregates the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_trino_sql_demo_spark import operators as _ops

_ops.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference lines 286-295) on /root/testdata/sf0.001."""
    return _ops.QUERIES["federation_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §7 extensions)."""
    return dict(_ops.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same aliases).

    Keys absent here but present in ``queries()`` are non-SQL-expressible
    ops (engine versioning scenarios etc.) → driver records rows-only.
    """
    return dict(_ops.ORACLE)
