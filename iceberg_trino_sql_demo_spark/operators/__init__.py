"""Operator registry.

Every operator module registers named queries via ``register`` below; the
driver contract (__spark_entry__.py) aggregates ``QUERIES`` and ``ORACLE``.

A query is a ``(spark, sf_dir) -> DataFrame`` callable.  When the operator
is SQL-expressible, the matching entry in ``ORACLE`` is ANSI SQL that DuckDB
runs over the same parquet tables; the driver hash-compares both results
(order-insensitive), so computed columns must be aliased identically on both
sides and floating aggregates must be made deterministic (see
functions.trino.decimal_sum).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
#: names excluded from bench.py timing (correctness scenarios that spend
#: their time building scratch tables, not executing the measured query)
NO_BENCH: set[str] = set()


def register(
    name: str, oracle: str | None = None, bench: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if not bench:
            NO_BENCH.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run.

    Import order IS correctness-driver evaluation order (the driver walks
    the registry in registration order under a time budget and may stop
    early), so: cheap/fast modules first, the heavy dedup/ANN block next,
    and the wall-clock-bound streaming replays last.
    """
    from iceberg_trino_sql_demo_spark.operators import (  # noqa: F401
        multimodal,
        table_format_ops,
        relational,
        text,
        pipeline,
        windows_ops,
        joins_ops,
        similarity,
        dedup,
        streaming_queries,
    )
