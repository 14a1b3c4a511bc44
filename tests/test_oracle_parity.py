"""Every query with an oracle entry must match DuckDB exactly (the local
mirror of the driver's t2 correctness gate, SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from iceberg_trino_sql_demo_spark import operators as ops
from tests.oracle_utils import compare_frames, duckdb_run

ops.load_all()


def _names() -> list[str]:
    return sorted(ops.ORACLE)


@pytest.mark.parametrize("name", _names())
def test_oracle_parity(spark, sf_oracle_dir, name):
    sdf = ops.QUERIES[name](spark, sf_oracle_dir).toPandas()
    odf = duckdb_run(ops.ORACLE[name], sf_oracle_dir)
    problems = compare_frames(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_run_smoke(spark, sf_dir):
    for name, fn in sorted(ops.QUERIES.items()):
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
