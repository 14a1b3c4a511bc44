from __future__ import annotations

from iceberg_trino_sql_demo_spark.functions.trino import translate_datetime_pattern


def test_pattern_reference_line_87():
    assert translate_datetime_pattern("%Y/%m/%d-%T") == "yyyy/MM/dd-HH:mm:ss"


def test_pattern_tokens():
    assert translate_datetime_pattern("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss"
    assert translate_datetime_pattern("%d/%b/%Y") == "dd/MMM/yyyy"


def test_approx_percentile_within_rank_error_band(spark, sf_oracle_dir):
    """approx_percentile guarantees rank error <= n/accuracy: every approx
    quantile value must lie between the exact quantiles at p -/+ eps."""
    from iceberg_trino_sql_demo_spark.operators.relational import (
        _APPROX_PERCENTILE_ACC,
        lineitem_price_quantiles,
        lineitem_price_quantiles_approx,
    )

    exact = {r.l_returnflag: r for r in lineitem_price_quantiles(spark, sf_oracle_dir).collect()}
    approx = {r.l_returnflag: r for r in lineitem_price_quantiles_approx(spark, sf_oracle_dir).collect()}
    assert set(exact) == set(approx)

    li = spark.read.parquet(f"{sf_oracle_dir}/lineitem.parquet")
    for flag, a in approx.items():
        n = exact[flag].n
        # rank fraction 1/ACC, plus one rank position: approx_percentile
        # returns an actual element while percentile() interpolates
        eps = 1 / _APPROX_PERCENTILE_ACC + 1 / n
        for p, col in [(0.25, "q25"), (0.50, "q50"), (0.75, "q75"), (0.95, "q95")]:
            lo_p, hi_p = max(0.0, p - eps), min(1.0, p + eps)
            import pyspark.sql.functions as F

            bounds = (
                li.where(F.col("l_returnflag") == flag)
                .agg(F.expr(f"percentile(l_extendedprice, array({lo_p}, {hi_p}))").alias("b"))
                .head()[0]
            )
            assert bounds[0] <= getattr(a, col) <= bounds[1], (flag, col)
