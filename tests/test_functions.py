from __future__ import annotations

from iceberg_trino_sql_demo_spark.functions.trino import translate_datetime_pattern


def test_pattern_reference_line_87():
    assert translate_datetime_pattern("%Y/%m/%d-%T") == "yyyy/MM/dd-HH:mm:ss"


def test_pattern_tokens():
    assert translate_datetime_pattern("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss"
    assert translate_datetime_pattern("%d/%b/%Y") == "dd/MMM/yyyy"


def test_approx_percentile_within_rank_error_band(spark, sf_oracle_dir):
    """approx_percentile guarantees rank error <= n/accuracy: the query now
    carries its own band check (exact order statistics at the rank-band
    edges + ok_* booleans, oracle-compared against DuckDB) — assert the
    in-band contract holds and the band edges are coherent, and
    cross-check the band against the interpolating exact percentiles."""
    from iceberg_trino_sql_demo_spark.operators.relational import (
        lineitem_price_quantiles,
        lineitem_price_quantiles_approx,
    )

    exact = {r.l_returnflag: r for r in lineitem_price_quantiles(spark, sf_oracle_dir).collect()}
    approx = {r.l_returnflag: r for r in lineitem_price_quantiles_approx(spark, sf_oracle_dir).collect()}
    assert set(exact) == set(approx)
    for flag, a in approx.items():
        assert a.n == exact[flag].n
        for tag in ["q25", "q50", "q75", "q95"]:
            lo, hi = getattr(a, f"lo_{tag}"), getattr(a, f"hi_{tag}")
            assert lo is not None and hi is not None and lo <= hi, (flag, tag)
            assert getattr(a, f"ok_{tag}") is True, (flag, tag)
            # the interpolated exact percentile must itself sit inside the
            # rank band (it lies between the two neighbouring elements)
            assert lo <= getattr(exact[flag], tag) <= hi, (flag, tag)
