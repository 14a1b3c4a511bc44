from __future__ import annotations

from iceberg_trino_sql_demo_spark.functions.trino import translate_datetime_pattern


def test_pattern_reference_line_87():
    assert translate_datetime_pattern("%Y/%m/%d-%T") == "yyyy/MM/dd-HH:mm:ss"


def test_pattern_tokens():
    assert translate_datetime_pattern("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss"
    assert translate_datetime_pattern("%d/%b/%Y") == "dd/MMM/yyyy"
