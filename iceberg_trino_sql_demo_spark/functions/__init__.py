from iceberg_trino_sql_demo_spark.functions.trino import (
    trino_date_format,
    trino_round,
    decimal_sum,
)

__all__ = ["trino_date_format", "trino_round", "decimal_sum"]
