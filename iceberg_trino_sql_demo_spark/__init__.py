"""iceberg_trino_sql_demo_spark — a PySpark-native analytics engine with the
capability surface of victorcouste/iceberg-trino-sql-demo.

The reference (/root/reference/iceberg_trino_sqldemo.sql, 295 lines of Trino
SQL against Iceberg v3 tables) is a declarative capability catalog: CTAS with
hidden partition transforms, row-level DML (CoW + merge-on-read), snapshots /
time travel / branches / CDC, schema + partition evolution, metadata tables,
and maintenance procedures.  This package rebuilds that surface Spark-first:

- all relational execution is Catalyst (DataFrame / Spark SQL);
- the versioned-table layer (snapshots, refs, manifests, delete files) is a
  thin Python metadata layer in :mod:`.sources` that resolves a snapshot to a
  Parquet file list *before* Spark ever sees the plan, so predicate pushdown,
  column pruning and whole-stage codegen all still apply;
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing, event-time windows) live in :mod:`.operators` and
  :mod:`.streaming`.
"""

from iceberg_trino_sql_demo_spark.session import get_spark, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
