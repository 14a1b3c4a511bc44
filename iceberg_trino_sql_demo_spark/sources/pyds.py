"""Python DataSource API integration (Spark 4 ``pyspark.sql.datasource``):
the engine's versioned tables exposed as a first-class Spark format —
``spark.read.format("ice_table").option("path", t.location).load()`` —
with FILTER PUSHDOWN wired into the engine's manifest pruner.

This is the DataSource-V2 story told in pure Python: Spark hands the
reader its WHERE conjuncts as typed ``Filter`` objects; ``pushFilters``
translates the supported shapes (=, <, <=, >, >=, IN on top-level
columns) into the same ``plans.pruning.Predicate`` objects the
programmatic and SQL paths use; ``partitions()`` then returns ONE
InputPartition PER SURVIVING DATA FILE — partition/min-max/bloom pruning
decides Spark's task list before any byte is read.  All filters are
returned to Spark un-consumed (file pruning is a superset guarantee, the
same contract as parquet min/max skipping), so correctness never depends
on the pruner.

100 TB framing: ``partitions()`` is manifest-cardinality driver work
(dict lookups per file, the identical loop ``Table.df`` runs) and each
task reads exactly one pruned file via Arrow — no JVM round-trip for
planning, no listing of skipped files.

Scope (documented, loud): current-snapshot reads of tables WITHOUT
row-level delete files and whose files carry every current-schema column
under its physical name — the full MoR/evolution read path lives in
``sources/reader.py``; a table outside this scope raises rather than
returning a plausible subset.  Reference analog: every SELECT over an
Iceberg table, e.g. iceberg_trino_sqldemo.sql:215-216.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "ice_table"


class IceFilePartition(InputPartition):
    def __init__(self, path: str, columns: list[tuple[str, str]]):
        # (physical name, logical name) pairs — files store pnames
        self.path = path
        self.columns = columns


def _to_predicates(filters: list[Filter]) -> list:
    """Typed Spark Filters -> engine Predicates (prunable subset only)."""
    from iceberg_trino_sql_demo_spark.plans.pruning import Predicate

    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    out = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:  # nested column paths don't prune
            continue
        col = attr[0]
        if type(f) in ops:
            out.append(Predicate(col, ops[type(f)], _plain(f.value)))
        elif isinstance(f, In):
            out.append(Predicate(col, "in", [_plain(v) for v in f.value]))
    return out


def _plain(v):
    """Datetime-ish values -> the ISO strings manifest stats store."""
    iso = getattr(v, "isoformat", None)
    return iso() if iso else v


class IceTableReader(DataSourceReader):
    def __init__(self, location: str, prune_log: str | None):
        self.location = location
        self.prune_log = prune_log
        self._preds: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        self._preds = _to_predicates(list(filters))
        # every filter is handed back: the pruner only SKIPS FILES that
        # provably match no row; Spark still evaluates the full predicate
        return iter(filters)

    def partitions(self) -> list[IceFilePartition]:
        from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        io = MetadataIO(self.location)
        meta, _ = io.read()
        sid = meta.refs.get("main")
        snap = None if sid is None else meta.snapshot_by_id(sid)
        manifest = io.read_manifest(snap) if snap else None
        files = manifest.data_files if manifest else []
        if manifest and manifest.delete_files:
            raise NotImplementedError(
                "ice_table DataSource reads tables without row-level delete "
                "files; use Table.df for MoR reads"
            )
        survivors = (
            prune_files(files, meta, self._preds, None) if self._preds else list(files)
        )
        if self.prune_log:  # test/observability hook: what planning decided
            with open(self.prune_log, "w") as fh:
                json.dump({"total": len(files), "scanned": len(survivors)}, fh)
        cols = [(f.pname, f.name) for f in meta.schema.fields]
        return [IceFilePartition(f.path, cols) for f in survivors]

    def read(self, partition: IceFilePartition):
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        have = set(tbl.column_names)
        missing = [p for p, _ in partition.columns if p not in have]
        if missing:
            raise NotImplementedError(
                f"file {os.path.basename(partition.path)} lacks physical "
                f"column(s) {missing}: schema-evolution reads belong to "
                "Table.df (column-id projection + defaults)"
            )
        tbl = tbl.select([p for p, _ in partition.columns])
        tbl = tbl.rename_columns([n for _, n in partition.columns])
        yield from tbl.to_batches()


class IceTableDataSource(DataSource):
    """``spark.read.format("ice_table")`` — options: ``path`` (table
    location, required), ``prune_log`` (debug json path, optional)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        # a DDL STRING, not a parsed StructType: this method runs inside
        # the Python data source worker, where no SparkContext exists to
        # back _parse_datatype_string — Spark parses the DDL JVM-side
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        meta, _ = MetadataIO(self.options["path"]).read()
        return ", ".join(f"{f.name} {f.type}" for f in meta.schema.fields)

    def reader(self, schema: StructType) -> IceTableReader:
        return IceTableReader(self.options["path"], self.options.get("prune_log"))
