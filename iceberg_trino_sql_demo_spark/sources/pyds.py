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

Scope: plain-DDL column types (variant / ns-timestamps keep their
engine-specific dual representations on the ``Table.df`` path).  Schema
evolution is handled IN the reader: each partition carries a column-id
projection spec (take / cast / default-fill, computed driver-side from
the file group's schema — the Arrow mirror of ``reader._group_projection``,
reference :166-171/:181), so one ADD/DROP COLUMN no longer disqualifies
the 10^6-file scan route.  Position deletes and deletion-vector packs are
applied ABOVE this scan by ``Table.df`` (an anti-join against the delete
set — the reader emits per-row (file, pos) when asked via ``emit_pos``);
equality deletes still belong to ``sources/reader.py``.  A table outside
this scope raises rather than returning a plausible subset.  Reference
analog: every SELECT over an Iceberg table, e.g.
iceberg_trino_sqldemo.sql:215-216.
"""

from __future__ import annotations

import json
import os
import re as _re
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

#: per-row helper columns the segment reader emits when the caller needs
#: to apply position deletes above the scan (Table.df drops them after
#: the anti-join) — the Python-DataSource analog of _metadata.file_path /
#: _metadata.row_index, which Spark does not synthesize for this format
POS_FILE_COL = "__sg_file"
POS_POS_COL = "__sg_pos"

_PA_SIMPLE: dict = {}


def _pa_type(ddl: str):
    """Engine DDL type string -> pyarrow type, or None when the Arrow-side
    reader cannot represent a CAST/DEFAULT of it (the driver gate then
    routes the table to sources/reader.py instead).  Only cast targets and
    default fills need this — columns read as-is keep the file's type."""
    import pyarrow as pa

    if not _PA_SIMPLE:
        _PA_SIMPLE.update(
            {
                "bigint": pa.int64(),
                "long": pa.int64(),
                "int": pa.int32(),
                "integer": pa.int32(),
                "smallint": pa.int16(),
                "tinyint": pa.int8(),
                "double": pa.float64(),
                "float": pa.float32(),
                "real": pa.float32(),
                "string": pa.string(),
                "varchar": pa.string(),
                "boolean": pa.bool_(),
                "date": pa.date32(),
                # Spark writes TIMESTAMP as int64 micros adjusted-to-UTC;
                # pyarrow reads those back as timestamp[us, tz=UTC]
                "timestamp": pa.timestamp("us", tz="UTC"),
                "binary": pa.binary(),
            }
        )
    ddl = ddl.strip().lower()
    m = _re.fullmatch(r"decimal\((\d+)\s*,\s*(\d+)\)", ddl)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    return _PA_SIMPLE.get(ddl)


def proj_spec(file_schema, current) -> list[tuple] | None:
    """Column-id projection spec (file physical layout -> current schema)
    for the Arrow-side reader — the same semantics as
    ``reader._group_projection`` (match by id, never by name; missing ->
    initial_default; type change -> cast), expressed as picklable ops:

        ("take", pname, out_name)            — column present, type equal
        ("cast", pname, ddl, out_name)       — column present, promote
        ("default", value, ddl, out_name)    — column absent in the file

    Returns None when any needed cast/default type is outside ``_pa_type``
    (variant, ns-timestamps, nested types) — the caller falls back to the
    Catalyst read path, which handles those."""
    by_id = {f.id: f for f in file_schema.fields}
    ops: list[tuple] = []
    for fld in current.fields:
        src = by_id.get(fld.id)
        if src is None:
            if _pa_type(fld.type) is None:
                return None
            ops.append(("default", fld.initial_default, fld.type, fld.name))
        elif src.type != fld.type:
            if _pa_type(fld.type) is None or _pa_type(src.type) is None:
                return None
            ops.append(("cast", src.pname, fld.type, fld.name))
        else:
            ops.append(("take", src.pname, fld.name))
    return ops


def _read_cols(spec: list[tuple]) -> list[str]:
    return [op[1] for op in spec if op[0] != "default"]


def _read_projected(path: str, spec: list[tuple]):
    """Read one data file and project it to the current schema."""
    import pyarrow.parquet as pq

    cols = _read_cols(spec)
    if cols:
        tbl = pq.read_table(path, columns=cols)
        n = tbl.num_rows
    else:
        # every current column postdates this file: row count from the
        # footer, all columns default-filled
        tbl, n = None, pq.ParquetFile(path).metadata.num_rows
    return _apply_spec(tbl, spec, n)


def _apply_spec(tbl, spec: list[tuple], n: int):
    """Project one file's arrow table to the current schema per the spec."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arrays, names = [], []
    for op in spec:
        kind = op[0]
        if kind == "take":
            arrays.append(tbl.column(op[1]))
        elif kind == "cast":
            arrays.append(pc.cast(tbl.column(op[1]), _pa_type(op[2])))
        else:  # default fill: old rows surface the default, not NULL
            _, value, ddl, _name = op
            t = _pa_type(ddl)
            if value is None:
                arrays.append(pa.nulls(n, t))
            else:
                try:
                    arr = pa.repeat(pa.scalar(value, type=t), n)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    # literal stored in its parsed form (e.g. ISO date
                    # string for a date column): arrow casts it
                    arr = pc.cast(pa.repeat(pa.scalar(value), n), t)
                arrays.append(arr)
        names.append(op[-1])
    return pa.table(dict(zip(names, arrays)))


def _to_uri(path: str) -> str:
    # match _metadata.file_path / reader._to_uri: local files as file:/abs
    return "file:" + path if path.startswith("/") else path


class IceFilePartition(InputPartition):
    def __init__(self, path: str, spec: list[tuple]):
        self.path = path
        self.spec = spec


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
        specs: dict[int, list[tuple]] = {}
        for f in survivors:
            if f.schema_id not in specs:
                spec = proj_spec(meta.schema_by_id(f.schema_id), meta.schema)
                if spec is None:
                    raise NotImplementedError(
                        f"schema {f.schema_id} -> current projection needs a "
                        "type outside the Arrow reader; use Table.df"
                    )
                specs[f.schema_id] = spec
        return [IceFilePartition(f.path, specs[f.schema_id]) for f in survivors]

    def read(self, partition: IceFilePartition):
        yield from _read_projected(partition.path, partition.spec).to_batches()


class IceSegmentSlicePartition(InputPartition):
    """A byte-packed, schema-homogeneous slice of the snapshot's file list."""

    def __init__(self, paths: list[str], spec: list[tuple], emit_pos: bool):
        self.paths = paths
        self.spec = spec
        self.emit_pos = emit_pos


class IceSegmentScanReader(DataSourceReader):
    """Unpruned snapshot scan planned FROM MANIFEST SEGMENTS — the 100 TB
    read path (VERDICT r6/r7 #1).

    ``partitions()`` never materializes a per-file Python object and never
    hands a path list to the JVM: each segment's ``path`` and
    ``file_size_bytes`` arrow columns are sliced into byte-packed task
    chunks (Spark's own bin-packing semantics, sizes straight from the
    manifest — no filesystem listing of any kind).  Measured at 10^6
    files: ``spark.read.parquet(*paths)`` costs ~135 s of Py4J string
    conversion plus ~110 s of InMemoryFileIndex listing; this plan is
    low-single-digit seconds (see SCALING.md "End-to-end read path").
    This is how Iceberg's own Spark connector plans: file lists and sizes
    come from manifests, executors read exactly the named files.

    Deliberately does NOT implement ``pushFilters`` — the route is chosen
    by ``Table.df`` only for unpruned scans, and a pushFilters-bearing
    reader would require spark.sql.python.filterPushdown.enabled even for
    filterless reads.  Schema evolution is handled in ``read()`` via the
    per-partition projection spec (partitions are packed PER schema_id so
    one spec covers a whole task); with ``emit_pos`` the reader appends
    (__sg_file, __sg_pos) so ``Table.df`` can anti-join position deletes /
    deletion vectors above the scan.  Equality deletes stay on the
    ``sources/reader.py`` path (Table.df routes them there).
    """

    def __init__(
        self,
        location: str,
        snapshot_id: int | None,
        max_bytes: int,
        max_files: int,
        paths_file: str | None = None,
        emit_pos: bool = False,
        columns: list[str] | None = None,
    ):
        self.location = location
        self.snapshot_id = snapshot_id
        self.max_bytes = max_bytes
        self.max_files = max_files
        #: pre-planned file list (PRUNED scans): a parquet of
        #: (path, file_size_bytes, schema_id) written by Table.df — the
        #: survivor set rides one file reference instead of an O(files)
        #: Py4J handoff
        self.paths_file = paths_file
        self.emit_pos = emit_pos
        #: caller-declared projection (Table.df(columns=...)): the Python
        #: DataSource API has no column-pruning hook, so narrow scans
        #: declare their columns UP FRONT and the Arrow reader never
        #: decodes the rest — this is what closes the 4x narrow-scan
        #: throughput gap vs the JVM reader (SCALING.md "Reader
        #: throughput"; VERDICT r9 next #5)
        self.columns = columns

    def partitions(self) -> list[IceSegmentSlicePartition]:
        from iceberg_trino_sql_demo_spark.sources.manifest_store import (
            LazyManifest,
            read_segment,
        )
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        io = MetadataIO(self.location)
        meta, _ = io.read()
        parts: list[IceSegmentSlicePartition] = []
        # one open chunk per schema_id: partitions stay schema-homogeneous
        # without re-sorting the manifest (evolution means a handful of
        # schema versions, so packing quality is unaffected)
        open_chunks: dict[int, tuple[list[str], int]] = {}
        specs: dict[int, list[tuple]] = {}

        def _spec(sid: int) -> list[tuple]:
            spec = specs.get(sid)
            if spec is None:
                spec = proj_spec(meta.schema_by_id(sid), meta.schema)
                if spec is None:
                    raise NotImplementedError(
                        f"schema {sid} -> current projection needs a type "
                        "outside the Arrow reader; use Table.df"
                    )
                if self.columns is not None:
                    want = set(self.columns)
                    missing = want - {op[-1] for op in spec}
                    if missing:
                        raise ValueError(
                            f"ice_table columns {sorted(missing)} not in "
                            "the current schema")
                    spec = [op for op in spec if op[-1] in want]
                specs[sid] = spec
            return spec

        def _pack(paths, sizes, sids) -> None:
            for p, s, sid in zip(paths, sizes, sids):
                chunk, nbytes = open_chunks.get(sid, ([], 0))
                chunk.append(p)
                nbytes += s
                if nbytes >= self.max_bytes or len(chunk) >= self.max_files:
                    parts.append(
                        IceSegmentSlicePartition(chunk, _spec(sid), self.emit_pos)
                    )
                    chunk, nbytes = [], 0
                open_chunks[sid] = (chunk, nbytes)

        def _flush() -> None:
            for sid, (chunk, _nb) in sorted(open_chunks.items()):
                if chunk:
                    parts.append(
                        IceSegmentSlicePartition(chunk, _spec(sid), self.emit_pos)
                    )
            open_chunks.clear()

        if self.paths_file is not None:
            import pyarrow.parquet as pq

            tbl = pq.read_table(self.paths_file)
            _pack(
                tbl.column("path").to_pylist(),
                tbl.column("file_size_bytes").to_pylist(),
                tbl.column("schema_id").to_pylist(),
            )
            _flush()
            return parts
        sid = (
            self.snapshot_id
            if self.snapshot_id is not None
            else meta.refs.get("main")
        )
        snap = None if sid is None else meta.snapshot_by_id(sid)
        manifest = io.read_manifest(snap) if snap else None
        if manifest is None:
            return []
        if any(d.content == "equality" for d in manifest.delete_files):
            raise NotImplementedError(
                "ice_table segment scan does not apply equality deletes; "
                "use Table.df for those MoR reads"
            )
        if manifest.delete_files and not self.emit_pos:
            raise NotImplementedError(
                "table has position deletes: the segment scan must be "
                "planned with emit_pos so the caller can anti-join them "
                "(Table.df does this)"
            )

        if isinstance(manifest, LazyManifest):
            removed = set(manifest.removed)
            for seg in manifest.segments:
                tbl = read_segment(self.location, seg)
                paths = tbl.column("path").to_pylist()
                sizes = tbl.column("file_size_bytes").to_pylist()
                sids = tbl.column("schema_id").to_pylist()
                if removed:  # committed manifests fold deltas; be safe
                    kept = [
                        t for t in zip(paths, sizes, sids) if t[0] not in removed
                    ]
                    paths = [p for p, _, _ in kept]
                    sizes = [s for _, s, _ in kept]
                    sids = [i for _, _, i in kept]
                _pack(paths, sizes, sids)
            if manifest.added:
                _pack(
                    [f.path for f in manifest.added],
                    [f.file_size_bytes for f in manifest.added],
                    [f.schema_id for f in manifest.added],
                )
        else:
            files = manifest.data_files
            _pack(
                [f.path for f in files],
                [f.file_size_bytes for f in files],
                [f.schema_id for f in files],
            )
        _flush()
        return parts

    def read(self, partition: IceSegmentSlicePartition):
        import pyarrow as pa

        for path in partition.paths:
            tbl = _read_projected(path, partition.spec)
            if partition.emit_pos:
                n = tbl.num_rows
                tbl = tbl.append_column(
                    POS_FILE_COL,
                    pa.repeat(pa.scalar(_to_uri(path), type=pa.string()), n),
                ).append_column(POS_POS_COL, pa.array(range(n), pa.int64()))
            yield from tbl.to_batches()


class IceTableDataSource(DataSource):
    """``spark.read.format("ice_table")`` — options: ``path`` (table
    location, required), ``prune_log`` (debug json path, optional),
    ``plan`` ("files" per-file partitions with filter pushdown — the
    default — or "segments" for manifest-segment-sliced partitions, the
    large-file-count scan path), ``snapshot_id`` (segment plan only:
    scan a specific snapshot instead of main's head), ``max_bytes`` /
    ``max_files`` (segment plan task packing; default 128 MB / 1024),
    ``emit_pos`` (segment plan: append __sg_file/__sg_pos per row so the
    caller can apply position deletes above the scan)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _columns(self) -> list[str] | None:
        cols = self.options.get("columns")
        if not cols:
            return None
        out = json.loads(cols)
        if not out:
            # an empty projection would drop the row-count information a
            # pure COUNT(*) needs — callers must pass >=1 column or omit
            raise ValueError("ice_table columns option must be non-empty")
        return out

    def schema(self) -> str:
        # a DDL STRING, not a parsed StructType: this method runs inside
        # the Python data source worker, where no SparkContext exists to
        # back _parse_datatype_string — Spark parses the DDL JVM-side
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        meta, _ = MetadataIO(self.options["path"]).read()
        fields = meta.schema.fields
        cols = self._columns()
        if cols is not None:
            want = set(cols)
            have = {f.name for f in fields}
            if not want <= have:
                raise ValueError(
                    f"ice_table columns {sorted(want - have)} not in the "
                    "current schema")
            fields = [f for f in fields if f.name in want]
        base = ", ".join(f"{f.name} {f.type}" for f in fields)
        if str(self.options.get("emit_pos", "")).lower() == "true":
            base += f", {POS_FILE_COL} string, {POS_POS_COL} bigint"
        return base

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.options.get("plan") == "segments":
            sid = self.options.get("snapshot_id")
            return IceSegmentScanReader(
                self.options["path"],
                int(sid) if sid is not None else None,
                int(self.options.get("max_bytes", 128 * 1024 * 1024)),
                int(self.options.get("max_files", 1024)),
                self.options.get("paths_file"),
                str(self.options.get("emit_pos", "")).lower() == "true",
                self._columns(),
            )
        return IceTableReader(self.options["path"], self.options.get("prune_log"))


# ---------------------------------------------------------------------------
# Streaming CDC source — Iceberg's Spark "incremental read" told through
# the Python DataSource streaming API:
#
#   spark.readStream.format("ice_table_changes")
#        .option("path", t.location)
#        .option("start_snapshot_id", s0)          # default: head at start
#
# Offsets are snapshot ids on main; each microbatch replays the rows ADDED
# by the snapshots committed since the last offset (walked head->start via
# parent ids, emitted in commit order).  Scope mirrors Iceberg's own
# streaming source: APPEND-ONLY histories — a snapshot that removes data
# files or changes the delete-file set raises rather than silently
# skipping changes.  `readBetweenOffsets` replays any committed range from
# the same manifests, which is what makes checkpoint recovery exact: the
# table IS the write-ahead log.
#
# 100 TB framing: planning is manifest-delta work (the added-file list),
# and each batch reads only those files — an incremental consumer never
# rescans the table.  Emitted columns: the table schema plus
# ``_change_type`` ('insert') and ``_commit_sequence_number`` (the
# engine's monotone commit counter — deterministic, unlike snapshot ids).
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader

STREAM_FORMAT_NAME = "ice_table_changes"


class IceChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(
        self,
        location: str,
        start_snapshot_id: int | None,
        max_files_per_batch: int | None = None,
        mode: str = "append_only",
    ):
        self.location = location
        self.start = start_snapshot_id
        #: 'append_only' (default): delete-bearing snapshots raise loudly;
        #: 'cdc': row-level changes stream too — removed-file and
        #: position-deleted rows as full-value deletes, equality deletes as
        #: key-only delete rows (microbatches stay O(commit delta))
        self.mode = mode
        # Iceberg's max-files-per-micro-batch: bounds how much of the
        # snapshot backlog one read() materializes on the driver (the first
        # batch after a long gap, or an initial replay from snapshot 0, is
        # otherwise table-sized).  None = drain to head in one batch, which
        # Trigger.AvailableNow REQUIRES: Spark's Python SimpleStreamReader
        # falls back to single-batch execution there, so a default cap
        # would silently truncate drains.
        self.max_files = max_files_per_batch

    def initialOffset(self) -> dict:
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        if self.start is not None:
            return {"snapshot_id": int(self.start)}
        meta, _ = MetadataIO(self.location).read()
        return {"snapshot_id": meta.refs.get("main") or 0}

    def _rows_between(self, start_id: int, end_id: int):
        import pyarrow.parquet as pq

        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        io = MetadataIO(self.location)
        meta, _ = io.read()
        chain = []
        cur = meta.snapshot_by_id(end_id)
        while cur.snapshot_id != start_id:
            chain.append(cur)
            if cur.parent_id is None:
                if start_id not in (0, None):
                    raise ValueError(
                        f"start snapshot {start_id} is not an ancestor of "
                        f"{end_id}"
                    )
                break
            cur = meta.snapshot_by_id(cur.parent_id)
        chain.reverse()
        prev = (
            io.read_manifest(meta.snapshot_by_id(start_id))
            if start_id not in (0, None)
            else None
        )
        prev_paths = {f.path for f in prev.data_files} if prev else set()
        prev_dels = {d.path for d in prev.delete_files} if prev else set()
        cols = [(f.pname, f.name) for f in meta.schema.fields]

        def _file_rows(path: str):
            tbl = pq.read_table(path)
            have = set(tbl.column_names)
            missing = [p for p, _ in cols if p not in have]
            if missing:
                raise NotImplementedError(
                    f"file {os.path.basename(path)} lacks physical "
                    f"column(s) {missing}: schema-evolution reads belong "
                    "to Table.df"
                )
            return tbl, tbl.select([p for p, _ in cols]).to_pylist()

        for snap in chain:
            man = io.read_manifest(snap)
            cur_paths = {f.path for f in man.data_files}
            cur_del_by_path = {d.path: d for d in man.delete_files}
            if snap.summary.get("data-invariant") == "true":
                # compaction / z-order / equality-delete rewrite: file set
                # changes, logical rows do not — emit nothing (and do NOT
                # trip the append-only guard: a compacted append table is
                # still an append table to its consumers)
                prev_paths, prev_dels = cur_paths, set(cur_del_by_path)
                continue
            removed_paths = prev_paths - cur_paths
            new_del_paths = set(cur_del_by_path) - prev_dels
            if self.mode != "cdc" and (removed_paths or new_del_paths or
                                       prev_dels - set(cur_del_by_path)):
                raise ValueError(
                    f"snapshot {snap.snapshot_id} ({snap.operation}) is not "
                    "append-only; the ice_table_changes stream supports "
                    "append histories by default — pass mode='cdc' to stream "
                    "row-level changes (deletes emitted as key rows), or use "
                    "batch table_changes for exact full-row deletes"
                )
            if self.mode == "cdc":
                # deletes first (logical apply order within a commit):
                # (1) removed data files (CoW rewrite / overwrite): every
                #     row re-emitted as a full-value delete — a by-key
                #     replica nets this out exactly, including compactions
                for p in sorted(removed_paths):
                    _tbl, data = _file_rows(p)
                    for row in data:
                        yield tuple(row[pn] for pn, _ in cols) + (
                            "delete", snap.sequence_number,
                        )
                for dp in sorted(new_del_paths):
                    d = cur_del_by_path[dp]
                    if d.content == "position":
                        # (2) fresh position deletes: read (file,pos),
                        #     materialize the deleted rows' full values
                        dt = pq.read_table(dp)
                        by_file: dict[str, list[int]] = {}
                        for fp, pos in zip(
                            dt.column("file_path").to_pylist(),
                            dt.column("pos").to_pylist(),
                        ):
                            by_file.setdefault(fp.replace("file:", ""), []).append(pos)
                        for fp, poss in sorted(by_file.items()):
                            tbl, data = _file_rows(fp)
                            for i in sorted(poss):
                                yield tuple(data[i][pn] for pn, _ in cols) + (
                                    "delete", snap.sequence_number,
                                )
                    elif d.content == "dv":
                        # deletion-vector packs only appear in
                        # rewrite_position_deletes commits, which are
                        # data-invariant and skipped above; a dv in a
                        # data-changing commit would be an engine bug
                        raise NotImplementedError(
                            "deletion-vector entry in a non-invariant "
                            f"commit (snapshot {snap.snapshot_id})"
                        )
                    else:
                        # (3) equality deletes: KEY-only delete rows (non-key
                        #     columns None) — delta-sized by construction; a
                        #     by-key replica needs nothing more, and scanning
                        #     older files for full values would make a
                        #     microbatch O(table)
                        dt = pq.read_table(dp)
                        id_to_name = {f.id: f.name for f in meta.schema.fields}
                        keys = [id_to_name[i] for i in d.equality_ids]
                        kvals = {
                            k: dt.column(f"k_{i}").to_pylist()
                            for k, i in zip(keys, d.equality_ids)
                        }
                        for r in range(dt.num_rows):
                            yield tuple(
                                kvals[n][r] if n in kvals else None
                                for _, n in cols
                            ) + ("delete", snap.sequence_number)
            added = [f for f in man.data_files if f.path not in prev_paths]
            for f in added:
                _tbl, data = _file_rows(f.path)
                for row in data:
                    yield tuple(row[p] for p, _ in cols) + (
                        "insert", snap.sequence_number,
                    )
            prev_paths, prev_dels = cur_paths, set(cur_del_by_path)

    def read(self, start: dict):
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        meta, _ = MetadataIO(self.location).read()
        head = meta.refs.get("main")
        sid = start["snapshot_id"]
        if head is None or head == sid:
            # an ITERATOR, not a list: when end == start pyspark's wrapper
            # probes emptiness with next(it) instead of caching (a restart
            # with zero new commits lands here)
            return iter(()), start
        nxt = head
        if self.max_files is not None:
            # bounded mode: walk the start->head chain and stop at the
            # first snapshot where the cumulative added-file count would
            # exceed the cap (always advancing at least one snapshot, so
            # the stream makes progress even past an oversized commit)
            chain = []
            cur = meta.snapshot_by_id(head)
            while cur.snapshot_id != sid:
                chain.append(cur)
                if cur.parent_id is None:
                    if sid not in (0, None):
                        raise ValueError(
                            f"start snapshot {sid} is not an ancestor of {head}"
                        )
                    break
                cur = meta.snapshot_by_id(cur.parent_id)
            chain.reverse()
            taken = 0
            nxt = chain[0].snapshot_id
            for i, snap in enumerate(chain):
                n = int(snap.summary.get("added-data-files", 0) or 0)
                if i > 0 and taken + n > self.max_files:
                    break
                taken += n
                nxt = snap.snapshot_id
        # a LIST, not a generator: the prefetch cache copy.copy()s the
        # returned entries (generators are unpicklable/uncopyable), and a
        # microbatch is delta-sized (and, in bounded mode, capped) by
        # construction
        return list(self._rows_between(sid, nxt)), {"snapshot_id": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(
            self._rows_between(start["snapshot_id"], end["snapshot_id"])
        )


class IceChangesDataSource(DataSource):
    """``spark.readStream.format("ice_table_changes")`` — options: ``path``
    (table location, required), ``start_snapshot_id`` (exclusive lower
    bound; default = main head when the stream starts),
    ``max_files_per_batch`` (cap on added data files one microbatch may
    cover; default unbounded, which Trigger.AvailableNow's single-batch
    fallback requires)."""

    @classmethod
    def name(cls) -> str:
        return STREAM_FORMAT_NAME

    def schema(self) -> str:
        from iceberg_trino_sql_demo_spark.sources.metadata import MetadataIO

        meta, _ = MetadataIO(self.options["path"]).read()
        base = ", ".join(f"{f.name} {f.type}" for f in meta.schema.fields)
        return base + ", _change_type string, _commit_sequence_number bigint"

    def simpleStreamReader(self, schema: StructType) -> IceChangesStreamReader:
        start = self.options.get("start_snapshot_id")
        cap = self.options.get("max_files_per_batch")
        return IceChangesStreamReader(
            self.options["path"],
            int(start) if start is not None else None,
            int(cap) if cap is not None else None,
            self.options.get("mode", "append_only"),
        )
