"""Snapshot -> DataFrame resolution (SURVEY.md §3.1 steps 2-4).

The planner hands this module a (possibly pruned) manifest; everything here
builds ONE declarative Catalyst plan:

- files are grouped by (schema_id, has_lineage) and each group is read with
  an explicit physical schema, then projected to the *current* schema by
  column id — adds fill ``initial_default`` (reference :166-171: old rows
  surface the default, not NULL), drops are simply not selected (:181);
- merge-on-read position deletes become a left-anti join applied ONLY to the
  data files a delete file references — clean files keep an untouched scan
  with full parquet pushdown (SURVEY.md §4 "MoR plan kept narrow");
- hidden columns (reference :65-72) derive from Spark's ``_metadata`` struct
  (_path, _file_modified_time, row positions) plus manifest-side joins for
  _partition and row lineage (first_row_id + row_index, v3 row lineage).

Scale note: per-group unions are O(#schema versions) not O(#files); the
file-info side of every hidden-column join is manifest-sized and broadcast.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_trino_sql_demo_spark.sources.metadata import (
    DataFile,
    Manifest,
    TableMetadata,
    TableSchema,
    spark_type,
)

ROW_ID = "_row_id"
LAST_SEQ = "_last_updated_sequence_number"
PATH_COL = "_path"
FILE_MTIME = "_file_modified_time"
PARTITION_COL = "_partition"
_FILE = "__mor_file"
_POS = "__mor_pos"

HIDDEN_COLS = (ROW_ID, LAST_SEQ, PARTITION_COL, PATH_COL, FILE_MTIME)


def _to_uri(path: str) -> str:
    # Spark's _metadata.file_path renders local files as 'file:/abs/path'
    return "file:" + path if path.startswith("/") else path


def _default_lit(fld) -> F.Column:
    """initial_default literal, typed like the column."""
    v = fld.initial_default
    if v is None:
        return F.lit(None).cast(spark_type(fld.type))
    if fld.type == "variant":
        return F.parse_json(F.lit(v if isinstance(v, str) else json.dumps(v)))
    return F.lit(v).cast(spark_type(fld.type))


def _group_projection(
    file_schema: TableSchema, current: TableSchema, has_lineage: bool
) -> list[F.Column]:
    """Select-list projecting a file group's physical layout to the current
    schema, by column id (never by name — SURVEY.md §1.4)."""
    by_id = {f.id: f for f in file_schema.fields}
    cols = []
    for fld in current.fields:
        src = by_id.get(fld.id)
        if src is None:
            cols.append(_default_lit(fld).alias(fld.name))
        else:
            c = F.col(src.pname)
            if src.type != fld.type:
                c = c.cast(spark_type(fld.type))
            cols.append(c.alias(fld.name))
    if has_lineage:
        cols += [F.col(ROW_ID), F.col(LAST_SEQ)]
    else:
        cols += [
            F.lit(None).cast("long").alias(ROW_ID),
            F.lit(None).cast("long").alias(LAST_SEQ),
        ]
    return cols


def _file_info_df(spark: SparkSession, files: list[DataFile]) -> DataFrame:
    rows = [
        (
            _to_uri(f.path),
            f.first_row_id,
            f.sequence_number,
            json.dumps(f.partition, default=str),
            bool(f.has_lineage),
        )
        for f in files
    ]
    schema = T.StructType(
        [
            T.StructField("__fi_path", T.StringType()),
            T.StructField("__fi_first_row_id", T.LongType()),
            T.StructField("__fi_seq", T.LongType()),
            T.StructField("__fi_partition", T.StringType()),
            T.StructField("__fi_has_lineage", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def snapshot_df(
    spark: SparkSession,
    meta: TableMetadata,
    manifest: Manifest,
    *,
    hidden: bool = False,
) -> DataFrame:
    """Build the DataFrame for a snapshot's (pruned) manifest.

    ``hidden=True`` appends the reference's system columns (:65-72):
    _row_id, _last_updated_sequence_number, _partition, _path,
    _file_modified_time.  Plain reads skip every metadata-join so the scan
    stays a bare parquet read.
    """
    current = meta.schema
    out_struct = T.StructType(
        [T.StructField(f.name, spark_type(f.type), True) for f in current.fields]
        + [T.StructField(ROW_ID, T.LongType(), True), T.StructField(LAST_SEQ, T.LongType(), True)]
    )
    data_files = manifest.data_files
    if not data_files:
        if hidden:
            out_struct = T.StructType(
                list(out_struct.fields)
                + [
                    T.StructField(PARTITION_COL, T.StringType(), True),
                    T.StructField(PATH_COL, T.StringType(), True),
                    T.StructField(FILE_MTIME, T.TimestampType(), True),
                ]
            )
        empty = spark.createDataFrame([], out_struct)
        return empty if hidden else empty.select(*[f.name for f in current.fields])

    pos_dels = [d for d in manifest.delete_files
                if d.content in ("position", "dv")]
    eq_dels = [d for d in manifest.delete_files if d.content == "equality"]

    # data files referenced by live position-delete files need the MoR
    # (file, pos) anti-join
    deleted_refs: set[str] = set()
    for dfl in pos_dels:
        deleted_refs.update(getattr(dfl, "referenced_files", []) or _read_refs(dfl.path))
    # an equality delete applies to every data file STRICTLY older than it
    # (same-commit data files are exempt — that exemption is what makes the
    # streaming upsert a blind write)
    max_eq_seq = max((d.sequence_number for d in eq_dels), default=None)

    need_lineage = hidden
    groups: dict[tuple[int, bool, bool, bool, str], list[DataFile]] = {}
    for f in data_files:
        is_eq = max_eq_seq is not None and f.sequence_number < max_eq_seq
        key = (f.schema_id, bool(f.has_lineage), f.path in deleted_refs,
               is_eq, f.file_format or "parquet")
        groups.setdefault(key, []).append(f)

    parts: list[DataFrame] = []
    for (schema_id, has_lineage, is_deleted, is_eq,
         fmt), files in sorted(groups.items()):
        fschema = meta.schema_by_id(schema_id)
        struct = fschema.to_struct(physical=True)
        if has_lineage:
            struct = T.StructType(
                list(struct.fields)
                + [T.StructField(ROW_ID, T.LongType()), T.StructField(LAST_SEQ, T.LongType())]
            )
        proj = _group_projection(fschema, current, has_lineage)
        needs_meta = need_lineage or is_deleted or is_eq
        if fmt == "avro" or (fmt == "orc" and needs_meta):
            # positional non-parquet scan: Spark's ORC source has no
            # _metadata.row_index, and this distribution has no avro
            # datasource at all — the pyarrow stripe / pure-Python OCF
            # readers supply exact file positions for the MoR anti-join
            # and row-id synthesis (avro routes here even for plain
            # scans: there is no native reader to fall back to)
            scan = (_orc_scan_with_positions if fmt == "orc"
                    else _avro_scan_with_positions)
            df = scan(spark, files, struct)
            if needs_meta:
                df = df.select(*proj, F.col(_FILE), F.col(_POS),
                               F.col(FILE_MTIME))
        else:
            rd = spark.read.schema(struct)
            paths_ = [f.path for f in files]
            # NB: DataFrameReader.orc takes ONE path-or-list (its second
            # positional is mergeSchema), unlike .parquet(*paths)
            df = rd.orc(paths_) if fmt == "orc" else rd.parquet(*paths_)
        if needs_meta and fmt == "parquet":
            df = df.select(
                *proj,
                F.col("_metadata.file_path").alias(_FILE),
                F.col("_metadata.row_index").alias(_POS),
                F.col("_metadata.file_modification_time").alias(FILE_MTIME),
            )
        elif not needs_meta:
            df = df.select(*proj)
            df = df.withColumn(_FILE, F.lit(None).cast("string")) \
                   .withColumn(_POS, F.lit(None).cast("long")) \
                   .withColumn(FILE_MTIME, F.lit(None).cast("timestamp"))
        if is_deleted:
            dels = read_position_deletes(spark, manifest, only_for=[f.path for f in files])
            n_del = sum(d.record_count for d in pos_dels)
            df = df.join(
                _hint_deletes(dels, n_del),
                (df[_FILE] == dels["__del_file"]) & (df[_POS] == dels["__del_pos"]),
                "left_anti",
            )
        if is_eq:
            df = _apply_equality_deletes(spark, meta, df, files, eq_dels)
        parts.append(df)

    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)

    if not hidden:
        return df.select(*[f.name for f in current.fields])

    info = _file_info_df(spark, data_files)
    df = df.join(F.broadcast(info), df[_FILE] == info["__fi_path"], "left")
    df = (
        df.withColumn(ROW_ID, F.coalesce(F.col(ROW_ID), F.col("__fi_first_row_id") + F.col(_POS)))
        .withColumn(LAST_SEQ, F.coalesce(F.col(LAST_SEQ), F.col("__fi_seq")))
        .withColumn(PARTITION_COL, F.col("__fi_partition"))
        .withColumn(PATH_COL, F.col(_FILE))
    )
    return df.select(
        *[f.name for f in current.fields],
        ROW_ID,
        LAST_SEQ,
        PARTITION_COL,
        PATH_COL,
        FILE_MTIME,
    )


def _orc_scan_with_positions(
    spark: SparkSession, files: list[DataFile], struct: T.StructType
) -> DataFrame:
    """Positional scan of ORC data files: Spark's ORC reader exposes no
    ``_metadata.row_index``, so positions come from an Arrow-batched
    ``mapInPandas`` over per-file pyarrow.orc stripe reads — ORC row
    position IS file order (stripes in order, rows in stripe order),
    exactly the ordinal Iceberg position deletes and row-lineage
    synthesis address.  One task per file; each stripe converts as one
    Arrow batch, so memory is stripe-bounded.  Returns the group's
    physical columns plus (__mor_file, __mor_pos, _file_modified_time) —
    the same shape the parquet ``_metadata`` branch produces."""
    out = T.StructType(
        list(struct.fields)
        + [T.StructField(_FILE, T.StringType()),
           T.StructField(_POS, T.LongType()),
           T.StructField(FILE_MTIME, T.TimestampType())]
    )
    phys = [f.name for f in struct.fields]
    src = spark.createDataFrame(
        [(f.path,) for f in files], "path string"
    ).repartition(max(1, len(files)))

    def gen(it):
        import datetime as _dt
        import os as _os

        import pandas as _pd
        import pyarrow.orc as _po

        for pdf in it:
            for p in pdf["path"]:
                # tz-aware so Arrow carries the true instant regardless of
                # the executor OS timezone (the parquet branch's
                # _metadata.file_modification_time is likewise an instant).
                mtime = _dt.datetime.fromtimestamp(
                    _os.path.getmtime(p), tz=_dt.timezone.utc)
                of = _po.ORCFile(p)
                pos = 0
                for si in range(of.nstripes):
                    b = of.read_stripe(si).to_pandas()
                    d = _pd.DataFrame(
                        {c: (b[c] if c in b.columns else None)
                         for c in phys})
                    d[_FILE] = _to_uri(p)
                    d[_POS] = range(pos, pos + len(d))
                    d[FILE_MTIME] = mtime
                    pos += len(d)
                    yield d

    return src.mapInPandas(gen, out)


def _avro_scan_with_positions(
    spark: SparkSession, files: list[DataFile], struct: T.StructType
) -> DataFrame:
    """Positional scan of Avro OCF data files (adopted Iceberg tables —
    the spec permits Avro data files; this Spark distribution ships no
    spark-avro datasource).  The engine's pure-Python OCF decoder fans
    out as an Arrow-batched ``mapInPandas``: one task per file, rows in
    container order — which IS the ordinal Iceberg position deletes and
    row-lineage synthesis address.  Avro logical types surface raw from
    the decoder (date = int days, timestamp-micros = long), so values
    convert per the TARGET Spark field type here.  Each file decodes
    whole in its task (OCF blocks are row-oriented; no column pruning
    exists for Avro anywhere) — adoption-compaction to parquet
    (``optimize``) is the scale path, same as ORC."""
    out = T.StructType(
        list(struct.fields)
        + [T.StructField(_FILE, T.StringType()),
           T.StructField(_POS, T.LongType()),
           T.StructField(FILE_MTIME, T.TimestampType())]
    )
    conv = [(f.name, f.dataType.typeName()) for f in struct.fields]
    src = spark.createDataFrame(
        [(f.path,) for f in files], "path string"
    ).repartition(max(1, len(files)))

    def gen(it):
        import datetime as _dt
        import os as _os

        import pandas as _pd

        from iceberg_trino_sql_demo_spark.sources.avro_ocf import (
            read_ocf,
        )

        epoch_d = _dt.date(1970, 1, 1)
        epoch_ts = _dt.datetime(1970, 1, 1)

        def cell(v, tname):
            if v is None:
                return None
            if tname == "date" and isinstance(v, int):
                return epoch_d + _dt.timedelta(days=v)
            if tname == "timestamp" and isinstance(v, int):
                return epoch_ts + _dt.timedelta(microseconds=v)
            return v

        for pdf in it:
            for p in pdf["path"]:
                mtime = _dt.datetime.fromtimestamp(
                    _os.path.getmtime(p), tz=_dt.timezone.utc)
                _, rows = read_ocf(p)
                d = _pd.DataFrame({
                    name: [cell(r.get(name), tname) for r in rows]
                    for name, tname in conv
                })
                d[_FILE] = _to_uri(p)
                d[_POS] = range(len(rows))
                d[FILE_MTIME] = mtime
                yield d

    return src.mapInPandas(gen, out)


def rows_at_positions(
    spark: SparkSession,
    meta: TableMetadata,
    files: list[DataFile],
    delete_df: DataFrame,
    n_delete_rows: int | None = None,
) -> DataFrame:
    """Rows of ``files`` whose (path, position) appear in ``delete_df``
    (__del_file, __del_pos) — used by CDC to materialize deleted rows.
    ``n_delete_rows`` (manifest record counts) gates the broadcast hint."""
    current = meta.schema
    groups: dict[tuple[int, bool, str], list[DataFile]] = {}
    for f in files:
        groups.setdefault(
            (f.schema_id, bool(f.has_lineage),
             f.file_format or "parquet"), []).append(f)
    parts = []
    for (schema_id, has_lineage, fmt), fs in sorted(groups.items()):
        fschema = meta.schema_by_id(schema_id)
        struct = fschema.to_struct(physical=True)
        if has_lineage:
            struct = T.StructType(
                list(struct.fields)
                + [T.StructField(ROW_ID, T.LongType()), T.StructField(LAST_SEQ, T.LongType())]
            )
        proj = _group_projection(fschema, current, has_lineage)
        if fmt in ("orc", "avro"):
            scan = (_orc_scan_with_positions if fmt == "orc"
                    else _avro_scan_with_positions)
            df = scan(spark, fs, struct)
            df = df.select(*proj, F.col(_FILE), F.col(_POS))
        else:
            df = spark.read.schema(struct).parquet(*[f.path for f in fs])
            df = df.select(
                *proj,
                F.col("_metadata.file_path").alias(_FILE),
                F.col("_metadata.row_index").alias(_POS),
            )
        hinted = (
            delete_df
            if n_delete_rows is not None and n_delete_rows > _DELETE_BROADCAST_ROWS
            else F.broadcast(delete_df)
        )
        df = df.join(
            hinted,
            (df[_FILE] == delete_df["__del_file"]) & (df[_POS] == delete_df["__del_pos"]),
            "left_semi",
        )
        parts.append(df)
    if not parts:
        return spark.createDataFrame([], meta.schema.to_struct()).select(
            *[f.name for f in current.fields]
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*[f.name for f in current.fields])


def _read_refs(delete_path: str) -> set[str]:
    """Fallback: distinct file_path values inside a position-delete parquet."""
    import pyarrow.parquet as pq

    t = pq.read_table(delete_path, columns=["file_path"])
    return set(t.column("file_path").to_pylist())


#: broadcast ceiling for the position-delete set — (file,pos) pairs are
#: ~100 B serialized, so 2M rows ≈ 200 MB, comfortably under executor
#: memory; past that the anti-join must shuffle instead of OOMing.
_DELETE_BROADCAST_ROWS = 2_000_000


def _hint_deletes(dels, n_delete_rows: int):
    """Broadcast the delete set only while the MANIFEST (no data read)
    proves it small; a huge pre-compaction delete set shuffle-joins."""
    return F.broadcast(dels) if n_delete_rows <= _DELETE_BROADCAST_ROWS else dels


def _apply_equality_deletes(
    spark: SparkSession,
    meta: TableMetadata,
    df: DataFrame,
    files: list,
    eq_dels: list,
) -> DataFrame:
    """Anti-join ``df`` (projected to the current schema, carrying _FILE)
    against the live equality-delete sets.

    Semantics (Iceberg v2 equality deletes): a delete row with key K
    removes every row with key K from data files whose sequence_number is
    STRICTLY below the delete file's.  Null keys match null keys
    (null-safe equality), like Iceberg.  One anti-join per distinct key-id
    tuple; the per-row data sequence number comes from a broadcast
    (path -> seq) join over the group's manifest entries — no data read.
    """
    from functools import reduce

    # attach each row's data-file sequence number (file-cardinality join)
    seq_rows = [(_to_uri(f.path), f.sequence_number) for f in files]
    seq_df = spark.createDataFrame(seq_rows, "__seq_path string, __data_seq long")
    df = df.join(F.broadcast(seq_df), df[_FILE] == seq_df["__seq_path"], "left").drop(
        "__seq_path"
    )

    by_ids: dict[tuple[int, ...], list] = {}
    for d in eq_dels:
        by_ids.setdefault(tuple(d.equality_ids), []).append(d)
    for ids, dels in sorted(by_ids.items()):
        eqdf = read_equality_deletes(spark, meta, dels)
        conds = []
        for cid in ids:
            fld = next(f for f in meta.schema.fields if f.id == cid)
            conds.append(df[fld.name].eqNullSafe(eqdf[f"__eqk_{cid}"]))
        cond = reduce(lambda a, b: a & b, conds) & (
            df["__data_seq"] < eqdf["__eq_seq"]
        )
        n_del = sum(d.record_count for d in dels)
        df = df.join(_hint_deletes(eqdf, n_del), cond, "left_anti")
    return df.drop("__data_seq")


def read_equality_deletes(
    spark: SparkSession, meta: TableMetadata, dels: list
) -> DataFrame:
    """Union of equality-delete files sharing one key-id tuple, as
    (__eqk_<id>..., __eq_seq).  Files are grouped by sequence number so the
    scan stays a plain parquet read per distinct commit."""
    ids = tuple(dels[0].equality_ids)
    fields = []
    for cid in ids:
        fld = next(f for f in meta.schema.fields if f.id == cid)
        fields.append(T.StructField(f"k_{cid}", spark_type(fld.type), True))
    struct = T.StructType(fields)
    by_seq: dict[int, list[str]] = {}
    for d in dels:
        by_seq.setdefault(d.sequence_number, []).append(d.path)
    out: DataFrame | None = None
    for seq, paths in sorted(by_seq.items()):
        part = spark.read.schema(struct).parquet(*paths).withColumn(
            "__eq_seq", F.lit(seq).cast("long")
        )
        out = part if out is None else out.unionByName(part)
    assert out is not None
    return out.select(
        *[F.col(f"k_{cid}").alias(f"__eqk_{cid}") for cid in ids], "__eq_seq"
    )


def rows_matching_equality(
    spark: SparkSession, meta: TableMetadata, manifest: Manifest, eq_dels: list
) -> DataFrame:
    """Rows of ``manifest``'s state (all deletes applied) that the given
    equality-delete files remove — i.e. key matches AND the row's data file
    is strictly older than the delete.  Used by CDC to materialize the
    full values of equality-deleted rows."""
    from functools import reduce

    base = snapshot_df(spark, meta, manifest, hidden=True)
    files = manifest.data_files
    seq_rows = [(_to_uri(f.path), f.sequence_number) for f in files]
    seq_df = spark.createDataFrame(seq_rows, "__seq_path string, __data_seq long")
    base = base.join(
        F.broadcast(seq_df), base[PATH_COL] == seq_df["__seq_path"], "left"
    )
    by_ids: dict[tuple[int, ...], list] = {}
    for d in eq_dels:
        by_ids.setdefault(tuple(d.equality_ids), []).append(d)
    out: DataFrame | None = None
    for ids, dels in sorted(by_ids.items()):
        eqdf = read_equality_deletes(spark, meta, dels)
        conds = []
        for cid in ids:
            fld = next(f for f in meta.schema.fields if f.id == cid)
            conds.append(base[fld.name].eqNullSafe(eqdf[f"__eqk_{cid}"]))
        cond = reduce(lambda a, b: a & b, conds) & (
            base["__data_seq"] < eqdf["__eq_seq"]
        )
        n_del = sum(d.record_count for d in dels)
        hit = base.join(_hint_deletes(eqdf, n_del), cond, "left_semi")
        out = hit if out is None else out.unionByName(hit)
    assert out is not None
    return out.select(*[f.name for f in meta.schema.fields])


def equality_positions(
    spark: SparkSession,
    meta: TableMetadata,
    manifest: Manifest,
    files: list,
    eq_dels: list,
) -> DataFrame:
    """(file_path URI, pos) of every row the given equality deletes
    suppress within ``files`` — the probe behind
    ``Table.rewrite_equality_deletes`` (eq -> position materialization).
    Rows already covered by a position delete are excluded (they need no
    second tombstone)."""
    from functools import reduce

    current = meta.schema
    groups: dict[tuple[int, bool, str], list] = {}
    for f in files:
        groups.setdefault(
            (f.schema_id, bool(f.has_lineage),
             f.file_format or "parquet"), []).append(f)
    base: DataFrame | None = None
    for (schema_id, has_lineage, fmt), fs in sorted(groups.items()):
        fschema = meta.schema_by_id(schema_id)
        struct = fschema.to_struct(physical=True)
        if has_lineage:
            struct = T.StructType(
                list(struct.fields)
                + [T.StructField(ROW_ID, T.LongType()), T.StructField(LAST_SEQ, T.LongType())]
            )
        proj = _group_projection(fschema, current, has_lineage)
        if fmt in ("orc", "avro"):
            scan = (_orc_scan_with_positions if fmt == "orc"
                    else _avro_scan_with_positions)
            df = scan(spark, fs, struct)
            df = df.select(*proj, F.col(_FILE), F.col(_POS))
        else:
            df = spark.read.schema(struct).parquet(*[f.path for f in fs])
            df = df.select(
                *proj,
                F.col("_metadata.file_path").alias(_FILE),
                F.col("_metadata.row_index").alias(_POS),
            )
        base = df if base is None else base.unionByName(df)
    assert base is not None
    pos = read_position_deletes(spark, manifest, only_for=[f.path for f in files])
    n_pos = sum(
        d.record_count for d in manifest.delete_files
        if d.content in ("position", "dv")
    )
    base = base.join(
        _hint_deletes(pos, n_pos),
        (base[_FILE] == pos["__del_file"]) & (base[_POS] == pos["__del_pos"]),
        "left_anti",
    )
    seq_df = spark.createDataFrame(
        [(_to_uri(f.path), f.sequence_number) for f in files],
        "__seq_path string, __data_seq long",
    )
    base = base.join(F.broadcast(seq_df), base[_FILE] == seq_df["__seq_path"], "left")
    by_ids: dict[tuple[int, ...], list] = {}
    for d in eq_dels:
        by_ids.setdefault(tuple(d.equality_ids), []).append(d)
    out: DataFrame | None = None
    for ids, dels in sorted(by_ids.items()):
        eqdf = read_equality_deletes(spark, meta, dels)
        conds = []
        for cid in ids:
            fld = next(f for f in meta.schema.fields if f.id == cid)
            conds.append(base[fld.name].eqNullSafe(eqdf[f"__eqk_{cid}"]))
        cond = reduce(lambda a, b: a & b, conds) & (
            base["__data_seq"] < eqdf["__eq_seq"]
        )
        n_del = sum(d.record_count for d in dels)
        hit = base.join(_hint_deletes(eqdf, n_del), cond, "left_semi")
        out = hit if out is None else out.unionByName(hit)
    assert out is not None
    return out.select(
        F.col(_FILE).alias("file_path"), F.col(_POS).alias("pos")
    ).distinct()


def read_position_deletes(
    spark: SparkSession, manifest: Manifest, only_for: list[str] | None = None
) -> DataFrame:
    """Union of live position tombstones as (__del_file, __del_pos) —
    raw position-delete parquet files plus consolidated deletion-vector
    packs (sources/deletion_vectors.py)."""
    paths = [d.path for d in manifest.delete_files if d.content == "position"]
    dvs = [d for d in manifest.delete_files if d.content == "dv"]
    schema = T.StructType(
        [T.StructField("file_path", T.StringType()), T.StructField("pos", T.LongType())]
    )
    parts: list[DataFrame] = []
    if paths:
        df = spark.read.schema(schema).parquet(*paths)
        if only_for is not None:
            uris = [_to_uri(p) for p in only_for]
            df = df.where(F.col("file_path").isin(uris))
        parts.append(
            df.select(
                F.col("file_path").alias("__del_file"),
                F.col("pos").alias("__del_pos"),
            )
        )
    if dvs:
        from iceberg_trino_sql_demo_spark.sources.deletion_vectors import (
            read_dv_positions,
        )

        parts.append(read_dv_positions(spark, dvs, only_for))
    if not parts:
        return spark.createDataFrame([], schema).select(
            F.col("file_path").alias("__del_file"), F.col("pos").alias("__del_pos")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
