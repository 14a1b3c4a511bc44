"""Writer of a GENUINE Apache Iceberg v2 table — fixture for adoption tests.

This is NOT a production write path: it exists so ``iceberg_compat`` can
be exercised against a real spec-v2 table in a sandbox with no
``pyiceberg``/network.  Genuineness is maximized three ways:

1. **Manifests and the manifest list are written by the JVM's Apache
   Avro 1.12** (bundled with Spark): records are materialized JVM-side
   by Avro's own ``JsonDecoder`` + ``GenericDatumReader`` from Avro-JSON
   text (py4j auto-unboxes java.lang.Long, so direct GenericData.Record
   construction cannot express a small long — the JSON route lets the
   reference Java implementation do ALL type resolution), then written
   with ``DataFileWriter``.  The pure-Python OCF reader
   (``avro_ocf.py``) is therefore verified against the reference Java
   Avro implementation, not a sibling Python writer.
2. The layout follows the public Iceberg spec: ``metadata/v1.metadata
   .json`` (format-version 2, hyphenated keys), ``version-hint.text``,
   Avro manifest list -> Avro manifests -> parquet data files with
   ``PARQUET:field_id`` metadata, position-delete parquet files with
   (file_path, pos), manifest bounds in single-value serialization
   (spec Appendix D).
3. **All recorded URIs use an s3:// prefix** that does not resolve
   locally — adoption must exercise the location-rebase path, exactly
   the reference's ``register_table(table_location => 's3://...')``
   scenario (iceberg_trino_sqldemo.sql:276-279) applied to a table whose
   files now sit on local disk.

The data manifest is deflate-coded and the delete manifest null-coded,
covering both codecs the reader supports.
"""
from __future__ import annotations

import json
import os
import struct
import time
import uuid


def _kv_map_schema(name: str, kid: int, vid: int, vtype: str) -> dict:
    return ["null", {
        "type": "array", "logicalType": "map", "items": {
            "type": "record", "name": name, "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid}]}}]


def _manifest_entry_schema(partitioned) -> dict:
    """The v2 manifest_entry Avro schema.  ``partitioned`` is either the
    fixture bool (adds the identity ``mktsegment`` field, id 1000) or an
    explicit list of partition-record Avro fields (the export path's
    per-spec struct)."""
    if isinstance(partitioned, list):
        part_fields = partitioned
    else:
        part_fields = (
            [{"name": "mktsegment", "type": ["null", "string"],
              "field-id": 1000}]
            if partitioned else []
        )
    return {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102",
                    "fields": part_fields}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                {"name": "null_value_counts", "default": None,
                 "field-id": 110,
                 "type": _kv_map_schema("k121_v122", 121, 122, "long")},
                {"name": "lower_bounds", "default": None, "field-id": 125,
                 "type": _kv_map_schema("k126_v127", 126, 127, "bytes")},
                {"name": "upper_bounds", "default": None, "field-id": 128,
                 "type": _kv_map_schema("k129_v130", 129, 130, "bytes")},
            ]}},
    ]}

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ]}


def _bytes_json(b: bytes) -> str:
    """Avro-JSON encodes bytes as a string of the bytes' Latin-1 chars."""
    return b.decode("latin-1")


def _u(branch: str, v):
    """Avro-JSON union value: {branch: value} (None stays null)."""
    return None if v is None else {branch: v}


class _AvroJvm:
    """JVM Apache-Avro writing: Avro-JSON text -> GenericRecord -> OCF."""

    def __init__(self, spark):
        self.jvm = spark.sparkContext._jvm

    def parse(self, schema_json: str):
        return self.jvm.org.apache.avro.Schema.Parser().parse(schema_json)

    def write_ocf(self, path: str, schema, json_records: list[str],
                  meta: dict[str, str], deflate: bool = False) -> None:
        reader = self.jvm.org.apache.avro.generic.GenericDatumReader(schema)
        factory = self.jvm.org.apache.avro.io.DecoderFactory.get()
        w = self.jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        dfw = self.jvm.org.apache.avro.file.DataFileWriter(w)
        if deflate:
            dfw.setCodec(
                self.jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
        for k, v in meta.items():
            dfw.setMeta(k, v)
        dfw.create(schema, self.jvm.java.io.File(path))
        for js in json_records:
            dec = factory.jsonDecoder(schema, js)
            dfw.append(reader.read(None, dec))
        dfw.close()


def _bound_long(v: int) -> bytes:
    return struct.pack("<q", int(v))


def _bound_double(v: float) -> bytes:
    return struct.pack("<d", float(v))


def _bound_string(v: str) -> bytes:
    return v.encode("utf-8")


_FIELDS = [
    # (id, name, iceberg type, bound encoder)
    (1, "custkey", "long", _bound_long),
    (2, "name", "string", _bound_string),
    (3, "mktsegment", "string", _bound_string),
    (4, "acctbal", "double", _bound_double),
]


def _write_data_file(path: str, rows: list[dict],
                     file_format: str = "parquet",
                     av: "_AvroJvm | None" = None) -> None:
    """Data file with Iceberg PARQUET:field_id column metadata (parquet),
    a plain ORC layout (the r12 ORC-adoption fixture), or an Avro OCF
    written by the JVM's reference Apache Avro with spec ``field-id``
    props on every field (the r13 Avro-adoption fixture)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if file_format == "avro":
        assert av is not None
        doc = {"type": "record", "name": "r", "fields": [
            {"name": name, "type": t, "field-id": fid}
            for fid, name, t, _ in _FIELDS]}
        schema = av.parse(json.dumps(doc))
        recs = [json.dumps({name: r[name] for _, name, _, _ in _FIELDS})
                for r in rows]
        av.write_ocf(path, schema, recs, {}, deflate=True)
        return
    pa_types = {"long": pa.int64(), "string": pa.string(),
                "double": pa.float64()}
    fields = [
        pa.field(name, pa_types[t],
                 metadata={b"PARQUET:field_id": str(fid).encode()})
        for fid, name, t, _ in _FIELDS
    ]
    cols = {name: [r[name] for r in rows] for _, name, _, _ in _FIELDS}
    tbl = pa.table(cols, schema=pa.schema(fields))
    if file_format == "orc":
        import pyarrow.orc as po

        po.write_table(tbl, path)
    else:
        pq.write_table(tbl, path)


def _int_map_json(pairs: list[tuple[int, object]]):
    return _u("array", [{"key": k, "value": v} for k, v in pairs])


def write_iceberg_fixture(spark, local_dir: str, source_rows: list[dict],
                          delete_mod: int = 7,
                          partitioned: bool = False,
                          file_format: str = "parquet") -> dict:
    """Write a genuine Iceberg v2 table under ``local_dir``.

    ``source_rows``: dicts with custkey/name/mktsegment/acctbal.  Rows
    split by custkey parity into two custkey-ordered data files; every
    row with ``custkey % delete_mod == 0`` is removed via a
    position-delete file — so the live content is relationally
    expressible as ``WHERE custkey % delete_mod <> 0`` (the DuckDB
    oracle's view of the same fixture).

    ``partitioned=True`` declares an identity partition spec over
    ``mktsegment``: data files are grouped per segment under
    ``data/mktsegment=X/``, each manifest entry carries a non-empty
    partition record, and the spec has a real identity transform — the
    adoption path must read a PARTITIONED source correctly (it adopts
    the files unpartitioned; partition pruning of the source's
    transforms is deliberately lost, stats pruning is not).

    Returns {"location": local_dir, "recorded_location": s3 uri,
             "live_rows": n}.
    """
    av = _AvroJvm(spark)
    rec_loc = "s3://demo-warehouse/demo/adopt_tbl"
    meta_dir = os.path.join(local_dir, "metadata")
    data_dir = os.path.join(local_dir, "data")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    if partitioned:
        segs = sorted({r["mktsegment"] for r in source_rows})
        groups = [
            sorted((r for r in source_rows if r["mktsegment"] == sg),
                   key=lambda r: r["custkey"])
            for sg in segs
        ]
    else:
        groups = [
            sorted((r for r in source_rows if r["custkey"] % 2 == 0),
                   key=lambda r: r["custkey"]),
            sorted((r for r in source_rows if r["custkey"] % 2 == 1),
                   key=lambda r: r["custkey"]),
        ]
    groups = [g for g in groups if g]
    entry_schema = av.parse(json.dumps(_manifest_entry_schema(partitioned)))

    data_entries, delete_entries = [], []
    deleted = 0
    snapshot_id = 4242424242
    for i, rows in enumerate(groups):
        par = rows[0]["mktsegment"]
        sub = f"mktsegment={par}/" if partitioned else ""
        if partitioned:
            os.makedirs(os.path.join(data_dir, f"mktsegment={par}"),
                        exist_ok=True)
        ext = file_format if file_format in ("orc", "avro") else "parquet"
        fname = f"{sub}part-{i:05d}-{uuid.uuid4().hex[:8]}.{ext}"
        fpath = os.path.join(data_dir, fname)
        _write_data_file(fpath, rows, file_format, av=av)
        lo = [(fid, _bytes_json(enc(min(r[name] for r in rows))))
              for fid, name, _, enc in _FIELDS]
        hi = [(fid, _bytes_json(enc(max(r[name] for r in rows))))
              for fid, name, _, enc in _FIELDS]
        data_entries.append(json.dumps({
            "status": 1,  # ADDED
            "snapshot_id": _u("long", snapshot_id),
            "sequence_number": _u("long", 1),
            "file_sequence_number": _u("long", 1),
            "data_file": {
                "content": 0,
                "file_path": f"{rec_loc}/data/{fname}",
                "file_format": file_format.upper(),
                "partition": ({"mktsegment": _u("string", par)}
                              if partitioned else {}),
                "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(fpath),
                "null_value_counts": _int_map_json(
                    [(fid, 0) for fid, *_ in _FIELDS]),
                "lower_bounds": _int_map_json(lo),
                "upper_bounds": _int_map_json(hi),
            }}))

        # position deletes for this file: rows at positions where
        # custkey % delete_mod == 0 (file is custkey-ordered, so position
        # is just the enumerate index)
        dels = [(f"{rec_loc}/data/{fname}", pos)
                for pos, r in enumerate(rows)
                if delete_mod and r["custkey"] % delete_mod == 0]
        if dels:
            import pyarrow as pa
            import pyarrow.parquet as pq

            del_name = f"delete-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
            del_path = os.path.join(data_dir, del_name)
            pq.write_table(
                pa.table({
                    "file_path": pa.array([p for p, _ in dels], pa.string()),
                    "pos": pa.array([p for _, p in dels], pa.int64()),
                }),
                del_path,
            )
            deleted += len(dels)
            delete_entries.append(json.dumps({
                "status": 1,
                "snapshot_id": _u("long", snapshot_id),
                "sequence_number": _u("long", 1),
                "file_sequence_number": _u("long", 1),
                "data_file": {
                    "content": 1,  # POSITION_DELETES
                    "file_path": f"{rec_loc}/data/{del_name}",
                    "file_format": "PARQUET",
                    "partition": ({"mktsegment": _u("string", par)}
                                  if partitioned else {}),
                    "record_count": len(dels),
                    "file_size_in_bytes": os.path.getsize(del_path),
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                }}))

    man_meta = {
        "schema": _schema_json(),
        "partition-spec": "[]",
        "partition-spec-id": "0",
        "format-version": "2",
    }
    data_man = f"manifest-data-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, data_man), entry_schema,
                 data_entries, {**man_meta, "content": "data"},
                 deflate=True)  # deflate codec coverage
    manifests = [(data_man, 0, len(data_entries),
                  sum(len(g) for g in groups))]
    if delete_entries:
        del_man = f"manifest-deletes-{uuid.uuid4().hex[:8]}.avro"
        av.write_ocf(os.path.join(meta_dir, del_man), entry_schema,
                     delete_entries, {**man_meta, "content": "deletes"},
                     deflate=False)  # null codec coverage
        manifests.append((del_man, 1, len(delete_entries), deleted))

    ml_schema = av.parse(json.dumps(_MANIFEST_LIST_SCHEMA))
    ml_entries = []
    for fname, content, n_files, n_rows in manifests:
        ml_entries.append(json.dumps({
            "manifest_path": f"{rec_loc}/metadata/{fname}",
            "manifest_length":
                os.path.getsize(os.path.join(meta_dir, fname)),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": snapshot_id,
            "added_files_count": n_files,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": n_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }))
    ml_name = f"snap-{snapshot_id}-1-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, ml_name), ml_schema, ml_entries,
                 {"format-version": "2"})

    now = int(time.time() * 1000)
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": rec_loc,
        "last-sequence-number": 1,
        "last-updated-ms": now,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [json.loads(_schema_json())],
        "default-spec-id": 0,
        "partition-specs": [{
            "spec-id": 0,
            "fields": ([{"name": "mktsegment", "transform": "identity",
                         "source-id": 3, "field-id": 1000}]
                       if partitioned else []),
        }],
        "last-partition-id": 1000 if partitioned else 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet",
                       "commit.retry.num-retries": "4"},
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": 1,
            "timestamp-ms": now,
            "summary": {"operation": "append"},
            "manifest-list": f"{rec_loc}/metadata/{ml_name}",
            "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snapshot_id, "timestamp-ms": now}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    live = sum(len(g) for g in groups) - deleted
    return {"location": local_dir, "recorded_location": rec_loc,
            "live_rows": live}


def _schema_json() -> str:
    return json.dumps({
        "type": "struct", "schema-id": 0, "fields": [
            {"id": fid, "name": name, "required": False, "type": t}
            for fid, name, t, _ in _FIELDS
        ]})


def append_iceberg_snapshot(spark, local_dir: str,
                            new_rows: list[dict]) -> int:
    """Advance the genuine-Iceberg fixture by ONE append snapshot: a new
    data file + data manifest, a new manifest list carrying the previous
    snapshot's manifests PLUS the new one (v2 manifest lists are full
    state), and a ``v<N+1>.metadata.json`` with both snapshots — the
    source-table evolution an incremental sync
    (``iceberg_compat.sync_adopted_table``) must pick up.  Returns the
    new snapshot id."""
    from iceberg_trino_sql_demo_spark.sources.avro_ocf import read_ocf

    av = _AvroJvm(spark)
    meta_dir = os.path.join(local_dir, "metadata")
    data_dir = os.path.join(local_dir, "data")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    rec_loc = meta["location"]
    prev = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    seq = meta["last-sequence-number"] + 1
    snapshot_id = prev["snapshot-id"] + 1

    rows = sorted(new_rows, key=lambda r: r["custkey"])
    # a PARTITIONED fixture (identity mktsegment spec) appends a
    # per-segment file with a real partition record — the shape
    # sync_adopted_table must carry through (r11); rows must then all
    # share one segment
    default_sid = meta.get("default-spec-id", 0)
    spec_fields = next(
        s for s in meta["partition-specs"]
        if s.get("spec-id", 0) == default_sid).get("fields", [])
    partitioned = bool(spec_fields)
    par = None
    if partitioned:
        segs = {r["mktsegment"] for r in rows}
        assert len(segs) == 1, "partitioned append: one segment per call"
        par = segs.pop()
        os.makedirs(os.path.join(data_dir, f"mktsegment={par}"),
                    exist_ok=True)
    sub = f"mktsegment={par}/" if partitioned else ""
    fname = f"{sub}part-a{seq:03d}-{uuid.uuid4().hex[:8]}.parquet"
    fpath = os.path.join(data_dir, fname)
    _write_data_file(fpath, rows)
    entry_schema = av.parse(json.dumps(_manifest_entry_schema(partitioned)))
    lo = [(fid, _bytes_json(enc(min(r[name] for r in rows))))
          for fid, name, _, enc in _FIELDS]
    hi = [(fid, _bytes_json(enc(max(r[name] for r in rows))))
          for fid, name, _, enc in _FIELDS]
    entry = json.dumps({
        "status": 1,
        "snapshot_id": _u("long", snapshot_id),
        "sequence_number": _u("long", seq),
        "file_sequence_number": _u("long", seq),
        "data_file": {
            "content": 0,
            "file_path": f"{rec_loc}/data/{fname}",
            "file_format": "PARQUET",
            "partition": ({"mktsegment": _u("string", par)}
                          if partitioned else {}),
            "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(fpath),
            "null_value_counts": _int_map_json(
                [(fid, 0) for fid, *_ in _FIELDS]),
            "lower_bounds": _int_map_json(lo),
            "upper_bounds": _int_map_json(hi),
        }})
    man = f"manifest-data-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, man), entry_schema, [entry], {
        "schema": _schema_json(), "partition-spec": "[]",
        "partition-spec-id": "0", "format-version": "2",
        "content": "data",
    }, deflate=True)

    # new manifest list = previous snapshot's manifests + the new one
    # (manifest_file has no unions, so re-encoding read_ocf rows is
    # plain json)
    prev_ml = os.path.join(
        meta_dir, prev["manifest-list"].rsplit("/", 1)[1])
    _, prev_entries = read_ocf(prev_ml)
    ml_schema = av.parse(json.dumps(_MANIFEST_LIST_SCHEMA))
    ml_rows = [json.dumps(e) for e in prev_entries]
    ml_rows.append(json.dumps({
        "manifest_path": f"{rec_loc}/metadata/{man}",
        "manifest_length": os.path.getsize(os.path.join(meta_dir, man)),
        "partition_spec_id": default_sid, "content": 0,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": len(rows),
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }))
    ml = f"snap-{snapshot_id}-1-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, ml), ml_schema, ml_rows,
                 {"format-version": "2"})

    now = int(time.time() * 1000)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now
    meta["current-snapshot-id"] = snapshot_id
    meta["refs"]["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["snapshots"].append({
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": prev["snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": now,
        "summary": {"operation": "append"},
        "manifest-list": f"{rec_loc}/metadata/{ml}",
        "schema-id": 0,
    })
    meta["snapshot-log"].append(
        {"snapshot-id": snapshot_id, "timestamp-ms": now})
    with open(os.path.join(meta_dir, f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(v + 1))
    return snapshot_id


# ---------------------------------------------------------------------------
# Iceberg v3 fixture — deletion vectors (puffin), row lineage, defaults
# ---------------------------------------------------------------------------

_V3_DEFAULT_COL = (5, "tier", "string", "STANDARD")


def _manifest_entry_schema_v3(partitioned=False) -> dict:
    """The v2 entry schema plus the v3 data_file fields: first_row_id
    (row lineage, field-id 142) and the deletion-vector locator triple
    referenced_data_file / content_offset / content_size_in_bytes
    (field-ids 143-145)."""
    base = _manifest_entry_schema(partitioned)
    df_fields = base["fields"][-1]["type"]["fields"]
    df_fields.extend([
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 142},
        {"name": "referenced_data_file", "type": ["null", "string"],
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None, "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "default": None, "field-id": 145},
    ])
    return base


def _jvm_roaring64_portable(spark, positions: list[int],
                            ranges: list[tuple[int, int]] = ()) -> bytes:
    """Serialize positions with the REFERENCE RoaringBitmap library
    (bundled with Spark) in the 'portable' 64-bit format — the fixture's
    bitmaps are reference-encoded so the pure-Python decoder
    (sources/puffin.py) is verified against the real implementation,
    never against a sibling Python encoder.  ``ranges`` are [start, end)
    JVM-side bulk adds — the only way to build multi-million-position
    fixtures (py4j per-call addLong would take hours at that size)."""
    jvm = spark.sparkContext._jvm
    rm = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    for s_, e_ in ranges:
        rm.addRange(int(s_), int(e_))
    for p in positions:
        rm.addLong(int(p))
    rm.runOptimize()
    baos = jvm.java.io.ByteArrayOutputStream()
    dos = jvm.java.io.DataOutputStream(baos)
    rm.serializePortable(dos)
    dos.flush()
    return bytes(baos.toByteArray())


def _dv_blob(bitmap: bytes) -> bytes:
    """deletion-vector-v1 blob: 4 B BE length of (magic+vector), magic
    D1 D3 3D D3, the vector, 4 B BE CRC-32 of (magic+vector)."""
    import zlib

    body = b"\xd1\xd3\x3d\xd3" + bitmap
    return (struct.pack(">I", len(body)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def _write_puffin(spark, path: str, dvs: list[tuple[str, list[int]]],
                  snapshot_id: int, seq: int) -> list[tuple[str, int, int, int]]:
    """One Puffin file holding a deletion-vector-v1 blob per entry of
    ``dvs`` [(referenced data file URI, positions)].  Returns
    [(ref_uri, content_offset, content_size, cardinality)] for the
    manifest, and writes a spec-correct footer (Magic | JSON payload |
    payload size LE | 4 flag bytes | Magic)."""
    out = bytearray(b"PFA1")
    blobs_meta, locs = [], []
    for ref_uri, positions in dvs:
        if isinstance(positions, dict):
            # bulk spec for scale fixtures: {"ranges": [(s,e)), ...],
            # "points": [...], "cardinality": n}
            blob = _dv_blob(_jvm_roaring64_portable(
                spark, positions.get("points", ()),
                positions.get("ranges", ())))
            card = int(positions["cardinality"])
        else:
            blob = _dv_blob(_jvm_roaring64_portable(spark, positions))
            card = len(positions)
        blobs_meta.append({
            "type": "deletion-vector-v1",
            "fields": [],
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "offset": len(out),
            "length": len(blob),
            "properties": {
                "referenced-data-file": ref_uri,
                "cardinality": str(card),
            },
        })
        locs.append((ref_uri, len(out), len(blob), card))
        out += blob
    payload = json.dumps({
        "blobs": blobs_meta,
        "properties": {"created-by": "iceberg-v3-fixture"},
    }).encode("utf-8")
    out += b"PFA1" + payload + struct.pack("<I", len(payload))
    out += b"\x00\x00\x00\x00PFA1"
    with open(path, "wb") as fh:
        fh.write(bytes(out))
    return locs


def _schema_json_v3(variant_col: bool = False) -> str:
    fid, name, typ, default = _V3_DEFAULT_COL
    fields = [
        {"id": f, "name": n, "required": False, "type": t}
        for f, n, t, _ in _FIELDS
    ]
    fields.append({"id": fid, "name": name, "required": False, "type": typ,
                   "initial-default": default, "write-default": default})
    if variant_col:
        fields.append({"id": 6, "name": "attrs", "required": False,
                       "type": "variant"})
    return json.dumps({"type": "struct", "schema-id": 0, "fields": fields})


def _write_data_file_variant(spark, path: str, rows: list[dict]) -> None:
    """Data file carrying a real parquet VARIANT column, written by
    Spark (Spark 4's variant encoding is the parquet/Iceberg variant
    spec — the same bytes a Spark-Iceberg v3 writer produces).  The
    variant payload is derived from the key ({"ck": custkey}) so tests
    can assert values relationally.  Rows stay custkey-ordered (the
    deletion vectors address positions by that order)."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(r["custkey"], r["name"], r["mktsegment"], r["acctbal"])
         for r in rows],
        "custkey long, name string, mktsegment string, acctbal double",
    ).withColumn(
        "attrs",
        F.parse_json(F.concat(F.lit('{"ck":'),
                              F.col("custkey").cast("string"),
                              F.lit("}"))),
    ).coalesce(1).sortWithinPartitions("custkey")
    tmp = tempfile.mkdtemp(prefix="v3var_stage_")
    df.write.mode("overwrite").parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)


def write_iceberg_v3_fixture(spark, local_dir: str,
                             source_rows: list[dict],
                             delete_mod: int = 7,
                             variant_col: bool = False) -> dict:
    """Write a genuine Iceberg **v3** table under ``local_dir``:

    - deletes are **deletion vectors**: one Puffin file, one
      ``deletion-vector-v1`` blob per data file, bitmaps serialized by
      the JVM's reference RoaringBitmap in portable format, manifest
      delete entries carrying ``referenced_data_file`` /
      ``content_offset`` / ``content_size_in_bytes`` with
      ``file_format = PUFFIN``;
    - **row lineage**: explicit ``first_row_id`` per data file
      (0, |file0|, ...), ``next-row-id`` in the table metadata and
      ``first-row-id`` on the snapshot;
    - a **defaulted column**: field 5 ``tier string`` carries
      ``initial-default = 'STANDARD'`` and is NOT present in the
      parquet files — adopted rows must surface the default.

    Live content is ``WHERE custkey % delete_mod <> 0`` with
    ``tier = 'STANDARD'`` everywhere (the DuckDB-oracle view).
    """
    av = _AvroJvm(spark)
    rec_loc = "s3://demo-warehouse/demo/adopt_tbl_v3"
    meta_dir = os.path.join(local_dir, "metadata")
    data_dir = os.path.join(local_dir, "data")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    groups = [
        sorted((r for r in source_rows if r["custkey"] % 2 == 0),
               key=lambda r: r["custkey"]),
        sorted((r for r in source_rows if r["custkey"] % 2 == 1),
               key=lambda r: r["custkey"]),
    ]
    groups = [g for g in groups if g]
    entry_schema = av.parse(json.dumps(_manifest_entry_schema_v3()))
    snapshot_id = 5353535353
    seq = 1

    data_entries = []
    dv_specs: list[tuple[str, list[int]]] = []
    first_row = 0
    deleted = 0
    for i, rows in enumerate(groups):
        fname = f"part-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
        fpath = os.path.join(data_dir, fname)
        if variant_col:
            _write_data_file_variant(spark, fpath, rows)
        else:
            _write_data_file(fpath, rows)
        lo = [(fid, _bytes_json(enc(min(r[name] for r in rows))))
              for fid, name, _, enc in _FIELDS]
        hi = [(fid, _bytes_json(enc(max(r[name] for r in rows))))
              for fid, name, _, enc in _FIELDS]
        data_entries.append(json.dumps({
            "status": 1,
            "snapshot_id": _u("long", snapshot_id),
            "sequence_number": _u("long", seq),
            "file_sequence_number": _u("long", seq),
            "data_file": {
                "content": 0,
                "file_path": f"{rec_loc}/data/{fname}",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(fpath),
                "null_value_counts": _int_map_json(
                    [(fid, 0) for fid, *_ in _FIELDS]),
                "lower_bounds": _int_map_json(lo),
                "upper_bounds": _int_map_json(hi),
                "first_row_id": _u("long", first_row),
                "referenced_data_file": None,
                "content_offset": None,
                "content_size_in_bytes": None,
            }}))
        first_row += len(rows)
        dels = [pos for pos, r in enumerate(rows)
                if r["custkey"] % delete_mod == 0]
        if dels:
            dv_specs.append((f"{rec_loc}/data/{fname}", dels))
            deleted += len(dels)

    delete_entries = []
    if dv_specs:
        puf_name = f"deletes-{uuid.uuid4().hex[:8]}.puffin"
        puf_path = os.path.join(data_dir, puf_name)
        locs = _write_puffin(spark, puf_path, dv_specs, snapshot_id, seq)
        puf_size = os.path.getsize(puf_path)
        for ref_uri, off, size, card in locs:
            delete_entries.append(json.dumps({
                "status": 1,
                "snapshot_id": _u("long", snapshot_id),
                "sequence_number": _u("long", seq),
                "file_sequence_number": _u("long", seq),
                "data_file": {
                    "content": 1,
                    "file_path": f"{rec_loc}/data/{puf_name}",
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": card,
                    "file_size_in_bytes": puf_size,
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "first_row_id": None,
                    "referenced_data_file": _u("string", ref_uri),
                    "content_offset": _u("long", off),
                    "content_size_in_bytes": _u("long", size),
                }}))

    man_meta = {
        "schema": _schema_json_v3(variant_col),
        "partition-spec": "[]",
        "partition-spec-id": "0",
        "format-version": "3",
    }
    data_man = f"manifest-data-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, data_man), entry_schema,
                 data_entries, {**man_meta, "content": "data"},
                 deflate=True)
    manifests = [(data_man, 0, len(data_entries),
                  sum(len(g) for g in groups))]
    if delete_entries:
        del_man = f"manifest-deletes-{uuid.uuid4().hex[:8]}.avro"
        av.write_ocf(os.path.join(meta_dir, del_man), entry_schema,
                     delete_entries, {**man_meta, "content": "deletes"})
        manifests.append((del_man, 1, len(delete_entries), deleted))

    ml_schema = av.parse(json.dumps(_MANIFEST_LIST_SCHEMA))
    ml_entries = []
    for fname, content, n_files, n_rows in manifests:
        ml_entries.append(json.dumps({
            "manifest_path": f"{rec_loc}/metadata/{fname}",
            "manifest_length":
                os.path.getsize(os.path.join(meta_dir, fname)),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": n_files,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": n_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }))
    ml_name = f"snap-{snapshot_id}-1-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, ml_name), ml_schema, ml_entries,
                 {"format-version": "3"})

    now = int(time.time() * 1000)
    total_rows = sum(len(g) for g in groups)
    meta = {
        "format-version": 3,
        "table-uuid": str(uuid.uuid4()),
        "location": rec_loc,
        "last-sequence-number": seq,
        "last-updated-ms": now,
        "last-column-id": 6 if variant_col else _V3_DEFAULT_COL[0],
        "current-schema-id": 0,
        "schemas": [json.loads(_schema_json_v3(variant_col))],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "next-row-id": total_rows,
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": now,
            "first-row-id": 0,
            "added-rows": total_rows,
            "summary": {"operation": "append"},
            "manifest-list": f"{rec_loc}/metadata/{ml_name}",
            "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snapshot_id, "timestamp-ms": now}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    live = total_rows - deleted
    return {"location": local_dir, "recorded_location": rec_loc,
            "live_rows": live, "deleted": deleted,
            "next_row_id": total_rows}


def add_equality_delete_snapshot(spark, local_dir: str,
                                 keys: list[int],
                                 field_id: int = 1,
                                 col: str = "custkey") -> int:
    """Advance the genuine-Iceberg fixture by ONE snapshot that commits
    an EQUALITY delete (content=2) on ``col`` — the shape a Flink-CDC /
    streaming-upsert writer produces.  The delete parquet carries the
    source-schema column name with PARQUET:field_id metadata and the
    manifest entry carries ``equality_ids`` (field-id 135) plus an
    explicit sequence number, so adoption must (a) rewrite the column to
    the engine's ``k_<id>`` form and (b) preserve the strictly-below
    application rule.  Returns the new snapshot id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_trino_sql_demo_spark.sources.avro_ocf import read_ocf

    av = _AvroJvm(spark)
    meta_dir = os.path.join(local_dir, "metadata")
    data_dir = os.path.join(local_dir, "data")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    rec_loc = meta["location"]
    prev = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    seq = meta["last-sequence-number"] + 1
    snapshot_id = prev["snapshot-id"] + 1

    del_name = f"eq-delete-{seq:03d}-{uuid.uuid4().hex[:8]}.parquet"
    del_path = os.path.join(data_dir, del_name)
    pq.write_table(pa.table(
        {col: pa.array(sorted(keys), pa.int64())},
        schema=pa.schema([pa.field(
            col, pa.int64(),
            metadata={b"PARQUET:field_id": str(field_id).encode()})]),
    ), del_path)

    entry_schema_doc = _manifest_entry_schema(False)
    entry_schema_doc["fields"][-1]["type"]["fields"].append(
        {"name": "equality_ids", "default": None, "field-id": 135,
         "type": ["null", {"type": "array", "items": "int"}]})
    entry_schema = av.parse(json.dumps(entry_schema_doc))
    entry = json.dumps({
        "status": 1,
        "snapshot_id": _u("long", snapshot_id),
        "sequence_number": _u("long", seq),
        "file_sequence_number": _u("long", seq),
        "data_file": {
            "content": 2,  # EQUALITY_DELETES
            "file_path": f"{rec_loc}/data/{del_name}",
            "file_format": "PARQUET",
            "partition": {},
            "record_count": len(keys),
            "file_size_in_bytes": os.path.getsize(del_path),
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": _u("array", [field_id]),
        }})
    man = f"manifest-eqdel-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, man), entry_schema, [entry], {
        "schema": meta_schema_json(meta), "partition-spec": "[]",
        "partition-spec-id": "0",
        "format-version": str(meta["format-version"]),
        "content": "deletes",
    })

    prev_ml = os.path.join(
        meta_dir, prev["manifest-list"].rsplit("/", 1)[1])
    _, prev_entries = read_ocf(prev_ml)
    ml_schema = av.parse(json.dumps(_MANIFEST_LIST_SCHEMA))
    ml_rows = [json.dumps(e) for e in prev_entries]
    ml_rows.append(json.dumps({
        "manifest_path": f"{rec_loc}/metadata/{man}",
        "manifest_length": os.path.getsize(os.path.join(meta_dir, man)),
        "partition_spec_id": 0, "content": 1,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": len(keys),
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }))
    ml = f"snap-{snapshot_id}-1-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, ml), ml_schema, ml_rows,
                 {"format-version": str(meta["format-version"])})

    now = int(time.time() * 1000)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now
    meta["current-snapshot-id"] = snapshot_id
    meta["refs"]["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta["snapshots"].append({
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": prev["snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": now,
        "summary": {"operation": "overwrite"},
        "manifest-list": f"{rec_loc}/metadata/{ml}",
        "schema-id": 0,
    })
    meta["snapshot-log"].append(
        {"snapshot-id": snapshot_id, "timestamp-ms": now})
    with open(os.path.join(meta_dir, f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(v + 1))
    return snapshot_id


def meta_schema_json(meta: dict) -> str:
    """The fixture metadata's current schema as manifest-header JSON."""
    sid = meta.get("current-schema-id", 0)
    doc = next(s for s in meta["schemas"] if s.get("schema-id", 0) == sid)
    return json.dumps(doc)


def write_iceberg_transform_fixture(spark, local_dir: str,
                                    n_rows: int = 48) -> dict:
    """A genuine Iceberg v2 table partitioned by HIDDEN transforms —
    ``year(orderdate)`` (the reference's own orders layout,
    iceberg_trino_sqldemo.sql:13) plus ``bucket[4](orderkey)`` — for the
    r12 transform-adoption path.

    Schema: orderkey long (id 1), orderdate date (id 2), total double
    (id 3).  Rows land in one data file per live (year, bucket) pair;
    partition tuples carry Iceberg's OWN encodings: years-since-1970
    ints and murmur3 bucket numbers (computed by the spec-vector-
    verified ``iceberg_bucket_value``).  Returns {"location",
    "recorded_location", "rows": [(orderkey, iso_date, total)],
    "n_files"}.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_trino_sql_demo_spark.sources.transforms import (
        iceberg_bucket_value,
    )

    av = _AvroJvm(spark)
    rec_loc = "s3://demo-warehouse/demo/adopt_transform_tbl"
    meta_dir = os.path.join(local_dir, "metadata")
    data_dir = os.path.join(local_dir, "data")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    from datetime import date as _date

    rows = []
    for k in range(1, n_rows + 1):
        d = _date(1994 + (k % 4), 1 + (k % 12), 1 + (k % 28))
        rows.append((k, d, float(k) * 10.5))
    groups: dict[tuple[int, int], list] = {}
    for r in rows:
        key = (r[1].year - 1970, iceberg_bucket_value(r[0], 4, "bigint"))
        groups.setdefault(key, []).append(r)

    part_avro = [
        {"name": "orderdate_year", "type": ["null", "int"],
         "field-id": 1000},
        {"name": "orderkey_bucket", "type": ["null", "int"],
         "field-id": 1001},
    ]
    entry_schema = av.parse(json.dumps(_manifest_entry_schema(part_avro)))
    snapshot_id = 777000111
    data_entries = []
    for i, ((yy, bb), grp) in enumerate(sorted(groups.items())):
        sub = f"orderdate_year={yy}/orderkey_bucket={bb}"
        os.makedirs(os.path.join(data_dir, sub), exist_ok=True)
        fname = f"{sub}/part-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
        fpath = os.path.join(data_dir, fname)
        pq.write_table(pa.table({
            "orderkey": pa.array([g[0] for g in grp], pa.int64()),
            "orderdate": pa.array([g[1] for g in grp], pa.date32()),
            "total": pa.array([g[2] for g in grp], pa.float64()),
        }), fpath)
        keys = [g[0] for g in grp]
        data_entries.append(json.dumps({
            "status": 1,
            "snapshot_id": _u("long", snapshot_id),
            "sequence_number": _u("long", 1),
            "file_sequence_number": _u("long", 1),
            "data_file": {
                "content": 0,
                "file_path": f"{rec_loc}/data/{fname}",
                "file_format": "PARQUET",
                "partition": {"orderdate_year": _u("int", yy),
                              "orderkey_bucket": _u("int", bb)},
                "record_count": len(grp),
                "file_size_in_bytes": os.path.getsize(fpath),
                "null_value_counts": _int_map_json([(1, 0)]),
                "lower_bounds": _int_map_json(
                    [(1, _bytes_json(_bound_long(min(keys))))]),
                "upper_bounds": _int_map_json(
                    [(1, _bytes_json(_bound_long(max(keys))))]),
            }}))

    spec_fields = [
        {"name": "orderdate_year", "transform": "year",
         "source-id": 2, "field-id": 1000},
        {"name": "orderkey_bucket", "transform": "bucket[4]",
         "source-id": 1, "field-id": 1001},
    ]
    schema_doc = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "orderkey", "required": False, "type": "long"},
        {"id": 2, "name": "orderdate", "required": False, "type": "date"},
        {"id": 3, "name": "total", "required": False, "type": "double"},
    ]}
    man_meta = {
        "schema": json.dumps(schema_doc),
        "partition-spec": json.dumps(spec_fields),
        "partition-spec-id": "0",
        "format-version": "2",
    }
    data_man = f"manifest-data-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, data_man), entry_schema,
                 data_entries, {**man_meta, "content": "data"},
                 deflate=True)

    ml_schema = av.parse(json.dumps(_MANIFEST_LIST_SCHEMA))
    ml_entries = [json.dumps({
        "manifest_path": f"{rec_loc}/metadata/{data_man}",
        "manifest_length":
            os.path.getsize(os.path.join(meta_dir, data_man)),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": 1,
        "min_sequence_number": 1,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(data_entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": n_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    })]
    ml_name = f"snap-{snapshot_id}-1-{uuid.uuid4().hex[:8]}.avro"
    av.write_ocf(os.path.join(meta_dir, ml_name), ml_schema, ml_entries,
                 {"format-version": "2"})

    now = int(time.time() * 1000)
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": rec_loc,
        "last-sequence-number": 1,
        "last-updated-ms": now,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [schema_doc],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 1001,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": 1,
            "timestamp-ms": now,
            "summary": {"operation": "append"},
            "manifest-list": f"{rec_loc}/metadata/{ml_name}",
            "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snapshot_id,
                          "timestamp-ms": now}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return {"location": local_dir, "recorded_location": rec_loc,
            "rows": [(k, d.isoformat(), v) for k, d, v in rows],
            "n_files": len(data_entries)}
