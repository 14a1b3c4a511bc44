"""Deletion vectors — consolidated per-data-file position tombstones
(VERDICT r6/r7 #3; reference anchor: the DELETION VECTOR section of
iceberg_trino_sqldemo.sql:141-143 and Iceberg v3's per-file DVs).

Without maintenance, every MoR DELETE/UPDATE appends another
position-delete parquet; a long-running table pays a read-side anti-join
whose build side is the UNION of every accumulated file — O(delete
history), not O(live tombstones).  ``Table.rewrite_position_deletes``
consolidates the live position tombstones into ONE pack per commit:

- **pack** (``deletes/dv-<uuid>.bin``): per data file, the sorted distinct
  deleted positions as little-endian uint64, zstd-compressed, frames
  concatenated — one bitmap-style blob per file, like Iceberg's puffin DV
  blobs;
- **index** (``deletes/dv-<uuid>-index.parquet``): columnar
  ``(file_path, offset, length, count)`` — planning reads ONLY this (and
  only the columns it needs), never the pack;
- one ``DeleteFile(content="dv")`` manifest entry referencing both.

Read side (``reader.read_position_deletes``): affected files' index rows
become a slice-spec DataFrame; ``mapInPandas`` tasks open the pack,
decompress exactly their slices, and emit ``(__del_file, __del_pos)`` —
the same anti-join probe shape the raw position-delete path feeds, but
executor-side, scoped per file, and sized by LIVE tombstones regardless
of how many delete commits produced them.

Consolidation is distributed: positions group per file with
``applyInPandas`` (numpy unique + zstd per group); only the COMPRESSED
blobs return to the driver for concatenation (bounded by live-tombstone
bytes, e.g. ~1%% deletes on a 10^9-row table ≈ tens of MB compressed).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: pack blob codec — pyarrow's bundled zstd; count in the index gives the
#: exact decompressed size (count * 8 bytes of uint64)
_CODEC = "zstd"

#: tombstone-count gate below which the probe set materializes on the
#: driver (one local relation) instead of spawning a mapInPandas stage —
#: 100k rows is ~1.6 MB, far under any broadcast/driver concern, while a
#: python-worker stage has a measured ~0.4 s floor
_DRIVER_EXPAND_ROWS = 100_000


def _compress_positions(pdf) -> tuple[int, bytes]:
    """(count, blob) for one file's positions (dedup + sort + zstd)."""
    pos = np.unique(pdf["__del_pos"].to_numpy(dtype=np.int64))
    raw = pos.astype("<u8").tobytes()
    return len(pos), pa.compress(raw, codec=_CODEC, asbytes=True)


def write_dv_pack(
    location: str, matches: DataFrame
) -> tuple[str, str, int, tuple[str, ...]] | None:
    """Consolidate ``matches`` (__del_file URI, __del_pos) into one pack.

    Returns (pack_path, index_path, total_tombstones, referenced plain
    paths), or None when there is nothing to write.
    """
    import pandas as pd

    def _per_file(key, pdf):
        n, blob = _compress_positions(pdf)
        return pd.DataFrame(
            {"file_path": [key[0]], "count": [n], "blob": [blob]}
        )

    rows = (
        matches.repartition(F.col("__del_file"))
        .groupBy("__del_file")
        .applyInPandas(_per_file, "file_path string, count long, blob binary")
        .collect()
    )
    if not rows:
        return None
    rows.sort(key=lambda r: r["file_path"])
    ddir = os.path.join(location, "deletes")
    os.makedirs(ddir, exist_ok=True)
    stem = f"dv-{uuid.uuid4().hex[:16]}"
    pack_path = os.path.join(ddir, f"{stem}.bin")
    index_path = os.path.join(ddir, f"{stem}-index.parquet")
    offsets, lengths = [], []
    off = 0
    with open(pack_path, "wb") as fh:
        for r in rows:
            fh.write(r["blob"])
            offsets.append(off)
            lengths.append(len(r["blob"]))
            off += len(r["blob"])
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([r["file_path"] for r in rows], pa.string()),
                "offset": pa.array(offsets, pa.int64()),
                "length": pa.array(lengths, pa.int64()),
                "count": pa.array([r["count"] for r in rows], pa.int64()),
            }
        ),
        index_path,
    )
    total = sum(r["count"] for r in rows)
    refs = tuple(sorted(r["file_path"].replace("file:", "") for r in rows))
    return pack_path, index_path, total, refs


def read_dv_positions(
    spark: SparkSession, dv_entries: list, only_for: list[str] | None = None
) -> DataFrame:
    """(__del_file, __del_pos) rows the given DV entries tombstone,
    optionally scoped to ``only_for`` data paths (plain, un-URI'd).

    Planning touches only the columnar index; the pack is opened by
    executors, one seek+read per (file, slice).
    """
    import pandas as pd

    specs: list[tuple[str, str, int, int, int]] = []
    want = (
        {("file:" + p if p.startswith("/") else p) for p in only_for}
        if only_for is not None
        else None
    )
    for d in dv_entries:
        idx = pq.read_table(
            d.index_path, columns=["file_path", "offset", "length", "count"]
        )
        fps = idx.column("file_path").to_pylist()
        offs = idx.column("offset").to_pylist()
        lens = idx.column("length").to_pylist()
        cnts = idx.column("count").to_pylist()
        for fp, o, ln, c in zip(fps, offs, lens, cnts):
            if want is not None and fp not in want:
                continue
            specs.append((d.path, fp, o, ln, c))
    schema_out = "__del_file string, __del_pos long"
    if not specs:
        return spark.createDataFrame([], schema_out)
    total = sum(s[4] for s in specs)
    if total <= _DRIVER_EXPAND_ROWS:
        # small probe set: decompress driver-side and ship as a local
        # relation — a python-worker stage costs more than the data
        # (measured ~0.4 s floor vs <10 ms for a few thousand tombstones)
        files, poss = [], []
        for pack, fp, off, ln, cnt in specs:
            with open(pack, "rb") as fh:
                fh.seek(off)
                blob = fh.read(ln)
            raw = pa.decompress(
                blob, decompressed_size=cnt * 8, codec=_CODEC, asbytes=True
            )
            pos = np.frombuffer(raw, dtype="<u8")
            files.append(pa.array([fp] * len(pos), pa.string()))
            poss.append(pa.array(pos.astype(np.int64), pa.int64()))
        tbl = pa.table(
            {
                "__del_file": pa.concat_arrays(files),
                "__del_pos": pa.concat_arrays(poss),
            }
        )
        return spark.createDataFrame(tbl.to_pandas(), schema=schema_out)

    def _expand(batches):
        for pdf in batches:
            for pack, fp, off, ln, cnt in zip(
                pdf["pack"], pdf["file_path"], pdf["offset"],
                pdf["length"], pdf["count"],
            ):
                with open(pack, "rb") as fh:
                    fh.seek(int(off))
                    blob = fh.read(int(ln))
                raw = pa.decompress(
                    blob, decompressed_size=int(cnt) * 8, codec=_CODEC,
                    asbytes=True,
                )
                pos = np.frombuffer(raw, dtype="<u8").astype(np.int64)
                yield pd.DataFrame({"__del_file": fp, "__del_pos": pos})

    spec_df = spark.createDataFrame(
        specs, "pack string, file_path string, offset long, length long, count long"
    )
    # one slice per input row; repartition so expansion parallelizes even
    # when the index arrived as a single tiny in-memory partition
    n = min(len(specs), int(spark.conf.get("spark.sql.shuffle.partitions")))
    return spec_df.repartition(n).mapInPandas(_expand, schema_out)
