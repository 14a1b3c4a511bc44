"""Pure-Python reader for Apache Puffin files and Iceberg v3 deletion
vectors — the blob format Iceberg v3 stores position deletes in
(reference posture: ``iceberg_trino_sqldemo.sql:23`` creates the demo
table with ``format_version = 3``, so a real v3 source table carries
DVs, not parquet position-delete files).

Everything here is written to the PUBLIC specs:

- Puffin file format (iceberg.apache.org/puffin-spec): ``PFA1`` magic,
  blobs, then a footer of ``Magic | FooterPayload (JSON) |
  FooterPayloadSize (4 B LE) | Flags (4 B) | Magic``.
- ``deletion-vector-v1`` blob (Iceberg table spec v3): a 4-byte
  big-endian length of (magic + vector), the 4-byte magic ``D1 D3 3D
  D3``, the vector as a 64-bit roaring bitmap in "portable"
  serialization, and a big-endian CRC-32 of (magic + vector).
- 64-bit portable roaring (RoaringFormatSpec): u64 LE bucket count,
  then per bucket a u32 LE high key + a standard 32-bit roaring
  bitmap (cookie 12346/12347, array/bitmap/run containers).

The decoder is CI-verified against the REFERENCE Java implementation:
fixtures serialize their bitmaps with the JVM's own
``org.roaringbitmap.longlong.Roaring64NavigableMap.serializePortable``
(bundled with Spark), so a drift from the real format fails tests —
this is the same genuineness strategy as ``avro_ocf.py`` vs JVM Avro.
"""
from __future__ import annotations

import json
import struct
import zlib

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x3d\xd3"

#: 32-bit roaring serial cookies (RoaringFormatSpec)
_SERIAL_COOKIE = 12347           # with run containers
_SERIAL_COOKIE_NO_RUN = 12346    # without run containers
_NO_OFFSET_THRESHOLD = 4


class PuffinError(ValueError):
    pass


# ---------------------------------------------------------------------------
# roaring bitmap (portable) decoding
# ---------------------------------------------------------------------------

def _read_roaring32(buf: bytes, at: int) -> tuple[list[int], int]:
    """Decode one standard 32-bit roaring bitmap starting at ``at``;
    returns (sorted values, next offset)."""
    (cookie,) = struct.unpack_from("<I", buf, at)
    at += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[at:at + n_flag_bytes]
        at += n_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, at)
        at += 4
        run_flags = b""
        has_offsets = True
    else:
        raise PuffinError(f"unknown roaring cookie {cookie}")
    keys_cards = struct.unpack_from(f"<{2 * size}H", buf, at)
    at += 4 * size
    if has_offsets:
        at += 4 * size  # offset headers: sequential parse doesn't need them
    values: list[int] = []
    for i in range(size):
        key = keys_cards[2 * i] << 16
        card = keys_cards[2 * i + 1] + 1
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, at)
            at += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, at)
            at += 4 * n_runs
            for j in range(n_runs):
                start, length = runs[2 * j], runs[2 * j + 1]
                values.extend(key | v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, at)
            at += 2 * card
            values.extend(key | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, at)
            at += 8192
            for wi, w in enumerate(words):
                base = key | (wi << 6)
                while w:
                    low = w & -w
                    values.append(base | low.bit_length() - 1)
                    w ^= low
    return values, at


def read_portable_roaring64(buf: bytes, at: int = 0) -> list[int]:
    """Decode a 64-bit 'portable' roaring bitmap: u64 LE bucket count,
    then (u32 LE high key, 32-bit roaring) per bucket.  Returns sorted
    unsigned 64-bit values."""
    (n_buckets,) = struct.unpack_from("<Q", buf, at)
    at += 8
    out: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, at)
        at += 4
        vals, at = _read_roaring32(buf, at)
        out.extend((high << 32) | v for v in vals)
    return out


# ---------------------------------------------------------------------------
# deletion-vector-v1 blob
# ---------------------------------------------------------------------------

def read_deletion_vector_blob(raw: bytes) -> list[int]:
    """Parse one ``deletion-vector-v1`` blob (as addressed by the
    manifest's ``content_offset``/``content_size_in_bytes``) into the
    sorted list of deleted row positions.  Validates the length prefix,
    the DV magic and the CRC-32 — a corrupt vector silently yielding
    wrong deletes would be a data-loss bug, so every check refuses."""
    if len(raw) < 12:
        raise PuffinError(f"deletion vector blob too short ({len(raw)} B)")
    (body_len,) = struct.unpack_from(">I", raw, 0)
    if body_len + 8 != len(raw):
        raise PuffinError(
            f"deletion vector length prefix {body_len} inconsistent with "
            f"blob size {len(raw)} (expect prefix+8 == size)")
    body = raw[4:4 + body_len]
    (crc,) = struct.unpack_from(">I", raw, 4 + body_len)
    if body[:4] != DV_MAGIC:
        raise PuffinError(
            f"bad deletion-vector magic {body[:4]!r} (want {DV_MAGIC!r})")
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise PuffinError("deletion vector CRC-32 mismatch")
    return read_portable_roaring64(body, 4)


def read_deletion_vector(path: str, offset: int, size: int) -> list[int]:
    """Deleted positions for one DV manifest entry: read ``size`` bytes
    at ``offset`` in the Puffin file and parse the blob.  (Per spec,
    readers can address a DV straight from the manifest without parsing
    the Puffin footer.)"""
    return read_deletion_vector_blob(_read_dv_raw(path, offset, size))


def _read_dv_raw(path: str, offset: int, size: int) -> bytes:
    with open(path, "rb") as fh:
        head = fh.read(4)
        if head != PUFFIN_MAGIC:
            raise PuffinError(
                f"{path} is not a Puffin file (magic {head!r})")
        fh.seek(offset)
        raw = fh.read(size)
    if len(raw) != size:
        raise PuffinError(
            f"short read of DV blob at {offset}+{size} in {path}")
    return raw


# ---------------------------------------------------------------------------
# numpy fast path (r12) — same wire format, vectorized container decode.
# The pure-Python decoder above stays the REFERENCE implementation (it is
# the one verified against JVM-encoded fixtures); this sibling is
# cross-verified against it property-wise (tests/test_differential_fuzz)
# and used on the adoption hot path, where a 100 TB table's accumulated
# tombstones make per-value Python loops the bottleneck.
# ---------------------------------------------------------------------------

def _read_roaring32_np(buf: bytes, at: int):
    """Vectorized 32-bit roaring decode: (uint32 ndarray, next offset)."""
    import numpy as np

    (cookie,) = struct.unpack_from("<I", buf, at)
    at += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = buf[at:at + n_flag_bytes]
        at += n_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, at)
        at += 4
        run_flags = b""
        has_offsets = True
    else:
        raise PuffinError(f"unknown roaring cookie {cookie}")
    keys_cards = struct.unpack_from(f"<{2 * size}H", buf, at)
    at += 4 * size
    if has_offsets:
        at += 4 * size
    chunks = []
    for i in range(size):
        key = np.uint32(keys_cards[2 * i] << 16)
        card = keys_cards[2 * i + 1] + 1
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, at)
            at += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs,
                                 offset=at).reshape(-1, 2)
            at += 4 * n_runs
            # vectorized run expansion (no per-run python loop — a
            # container can hold thousands of short runs): value =
            # repeat(start) + (global index - repeat(cumulative start
            # offset of the run))
            lens = runs[:, 1].astype(np.int64) + 1
            total = int(lens.sum())
            starts_rep = np.repeat(runs[:, 0].astype(np.int64), lens)
            off_rep = np.repeat(np.cumsum(lens) - lens, lens)
            arr = (starts_rep + (np.arange(total) - off_rep)).astype(
                np.uint32)
            chunks.append(arr | key)
        elif card <= 4096:
            vals = np.frombuffer(buf, dtype="<u2", count=card,
                                 offset=at).astype(np.uint32)
            at += 2 * card
            chunks.append(vals | key)
        else:
            # 1024 u64 LE words; byte-sequential little-endian bit
            # order makes unpackbits' bit index the value index
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192,
                              offset=at), bitorder="little")
            at += 8192
            chunks.append(np.nonzero(bits)[0].astype(np.uint32) | key)
    out = (np.concatenate(chunks) if chunks
           else np.empty(0, dtype=np.uint32))
    return out, at


def read_portable_roaring64_np(buf: bytes, at: int = 0):
    """Vectorized portable-roaring64 decode -> ascending uint64
    ndarray (same traversal order as the reference decoder)."""
    import numpy as np

    (n_buckets,) = struct.unpack_from("<Q", buf, at)
    at += 8
    chunks = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, at)
        at += 4
        vals, at = _read_roaring32_np(buf, at)
        chunks.append(vals.astype(np.uint64) | np.uint64(high << 32))
    return (np.concatenate(chunks) if chunks
            else np.empty(0, dtype=np.uint64))


def read_deletion_vector_np(path: str, offset: int, size: int):
    """``read_deletion_vector`` returning an ascending uint64 ndarray —
    the adoption hot path (validation identical: length prefix, DV
    magic, CRC-32)."""
    raw = _read_dv_raw(path, offset, size)
    if len(raw) < 12:
        raise PuffinError(f"deletion vector blob too short ({len(raw)} B)")
    (body_len,) = struct.unpack_from(">I", raw, 0)
    if body_len + 8 != len(raw):
        raise PuffinError(
            f"deletion vector length prefix {body_len} inconsistent with "
            f"blob size {len(raw)} (expect prefix+8 == size)")
    body = raw[4:4 + body_len]
    (crc,) = struct.unpack_from(">I", raw, 4 + body_len)
    if body[:4] != DV_MAGIC:
        raise PuffinError(
            f"bad deletion-vector magic {body[:4]!r} (want {DV_MAGIC!r})")
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise PuffinError("deletion vector CRC-32 mismatch")
    return read_portable_roaring64_np(body, 4)


# ---------------------------------------------------------------------------
# puffin footer (validation / inspection path)
# ---------------------------------------------------------------------------

def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's footer JSON ({"blobs": [...], ...}).
    Handles both uncompressed footers and the spec's lz4 footer
    compression (flag bit 0 of byte 0: a single LZ4 FRAME, which
    pyarrow's bundled lz4 codec decodes — the frame header carries the
    decompressed size)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != PUFFIN_MAGIC or data[-4:] != PUFFIN_MAGIC:
        raise PuffinError(f"{path} lacks Puffin magic at head/tail")
    flags = data[-8:-4]
    (payload_size,) = struct.unpack_from("<I", data, len(data) - 12)
    start = len(data) - 12 - payload_size
    if data[start - 4:start] != PUFFIN_MAGIC:
        raise PuffinError("footer-start magic missing (corrupt footer)")
    payload = data[start:len(data) - 12]
    if flags[0] & 1:
        import pyarrow as pa

        codec = pa.Codec("lz4")
        if len(payload) >= 15 and payload[4] & 0x08:
            # frame header carries the content size: exact decompress
            (size,) = struct.unpack_from("<Q", payload, 6)
            payload = codec.decompress(payload, size, asbytes=True)
            return json.loads(payload.decode("utf-8"))
        # no content size in the frame: decompress into a generous
        # bound (lz4's max ratio is 255x; footers are KB-scale) — the
        # output is prefix-correct with zero padding, and raw_decode
        # stops exactly at the end of the footer's single JSON object
        bound = max(4096, len(payload) * 255)
        out = codec.decompress(payload, bound, asbytes=True)
        obj, _ = json.JSONDecoder().raw_decode(
            out.decode("utf-8", errors="replace"))
        return obj
    return json.loads(payload.decode("utf-8"))
