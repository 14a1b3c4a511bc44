"""Hidden-partitioning transforms (SURVEY.md §2.2 D5, §4).

The reference partitions tables by *derived* values — ``ARRAY['year(orderdate)']``
(iceberg_trino_sqldemo.sql:13) or identity ``ARRAY['mktsegment']`` (:21) — and
queries filter on the *source* column only (:15).  Pruning therefore needs
interval logic per transform: from a predicate on the source column, compute
the set of partition values that can contain matching rows.

Each transform provides:
- ``apply(col)``: the Spark Column expression used at write time;
- ``to_partition_value`` / ``from_string``: python-side evaluation used for
  manifest bookkeeping (partition values are parsed back from hive-style
  directory names);
- ``prune_interval(lo, hi)``: map a source-column interval to a partition-value
  interval (monotone transforms), or None when the transform is not
  order-preserving (bucket) — those only support equality pruning.

Everything here is engine-side planning: it runs on the driver over manifest
entries *before* ``spark.read`` is issued, so at 100 TB the executor never
opens a file whose partition value cannot match.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime, timezone
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = date(1970, 1, 1)

# ---------------------------------------------------------------------------
# Iceberg-compatible bucketing ("ibucket"): murmur3_x86_32(seed 0) over the
# Iceberg single-value hash encodings (spec Appendix B) — int/long/date/
# timestamp widen to a little-endian 8-byte long, strings hash their UTF-8
# bytes.  The engine's NATIVE bucket transform uses xxhash64, whose bucket
# numbers are incompatible with Iceberg's, so adopted foreign bucket specs
# carry through as ibucket: same bucket VALUES as the source wrote, pruning
# recomputed with the same hash.  The pure-Python implementation below is
# verified against the JVM's reference Murmur3_x86_32 and against the
# Iceberg spec's published test vectors (tests/test_iceberg_compat.py).
# ---------------------------------------------------------------------------

_MM_C1, _MM_C2 = 0xCC9E2D51, 0x1B873593
_U32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Reference murmur3 32-bit hash (signed int32 result)."""
    h = seed & _U32
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * _MM_C1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * _MM_C2) & _U32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _U32
        h = (h * 5 + 0xE6546B64) & _U32
    tail = data[n:]
    k = 0
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _MM_C1) & _U32
        k = ((k << 15) | (k >> 17)) & _U32
        k = (k * _MM_C2) & _U32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _U32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _U32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def iceberg_bucket_value(v: Any, n: int, src_type: str) -> int | None:
    """Iceberg ``bucket[n]`` of a literal: ``(murmur3 & int32max) % n``
    over the spec's hash encoding for ``src_type``.  None = this type
    isn't hashable here (caller must NOT prune on it)."""
    if v is None:
        return None
    import struct as _struct

    t = (src_type or "").lower()
    if t in ("int", "integer", "bigint", "long", "smallint", "tinyint"):
        raw = _struct.pack("<q", int(v))
    elif t == "date":
        raw = _struct.pack("<q", (_to_date(v) - _EPOCH).days)
    elif t == "timestamp":
        if isinstance(v, datetime):
            dt = v
        else:
            dt = datetime.fromisoformat(str(v))
        dt = dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
        # Floor division, NOT int(dt.timestamp())*1e6 + microsecond: the
        # latter truncates toward zero, so a pre-epoch fractional second
        # (1969-12-31T23:59:59.5Z) would encode +500000 instead of -500000
        # and the prune-path bucket would disagree with the write path's
        # unix_micros bucket (silently pruning the matching file).
        from datetime import timedelta as _td

        micros = (dt - datetime(1970, 1, 1, tzinfo=timezone.utc)) // _td(
            microseconds=1)
        raw = _struct.pack("<q", micros)
    elif t == "string":
        raw = str(v).encode("utf-8")
    else:
        return None
    return (murmur3_x86_32(raw) & 0x7FFFFFFF) % int(n)


def _mmh3_long_numpy(vals, seed: int = 0):
    """murmur3_x86_32(seed) of each int64's little-endian 8 bytes,
    fully vectorized in numpy uint32 arithmetic (unsigned wraparound is
    exactly the mod-2^32 the algorithm wants).  Returns a uint32 array.
    Cross-verified against Spark's own JVM murmur3 (``F.hash`` is the
    same algorithm at seed 42 for longs) and against the Iceberg spec's
    published seed-0 test vectors (tests/test_iceberg_compat.py).

    A pure-Column codegen formulation was tried first and rejected:
    without let-binding, every Column reuse copies its whole subtree,
    and the unrolled hash blows past janino's 64 KB method limit
    (Spark falls back to interpreted eval with ~1.5 MB task binaries).
    The Arrow-batched numpy kernel is the fast path here."""
    import numpy as np

    v = np.asarray(vals, dtype=np.uint64)
    c1 = np.uint32(_MM_C1)
    c2 = np.uint32(_MM_C2)
    h = np.full(v.shape, seed & _U32, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in ((v & np.uint64(_U32)).astype(np.uint32),
                  (v >> np.uint64(32)).astype(np.uint32)):
            k = k * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def _to_date(v: Any) -> date:
    if isinstance(v, datetime):
        return v.date()
    if isinstance(v, date):
        return v
    return date.fromisoformat(str(v)[:10])


@dataclass(frozen=True)
class Transform:
    """A named partition transform bound to a source column."""

    name: str  # 'identity' | 'year' | 'month' | 'day' | 'hour' | 'bucket' | 'truncate' | 'ibucket'
    source: str  # source column name
    param: int | None = None  # N for bucket[N]/ibucket[N], W for truncate[W]

    # -- write path -------------------------------------------------------
    def apply(self, col: Column, src_type: str | None = None) -> Column:
        if self.name == "identity":
            return col
        if self.name == "ibucket":
            # Iceberg-compatible murmur3 bucket (adopted foreign specs):
            # new engine writes must land in the SAME buckets the foreign
            # writer used, or per-file bucket pruning would lie.
            return self._ibucket_col(col, src_type)
        if self.name == "year":
            return F.year(col)
        if self.name == "month":
            # months since epoch: year*12+month-1 keeps
            # values ordered and prunable.
            return F.year(col) * 12 + F.month(col) - 1
        if self.name == "day":
            return F.datediff(F.to_date(col), F.lit("1970-01-01").cast("date"))
        if self.name == "hour":
            return (col.cast("long") / 3600).cast("long")
        if self.name == "bucket":
            return F.pmod(F.xxhash64(col), F.lit(self.param)).cast("int")
        if self.name == "truncate":
            return F.substring(col.cast("string"), 1, int(self.param or 1))
        raise ValueError(f"unknown transform {self.name}")

    def _ibucket_col(self, col: Column, src_type: str | None) -> Column:
        n = int(self.param or 1)
        t = (src_type or "").lower()
        fixed = t in ("int", "integer", "bigint", "long", "smallint",
                      "tinyint", "date", "timestamp")
        if not fixed and t != "string":
            raise ValueError(
                f"ibucket over source type {src_type!r} is not "
                "supported (int/bigint/date/timestamp/string)")
        if t == "date":
            pre = F.datediff(col, F.lit("1970-01-01").cast("date")).cast(
                "long")
        elif t == "timestamp":
            pre = F.unix_micros(col)
        elif fixed:
            pre = col.cast("long")
        else:
            pre = col
        # Arrow-batched pandas UDF, numpy-vectorized for the fixed-width
        # encodings (write path only — pruning recomputes driver-side via
        # iceberg_bucket_value, never through Spark)
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        if fixed:
            # Nulls are coalesced away SPARK-SIDE below (and restored with
            # F.when) so the Arrow batch is never nullable: a nullable int64
            # batch crosses Arrow->pandas as float64, and float64 cannot
            # represent longs beyond 2^53 (timestamp unix_micros ~1.7e18) —
            # the precision loss would hash into the wrong bucket before the
            # UDF could do anything about it.
            def _b(s):
                import numpy as np

                if not pd.api.types.is_integer_dtype(s.dtype):
                    # Defensive: should be unreachable (input is coalesced
                    # non-null long).  Exact per-value path — never round
                    # through float.
                    return s.map(
                        lambda x: None if pd.isna(x) else
                        (murmur3_x86_32(
                            int(x).to_bytes(8, "little", signed=True))
                         & 0x7FFFFFFF) % n)
                h = _mmh3_long_numpy(s.to_numpy(np.int64))
                return pd.Series(
                    ((h & np.uint32(0x7FFFFFFF)) % np.uint32(n))
                    .astype("int32"), index=s.index)
        else:
            def _b(s):
                return s.map(
                    lambda x: None if x is None else
                    (murmur3_x86_32(str(x).encode("utf-8"))
                     & 0x7FFFFFFF) % n)

        # real class objects (module-level `from __future__ import
        # annotations` would stringify inline hints)
        _b.__annotations__ = {"s": pd.Series, "return": pd.Series}
        if fixed:
            hashed = pandas_udf(_b, "int")(
                F.coalesce(pre, F.lit(0).cast("long")))
            return F.when(pre.isNull(),
                          F.lit(None).cast("int")).otherwise(hashed)
        return pandas_udf(_b, "int")(pre)

    # -- python-side evaluation (manifest bookkeeping / pruning) ----------
    def eval_py(self, v: Any):
        if v is None:
            return None
        if self.name == "identity":
            return v
        if self.name == "year":
            return _to_date(v).year
        if self.name == "month":
            d = _to_date(v)
            return d.year * 12 + d.month - 1
        if self.name == "day":
            return (_to_date(v) - _EPOCH).days
        if self.name == "hour":
            if isinstance(v, datetime):
                ts = v.replace(tzinfo=v.tzinfo or timezone.utc).timestamp()
            else:
                ts = datetime.fromisoformat(str(v)).replace(tzinfo=timezone.utc).timestamp()
            return int(ts // 3600)
        if self.name == "truncate":
            return str(v)[: int(self.param or 1)]
        if self.name == "bucket":
            # xxhash64 is JVM-side; python cannot recompute it — bucket
            # partition values are only read back from written directories,
            # never derived driver-side.
            raise NotImplementedError("bucket values come from written paths")
        if self.name == "ibucket":
            # pruning recomputes ibucket via iceberg_bucket_value with
            # the SOURCE type in hand (the encoding is type-directed);
            # a bare literal is ambiguous here
            raise NotImplementedError(
                "ibucket literals prune via iceberg_bucket_value")
        raise ValueError(self.name)

    @property
    def is_monotone(self) -> bool:
        return self.name in ("identity", "year", "month", "day", "hour", "truncate")

    def prune_interval(self, lo: Any, hi: Any) -> tuple[Any, Any] | None:
        """Map [lo, hi] on the source column to [lo', hi'] on the partition
        value.  None bound = unbounded.  Returns None if not prunable."""
        if not self.is_monotone:
            return None
        lo2 = self.eval_py(lo) if lo is not None else None
        hi2 = self.eval_py(hi) if hi is not None else None
        return (lo2, hi2)

    # -- naming / serialization ------------------------------------------
    @property
    def field_name(self) -> str:
        if self.name == "identity":
            return self.source
        if self.param is not None:
            return f"{self.source}_{self.name}_{self.param}"
        return f"{self.source}_{self.name}"

    def spec_string(self) -> str:
        """Round-trips through parse_transform (SHOW CREATE TABLE)."""
        if self.name == "identity":
            return self.source
        if self.name in ("bucket", "truncate", "ibucket"):
            return f"{self.name}({self.param}, {self.source})"
        return f"{self.name}({self.source})"


_FN_RE = re.compile(r"^\s*(\w+)\s*\(\s*(.+?)\s*\)\s*$")


def parse_transform(spec: str) -> Transform:
    """Parse one element of the Trino-style partitioning array.

    'mktsegment'            -> identity
    'year(orderdate)'       -> year transform       (reference :13)
    'bucket(16, custkey)'   -> hash bucket
    'truncate(4, name)'     -> prefix truncate
    """
    m = _FN_RE.match(spec)
    if not m:
        return Transform("identity", spec.strip())
    fn, arg = m.group(1).lower(), m.group(2)
    if fn in ("year", "month", "day", "date", "hour"):
        return Transform("day" if fn == "date" else fn, arg.strip())
    if fn in ("bucket", "truncate", "ibucket"):
        param_s, col = arg.split(",", 1)
        return Transform(fn, col.strip(), int(param_s.strip()))
    raise ValueError(f"unsupported partition transform: {spec!r}")
