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


def _to_date(v: Any) -> date:
    if isinstance(v, datetime):
        return v.date()
    if isinstance(v, date):
        return v
    return date.fromisoformat(str(v)[:10])


@dataclass(frozen=True)
class Transform:
    """A named partition transform bound to a source column."""

    name: str  # 'identity' | 'year' | 'month' | 'day' | 'hour' | 'bucket' | 'truncate'
    source: str  # source column name
    param: int | None = None  # N for bucket[N], W for truncate[W]

    # -- write path -------------------------------------------------------
    def apply(self, col: Column) -> Column:
        if self.name == "identity":
            return col
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
        if self.name in ("bucket", "truncate"):
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
    if fn in ("bucket", "truncate"):
        param_s, col = arg.split(",", 1)
        return Transform(fn, col.strip(), int(param_s.strip()))
    raise ValueError(f"unsupported partition transform: {spec!r}")
