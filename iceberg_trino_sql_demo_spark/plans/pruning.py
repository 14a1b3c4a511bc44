"""Engine-side scan pruning (SURVEY.md §4 — the one optimizer piece that is
ours, not Catalyst's).

Catalyst prunes partitions it knows about; our partition values live in the
manifest, keyed per-file with a per-file spec-id (partition evolution,
reference :193/:201 — old files keep their old layout).  So pruning runs on
the driver, over manifest entries, *before* ``spark.read`` is issued:

1. **hidden-transform partition pruning** — a predicate on the *source*
   column (the reference filters ``orderdate``, :15, never
   ``year(orderdate)``) is mapped through the transform's interval logic to
   a predicate on the partition value, evaluated against each file's
   partition tuple under that file's own spec;
2. **file skipping via footer min/max stats** — harvested at write time
   (writer.py), keyed by column id.

Both are conservative: any missing information keeps the file.  The same
predicates are *also* applied as a normal DataFrame filter, so pruning is
purely an optimization and can never change results.

At 100 TB this is the difference between listing 10M files and listing the
~0.1% a year-partition filter admits; the per-file work is dict lookups, and
a real deployment would push this loop into a Spark job over a parquet
manifest — the logic is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime
from typing import Any, Iterable

from iceberg_trino_sql_demo_spark.sources.metadata import DataFile, TableMetadata
from iceberg_trino_sql_demo_spark.sources.transforms import (
    Transform,
    iceberg_bucket_value,
    parse_transform,
)

Op = str  # '=' '<' '<=' '>' '>=' 'in' '!=' 'isnull' 'notnull' 'or'


@dataclass(frozen=True)
class Predicate:
    column: str  # '' for op='or'
    op: Op
    value: Any  # scalar; list for 'in'; list[list[Predicate]] for 'or'


def _norm(v: Any) -> Any:
    """Normalize to a comparable primitive (dates -> ISO strings, which sort
    identically; manifest stats store the same form)."""
    if isinstance(v, datetime):
        return v.isoformat(sep=" " if " " in str(v) else "T")
    if isinstance(v, date):
        return v.isoformat()
    return v


def _cmp_ok(lo: Any, hi: Any, op: Op, value: Any) -> bool:
    """Can a value x with lo <= x <= hi satisfy ``x op value``?  None bound =
    unknown -> True (conservative)."""
    value = _norm(value)
    try:
        if op == "=":
            return (lo is None or _norm(lo) <= value) and (hi is None or _norm(hi) >= value)
        if op == "<":
            return lo is None or _norm(lo) < value
        if op == "<=":
            return lo is None or _norm(lo) <= value
        if op == ">":
            return hi is None or _norm(hi) > value
        if op == ">=":
            return hi is None or _norm(hi) >= value
        if op == "in":
            return any(_cmp_ok(lo, hi, "=", v) for v in value)
        if op == "!=":
            # only a constant-valued range (lo == hi == value) proves
            # every row equals the literal -> no row can differ
            return not (
                lo is not None and hi is not None and _norm(lo) == _norm(hi) == value
            )
        return True  # unknown ops never prune a whole file
    except TypeError:
        return True  # incomparable types -> keep


_BUCKET_CACHE: dict[tuple, int] = {}


def bucket_of(spark, value: Any, n: int, src_type: str) -> int:
    """Bucket id of a literal under the write path's hash (xxhash64 % n).

    xxhash64 only exists JVM-side, so the planner asks Spark itself via a
    one-row local query (cached per literal) — the cost of one driver-local
    projection buys skipping every non-matching bucket's files.
    """
    key = (repr(value), n, src_type)
    if key not in _BUCKET_CACHE:
        lit = f"'{value}'" if isinstance(value, str) else repr(value)
        row = spark.sql(
            f"SELECT pmod(xxhash64(CAST({lit} AS {src_type})), {n})"
        ).head()
        _BUCKET_CACHE[key] = int(row[0])
    return _BUCKET_CACHE[key]


def _partition_ok(
    f: DataFile, meta: TableMetadata, pred: Predicate, spark=None
) -> bool:
    spec = meta.spec_by_id(f.spec_id)
    file_schema = meta.schema_by_id(f.schema_id)
    for sf in spec.fields:
        try:
            src = next(c for c in file_schema.fields if c.id == sf.source_id)
        except StopIteration:
            continue
        if src.name != pred.column:
            continue
        t = parse_transform(sf.transform)
        t = Transform(t.name, src.name, t.param)  # rebind to resolved source name
        pv = f.partition.get(t.field_name)
        if pv is None and t.field_name not in f.partition:
            continue  # value unknown -> cannot prune
        if t.name == "identity":
            if not _cmp_ok(pv, pv, pred.op, pred.value):
                return False
        elif t.is_monotone:
            if pred.op in ("=",):
                if pv != t.eval_py(pred.value):
                    return False
            elif pred.op == "in":
                if pv not in {t.eval_py(v) for v in pred.value}:
                    return False
            elif pred.op in ("<", "<="):
                tv = t.eval_py(pred.value)
                if tv is not None and pv is not None and pv > tv:
                    return False
            elif pred.op in (">", ">="):
                tv = t.eval_py(pred.value)
                if tv is not None and pv is not None and pv < tv:
                    return False
        elif t.name == "bucket" and spark is not None and pred.op in ("=", "in"):
            vals = pred.value if pred.op == "in" else [pred.value]
            buckets = {bucket_of(spark, v, int(t.param), src.type) for v in vals}
            if pv not in buckets:
                return False
        elif t.name == "ibucket" and pred.op in ("=", "in"):
            # adopted-foreign bucket spec: recompute the ICEBERG hash
            # (murmur3, spec Appendix B encodings) driver-side — no JVM
            # probe needed.  An unhashable literal type yields None ->
            # keep the file (never prune on unknown).
            vals = pred.value if pred.op == "in" else [pred.value]
            buckets = {iceberg_bucket_value(v, int(t.param), src.type)
                       for v in vals}
            if None not in buckets and pv not in buckets:
                return False
    return True


def _stats_ok(f: DataFile, meta: TableMetadata, pred: Predicate) -> bool:
    file_schema = meta.schema_by_id(f.schema_id)
    try:
        fld = file_schema.field_by_name(pred.column)
    except KeyError:
        return True  # column didn't exist in this file -> default value rows; keep
    st = f.stats.get(str(fld.id))
    if not st:
        return True
    if pred.op == "isnull":
        # footer null_count == 0 proves the file holds no NULLs
        return st.get("nulls") is None or st.get("nulls") > 0
    if pred.op == "notnull":
        # all-NULL file: null_count equals the row count
        return st.get("nulls") is None or st.get("nulls") < f.record_count
    # per-file bloom (sources/bloom.py, built when the table declares
    # bloom_filter_columns): "definitely absent" beats min/max for point
    # lookups on high-cardinality unclustered columns.  Probe only for
    # values whose canonical form is engine-stable; missing bloom or
    # unbloomable value falls through to min/max (conservative).
    bl = st.get("bloom")
    if bl:
        from iceberg_trino_sql_demo_spark.sources.bloom import bloomable, contains

        if pred.op == "=" and bloomable(pred.value):
            if not contains(bl, pred.value):
                return False
        elif pred.op == "in" and all(bloomable(v) for v in pred.value):
            if not any(contains(bl, v) for v in pred.value):
                return False
    return _cmp_ok(st.get("min"), st.get("max"), pred.op, pred.value)


def _pred_ok(f: DataFile, meta: TableMetadata, p: Predicate, spark=None) -> bool:
    """May ``f`` contain a row satisfying ``p``?  A disjunction keeps the
    file if ANY branch (itself a conjunction) could match — i.e. the pruned
    set is the union of the branches' file sets."""
    if p.op == "or":
        return any(
            all(_pred_ok(f, meta, q, spark) for q in branch) for branch in p.value
        )
    return _partition_ok(f, meta, p, spark) and _stats_ok(f, meta, p)


def prune_files(
    files: Iterable[DataFile],
    meta: TableMetadata,
    predicates: Iterable[Predicate],
    spark=None,
) -> list[DataFile]:
    """Files that may contain rows matching ALL predicates (AND semantics).
    ``spark`` enables bucket-transform equality pruning (JVM hash probe)."""
    preds = list(predicates)
    return [
        f for f in files if all(_pred_ok(f, meta, p, spark) for p in preds)
    ]
