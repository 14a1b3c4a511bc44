"""Z-order (Morton-curve) clustering expression for OPTIMIZE rewrites.

Multi-dimensional file clustering: each participating column is scaled to a
16-bit integer over its observed [min, max] range, and the scaled values'
bits are interleaved into one long sort key.  Files written in z-key ranges
then carry TIGHT parquet min/max footer stats on EVERY participating
column, so the manifest pruner (plans/pruning.py) can skip files for a
predicate on ANY of them — a single-column sort order only ever serves
predicates on its leading column.  This is the same trade Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')``
and Trino's clustered OPTIMIZE make; the reference demo's table-maintenance
surface (iceberg_trino_sqldemo.sql:263) exposes plain bin-packing only, so
this is the scale-path extension of V9.

Spark-first shape: the z key is ONE codegen'd integer expression
(shift/and/or chains — no UDF), clustering is a single
``repartitionByRange`` shuffle on that key (Spark samples range bounds, so
output files are evenly sized), and per-file ordering is a
``sortWithinPartitions`` that never crosses executors.  At 100 TB the
rewrite is embarrassingly parallel: every output task writes one file
group and the only global coordination is range-boundary sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; n_cols * _ZBITS must stay < 63 (signed long)
_ZBITS = 16

#: column types a z-order dimension may have (numeric + date/time — the
#: types with a meaningful linear scale AND parquet min/max footer stats)
_NUMERIC_PREFIXES = (
    "int", "bigint", "smallint", "tinyint", "long", "float", "double",
    "decimal", "date", "timestamp",
)


def zorderable(type_str: str) -> bool:
    return type_str.lower().startswith(_NUMERIC_PREFIXES)


def _as_double(name: str, type_str: str) -> Column:
    """Numeric view of a dimension column (dates/timestamps -> epoch
    units; NULLs handled later — they scale to bucket 0, which clusters
    them together at the curve origin like Iceberg's null-first order)."""
    t = type_str.lower()
    c = F.col(name)
    if t == "date":
        c = F.unix_date(c)
    elif t.startswith("timestamp"):
        c = F.unix_micros(c)
    return c.cast("double")


def scaled_dim(name: str, type_str: str, mn: float, mx: float) -> Column:
    """Scale a dimension to a long in [0, 2^_ZBITS).  Bounds come from one
    aggregate over the rewrite source (exactness affects clustering
    quality only, never results).  A constant column scales to 0."""
    top = (1 << _ZBITS) - 1
    span = float(mx) - float(mn)
    if not span > 0:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (_as_double(name, type_str) - F.lit(float(mn)))
        / F.lit(span)
        * F.lit(float(top))
    ).cast("long")
    return F.coalesce(
        F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), scaled)),
        F.lit(0).cast("long"),
    )


def interleave_bits(dims: list[Column]) -> Column:
    """Morton interleave: bit i of dimension d lands at position
    i * n_dims + d, so all dimensions contribute equally at every scale
    of the curve.  Pure shift/and/or chain — whole-stage-codegen'd."""
    n = len(dims)
    if n * _ZBITS >= 63:
        raise ValueError(f"z-order supports at most {62 // _ZBITS} columns")
    z = F.lit(0).cast("long")
    for bit in range(_ZBITS):
        for d, dim in enumerate(dims):
            piece = F.shiftright(dim, bit).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(piece, bit * n + d))
    return z


def zorder_cluster(
    src: DataFrame,
    cols: list[tuple[str, str]],
    n_files: int,
    prefix_cols: list[str] | None = None,
) -> DataFrame:
    """Cluster ``src`` into ``n_files`` z-key ranges, z-sorted within each.

    ``cols`` is [(name, type_str), ...].  The scaled dimensions are
    PROJECTED before the interleave so each 2-op scaling runs once per row
    (not once per bit), the range shuffle keys on the single z long, and
    the final projection drops the helper columns — a projection after a
    sort preserves row order, so file-internal clustering survives.

    ``prefix_cols`` (already-present column names) lead the range key and
    the within-partition sort: a partitioned table z-orders WITHIN each
    hidden partition — ranges of (partition, z) keep each task's rows in
    whole (partition, z-range) runs, so the writer's partitionBy splits
    them into per-partition files that are z-contiguous."""
    bounds_row = src.select(
        *[
            f
            for name, t in cols
            for f in (
                F.min(_as_double(name, t)).alias(f"mn_{name}"),
                F.max(_as_double(name, t)).alias(f"mx_{name}"),
            )
        ]
    ).first()
    dims = src
    dim_names = []
    for name, t in cols:
        mn, mx = bounds_row[f"mn_{name}"], bounds_row[f"mx_{name}"]
        dn = f"__zdim_{name}"
        dims = dims.withColumn(
            dn,
            scaled_dim(name, t, mn, mx)
            if mn is not None and mx is not None
            else F.lit(0).cast("long"),
        )
        dim_names.append(dn)
    keyed = dims.withColumn("__z", interleave_bits([F.col(d) for d in dim_names]))
    pref = list(prefix_cols or [])
    return (
        keyed.repartitionByRange(max(1, n_files), *pref, "__z")
        .sortWithinPartitions(*pref, "__z")
        .drop("__z", *dim_names)
    )
