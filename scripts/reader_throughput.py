"""Per-byte scan throughput: Python-DataSource (Arrow) reader vs the JVM
vectorized parquet reader (VERDICT r8 #2).

The round-8 scan routing gates on file COUNT only: above
``table._PYDS_SCAN_FILES`` live files an unpruned scan is planned through
the manifest-segment DataSource (executors read via pyarrow in Python
workers), below it through ``spark.read.parquet`` (JVM vectorized reader,
whole-stage codegen).  SCALING.md's file-count table used TINY files, so
launch cost dominated and the DataSource route won outright.  This script
measures the other extreme — FEW LARGE files, where launch is irrelevant
and raw per-byte throughput decides — at two query shapes:

  narrow  — SUM over one bigint column (JVM best case: column pruning +
            codegen aggregate; the Python route has no column pruning, so
            every byte crosses Arrow->JVM)
  wide    — COUNT + SUM over every column surviving a full projection
            (both routes materialize everything)

Writes the "Reader throughput (bytes-heavy scans)" section of SCALING.md
and prints one JSON line with MB/s per (route, shape).  The numbers feed
``table._PYDS_BYTE_PENALTY`` — the bytes-aware half of the scan-route
gate.

Run solo:  python scripts/reader_throughput.py
Env:       SPARK_GRAFT_TP_FILES=16  SPARK_GRAFT_TP_MB=96
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(os.environ.get("SPARK_GRAFT_TP_FILES", "16"))
MB_PER_FILE = int(os.environ.get("SPARK_GRAFT_TP_MB", "96"))
RUNS = 2


def build_table(spark, wh: str):
    """An engine table of N_FILES parquet files of ~MB_PER_FILE each —
    a lineitem-ish width (1 bigint key, 2 doubles, 1 date-as-string tag,
    1 ~64-char comment), ~110 B/row on disk."""
    from pyspark.sql import functions as F

    from iceberg_trino_sql_demo_spark.sources.catalog import Catalog

    rows_per_file = MB_PER_FILE * 1024 * 1024 // 110
    n = N_FILES * rows_per_file
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000 / 7.0).alias("v1"),
            (F.col("id") % 997 * 1.5).alias("v2"),
            F.concat(F.lit("tag_"), (F.col("id") % 84).cast("string")).alias("tag"),
            F.concat(
                F.lit("comment-padding-"),
                F.md5(F.col("id").cast("string")),
                F.lit("-"),
                F.md5((F.col("id") + 1).cast("string")),
            ).alias("comment"),
        )
        .repartition(N_FILES)
    )
    cat = Catalog(spark, wh)
    cat.create_schema("tp")
    cat.use("tp")
    t = cat.ctas("big", df)
    files = t._manifest(t._resolve()).data_files
    total = sum(f.file_size_bytes for f in files)
    print(
        f"built {len(files)} files, {total / 1e6:.0f} MB total "
        f"({total / len(files) / 1e6:.0f} MB/file)",
        file=sys.stderr,
    )
    return t, total


def time_route(t, route: str, shape: str) -> float:
    """Warm min-of-RUNS full-scan aggregate through one route."""
    from pyspark.sql import functions as F

    from iceberg_trino_sql_demo_spark.sources import table as tmod

    saved = tmod._PYDS_SCAN_FILES
    saved_pen = tmod._PYDS_BYTE_PENALTY
    tmod._PYDS_SCAN_FILES = 0 if route == "pyds" else 10**9
    tmod._PYDS_BYTE_PENALTY = 0.0  # isolate the route from the bytes gate
    try:
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            if shape == "narrow_proj":
                # declared projection (Table.df(columns=...)): the pyds
                # Arrow reader decodes ONE column instead of all five
                t.df(columns=["k"]).agg(F.sum("k")).collect()
            elif shape == "narrow":
                t.df().agg(F.sum("k")).collect()
            else:
                t.df().agg(
                    F.count("*"), F.sum("k"), F.sum("v1"), F.sum("v2"),
                    F.max("tag"), F.max("comment"),
                ).collect()
            best = min(best, time.perf_counter() - t0)
        return best
    finally:
        tmod._PYDS_SCAN_FILES = saved
        tmod._PYDS_BYTE_PENALTY = saved_pen


SECTION = "## Reader throughput (bytes-heavy scans)"


def write_md(rows: list[dict], nbytes: int) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    lines = [
        SECTION,
        "",
        "`scripts/reader_throughput.py` — the OTHER extreme from the",
        f"file-count table: {N_FILES} files x ~{MB_PER_FILE} MB",
        f"({nbytes / 1e9:.1f} GB total), warm min-of-{RUNS} full-scan",
        "aggregates.  *jvm* = `spark.read.parquet` (vectorized reader,",
        "column pruning, codegen); *pyds* = the manifest-segment Python",
        "DataSource (pyarrow read in Python workers, Arrow batches to the",
        "JVM).  *narrow* = SUM over one bigint with NO declared",
        "projection (the pyds reader decodes every byte — the Python",
        "DataSource API has no pruning hook); *narrow_proj* = the same",
        "query through `Table.df(columns=['k'])`, the r10 declared",
        "projection that reaches the Arrow reader; *wide* = aggregates",
        "over every column.  These MB/s feed `table._PYDS_BYTE_PENALTY`",
        "(kept calibrated to the WORST case, undeclared narrow) while",
        "`_pyds_bytes_ok` scales the byte estimate by the declared column",
        "fraction — so projected narrow scans route pyds again.",
        "",
        "| route | shape | wall (s) | MB/s |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['route']} | {r['shape']} | {r['wall_s']} | {r['mb_s']:,} |"
        )
    lines.append("")
    block = "\n".join(lines)
    text = open(path).read() if os.path.exists(path) else "# SCALING\n\n"
    if SECTION in text:
        start = text.index(SECTION)
        nxt = text.find("\n## ", start + len(SECTION))
        end = nxt + 1 if nxt != -1 else len(text)
        text = text[:start] + block + text[end:]
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)


def main() -> None:
    from iceberg_trino_sql_demo_spark.session import get_spark

    spark = get_spark("reader_throughput")
    wh = tempfile.mkdtemp(prefix="tp_wh_")
    try:
        t, nbytes = build_table(spark, wh)
        rows = []
        for route in ("jvm", "pyds"):
            for shape in ("narrow", "narrow_proj", "wide"):
                w = time_route(t, route, shape)
                rows.append(
                    {
                        "route": route,
                        "shape": shape,
                        "wall_s": round(w, 2),
                        "mb_s": int(nbytes / 1e6 / w),
                    }
                )
                print(f"  {route}/{shape}: {rows[-1]}", file=sys.stderr)
        write_md(rows, nbytes)
        print(json.dumps({"n_files": N_FILES, "bytes": nbytes, "rows": rows}))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
