"""Deletion-vector scaling harness (VERDICT r6/r7 #3).

The claim under test: MoR read cost grows with the NUMBER OF DELETE
COMMITS when position-delete files accumulate (every scan anti-joins the
union of all of them), and ``rewrite_position_deletes`` restores it to a
flat cost bounded by LIVE tombstones.

Builds a merge-on-read lineitem table, applies K one-commit deletes
(disjoint orderkey slices), and times the warm full read at each
accumulation point, before and after consolidation.  Writes the
"Deletion vectors" section of SCALING.md and prints one JSON line.

Run solo:  python scripts/dv_scaling.py
Env:       SPARK_GRAFT_DV_POINTS=4,16,64   (delete-commit counts)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = [
    int(x) for x in os.environ.get("SPARK_GRAFT_DV_POINTS", "4,16,64").split(",")
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
WARMUPS, REPS = 1, 3


def _warm_read_s(t) -> float:
    for _ in range(WARMUPS):
        t.df().count()
    t0 = time.perf_counter()
    for _ in range(REPS):
        t.df().count()
    return round((time.perf_counter() - t0) / REPS, 3)


def measure() -> list[dict]:
    from iceberg_trino_sql_demo_spark.session import get_spark
    from iceberg_trino_sql_demo_spark.sources.table import Table

    spark = get_spark("dv_scaling")
    loc = tempfile.mkdtemp(prefix="dvscale_")
    rows_out = []
    try:
        src = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        t = Table.ctas(
            spark, loc, src, properties={"merge_mode": "merge-on-read"}
        )
        base_rows = t.df().count()
        done = 0
        for k in sorted(POINTS):
            for i in range(done, k):
                # each commit tombstones one disjoint orderkey slice
                t.delete(f"l_orderkey % 997 = {i}")
            done = k
            man = t.io.read_manifest(t._resolve())
            n_del_files = len(
                [d for d in man.delete_files if d.content == "position"]
            )
            accumulated_s = _warm_read_s(t)
            t.rewrite_position_deletes()
            man = t.io.read_manifest(t._resolve())
            dv = [d for d in man.delete_files if d.content == "dv"]
            consolidated_s = _warm_read_s(t)
            rows_out.append(
                {
                    "delete_commits": k,
                    "accumulated_files": n_del_files,
                    "accumulated_read_s": accumulated_s,
                    "dv_tombstones": dv[0].record_count if dv else 0,
                    "consolidated_read_s": consolidated_s,
                    "rows": t.df().count(),
                }
            )
            print(f"  k={k}: {rows_out[-1]}", file=sys.stderr)
        assert rows_out[-1]["rows"] < base_rows
        return rows_out
    finally:
        spark.stop()
        shutil.rmtree(loc, ignore_errors=True)


SECTION = "## Deletion vectors (MoR read cost vs accumulated deletes)"


def write_md(rows: list[dict]) -> None:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    lines = [
        SECTION,
        "",
        "`scripts/dv_scaling.py` — merge-on-read lineitem (sf0.01), K",
        "one-commit deletes on disjoint orderkey slices.  *accumulated* =",
        "warm full-read seconds with K separate position-delete files",
        "(the anti-join unions all of them); *consolidated* = the same",
        "read after `rewrite_position_deletes` folded them into one",
        "deletion-vector pack (per-file zstd blobs + columnar index,",
        "`sources/deletion_vectors.py`).  The consolidated column is the",
        "maintenance steady state a long-running table keeps returning",
        "to; it must stay flat in K.",
        "",
        "| delete commits | delete files | accumulated read (s) | dv tombstones | consolidated read (s) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['delete_commits']} | {r['accumulated_files']} "
            f"| {r['accumulated_read_s']} | {r['dv_tombstones']:,} "
            f"| {r['consolidated_read_s']} |"
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


if __name__ == "__main__":
    rows = measure()
    write_md(rows)
    print(json.dumps({"metric": "deletion_vectors", "rows": rows}))
