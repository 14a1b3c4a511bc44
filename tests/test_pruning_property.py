"""Property test: file pruning must be CONSERVATIVE — for any WHERE text
the parser understands (including OR / BETWEEN / nested conjunctions),
`prune_files` may never drop a file that contains a matching row.

The harness builds a tiny synthetic manifest of identity-partitioned files
with known row sets and footer min/max stats, evaluates the predicate text
row-by-row in pure Python, and asserts {files with matches} ⊆ {kept files}.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_trino_sql_demo_spark.plans.predicates import parse_simple_predicates
from iceberg_trino_sql_demo_spark.plans.pruning import prune_files
from iceberg_trino_sql_demo_spark.sources.metadata import (
    DataFile,
    NestedField,
    PartitionSpec,
    SpecField,
    TableSchema,
)

# --- synthetic table: k BIGINT (partition identity), v BIGINT, s VARCHAR ---

_SCHEMA = TableSchema(
    schema_id=0,
    fields=(
        NestedField(id=1, name="k", type="bigint"),
        NestedField(id=2, name="v", type="bigint"),
        NestedField(id=3, name="s", type="string"),
    ),
)
_SPEC = PartitionSpec(
    spec_id=0,
    fields=(SpecField(field_id=1000, source_id=1, transform="k"),),
)


class _Meta:
    """Just enough TableMetadata surface for prune_files."""

    def schema_by_id(self, _id):
        return _SCHEMA

    def spec_by_id(self, _id):
        return _SPEC


def _file(idx: int, rows: list[tuple[int, int, str]]) -> DataFile:
    ks = [r[0] for r in rows]
    vs = [r[1] for r in rows if r[1] is not None]  # v is nullable
    ss = [r[2] for r in rows]
    return DataFile(
        path=f"/synthetic/f{idx}.parquet",
        spec_id=0,
        schema_id=0,
        partition={"k": ks[0]},
        record_count=len(rows),
        file_size_bytes=1024,
        stats={
            "1": {"min": min(ks), "max": max(ks), "nulls": 0},
            "2": {
                "min": min(vs) if vs else None,
                "max": max(vs) if vs else None,
                "nulls": len(rows) - len(vs),
            },
            "3": {"min": min(ss), "max": max(ss), "nulls": 0},
        },
        first_row_id=0,
        sequence_number=1,
        file_modified_ms=0,
    )


_WORDS = ["alpha", "beta", "gamma", "delta"]


@st.composite
def _manifest(draw):
    """3-6 files, each one identity partition of k with 1-4 rows."""
    n_files = draw(st.integers(2, 5))
    files, rowsets = [], []
    for i in range(n_files):
        k = draw(st.integers(0, 4))
        rows = [
            (
                k,
                draw(st.one_of(st.none(), st.integers(0, 20))),
                draw(st.sampled_from(_WORDS)),
            )
            for _ in range(draw(st.integers(1, 4)))
        ]
        files.append(_file(i, rows))
        rowsets.append(rows)
    return files, rowsets


@st.composite
def _atom(draw) -> str:
    col = draw(st.sampled_from(["k", "v", "s"]))
    if col == "s":
        word = draw(st.sampled_from(_WORDS))
        op = draw(st.sampled_from(["=", "!=", "<", ">="]))
        return f"s {op} '{word}'"
    shape = draw(st.sampled_from(["cmp", "in", "between", "null"]))
    if shape == "null":
        return f"{col} IS {draw(st.sampled_from(['NULL', 'NOT NULL']))}"
    if shape == "cmp":
        op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
        return f"{col} {op} {draw(st.integers(0, 20))}"
    if shape == "in":
        vals = draw(st.lists(st.integers(0, 20), min_size=1, max_size=3))
        return f"{col} IN ({', '.join(map(str, vals))})"
    lo = draw(st.integers(0, 15))
    return f"{col} BETWEEN {lo} AND {lo + draw(st.integers(0, 8))}"


@st.composite
def _where(draw, depth: int = 2) -> str:
    if depth == 0 or draw(st.booleans()):
        return draw(_atom())
    kw = draw(st.sampled_from(["AND", "OR"]))
    a = draw(_where(depth=depth - 1))
    b = draw(_where(depth=depth - 1))
    return f"({a}) {kw} ({b})"


class _SqlNull:
    """SQL NULL for the reference evaluator: every comparison is falsy."""

    def __eq__(self, o):  # noqa: D105
        return False

    def __ne__(self, o):
        return False

    def __lt__(self, o):
        return False

    def __le__(self, o):
        return False

    def __gt__(self, o):
        return False

    def __ge__(self, o):
        return False

    def __hash__(self):
        return 0


def _eval_where(where: str, row: tuple[int, int, str]) -> bool:
    """Reference evaluation of the WHERE text in Python (same grammar the
    generator emits, so a dumb recursive eval suffices via eval())."""
    k, v, s = row
    py = where
    # desugar IS [NOT] NULL / BETWEEN / IN, then AND/OR/= into and/or/==
    import re

    py = re.sub(r"(\w+) IS NOT NULL", r"\1__notnull", py)
    py = re.sub(r"(\w+) IS NULL", r"\1__isnull", py)

    def _bt(m):
        return f"({m.group(1)} >= {m.group(2)} and {m.group(1)} <= {m.group(3)})"

    py = re.sub(r"(\w+) BETWEEN (\d+) AND (\d+)", _bt, py)
    py = re.sub(r"(\w+) IN \(([^)]*)\)", lambda m: f"({m.group(1)} in [{m.group(2)}])", py)
    py = py.replace(" AND ", " and ").replace(" OR ", " or ")
    py = re.sub(r"(?<![<>!=])=(?!=)", "==", py)
    env = {
        "k": k,
        "v": _SqlNull() if v is None else v,
        "s": s,
        "k__isnull": False,
        "k__notnull": True,
        "v__isnull": v is None,
        "v__notnull": v is not None,
        "s__isnull": False,
        "s__notnull": True,
    }
    return bool(eval(py, {}, env))  # noqa: S307 - test-local grammar


@given(_manifest(), _where())
@settings(max_examples=300, deadline=None)
def test_pruning_is_conservative(manifest, where):
    files, rowsets = manifest
    preds = parse_simple_predicates(where)  # may be [] — that keeps all
    kept = {f.path for f in prune_files(files, _Meta(), preds)}
    for f, rows in zip(files, rowsets):
        if any(_eval_where(where, r) for r in rows):
            assert f.path in kept, (where, rows, preds)
