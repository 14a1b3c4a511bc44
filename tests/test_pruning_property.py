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
    from iceberg_trino_sql_demo_spark.sources.bloom import bloom_hex, positions

    ks = [r[0] for r in rows]
    vs = [r[1] for r in rows if r[1] is not None]  # v is nullable
    ss = [r[2] for r in rows]
    # per-file blooms built from the true row values (exactly what
    # Table._enrich_blooms stores) — bloom pruning now participates in
    # the conservativeness property alongside min/max and partitions
    def _bloom(vals):
        return bloom_hex(p for v in vals for p in positions(v))

    return DataFile(
        path=f"/synthetic/f{idx}.parquet",
        spec_id=0,
        schema_id=0,
        partition={"k": ks[0]},
        record_count=len(rows),
        file_size_bytes=1024,
        stats={
            "1": {"min": min(ks), "max": max(ks), "nulls": 0,
                  "bloom": _bloom(ks)},
            "2": {
                "min": min(vs) if vs else None,
                "max": max(vs) if vs else None,
                "nulls": len(rows) - len(vs),
                "bloom": _bloom(vs),
            },
            "3": {"min": min(ss), "max": max(ss), "nulls": 0,
                  "bloom": _bloom(ss)},
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


# ---------------------------------------------------------------------------
# Transform pruning (year/month/day/truncate/identity): a predicate on the
# SOURCE column is mapped through the transform's interval logic; it must
# never drop a file containing a matching row.
# ---------------------------------------------------------------------------
from iceberg_trino_sql_demo_spark.sources.transforms import parse_transform  # noqa: E402

_T_SCHEMA = TableSchema(
    schema_id=0,
    fields=(
        NestedField(id=1, name="d", type="date"),
        NestedField(id=2, name="s", type="string"),
    ),
)


class _TMeta:
    def __init__(self, spec_str: str, field_name: str):
        self._spec = PartitionSpec(
            spec_id=0,
            fields=(SpecField(field_id=1000, source_id=1 if "d" in spec_str else 2,
                              transform=spec_str),),
        )
        self._fname = field_name

    def schema_by_id(self, _id):
        return _T_SCHEMA

    def spec_by_id(self, _id):
        return self._spec


_ALPHA = ["aa", "ab", "ba", "bb"]


@st.composite
def _t_manifest(draw):
    """(spec_str, files, rowsets): all rows of a file share the transform
    value (that is what hidden-partitioned writes guarantee)."""
    spec_str = draw(st.sampled_from(["year(d)", "month(d)", "day(d)", "d",
                                     "truncate(2, s)", "s"]))
    t = parse_transform(spec_str)
    n_files = draw(st.integers(2, 4))
    files, rowsets = [], []
    for i in range(n_files):
        if t.source == "d":
            y = draw(st.integers(1994, 1997))
            m = draw(st.integers(1, 12))
            day = draw(st.integers(1, 28))
            if t.name == "year":
                dates = [f"{y:04d}-{draw(st.integers(1,12)):02d}-{draw(st.integers(1,28)):02d}"
                         for _ in range(draw(st.integers(1, 3)))]
            elif t.name == "month":
                dates = [f"{y:04d}-{m:02d}-{draw(st.integers(1,28)):02d}"
                         for _ in range(draw(st.integers(1, 3)))]
            else:  # day or identity: all rows the same date
                dates = [f"{y:04d}-{m:02d}-{day:02d}"] * draw(st.integers(1, 3))
            rows = [(d_, draw(st.sampled_from(_ALPHA))) for d_ in dates]
            pv = t.eval_py(dates[0])
        else:
            prefix = draw(st.sampled_from(_ALPHA))
            strs = [prefix + draw(st.sampled_from(["", "x", "zz"]))
                    for _ in range(draw(st.integers(1, 3)))]
            if t.name == "identity":
                strs = [strs[0]] * len(strs)
            rows = [(f"1995-0{draw(st.integers(1,9))}-10", s_) for s_ in strs]
            pv = t.eval_py(strs[0])
        ds = [r[0] for r in rows]
        ss = [r[1] for r in rows]
        files.append(
            DataFile(
                path=f"/synthetic/t{i}.parquet",
                spec_id=0,
                schema_id=0,
                partition={t.field_name: pv},
                record_count=len(rows),
                file_size_bytes=1024,
                stats={
                    "1": {"min": min(ds), "max": max(ds), "nulls": 0},
                    "2": {"min": min(ss), "max": max(ss), "nulls": 0},
                },
                first_row_id=0,
                sequence_number=1,
                file_modified_ms=0,
            )
        )
        rowsets.append(rows)
    return spec_str, t.field_name, files, rowsets


@st.composite
def _t_atom(draw, col: str) -> str:
    if col == "d":
        y, m, day = draw(st.integers(1994, 1997)), draw(st.integers(1, 12)), draw(st.integers(1, 28))
        lit = f"DATE '{y:04d}-{m:02d}-{day:02d}'"
        shape = draw(st.sampled_from(["cmp", "between"]))
        if shape == "cmp":
            return f"d {draw(st.sampled_from(['=', '<', '<=', '>', '>=']))} {lit}"
        y2 = y + draw(st.integers(0, 1))
        return f"d BETWEEN {lit} AND DATE '{y2:04d}-12-28'"
    word = draw(st.sampled_from(_ALPHA + ["aax", "bbzz"]))
    shape = draw(st.sampled_from(["cmp", "in"]))
    if shape == "cmp":
        return f"s {draw(st.sampled_from(['=', '<', '>=']))} '{word}'"
    return f"s IN ('{word}', '{draw(st.sampled_from(_ALPHA))}')"


@st.composite
def _t_where(draw, col: str, depth: int = 1) -> str:
    if depth == 0 or draw(st.booleans()):
        return draw(_t_atom(col))
    kw = draw(st.sampled_from(["AND", "OR"]))
    return f"({draw(_t_where(col, depth - 1))}) {kw} ({draw(_t_where(col, depth - 1))})"


def _t_eval(where: str, row: tuple[str, str]) -> bool:
    d, s = row
    import re

    py = where
    py = re.sub(r"DATE '([^']+)'", r"'\1'", py)

    def _bt(m):
        return f"({m.group(1)} >= {m.group(2)} and {m.group(1)} <= {m.group(3)})"

    py = re.sub(r"(\w+) BETWEEN ('[^']+') AND ('[^']+')", _bt, py)
    py = re.sub(r"(\w+) IN \(([^)]*)\)", lambda m: f"({m.group(1)} in [{m.group(2)}])", py)
    py = py.replace(" AND ", " and ").replace(" OR ", " or ")
    py = re.sub(r"(?<![<>!=])=(?!=)", "==", py)
    return bool(eval(py, {}, {"d": d, "s": s}))  # noqa: S307


@given(_t_manifest(), st.data())
@settings(max_examples=300, deadline=None)
def test_transform_pruning_is_conservative(manifest, data):
    spec_str, field_name, files, rowsets = manifest
    col = "d" if "d" in spec_str else "s"
    where = data.draw(_t_where(col))
    preds = parse_simple_predicates(where)
    kept = {f.path for f in prune_files(files, _TMeta(spec_str, field_name), preds)}
    for f, rows in zip(files, rowsets):
        if any(_t_eval(where, r) for r in rows):
            assert f.path in kept, (spec_str, where, rows, preds)


def test_or_inside_string_literal_terminates():
    """Regression (found by the r10 PREPARE/EXECUTE fuzz): an OR inside a
    string literal made _parse_bool recurse on the identical string until
    RecursionError — `\\bOR\\b` search is not quote-aware.  Now the
    nested-OR branch only recurses on a quote-aware top-level split, and
    literal-embedded keywords parse conservatively (no predicates) or as
    the atoms they are."""
    from iceberg_trino_sql_demo_spark.plans.predicates import (
        parse_simple_predicates,
    )

    # the falsifying shape: doubled quotes + OR inside the literal
    preds = parse_simple_predicates("v <> '??' AND ((v = '''' OR ''1''=''1'))")
    assert isinstance(preds, list)  # terminated; content conservative
    # a literal that IS just an OR-bearing string parses as one atom
    p = parse_simple_predicates("v = 'a OR b'")
    assert len(p) == 1 and p[0].value == "a OR b"
    # real nested OR still parses
    p2 = parse_simple_predicates("k = 1 AND (v = 'x' OR v = 'y')")
    assert len(p2) == 2
