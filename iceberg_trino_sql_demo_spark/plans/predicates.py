"""Best-effort extraction of prunable predicates from a WHERE-expression
string (SURVEY.md §3.1 step 3).

The engine's DML/read API takes Spark SQL expression text (mirroring the
reference's WHERE clauses).  For manifest pruning we only need the simple
shapes the reference actually uses:

- ``custkey = 2001``                      (:129)
- ``custkey IN (2001,2002,2003)``         (:137)
- ``mktsegment='SQLENGINE'``              (:215)
- ``orderdate >= DATE '1992-11-01' AND orderdate < DATE '1993-01-01'`` (:15)

Anything unparsable yields NO predicates — pruning is skipped and the full
filter still runs in Catalyst, so this is correctness-neutral by design.
Only top-level AND conjunctions are considered (an OR could widen, never
narrow, the file set — we conservatively bail out).
"""

from __future__ import annotations

import re

from iceberg_trino_sql_demo_spark.plans.pruning import Predicate

_LITERAL = r"""(?:DATE\s*'([^']*)'|TIMESTAMP\s*'([^']*)'|'([^']*)'|(-?\d+(?:\.\d+)?))"""
_SIMPLE = re.compile(
    rf"^\s*(\w+)\s*(>=|<=|!=|<>|=|<|>)\s*{_LITERAL}\s*$", re.IGNORECASE
)
_IN = re.compile(rf"^\s*(\w+)\s+IN\s*\(([^)]*)\)\s*$", re.IGNORECASE)
_BETWEEN = re.compile(
    rf"^\s*(\w+)\s+BETWEEN\s+{_LITERAL}\s+AND\s+{_LITERAL}\s*$", re.IGNORECASE
)
_AND_SPLIT = re.compile(r"\bAND\b", re.IGNORECASE)


def _lit(groups: tuple) -> object:
    date_v, ts_v, str_v, num_v = groups
    if date_v is not None:
        return date_v
    if ts_v is not None:
        return ts_v
    if str_v is not None:
        return str_v
    return float(num_v) if "." in num_v else int(num_v)


def parse_simple_predicates(where: str) -> list[Predicate]:
    if re.search(r"\bOR\b|\(.*\bAND\b.*\)|\bNOT\b", where, re.IGNORECASE):
        # parenthesized/negated logic: don't attempt partial extraction
        if not _IN.match(where):
            return []
    preds: list[Predicate] = []
    for part in _AND_SPLIT.split(where):
        part = part.strip()
        m = _SIMPLE.match(part)
        if m:
            op = m.group(2)
            if op == "<>":
                op = "!="
            preds.append(Predicate(m.group(1), op, _lit(m.groups()[2:])))
            continue
        m = _IN.match(part)
        if m:
            vals = []
            for tok in m.group(2).split(","):
                tok = tok.strip()
                if tok.startswith("'") and tok.endswith("'"):
                    vals.append(tok[1:-1])
                else:
                    try:
                        vals.append(float(tok) if "." in tok else int(tok))
                    except ValueError:
                        return []
            preds.append(Predicate(m.group(1), "in", vals))
            continue
        m = _BETWEEN.match(part)
        if m:
            col = m.group(1)
            lo = _lit(m.groups()[1:5])
            hi = _lit(m.groups()[5:9])
            preds.append(Predicate(col, ">=", lo))
            preds.append(Predicate(col, "<=", hi))
            continue
        # unknown conjunct: fine — the other conjuncts still prune (AND).
    return preds
