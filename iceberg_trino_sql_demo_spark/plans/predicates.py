"""Best-effort extraction of prunable predicates from a WHERE-expression
string (SURVEY.md §3.1 step 3).

The engine's DML/read API takes Spark SQL expression text (mirroring the
reference's WHERE clauses).  For manifest pruning we need the shapes real
filters actually take:

- ``custkey = 2001``                      (:129)
- ``custkey IN (2001,2002,2003)``         (:137)
- ``mktsegment='SQLENGINE'``              (:215)
- ``orderdate >= DATE '1992-11-01' AND orderdate < DATE '1993-01-01'`` (:15)
- ``orderdate BETWEEN DATE '1992-11-01' AND DATE '1992-12-31'``
- ``mktsegment = 'BUILDING' OR mktsegment = 'MACHINERY'`` (disjunctions
  prune to the UNION of each branch's file sets)

Splitting is paren- and quote-aware (an ``IN (...)`` list or a string
literal containing AND/OR must not be cut), and OR handling is recursive:
``a = 1 AND (b = 2 OR b = 3)`` prunes on both conjuncts.  Anything
unparsable yields NO predicates for that region — a top-level conjunct
that fails to parse is simply skipped (AND semantics: the others still
prune), while an un-parsable OR branch abandons the whole disjunction
(a disjunction only prunes if EVERY branch is understood).  The full
filter always still runs in Catalyst, so pruning stays correctness-neutral.
"""

from __future__ import annotations

import re

from iceberg_trino_sql_demo_spark.plans.pruning import Predicate

_LITERAL = r"""(?:DATE\s*'([^']*)'|TIMESTAMP\s*'([^']*)'|'([^']*)'|(-?\d+(?:\.\d+)?))"""
_SIMPLE = re.compile(
    rf"^\s*(\w+)\s*(>=|<=|!=|<>|=|<|>)\s*{_LITERAL}\s*$", re.IGNORECASE
)
_IN = re.compile(r"^\s*(\w+)\s+IN\s*\(([^)]*)\)\s*$", re.IGNORECASE)
_IS_NULL = re.compile(r"^\s*(\w+)\s+IS\s+(NOT\s+)?NULL\s*$", re.IGNORECASE)
_BETWEEN = re.compile(
    rf"(\w+)\s+BETWEEN\s+{_LITERAL}\s+AND\s+{_LITERAL}", re.IGNORECASE
)


def _lit(groups: tuple) -> object:
    date_v, ts_v, str_v, num_v = groups
    if date_v is not None:
        return date_v
    if ts_v is not None:
        return ts_v
    if str_v is not None:
        return str_v
    return float(num_v) if "." in num_v else int(num_v)


_QUOTED = re.compile(r"'[^']*'")
_MASKED = re.compile(r"'\x00(\d+)\x00'")


def _rewrite_between(where: str) -> str:
    """``col BETWEEN a AND b`` -> ``col >= a AND col <= b`` so the normal
    conjunction machinery (and the AND splitter) handle it.

    Quote-aware (ADVICE r2, medium): string literals are masked with
    placeholders before the regex substitution, so BETWEEN-looking text
    INSIDE a literal (``name = 'X BETWEEN 1 AND 2'``) is never rewritten —
    an in-place mutation of the literal would make min/max pruning compare
    against a value no row contains and silently drop matching files.
    Legitimate string-typed BETWEEN bounds still work: the placeholder is
    itself a quoted literal, carried through the rewrite and unmasked."""
    lits: list[str] = []

    def mask(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"'\x00{len(lits) - 1}\x00'"

    def sub(m: re.Match) -> str:
        lo_txt, hi_txt = _between_literals(m)
        return f"{m.group(1)} >= {lo_txt} AND {m.group(1)} <= {hi_txt}"

    masked = _QUOTED.sub(mask, where)
    rewritten = _BETWEEN.sub(sub, masked)
    return _MASKED.sub(lambda m: lits[int(m.group(1))], rewritten)


def _between_literals(m: re.Match) -> tuple[str, str]:
    """Source text of the two literals in a BETWEEN match."""
    lo = _lit(m.groups()[1:5])
    hi = _lit(m.groups()[5:9])

    def txt(v, is_date, is_ts):
        if is_date is not None:
            return f"DATE '{v}'"
        if is_ts is not None:
            return f"TIMESTAMP '{v}'"
        if isinstance(v, str):
            return f"'{v}'"
        return repr(v)

    return (
        txt(lo, m.group(2), m.group(3)),
        txt(hi, m.group(6), m.group(7)),
    )


def _split_top(s: str, kw: str) -> list[str]:
    """Split on the keyword at paren depth 0, outside string literals."""
    parts, depth, in_str, start, i = [], 0, False, 0, 0
    kw_re = re.compile(rf"\b{kw}\b", re.IGNORECASE)
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            i += 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0:
            m = kw_re.match(s, i)
            if m:
                parts.append(s[start:i])
                start = m.end()
                i = m.end()
                continue
        i += 1
    parts.append(s[start:])
    return parts


def _strip_parens(s: str) -> str:
    """Remove balanced outer parentheses: ``(a = 1 AND b = 2)`` -> inner."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, c in enumerate(s):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s  # outer parens don't span the whole string
        s = s[1:-1].strip()
    return s


def _parse_atom(part: str) -> Predicate | None:
    m = _SIMPLE.match(part)
    if m:
        op = m.group(2)
        if op == "<>":
            op = "!="
        return Predicate(m.group(1), op, _lit(m.groups()[2:]))
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
                    return None
        return Predicate(m.group(1), "in", vals)
    m = _IS_NULL.match(part)
    if m:
        return Predicate(m.group(1), "notnull" if m.group(2) else "isnull", None)
    return None


def parse_simple_predicates(where: str) -> list[Predicate]:
    # negation can invert any extraction — bail entirely, except the one
    # self-contained form we understand: IS NOT NULL
    if re.search(r"\bNOT\b(?!\s+NULL)", where, re.IGNORECASE):
        return []
    return _parse_bool(_rewrite_between(where))


def _parse_bool(expr: str) -> list[Predicate]:
    expr = _strip_parens(expr)
    disjuncts = _split_top(expr, "OR")
    if len(disjuncts) > 1:
        # a disjunction prunes only if EVERY branch is fully understood
        branches: list[list[Predicate]] = []
        for d in disjuncts:
            preds = _parse_bool(d)
            if not preds:
                return []
            branches.append(preds)
        return [Predicate("", "or", branches)]
    preds: list[Predicate] = []
    for part in _split_top(expr, "AND"):
        part = _strip_parens(part)
        atom = _parse_atom(part)
        if atom is not None:
            preds.append(atom)
            continue
        if part != expr and len(_split_top(part, "OR")) > 1:
            # nested (x OR y) conjunct.  Both guards are load-bearing:
            # `part != expr` guarantees the recursion shrinks (a single
            # unsplittable conjunct equals the whole expr and would loop
            # forever), and _split_top is QUOTE-AWARE where a bare
            # `\bOR\b` search is not — an OR inside a string literal
            # (`v = '... OR ...'`, found by the r10 PREPARE/EXECUTE
            # fuzz) recursed on the identical string until the stack
            # died.
            preds.extend(_parse_bool(part))
        # unknown conjunct: fine — the other conjuncts still prune (AND).
    return preds
