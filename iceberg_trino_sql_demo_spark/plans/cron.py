"""5-field cron schedule evaluation for materialized-view refresh.

The reference stores ``refresh_schedule = '30 04 * * 0'`` on its MV
(`iceberg_trino_sqldemo.sql:57-59`) — Trino's Iceberg connector hands the
cron string to an external scheduler.  This engine has no daemon either
(SURVEY.md keeps a background scheduler out of scope), but the schedule is
now EVALUATED, not just stored: ``next_fire`` computes the next instant a
schedule matches, and ``Catalog.due_materialized_views`` reports which MVs
are overdue given their last refresh commit — exactly the primitive an
external ticker (cron, Airflow, a Structured Streaming trigger) needs to
drive ``refresh_materialized_view`` without understanding engine metadata.

Standard cron semantics: ``minute hour day-of-month month day-of-week``;
each field takes ``*``, numbers, ``a-b`` ranges, ``a,b,c`` lists and
``*/n`` / ``a-b/n`` steps; day-of-week 0-7 with both 0 and 7 = Sunday.
When BOTH day-of-month and day-of-week are restricted, a date matches if
EITHER does (the classic vixie-cron rule).
"""

from __future__ import annotations

from datetime import datetime, timedelta

_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 7))


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron step must be >= 1: {spec!r}")
        if part == "*":
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(part)
        if not (lo <= lo_p <= hi and lo <= hi_p <= hi and lo_p <= hi_p):
            raise ValueError(f"cron field out of range [{lo},{hi}]: {spec!r}")
        out.update(range(lo_p, hi_p + 1, step))
    return frozenset(out)


def parse_cron(expr: str) -> tuple[frozenset[int], ...]:
    """Validate and expand a 5-field cron expression into match sets
    (minutes, hours, days-of-month, months, days-of-week)."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron needs 5 fields, got {len(fields)}: {expr!r}")
    sets = tuple(
        _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)
    )
    # normalize Sunday: 7 -> 0
    dow = frozenset(0 if d == 7 else d for d in sets[4])
    return sets[:4] + (dow,)


def _day_matches(ts: datetime, dom: frozenset[int], month: frozenset[int],
                 dow: frozenset[int], dom_star: bool, dow_star: bool) -> bool:
    if ts.month not in month:
        return False
    # python weekday(): Monday=0..Sunday=6; cron: Sunday=0..Saturday=6
    cron_dow = (ts.weekday() + 1) % 7
    dom_ok, dow_ok = ts.day in dom, cron_dow in dow
    # vixie's exact test: when EITHER field carries the star flag (field
    # begins with '*' — a stepped '*/2' still sets it), both bitmaps must
    # match (AND); only when both are restricted does the classic OR apply.
    if dom_star or dow_star:
        return dom_ok and dow_ok
    return dom_ok or dow_ok


def next_fire(expr: str, after: datetime) -> datetime:
    """First instant strictly after ``after`` (minute resolution) matching
    the schedule.  Walks day-by-day with per-day minute scans — bounded by
    the 4-year cron periodicity (leap years), so it always terminates on a
    valid expression."""
    minutes, hours, dom, month, dow = parse_cron(expr)
    fields = expr.split()
    # vixie cron sets the star flag for any field BEGINNING with '*', so a
    # stepped field like '*/2' still counts as a star for the dom/dow OR rule
    dom_star = fields[2].startswith("*")
    dow_star = fields[4].startswith("*")
    cur = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    day = cur.date()
    for _ in range(366 * 4 + 2):
        ts0 = datetime(day.year, day.month, day.day)
        if _day_matches(ts0, dom, month, dow, dom_star, dow_star):
            start = cur if day == cur.date() else ts0
            for h in sorted(hours):
                for m in sorted(minutes):
                    cand = ts0.replace(hour=h, minute=m)
                    if cand >= start:
                        return cand
        day = day + timedelta(days=1)
    raise ValueError(f"no fire time within 4 years for {expr!r}")


def is_due(expr: str, last_refresh: datetime, now: datetime) -> bool:
    """True when at least one scheduled fire time lies in
    (last_refresh, now]."""
    return next_fire(expr, last_refresh) <= now
