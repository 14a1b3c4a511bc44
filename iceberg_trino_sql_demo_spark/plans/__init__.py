"""Logical-plan helpers: predicate parsing, manifest pruning, cron."""


def final_plan_section(plan: str) -> str:
    """The FINAL-plan content of an ``AdaptiveSparkPlanExec`` tree string.

    ``toString`` prints both ``== Final Plan ==`` and ``== Initial Plan
    ==`` sections; plan invariants must only read the final one, else a
    rewritten-away SortMergeJoin still "appears" and every reused
    exchange double-counts.  Two subtleties (both r11 audit fixes):

    - a cached InMemoryRelation nested inside the final section prints
      its own (indented) marker pair, so cutting at the FIRST marker
      occurrence truncated the outer final plan mid-tree — the DSIR
      TakeOrderedAndProject cutoff lived in the chopped tail and was
      invisible to the audit;
    - that nested print carries its own Initial-Plan duplicate, which
      would double-count the cached subtree's exchanges if left in.

    So: walk lines, drop every ``+- == Initial Plan ==`` marker AND the
    deeper-indented block under it (tree indentation = leading run of
    spaces/colons), outer (column 0) and nested alike."""
    out: list[str] = []
    skip_indent: int | None = None
    for line in plan.splitlines(keepends=True):
        body = line.lstrip(" :")
        indent = len(line) - len(body)
        if skip_indent is not None:
            if body.strip() and indent <= skip_indent:
                skip_indent = None
            else:
                continue
        if body.startswith("+- == Initial Plan =="):
            skip_indent = indent
            continue
        out.append(line)
    return "".join(out)
