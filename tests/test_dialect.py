"""Trino-dialect frontend breadth (VERDICT r4 "What's missing" #1).

Each case is a Trino-dialect statement a reference-style user would
write, run through ``Engine.sql`` against testdata temp views, compared
value-for-value against an independent DuckDB statement of the same
meaning.  This pins the TRANSLATION (name renames, shape rewrites,
return-type fixes), not Spark itself.
"""

from __future__ import annotations

import tempfile

import pytest

from iceberg_trino_sql_demo_spark.engine import Engine
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_frames, duckdb_run

_VIEWS = ("orders", "lineitem", "customer", "documents", "events")


@pytest.fixture(scope="module")
def eng(spark):
    for name in _VIEWS:
        spark.read.parquet(f"{SF_ORACLE}/{name}.parquet").createOrReplaceTempView(name)
    return Engine(spark, tempfile.mkdtemp(prefix="dialect_wh_"))


def _check(eng, trino_sql: str, duck_sql: str) -> None:
    got = eng.sql(trino_sql).toPandas()
    want = duckdb_run(duck_sql, SF_ORACLE)
    problems = compare_frames(got, want)
    assert not problems, problems


# -- function translations --------------------------------------------------

def test_from_unixtime_returns_timestamp(eng):
    # Trino from_unixtime -> TIMESTAMP; Spark's same-named builtin returns
    # a STRING, so the rename to timestamp_seconds is a return-type fix
    _check(
        eng,
        "SELECT o_orderkey, from_unixtime(o_orderkey * 1000) AS ts "
        "FROM orders WHERE o_orderkey <= 5 ORDER BY o_orderkey",
        "SELECT o_orderkey, epoch_ms(o_orderkey * 1000 * 1000) AS ts "
        "FROM orders WHERE o_orderkey <= 5 ORDER BY o_orderkey",
    )


def test_split_literal_delimiter(eng):
    # Trino split('a.b.c', '.') treats '.' literally; an untranslated
    # Spark split would regex-match everything and return empty strings
    _check(
        eng,
        "SELECT o_orderkey, split('a.b.c', '.') AS parts "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT o_orderkey, ['a','b','c'] AS parts FROM orders WHERE o_orderkey = 1",
    )


def test_split_with_limit(eng):
    _check(
        eng,
        "SELECT split('a|b|c|d', '|', 2) AS parts "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT ['a', 'b|c|d'] AS parts FROM orders WHERE o_orderkey = 1",
    )


def test_hash_idiom_to_hex_md5_to_utf8(eng):
    # the canonical Trino row-hash idiom: lower(to_hex(md5(to_utf8(x))))
    _check(
        eng,
        "SELECT o_orderkey, lower(to_hex(md5(to_utf8(o_orderstatus)))) AS h "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
        "SELECT o_orderkey, md5(o_orderstatus) AS h "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
    )


def test_sha256_and_length_of_to_utf8(eng):
    _check(
        eng,
        "SELECT lower(to_hex(sha256(to_utf8('abc')))) AS h, "
        "length(to_utf8(o_orderstatus)) AS n "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT lower(sha256('abc')) AS h, "
        "CAST(octet_length(encode(o_orderstatus)) AS INT) AS n "
        "FROM orders WHERE o_orderkey = 1",
    )


def test_url_extract_family(eng):
    url = "'https://example.com:8443/path/doc?q=spark&lang=en#frag'"
    _check(
        eng,
        f"SELECT url_extract_host({url}) AS host, "
        f"url_extract_path({url}) AS path, "
        f"url_extract_protocol({url}) AS proto, "
        f"url_extract_port({url}) AS port, "
        f"url_extract_parameter({url}, 'lang') AS lang "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT 'example.com' AS host, '/path/doc' AS path, "
        "'https' AS proto, CAST(8443 AS BIGINT) AS port, 'en' AS lang",
    )


def test_lambda_matches_and_reduce(eng):
    # any_match/all_match/none_match -> exists/forall/NOT exists; reduce
    # needs no rename (Spark >= 3.5 ships reduce) — included to pin that
    _check(
        eng,
        "SELECT o_orderkey, "
        "any_match(sequence(1, o_orderkey), x -> x >= 3) AS has3, "
        "all_match(sequence(1, o_orderkey), x -> x < 10) AS all_small, "
        "none_match(sequence(1, o_orderkey), x -> x > 4) AS none_big, "
        "reduce(sequence(1, o_orderkey), CAST(0 AS BIGINT), (s, x) -> s + x, s -> s) AS tot "
        "FROM orders WHERE o_orderkey BETWEEN 1 AND 5 ORDER BY o_orderkey",
        "SELECT o_orderkey, "
        "len(list_filter(range(1, o_orderkey + 1), x -> x >= 3)) > 0 AS has3, "
        "len(list_filter(range(1, o_orderkey + 1), x -> x < 10)) = o_orderkey AS all_small, "
        "len(list_filter(range(1, o_orderkey + 1), x -> x > 4)) = 0 AS none_big, "
        "list_sum(range(1, o_orderkey + 1)) AS tot "
        "FROM orders WHERE o_orderkey BETWEEN 1 AND 5 ORDER BY o_orderkey",
    )


def test_contains_and_geometric_mean(eng):
    _check(
        eng,
        "SELECT contains(sequence(1, 5), CAST(o_orderkey AS BIGINT)) AS in5, "
        "round(geometric_mean(o_totalprice), 2) AS gm "
        "FROM orders WHERE o_orderkey <= 8 GROUP BY 1 ORDER BY 1",
        "SELECT list_contains(range(1, 6), o_orderkey) AS in5, "
        "round(exp(avg(ln(o_totalprice))), 2) AS gm "
        "FROM orders WHERE o_orderkey <= 8 GROUP BY 1 ORDER BY 1",
    )


def test_iso8601_and_last_day_of_month(eng):
    _check(
        eng,
        "SELECT from_iso8601_date('2024-02-10') AS d, "
        "last_day_of_month(from_iso8601_timestamp('2024-02-10T08:30:00')) AS eom "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT DATE '2024-02-10' AS d, DATE '2024-02-29' AS eom",
    )


def test_format_and_parse_datetime(eng):
    _check(
        eng,
        "SELECT format_datetime(parse_datetime('2024/03/05 07', 'yyyy/MM/dd HH'), "
        "'yyyy-MM-dd HH:mm') AS s FROM orders WHERE o_orderkey = 1",
        "SELECT '2024-03-05 07:00' AS s",
    )


def test_json_parse_and_extract(eng):
    _check(
        eng,
        "SELECT json_extract_scalar(props, '$.plan') AS plan, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1 ORDER BY 1",
        "SELECT props ->> '$.plan' AS plan, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1",
    )


def test_unnest_with_ordinality(eng):
    _check(
        eng,
        "SELECT o_orderkey, w, CAST(i AS BIGINT) AS i "
        "FROM orders CROSS JOIN UNNEST(split('x|y|z', '|')) "
        "WITH ORDINALITY AS u(w, i) "
        "WHERE o_orderkey = 1 ORDER BY i",
        "SELECT o_orderkey, t.w, CAST(t.i AS BIGINT) AS i FROM orders, "
        "(VALUES ('x', 1), ('y', 2), ('z', 3)) AS t(w, i) "
        "WHERE o_orderkey = 1 ORDER BY i",
    )


# -- statement shapes --------------------------------------------------------

def test_prepare_execute_deallocate(eng):
    eng.sql("PREPARE top_orders FROM "
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_orderkey <= ? ORDER BY o_totalprice DESC LIMIT ?")
    got = eng.sql("EXECUTE top_orders USING 50, 3").toPandas()
    want = duckdb_run(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey <= 50 ORDER BY o_totalprice DESC LIMIT 3", SF_ORACLE)
    assert not compare_frames(got, want)
    # missing USING on a parameterized statement is loud
    with pytest.raises(ValueError, match="USING"):
        eng.sql("EXECUTE top_orders")
    eng.sql("DEALLOCATE PREPARE top_orders")
    with pytest.raises(ValueError, match="not found"):
        eng.sql("EXECUTE top_orders USING 1, 1")


def test_execute_param_count_mismatch(eng):
    eng.sql("PREPARE one FROM SELECT ? AS x FROM orders WHERE o_orderkey = 1")
    with pytest.raises(ValueError, match="parameters"):
        eng.sql("EXECUTE one USING 1, 2")
    # a ? inside a string literal is content, not a parameter
    eng.sql("PREPARE q FROM SELECT '?' AS mark, ? AS x "
            "FROM orders WHERE o_orderkey = 1")
    got = eng.sql("EXECUTE q USING 7").toPandas()
    assert got.iloc[0]["mark"] == "?" and got.iloc[0]["x"] == 7


def test_describe_input_output(eng):
    eng.sql("PREPARE dsc FROM SELECT o_orderkey, o_orderstatus AS st, "
            "o_totalprice * 2 AS dbl FROM orders WHERE o_orderkey <= ? AND "
            "o_orderstatus = ?")
    inp = eng.sql("DESCRIBE INPUT dsc").collect()
    assert [r.position for r in inp] == [1, 2]
    out = {r.column_name: r.type for r in eng.sql("DESCRIBE OUTPUT dsc").collect()}
    assert out == {"o_orderkey": "bigint", "st": "string", "dbl": "double"}
    with pytest.raises(ValueError, match="not found"):
        eng.sql("DESCRIBE INPUT nope")


def test_show_session_and_reset(eng):
    eng.sql("SET SESSION query_max_run_time = '2h'")
    rows = {r["name"]: r["value"] for r in eng.sql("SHOW SESSION").collect()}
    assert rows.get("query_max_run_time") == "'2h'"
    eng.sql("RESET SESSION query_max_run_time")
    rows = {r["name"]: r["value"] for r in eng.sql("SHOW SESSION").collect()}
    assert "query_max_run_time" not in rows


def test_show_columns(eng, spark):
    eng.sql("CREATE SCHEMA dial")
    eng.sql("USE dial")
    eng.sql("CREATE TABLE tcols AS SELECT o_orderkey, o_orderstatus "
            "FROM orders WHERE o_orderkey <= 5")
    cols = [r[0] for r in eng.sql("SHOW COLUMNS FROM tcols").collect()]
    assert cols == ["o_orderkey", "o_orderstatus"]


def test_set_properties_and_bare_delete(eng, spark):
    eng.sql("CREATE SCHEMA props")
    eng.sql("USE props")
    eng.sql("CREATE TABLE pt AS SELECT o_orderkey FROM orders WHERE o_orderkey <= 9")
    eng.sql("ALTER TABLE pt SET PROPERTIES commit_retries = 7, gc_enabled = 'false'")
    t = eng.catalog.table("pt")
    assert t.meta.properties["commit_retries"] == "7"
    assert t.meta.properties["gc_enabled"] == "false"
    # Trino full-table DELETE (no WHERE) = truncate; history survives
    assert eng.sql("SELECT count(*) AS n FROM pt").collect()[0].n == 10
    eng.sql("DELETE FROM pt")
    assert eng.sql("SELECT count(*) AS n FROM pt").collect()[0].n == 0


# -- tier 3 -----------------------------------------------------------------

def test_regexp_extract_default_group_zero(eng):
    # Trino's 2-arg regexp_extract returns the WHOLE match (group 0);
    # Spark's 2-arg default is group 1 — the rewrite pins group 0
    _check(
        eng,
        "SELECT o_orderkey, regexp_extract(o_orderpriority, '[0-9]+-[A-Z]+') AS m "
        "FROM orders WHERE o_orderkey <= 5 ORDER BY o_orderkey",
        "SELECT o_orderkey, regexp_extract(o_orderpriority, '[0-9]+-[A-Z]+') AS m "
        "FROM orders WHERE o_orderkey <= 5 ORDER BY o_orderkey",
    )


def test_truncate_toward_zero(eng):
    _check(
        eng,
        "SELECT truncate(-3.7) AS a, truncate(2.9) AS b "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT CAST(trunc(-3.7) AS DOUBLE) AS a, CAST(trunc(2.9) AS DOUBLE) AS b "
        "FROM orders WHERE o_orderkey = 1",
    )


def test_to_base_from_base(eng):
    # Trino to_base emits lowercase digits (Spark conv uppercases);
    # from_base returns BIGINT (conv returns STRING)
    _check(
        eng,
        "SELECT to_base(255, 16) AS h, from_base('ff', 16) AS n "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT 'ff' AS h, CAST(255 AS BIGINT) AS n FROM orders WHERE o_orderkey = 1",
    )


def test_try_cast_idiom(eng):
    # TRY(CAST(x AS T)) -> TRY_CAST; non-numeric status yields NULL
    _check(
        eng,
        "SELECT o_orderkey, TRY(CAST(o_orderstatus AS INTEGER)) AS v "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
        "SELECT o_orderkey, TRY_CAST(o_orderstatus AS INTEGER) AS v "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
    )


def test_format_zip_repeat_bitcount(eng):
    _check(
        eng,
        "SELECT format('%s:%d', o_orderstatus, o_orderkey) AS f, "
        "cardinality(zip(ARRAY[1, 2, 3], ARRAY[4, 5, 6])) AS z, "
        "repeat(o_orderkey, 3) AS r, "
        "bit_count(o_orderkey, 64) AS b, "
        "element_at(ARRAY['x', 'y'], 2) AS e, "
        "map_values(MAP(ARRAY['a', 'b'], ARRAY[o_orderkey, o_orderkey + 1])) AS mv "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
        "SELECT format('{}:{}', o_orderstatus, o_orderkey) AS f, "
        "3 AS z, [o_orderkey, o_orderkey, o_orderkey] AS r, "
        "bit_count(o_orderkey) AS b, 'y' AS e, "
        "[o_orderkey, o_orderkey + 1] AS mv "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
    )


def test_map_agg_values(eng):
    # map_agg -> sorted map_from_entries; compare through map_values to
    # stay inside the canonicalizer's list handling
    _check(
        eng,
        "SELECT o_orderpriority, map_values(map_agg(o_orderkey, o_custkey)) AS v "
        "FROM orders WHERE o_orderkey <= 32 "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
        "SELECT o_orderpriority, list(o_custkey ORDER BY o_orderkey) AS v "
        "FROM orders WHERE o_orderkey <= 32 "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    )


def test_tablesample_bernoulli(eng):
    # sampling is nondeterministic — assert the translated statement runs
    # and returns a plausible subset (full scan = 1500 orders at sf0.01)
    n_all = eng.sql("SELECT count(*) AS n FROM orders").collect()[0].n
    n_sample = eng.sql(
        "SELECT count(*) AS n FROM orders TABLESAMPLE BERNOULLI(10)"
    ).collect()[0].n
    assert 0 <= n_sample < n_all


def test_comment_on_table_and_column(eng, spark):
    eng.sql("CREATE SCHEMA cmt")
    eng.sql("USE cmt")
    eng.sql("CREATE TABLE ct AS SELECT o_orderkey FROM orders WHERE o_orderkey <= 3")
    eng.sql("COMMENT ON TABLE ct IS 'it''s the fact table'")
    eng.sql("COMMENT ON COLUMN ct.o_orderkey IS 'primary key'")
    ddl = eng.catalog.table("ct")
    assert ddl.meta.properties["comment"] == "it's the fact table"
    show = eng.sql("SHOW CREATE TABLE ct").collect()[0][0]
    assert "COMMENT 'it''s the fact table'" in show
    assert "COMMENT 'primary key'" in show
    desc = {r.column: r.comment for r in eng.sql("DESCRIBE ct").collect()}
    assert desc["o_orderkey"] == "primary key"
    # comments survive the metadata round-trip (re-open from disk)
    from iceberg_trino_sql_demo_spark.sources.table import Table
    t2 = Table(spark, ddl.location)
    assert t2.meta.schema.field_by_name("o_orderkey").doc == "primary key"
    # IS NULL clears
    eng.sql("COMMENT ON TABLE ct IS NULL")
    assert "comment" not in eng.catalog.table("ct").meta.properties


def test_listagg_and_filter_clause_shared(eng):
    # Trino listagg WITHIN GROUP and FILTER (WHERE ...) parse natively in
    # Spark 4 — pinned here so a regression in the shared surface is loud
    _check(
        eng,
        "SELECT o_orderpriority AS pri, "
        "listagg(CAST(o_orderkey AS VARCHAR), ',') WITHIN GROUP (ORDER BY o_orderkey) AS keys, "
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f "
        "FROM orders WHERE o_orderkey <= 32 GROUP BY 1 ORDER BY 1",
        "SELECT o_orderpriority AS pri, "
        "string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys, "
        "count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f "
        "FROM orders WHERE o_orderkey <= 32 GROUP BY 1 ORDER BY 1",
    )


# -- dialect differential fuzz ----------------------------------------------
# The fixed dialect tests pin hand-picked translations; this property
# test walks the mapped function space itself.  Each strategy leaf emits
# a (trino_expr, duckdb_expr) PAIR of the same meaning; the Trino side
# runs through Engine.sql's rewriter, the DuckDB side natively — any
# translation drift (argument order, return type, case, 1-vs-0 basing)
# surfaces on inputs nobody hand-picked.  All generated expressions are
# deterministic (no float summation, single-op float math only).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def dialect_pair(draw):
    kind = draw(st.sampled_from(
        ["strpos", "hash", "codepoint", "dow", "doy", "date_add",
         "truncate", "to_base", "bitwise", "split_part", "from_base_rt",
         "any_match", "chr_rt", "ngrams", "regexp_del"]))
    if kind == "strpos":
        c = draw(st.sampled_from(["E", "-", "1", "Z"]))
        return (f"strpos(o_orderpriority, '{c}')",
                f"CAST(strpos(o_orderpriority, '{c}') AS BIGINT)")
    if kind == "hash":
        return ("lower(to_hex(md5(to_utf8(o_orderstatus))))",
                "md5(o_orderstatus)")
    if kind == "codepoint":
        i = draw(st.integers(min_value=1, max_value=3))
        return (f"codepoint(substr(o_orderpriority, {i}, 1))",
                f"ascii(substr(o_orderpriority, {i}, 1))")
    if kind == "dow":
        return ("day_of_week(o_orderdate)", "CAST(isodow(o_orderdate) AS INT)")
    if kind == "doy":
        return ("day_of_year(o_orderdate)", "CAST(dayofyear(o_orderdate) AS INT)")
    if kind == "date_add":
        n = draw(st.integers(min_value=-30, max_value=30))
        u = draw(st.sampled_from(["day", "hour"]))
        return (f"date_add('{u}', {n}, o_orderdate)",
                f"o_orderdate + INTERVAL ({n}) {u}")
    if kind == "truncate":
        k = draw(st.integers(min_value=2, max_value=9))
        return (f"truncate(o_totalprice / {k})",
                f"CAST(trunc(o_totalprice / {k}) AS DOUBLE)")
    if kind == "to_base":
        b, fmt = draw(st.sampled_from([(16, "%x"), (8, "%o")]))
        return (f"to_base(o_orderkey, {b})", f"printf('{fmt}', o_orderkey)")
    if kind == "bitwise":
        m = draw(st.integers(min_value=1, max_value=255))
        fn, op = draw(st.sampled_from(
            [("bitwise_and", "&"), ("bitwise_or", "|")]))
        return (f"{fn}(o_orderkey, {m})", f"o_orderkey {op} {m}")
    if kind == "split_part":
        i = draw(st.integers(min_value=1, max_value=2))
        return (f"split_part(o_orderpriority, '-', {i})",
                f"split_part(o_orderpriority, '-', {i})")
    if kind == "from_base_rt":
        b = draw(st.sampled_from([2, 8, 16]))
        return (f"from_base(to_base(o_orderkey, {b}), {b})", "o_orderkey")
    if kind == "chr_rt":
        # printable ASCII codepoints round-trip through chr/codepoint
        cp = draw(st.integers(min_value=33, max_value=126))
        return (f"codepoint(chr({cp} + 0 * o_orderkey))", f"CAST({cp} AS INT)")
    if kind == "ngrams":
        n = draw(st.integers(min_value=1, max_value=4))
        # gram count over a 3-token split: max(3 - n + 1, 1)
        return (f"cardinality(ngrams(split(o_orderpriority, '-'), {n}))",
                f"CAST(greatest(len(string_split(o_orderpriority, '-')) "
                f"- {n} + 1, 1) AS BIGINT)")
    if kind == "regexp_del":
        cls = draw(st.sampled_from(["[0-9]", "[A-Z]", "[-]"]))
        return (f"regexp_replace(o_orderpriority, '{cls}')",
                f"regexp_replace(o_orderpriority, '{cls}', '', 'g')")
    # any_match over a bounded sequence
    j = draw(st.integers(min_value=1, max_value=8))
    return (f"any_match(sequence(1, 5), x -> x > {j})",
            f"len(list_filter(range(1, 6), x -> x > {j})) > 0")


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=dialect_pair())
def test_dialect_translation_fuzz(eng, pair):
    trino_expr, duck_expr = pair
    _check(
        eng,
        f"SELECT o_orderkey, {trino_expr} AS v FROM orders "
        "WHERE o_orderkey <= 100 ORDER BY o_orderkey",
        f"SELECT o_orderkey, {duck_expr} AS v FROM orders "
        "WHERE o_orderkey <= 100 ORDER BY o_orderkey",
    )


def test_recursive_cte(eng):
    # Spark 4 ships WITH RECURSIVE (UNION ALL form).  Pin parity with
    # DuckDB on a terminating recursion: a per-priority order chain walk
    # (each step advances to the next-larger orderkey of the same
    # priority, bounded depth) — join + aggregate over the recursion.
    _check(
        eng,
        "WITH RECURSIVE r(n, s) AS ("
        "  SELECT 1, CAST(1 AS BIGINT)"
        "  UNION ALL SELECT n + 1, s + n + 1 FROM r WHERE n < 10"
        ") SELECT o_orderkey, r.n, r.s FROM orders JOIN r ON r.n = CAST(o_orderkey AS INT) "
        "WHERE o_orderkey <= 5 ORDER BY o_orderkey",
        "WITH RECURSIVE r(n, s) AS ("
        "  SELECT 1, CAST(1 AS BIGINT)"
        "  UNION ALL SELECT n + 1, s + n + 1 FROM r WHERE n < 10"
        ") SELECT o_orderkey, r.n, r.s FROM orders JOIN r ON r.n = o_orderkey "
        "WHERE o_orderkey <= 5 ORDER BY o_orderkey",
    )


# -- tier 4 -------------------------------------------------------------------

def test_ngrams_sliding_slices(eng):
    # Trino ngrams: max(len-n+1, 1) grams; short arrays yield ONE
    # (truncated) gram
    _check(
        eng,
        "SELECT o_orderkey, ngrams(ARRAY['a','b','c'], 2) AS g2, "
        "ngrams(ARRAY['a'], 3) AS g_short "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT o_orderkey, [['a','b'],['b','c']] AS g2, [['a']] AS g_short "
        "FROM orders WHERE o_orderkey = 1",
    )


def test_chr_and_infinity_nan(eng):
    _check(
        eng,
        "SELECT o_orderkey, chr(65 + CAST(o_orderkey AS INTEGER)) AS c, "
        "CASE WHEN o_orderkey > 0 THEN 0.0E0 ELSE infinity() END AS guard, "
        "is_nan(CASE WHEN o_orderkey > 0 THEN nan() ELSE 0.0E0 END) AS isn "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
        "SELECT o_orderkey, chr(CAST(65 + o_orderkey AS INTEGER)) AS c, "
        "CASE WHEN o_orderkey > 0 THEN CAST(0.0 AS DOUBLE) "
        "ELSE 'Infinity'::DOUBLE END AS guard, "
        "isnan(CASE WHEN o_orderkey > 0 THEN 'NaN'::DOUBLE "
        "ELSE CAST(0.0 AS DOUBLE) END) AS isn "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
    )


def test_regexp_replace_two_arg_deletes_all(eng):
    # Trino 2-arg regexp_replace deletes ALL matches; DuckDB needs the
    # explicit '' replacement AND the 'g' flag for the same semantics
    _check(
        eng,
        "SELECT o_orderpriority AS p, "
        "regexp_replace(o_orderpriority, '[0-9-]') AS alpha "
        "FROM orders WHERE o_orderkey = 1",
        "SELECT o_orderpriority AS p, "
        "regexp_replace(o_orderpriority, '[0-9-]', '', 'g') AS alpha "
        "FROM orders WHERE o_orderkey = 1",
    )


def test_reduce_with_finisher_shared(eng):
    # Trino reduce(array, state, input, output) parses natively in Spark 4
    # (same 4-arg higher-order form) — pinned as a no-rewrite dependency
    _check(
        eng,
        "SELECT o_orderkey, reduce(split(o_orderpriority, '-'), 0, "
        "(s, x) -> s + length(x), s -> s) AS total_len "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
        "SELECT o_orderkey, len(replace(o_orderpriority, '-', '')) AS total_len "
        "FROM orders WHERE o_orderkey <= 3 ORDER BY o_orderkey",
    )
