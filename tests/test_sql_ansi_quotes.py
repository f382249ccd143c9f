"""ANSI double-quoted identifiers on the catalog front door (VERDICT
r9 next #5 / ADVICE r9 low #2): ``catalog.sql`` rewrites ``"ident"``
spans to backtick quoting outside single-quoted literals, so the
reference's analyst SQL shape (README.md:99-110 — ``SELECT "user",
date(from_unixtime("timestamp")) … FROM "curated_table"``) names
columns and tables instead of aggregating string constants; the
``sql_script`` splitter tracks all three quote kinds so ``;``/``--``
inside any quoted span stay in their statement."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn
from wikistream_lakehouse_spark.lakehouse.catalog import _ansi_quotes


def test_ansi_quotes_unit():
    assert _ansi_quotes('SELECT "user" FROM t') == "SELECT `user` FROM t"
    # '' literal spans untouched, including embedded double quotes
    assert (
        _ansi_quotes("SELECT 'a \"b\" c', \"d\" FROM t")
        == "SELECT 'a \"b\" c', `d` FROM t"
    )
    # "" escape → one literal quote in the identifier
    assert _ansi_quotes('SELECT "we""ird" FROM t') == 'SELECT `we"ird` FROM t'
    # backtick spans pass through: re-application is idempotent
    s = "SELECT `already` FROM t"
    assert _ansi_quotes(s) == s
    assert _ansi_quotes(_ansi_quotes('SELECT "x" FROM t')) == (
        "SELECT `x` FROM t"
    )
    with pytest.raises(ValueError, match="unterminated"):
        _ansi_quotes('SELECT "oops FROM t')


@pytest.fixture()
def curated(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame(
            [(1001, "A", "u1"), (1002, "A", "u2"), (1003, "B", "u1")],
            "`timestamp` long, title string, `user` string",
        ),
        t,
    )
    catalog.register_table(spark, "curated", t)
    yield t
    catalog.unregister_table(spark, "curated")


def test_reference_readme_query_shape(spark, curated):
    """The README.md:101 shape: "user" and "timestamp" must aggregate
    the COLUMNS (2 distinct users), not a constant (1 group)."""
    df = catalog.sql(
        spark,
        'SELECT "user", count(*) AS edits, min("timestamp") AS first_ts '
        'FROM curated GROUP BY "user" ORDER BY edits DESC, "user"',
    )
    got = [(r["user"], r.edits, r.first_ts) for r in df.collect()]
    assert got == [("u1", 2, 1001), ("u2", 1, 1002)]


def test_quoted_table_name_resolves(spark, curated):
    """README.md:108 shape: SELECT * FROM "table_name"."""
    assert catalog.sql(spark, 'SELECT count(*) AS n FROM "curated"').first().n == 3


def test_literals_with_embedded_quotes_survive(spark, curated):
    df = catalog.sql(
        spark,
        "SELECT 'he said \"hi\"' AS s, \"user\" FROM curated LIMIT 1",
    )
    assert df.first().s == 'he said "hi"'
    assert df.columns == ["s", "user"]


def test_script_split_ignores_semicolon_in_double_quotes(spark, curated):
    catalog.sql(
        spark, 'CREATE VIEW oddcol AS SELECT "user" AS `u;x` FROM curated'
    )
    try:
        res = catalog.sql_script(
            spark,
            'SELECT "u;x" FROM oddcol LIMIT 1; SELECT 2 AS two',
        )
        assert len(res) == 2
        assert res[0].columns == ["u;x"]
        assert res[1].first().two == 2
    finally:
        catalog.sql(spark, "DROP VIEW oddcol")


def test_time_travel_grammar_inside_quoted_span_is_data(spark, curated):
    """A "-quoted span containing the time-travel grammar is a name,
    not a rewrite target (ADVICE r9 low #2) — reaching analysis with
    the span intact (unresolable column), never a rewrite error."""
    with pytest.raises(Exception) as ei:
        catalog.sql(
            spark,
            'SELECT "FROM curated VERSION AS OF 0" FROM curated',
        ).collect()
    assert "not a registered" not in str(ei.value)
