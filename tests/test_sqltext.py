"""The shared SQL scanner (lakehouse/sqltext.py — VERDICT r10 next
#8): span coverage, quote-aware statement splitting, ANSI-quote
rewriting, top-level splitting and balanced-paren scanning, each with
Hypothesis property tests over adversarial inputs (literals containing
``;``, ``--``, quotes-in-quotes, grammar keywords). Pure Python — no
SparkSession."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wikistream_lakehouse_spark.lakehouse import sqltext

# characters that exercise every branch: quote delimiters, separators,
# comment dashes, parens, keywords-ish letters, newlines
_ALPHA = "abSELECT';\"`--(),\n =[]"
texts = st.text(alphabet=_ALPHA, max_size=60)


# ---------------------------------------------------------------- spans

@given(texts)
@settings(max_examples=300, deadline=None)
def test_spans_cover_input_exactly(s):
    got = list(sqltext.spans(s))
    assert "".join(s[b:e] for _k, b, e in got) == s
    # spans are contiguous, non-empty, in order
    pos = 0
    for _k, b, e in got:
        assert b == pos and e > b
        pos = e


@given(texts)
@settings(max_examples=300, deadline=None)
def test_quote_spans_start_and_mostly_end_with_their_delimiter(s):
    for k, b, e in sqltext.spans(s):
        if k == "text":
            assert not any(q in s[b:e] for q in sqltext.QUOTES)
        else:
            assert s[b] == k


def test_doubled_quote_escapes_stay_in_span():
    [(k, b, e)] = list(sqltext.spans("'it''s'"))
    assert (k, b, e) == ("'", 0, 7)
    assert sqltext.unquote("'it''s'") == "it's"
    assert sqltext.unquote('"a""b"') == 'a"b'


def test_strict_refuses_unterminated():
    with pytest.raises(ValueError, match="unterminated"):
        list(sqltext.spans('SELECT "user FROM t', strict='"'))
    # tolerant by default: the open span runs to end-of-string
    kinds = [k for k, _b, _e in sqltext.spans('SELECT "user FROM t')]
    assert kinds == ["text", '"']


# ------------------------------------------------- statement splitting

def test_split_statements_semicolon_in_every_quote_kind():
    script = "SELECT ';' AS a; SELECT \"x;y\" FROM `t;u`; -- c;d\nSELECT 1"
    got = [s.strip() for s in sqltext.split_statements(script) if s.strip()]
    assert got == ["SELECT ';' AS a", 'SELECT "x;y" FROM `t;u`', "SELECT 1"]


def test_split_statements_comment_hides_semicolon_and_keeps_newline():
    got = sqltext.split_statements("SELECT 1 -- tail; not a split\n, 2;")
    assert got[0] == "SELECT 1 \n, 2"


def test_apostrophe_inside_comment_does_not_open_a_literal():
    # the bug a two-pass tokenizer invites: "reference's" in a comment
    # must not swallow the real literal on the next line
    script = "-- the reference's analyst block\nSELECT 'a;b' AS s; SELECT 2"
    got = [s.strip() for s in sqltext.split_statements(script) if s.strip()]
    assert got == ["SELECT 'a;b' AS s", "SELECT 2"]


@given(texts)
@settings(max_examples=300, deadline=None)
def test_spans_with_comments_cover_input_exactly(s):
    got = list(sqltext.spans(s, comments=True))
    assert "".join(s[b:e] for _k, b, e in got) == s
    for k, b, e in got:
        if k == "comment":
            assert s[b:b + 2] == "--" and "\n" not in s[b:e]


@given(st.lists(st.text(alphabet="ab '`\"()-", max_size=20), max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_statements_roundtrip_on_quote_free_parts(parts):
    # join well-formed statements (balance each part's quotes by
    # doubling them away) with ';' — the splitter must return them
    clean = [p.replace("'", "").replace('"', "").replace("`", "")
             .replace("-", "") for p in parts]
    script = ";".join(clean)
    assert sqltext.split_statements(script) == (clean if clean else [""])


@given(texts)
@settings(max_examples=300, deadline=None)
def test_split_statements_never_splits_inside_quotes(s):
    for stmt in sqltext.split_statements(s):
        # re-scanning a returned statement never finds a top-level ';'
        for k, b, e in sqltext.spans(stmt):
            if k == "text":
                assert ";" not in stmt[b:e]


# ------------------------------------------------------ ANSI rewriting

def test_ansi_quotes_reference_shape():
    # the reference's README query shape: "user" is an IDENTIFIER
    got = sqltext.ansi_quotes('SELECT "user", \'lit"eral\' FROM "t 1"')
    assert got == "SELECT `user`, 'lit\"eral' FROM `t 1`"


def test_ansi_quotes_escapes_and_embedded_backtick():
    assert sqltext.ansi_quotes('SELECT "a""b"') == "SELECT `a\"b`"
    assert sqltext.ansi_quotes('SELECT "a`b"') == "SELECT `a``b`"


@given(texts)
@settings(max_examples=300, deadline=None)
def test_ansi_quotes_fixed_point_when_no_double_quotes(s):
    if '"' in s:
        return
    assert sqltext.ansi_quotes(s) == s


@given(st.text(alphabet="ab '`;x", max_size=40))
@settings(max_examples=200, deadline=None)
def test_ansi_quotes_idempotent(s):
    # rewriting is stable under re-application (no " left after pass 1)
    once = sqltext.ansi_quotes(s)
    assert sqltext.ansi_quotes(once) == once


def test_ansi_quotes_unterminated_identifier_refuses():
    with pytest.raises(ValueError, match="unterminated"):
        sqltext.ansi_quotes('SELECT "user FROM t')


# --------------------------------------------------- top-level splits

def test_split_top_level_commas_in_calls_and_literals():
    got = sqltext.split_top_level("a = f(x, y), b = 'p,q', c = m[1, 2]")
    assert got == ["a = f(x, y)", "b = 'p,q'", "c = m[1, 2]"]


def test_split_top_level_backtick_identifiers_hide_parens():
    got = sqltext.split_top_level("`weird(col`, other")
    assert got == ["`weird(col`", "other"]


@given(st.lists(st.text(alphabet="ab x", min_size=1, max_size=8),
                min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_top_level_roundtrips_plain_lists(parts):
    parts = [p.strip() for p in parts if p.strip()]
    if not parts:
        return
    assert sqltext.split_top_level(", ".join(parts)) == parts


# ------------------------------------------------------ balanced scan

def test_scan_balanced_nested_and_quoted_parens():
    s = "(a, f(b, ')'), \"(c\") tail"
    end = sqltext.scan_balanced(s, 0)
    assert s[:end] == "(a, f(b, ')'), \"(c\")"


def test_scan_balanced_unbalanced_refuses():
    with pytest.raises(ValueError, match="unbalanced"):
        sqltext.scan_balanced("(a, (b)", 0)


@given(st.integers(min_value=0, max_value=6))
@settings(max_examples=50, deadline=None)
def test_scan_balanced_depth_n(depth):
    s = "(" * (depth + 1) + "x" + ")" * (depth + 1) + " rest"
    end = sqltext.scan_balanced(s, 0)
    assert s[:end] == "(" * (depth + 1) + "x" + ")" * (depth + 1)


# ------------------------------------------- catalog-facing behavior

def test_catalog_delegates_to_sqltext():
    from wikistream_lakehouse_spark.lakehouse import catalog

    assert catalog._ansi_quotes('SELECT "user"') == "SELECT `user`"
    assert catalog._split_top_level("a, f(b, c)") == ["a", "f(b, c)"]
    assert catalog._scan_balanced("(x)", 0) == 3
