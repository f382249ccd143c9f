"""The keyword-tree statement router (VERDICT r12 #3): the leading
keywords pick exactly ONE handler, which then refuses loudly with the
verb named when the statement doesn't fit its grammar — no more silent
regex fallthrough turning every malformed statement into the generic
refusal (the bug class behind the r12 MV COUNT(DISTINCT) finding)."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def reg(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([(1, 1.0)], "k long, v double"), t
    )
    catalog.register_table(spark, "disp_t", t)
    yield t
    catalog.unregister_table(spark, "disp_t")


def test_leading_keywords_are_quote_aware():
    lk = catalog._leading_keywords
    assert lk("  delete from t where x=1")[:1] == ("DELETE",)
    assert lk("CREATE OR REPLACE TABLE t (a INT)") == (
        "CREATE", "OR", "REPLACE", "TABLE",
    )
    # a quoted identifier can never masquerade as a verb
    assert lk('"DELETE" from t') == ()
    assert lk("`MERGE` INTO t") == ()
    # punctuation ends keyword scanning
    assert lk("INSERT INTO t(k) VALUES (1)") == ("INSERT", "INTO")


def test_malformed_statements_refused_with_the_verb_named(spark, reg):
    cases = [
        ("DELETE FROM disp_t", "DELETE FROM"),  # no WHERE
        ("UPDATE disp_t SET v = 1", "UPDATE"),  # no WHERE
        ("INSERT INTO disp_t", "INSERT INTO"),  # no body
        ("OPTIMIZE", "OPTIMIZE"),  # no table
        ("VACUUM disp_t RETAIN", "VACUUM"),
        ("RESTORE disp_t", "RESTORE"),
        ("SHOW PARTITIONS", "SHOW PARTITIONS"),
        (
            "CREATE MATERIALIZED VIEW mv AS SELECT k FROM disp_t",
            "CREATE MATERIALIZED VIEW",  # no GROUP BY -> verb named
        ),
        ("ALTER TABLE disp_t FROB COLUMN k", "unsupported ALTER"),
    ]
    for stmt, needle in cases:
        with pytest.raises(ValueError, match=needle.replace("(", "\\(")):
            catalog.sql_dml(spark, stmt)


def test_unknown_verbs_keep_the_generic_refusal(spark, reg):
    for stmt in (
        "GRANT SELECT ON disp_t TO analyst",
        "FLUSH TABLES",
        "INSERT BETWEEN disp_t",  # known first word, unknown second
    ):
        with pytest.raises(ValueError, match="unsupported DML statement"):
            catalog.sql_dml(spark, stmt)


def test_every_dispatch_prefix_is_reachable_and_sorted():
    seen = set()
    last = None
    for prefix, handler in catalog._DISPATCH:
        assert prefix not in seen, f"duplicate prefix {prefix}"
        seen.add(prefix)
        if last is not None:
            assert len(prefix) <= last, "_DISPATCH not longest-first"
        last = len(prefix)
        assert callable(handler)
    # shadowing guard: a longer prefix must come before any shorter
    # prefix it extends (longest-match correctness)
    ordered = [p for p, _h in catalog._DISPATCH]
    for i, p in enumerate(ordered):
        for q in ordered[:i]:
            assert not (len(q) < len(p) and p[: len(q)] == q), (
                f"{q} would shadow {p}"
            )
