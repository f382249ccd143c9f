"""Registry tier discipline (VERDICT r2 next-round #9; rotation
policy added r8 per VERDICT r7 #2).

The correctness driver scores only the FIRST 50 entries of
``all_queries()``; this test pins the ordering contract so a future
registration can't silently displace the rotation:

  * the flagship ``daily_top_titles`` leads (``entry()`` serves it),
  * the window is entirely oracle-backed,
  * ROTATION: no never-driver-scored oracle query sits past the window
    while a previously-scored one occupies a slot inside it — each
    round's window spends its slots on queries that have never had a
    hard driver-side CORRECTNESS row,
  * names are unique and every entry round-trips through
    ``__spark_entry__``'s queries()/oracle_sql() views.
"""

from __future__ import annotations

from wikistream_lakehouse_spark.queries import all_queries

SCORED_WINDOW = 50


def test_scored_window_rotation_discipline():
    from wikistream_lakehouse_spark.queries.registry import _DRIVER_SCORED

    qs = all_queries()
    names = list(qs)
    window = names[:SCORED_WINDOW]

    assert names[0] == "daily_top_titles", "flagship must lead"

    for n in window:
        assert qs[n].oracle is not None, (
            f"rows-only query {n!r} inside scored window"
        )

    # ROTATION (VERDICT r7 #2): slots go to never-driver-scored oracle
    # queries first. If any never-scored query sits PAST the window, no
    # previously-scored one (other than the flagship) may sit inside.
    never = [
        n for n, q in qs.items()
        if q.oracle is not None and n not in _DRIVER_SCORED
    ]
    displaced = [n for n in never if n not in window]
    if displaced:
        occupying = [
            n for n in window[1:] if n in _DRIVER_SCORED
        ]
        assert not occupying, (
            f"never-scored {displaced} pushed past the window while "
            f"previously-scored {occupying} occupy slots — rotate "
            "_DRIVER_SCORED (append this round's newly-scored names)"
        )


def test_rows_only_queries_sort_last():
    qs = all_queries()
    names = list(qs)
    rows_only = [n for n, q in qs.items() if q.oracle is None]
    assert rows_only, "expected some rows-only queries"
    first_rows_only = names.index(rows_only[0])
    # every entry after the first rows-only query is also rows-only
    tail = names[first_rows_only:]
    assert set(tail) == set(rows_only), (
        "oracle-backed query sorted after a rows-only query: "
        f"{sorted(set(tail) - set(rows_only))}"
    )


def test_entry_module_views_cover_registry():
    import __spark_entry__ as entry

    qs = all_queries()
    assert set(entry.queries()) == set(qs)
    oracles = entry.oracle_sql()
    assert set(oracles) == {n for n, q in qs.items() if q.oracle is not None}
    for n, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), n
