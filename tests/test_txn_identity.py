"""Identity columns (txn.set_identity_column): GENERATED ALWAYS /
BY DEFAULT AS IDENTITY — the engine allocates unique BIGINT values on
the append path with no coordination beyond the commit log (the Delta
identity-column contract: uniqueness and step-congruence guaranteed,
density NOT — gaps arise from parallelism and retried transactions).

Reference parity note: the reference's serving store relies on Postgres
for key generation (upsert_athena_aggregates.py:95-109 PRIMARY KEY); an
engine-native identity column is the lakehouse answer.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from wikistream_lakehouse_spark.lakehouse import txn


def _df(spark, rows, schema="name string, qty long"):
    return spark.createDataFrame(rows, schema)


def _ids(spark, t):
    return [r.id for r in txn.read_table(spark, t).select("id").collect()]


def test_allocation_unique_congruent_and_monotone_across_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    first = set(_ids(spark, t))
    assert len(first) == 3
    assert all(i >= 1 for i in first)
    txn.append(_df(spark, [("d", 4), ("e", 5)]), t)
    allv = _ids(spark, t)
    assert len(set(allv)) == 5  # unique across commits
    second = set(allv) - first
    assert min(second) > max(first)  # strictly beyond the earlier batch


def test_start_and_step_are_honored(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", start=100, step=10)
    txn.append(_df(spark, [("a", 1), ("b", 2)]), t)
    ids = set(_ids(spark, t))
    assert all(i >= 100 and (i - 100) % 10 == 0 for i in ids)
    assert len(ids) == 2


def test_negative_step_descends(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", start=0, step=-1)
    txn.append(_df(spark, [("a", 1)]), t)
    txn.append(_df(spark, [("b", 2)]), t)
    ids = _ids(spark, t)
    assert len(set(ids)) == 2
    assert all(i <= 0 for i in ids)
    assert txn.identity_high_water(t, "id") == min(ids)


def test_always_refuses_explicit_values_nothing_leaks(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=True)
    txn.append(_df(spark, [("a", 1)]), t)
    bad = spark.createDataFrame([(99, "x", 1)], "id long, name string, qty long")
    with pytest.raises(txn.ConstraintViolation, match="ALWAYS AS IDENTITY"):
        txn.append(bad, t)
    assert txn.read_table(spark, t).count() == 1


def test_by_default_accepts_values_and_folds_the_mark(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=False)
    supplied = spark.createDataFrame(
        [(500, "a", 1), (501, "b", 2)], "id long, name string, qty long"
    )
    txn.append(supplied, t)
    assert txn.identity_high_water(t, "id") == 501
    txn.append(_df(spark, [("c", 3)]), t)  # engine-assigned, omitted col
    ids = _ids(spark, t)
    assert len(set(ids)) == 3
    assert max(ids) > 501  # allocation resumed beyond the supplied max


def test_declaring_over_existing_column_seeds_from_its_extreme(spark, tmp_path):
    t = str(tmp_path / "t")
    pre = spark.createDataFrame(
        [(7, "a", 1), (12, "b", 2)], "id long, name string, qty long"
    )
    txn.append(pre, t)
    txn.set_identity_column(spark, t, "id")
    assert txn.identity_high_water(t, "id") == 12
    txn.append(_df(spark, [("c", 3)]), t)
    assert min(set(_ids(spark, t)) - {7, 12}) > 12


def test_declaring_over_missing_or_non_integral_column_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [("a", 1)]), t)
    with pytest.raises(ValueError, match="does not exist"):
        txn.set_identity_column(spark, t, "id")
    with pytest.raises(ValueError, match="integral"):
        txn.set_identity_column(spark, t, "name")
    with pytest.raises(ValueError, match="non-zero"):
        txn.set_identity_column(spark, t, "qty", step=0)


def test_generated_and_partition_column_collisions_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_generated_column(spark, t, "g", "qty * 2")
    with pytest.raises(ValueError, match="expression-generated"):
        txn.set_identity_column(spark, t, "g")
    t2 = str(tmp_path / "t2")
    txn.append(
        spark.createDataFrame([("a", 1, "x")], "name string, qty long, p string"),
        t2,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition column"):
        txn.set_identity_column(spark, t2, "p")


def test_rename_of_identity_column_refused_until_dropped(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("a", 1)]), t)
    with pytest.raises(ValueError, match="identity column"):
        txn.rename_column(spark, t, "id", "rid")
    txn.drop_identity_column(t, "id")
    txn.rename_column(spark, t, "id", "rid")
    assert "rid" in txn.read_table(spark, t).columns


def test_drop_identity_makes_the_column_writer_supplied_again(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("a", 1)]), t)
    txn.drop_identity_column(t, "id")
    # omitting the column is now a plain schema mismatch
    with pytest.raises(ValueError, match="schema mismatch"):
        txn.append(_df(spark, [("b", 2)]), t)
    explicit = spark.createDataFrame(
        [(999, "b", 2)], "id long, name string, qty long"
    )
    txn.append(explicit, t)
    assert 999 in _ids(spark, t)


def test_concurrent_appends_allocate_disjoint_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("seed", 0)]), t)

    def one(i):
        txn.append(
            _df(spark, [(f"w{i}-{j}", j) for j in range(5)]), t
        )

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, range(4)))
    ids = _ids(spark, t)
    assert len(ids) == 21
    assert len(set(ids)) == 21  # no collisions across racing allocators


def test_mark_survives_checkpoint_and_log_cleanup(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("a", 1), ("b", 2)]), t)
    hi = max(_ids(spark, t))
    txn.checkpoint(t)
    txn.cleanup_log(t)
    assert txn.identity_columns(t) == {
        "id": {"start": 1, "step": 1, "always": True}
    }
    assert txn.identity_high_water(t, "id") == hi
    txn.append(_df(spark, [("c", 3)]), t)
    ids = _ids(spark, t)
    assert len(set(ids)) == 3
    assert max(ids) > hi


def test_clone_carries_declaration_and_mark(spark, tmp_path):
    t, c = str(tmp_path / "t"), str(tmp_path / "c")
    txn.set_identity_column(spark, t, "id", start=10, step=5)
    txn.append(_df(spark, [("a", 1)]), t)
    hi = max(_ids(spark, t))
    txn.clone_table(t, c)
    assert txn.identity_columns(c) == {
        "id": {"start": 10, "step": 5, "always": True}
    }
    assert txn.identity_high_water(c, "id") == hi
    txn.append(_df(spark, [("b", 2)]), c)
    ids = _ids(spark, c)
    assert len(set(ids)) == 2 and max(ids) > hi
    # and the source is untouched
    assert txn.read_table(spark, t).count() == 1


def test_restore_never_reissues_pre_restore_values(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("a", 1)]), t)
    v_small = txn.current_version(t)
    txn.append(_df(spark, [("b", 2), ("c", 3)]), t)
    hi = max(_ids(spark, t))
    txn.restore(t, version=v_small)
    txn.append(_df(spark, [("d", 4)]), t)
    ids = _ids(spark, t)
    assert len(set(ids)) == 2
    assert max(ids) > hi  # the mark did not roll back with the data


def test_identity_is_a_writer_feature(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(_df(spark, [("a", 1)]), t)
    assert "identityColumns" in txn.writer_features(t)


def test_replace_table_resets_declaration_and_mark(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=False)
    txn.append(
        spark.createDataFrame(
            [(1000, "a", 1)], "id long, name string, qty long"
        ),
        t,
    )
    assert txn.identity_high_water(t, "id") == 1000
    # CREATE OR REPLACE with a schema that never re-declares identity:
    # the stale declaration must not auto-allocate into the new table
    txn.replace_table(
        spark, t, spark.createDataFrame([("x", 5)], "name string, n long")
    )
    assert txn.identity_columns(t) == {}
    assert txn.identity_high_water(t, "id") is None
    txn.append(spark.createDataFrame([("y", 6)], "name string, n long"), t)
    assert "id" not in txn.read_table(spark, t).columns
    # a RE-declared identity seeds from the NEW table's extreme (6),
    # not the pre-replace mark of 1000
    txn.set_identity_column(spark, t, "n", start=1, step=1)
    assert txn.identity_high_water(t, "n") == 6
    txn.append(spark.createDataFrame([("z",)], "name string"), t)
    ns = sorted(r.n for r in txn.read_table(spark, t).collect())
    assert len(set(ns)) == 3 and ns[:2] == [5, 6] and ns[2] > 6
    # and pre-replace snapshots still replay their own declarations
    assert "id" in txn.identity_columns(t, upto=1)


def test_merge_refuses_always_identity_inserts(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=True)
    txn.append(_df(spark, [("a", 1), ("b", 2)]), t)
    src = spark.createDataFrame(
        [(999, "c", 3)], "id long, name string, qty long"
    )
    with pytest.raises(txn.ConstraintViolation, match="ALWAYS AS IDENTITY"):
        txn.merge_on_read_upsert(spark, t, src, ["name"])
    assert txn.read_table(spark, t).count() == 2
    ids = set(_ids(spark, t))
    # rewriting the stored value through a merge is refused too
    wrong = spark.createDataFrame(
        [(max(ids) + 100, "a", 9)], "id long, name string, qty long"
    )
    with pytest.raises(txn.ConstraintViolation, match="ALWAYS AS IDENTITY"):
        txn.merge_on_read_upsert(spark, t, wrong, ["name"])


def test_merge_allows_always_identity_roundtrip_update(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=True)
    txn.append(_df(spark, [("a", 1), ("b", 2)]), t)
    cur = {
        r.name: r.id for r in txn.read_table(spark, t).collect()
    }
    # the classic read-modify-merge shape: same key, same stored id
    src = spark.createDataFrame(
        [(cur["a"], "a", 42)], "id long, name string, qty long"
    )
    txn.merge_on_read_upsert(spark, t, src, ["name"])
    rows = {r.name: r for r in txn.read_table(spark, t).collect()}
    assert rows["a"].qty == 42 and rows["a"].id == cur["a"]
    assert rows["b"].id == cur["b"]


def test_merge_by_default_folds_supplied_extreme_into_mark(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=False)
    txn.append(
        spark.createDataFrame([(1, "a", 1)], "id long, name string, qty long"),
        t,
    )
    assert txn.identity_high_water(t, "id") == 1
    src = spark.createDataFrame(
        [(700, "b", 2)], "id long, name string, qty long"
    )
    txn.merge_on_read_upsert(spark, t, src, ["name"])
    assert txn.identity_high_water(t, "id") == 700
    txn.append(_df(spark, [("c", 3)]), t)  # engine-assigned
    ids = _ids(spark, t)
    assert len(set(ids)) == 3 and max(ids) > 700


def test_update_refuses_set_on_always_identity(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=True)
    txn.append(_df(spark, [("a", 1)]), t)
    with pytest.raises(txn.ConstraintViolation, match="ALWAYS AS IDENTITY"):
        txn.update_where(spark, t, {"id": "id + 100"}, "name = 'a'")
    # non-identity SETs still work
    txn.update_where(spark, t, {"qty": "qty + 1"}, "name = 'a'")
    assert txn.read_table(spark, t).collect()[0].qty == 2


def test_update_by_default_folds_set_extreme_into_mark(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=False)
    txn.append(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 2)], "id long, name string, qty long"
        ),
        t,
    )
    assert txn.identity_high_water(t, "id") == 2
    txn.update_where(spark, t, {"id": "900"}, "name = 'a'")
    assert txn.identity_high_water(t, "id") == 900
    txn.append(_df(spark, [("c", 3)]), t)
    ids = _ids(spark, t)
    assert len(set(ids)) == 3 and max(ids) > 900


def test_merge_by_always_identity_key_updates_but_never_inserts(spark, tmp_path):
    """Merging BY the ALWAYS identity key (the common serving shape):
    updates of existing ids pass the round-trip check trivially; a
    source row carrying an id the table never allocated is an insert
    of a writer-invented value — refused."""
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=True)
    txn.append(_df(spark, [("a", 1), ("b", 2)]), t)
    cur = {r.name: r.id for r in txn.read_table(spark, t).collect()}
    upd = spark.createDataFrame(
        [(cur["a"], "a2", 10)], "id long, name string, qty long"
    )
    txn.merge_on_read_upsert(spark, t, upd, ["id"])
    rows = {r.id: r for r in txn.read_table(spark, t).collect()}
    assert rows[cur["a"]].name == "a2" and rows[cur["a"]].qty == 10
    ghost = spark.createDataFrame(
        [(max(cur.values()) + 999, "c", 3)], "id long, name string, qty long"
    )
    with pytest.raises(txn.ConstraintViolation, match="ALWAYS AS IDENTITY"):
        txn.merge_on_read_upsert(spark, t, ghost, ["id"])


def test_insert_overwrite_keeps_identity_declaration_and_mark(
    spark, tmp_path
):
    """SQL INSERT OVERWRITE replaces DATA, not the table definition:
    identity declarations and high-water marks survive it (Delta
    semantics; ADVICE r12 medium), matching partitioned tables where
    the dynamic-overwrite path never touched declared metadata. Only
    genuine CREATE OR REPLACE resets identity state
    (test_replace_table_resets_declaration_and_mark)."""
    from wikistream_lakehouse_spark.lakehouse import catalog

    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id", always=False)
    txn.append(
        spark.createDataFrame(
            [(1000, "a", 1), (1001, "b", 2)],
            "id long, name string, qty long",
        ),
        t,
    )
    assert txn.identity_high_water(t, "id") == 1001
    catalog.register_table(spark, "ow_id_t", t)
    try:
        catalog.sql_dml(
            spark,
            "INSERT OVERWRITE ow_id_t "
            "SELECT id, name, qty FROM ow_id_t WHERE qty = 1",
        )
        assert spark.table("ow_id_t").count() == 1
        # declaration and mark both survive the data-only replace
        assert "id" in txn.identity_columns(t)
        assert txn.identity_high_water(t, "id") == 1001
        # the next ingest allocates BEYOND the pre-overwrite mark —
        # old values are never re-issued
        txn.append(_df(spark, [("c", 3)]), t)
        ids = _ids(spark, t)
        assert len(set(ids)) == 2 and max(ids) > 1001
    finally:
        catalog.unregister_table(spark, "ow_id_t")
