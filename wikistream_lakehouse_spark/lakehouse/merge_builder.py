"""Conditional MERGE builder (VERDICT r7 next-round #1): the full
Delta-style ``MERGE INTO`` surface — ``WHEN MATCHED [AND cond] THEN
UPDATE SET …/DELETE``, ``WHEN NOT MATCHED [AND cond] THEN INSERT …``,
``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE`` — compiled
onto the existing txn machinery so clause evaluation stays O(candidate
files):

* **MoR mode** (default): changed target rows are marked dead via a
  deletion-vector sidecar and their replacements (plus inserts) are
  appended — the ``merge_on_read_upsert`` shape (txn.py) generalized to
  arbitrary clause sets. The commit removes NO files, so the row-level
  change feed stays recoverable across it, and only CANDIDATE files
  (min/max + Bloom + partition-value pruned via
  ``txn._candidate_merge_files``) are ever read.
* **CoW mode**: candidate files are rewritten in place (survivors +
  updated rows), inserts appended — the ``delete_where(mode="cow")``
  shape. Best ahead of read-heavy workloads.

Clause semantics follow SQL/Delta MERGE: clauses are evaluated in the
order added and the FIRST applicable clause per row wins; a target row
matched by MORE THAN ONE source row with any applicable matched clause
is a refused ambiguity (`MergeCardinalityError`), exactly Delta's
multiple-match error. ``WHEN NOT MATCHED BY SOURCE`` clauses force a
full-candidate scan (every target row must be join-probed), which the
planner takes into account; without them, only files whose logged key
stats intersect the source's key envelope are read at all.

Reference parity: the reference's serving upsert
(``upsert_athena_aggregates.py:103-109``) is the degenerate
unconditional form (`when_matched_update()` + `when_not_matched_insert()`);
a CDC/SCD pipeline that must drop tombstoned rows or expire
no-longer-present keys needs the conditional clauses this module adds.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


class MergeCardinalityError(ValueError):
    """A target row was matched by more than one source row while a
    matched clause would modify it — the SQL MERGE ambiguity every
    engine refuses (nondeterministic which source row wins)."""


_UPDATE = "update"
_DELETE = "delete"
_INSERT = "insert"


@dataclass(frozen=True)
class _Clause:
    side: str                 # "matched" | "not_matched" | "by_source"
    kind: str                 # _UPDATE | _DELETE | _INSERT
    condition: "str | None"   # SQL expr over t.* / s.* aliases
    assignments: "dict[str, str] | None"  # col -> expr; None = * form

    def describe(self) -> dict:
        return {
            "side": self.side,
            "kind": self.kind,
            **({"condition": self.condition} if self.condition else {}),
            **({"set": dict(self.assignments)} if self.assignments else {}),
        }


_EQ_PAIR_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)"
    r"\s*=\s*([A-Za-z_][A-Za-z0-9_]*)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)\s*$"
)


def _split_conjuncts(cond: str) -> list[str]:
    """Split a boolean expression on top-level ANDs (paren/quote aware)
    — just enough structure to harvest equi-join pairs for pruning; any
    non-conforming conjunct simply contributes no pruning key."""
    parts, buf, depth, quote = [], [], 0, None
    tokens = re.split(r"(?i)(\bAND\b)", cond)
    for tok in tokens:
        if tok.upper() == "AND" and depth == 0 and quote is None:
            parts.append("".join(buf))
            buf = []
            continue
        for c in tok:
            if quote:
                if c == quote:
                    quote = None
            elif c in "'\"":
                quote = c
            elif c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
        buf.append(tok)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


class MergeBuilder:
    """Fluent conditional-MERGE plan over a txn table. Build with
    :func:`merge`, add clauses in evaluation order, then ``execute``.

    Condition and assignment expressions reference the target as
    ``target_alias`` (default ``t``) and the source as ``source_alias``
    (default ``s``), like the SQL form::

        merge(path, changes, on="t.k = s.k")
          .when_matched_delete(condition="s.op = 'D'")
          .when_matched_update(set_={"v": "s.v", "seen": "t.seen + 1"})
          .when_not_matched_insert()
          .when_not_matched_by_source_delete(condition="t.expired")
          .execute(spark)
    """

    def __init__(
        self,
        table_path: str,
        source: DataFrame,
        on: "str | list[str]",
        target_alias: str = "t",
        source_alias: str = "s",
        store: "txn.LogStore | None" = None,
    ) -> None:
        if target_alias == source_alias:
            raise ValueError("target and source aliases must differ")
        self._path = table_path
        self._source = source
        self._on = on
        self._ta = target_alias
        self._sa = source_alias
        self._store = store
        self._clauses: list[_Clause] = []

    # -- clause builders (evaluation order = insertion order) ----------

    def when_matched_update(
        self,
        condition: "str | None" = None,
        set_: "dict[str, str] | None" = None,
    ) -> "MergeBuilder":
        """UPDATE matched rows; ``set_`` maps target column → SQL expr
        (columns not named keep their target value); ``None`` = SET *
        (every target column from the same-named source column)."""
        self._clauses.append(_Clause("matched", _UPDATE, condition, set_))
        return self

    def when_matched_delete(
        self, condition: "str | None" = None
    ) -> "MergeBuilder":
        self._clauses.append(_Clause("matched", _DELETE, condition, None))
        return self

    def when_not_matched_insert(
        self,
        condition: "str | None" = None,
        values: "dict[str, str] | None" = None,
    ) -> "MergeBuilder":
        """INSERT source rows matching no target row; ``values`` maps
        target column → SQL expr; ``None`` = INSERT * (same-named
        source columns; absent columns null-fill)."""
        self._clauses.append(_Clause("not_matched", _INSERT, condition, values))
        return self

    def when_not_matched_by_source_update(
        self,
        condition: "str | None" = None,
        set_: "dict[str, str] | None" = None,
    ) -> "MergeBuilder":
        if not set_:
            raise ValueError(
                "when_not_matched_by_source_update requires set_ "
                "(there is no source row to take values from)"
            )
        self._clauses.append(_Clause("by_source", _UPDATE, condition, set_))
        return self

    def when_not_matched_by_source_delete(
        self, condition: "str | None" = None
    ) -> "MergeBuilder":
        self._clauses.append(_Clause("by_source", _DELETE, condition, None))
        return self

    # -- plan pieces ---------------------------------------------------

    def _join_cond(self) -> str:
        if isinstance(self._on, str):
            return self._on
        return " AND ".join(
            f"{self._ta}.{c} = {self._sa}.{c}" for c in self._on
        )

    def _equi_pairs(self) -> "list[tuple[str, str]]":
        """(target_col, source_col) pairs harvested from top-level
        ``t.c = s.c2`` conjuncts — the pruning keys. Non-equi conjuncts
        are evaluated in the join but prune nothing."""
        if isinstance(self._on, list):
            return [(c, c) for c in self._on]
        pairs = []
        for part in _split_conjuncts(self._on):
            m = _EQ_PAIR_RE.match(part)
            if not m:
                continue
            a1, c1, a2, c2 = m.groups()
            if a1 == self._ta and a2 == self._sa:
                pairs.append((c1, c2))
            elif a1 == self._sa and a2 == self._ta:
                pairs.append((c2, c1))
        return pairs

    def _first_applicable(self, clauses: "list[tuple[int, _Clause]]"):
        """CASE chain: global index of the first clause whose condition
        holds (NULL condition = always applicable), else NULL."""
        chain = None
        for gi, cl in clauses:
            cond = (
                F.lit(True)
                if cl.condition is None
                else F.coalesce(F.expr(cl.condition), F.lit(False))
            )
            chain = (
                F.when(cond, F.lit(gi))
                if chain is None
                else chain.when(cond, F.lit(gi))
            )
        return F.lit(None).cast("int") if chain is None else chain.otherwise(
            F.lit(None).cast("int")
        )

    def _new_row_projection(self, schema, act_col, by_index):
        """One SELECT that materializes the replacement/insert row for
        every acted-on row: per target column, a CASE over the winning
        clause index picks that clause's assignment expression (update:
        unnamed columns keep ``t.c``; insert: ``s.c`` or NULL), cast to
        the target type so the appended files match the table schema
        exactly."""
        cols = []
        for f_ in schema.fields:
            c = f_.name
            chain = None
            for gi, cl in by_index:
                if cl.kind == _DELETE:
                    continue
                if cl.kind == _UPDATE:
                    if cl.assignments is not None:
                        # named SET list: unnamed columns keep target value
                        expr = cl.assignments.get(c, f"{self._ta}.`{c}`")
                    else:
                        # UPDATE SET *: same-named source column wins;
                        # columns the source lacks keep their target value
                        expr = (
                            f"{self._sa}.`{c}`"
                            if c in self._source.columns and cl.side == "matched"
                            else f"{self._ta}.`{c}`"
                        )
                else:  # insert
                    if cl.assignments is not None:
                        expr = cl.assignments.get(c, "NULL")
                    else:
                        expr = (
                            f"{self._sa}.`{c}`"
                            if c in self._source.columns
                            else "NULL"
                        )
                branch = F.expr(expr)
                chain = (
                    F.when(act_col == gi, branch)
                    if chain is None
                    else chain.when(act_col == gi, branch)
                )
            cols.append(
                (chain if chain is not None else F.lit(None))
                .cast(f_.dataType)
                .alias(c)
            )
        return cols

    # -- execution -------------------------------------------------

    def execute(
        self,
        spark: SparkSession,
        max_retries: int = 5,
        mode: str = "mor",
        extra_meta: "dict | None" = None,
    ) -> "int | None":
        """Run the merge; returns the committed version, or None when no
        clause touched any row (no commit). ``mode="mor"`` (default)
        appends + deletion-vectors (O(delta) writes, CDF-recoverable);
        ``mode="cow"`` rewrites candidate files. ``extra_meta`` is
        merged into the commit's meta dict — the hook idempotent
        producers (streaming CDC apply) use to stamp their
        (app_id, batch_id, fingerprint) replay identity."""
        if mode not in ("mor", "cow"):
            raise ValueError(f"mode must be 'mor' or 'cow', got {mode!r}")
        if not self._clauses:
            raise ValueError("merge has no WHEN clauses")
        path, store = self._path, self._store
        txn._check_writer_features(path, store)
        meta = {**(extra_meta or {}),
                "mergeClauses": [c.describe() for c in self._clauses],
                "mergeOn": self._join_cond()}
        for _ in range(max_retries):
            base = txn.current_version(path, store)
            if base < 0:
                raise ValueError(
                    f"no committed data in {path} — conditional MERGE "
                    "targets an existing table (first write is append)"
                )
            result = self._run_once(spark, base, mode, meta)
            if result is None:
                return None
            if result >= 0:
                return result
            # lost the commit race: loop re-reads the new HEAD
        raise txn.CommitConflict(f"merge conflicted {max_retries} times")

    def _run_once(self, spark, base, mode, meta) -> "int | None":
        """One optimistic attempt against snapshot ``base``. Returns the
        committed version, None for a no-op merge, or -1 on a lost
        commit race (caller retries)."""
        path, store = self._path, self._store
        files, dvs = txn._replay_state(path, base, store)
        pb = txn._current_partitioning(path, store)
        schema = txn._table_schema(spark, path, store)
        need_all = any(c.side == "by_source" for c in self._clauses)
        pairs = self._equi_pairs()
        if need_all or not pairs or not files:
            candidates = list(files)
        else:
            touched = self._source.select(
                *[F.col(sc).alias(tc) for tc, sc in pairs]
            ).distinct()
            candidates = txn._candidate_merge_files(
                path, files, touched, [tc for tc, _ in pairs], base, store
            )
        src = self._source.alias(self._sa).withColumn(
            "__s_present", F.lit(True)
        )
        tgt = None
        if candidates:
            tgt = (
                txn._read_files(
                    spark, path, candidates, store, dvs=dvs, keep_rowpos=True
                )
                .alias(self._ta)
                .withColumn("__t_present", F.lit(True))
            )
        # MoR without by_source clauses: untouched target rows stay in
        # their files physically — a source-driven join suffices. CoW
        # (and any by_source clause) needs every candidate row.
        how = "full_outer" if (mode == "cow" or need_all) else "left_outer"
        joined = None
        if tgt is not None:
            joined = (
                src.join(tgt, F.expr(self._join_cond()), how)
                if how == "left_outer"
                else tgt.join(src, F.expr(self._join_cond()), "full_outer")
            )
        indexed = list(enumerate(self._clauses))
        m_cl = [(i, c) for i, c in indexed if c.side == "matched"]
        nm_cl = [(i, c) for i, c in indexed if c.side == "not_matched"]
        bs_cl = [(i, c) for i, c in indexed if c.side == "by_source"]

        dv_rels: list[str] = []
        dv_out = None
        adds: list[str] = []
        sub = None
        removes: list[str] = []
        if joined is not None:
            t_here = F.coalesce(F.col("__t_present"), F.lit(False))
            s_here = F.coalesce(F.col("__s_present"), F.lit(False))
            act = (
                F.when(t_here & s_here, self._first_applicable(m_cl))
                .when(~t_here & s_here, self._first_applicable(nm_cl))
                .when(t_here & ~s_here, self._first_applicable(bs_cl))
            )
            joined = joined.withColumn("__act", act).persist()
            try:
                # SQL MERGE cardinality rule: >1 source row modifying
                # one target row is refused (which one wins is
                # nondeterministic). Checked only over rows an applicable
                # MATCHED clause would actually modify, like Delta.
                if m_cl:
                    dup = (
                        joined.filter(
                            t_here & s_here & F.col("__act").isNotNull()
                        )
                        .groupBy(txn._DV_FILE, txn._DV_POS)
                        .count()
                        .filter("count > 1")
                        .limit(1)
                        .count()
                    )
                    if dup:
                        raise MergeCardinalityError(
                            "MERGE: a target row matches multiple source "
                            "rows under an applicable MATCHED clause — "
                            "deduplicate the source on the join keys"
                        )
                acted = joined.filter(F.col("__act").isNotNull())
                upd_or_ins = [
                    gi for gi, c in indexed if c.kind in (_UPDATE, _INSERT)
                ]
                mutating = [
                    gi for gi, c in indexed
                    if c.side != "not_matched"  # touches an existing row
                ]
                is_upd_or_ins = (
                    F.col("__act").isin(upd_or_ins)
                    if upd_or_ins
                    else F.lit(False)
                )
                is_mutating = (
                    F.col("__act").isin(mutating)
                    if mutating
                    else F.lit(False)
                )
                new_rows = acted.filter(is_upd_or_ins).select(
                    self._new_row_projection(
                        schema, F.col("__act"), indexed
                    )
                )
                new_rows = txn._apply_generated(new_rows, path, store)
                txn._check_schema(new_rows, path, store)
                if mode == "mor":
                    dead = (
                        acted.filter(is_mutating)
                        .select(
                            F.col(txn._DV_FILE).alias("f"),
                            F.col(txn._DV_POS).alias("ri"),
                        )
                        .dropDuplicates(["f", "ri"])
                    )
                    dv_rels, n_dead, dv_sub = txn._write_dv_sidecar(dead, path)
                    dv_out = os.path.join(path, dv_sub)
                    if n_dead == 0 and dv_out is not None:
                        txn._data().remove_tree(dv_out)
                        dv_rels, dv_out = [], None
                    out_df = new_rows
                else:
                    # CoW: survivors of candidate files (rows no clause
                    # deleted/updated — dedup the multi-match fan-out)
                    # + replacement/insert rows; candidates removed.
                    survivors = (
                        joined.filter(
                            t_here
                            & (F.col("__act").isNull() | ~is_mutating)
                        )
                        .dropDuplicates([txn._DV_FILE, txn._DV_POS])
                        .select(
                            *[
                                F.col(f"{self._ta}.`{f_.name}`").alias(f_.name)
                                for f_ in schema.fields
                            ]
                        )
                    )
                    out_df = survivors.unionByName(new_rows)
                    removes = list(candidates)
                has_out = bool(out_df.take(1))
                if not has_out and not dv_rels and not removes:
                    return None  # nothing matched any clause: no commit
                if has_out or removes:
                    adds, sub = txn._write_data_files(out_df, path, pb, store)
            finally:
                joined.unpersist()
        else:
            # zero candidate files: only inserts can act
            if not nm_cl:
                return None
            src_only = src.withColumn(
                "__t_present", F.lit(False)
            ).withColumn("__act", self._first_applicable(nm_cl))
            new_rows = src_only.filter(F.col("__act").isNotNull()).select(
                self._new_row_projection(schema, F.col("__act"), nm_cl)
            )
            new_rows = txn._apply_generated(new_rows, path, store)
            txn._check_schema(new_rows, path, store)
            if not new_rows.take(1):
                return None
            adds, sub = txn._write_data_files(new_rows, path, pb, store)

        try:
            if adds:
                txn._validate_constraints(spark, path, adds, store)
            stats_cols = txn._effective_stats_cols(
                path, None, self._source, store, pb
            )
            entry = txn._entry("merge", adds, sorted(removes), pb, meta)
            if adds and stats_cols:
                entry["stats"] = txn._collect_commit_stats(
                    spark, path, adds, stats_cols, store
                )
            if dv_rels:
                entry["dvAdd"] = dv_rels
            if txn.current_version(path, store) == base and txn._try_commit(
                path, base + 1, entry, store
            ):
                return base + 1
        except BaseException:
            if sub:
                txn._drop_data_dir(path, sub)
            if dv_out is not None:
                txn._data().remove_tree(dv_out)
            raise
        if sub:
            txn._drop_data_dir(path, sub)
        if dv_out is not None:
            txn._data().remove_tree(dv_out)
        return -1  # lost the race


def merge(
    table_path: str,
    source: DataFrame,
    on: "str | list[str]",
    target_alias: str = "t",
    source_alias: str = "s",
    store: "txn.LogStore | None" = None,
) -> MergeBuilder:
    """Start a conditional MERGE into the txn table at ``table_path``.
    ``on`` is either a list of shared key column names (equi-join,
    fully prunable) or a SQL expression over ``target_alias`` /
    ``source_alias`` (equi conjuncts still prune; the rest evaluates in
    the join)."""
    return MergeBuilder(table_path, source, on, target_alias, source_alias, store)
