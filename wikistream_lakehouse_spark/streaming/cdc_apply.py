"""Streaming CDC apply — ``APPLY CHANGES INTO`` semantics over a txn
table (the DLT/Debezium consumer shape; composes VERDICT r7 next #1's
conditional MERGE with the exactly-once streaming sink contract).

A change stream carries (key columns, payload columns, a *sequence*
column that orders changes per key, and optionally a delete marker).
``apply_changes`` maintains a transactional serving table that always
reflects, per key, the HIGHEST-sequence change seen so far — under
at-least-once delivery, micro-batch replays, and arbitrary out-of-order
arrival:

* **Within a batch**: changes collapse to the latest row per key
  (greatest ``sequence_by``; ties broken by a deterministic row hash so
  replays collapse identically).
* **Across batches**: the target stores ``sequence_by``; the MERGE
  updates only when the incoming sequence is strictly newer, so a
  stale update arriving late is a no-op.
* **Deletes are tombstones, not physical deletes.** A physical delete
  forgets the sequence at which the key died — a late-arriving OLDER
  update would then look "not matched" and resurrect the row. Instead
  the row stays with ``__deleted = true`` (+ the delete's sequence), so
  late stale changes lose the sequence comparison exactly like live
  rows. ``cdc_snapshot`` serves the live view; ``purge_tombstones``
  physically drops tombstones once the out-of-order horizon has passed
  (the operator's retention call, like Delta's
  ``withEventTimeOrder``/vacuum split).
* **Exactly-once**: each micro-batch merge commits with the same
  (app_id, batch_id, content-fingerprint) identity the append sink
  stamps (pipeline.py:txn_append_sink); a replayed batch is recognized
  in the commit log and skipped, and a checkpoint RESET over new data
  is refused rather than silently dropped.

Reference parity: the reference's consumer
(``kafka/wiki-s3-consumer.py:62-90``) lands raw events and rebuilds
serving tables wholesale per DAG run; ``upsert_athena_aggregates.py:103``
is the unconditional upsert loop. This operator is the O(delta),
ordered, delete-aware form of that pipeline stage.

Scale shape: per batch, one keyed collapse shuffle over the BATCH
(delta-sized), then a MoR merge whose probe reads only candidate files
(key-stat + Bloom pruned) and writes O(delta) — table size never enters
the per-batch cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.merge_builder import merge

#: Tombstone marker column stored in the target table.
DELETED_COL = "__deleted"


def collapse_latest(
    changes: DataFrame, keys: "list[str]", sequence_by: str
) -> DataFrame:
    """Latest change per key within one (batch) frame: greatest
    ``sequence_by`` wins; exact ties break on a deterministic full-row
    hash so two replays of the same batch collapse to the same row."""
    order = [
        F.col(sequence_by).desc(),
        F.xxhash64(*[F.col(c) for c in changes.columns]).desc(),
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class ExpectationViolation(ValueError):
    """A ``fail``-action expectation saw violating rows: the batch is
    refused (the stream stops) rather than silently landing bad data."""


def _enforce_expectations(
    batch: DataFrame,
    expectations: "dict[str, str | tuple[str, str]]",
    default_action: str = "drop",
) -> "tuple[DataFrame, dict]":
    """Declarative data-quality gates on a change batch (the DLT
    ``expect_all[_or_drop/_or_fail]`` shape; the reference's
    ``coalesce(bot,false)=false`` hygiene filter is exactly one of
    these). ``expectations`` maps name → SQL boolean expr, or →
    (expr, action) with action ∈ {drop, warn, fail}. A row VIOLATES
    only when the expr is FALSE — NULL passes, SQL CHECK semantics,
    same as ``txn.set_constraint``.

    Returns (cleaned frame, metrics): violation counts per expectation
    are computed in ONE aggregate pass and returned for stamping into
    the batch's commit metadata, so quality history lives in the table
    log itself (``expectation_metrics`` reads it back). ``drop``
    filters violating rows, ``warn`` keeps them, ``fail`` raises
    ``ExpectationViolation`` when any row violates."""
    if not expectations:
        return batch, {}
    norm: dict = {}
    for name, spec in expectations.items():
        expr, action = (
            spec if isinstance(spec, tuple) else (spec, default_action)
        )
        if action not in ("drop", "warn", "fail"):
            raise ValueError(
                f"expectation {name!r}: action {action!r} not in "
                "drop|warn|fail"
            )
        norm[name] = (expr, action)

    def _passes(expr: str):
        # NULL passes (CHECK semantics): violation == (expr IS FALSE)
        return F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))

    # positional aliases, mapped back to user names afterwards: a
    # user-supplied expectation name colliding with __rows_in or
    # containing characters the Row accessor can't round-trip (dots,
    # backticks) must not break the metrics pass (ADVICE r9 low #3)
    ordered = list(norm.items())
    row = batch.agg(
        F.count(F.lit(1)).alias("__rows_in"),
        *[
            F.sum((~_passes(e)).cast("long")).alias(f"__exp_{i}")
            for i, (_n, (e, _a)) in enumerate(ordered)
        ],
    ).first()
    checks = {}
    failed = []
    for i, (n, (e, a)) in enumerate(ordered):
        cnt = int(row[f"__exp_{i}"] or 0)
        checks[n] = {"expr": e, "action": a, "violations": cnt}
        if a == "fail" and cnt:
            failed.append(f"{n} ({cnt} rows violate {e!r})")
    if failed:
        raise ExpectationViolation(
            "expectation(s) failed on this batch: " + "; ".join(failed)
        )
    clean = batch
    for n, (e, a) in norm.items():
        if a == "drop" and checks[n]["violations"]:
            clean = clean.filter(_passes(e))
    return clean, {"rows_in": int(row["__rows_in"]), "checks": checks}


def drop_expectations_filter(
    batch: DataFrame,
    expectations: "dict[str, str | tuple[str, str]]",
) -> DataFrame:
    """Plan-inline expectation gates for sinks with NO commit log to
    stamp metrics into (the plain-parquet ``streaming_silver`` path):
    every expectation must use the ``drop`` action — ``warn``/``fail``
    need the per-batch metrics pass only a foreachBatch/txn sink can
    record, so they are refused with a pointer to ``txn_append_sink``.
    The filter composes into the streaming plan (pure Catalyst: no
    extra pass, pushdown intact); NULL passes, CHECK semantics, same
    as ``_enforce_expectations``."""
    out = batch
    for name, spec in expectations.items():
        expr, action = spec if isinstance(spec, tuple) else (spec, "drop")
        if action != "drop":
            raise ValueError(
                f"expectation {name!r}: action {action!r} needs per-batch "
                "metrics, which a plain file sink cannot record — use "
                "txn_append_sink (commit-log-stamped) for warn/fail"
            )
        out = out.filter(
            F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
        )
    return out


def expectation_metrics(
    table_path: str, store: "txn.LogStore | None" = None
) -> "list[dict]":
    """Per-batch expectation metrics replayed from the commit log —
    one dict per CDC commit that carried expectations: {app_id,
    batch_id, rows_in, checks: {name: {expr, action, violations}}}."""
    out = []
    for m in txn.committed_meta(table_path, store):
        exp = m.get("expectations")
        if exp:
            out.append(
                {
                    "app_id": m.get("app_id"),
                    "batch_id": m.get("batch_id"),
                    **exp,
                }
            )
    return out


def _prepared(
    batch: DataFrame,
    keys: "list[str]",
    sequence_by: str,
    apply_as_delete: "str | None",
    except_columns: "tuple[str, ...]",
) -> DataFrame:
    """Collapse to latest-per-key and project to the stored shape:
    payload columns (minus ``except_columns``) + ``sequence_by`` +
    ``__deleted`` (the delete predicate evaluated over the change row —
    False everywhere when no predicate is configured)."""
    missing = [c for c in (*keys, sequence_by) if c not in batch.columns]
    if missing:
        raise ValueError(f"change stream lacks required columns {missing}")
    latest = collapse_latest(batch, keys, sequence_by)
    deleted = (
        F.coalesce(F.expr(apply_as_delete).cast("boolean"), F.lit(False))
        if apply_as_delete
        else F.lit(False)
    )
    drop = [c for c in except_columns if c not in (*keys, sequence_by)]
    return latest.withColumn(DELETED_COL, deleted).drop(*drop)


def _apply_batch(
    batch: DataFrame,
    table_path: str,
    keys: "list[str]",
    sequence_by: str,
    extra_meta: "dict | None" = None,
    store: "txn.LogStore | None" = None,
) -> "int | None":
    """One prepared batch into the target: first batch creates the
    table (append), later batches run the sequence-guarded MERGE.
    Returns the committed version or None (no-op / all-stale batch)."""
    spark = batch.sparkSession
    if txn.current_version(table_path, store) < 0:
        return txn.append(
            batch, table_path, meta=extra_meta, store=store, stats_cols=keys
        )
    newer = f"s.{sequence_by} > t.{sequence_by}"
    return (
        merge(table_path, batch, on=keys, store=store)
        # SET * / INSERT * carry __deleted with the row: a delete is an
        # UPDATE to tombstone state, an unseen key's delete INSERTS a
        # tombstone (so its sequence is remembered), and a late stale
        # change of either kind fails the `newer` guard.
        .when_matched_update(condition=newer)
        .when_not_matched_insert()
        .execute(spark, extra_meta=extra_meta)
    )


def _exactly_once(
    prepared: DataFrame,
    table_path: str,
    app_id: str,
    batch_id: int,
    apply_fn,
    checkpoint_every: int,
    store: "txn.LogStore | None",
) -> None:
    """Replay-identity wrapper shared by both apply modes: fingerprint
    the prepared batch, skip a true replay, refuse a checkpoint reset
    over different content, stamp the identity into the commit via
    ``apply_fn(prepared, extra_meta)``, checkpoint the log on cadence."""
    n_rows, fp = prepared.agg(
        F.count(F.lit(1)),
        F.sum(
            F.xxhash64(*[F.col(c) for c in prepared.columns]).cast(
                "decimal(38,0)"
            )
        ),
    ).first()
    fingerprint = str(fp)
    for m in txn.committed_meta(table_path, store):
        if (m.get("app_id"), m.get("batch_id")) != (app_id, batch_id):
            continue
        if m.get("fingerprint", fingerprint) == fingerprint:
            return  # true replay of a committed batch
        raise ValueError(
            f"batch {batch_id} of app_id={app_id!r} already "
            f"committed with DIFFERENT content (committed "
            f"{m.get('rows')} rows, incoming {n_rows}) — "
            "checkpoint reset over new data; use a fresh app_id "
            "(the Delta txn appId contract)."
        )
    version = apply_fn(
        prepared,
        {
            "app_id": app_id,
            "batch_id": batch_id,
            "rows": n_rows,
            "fingerprint": fingerprint,
        },
    )
    if (
        version is not None
        and checkpoint_every
        and version > 0
        and version % checkpoint_every == 0
    ):
        txn.checkpoint(table_path, store=store)


def _cdc_writer(changes, write_batch, checkpoint, trigger_secs, available_now):
    writer = (
        changes.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()


def apply_changes(
    changes: DataFrame,
    table_path: str,
    keys: "list[str]",
    sequence_by: str,
    checkpoint: str,
    app_id: str = "cdc",
    apply_as_delete: "str | None" = None,
    except_columns: "tuple[str, ...]" = (),
    trigger_secs: int = 10,
    available_now: bool = False,
    checkpoint_every: int = 16,
    expectations: "dict[str, str | tuple[str, str]] | None" = None,
    on_violation: str = "drop",
    store: "txn.LogStore | None" = None,
) -> StreamingQuery:
    """Continuously apply a CDC ``changes`` stream into the txn table at
    ``table_path``. See module docstring for the ordering / tombstone /
    exactly-once contract.

    ``apply_as_delete`` is a SQL boolean over the change row's columns
    (e.g. ``"op = 'D'"``). ``except_columns`` are change-stream columns
    not stored in the target (the op marker, transport metadata).
    ``app_id`` names one (source, checkpoint) lineage — change it with
    the checkpoint location (the Delta txn appId contract, same as
    ``txn_append_sink``). ``expectations`` adds declarative
    data-quality gates evaluated BEFORE the latest-per-key collapse
    (``_enforce_expectations``): name → expr or (expr, action) with
    action ∈ drop|warn|fail (default ``on_violation``); per-batch
    violation counts are stamped into the commit metadata and readable
    via ``expectation_metrics``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cleaned, exp_meta = _enforce_expectations(
            batch_df, expectations or {}, on_violation
        )
        prepared = _prepared(
            cleaned, keys, sequence_by, apply_as_delete, except_columns
        ).persist()
        try:
            _exactly_once(
                prepared,
                table_path,
                app_id,
                batch_id,
                lambda df, meta: _apply_batch(
                    df, table_path, keys, sequence_by,
                    extra_meta=(
                        {**meta, "expectations": exp_meta}
                        if exp_meta else meta
                    ),
                    store=store,
                ),
                checkpoint_every,
                store,
            )
        finally:
            prepared.unpersist()

    return _cdc_writer(
        changes, write_batch, checkpoint, trigger_secs, available_now
    )


def cdc_snapshot(
    spark: SparkSession,
    table_path: str,
    store: "txn.LogStore | None" = None,
    version: "int | None" = None,
) -> DataFrame:
    """The live serving view: current (or time-travel) state minus
    tombstones, tombstone machinery column dropped."""
    df = txn.read_table(spark, table_path, version=version, store=store)
    return df.filter(~F.col(DELETED_COL)).drop(DELETED_COL)


def purge_tombstones(
    spark: SparkSession,
    table_path: str,
    sequence_by: str,
    horizon: "object | None" = None,
    store: "txn.LogStore | None" = None,
) -> "int | None":
    """Physically drop tombstone rows whose death sequence is at or
    below ``horizon`` (all tombstones when None). Run this only once no
    change older than ``horizon`` can still arrive — after a purge, a
    straggler older-than-delete update WOULD resurrect its key; that is
    the retention trade every CDC store makes (Delta vacuum, Debezium
    tombstone TTL). MoR delete: O(positions) IO, snapshot-safe."""
    pred = DELETED_COL
    if horizon is not None:
        h = repr(horizon) if isinstance(horizon, str) else str(horizon)
        pred = f"{DELETED_COL} AND {sequence_by} <= {h}"
    return txn.delete_where(spark, table_path, pred, store=store, mode="mor")


# --------------------------------------------------------------------------
# SCD Type 2: full history with sequence-range splicing
# --------------------------------------------------------------------------

#: SCD2 bookkeeping columns stored in the history table.
SCD2_START = "__start_seq"
SCD2_END = "__end_seq"
SCD2_CURRENT = "__current"


def _scd2_versions(
    batch: DataFrame,
    keys: "list[str]",
    sequence_by: str,
    apply_as_delete: "str | None",
    except_columns: "tuple[str, ...]",
) -> DataFrame:
    """Change rows → version rows (keys, payload, ``__deleted``,
    ``__start_seq``). Unlike Type 1, NOTHING collapses: every change is
    a history version. A delete becomes a tombstone VERSION — it closes
    the prior version's range and occupies its own, so as-of reads
    inside the deleted span correctly see no row."""
    missing = [c for c in (*keys, sequence_by) if c not in batch.columns]
    if missing:
        raise ValueError(f"change stream lacks required columns {missing}")
    deleted = (
        F.coalesce(F.expr(apply_as_delete).cast("boolean"), F.lit(False))
        if apply_as_delete
        else F.lit(False)
    )
    drop = [c for c in except_columns if c not in keys]
    return (
        batch.withColumn(DELETED_COL, deleted)
        .withColumn(SCD2_START, F.col(sequence_by))
        .drop(sequence_by, *drop)
    )


def _scd2_fold(versions: DataFrame, keys: "list[str]") -> DataFrame:
    """Recompute the spliced history from ALL known versions of each
    key: dedup exact (key, start) collisions deterministically, then one
    per-key window pass assigns each version the next version's start as
    its end — so a late-arriving middle version SPLICES in and the
    ranges re-knit around it. Recompute-from-versions is what makes
    out-of-order SCD2 simple: there is no positional surgery, just a
    deterministic fold over the set of versions seen so far."""
    dedup_w = Window.partitionBy(*keys, SCD2_START).orderBy(
        F.xxhash64(*[F.col(c) for c in versions.columns]).desc()
    )
    uniq = (
        versions.withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    splice_w = Window.partitionBy(*keys).orderBy(F.col(SCD2_START).asc())
    return uniq.withColumn(
        SCD2_END, F.lead(SCD2_START).over(splice_w)
    ).withColumn(SCD2_CURRENT, F.col(SCD2_END).isNull())


def _apply_batch_scd2(
    batch: DataFrame,
    table_path: str,
    keys: "list[str]",
    extra_meta: "dict | None" = None,
    store: "txn.LogStore | None" = None,
) -> "int | None":
    """One version-rows batch into the history table. Touched keys'
    existing history is re-read (candidate-file-pruned, the same probe
    the MoR merge uses), unioned with the new versions, re-spliced, and
    swapped in via ONE atomic MoR commit (new files + deletion vector
    over the old rows) — O(batch + touched-key history), never O(table).
    Single-writer per table assumed (one streaming sink), like every
    foreachBatch CDC consumer."""
    spark = batch.sparkSession
    base = txn.current_version(table_path, store)
    if base < 0:
        return txn.append(
            _scd2_fold(batch, keys),
            table_path,
            meta=extra_meta,
            store=store,
            stats_cols=keys,
        )
    touched = batch.select(*keys).distinct()
    files, dvs = txn._replay_state(table_path, base, store)
    probe = txn._candidate_merge_files(
        table_path, files, touched, keys, base, store
    )
    versions = batch
    if probe:
        existing = (
            txn._read_files(spark, table_path, probe, store, dvs=dvs)
            .join(touched, keys, "left_semi")
            .drop(SCD2_END, SCD2_CURRENT)
        )
        versions = existing.unionByName(batch)
    history = _scd2_fold(versions, keys)
    return txn.merge_on_read_upsert(
        spark, table_path, history, keys, meta=extra_meta, store=store
    )


def apply_changes_scd2(
    changes: DataFrame,
    table_path: str,
    keys: "list[str]",
    sequence_by: str,
    checkpoint: str,
    app_id: str = "cdc-scd2",
    apply_as_delete: "str | None" = None,
    except_columns: "tuple[str, ...]" = (),
    trigger_secs: int = 10,
    available_now: bool = False,
    checkpoint_every: int = 16,
    expectations: "dict[str, str | tuple[str, str]] | None" = None,
    on_violation: str = "drop",
    store: "txn.LogStore | None" = None,
) -> StreamingQuery:
    """``APPLY CHANGES … STORED AS SCD TYPE 2``: maintain the FULL
    change history — one row per (key, version) with
    ``[__start_seq, __end_seq)`` validity, ``__current`` on the open
    version — instead of Type 1's latest-state row. Out-of-order
    arrivals splice into the correct historical position (the fold
    recomputes each touched key's ranges from its version set), deletes
    are tombstone versions, and the same (app_id, batch_id,
    fingerprint) identity makes replays no-ops. ``expectations`` gates
    the batch exactly as in ``apply_changes``. Query the result with
    ``scd2_current`` / ``scd2_as_of``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cleaned, exp_meta = _enforce_expectations(
            batch_df, expectations or {}, on_violation
        )
        prepared = _scd2_versions(
            cleaned, keys, sequence_by, apply_as_delete, except_columns
        ).persist()
        try:
            _exactly_once(
                prepared,
                table_path,
                app_id,
                batch_id,
                lambda df, meta: _apply_batch_scd2(
                    df, table_path, keys,
                    extra_meta=(
                        {**meta, "expectations": exp_meta}
                        if exp_meta else meta
                    ),
                    store=store,
                ),
                checkpoint_every,
                store,
            )
        finally:
            prepared.unpersist()

    return _cdc_writer(
        changes, write_batch, checkpoint, trigger_secs, available_now
    )


def scd2_current(
    spark: SparkSession,
    table_path: str,
    store: "txn.LogStore | None" = None,
) -> DataFrame:
    """Live state from the history table: open, non-tombstone versions."""
    df = txn.read_table(spark, table_path, store=store)
    return df.filter(F.col(SCD2_CURRENT) & ~F.col(DELETED_COL)).drop(
        SCD2_END, SCD2_CURRENT, DELETED_COL
    )


def scd2_as_of(
    spark: SparkSession,
    table_path: str,
    seq,
    store: "txn.LogStore | None" = None,
) -> DataFrame:
    """State as of sequence point ``seq``: the version whose range
    covers it, tombstone spans correctly empty."""
    df = txn.read_table(spark, table_path, store=store)
    covers = (F.col(SCD2_START) <= F.lit(seq)) & (
        F.col(SCD2_END).isNull() | (F.col(SCD2_END) > F.lit(seq))
    )
    return df.filter(covers & ~F.col(DELETED_COL)).drop(
        SCD2_END, SCD2_CURRENT, DELETED_COL
    )
