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
    ``txn_append_sink``)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prepared = _prepared(
            batch_df, keys, sequence_by, apply_as_delete, except_columns
        ).persist()
        try:
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
            version = _apply_batch(
                prepared,
                table_path,
                keys,
                sequence_by,
                extra_meta={
                    "app_id": app_id,
                    "batch_id": batch_id,
                    "rows": n_rows,
                    "fingerprint": fingerprint,
                },
                store=store,
            )
            if (
                version is not None
                and checkpoint_every
                and version > 0
                and version % checkpoint_every == 0
            ):
                txn.checkpoint(table_path, store=store)
        finally:
            prepared.unpersist()

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
