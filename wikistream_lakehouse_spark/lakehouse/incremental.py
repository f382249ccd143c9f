"""Incremental materialized-view maintenance over the txn change feed.

The reference refreshes its serving aggregates by RE-AGGREGATING the
whole curated table every DAG run (upsert_athena_aggregates.py:60-90
builds `SELECT dt, title, count(*) ... GROUP BY` over the full Athena
table, then upserts all of it into Postgres).  At ~1 M rows that is
fine; at 100 TB a daily full rescan of the fact table is the single
most expensive thing a lakehouse can do.  This module keeps the same
serving-table semantics while reading ONLY the rows appended since the
last refresh:

  * The source is an append-style txn table (streaming bronze / silver)
    whose per-commit row deltas `txn.table_changes` can replay exactly.
  * The view is itself a txn table whose commit ``meta`` records the
    last source version folded in (``mv_source_version``) plus a
    fingerprint of the aggregation spec — the consumer offset lives IN
    the transactional log, so view state and progress commit atomically
    and can never disagree (the Delta "txn action" pattern applied to
    view maintenance).
  * A refresh reads the delta ``(last, current]``, partially aggregates
    it (one shuffle over delta-sized data), and folds it into the view
    with re-mergeable combine rules (count/sum → sum, min → least,
    max → greatest, approx_distinct → HLL sketch union).  Only
    distributive/algebraic/sketch measures are offered; holistic ones
    (EXACT distinct, medians) are not incrementally mergeable from
    partials and must stay full-recompute — the honest boundary every
    incremental-view system draws.  ``approx_distinct`` stores the
    Datasketches HLL sketch itself (``hll_sketch_agg``/``hll_union``)
    so folding per-delta sketches is lossless and the stored view can
    be rolled up further (day → month) without re-reading the source;
    ``read_view`` estimates sketches to counts at read time.
  * Concurrency: the fold commits via optimistic ``rewrite`` validated
    against the view version the delta was computed from.  A racing
    refresh or writer ⇒ ``CommitConflict`` ⇒ re-read offset + re-run;
    double-apply is impossible because offset and data move in one
    commit.

Scale shape: refresh cost is O(delta) + O(view), never O(source).  The
view rewrite is a full rewrite of the VIEW table — views are
aggregates, orders of magnitude smaller than their source; if a view
itself grows huge, partition it and the same fold could route through
``replace_partitions`` on the touched groups.

`avg` decomposes to (sum, count) partials — ask for both and divide at
read time; `incremental_avg_view` below wraps that pattern.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn

# measure kind -> (delta partial-agg builder, view⊕partial combine builder)
_KINDS = ("count", "sum", "min", "max", "approx_distinct")

_META_VERSION = "mv_source_version"
_META_SOURCE = "mv_source"
_META_SPEC = "mv_spec_fingerprint"

# retractable views carry an implicit physical row counter per group: the
# device that lets a delete-fold KNOW when a group's last row died (and
# must vanish, as a full recompute would drop it)
_NROWS = "_mv_nrows"


def _spec_fingerprint(
    group_by: list[str],
    measures: dict[str, tuple[str, str]],
    where: str | None,
    retract: bool = False,
) -> str:
    # the retract flag is part of the state's shape (the implicit row
    # counter column), so flipping it on an existing view must be
    # refused as spec drift — but non-retract fingerprints stay
    # byte-identical to their pre-retract values
    payload = [group_by, sorted(measures.items()), where]
    if retract:
        payload.append("retract")
    blob = json.dumps(payload, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _group_names(group_by: list[str]) -> list[str]:
    """Output name of each group entry: plain column, or the alias of an
    ``<expr> AS <name>`` computed key."""
    names = []
    for g in group_by:
        parts = re.split(r"\s+as\s+", g, flags=re.IGNORECASE)
        names.append(parts[-1].strip() if len(parts) > 1 else g.strip())
    return names


def _validate(
    measures: dict[str, tuple[str, str]],
    group_by: list[str],
    retract: bool = False,
) -> None:
    if not group_by:
        raise ValueError("group_by must name at least one column")
    if not measures:
        raise ValueError("measures must define at least one aggregate")
    if retract:
        bad = {o: k for o, (k, _e) in measures.items() if k not in ("count", "sum")}
        if bad:
            raise ValueError(
                f"on_mutation='retract' requires INVERTIBLE measures "
                f"(count/sum — a delete subtracts); these are not: {bad}. "
                "min/max/approx_distinct cannot un-see a deleted row; use "
                "the rebuild fallback for them"
            )
        if _NROWS in measures or _NROWS in _group_names(group_by):
            raise ValueError(f"{_NROWS!r} is reserved for retractable views")
    for out, (kind, _expr) in measures.items():
        if kind not in _KINDS:
            raise ValueError(
                f"measure {out!r}: kind {kind!r} not in {_KINDS} — only "
                "re-mergeable aggregates can be maintained incrementally "
                "(avg = sum+count; EXACT distinct/medians are holistic and "
                "need full recompute — approx_distinct is the mergeable "
                "HLL-sketch alternative)"
            )
        if out in _group_names(group_by):
            raise ValueError(f"measure {out!r} collides with a group column")


def _partial_agg(
    delta: DataFrame,
    group_by: list[str],
    measures: dict[str, tuple[str, str]],
    where: str | None,
) -> DataFrame:
    if where is not None:
        delta = delta.where(where)
    aggs = []
    for out, (kind, expr) in measures.items():
        col = F.expr(expr)
        if kind == "approx_distinct":
            # Datasketches HLL partial: a binary sketch per group —
            # mergeable (hll_union) and order-insensitive, so folding
            # per-delta sketches equals sketching the whole source.
            aggs.append(F.hll_sketch_agg(col).alias(out))
            continue
        fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}[kind]
        aggs.append(fn(col).alias(out))
    return delta.groupBy(*[F.expr(g) for g in group_by]).agg(*aggs)


def _combine(
    view: DataFrame,
    partial: DataFrame,
    group_by: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold delta partials into the current view: full-outer on the group
    keys so brand-new groups appear and untouched groups pass through."""
    keys = _group_names(group_by)
    # the view's stored column types are the contract: DECIMAL addition
    # widens precision by one digit per fold (sum DECIMAL(28,2) + partial
    # → DECIMAL(29,2)), so without the cast-back every refresh would grow
    # the schema until the append refuses (caught by the r11 SQL MV query)
    view_types = dict(view.dtypes)
    v = view.alias("v")
    p = partial.alias("p")
    joined = v.join(p, on=keys, how="full_outer")
    cols = [F.col(g) for g in keys]
    for out, (kind, _expr) in measures.items():
        a, b = F.col(f"v.{out}"), F.col(f"p.{out}")
        if kind in ("count", "sum"):
            merged = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(a + b)
        elif kind == "min":
            merged = F.least(a, b)  # least/greatest skip nulls
        elif kind == "max":
            merged = F.greatest(a, b)
        else:  # approx_distinct: lossless sketch union
            merged = (
                F.when(a.isNull(), b)
                .when(b.isNull(), a)
                .otherwise(F.hll_union(a, b))
            )
        if out in view_types:
            merged = merged.cast(view_types[out])
        cols.append(merged.alias(out))
    return joined.select(*cols)


def _retraction_fold(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    last_src: int,
    src_ver: int,
    view_ver: int,
    group_by: list[str],
    m_eff: dict[str, tuple[str, str]],
    where: str | None,
    store=None,
) -> "DataFrame | None":
    """O(delta) fold across deletion-vector deletes: partial-aggregate
    the CDF's insert images positively and its delete images NEGATIVELY
    (every measure is count/sum — validated — so negation inverts), then
    combine both into the view. Returns None when the range contains a
    mutation the CDF can't express (caller falls back to rebuild)."""
    try:
        cdf = txn.table_changes_cdf(spark, source_path, last_src, src_ver, store)
    except ValueError:
        return None
    ins = cdf.filter(F.col("_change_type") == "insert").drop(
        "_change_type", "_commit_version"
    )
    dels = cdf.filter(F.col("_change_type") == "delete").drop(
        "_change_type", "_commit_version"
    )
    keys = _group_names(group_by)
    p_del = _partial_agg(dels, group_by, m_eff, where)
    p_del_neg = p_del.select(
        *[F.col(k) for k in keys],
        *[(-F.col(out)).alias(out) for out in m_eff],
    )
    folded = txn.snapshot(spark, view_path, view_ver, store)
    folded = _combine(folded, _partial_agg(ins, group_by, m_eff, where), group_by, m_eff)
    return _combine(folded, p_del_neg, group_by, m_eff)


def _view_state(view_path: str, store=None) -> tuple[int, int, dict]:
    """(view_version, last_source_version, last_meta). (-1, -1, {}) for a
    view that doesn't exist yet."""
    ver = txn.current_version(view_path, store)
    if ver < 0:
        return -1, -1, {}
    for h in reversed(txn.history(view_path, store)):
        meta = h["meta"]
        if _META_VERSION in meta:
            return ver, int(meta[_META_VERSION]), meta
    raise ValueError(
        f"{view_path} exists but carries no {_META_VERSION} commit meta — "
        "not an incrementally-maintained view (or its history was "
        "checkpoint-collapsed below the newest refresh; refresh commits "
        "are regular commits and survive checkpoints, so this indicates "
        "a foreign table at this path)"
    )


def refresh_aggregate(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    group_by: list[str],
    measures: dict[str, tuple[str, str]],
    where: str | None = None,
    max_retries: int = 5,
    store=None,
    on_mutation: str = "rebuild",
) -> int | None:
    """Bring the materialized aggregate at ``view_path`` up to date with
    the append-style txn table at ``source_path``, reading only the
    source rows appended since the previous refresh.

    ``measures`` maps output column -> (kind, sql_expr) with kind in
    {count, sum, min, max}; ``sql_expr`` is any row-local SQL expression
    over source columns (evaluated before aggregation, so filters can be
    encoded as `CASE WHEN`-style null-outs: `count` skips nulls).
    ``group_by`` entries may be plain columns or computed keys spelled
    ``"<expr> AS <name>"`` (e.g. ``"to_date(ts) AS dt"``); ``where`` is
    an optional row-local SQL predicate applied before aggregation.
    Everything in the spec must be ROW-LOCAL — that's what makes the
    delta fold equal the full recompute.

    Returns the new view version, or None when the view was already
    current (idempotent re-run: no commit, no version bump).  The first
    call builds the view with a FULL aggregate of the source snapshot —
    every later call is delta-only.  A spec change (different groups,
    measures, or filter) is detected by fingerprint and refused: drop or
    rebuild the view explicitly rather than silently mixing
    incompatible states.

    ``on_mutation`` controls what happens when the pending source range
    contains content-CHANGING commits (delete/update/merge/restore —
    including deletion-vector deletes), whose row deltas the plain
    change feed cannot express: ``"rebuild"`` (default) falls back to a
    FULL re-aggregate of the current snapshot — the refresh stays
    correct, just not incremental for that one step (the Delta MV
    posture); ``"error"`` re-raises for callers that must never pay a
    full scan; ``"retract"`` keeps the refresh O(delta) even across
    **deletion-vector deletes**: the row-level CDF
    (``txn.table_changes_cdf``) recovers exact delete images, which are
    SUBTRACTED from the view — requires invertible measures
    (count/sum), and the view carries an implicit per-group row counter
    so a group whose last row died vanishes exactly as a full recompute
    would drop it. Non-DV mutations (CoW update, merge, restore) still
    trigger the rebuild fallback under ``"retract"``. The rebuild
    fallback also covers a consumer that lagged past vacuum retention.
    """
    if on_mutation not in ("rebuild", "error", "retract"):
        raise ValueError(
            f"on_mutation must be 'rebuild', 'error', or 'retract', got {on_mutation!r}"
        )
    retract = on_mutation == "retract"
    _validate(measures, group_by, retract=retract)
    m_eff = dict(measures)
    if retract:
        m_eff[_NROWS] = ("count", "1")
    fp = _spec_fingerprint(group_by, measures, where, retract=retract)
    for _ in range(max_retries):
        src_ver = txn.current_version(source_path, store)
        if src_ver < 0:
            raise ValueError(f"source table {source_path} has no commits")
        view_ver, last_src, last_meta = _view_state(view_path, store)
        meta = {
            _META_VERSION: src_ver,
            _META_SOURCE: source_path,
            _META_SPEC: fp,
            # full spec rides in the log so readers can interpret the
            # view (which columns are sketches) without out-of-band state
            "mv_spec": {
                "group_by": list(group_by),
                "measures": {k: list(v) for k, v in measures.items()},
                "where": where,
            },
        }

        if view_ver < 0:
            # first build: full aggregate of the source snapshot at src_ver
            base = txn.snapshot(spark, source_path, src_ver, store)
            state = _partial_agg(base, group_by, m_eff, where)
            try:
                return txn.rewrite(
                    state, view_path, base_version=-1, op="mv_refresh",
                    meta=meta, store=store,
                )
            except txn.CommitConflict:
                continue  # another refresher created it; fold on top
        if last_meta.get(_META_SPEC) != fp:
            raise ValueError(
                f"view {view_path} was built with a different spec "
                f"({last_meta.get(_META_SPEC)} != {fp}); rebuild it "
                "explicitly instead of folding incompatible aggregates"
            )
        if last_meta.get(_META_SOURCE) != source_path:
            raise ValueError(
                f"view {view_path} tracks {last_meta.get(_META_SOURCE)!r}, "
                f"not {source_path!r}"
            )
        if src_ver <= last_src:
            return None  # already current — idempotent no-op
        try:
            delta = txn.table_changes(
                spark, source_path, last_src, src_ver, store
            )
            folded = _combine(
                txn.snapshot(spark, view_path, view_ver, store),
                _partial_agg(delta, group_by, m_eff, where),
                group_by,
                m_eff,
            )
        except ValueError as e:
            recoverable = "content-changing" in str(e) or "vacuumed" in str(e)
            if not recoverable or on_mutation == "error":
                raise
            folded = None
            if retract:
                folded = _retraction_fold(
                    spark, source_path, view_path, last_src, src_ver,
                    view_ver, group_by, m_eff, where, store,
                )
            if folded is None:
                # fold is impossible: recompute is always valid — full
                # aggregate of the snapshot at src_ver
                folded = _partial_agg(
                    txn.snapshot(spark, source_path, src_ver, store),
                    group_by,
                    m_eff,
                    where,
                )
        if retract:
            # a group whose physical rows all died must vanish, exactly
            # as a full recompute would drop it
            folded = folded.filter(F.col(_NROWS) > 0)
        try:
            return txn.rewrite(
                folded, view_path, base_version=view_ver, op="mv_refresh",
                meta=meta, store=store,
            )
        except txn.CommitConflict:
            continue  # offset or view moved under us: re-read, re-fold
    raise txn.CommitConflict(
        f"mv refresh of {view_path} conflicted {max_retries} times"
    )


def incremental_avg_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    group_by: list[str],
    value_expr: str,
    store=None,
) -> DataFrame:
    """The avg-decomposition pattern: maintain (sum, count) partials
    incrementally and expose `avg = sum / count` at read time.  Returns
    the up-to-date view WITH the derived avg column."""
    measures = {
        "mv_sum": ("sum", value_expr),
        "mv_count": ("count", value_expr),
    }
    refresh_aggregate(spark, source_path, view_path, group_by, measures, store=store)
    return txn.read_table(spark, view_path, store=store).withColumn(
        "mv_avg", F.col("mv_sum") / F.col("mv_count")
    )


@dataclass(frozen=True)
class ViewSpec:
    """A declared materialized view over one source table — the unit the
    streaming sink maintains per micro-batch (`txn_append_sink(...,
    maintain_views=[...])`).  Refreshing is idempotent and exactly-once
    (offset rides in the view's commit), so a crash between source
    append and view refresh only means the NEXT refresh folds two
    deltas instead of one."""

    path: str
    group_by: tuple[str, ...]
    measures: dict[str, tuple[str, str]] = field(hash=False)
    where: str | None = None
    #: mutation policy forwarded to refresh_aggregate — "retract" keeps a
    #: continuously-maintained view O(delta) across DV deletes/MoR merges
    on_mutation: str = "rebuild"

    def refresh(self, spark: SparkSession, source_path: str, store=None) -> int | None:
        return refresh_aggregate(
            spark,
            source_path,
            self.path,
            list(self.group_by),
            self.measures,
            where=self.where,
            store=store,
            on_mutation=self.on_mutation,
        )


def read_view(
    spark: SparkSession, view_path: str, store=None
) -> DataFrame:
    """Read a maintained view in its USER-facing form: approx_distinct
    sketch columns are estimated to counts (0 for all-null groups, like
    SQL ``count(distinct ...)``); everything else passes through.  The
    raw sketches stay available via ``txn.read_table`` for further
    union-merging (e.g. rolling a daily view up to monthly without
    touching the source)."""
    _, _, meta = _view_state(view_path, store)
    spec = meta.get("mv_spec", {})
    measures = spec.get("measures", {})
    df = txn.read_table(spark, view_path, store=store)
    if _NROWS in df.columns:
        df = df.drop(_NROWS)  # retractable views' internal row counter
    cols = []
    for name in df.columns:
        kind = measures.get(name, [None])[0]
        if kind == "approx_distinct":
            est = F.when(
                F.col(name).isNull(), F.lit(0).cast("long")
            ).otherwise(F.hll_sketch_estimate(name))
            cols.append(est.alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)


def sync_append(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    transform=None,
    partition_by: list[str] | None = None,
    store=None,
) -> int | None:
    """Incremental append-only sync: apply a ROW-LOCAL ``transform``
    (filter / project / derive — no aggregates, joins, or windows) to
    the source rows appended since the last sync and append the result
    to ``dest_path``.  The bronze→silver leg of an incremental
    medallion: silver stays an append-style txn table, so a
    ``refresh_aggregate`` view (the gold leg) chains directly on top —
    bronze commit → delta-sized silver append → delta-sized gold fold,
    with no full rescan anywhere.

    Exactly-once via the offset stamped in each dest commit's meta
    (``sync_source_version``); a re-run with nothing new is a no-op
    (returns None).  When the delta transforms to zero rows (e.g. all
    filtered), an empty commit still advances the offset so the delta
    is never re-read.

    Contract: ONE syncer per destination (the streaming-checkpoint
    analogue) — appends cannot detect a racing twin the way the view
    refresh's optimistic rewrite can, so two concurrent syncers of the
    same source would double-append.  Racing OTHER writers (compaction,
    appends to dest) is safe.
    """
    src_ver = txn.current_version(source_path, store)
    if src_ver < 0:
        raise ValueError(f"source table {source_path} has no commits")
    last = -1
    for m in txn.committed_meta(dest_path, store):
        if m.get("sync_source") == source_path:
            last = max(last, int(m["sync_source_version"]))
    if src_ver <= last and last >= 0:
        return None
    if last < 0:
        delta = txn.snapshot(spark, source_path, src_ver, store)
    else:
        delta = txn.table_changes(spark, source_path, last, src_ver, store)
    if transform is not None:
        delta = transform(delta)
    return txn.append(
        delta,
        dest_path,
        meta={"sync_source": source_path, "sync_source_version": src_ver},
        partition_by=partition_by,
        store=store,
    )


def view_lag(source_path: str, view_path: str, store=None) -> int:
    """Monitoring hook: how many source versions the view is behind
    (0 = current).  Cheap: two log-metadata reads, no data IO."""
    src_ver = txn.current_version(source_path, store)
    _, last_src, _ = _view_state(view_path, store)
    return max(0, src_ver - last_src)


# --------------------------------------------------------------------------
# Incremental PLAIN-PARQUET silver curation (pre-dates the txn change
# feed; kept for bare-directory bronzes). The reference re-curates the
# entire raw zone every night (glue/job_wiki_curate.py:31 reads RAW_PATH
# unfiltered) — correct only because idempotency hides the waste; at
# 100 TB that is the difference between a 10-minute and a 10-hour job.
# A JSON state file records each processed ds= partition's FILE LISTING
# (not bare names), so a live partition that gains late files is
# re-curated; txn-substrate pipelines should prefer sync_append above.
# --------------------------------------------------------------------------

from wikistream_lakehouse_spark.lakehouse.compact import list_partition_dirs
from wikistream_lakehouse_spark.lakehouse.silver import curate_to_silver_parquet


def _list_part_files(bronze_path: str, part: str) -> list[str]:
    """Data files currently inside one ``ds=`` partition (sorted, relative)."""
    full = os.path.join(bronze_path, part)
    out: list[str] = []
    for root, _dirs, files in os.walk(full):
        rel = os.path.relpath(root, full)
        for f in files:
            if f.startswith((".", "_")):
                continue  # _SUCCESS / hidden markers are not data
            out.append(f if rel == "." else os.path.join(rel, f))
    return sorted(out)


def _load_state(state_path: str) -> dict[str, list[str]]:
    if os.path.exists(state_path):
        with open(state_path) as f:
            return dict(json.load(f).get("processed", {}))
    return {}


def _save_state(state_path: str, processed: dict[str, list[str]]) -> None:
    os.makedirs(os.path.dirname(state_path), exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"processed": {k: processed[k] for k in sorted(processed)}}, f)
    os.replace(tmp, state_path)


def curate_incremental(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    state_path: str,
    ts_col: str = "ts",
) -> list[str]:
    """Curate bronze partitions whose file set changed since the last run;
    returns the list of `ds=` partitions processed (empty = nothing new).

    State records the per-partition FILE LISTING, not just the partition
    name: a ``ds=`` directory that a live streaming bronze sink is still
    appending to (today's open partition) is re-curated on the next run
    when new files appear — marking bare partition names "done" would
    silently drop those late files. The listing is snapshotted *before*
    the read, so files landing mid-run surface as a diff next run; the
    re-read covers the whole partition, so the dynamic partition
    overwrite in curate_to_silver_parquet stays convergent.

    State is written only after a successful curation, so a crashed run
    re-processes its delta — convergent thanks to partition overwrite.
    """
    state = _load_state(state_path)
    all_parts = list_partition_dirs(bronze_path, "ds")
    snapshot = {p: _list_part_files(bronze_path, p) for p in all_parts}
    todo = [p for p in all_parts if state.get(p) != snapshot[p]]
    if not todo:
        return []
    batch = spark.read.option("basePath", bronze_path).parquet(
        *[os.path.join(bronze_path, p) for p in todo]
    )
    # keep_source_partition: each delta owns (event-day × its ds) partitions,
    # so deltas sharing an event day never overwrite each other, and a
    # re-run of THIS delta still converges
    curate_to_silver_parquet(
        batch, silver_path, ts_col=ts_col, keep_source_partition=True
    )
    _save_state(state_path, {**state, **{p: snapshot[p] for p in todo}})
    return todo
