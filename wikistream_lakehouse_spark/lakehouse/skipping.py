"""File-level data skipping: a min/max stats manifest + manual file
pruning — the scan-side payoff of clustering layouts (Z-order, range
sort).

Delta/Iceberg keep per-file column stats in the transaction log and
prune the file list before the scan ever starts; plain parquet
directories have the same information sitting in every file footer, but
Spark's vanilla reader only uses it per-row-group AFTER scheduling every
file. This module materializes the manifest once and prunes the file
list up front, so a selective query on a well-clustered table schedules
O(matching files) tasks instead of O(all files):

  * ``collect_file_stats`` — footer-only manifest build: the file LIST
    is distributed over executors and each reads just parquet metadata
    (pyarrow), never data pages. O(files) metadata I/O, zero data scan —
    the same cost profile as a Delta log replay.
  * ``persist_manifest`` / ``load_manifest`` — materialize the manifest
    as a parquet table, the Delta-log analogue; planning then filters it
    with a pushed-down predicate instead of re-reading footers.
  * ``prune_files`` — given ``{col: (lo, hi)}`` interval predicates,
    keep files whose [min, max] envelope intersects every interval.
    The filter runs distributed over the manifest; only the surviving
    paths (the list the scheduler needs anyway) reach the driver — at
    ~10⁶ files a full-manifest collect per planned scan would be the
    bottleneck.
  * ``skipping_scan`` — read only surviving files and re-apply the
    predicates as residual row filters (file stats are necessary, not
    sufficient).

Combined with ``lakehouse/zorder.py``: a Z-ordered table's per-file
envelopes are tight in EVERY clustered column, so multi-column
predicates prune multiplicatively; a single-column sort only prunes its
leader. tests/test_skipping.py measures exactly that.

Numeric and timestamp columns are supported (stats normalize to float64
for the envelope compare; timestamps via epoch seconds).

Reference parity: none — the reference relies on Glue partition listing
only (the yyyy/mm/dd predicates of README.md:99-110 and the date-slice
filter of upsert_athena_aggregates.py:39-50); this is the engine-native
generalization below partition granularity.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_parquet_files(table_path: str) -> list[str]:
    """Every data file under ``table_path`` (recursive, skips hidden)."""
    out: list[str] = []
    for root, _dirs, files in os.walk(table_path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


def _to_float(v) -> float | None:
    """Normalize a footer stat (number / datetime / pandas Timestamp)
    to float64 for envelope comparison; None for values with no float
    order (strings, bytes) — those columns get no min/max envelope and
    rely on the Bloom face of stats-in-log pruning instead."""
    if v is None:
        return None
    if hasattr(v, "timestamp"):  # datetime / pd.Timestamp
        return float(pd.Timestamp(v).timestamp())
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def collect_file_stats(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
    files: list[str] | None = None,
) -> DataFrame:
    """Build the stats manifest: one row per file with
    ``n_rows`` and ``<col>_min`` / ``<col>_max`` for each stat column.

    Footer-only: executors open parquet METADATA (pyarrow), never data
    pages. The file list is parallelized, so manifest build time is
    O(files / executors) regardless of table size.

    ``files`` restricts the manifest to an explicit list (absolute
    paths) — the txn integration passes the ACTIVE snapshot's files so
    retired time-travel files never pollute the scan.
    """
    if files is None:
        files = _list_parquet_files(table_path)
    if not files:
        raise ValueError(f"no parquet files under {table_path}")

    fields = ", ".join(f"`{c}_min` double, `{c}_max` double" for c in cols)
    schema = f"file string, n_rows long, {fields}"
    stat_cols = list(cols)  # rebind for closure capture

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for batch in batches:
            rows = []
            for path in batch["file"]:
                md = pq.ParquetFile(path).metadata
                name_to_idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                row: dict[str, object] = {"file": path, "n_rows": md.num_rows}
                for c in stat_cols:
                    if c not in name_to_idx:
                        raise ValueError(
                            f"column {c!r} absent from parquet footer of "
                            f"{path} — hive-style partition columns live in "
                            "directory names, not footers; prune those with "
                            "partition predicates, not file stats"
                        )
                    idx = name_to_idx[c]
                    lo, hi = None, None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            lo, hi = None, None  # any gap → unknown file
                            break
                        mn, mx = _to_float(st.min), _to_float(st.max)
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                    row[f"{c}_min"] = lo
                    row[f"{c}_max"] = hi
                rows.append(row)
            yield pd.DataFrame(rows)

    paths_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), 64)
    )
    return paths_df.mapInPandas(read_footers, schema=schema)


def persist_manifest(stats: DataFrame, path: str) -> None:
    """Materialize the stats manifest as a parquet table.

    At 100 TB (~10⁵–10⁶ files) the manifest itself is big enough that
    re-deriving it per query, or collecting it whole to the driver, is
    the planning bottleneck — exactly the role of the Delta/Iceberg
    metadata layer.  Persist once per layout change; every subsequent
    scan prunes against the parquet manifest with a pushed-down filter.
    """
    stats.write.mode("overwrite").parquet(path)


def load_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Re-open a persisted stats manifest."""
    return spark.read.parquet(path)


def prune_predicate(ranges: dict[str, tuple[float, float]]):
    """Catalyst predicate: file envelope intersects every interval.

    A file with unknown stats (NULL min/max) for a predicate column
    survives — skipping must never drop rows.  Expressed as column
    operations so it pushes down into a persisted-manifest parquet scan.
    """
    from pyspark.sql import functions as F

    pred = F.lit(True)
    for c, (lo, hi) in ranges.items():
        c_min, c_max = F.col(f"{c}_min"), F.col(f"{c}_max")
        unknown = c_min.isNull() | c_max.isNull()
        overlaps = (c_max >= F.lit(float(lo))) & (c_min <= F.lit(float(hi)))
        pred = pred & (unknown | overlaps)
    return pred


def prune_files(
    stats: DataFrame, ranges: dict[str, tuple[float, float]]
) -> tuple[list[str], int]:
    """Files whose stat envelope intersects every ``(lo, hi)`` interval.

    Returns (surviving file paths, total files).  The envelope filter
    runs DISTRIBUTED over the manifest (pushed into the manifest scan
    when it is a persisted parquet table); only the SURVIVING paths —
    O(files actually scanned), the same list Spark's scheduler needs
    anyway — ever reach the driver.  The total is a count aggregate,
    never a full-manifest collect.
    """
    survivors = [
        r.file
        for r in stats.filter(prune_predicate(ranges)).select("file").collect()
    ]
    total = stats.count()
    return sorted(survivors), total


def skipping_scan(
    spark: SparkSession,
    stats: DataFrame,
    ranges: dict[str, tuple[float, float]],
    cast: dict[str, str] | None = None,
    base_path: str | None = None,
) -> tuple[DataFrame, int, int]:
    """Scan only the files that can match, then re-apply the predicates
    as residual row filters.

    ``ranges`` values are in the manifest's normalized domain (floats;
    epoch seconds for timestamps). For non-numeric columns pass
    ``cast`` to align the residual compare with that domain — e.g.
    ``{"ts": "double"}``. Timestamp columns are routed through an
    NTZ-safe epoch-seconds expression (tscompat.epoch_seconds):
    ``CAST(timestamp AS DOUBLE)`` is epoch seconds but the same cast is
    illegal on TIMESTAMP_NTZ, so the residual must not depend on which
    zone form the files declare. Numeric columns need no cast.

    For hive-partitioned layouts pass ``base_path`` (the table root):
    reading a file subset by explicit paths drops the ``k=v`` directory
    columns unless the reader knows the partition root, which silently
    changes the scan schema vs a whole-table read.

    Returns (DataFrame, files_read, files_total).
    """
    from pyspark.sql import functions as F

    from wikistream_lakehouse_spark.tscompat import epoch_seconds, is_timestamp_type

    kept, total = prune_files(stats, ranges)
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    if not kept:
        # perfect pruning is the SUCCESS case: return an empty frame with
        # the table's schema (derived from any file, scanning no rows)
        any_file = stats.select("file").first().file
        df = reader.parquet(any_file).limit(0)
    else:
        df = reader.parquet(*kept)
    for c, (lo, hi) in ranges.items():
        if cast and c in cast and is_timestamp_type(df.schema[c].dataType):
            col = epoch_seconds(df, c) if cast[c] == "double" else (
                F.col(c).cast("timestamp").cast(cast[c])
            )
        elif cast and c in cast:
            col = F.col(c).cast(cast[c])
        else:
            col = F.col(c)
        df = df.filter((col >= F.lit(lo)) & (col <= F.lit(hi)))
    return df, len(kept), total


def txn_skipping_scan(
    spark: SparkSession,
    table_path: str,
    ranges: dict[str, tuple[float, float]],
    cast: dict[str, str] | None = None,
    version: int | None = None,
    store=None,
) -> tuple[DataFrame, int, int]:
    """Data skipping over a TRANSACTIONAL table snapshot: the log names
    the active files (retired time-travel files and in-flight writers'
    files never pollute the scan), the footer manifest prunes them, and
    only surviving files are read — the full Delta OPTIMIZE ZORDER +
    stats-pruning loop: ``txn.append`` → ``txn.compact(zorder_by=[...])``
    → ``txn_skipping_scan`` with multi-column ranges.

    ``version`` time-travels the scan: pruning runs against THAT
    snapshot's file set. Returns (DataFrame, files_read, files_total)
    where files_total is the snapshot's active-file count.
    """
    from wikistream_lakehouse_spark.lakehouse import txn

    v = txn.current_version(table_path, store) if version is None else version
    rels, dvs = txn._replay_state(table_path, v, store)
    if not rels:
        raise ValueError(f"no committed data at version {v} in {table_path}")
    # ranges arrive under LOGICAL names; footers and logged stats carry
    # PHYSICAL names — translate in, map the scanned frame back out
    mapping, dropped = txn._column_mapping_state(table_path, v, store)
    ranges = {mapping.get(c, c): r for c, r in ranges.items()}
    if cast:
        cast = {mapping.get(c, c): t for c, t in cast.items()}
    cols = list(ranges)
    # stats-in-log fast path: files whose commit embedded min/max for
    # every needed column prune from LOG METADATA alone — zero file IO;
    # only the uncovered remainder (pre-stats commits, compact rewrites)
    # pays the footer pass
    logged = txn._logged_file_stats_raw(table_path, v, store)
    from_log, need_footers = [], []
    for rel in rels:
        s = logged.get(rel)
        if s and all(c in s["min"] for c in cols):
            row = {
                "file": os.path.join(table_path, rel),
                "n_rows": s["n"],
            }
            for c in cols:
                row[f"{c}_min"] = s["min"][c]
                row[f"{c}_max"] = s["max"][c]
            from_log.append(row)
        else:
            need_footers.append(os.path.join(table_path, rel))
    fields = ", ".join(f"`{c}_min` double, `{c}_max` double" for c in cols)
    schema = f"file string, n_rows long, {fields}"
    parts = []
    if from_log:
        parts.append(spark.createDataFrame(from_log, schema))
    if need_footers:
        parts.append(
            collect_file_stats(spark, table_path, cols, files=need_footers)
        )
    stats = parts[0]
    for p in parts[1:]:
        stats = stats.unionByName(p)
    df, n_read, n_total = skipping_scan(
        spark, stats, ranges, cast=cast, base_path=table_path
    )
    if dvs and n_read:
        # merge-on-read deletes apply to skipping scans too: subtract
        # DV-marked positions exactly as snapshot() does (stale logged
        # stats stay conservative; the anti-join restores exactness)
        dv = txn._dv_frame(spark, table_path, dvs)
        df = (
            txn._with_rowpos(df, table_path)
            .join(
                dv,
                (F.col(txn._DV_FILE) == dv.f) & (F.col(txn._DV_POS) == dv.ri),
                "left_anti",
            )
            .drop(txn._DV_FILE, txn._DV_POS)
        )
    if mapping or dropped:
        df = txn._to_logical(df, mapping, dropped)
    return df.drop(txn._COMMIT_COL), n_read, n_total


def point_lookup(
    spark: SparkSession,
    table_path: str,
    keys: dict,
    version: int | None = None,
    store=None,
) -> tuple[DataFrame, int, int]:
    """Serving-style key lookup on a transactional table: read only the
    files that can hold ``keys`` (logical names, exact equality),
    decided from LOG METADATA alone — the read-side twin of the MERGE
    probe's candidate pruning, composed from the same three faces:

      1. partition values — key columns that are partition columns
         restrict to their hive directories,
      2. per-file Bloom filters — point pruning on uuid/random layouts
         where envelopes span the key space (``set_stats_columns``),
      3. min/max envelopes — clustered/Z-ordered layouts.

    Returns (rows DataFrame, files_read, files_total). At 10⁶ files a
    stats-logged, key-clustered table answers a point lookup by opening
    a handful of files — the planning is one driver-side interval/bloom
    intersection and one tiny aggregate job, zero table IO. Deletion
    vectors apply (a MoR-deleted key returns nothing); column mapping
    resolves (lookup by the CURRENT logical name at any version).

    Reference anchor: the reference serves point queries from Postgres
    after an export (upsert_athena_aggregates.py) — this serves them
    from the lake itself.
    """
    from pyspark.sql.types import StructField, StructType

    from wikistream_lakehouse_spark.lakehouse import txn

    v = txn.current_version(table_path, store) if version is None else version
    files, dvs = txn._replay_state(table_path, v, store)
    total = len(files)
    mapping, dropped = txn._column_mapping_state(table_path, v, store)
    pkeys = {mapping.get(k, k): val for k, val in keys.items()}

    schema = None
    if files:
        types = txn._stamped_physical_types(table_path, store, upto=v) or {}
        missing = [k for k in pkeys if k not in types]
        if missing:  # legacy stamp-free log: one footer/table-schema read
            sch = txn._table_schema(spark, table_path, store)
            types = {**{f.name: f.dataType for f in (sch or [])}, **types}
            missing = [k for k in pkeys if k not in types]
        if missing:
            raise ValueError(
                f"unknown lookup column(s) {missing} in {table_path}"
            )
        touched = spark.createDataFrame(
            [tuple(pkeys.values())],
            StructType([StructField(k, types[k]) for k in pkeys]),
        )
        cand = txn._candidate_merge_files(
            table_path, files, touched, list(pkeys), v, store
        )
    else:
        cand = []
    if not cand:
        empty = txn.read_table(
            spark, table_path, version=v, store=store
        ).filter(F.lit(False))
        return empty, 0, total

    df = txn._read_files(spark, table_path, cand, store, dvs=dvs)
    cond = F.lit(True)
    for k, val in pkeys.items():
        cond = cond & F.col(k).eqNullSafe(F.lit(val))
    df = df.filter(cond)
    if txn._COMMIT_COL in df.columns:
        df = df.drop(txn._COMMIT_COL)
    if mapping or dropped:
        df = txn._to_logical(df, mapping, dropped)
    return df, len(cand), total
