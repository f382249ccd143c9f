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
  * ``prune_files`` — given ``{col: (lo, hi)}`` interval predicates,
    keep files whose [min, max] envelope intersects every interval.
    Driver-side over the manifest (file counts are log-scale metadata,
    exactly what drivers are for).
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
only (athena_queries.sql date predicates); this is the engine-native
generalization below partition granularity.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


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
    to float64 for envelope comparison."""
    if v is None:
        return None
    if hasattr(v, "timestamp"):  # datetime / pd.Timestamp
        return float(pd.Timestamp(v).timestamp())
    return float(v)


def collect_file_stats(
    spark: SparkSession, table_path: str, cols: list[str]
) -> DataFrame:
    """Build the stats manifest: one row per file with
    ``n_rows`` and ``<col>_min`` / ``<col>_max`` for each stat column.

    Footer-only: executors open parquet METADATA (pyarrow), never data
    pages. The file list is parallelized, so manifest build time is
    O(files / executors) regardless of table size.
    """
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


def prune_files(
    stats: DataFrame, ranges: dict[str, tuple[float, float]]
) -> tuple[list[str], int]:
    """Files whose stat envelope intersects every ``(lo, hi)`` interval.

    Returns (surviving file paths, total files). A file with unknown
    stats for any predicate column survives (skipping must never drop
    rows). The manifest is collected ONCE and filtered driver-side —
    it is metadata-scale (one row per file, like a Delta log replay),
    and a second Spark job just to count it would re-run the whole
    footer scan.
    """
    rows = stats.collect()

    def survives(r) -> bool:
        for c, (lo, hi) in ranges.items():
            c_min, c_max = r[f"{c}_min"], r[f"{c}_max"]
            if c_min is None or c_max is None:
                continue  # unknown stats: must keep
            if c_max < float(lo) or c_min > float(hi):
                return False
        return True

    return [r.file for r in rows if survives(r)], len(rows)


def skipping_scan(
    spark: SparkSession,
    stats: DataFrame,
    ranges: dict[str, tuple[float, float]],
    cast: dict[str, str] | None = None,
) -> tuple[DataFrame, int, int]:
    """Scan only the files that can match, then re-apply the predicates
    as residual row filters.

    ``ranges`` values are in the manifest's normalized domain (floats;
    epoch seconds for timestamps). For non-numeric columns pass
    ``cast`` to align the residual compare with that domain — e.g.
    ``{"ts": "double"}`` (Spark's timestamp→double cast IS epoch
    seconds). Numeric columns need no cast.

    Returns (DataFrame, files_read, files_total).
    """
    from pyspark.sql import functions as F

    kept, total = prune_files(stats, ranges)
    if not kept:
        # perfect pruning is the SUCCESS case: return an empty frame with
        # the table's schema (derived from any file, scanning no rows)
        any_file = stats.select("file").first().file
        df = spark.read.parquet(any_file).limit(0)
    else:
        df = spark.read.parquet(*kept)
    for c, (lo, hi) in ranges.items():
        col = F.col(c).cast(cast[c]) if cast and c in cast else F.col(c)
        df = df.filter((col >= F.lit(lo)) & (col <= F.lit(hi)))
    return df, len(kept), total
