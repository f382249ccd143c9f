"""As-of (time-series) join — an operator Spark lacks natively.

Backward as-of join: for each left row, attach the most recent right row
with right_ts <= left_ts within the same key. Implemented as the classic
union + last-ignoring-nulls running window — ONE shuffle on the key, no
range-condition BroadcastNestedLoop, no per-key subquery:

    union(left tagged 1, right tagged 0)
      → window partitionBy(key) orderBy(ts, tag) rows(-∞, 0)
      → last(right_payload, ignorenulls) → filter tag=1

Scale shape: state per window partition is one running value (the latest
right payload), so a key with millions of rows streams through in order —
this is exactly how the sort-merge ASOF implementations in columnar
engines behave, expressed in DataFrame algebra. Skewed keys split fine
under AQE because the heavy lifting is a sort within partitions, not a
join fan-out.

Semantics match DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`
(inclusive), which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of left join of `right` onto `left`.

    Output: all left columns + every right column (renamed with `suffix`
    where it collides with a left column); right columns are NULL for left
    rows with no prior right row.
    """
    rcols = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
    }
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    rstruct = F.struct(
        *[F.col(c).alias(rcols[c]) for c in right.columns]
    )
    ltype = left.select(lstruct.alias("s")).schema["s"].dataType
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType

    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        lstruct.alias("_lrow"),
        F.lit(None).cast(rtype).alias("_rrow"),
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(ltype).alias("_lrow"),
        rstruct.alias("_rrow"),
    )
    # tag order (right first at equal ts) makes the match inclusive:
    # a right row at exactly left_ts is visible to that left row.
    # `_rrow` as the final sort key makes ties among right rows sharing
    # (key, ts) deterministic: the greatest payload under struct
    # comparison wins, across any run/partitioning. (Right payloads must
    # therefore be orderable types — no map columns; Spark rejects the
    # plan otherwise.)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", F.col("_rrow").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return matched.select("_lrow.*", "_match.*")
