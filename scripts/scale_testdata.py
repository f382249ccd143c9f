"""Synthesize a larger scale factor by seeded replication of an existing
testdata directory with key remapping (VERDICT r2 next-round #1).

    python scripts/scale_testdata.py --src /root/testdata/sf0.1 \
        --dst .localdata/sf1 --factor 10

Each replica r gets every entity key shifted by ``r * KEY_OFFSET`` so the
scaled tables keep referential integrity replica-by-replica (an order in
replica 3 references the replica-3 copy of its customer) while key
cardinality — users, customers, orders, docs — grows linearly with the
factor, matching how a real corpus grows. Dimension tables (region,
nation) stay fixed, as in TPC-H.

Deterministic by construction: pure replication + arithmetic remap of the
seed-42 source (TESTDATA.md), no RNG — rebuilding yields byte-identical
logical content. Non-key columns (text, embeddings, timestamps) are
copied verbatim; at factor 10 every document therefore has 9 exact-
duplicate twins, which *stress-tests* the dedup family harder than the
base data (every MinHash band collides within each twin group).

Output layout: ``dst/<table>.parquet/`` DIRECTORIES with one file per
replica (row-group size 128k), so Spark schedules factor × row-group
parallel splits — the multi-file layout a real 100 TB table has, unlike
the single-file sf0.1 fixtures.
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# Key columns to shift, per table. Everything else copies verbatim.
KEYED: dict[str, list[str]] = {
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]

# Far above any base-table max key (sf0.1 maxes out near 6e5), so shifted
# replica domains never collide.
KEY_OFFSET = 10_000_000


def replicate_table(src: str, dst_dir: str, keys: list[str], factor: int) -> int:
    table = pq.read_table(src)
    os.makedirs(dst_dir, exist_ok=True)
    total = 0
    for r in range(factor):
        rep = table
        for k in keys:
            idx = rep.schema.get_field_index(k)
            shifted = pc.add(
                pc.cast(rep.column(k), pa.int64()), pa.scalar(r * KEY_OFFSET)
            )
            # preserve the source dtype (keys are all int64 already, but
            # stay honest if a future fixture uses int32)
            shifted = pc.cast(shifted, rep.schema.field(k).type)
            rep = rep.set_column(idx, rep.schema.field(k), shifted)
        out = os.path.join(dst_dir, f"part-{r:03d}.parquet")
        pq.write_table(rep, out, row_group_size=131_072)
        total += rep.num_rows
    return total


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    for t in FIXED:
        shutil.copyfile(
            os.path.join(args.src, f"{t}.parquet"),
            os.path.join(args.dst, f"{t}.parquet"),
        )
        print(f"{t}: copied (dimension, fixed)")
    for t, keys in KEYED.items():
        n = replicate_table(
            os.path.join(args.src, f"{t}.parquet"),
            os.path.join(args.dst, f"{t}.parquet"),
            keys,
            args.factor,
        )
        print(f"{t}: {n} rows x keys {keys}")


if __name__ == "__main__":
    main()
