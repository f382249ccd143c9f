"""Concurrency chaos soak (VERDICT r7 next #7): N driver threads issue
a seeded random mix of append / MoR-merge / CoW+MoR delete / compact /
checkpoint / restore against ONE table, on both log substrates
(PosixLogStore and MemoryLogStore+ObjectDataStore). The existing race
tests are targeted pairs; this sweeps arbitrary interleavings and then
checks order-independent invariants from the COMMITTED log alone:

  * the final row-set equals the serial fold of the committed
    operations in version order (every entry carries enough metadata
    to replay it driver-side),
  * history is linear (contiguous committed versions, every entry
    parseable, every snapshot replayable),
  * after a final vacuum, no orphan data files remain outside the
    retained versions' active sets.

Vacuum itself runs after the threads join — it is destructive to time
travel, so racing it against restore only proves that restore raises
on a vacuumed horizon (a targeted test elsewhere); the soak's subject
is commit-protocol serializability."""

from __future__ import annotations

import os
import random
import threading

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _frame(spark, lo, hi, val):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.lit(float(val)).alias("v"),
        )
        .coalesce(1)
    )


def _run_soak(spark, path, store, seed, n_threads=4, ops_per_thread=8,
              key_base=1000):
    rng = random.Random(seed)
    # pre-generate each thread's op script (seeded => reproducible mix;
    # the INTERLEAVING varies run to run, which is the point — the
    # invariants below hold for every interleaving)
    scripts = []
    next_key = [key_base]
    for t in range(n_threads):
        ops = []
        for i in range(ops_per_thread):
            r = rng.random()
            if r < 0.45:
                lo = next_key[0]
                next_key[0] += 20
                ops.append(("append", lo, lo + 20, t * 100 + i))
            elif r < 0.60:
                lo = next_key[0]
                next_key[0] += 10
                ops.append(("merge", lo - 30, lo - 20, t * 100 + i))
            elif r < 0.72:
                ops.append(("delete_mor", rng.randrange(10)))
            elif r < 0.80:
                ops.append(("delete_cow", rng.randrange(10)))
            elif r < 0.90:
                ops.append(("compact",))
            else:
                ops.append(("checkpoint",))
        scripts.append(ops)

    errors = []

    def worker(ops):
        for op in ops:
            try:
                if op[0] == "append":
                    _, lo, hi, val = op
                    txn.append(
                        _frame(spark, lo, hi, val), path,
                        meta={"soak": {"op": "append", "lo": lo, "hi": hi,
                                       "val": val}},
                        store=store, max_retries=60,
                    )
                elif op[0] == "merge":
                    _, lo, hi, val = op
                    txn.merge_on_read_upsert(
                        spark, path, _frame(spark, lo, hi, val), keys=["k"],
                        meta={"soak": {"op": "merge", "lo": lo, "hi": hi,
                                       "val": val}},
                        store=store, max_retries=60,
                    )
                elif op[0] == "delete_mor":
                    txn.delete_where(
                        spark, path, f"k % 10 = {op[1]}", store=store,
                        mode="mor", max_retries=60,
                    )
                elif op[0] == "delete_cow":
                    txn.delete_where(
                        spark, path, f"k % 10 = {op[1]}", store=store,
                        mode="cow", max_retries=60,
                    )
                elif op[0] == "compact":
                    txn.compact(spark, path, store=store)
                elif op[0] == "checkpoint":
                    txn.checkpoint(path, store=store)
            except txn.CommitConflict:
                pass  # a starved retry budget is allowed, not a wrong answer
            except Exception as exc:  # noqa: BLE001
                errors.append(f"{op}: {type(exc).__name__}: {exc}")

    threads = [threading.Thread(target=worker, args=(s,)) for s in scripts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:5]


def _fold_expected(path, store):
    """Serial driver-side replay of the committed soak ops in version
    order — the ground truth the table must equal."""
    rows: dict[int, float] = {}
    states: dict[int, dict[int, float]] = {}
    for v in txn._committed_versions(path, store):
        e = txn._load_entry(path, v, store) or {}
        op = e.get("op")
        meta = e.get("meta") or {}
        soak = meta.get("soak") or {}
        if op == "append" and soak:
            for k in range(soak["lo"], soak["hi"]):
                rows[k] = float(soak["val"])
        elif op == "merge" and soak:
            for k in range(soak["lo"], soak["hi"]):
                rows[k] = float(soak["val"])
        elif op in ("delete", "update"):
            pred = meta.get("predicate", "")
            # predicates are the soak's own "k % 10 = r" shape
            r = int(pred.split("=")[-1])
            rows = {k: x for k, x in rows.items() if k % 10 != r}
        elif op == "restore":
            rows = dict(states[meta["restoredVersion"]])
        # compact / checkpoint / metadata ops: no row change
        states[v] = dict(rows)
    return rows, states


def _check_invariants(spark, path, store):
    # 1. linear history: contiguous versions, all parseable
    vs = txn._committed_versions(path, store)
    assert vs == list(range(len(vs))), "holes in committed history"
    # 2. final row-set equals the serial fold of committed ops
    expected, states = _fold_expected(path, store)
    collected = txn.read_table(spark, path, store=store).collect()
    assert len(collected) == len({r.k for r in collected}), "duplicate keys"
    got = {r.k: r.v for r in collected}
    assert got == expected, (
        f"final state diverged: {len(got)} rows vs {len(expected)} expected; "
        f"sample diff keys: "
        f"{sorted(set(got) ^ set(expected))[:10]}"
    )
    # 3. a sample of historical snapshots replays to the fold's state
    sample = [v for v in vs if v % max(1, len(vs) // 5) == 0][-4:]
    for v in sample:
        snap = {
            r.k: r.v
            for r in txn.read_table(spark, path, version=v, store=store).collect()
        }
        assert snap == states[v], f"snapshot v{v} diverged"
    # 4. vacuum leaves no orphans: every surviving data file is active
    #    in some retained version
    removed = txn.vacuum(
        path, retain_versions=2, orphan_grace_secs=0, store=store
    )
    head = txn.current_version(path, store)
    active: set = set()
    for v in range(max(0, head - 1), head + 1):
        files, dvs = txn._replay_state(path, v, store)
        active |= set(files) | set(dvs)
    on_disk = {
        os.path.relpath(p, path)
        for p in txn._data().walk_files(path)
        if p.endswith(".parquet")
    }
    orphans = {
        f for f in on_disk - active
        if not f.startswith("_log")
    }
    assert not orphans, f"orphan files survived vacuum: {sorted(orphans)[:5]}"
    # ...and the table still reads correctly after reclamation
    got2 = {
        r.k: r.v for r in txn.read_table(spark, path, store=store).collect()
    }
    assert got2 == expected
    return removed


@pytest.mark.parametrize("substrate", ["posix", "object"])
def test_chaos_soak_serializable_and_orphan_free(
    spark, tmp_path, monkeypatch, substrate
):
    if substrate == "object":
        monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", txn.ObjectDataStore())
        store = txn.MemoryLogStore()
    else:
        store = None
    path = str(tmp_path / "t")
    txn.append(
        _frame(spark, 0, 50, 0),
        path,
        meta={"soak": {"op": "append", "lo": 0, "hi": 50, "val": 0}},
        store=store,
    )
    _run_soak(spark, path, store, seed=20260814)
    # a mid-life ROLLBACK, then a second chaos wave on top of it — the
    # fold must track the restore exactly like any other commit
    head = txn.current_version(path, store)
    txn.restore(path, version=max(0, head - 3), store=store)
    # disjoint key space: appends are BLIND (duplicate keys would be
    # two rows, which is correct append semantics but not this fold's)
    _run_soak(spark, path, store, seed=913, n_threads=3,
              ops_per_thread=5, key_base=10_000)
    # the soak actually exercised the op mix (not 100% lost races)
    ops = {
        (txn._load_entry(path, v, store) or {}).get("op")
        for v in txn._committed_versions(path, store)
    }
    assert {"append", "merge", "delete", "restore"} <= ops, ops
    _check_invariants(spark, path, store)
