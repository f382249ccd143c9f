"""Deterministic corpus sampling primitives for training-data pipelines:
hash split (train/val/test), per-stratum mixture sampling, and a
distributed global shuffle for training order.

Everything is keyed on md5 of the document id — a portable, engine-
independent hash (identical hex in Spark, DuckDB, Python), so every
sampling decision is (a) reproducible across runs and engines, (b)
stable under re-partitioning, and (c) expressible in the ANSI-SQL
oracle. Spark's builtin ``hash``/``xxhash64`` are faster but engine-
specific; md5 over a short id string is still codegen'd JVM work and
at 100 TB the scan, not the hash, dominates.

Scale shape:
  * split/sample are stateless per-row predicates — no shuffle at all;
    they ride on the scan and push no state anywhere.
  * the shuffle operator is ``repartitionByRange`` on the hash key +
    ``sortWithinPartitions`` — a range-partitioned total order (every
    partition p holds keys < partition p+1, sorted within), which is
    how you lay out a 100 TB corpus in training order without ever
    sorting it on one task. Writers then emit one shard per partition.

Reference parity: the reference has no sampling layer (its corpus is
one wiki stream); these are the operations SURVEY §6 scopes for the
LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Width of the hex prefix compared against thresholds: 8 hex chars =
#: 32 bits of the md5 — fraction resolution 2**-32, plenty for sampling.
_PREFIX = 8


def fraction_threshold(frac: float) -> str:
    """Hex threshold such that P[md5_prefix < threshold] ~= frac.

    Returned as a lowercase zero-padded hex *string*; the comparison is
    plain string ordering, identical in Spark and any SQL engine.
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {frac}")
    n = int(round(frac * (16**_PREFIX)))
    if n >= 16**_PREFIX:
        # 'g' sorts after every hex digit: keeps ALL rows (frac == 1.0);
        # naive formatting would wrap to 9 chars and truncate to ~6%.
        return "g"
    return format(n, f"0{_PREFIX}x")


def hash_key(id_col: Column, salt: str = "") -> Column:
    """The sampling key: first 8 hex chars of md5(salt || id)."""
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, _PREFIX)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split:",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by deterministic hash bucketing.

    ``fractions`` maps split name -> fraction; they must sum to 1.  The
    assignment is a pure row-local expression (no shuffle, no state):
    a row lands in the first split whose cumulative threshold exceeds
    its hash prefix.  Adding documents never moves an existing document
    between splits — the property that keeps eval sets uncontaminated
    as a 100 TB corpus grows.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key = hash_key(F.col(id_col), salt)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        thr = fraction_threshold(cum)
        cond = key < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_case_sql(id_expr: str, fractions: dict[str, float], salt: str = "split:") -> str:
    """The oracle-side CASE expression equivalent to :func:`hash_split`."""
    cum = 0.0
    arms = []
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        arms.append(
            f"WHEN substr(md5('{salt}' || CAST({id_expr} AS VARCHAR)), 1, {_PREFIX})"
            f" < '{fraction_threshold(cum)}' THEN '{name}'"
        )
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix:",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (data mixing).

    ``fractions`` maps stratum value -> keep fraction.  This is the
    mixture-weights step of a pretraining pipeline ("50% en, 20% de,
    ..."): a broadcast-free row-local filter — each row needs only its
    own stratum value and hash, so the plan is scan -> filter with full
    predicate pushdown around it.
    """
    key = hash_key(F.col(id_col), salt)
    thr = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == value
        lit = F.lit(fraction_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(fraction_threshold(default_fraction)))
    return df.filter(key < thr)


def sample_case_sql(
    id_expr: str,
    stratum_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix:",
) -> str:
    """Oracle-side predicate equivalent to :func:`stratified_sample`."""
    arms = " ".join(
        f"WHEN {stratum_expr} = '{value}' THEN '{fraction_threshold(frac)}'"
        for value, frac in fractions.items()
    )
    return (
        f"substr(md5('{salt}' || CAST({id_expr} AS VARCHAR)), 1, {_PREFIX})"
        f" < (CASE {arms} ELSE '{fraction_threshold(default_fraction)}' END)"
    )


def training_order(
    df: DataFrame,
    id_col: str,
    seed: str = "epoch0",
    num_shards: int | None = None,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle: a total training order over the corpus.

    Emits ``key_col`` = md5-prefix of (seed, id) and returns the frame
    range-partitioned and sorted by it: partition i holds keys below
    partition i+1, rows sorted within — a distributed total order with
    NO single-task global sort (the classic scale bomb).  Each epoch is
    a new ``seed``.  Downstream writers emit one shard per partition.
    """
    out = df.withColumn(key_col, hash_key(F.col(id_col), f"{seed}:"))
    shards = num_shards or out.sparkSession.sparkContext.defaultParallelism
    # Secondary sort on the id column breaks md5-prefix ties
    # deterministically: a 32-bit prefix collision between two docs
    # would otherwise leave their relative order partition-placement-
    # dependent, flipping ordered comparisons as the corpus grows.
    return out.repartitionByRange(shards, key_col).sortWithinPartitions(
        key_col, id_col
    )
