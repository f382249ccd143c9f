"""Stable physical-plan signatures.

A signature is the operator skeleton of a plan with everything unstable
(expression ids, paths, statistics, codegen stage numbers) stripped, but
the SCALE-RELEVANT attributes kept:

  * Exchange kind — hash / range / single-partition: a plan that grows
    an ``Exchange:single`` has acquired a serialization point;
  * join operator + join type — a ``BroadcastHashJoin`` decaying into a
    ``SortMergeJoin`` (or worse, a nested loop on a fact-fact edge) is
    exactly the regression this guards against;
  * aggregate flavor — a HashAggregate falling back to
    ObjectHashAggregate/SortAggregate signals a buffering aggregate.

Signatures are committed to tests/plan_signatures.json; the paired test
recomputes them and fails loudly on any drift, pointing at the regen
script. This is the CI form of "run .explain and look at it".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_OP_RE = re.compile(r"^[\s+:\-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)")

_JOIN_TYPES = (
    "Inner",
    "LeftOuter",
    "RightOuter",
    "FullOuter",
    "LeftSemi",
    "LeftAnti",
    "Cross",
    "ExistenceJoin",
)


def _line_signature(line: str) -> str | None:
    m = _OP_RE.match(line)
    if not m:
        return None
    op = m.group(1)
    if op in ("Arguments", "Input", "Output", "Keys", "Functions", "Results"):
        return None  # formatted-mode detail lines, not operators
    if op == "Exchange":
        if "SinglePartition" in line:
            return "Exchange:single"
        if "rangepartitioning" in line:
            return "Exchange:range"
        if "hashpartitioning" in line:
            return "Exchange:hash"
        return "Exchange"
    if "Join" in op:
        for jt in _JOIN_TYPES:
            if f" {jt}" in line:
                return f"{op}:{jt}"
        return op
    return op


def plan_signature(df: DataFrame) -> list[str]:
    """Operator skeleton of ``df``'s (initial) physical plan, top-down."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    sig: list[str] = []
    for line in plan.splitlines():
        if line.startswith("==") or not line.strip():
            continue
        s = _line_signature(line)
        if s is not None:
            sig.append(s)
    return sig
