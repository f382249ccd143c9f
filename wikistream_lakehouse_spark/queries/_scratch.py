"""Per-process scratch tables for scored queries (VERDICT r9 wrong #3).

Some registered queries exercise the transactional engine and need a
materialized txn table as their fixture (curated silver, two-version
time-travel tables, serving tables fed by MERGE). Those used to land in
bare ``tempfile.mkdtemp`` dirs that outlived the process; everything now
nests under ONE scratch root that an ``atexit`` sweep removes, so a
suite/bench run leaves no ``wsls_*`` dirs behind. Dirs are keyed by
(label, sf_dir) so the driver's determinism probe (each query runs
twice per process) reuses the same fixture instead of re-building it.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="wsls_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(label: str, key: str = "") -> str:
    """A stable scratch directory for (label, key) — created on first
    use, swept at process exit. ``key`` is typically the sf_dir path;
    it is flattened into a filesystem-safe component."""
    safe = key.strip("/").replace("/", "_") or "default"
    d = os.path.join(scratch_root(), label, safe)
    os.makedirs(d, exist_ok=True)
    return d


def scratch_tmp(label: str) -> str:
    """A FRESH scratch directory per call (queries that must rebuild
    their fixture each invocation), still under the swept root — the
    drop-in for bare ``tempfile.mkdtemp(prefix=...)`` leaks."""
    return tempfile.mkdtemp(prefix=f"{label}_", dir=scratch_root())
