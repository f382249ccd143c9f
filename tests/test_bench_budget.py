"""The bench CLI's wall-budget truncation path (VERDICT r11 #7): when
SPARK_GRAFT_BENCH_BUDGET_SEC stops sweeps early, the artifact must
still materialize — a truncated run with ``runs < n_runs`` beats a
killed process with no BENCH_r{N}.json at all (the fate of rounds 1
and 3). Only the happy path was pinned before; this drives the
truncation itself through the real CLI on a 2-query subset
(SPARK_GRAFT_BENCH_QUERIES) so the test costs one JVM, not a
full-registry sweep."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_budget_truncation_still_emits_valid_artifacts(tmp_path):
    detail_path = str(tmp_path / "detail.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        ),
        SPARK_GRAFT_BENCH_RUNS="5",
        SPARK_GRAFT_BENCH_BUDGET_SEC="1",  # force the early stop
        SPARK_GRAFT_BENCH_QUERIES="limit_scan,global_totals",
        SPARK_GRAFT_BENCH_DETAIL=detail_path,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # stdout is EXACTLY one parseable JSON line, even truncated
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    body = json.loads(lines[0])
    assert body["unit"] == "sec"
    assert set(body["queries"]) == {"limit_scan", "global_totals"}
    assert body.get("errors", {}) == {}
    # the budget stopped sweeps early: fewer timed runs than requested,
    # but at least the guaranteed one
    assert 1 <= body["spread"]["runs"] < 5
    assert "stopping after" in proc.stderr

    # the committed-detail artifact is valid JSON with the same truth
    with open(detail_path) as f:
        detail = json.load(f)
    assert 1 <= detail["runs"] < 5
    assert set(detail["queries"]) == {"limit_scan", "global_totals"}
    assert detail["errors"] == {}
