"""Plan-shape regression guard: the physical-plan skeletons of the
hottest queries must match the committed baseline
(tests/plan_signatures.json). A failure here means an edit changed a
join strategy, added/removed an exchange, or altered an aggregate flavor
— review it, and if intended regenerate with
``python scripts/regen_plan_signatures.py``."""

from __future__ import annotations

import json
import os

import pytest

from wikistream_lakehouse_spark.plans import plan_signature
from wikistream_lakehouse_spark.queries import all_queries

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "plan_signatures.json")

with open(BASELINE_PATH) as f:
    _BASELINE = json.load(f)

QUERIES = all_queries()


@pytest.fixture(scope="module", autouse=True)
def _fresh_plan_cache(spark):
    """Plan signatures must not depend on suite ordering: a prior test's
    persisted frame cache-matches into a freshly built plan (Spark
    resolves equal analyzed subplans to InMemoryRelation), silently
    changing the signature. Clear the cache once for this module so
    every signature is computed against cold plans — the same state the
    regen script runs in."""
    spark.catalog.clearCache()


def _context_matches() -> bool:
    ctx = _BASELINE["context"]
    return (
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
        == ctx["sf_dir"]
    )


@pytest.mark.parametrize("name", sorted(_BASELINE["signatures"]))
def test_plan_signature_unchanged(spark, name):
    if not _context_matches():
        pytest.skip("baseline generated for a different SF dir")
    expected = _BASELINE["signatures"][name]
    got = plan_signature(QUERIES[name].build(spark, _BASELINE["context"]["sf_dir"]))
    assert got == expected, (
        f"physical-plan shape of {name!r} changed.\n"
        f"  baseline: {expected}\n"
        f"  current : {got}\n"
        "If intended: python scripts/regen_plan_signatures.py and review the diff."
    )
