"""Oracle-check at SCALE, not just time (VERDICT r4 #5): the driver
oracles sf0.01 and the sf1 scaling run verified only the dedup outputs —
scale-DEPENDENT wrongness (integer overflow in hand-rolled rank math,
float drift in big sums, LIMIT without a total order that happens to be
stable on small data, as-of windows whose ties only appear with denser
timestamps) would slip through. This suite runs the riskiest scored
shapes at sf0.1 (10× the driver's oracle scale) against DuckDB.

Slow-marked: ~10× the data of the fast oracle loop.
"""

from __future__ import annotations

import pytest

from tests.conftest import assert_matches_oracle
from wikistream_lakehouse_spark.queries import all_queries

QUERIES = all_queries()

SF01_DIR = "/root/testdata/sf0.1"

#: Chosen for scale-dependent failure modes, not coverage:
#:   price_percentiles        — two-pass exact rank: off-by-one/overflow in
#:                              rank arithmetic only bites at bigger N
#:   daily_top_titles         — Top-N with tie-breaks: an under-specified
#:                              order is stable at 10k rows, not at 100k
#:   pricing_summary          — wide float sums: drift grows with row count
#:   purchase_click_attribution — as-of join: tie/window edges need dense
#:                              timestamps to trigger
#:   session_windows_per_user — gap sessionization: session merges change
#:                              shape as density rises
#:   skewed_cohort_stats      — salted join: salt fan-out must stay
#:                              result-invariant as the hot key grows
SCALE_RISK_QUERIES = [
    "price_percentiles",
    "daily_top_titles",
    "pricing_summary",
    "purchase_click_attribution",
    "session_windows_per_user",
    "skewed_cohort_stats",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", SCALE_RISK_QUERIES)
def test_query_matches_oracle_at_sf01(name, spark):
    q = QUERIES[name]
    assert q.oracle is not None
    df = q.build(spark, SF01_DIR)
    assert_matches_oracle(df, q.oracle, SF01_DIR)
