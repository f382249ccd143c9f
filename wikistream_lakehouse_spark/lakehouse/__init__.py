"""Lakehouse layer (SURVEY.md §2.2 sinks, §7 M2): bronze/silver/gold zone
writers with the dual-time model (processing-time `ds` in bronze,
event-time `yyyy/mm/dd` in silver — SURVEY.md §1.3) and idempotent
re-runs via partition overwrite + keyed MERGE.

Delta Lake is the production substrate for MERGE/ACID; it is not present
in this environment, so merge.py implements the same semantics over plain
parquet (documented trade-offs inline) behind the identical API.
"""

from wikistream_lakehouse_spark.lakehouse.bronze import write_bronze
from wikistream_lakehouse_spark.lakehouse.gold import build_daily_gold
from wikistream_lakehouse_spark.lakehouse.merge import upsert_parquet
from wikistream_lakehouse_spark.lakehouse.silver import curate_to_silver

__all__ = ["write_bronze", "curate_to_silver", "build_daily_gold", "upsert_parquet"]
