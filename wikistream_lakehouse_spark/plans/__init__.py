"""Plan-shape tooling: stable physical-plan signatures for regression
testing (the CI guard that a future edit can't silently drop a broadcast
or introduce a single-partition sort)."""

from wikistream_lakehouse_spark.plans.signature import plan_signature

__all__ = ["plan_signature"]
