"""Capture .explain("formatted") plans for named queries to files.

Usage:
    python scripts/capture_plans.py OUT_DIR SUFFIX QUERY [QUERY ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query — the before/after
plan evidence an optimization round commits alongside its claims
(guide §1: capture the plan shape before and after every change).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _formatted_plan(df) -> str:
    """`explain("formatted")` output as a string, without reaching through
    version-brittle private JVM helpers (ADVICE r14: PythonSQLUtils'
    signature has shifted across PySpark releases). Redirecting the public
    `df.explain` is the stable path; the JVM-side explainString is kept as
    a fallback for sessions where stdout capture is unavailable."""
    import contextlib
    import io

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = buf.getvalue()
        if out.strip():
            return out
    except Exception:
        pass
    jqe = df._jdf.queryExecution()  # noqa: SLF001 — fallback only
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    from wikistream_lakehouse_spark.queries import all_queries
    from wikistream_lakehouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name].build(spark, sf_dir)
        plan = _formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
