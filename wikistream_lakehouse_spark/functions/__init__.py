"""Reusable column-expression builders — JVM-side first (SURVEY.md §2.8).

Everything here returns Column expressions built from pyspark.sql.functions
(whole-stage codegen, no Python in the hot path). Pandas UDFs appear only
where built-ins genuinely can't express the semantics (see operators/)."""
