"""wikistream_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
WikiStream-Lakehouse pipeline (streaming ingest → bronze/silver/gold
lakehouse → aggregate serving; see SURVEY.md) as one idiomatic PySpark
library, extended with the relational surface (joins/windows/set-ops) and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory + session conf pinning (UTC etc.)
    schema.py     explicit StructTypes (wiki event record, props, ...)
    tables.py     parquet table loaders for the test fixtures
    queries/      registered query surface (each query: Spark build + SQL oracle)
    operators/    custom operators (minhash, simhash, topk, asof, vectors)
    lakehouse/    bronze/silver/gold writers, partition overwrite, MERGE upsert
    streaming/    structured-streaming ingest, windows, stateful dedup
    functions/    reusable column-expression builders (JVM-side first)
"""

__version__ = "0.1.0"
