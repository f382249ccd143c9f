"""Custom operators Spark lacks natively (SURVEY.md §2.9 X-ops) — each a
composition of DataFrame primitives where semantics allow (minhash/simhash
LSH, similarity search), falling back to Arrow-batched pandas UDFs only
where built-ins can't express the computation (multimodal decode)."""
