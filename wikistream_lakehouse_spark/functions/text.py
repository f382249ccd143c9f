"""Text-analysis column expressions (SURVEY.md §2.9 X4) — all JVM-side.

Tokenization, shingling, quality scoring, token counting and fingerprinting
as pure Column builders: they compile into whole-stage-codegen'd expressions,
so at 100 TB they run at scan speed with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal function-word list for quality scoring over the synthetic corpus
#: (FIXTURES.md documents vocab); swap for a real stopword list in prod.
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization; empty strings dropped."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, sep), lambda t: t != "")


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (word k-grams) of a token array.

    Built with sequence+transform+slice — a higher-order expression, not a
    UDF. Documents shorter than k tokens yield an empty array.
    """
    n = F.size(toks)
    idx = F.when(
        n >= k, F.sequence(F.lit(0), n - k)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def char_ngrams(text: Column | str, n: int = 2) -> Column:
    """Distinct character n-grams of a string (language-ID features).

    Implemented as n offset-shifted non-overlapping `regexp_extract_all`
    passes unioned together (offset i captures the grams starting at
    positions ≡ i mod n) — stays in whole-stage codegen. The obvious
    sequence+transform+substring form evaluates interpreted per character
    and measures ~5× slower on a corpus scan."""
    col = F.col(text) if isinstance(text, str) else text
    pattern = F.lit("." * n)
    parts = [
        F.regexp_extract_all(
            col if i == 0 else F.substring(col, i + 1, 2**31 - 1 - n), pattern, 0
        )
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = F.array_union(out, p)
    return F.array_distinct(out)


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def type_token_ratio(toks: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens (0.0 for empty)."""
    return F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(F.lit(0.0))


def avg_token_len(toks: Column) -> Column:
    """Mean token length in characters (0.0 for empty docs)."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation (0.0 for empty strings)."""
    col = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def whitespace_token_count(text: Column | str) -> Column:
    """Token count by whitespace splitting (long)."""
    return F.size(tokens(text)).cast("long")


def subword_token_estimate(text: Column | str, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token-count estimate: ceil(chars / chars_per_token) — the
    standard cheap proxy when no tokenizer model is in the cluster."""
    col = F.col(text) if isinstance(text, str) else text
    return F.ceil(F.length(col) / F.lit(chars_per_token)).cast("long")


def quality_score(text_col: Column | str) -> Column:
    """Composite document quality in [0,1]: length sweet-spot, lexical
    diversity, and non-stopword density — the usual pretraining-filter
    heuristics expressed as one codegen'd expression."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(col)
    n = F.size(toks)
    len_score = F.when(n <= 0, F.lit(0.0)).otherwise(
        F.least(n / F.lit(50.0), F.lit(1.0))
        * F.least(F.lit(2000.0) / F.greatest(n.cast("double"), F.lit(1.0)), F.lit(1.0))
    )
    diversity = type_token_ratio(toks)
    density = 1.0 - stopword_ratio(toks)
    return F.round((len_score + diversity + density) / 3.0, 6)


#: Mersenne prime 2^31-1: keeps acc*31 + h well inside a long under Spark
#: 4's ANSI arithmetic (no silent wraparound to rely on).
_FP_MOD = (1 << 31) - 1


def rolling_fingerprint(toks: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    per-token xxhash64 values, mod 2^31-1 (engine-specific hash → ◇
    rows-only)."""
    mod = F.lit(_FP_MOD)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31) + F.pmod(F.xxhash64(t), mod), mod),
    )
