"""Text-analysis column functions (tokenize, shingles, quality metrics).

All pure ``pyspark.sql.functions`` — tokenization in the hot path must
never drop to Python at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches the DuckDB oracle spelling: string_split_regex(lower(trim(x)), '\s+')
TOKEN_SPLIT_RE = r"\s+"

# In-corpus function words for stopword-ratio metrics (the harness corpus
# is lowercase word soup; see FIXTURES.md).
STOPWORDS = ("a", "the", "and", "of", "to")


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(col)), TOKEN_SPLIT_RE)


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles: ['a b c', 'b c d', ...]; empty if fewer than n
    tokens. Built with transform over an index sequence — no explode, no
    shuffle."""
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), count)  # 1-based for F.slice
    return F.when(count > 0, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def avg_token_len(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def type_token_ratio(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def bpe_ish_token_count(toks: Column, chars_per_piece: int = 4) -> Column:
    """Deterministic BPE-like token count estimate: each word contributes
    ceil(len/chars_per_piece) pieces (a real BPE vocab isn't in this
    container; the estimate is the standard ~4-chars/token heuristic)."""
    pieces = F.transform(
        toks,
        lambda t: F.ceil(F.length(t) / F.lit(float(chars_per_piece))).cast("long"),
    )
    return F.aggregate(pieces, F.lit(0).cast("long"), lambda a, x: a + x)
