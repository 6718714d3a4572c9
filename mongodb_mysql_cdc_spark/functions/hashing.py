"""Deterministic, engine-portable hashing primitives.

Everything LLM-dedup needs (MinHash seeds, SimHash bits, rolling
fingerprints) reduces to one portable primitive: a 60-bit integer hash
both Spark and DuckDB compute identically from md5:

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)

(xxhash64 would be faster but DuckDB 1.0 lacks it; md5 keeps every
signature oracle-checkable. Hash families come from ``md5_halves``:
a Carter-Wegman affine construction over one digest.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_003  # prime; keeps the rolling fold in int64
MINHASH_P = 2_147_483_647  # 2^31-1, prime: affine-family modulus (int64-safe)


def py_hash60(s: str) -> int:
    """Python spelling of ``hash60`` (bit-identical) — for baking
    deterministic constants (e.g. LSH hyperplane signs) into plans at
    build time instead of hashing at runtime."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_halves(col: Column) -> tuple[Column, Column]:
    """The two independent 60-bit halves of one md5, each reduced mod
    MINHASH_P. One digest per value feeds a whole Carter-Wegman affine
    hash family h_k = (a + k·b) mod P — 8 minhash functions for the price
    of one md5 (vs one digest per family member)."""
    digest = F.md5(col)
    a = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long") % MINHASH_P
    b = F.conv(F.substring(digest, 17, 15), 16, 10).cast("long") % MINHASH_P
    return a, b


def sql_md5_halves(expr: str) -> tuple[str, str]:
    """DuckDB spelling of ``md5_halves`` (bit-identical)."""
    a = f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT) % {MINHASH_P}"
    b = f"CAST(concat('0x', substr(md5({expr}), 17, 15)) AS BIGINT) % {MINHASH_P}"
    return a, b


def hash60(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    """DuckDB spelling of ``hash60`` (bit-identical)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def rolling_fingerprint(tokens: Column) -> Column:
    """Order-sensitive document fingerprint: left fold
    acc = (acc*31 + hash60(tok) % M) % M over the token sequence.
    Two documents with the same bag but different order get different
    fingerprints (unlike MinHash)."""
    hashed = F.transform(tokens, lambda t: hash60(t) % FINGERPRINT_MOD)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def sql_rolling_fingerprint(tokens_expr: str) -> str:
    """DuckDB spelling. list_reduce has no init and starts from the first
    element — identical to our fold from 0 because (0*31 + h1) == h1."""
    h = sql_hash60("t")
    return (
        f"list_reduce(list_transform({tokens_expr}, t -> {h} % {FINGERPRINT_MOD}),"
        f" (acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD})"
    )
