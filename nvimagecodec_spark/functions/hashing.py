"""Portable deterministic hashing column expressions.

Everything is built on md5 so the SAME numeric values are computable in
any engine (the DuckDB correctness oracle included) — unlike xxhash64 /
murmur, whose constants differ per engine. Spark evaluates these entirely
JVM-side (whole-stage codegen), no Python.

Reference analog: the parser tier's magic-byte probes and byte-order-aware
field decodes (/root/reference/src/parsers/byte_io.h) — deterministic
functions of raw bytes, engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash32(col: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit hash as a non-negative BIGINT.

    Equivalent DuckDB SQL:
      CAST(('0x' || substring(md5(<seed> || '|' || col), 1, 8)) AS BIGINT)
    """
    payload = F.concat(F.lit(str(seed)), F.lit("|"), col)
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def md5_fingerprint(col: Column) -> Column:
    """Full 128-bit content fingerprint (hex string) of normalized text."""
    return F.md5(col)


def normalize_text(col: Column) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, collapsed
    whitespace, trimmed. (Color-space canonicalization analog,
    /root/reference/src/imgproc/color_space_conversion_impl.h:64-222.)"""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
