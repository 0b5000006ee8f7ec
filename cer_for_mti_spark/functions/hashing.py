"""Portable deterministic hashing shared by the engine and its DuckDB
oracles.

Spark's xxhash64/hash and DuckDB's hash() disagree, so every hash that a
correctness oracle must reproduce is defined as: the first 15 hex digits of
md5 (60 bits, always a non-negative int64), identically expressible as

- Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to long
- DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``
- numpy/python: ``int(hashlib.md5(x).hexdigest()[:15], 16)``

Used for: exact-dedup text hashes, MinHash permutations (seeded by
prefixing the seed), SimHash term hashes, document fingerprints.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_60(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_60_seeded(col: Column | str, seed: int) -> Column:
    """One member of a seeded hash family: md5(seed || ':' || x)."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_60(F.concat(F.lit(f"{seed}:"), c))


def md5_60_sql(expr: str) -> str:
    """DuckDB-SQL twin of md5_60 for oracle queries."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_60_seeded_sql(expr: str, seed: int) -> str:
    return md5_60_sql(f"'{seed}:' || {expr}")


def md5_60_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_60_seeded_py(s: str, seed: int) -> int:
    return md5_60_py(f"{seed}:{s}")
