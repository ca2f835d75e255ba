"""Deterministic, engine-portable 60-bit hashing.

MinHash / SimHash / LSH need a hash function that is (a) stable across
runs and partitionings, (b) cheap JVM-side, and (c) reproducible by the
DuckDB correctness oracle. ``xxhash64``/``hash`` differ per engine, so we
standardize on md5 (identical everywhere) and take the first 15 hex chars
(60 bits — fits a signed 64-bit int in both engines):

  Spark :  conv(substr(md5(x), 1, 15), 16, 10)  -> bigint
  DuckDB:  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

Salting with a seed prefix gives the independent hash families MinHash
needs. md5 costs more than xxhash64 but runs in the JVM per ~100-byte
shingle; at 100 TB the scan + shuffle dominate, not the digest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_HEX_CHARS = 15


def h64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit salted hash of a string column, as bigint.

    Mirrors reference schema-inference's reliance on md5-free string
    munging with a scalable hashed equivalent (no reference analogue —
    this is part of the LLM-data-pipeline extension surface).
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"s{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_CHARS), 16, 10).cast("long")


def h64_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-SQL rendering of :func:`h64` for oracle queries.

    NULL parity: Spark's concat/md5 propagate NULL so h64(NULL) IS
    NULL, but DuckDB's concat SKIPS null arguments — the seeded form
    would hash the bare 's{seed}:' prefix (silent value mismatch) and
    the unseeded form would raise casting '0x'. Guard explicitly."""
    inner = f"concat('s{seed}:', {expr})" if seed is not None else expr
    hashed = f"CAST(concat('0x', substr(md5({inner}), 1, {HASH_HEX_CHARS})) AS BIGINT)"
    return f"(CASE WHEN ({expr}) IS NULL THEN NULL ELSE {hashed} END)"
