"""Cross-engine deterministic hashing helpers.

MinHash/SimHash need hash functions that produce IDENTICAL values in Spark
and in the DuckDB oracle.  ``xxhash64``/``hash`` differ between engines, so
we derive 60-bit integers from md5 hex (stable everywhere):

    Spark : cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits → always positive, no bigint overflow under ANSI.
"""

from __future__ import annotations


def spark_md5_60(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def duckdb_md5_60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded(expr: str, seed: int | str, dialect: str) -> str:
    """Hash of ``'<seed>|' || expr`` — family of independent hash functions."""
    salted = f"concat('{seed}', '|', {expr})"
    return spark_md5_60(salted) if dialect == "spark" else duckdb_md5_60(salted)
