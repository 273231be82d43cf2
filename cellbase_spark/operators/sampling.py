"""Deterministic hash-based sampling / dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run, (b) stable under repartitioning, and
(c) cheap at 100 TB.  Engine-native `df.sample()` fails (a)+(b): it is
seeded per-partition, so adding an executor reshuffles membership.  The
scalable idiom is a *content hash* of the row key modulo a bucket count —
a pure per-row map (no shuffle, no state), identical on every engine that
agrees on the hash.

We reuse the md5 trick proven in operators/dedup.py: Spark's
``conv(substr(md5(x),1,15),16,10)`` and DuckDB's
``('0x'||substr(md5(x),1,15))::BIGINT`` produce the same 60-bit integer,
so sample membership is bit-identical across the engine and the oracle.

Reference analog: none — cellbase (a spreadsheet addon) has no sampling;
this is a north-star LLM-pipeline extension (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(key_expr: str, buckets: int = 100) -> Column:
    """Spark: stable bucket in [0, buckets) from md5 of the key string."""
    return F.expr(hash_bucket_spark_sql(key_expr, buckets))


def hash_bucket_spark_sql(key_expr: str, buckets: int = 100) -> str:
    return (
        f"pmod(cast(conv(substr(md5(cast({key_expr} as string)), 1, 15), 16, 10)"
        f" as bigint), {buckets})"
    )


def hash_bucket_duck_sql(key_expr: str, buckets: int = 100) -> str:
    """DuckDB rendering of the same bucket (md5 hex is byte-identical)."""
    return (
        f"(('0x' || substr(md5(cast({key_expr} as varchar)), 1, 15))::BIGINT"
        f" % {buckets})"
    )


def hash_u60_spark_sql(key_expr: str) -> str:
    """Raw 60-bit hash — a tie-free pseudorandom sort key for exact-k
    deterministic sampling (order by hash == order by a reproducible
    uniform draw)."""
    return (
        f"cast(conv(substr(md5(cast({key_expr} as string)), 1, 15), 16, 10)"
        " as bigint)"
    )


def hash_u60_duck_sql(key_expr: str) -> str:
    return f"('0x' || substr(md5(cast({key_expr} as varchar)), 1, 15))::BIGINT"
