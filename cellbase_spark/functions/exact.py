"""Order-independent aggregation of double columns.

Floating-point sums depend on summation order, which differs between Spark
(per-partition partial aggregates, partition-count dependent) and any other
engine — and between two runs of Spark itself at different parallelism.
That breaks hash-comparison and, worse, breaks *reproducibility at scale*:
the same query over the same 100 TB would return different low-order bits
on 100 vs 1000 executors.

Fix: sum in DECIMAL (exact, associative => partitioning/engine independent),
rescale the exact sum to a coarse output scale, then cast to double.

Cross-engine cast semantics (probed empirically, 2026-08-13):
- double -> decimal: identical (both round via the decimal repr).
- decimal -> decimal rescale: ties differ (Spark HALF_UP, DuckDB
  HALF_EVEN) — but a tie needs the exact scale-10 sum to end in ...5000
  at the output scale, ~1e-8 probability for real-valued data.
- decimal(25,10) -> double: DIFFERS (DuckDB's hugeint/10^10 division
  loses ulps); decimal(25,2..4) -> double is exact for |x| < 2^53/10^4.
- per-row IEEE +,-,*,/ on identical doubles: bit-identical — never round
  per-row arithmetic, only aggregate through decimal.

DECIMAL(25,10) holds |x| < 10^15 with 10 fractional digits — ample for
TPC-H-style money/qty columns and their ~1e11 sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,10)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact (order-independent) sum of a double column, as double.

    ROUND (not cast) does the rescale: DuckDB's decimal->decimal cast
    TRUNCATES, while ROUND(decimal, n) is half-away-from-zero in both
    engines (probed: 1.005 -> 1.01, -1.005 -> -1.01 in both).
    """
    return (
        F.round(F.sum(_c(col).cast(DEC)), scale).cast("double").alias(alias)
    )


def davg(col: str | Column, alias: str) -> Column:
    """Exact-sum average: (rescaled decimal sum as double) / count.

    Both factors are bit-identical across engines, so the IEEE division
    result is too — no output rounding needed.
    """
    s = F.round(F.sum(_c(col).cast(DEC)), 4).cast("double")
    n = F.count(_c(col))
    return (s / n).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    """Oracle-side rendering of dsum (identical semantics in DuckDB)."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(25,10))), {scale})"
        f" AS DOUBLE) AS {alias}"
    )


def davg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(25,10))), 4) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
