"""Helpers shared by query implementations.

The exact-decimal pattern: a double column with ≤`scale` fractional digits
(all fixture money/qty columns are 2dp, events.value ≤6dp — FIXTURES.md) is
cast to DECIMAL, summed exactly (associative ⇒ order-independent), and the
final value emitted as DOUBLE. DuckDB oracles use the identical casts, so
both engines produce bit-identical doubles and the driver's value-hash
matches deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal SUM emitted as double. Oracle twin:
    CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def davg(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact-sum average emitted as double (single IEEE division). Oracle:
    CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(*)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double") / F.count(F.lit(1))


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal arithmetic.

    Casts sized so Spark's decimal-precision rules never round:
    (12,2) * (1-(4,2)→(5,2)) → (18,4); summed exactly.
    """
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


def charge() -> Column:
    """l_extendedprice * (1-l_discount) * (1+l_tax) exactly: (18,4)*(5,2)→(24,6)."""
    return disc_price() * (
        F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(4,2)")
    )


# Oracle-side SQL fragments (DuckDB), mirroring the casts above.
SQL_DISC_PRICE = (
    "(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))"
)
SQL_CHARGE = (
    f"({SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))"
)


def sql_dsum(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
