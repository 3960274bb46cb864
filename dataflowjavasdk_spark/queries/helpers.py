"""Helpers shared by query implementations.

The exact-decimal pattern: a double column with ≤`scale` fractional digits
(all fixture money/qty columns are 2dp, events.value ≤6dp — FIXTURES.md) is
cast to DECIMAL, summed exactly (associative ⇒ order-independent), and the
final value emitted as DOUBLE. DuckDB oracles use the identical casts, so
both engines produce bit-identical doubles and the driver's value-hash
matches deterministically.

Round-9 addendum (found by the sf1 gate, not the sf0.01 one): the final
decimal→double CAST itself stops being engine-portable once the exact sum
carries more significant digits than a double holds — sums of decimal
PRODUCTS (scale 4-6) crossed that line at sf1 (~1e10 with 6 fractional
digits = 17 sig digits; q1's sum_charge differed by exactly 1 ulp).
Emission rule since then: product sums go through money()/sql_money() —
floor to integer cents while still exact decimal, convert the exact
integer (< 2^53) to double, divide by 100.0 once. Scale-2 sums (raw
money columns) stay on dsum(): their magnitude would need to exceed
~9e12 before the same hazard returns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal SUM emitted as double. Oracle twin:
    CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def money(sum_col: Column) -> Column:
    """Exact decimal SUM emitted as double at CENT precision — for sums
    of decimal PRODUCTS (disc_price scale 4, charge scale 6).

    Round-9 sf1 finding: an exact decimal sum of ~1e10 with 4-6
    fractional digits carries 16-17 significant digits — more than a
    double holds — and the decimal→double CAST at that point is not
    correctly rounded in every engine (DuckDB converts via int128 →
    double → scale divide, which can land 1 ulp off Spark's BigDecimal
    path; measured on q1's sum_charge at sf1: 3.8e-6 apart on 2.8e10).
    Flooring to integer cents WHILE STILL EXACT DECIMAL, converting the
    exact integer (< 2^53) to double, and dividing by 100.0 once makes
    both engines perform the identical, exactly-representable steps at
    ANY scale factor. Oracle twin: sql_money()."""
    return F.floor(sum_col * 100).cast("long").cast("double") / F.lit(100.0)


def sql_money(sum_expr: str) -> str:
    """DuckDB twin of money(): ``sum_expr`` must be the SUM(...) text.

    The divisor is CAST(100 AS DOUBLE), not the literal 100.0: DuckDB
    types 100.0 as DOUBLE but Spark SQL types it as DECIMAL(4,1), so the
    bare literal would make the same oracle text produce decimal division
    when executed through the engine's SQL entry point
    (tests/test_sql_surface.py runs these twins on Spark too)."""
    return f"(CAST(FLOOR(({sum_expr}) * 100) AS BIGINT) / CAST(100 AS DOUBLE))"


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

# Cent-exact emissions of the product sums (see money()): use these —
# never a bare CAST(SUM(product) AS DOUBLE) — wherever a revenue/charge
# total is emitted or fed into a division.
SQL_SUM_DISC_PRICE = sql_money(f"SUM{SQL_DISC_PRICE}")
SQL_SUM_CHARGE = sql_money(f"SUM{SQL_CHARGE}")


def sql_dsum(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
