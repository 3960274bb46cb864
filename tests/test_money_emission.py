"""Pin the cent-exact emission discipline (round-9 sf1 finding).

An exact decimal sum whose value carries MORE significant digits than a
double holds (> ~15.95) exposes engine-specific rounding in the final
decimal→double CAST: Spark goes through BigDecimal.doubleValue()
(correctly rounded), DuckDB through an int128→double→scale-divide path
that can land 1 ulp away. At sf0.01/0.1 the product sums stayed under
the line; at sf1 q1's sum_charge (2.8e10 with 6 fractional digits)
crossed it and hash-mismatched by 3.8e-6.

money()/sql_money() close the class: floor to integer cents while still
exact decimal, convert the exact integer (< 2^53) to double, one
division by 100.0. This test reproduces the hazard at UNIT scale by
constructing a sum with 17 significant digits and asserts the two
engines agree through the money path — so the regression class stays
pinned without needing the sf1 fixture set.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.helpers import money, sql_money

# 60 values of 12345678.901234 sum to 740740734.074040 — 15 integer+6
# fractional digits > double's 53-bit mantissa capacity once scaled up;
# use bigger magnitude to force >16 sig digits: 99999999.999999 x 300.
VAL = "99999999.999999"
N = 300


@pytest.fixture(scope="module")
def engines(spark):
    df = spark.range(N).select(
        F.lit(VAL).cast("decimal(24,6)").alias("v")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE t AS SELECT CAST('{VAL}' AS DECIMAL(24,6)) AS v "
        f"FROM range({N})"
    )
    return df, con


def test_sum_has_more_digits_than_a_double(engines):
    df, con = engines
    exact = con.execute("SELECT SUM(v) FROM t").fetchone()[0]
    # 29999999999.999700: 17 sig digits — the hazard precondition holds
    assert len(str(exact).replace(".", "").lstrip("0")) >= 17


def test_money_emission_is_engine_identical(engines):
    df, con = engines
    spark_val = df.agg(money(F.sum("v")).alias("m")).collect()[0]["m"]
    duck_val = con.execute(
        f"SELECT {sql_money('SUM(v)')} FROM t"
    ).fetchone()[0]
    assert spark_val == duck_val  # bitwise, not approx


def test_money_is_cent_floor_of_exact_sum(engines):
    df, con = engines
    spark_val = df.agg(money(F.sum("v")).alias("m")).collect()[0]["m"]
    from decimal import Decimal

    exact = Decimal(VAL) * N
    cents = int(exact * 100)  # floor for positive values
    assert spark_val == float(cents) / 100.0
