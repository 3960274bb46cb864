"""SQL-surface parity: the oracle SQL of ANSI-expressible queries runs
verbatim on Spark SQL (fixture tables registered as views) and produces
exactly the DataFrame implementation's result — one engine, two equivalent
entry points (the reference had only the fluent API; SURVEY.md §3)."""

from __future__ import annotations

import pytest

from dataflowjavasdk_spark.queries.registry import get
from dataflowjavasdk_spark.sources.tables import register_views
from tests.conftest import SMOKE_SF

# Queries whose oracle SQL is pure ANSI (no DuckDB-only functions).
ANSI_QUERIES = [
    "q1_pricing_summary",
    "q3_join_agg",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_bracket_revenue",
    "count_per_key_events",
    "grouped_stats_nation",
    "topk_per_group",
    "tumbling_hourly_events",
]


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_sql_matches_dataframe(spark, name):
    register_views(spark, SMOKE_SF)
    rq = get(name)
    sql_rows = spark.sql(rq.oracle).collect()
    df_rows = rq.fn(spark, SMOKE_SF).collect()
    norm = lambda rows: sorted(
        tuple(sorted(r.asDict().items())) for r in rows
    )
    assert norm(sql_rows) == norm(df_rows)
