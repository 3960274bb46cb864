"""Semantic invariants for the event-analytics batch (queries/analytics.py)
— conservation and monotonicity properties the oracle equality check can't
express without repeating the same SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.registry import get
from dataflowjavasdk_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF


def test_transition_matrix_conserves_events(spark):
    """Each user with k events contributes exactly k-1 transitions, so
    sum(n) over the matrix == total events - active users."""
    ev = load_table(spark, SMOKE_SF, "events")
    total = ev.count()
    users = ev.select("user_id").distinct().count()
    matrix = get("event_transition_matrix").fn(spark, SMOKE_SF).collect()
    assert sum(r["n"] for r in matrix) == total - users
    types = {
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    }
    for r in matrix:
        assert r["prev_type"] in types and r["next_type"] in types


def test_inactivity_gaps_conserve_span(spark):
    """Per user, total_gap_us must equal last_ts - first_ts exactly (gaps
    partition the activity span), and n_gaps = n_events - 1."""
    ev = load_table(spark, SMOKE_SF, "events")
    spans = {
        r["user_id"]: (r["span"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("span"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    out = get("user_inactivity_gaps").fn(spark, SMOKE_SF).collect()
    for r in out:
        span, n = spans[r["user_id"]]
        assert r["total_gap_us"] == span
        assert r["n_gaps"] == n - 1
        assert 0 <= r["max_gap_us"] <= span


def test_funnel_stages_are_monotone(spark):
    """n_sessions >= n_with_click >= n_converted >= 0, and n_sessions
    matches an independent session count."""
    row = get("session_funnel_click_purchase").fn(spark, SMOKE_SF).collect()[0]
    assert row["n_sessions"] >= row["n_with_click"] >= row["n_converted"] >= 0
    ev = load_table(spark, SMOKE_SF, "events")
    n_sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().count()
    )
    assert row["n_sessions"] == n_sessions


def test_retention_cohort_week0_is_cohort_size(spark):
    """Every cohort has a week_offset=0 row counting the full cohort, and
    later-week counts never exceed it."""
    rows = get("weekly_retention_cohorts").fn(spark, SMOKE_SF).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    ev = load_table(spark, SMOKE_SF, "events")
    total_users = ev.select("user_id").distinct().count()
    assert sum(offsets[0] for offsets in by_cohort.values()) == total_users
    for offsets in by_cohort.values():
        assert 0 in offsets
        for off, n in offsets.items():
            assert n <= offsets[0]


def test_table_profile_matches_direct_counts(spark):
    """Every profile metric equals an independently computed value on the
    clean fixture (including the violation counters being exactly 0 —
    asserting them pins the polarity of the null/range checks: an
    inverted isNull/<= condition would read n_rows, not 0)."""
    row = get("table_profile_orders").fn(spark, SMOKE_SF).collect()[0]
    od = load_table(spark, SMOKE_SF, "orders")
    n = od.count()
    assert row["n_rows"] == n
    assert row["distinct_custkeys"] == od.select("o_custkey").distinct().count()
    assert (
        row["distinct_priorities"]
        == od.select("o_orderpriority").distinct().count()
    )
    mm = od.agg(
        F.min(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("lo"),
        F.max(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("hi"),
    ).collect()[0]
    assert row["min_price"] == mm["lo"] and row["max_price"] == mm["hi"]
    # Clean fixture: violation counters must be 0, not n_rows (polarity).
    assert row["null_custkey"] == 0
    assert row["null_totalprice"] == 0
    assert row["nonpositive_prices"] == 0
    assert 0 < row["min_price"] <= row["max_price"]


def test_fk_audit_edge_nonunique_parent_exact_counts(spark):
    """The silent-miscount regression the FK audit exists to catch: a
    parent with DUPLICATED keys must not inflate n_child through join
    multiplicity, and the dup shows up as n_parent_dups."""
    from dataflowjavasdk_spark.queries.analytics import fk_audit_edge

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (99,)], "k long"
    )
    # parent key 1 appears 3x, key 2 twice, key 3 once; 99 missing
    parent = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (2,), (3,)], "p long"
    )
    row = fk_audit_edge("child.k -> parent", child, "k", parent, "p").collect()[0]
    assert row["n_child"] == 5          # NOT 3*2 + 2 + 1 + 1 = 10
    assert row["n_orphans"] == 1        # only 99
    assert row["n_parent_dups"] == 2    # keys 1 and 2
    assert abs(row["orphan_share"] - 0.2) < 1e-12

    # unique-parent negative control: dups report 0
    uniq = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    row = fk_audit_edge("e", child, "k", uniq, "p").collect()[0]
    assert (row["n_child"], row["n_orphans"], row["n_parent_dups"]) == (5, 1, 0)
