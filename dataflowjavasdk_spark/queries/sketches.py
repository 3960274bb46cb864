"""Mergeable-sketch queries over `events` (SURVEY.md §2.2
ApproximateUnique + the scale path beyond it).

The reference's ApproximateUnique (historical
sdk/transforms/ApproximateUnique.java) is a one-shot estimator; at 100 TB
the pattern that actually matters is MERGEABILITY: build one small sketch
per partition/day/source, store it, and answer rollups by unioning sketches
instead of rescanning raw data. Spark 4 ships Apache DataSketches HLL and
Theta aggregates, which give exactly that:

- HLL: distinct-count rollups (union only — the classic cube-of-uniques).
- Theta: full set algebra (union / intersection / difference) — audience
  overlap between event types, which HLL fundamentally cannot answer.

Sketch estimates are engine-specific by design, so these register as
rows-only driver checks; the SQL-oracled exact twin
(`distinct_users_rollup`, GROUP BY ROLLUP) pins the semantics, and
tests/test_sketches.py asserts the estimates land within rated error of
the exact values and that sketch-merge is lossless vs a single global
sketch.

Plan shape (scale): one shuffle of (group, sketch-bytes) partials —
sketches are a few KB regardless of input size; the merged rollup moves
kilobytes where the exact twin re-shuffles every distinct key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table


@query(
    "distinct_users_rollup",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS scope,
           count(DISTINCT user_id) AS exact_users
    FROM events
    GROUP BY ROLLUP(event_type)
    """,
)
def distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of the HLL rollup: distinct users per event_type plus the
    grand total in one pass via GROUP BY ROLLUP (grouping sets — one
    Expand + one aggregate, not N scans)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.rollup("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("scope"),
            "exact_users",
        )
    )


@query("hll_distinct_rollup")
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL rollup: one DataSketches HLL sketch per event_type,
    estimates per type, and the 'ALL' row produced by UNIONING the per-type
    sketches (hll_union_agg) — never rescanning the input. This is the
    materialized-sketch pattern: store `sk` per day/source, answer any
    rollup by union. Accuracy vs the exact twin asserted in
    tests/test_sketches.py."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    typed = per_type.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    return typed.unionByName(merged)


@query("theta_audience_overlap")
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on Theta sketches: |click ∪ purchase|,
    |click ∩ purchase|, |click \\ purchase| over user_id — computed from two
    per-segment sketches, the question HLL cannot answer and the reason
    Theta exists. At scale: sketch each segment once (KBs), evaluate every
    pairwise overlap from the sketch store."""
    events = load_table(spark, sf_dir, "events")
    segs = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
    )
    wide = segs.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("sk"))).alias("click_sk"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sk"))).alias("purchase_sk"),
    )
    return wide.select(
        F.theta_sketch_estimate(F.theta_union("click_sk", "purchase_sk"))
        .cast("long").alias("approx_union"),
        F.theta_sketch_estimate(F.theta_intersection("click_sk", "purchase_sk"))
        .cast("long").alias("approx_overlap"),
        F.theta_sketch_estimate(F.theta_difference("click_sk", "purchase_sk"))
        .cast("long").alias("approx_click_only"),
    )
