"""DataSketches HLL/Theta query tests: estimates land within rated error
of the exact ROLLUP twin, and sketch-merge is lossless vs one global
sketch (the property that makes the materialized-sketch pattern sound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.registry import get
from dataflowjavasdk_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF


def test_hll_rollup_matches_exact_within_rated_error(spark):
    """The query now carries its own accuracy verdict (lgK=14 HLL rated
    RSE ~0.8%; the in-plan bound is 5%): every scope — including the
    sketch-UNION 'ALL' row — must verify, and the exact counts must agree
    with the exact-twin query."""
    exact = {
        r["scope"]: r["exact_users"]
        for r in get("distinct_users_rollup").fn(spark, SMOKE_SF).collect()
    }
    rows = get("hll_distinct_rollup").fn(spark, SMOKE_SF).collect()
    assert {r["scope"] for r in rows} == set(exact)
    for r in rows:
        assert r["within_5pct"], r["scope"]
        assert r["exact_users"] == exact[r["scope"]], r["scope"]


def test_hll_union_of_parts_equals_global_sketch(spark):
    """Merge losslessness: union(per-type sketches) estimates exactly what
    one sketch over all rows estimates (same lgK → same registers)."""
    events = load_table(spark, SMOKE_SF, "events")
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("est")
    ).collect()[0]["est"]
    assert merged == direct


def test_theta_overlap_matches_exact_set_algebra(spark):
    events = load_table(spark, SMOKE_SF, "events")
    users = lambda t: {  # noqa: E731
        r["user_id"]
        for r in events.filter(F.col("event_type") == t).select("user_id").distinct().collect()
    }
    clicks, buys = users("click"), users("purchase")
    got = get("theta_audience_overlap").fn(spark, SMOKE_SF).collect()[0]
    assert got["exact_union"] == len(clicks | buys)
    assert got["exact_overlap"] == len(clicks & buys)
    assert got["exact_click_only"] == len(clicks - buys)
    # Theta is exact until the sketch saturates (4096 retained hashes);
    # these cardinalities are far below that, so every verdict holds.
    assert got["union_ok"] and got["overlap_ok"] and got["click_only_ok"]


def test_countmin_is_mergeable_and_one_sided(spark):
    """CM counters built on two half-corpora and ADDED cell-wise must
    equal the counters built on the union (the mergeability that makes CM
    the 100 TB frequency sketch), and every estimate must be >= the exact
    count (one-sided error)."""
    from pyspark.sql import functions as F

    from dataflowjavasdk_spark.functions import text as T
    from dataflowjavasdk_spark.queries.registry import get
    from dataflowjavasdk_spark.queries.sketches import _CM_D, _CM_W
    from dataflowjavasdk_spark.sources.tables import load_table
    from tests.conftest import SMOKE_SF

    docs = load_table(spark, SMOKE_SF, "documents")

    def counters(df):
        tk = df.select(F.explode(T.tokens("text")).alias("tok")).withColumn(
            "h", F.md5("tok")
        )
        pos = tk.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            (
                                F.conv(F.substring("h", 1 + 4 * j, 4), 16, 10)
                                .cast("long")
                                % _CM_W
                            ).alias("pos"),
                        )
                        for j in range(_CM_D)
                    ]
                )
            ).alias("jp")
        ).select(F.col("jp.j").alias("j"), F.col("jp.pos").alias("pos"))
        return {
            (r["j"], r["pos"]): r["c"]
            for r in pos.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c")).collect()
        }

    whole = counters(docs)
    a = counters(docs.filter(F.col("doc_id") % 2 == 0))
    b = counters(docs.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole

    for r in get("countmin_term_frequencies").fn(spark, SMOKE_SF).collect():
        assert r["cm_est"] >= r["exact_n"]


def test_kll_merged_quantiles_within_rated_rank_error(spark):
    """KLL mergeability: quantiles read from a MERGE of per-key sketches
    honor the rated rank error against the exact distribution (unlike HLL
    unioning, KLL merge-compaction is not bit-identical to a single global
    build, so the contract is the error bound, not equality)."""
    events = load_table(spark, SMOKE_SF, "events")
    merged_sk = (
        events.groupBy("event_type")
        .agg(F.kll_sketch_agg_double("value", F.lit(200)).alias("sk"))
        .agg(F.kll_merge_agg_double("sk").alias("sk"))
    )
    est = merged_sk.select(
        F.kll_sketch_get_n_double("sk").alias("n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
    ).collect()[0]
    total = events.count()
    assert est["n"] == total  # the sketch absorbed every row
    for target, q in ((0.5, est["p50"]), (0.9, est["p90"])):
        achieved = (
            events.agg(
                F.avg((F.col("value") <= F.lit(q)).cast("double")).alias("r")
            ).collect()[0]["r"]
        )
        assert abs(achieved - target) <= 0.025, (target, q, achieved)
