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


@query(
    "hll_distinct_rollup",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS scope,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY ROLLUP(event_type)
    """,
)
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL rollup: one DataSketches HLL sketch per event_type,
    estimates per type, and the 'ALL' row produced by UNIONING the per-type
    sketches (hll_union_agg) — never rescanning the input. This is the
    materialized-sketch pattern: store `sk` per day/source, answer any
    rollup by union.

    Sketch estimates are engine-specific, so (as with
    approx_distinct_users) the query emits the exact count plus the
    accuracy verdict |approx − exact| ≤ 5%·exact computed in-plan — the
    sketch build, the union-merge, AND the estimate all still execute
    here; the oracle asserts every verdict TRUE, turning the rated-error
    claim into a driver-checked row (lgK=14 rated RSE ≈ 0.8%)."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    typed = per_type.select(
        F.col("event_type").alias("scope"),
        "exact_users",
        F.hll_sketch_estimate("sk").alias("__approx"),
    )
    # ALL row: union of sketches for the estimate; exact grand distinct
    # needs its own pass (per-type exacts don't add — users overlap types).
    exact_all = events.agg(F.countDistinct("user_id").alias("exact_users"))
    merged = (
        per_type.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(F.broadcast(exact_all))
        .select(
            F.lit("ALL").alias("scope"),
            "exact_users",
            F.hll_sketch_estimate("sk").alias("__approx"),
        )
    )
    return typed.unionByName(merged).select(
        "scope",
        "exact_users",
        (
            F.abs(F.col("__approx") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@query(
    "theta_audience_overlap",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT count(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM p)) AS exact_union,
           (SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM p)) AS exact_overlap,
           (SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p)) AS exact_click_only,
           TRUE AS union_ok, TRUE AS overlap_ok, TRUE AS click_only_ok
    """,
)
def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on Theta sketches: |click ∪ purchase|,
    |click ∩ purchase|, |click \\ purchase| over user_id — computed from two
    per-segment sketches, the question HLL cannot answer and the reason
    Theta exists. At scale: sketch each segment once (KBs), evaluate every
    pairwise overlap from the sketch store.

    As with the other sketch queries, estimates are engine-specific, so
    the query emits exact set-algebra counts plus in-plan verdicts that
    each Theta estimate lands within max(2, 5%) of exact — the sketches,
    their union/intersection/difference, and the estimates all still
    execute; the oracle asserts the verdicts, making Theta set algebra
    driver-checked instead of rows-only."""
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
    clicks = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        clicks.unionByName(purchases).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(
            F.broadcast(
                clicks.join(purchases, "user_id", "left_semi")
                .agg(F.count(F.lit(1)).alias("exact_overlap"))
            )
        )
        .crossJoin(
            F.broadcast(
                clicks.join(purchases, "user_id", "left_anti")
                .agg(F.count(F.lit(1)).alias("exact_click_only"))
            )
        )
    )

    def ok(approx: F.Column, exact_col: str) -> F.Column:
        return F.abs(approx - F.col(exact_col)) <= F.greatest(
            F.lit(2.0), 0.05 * F.col(exact_col)
        )

    return wide.crossJoin(F.broadcast(exact)).select(
        "exact_union",
        "exact_overlap",
        "exact_click_only",
        ok(
            F.theta_sketch_estimate(F.theta_union("click_sk", "purchase_sk")),
            "exact_union",
        ).alias("union_ok"),
        ok(
            F.theta_sketch_estimate(F.theta_intersection("click_sk", "purchase_sk")),
            "exact_overlap",
        ).alias("overlap_ok"),
        ok(
            F.theta_sketch_estimate(F.theta_difference("click_sk", "purchase_sk")),
            "exact_click_only",
        ).alias("click_only_ok"),
    )


# Count-Min geometry: d=3 rows x w=1024 counters. Row-r position of a
# token is a 16-bit md5 slice mod w — deterministic and identical in both
# engines, so unlike HLL/Theta the WHOLE sketch is oracle-exact.
_CM_D = 3
_CM_W = 1024


def _cm_positions(df, *keep_cols):
    """Explode a DataFrame carrying an md5 digest column ``h`` into one
    row per CM hash function: (*keep_cols, j, pos). BOTH the counter
    build and the probe side MUST use this one expression — if the two
    sides ever read different slices, estimates silently lose the
    one-sided guarantee."""
    jp = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (
                        F.conv(F.substring("h", 1 + 4 * j, 4), 16, 10).cast("long")
                        % _CM_W
                    ).alias("pos"),
                )
                for j in range(_CM_D)
            ]
        )
    ).alias("jp")
    return df.select(*keep_cols, jp).select(
        *keep_cols, F.col("jp.j").alias("j"), F.col("jp.pos").alias("pos")
    )



@query(
    "countmin_term_frequencies",
    oracle=f"""
    WITH tk AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    positions AS (
      SELECT tok, j,
             (('0x' || substr(md5(tok), 1 + 4 * j, 4))::BIGINT % {_CM_W}) AS pos
      FROM tk CROSS JOIN (SELECT unnest(range(0, {_CM_D})) AS j) js
    ),
    counters AS (
      SELECT j, pos, count(*) AS c FROM positions GROUP BY 1, 2
    ),
    exact AS (
      SELECT tok, count(*) AS exact_n FROM tk GROUP BY tok
    ),
    top AS (
      SELECT tok, exact_n,
             row_number() OVER (ORDER BY exact_n DESC, tok) AS rk
      FROM exact
    )
    SELECT t.tok, t.exact_n, t.rk,
           CAST(MIN(c.c) AS BIGINT) AS cm_est
    FROM top t
    CROSS JOIN (SELECT unnest(range(0, {_CM_D})) AS j) js2
    JOIN counters c
      ON c.j = js2.j
     AND c.pos = (('0x' || substr(md5(t.tok), 1 + 4 * js2.j, 4))::BIGINT % {_CM_W})
    WHERE t.rk <= 10
    GROUP BY t.tok, t.exact_n, t.rk
    """,
)
def countmin_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch — the mergeable FREQUENCY estimator completing the
    sketch family (HLL: distincts; Theta: set algebra; KLL/quantile:
    ranks; CM: per-item counts). Token stream → d=3 hashed counter rows
    of w=1024 (positions are 16-bit md5 slices, one digest per token);
    estimate(tok) = min over rows of its counter — never an
    underestimate, overestimate bounded by collisions (~N/w per row).
    Emitted for the exact top-10 tokens next to their exact counts, so
    the one-sided error property itself is oracle-checked value-for-value
    (the hash arithmetic is cross-engine identical — this sketch needs no
    rows-only concession). Scale: counters aggregate with map-side
    partials into a d*w = 3072-cell relation (constant size — merge two
    corpora by ADDING counters), and the probe side is the already-
    reduced exact top-k."""
    docs = load_table(spark, sf_dir, "documents")
    from dataflowjavasdk_spark.functions import text as T
    from pyspark.sql.window import Window as W

    tk = docs.select(F.explode(T.tokens("text")).alias("tok")).localCheckpoint(
        eager=False
    )  # feeds counters AND the exact top-k
    digested = tk.withColumn("h", F.md5("tok"))
    positions = _cm_positions(digested, "tok")
    counters = positions.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c"))
    exact = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    top = (
        exact.withColumn(
            "rk", F.row_number().over(W.orderBy(F.col("exact_n").desc(), "tok"))
        )
        .filter(F.col("rk") <= 10)
        .withColumn("h", F.md5("tok"))
    )
    probes = _cm_positions(top, "tok", "exact_n", "rk")
    return (
        probes.join(F.broadcast(counters), ["j", "pos"])
        .groupBy("tok", "exact_n", "rk")
        .agg(F.min("c").cast("long").alias("cm_est"))
    )


@query(
    "kll_quantiles_rollup",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS scope,
           count(*) AS n_rows,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p90_ok
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY ROLLUP(event_type)
    """,
)
def kll_quantiles_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantile rollup (Spark 4 DataSketches KLL aggs) —
    completes the mergeable-sketch quartet (HLL distincts, Theta set
    algebra, Count-Min frequencies, KLL quantiles; VERDICT r3 stretch #9)
    next to the exact twin `approx_quantiles_per_key`.

    One KLL(k=200) sketch of `value` per event_type; p25/p50/p75/p90
    estimated per type AND for the 'ALL' row by MERGING the per-type
    sketches (kll_merge_agg_double) — never rescanning the input. This is
    the sketch-store pattern: persist a few-KB sketch per day/source,
    answer any quantile at any rollup level by merge.

    Correctness contract (same pattern as hll/theta): estimates are
    engine-specific, so the query emits (a) n_rows read FROM THE SKETCH
    (kll_sketch_get_n — exact by construction, proving every row was
    absorbed; the oracle compares it to count(*)) and (b) in-plan rank
    verdicts: the achieved rank of each estimate — avg(value <= q), KLL's
    inclusive-rank semantics — must land within eps=0.025 of the target
    (k=200 rated normalized rank error ~1.65%). The rank-audit pass
    re-reads a 2-column projection once; production would trust the rated
    error and skip it.

    NULL event_type keys are filtered up front (r4 ADVICE): a NULL group
    would coalesce into the merged 'ALL' sentinel AND make the
    `__et.isNull()` join arm match every row twice, double-counting the
    rank audit — the oracle applies the same filter."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    per_type = events.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value", F.lit(200)).alias("sk")
    )
    merged = per_type.agg(F.kll_merge_agg_double("sk").alias("sk")).select(
        F.lit(None).cast("string").alias("event_type"), "sk"
    )
    sketches = per_type.unionByName(merged).select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("scope"),
        F.col("event_type").alias("__et"),
        F.kll_sketch_get_n_double("sk").cast("long").alias("n_rows"),
        *[
            F.kll_sketch_get_quantile_double("sk", F.lit(p)).alias(f"__q{tag}")
            for p, tag in ((0.25, "25"), (0.5, "50"), (0.75, "75"), (0.9, "90"))
        ],
    )
    # Rank audit: scope rows are O(#event_types) — broadcast them against
    # the events projection ('ALL' matches every row) and measure each
    # estimate's achieved inclusive rank.
    ev = events.select("event_type", "value")
    audited = ev.join(
        F.broadcast(sketches),
        (F.col("__et").isNull()) | (F.col("__et") == ev["event_type"]),
    )
    eps = 0.025
    ranks = audited.groupBy("scope", "n_rows").agg(
        *[
            (
                F.abs(
                    F.avg((F.col("value") <= F.col(f"__q{tag}")).cast("double"))
                    - F.lit(p)
                )
                <= eps
            ).alias(f"p{tag}_ok")
            for p, tag in ((0.25, "25"), (0.5, "50"), (0.75, "75"), (0.9, "90"))
        ]
    )
    return ranks.select("scope", "n_rows", "p25_ok", "p50_ok", "p75_ok", "p90_ok")
