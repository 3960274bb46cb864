"""Event-analytics query batch (round 3c): the classic product-analytics
shapes a user of the reference's pipeline model runs daily over event
streams — value histograms, statistical outliers, session funnels, and
retention cohorts. All pure Column expressions; exact-decimal moments so
the z-scores are bit-identical cross-engine (registry.py conventions).

Scale shapes: histogram/z-score are one aggregate each (keys = bins or
types — bounded); the funnel is one session aggregate over the native
session_window (the same single-shuffle shape as session_windows_events);
retention is two aggregates whose second input is one row per
(user, week) — already reduced far below the event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dataflowjavasdk_spark.functions.text import md5_long
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table

_BIN_WIDTH = 50.0


@query(
    "value_histogram_per_type",
    oracle=f"""
    SELECT event_type,
           CAST(floor(value / {_BIN_WIDTH}) AS BIGINT) AS bin,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def value_histogram_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the data-profiling
    pass behind every distribution dashboard. bin = floor(value / width)
    is a single IEEE division + floor (bit-identical cross-engine); one
    aggregate whose key space is (#types x #bins) — bounded regardless of
    corpus size, so the shuffle carries only bin partials at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / _BIN_WIDTH).cast("long").alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


@query(
    "zscore_outliers_per_type",
    oracle="""
    WITH moments AS (
      SELECT event_type,
             count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - m.s1 / m.n)
                 / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n)), 9) AS z
    FROM events e JOIN moments m USING (event_type)
    WHERE abs((e.value - m.s1 / m.n)
              / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n))) > 1.8
    """,
)
def zscore_outliers_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection: per-type z-score from EXACT decimal
    first/second moments (a double stddev_pop would be summation-order-
    dependent; exact sums + a fixed IEEE op sequence — two divisions, one
    sqrt (correctly rounded per IEEE-754), one subtraction — make the
    z-scores bit-identical cross-engine). The moments relation is one row
    per type (broadcastable forever); events scan twice (moments + probe)
    — at 100 TB the moments side is a partial-aggregated shuffle of a few
    bytes per type, and the second scan is unavoidable for any
    two-pass normalization. Threshold 1.8 sigma keeps the output to the
    tail (fixture max |z| ~ 8.7 — the value distribution is right-skewed)
    — the rows a quality gate would clip."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    moments = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (F.col("value") - mean) / std
    return (
        ev.join(moments, "event_type")
        .filter(F.abs(z) > 1.8)
        .select("event_id", "event_type", "value", F.round(z, 9).alias("z"))
    )


@query(
    "session_funnel_click_purchase",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT count(*) AS n_sessions,
           CAST(SUM(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_click,
           CAST(SUM(CASE WHEN first_click IS NOT NULL
                          AND last_purchase >= first_click THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM sessions
    """,
)
def session_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session funnel — the conversion query of product analytics: of all
    30-min-gap sessions, how many contain a click, and how many convert
    (a purchase at-or-after the session's first click)? One native
    session_window aggregate computes per-session first-click and
    last-purchase timestamps (conversion = last_purchase >= first_click —
    no per-event ordering state needed), then a global 1-row rollup.
    Identical single-shuffle shape as session_windows_events; the second
    aggregate's input is one row per session."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("first_click").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_click"),
        F.sum(
            F.when(
                F.col("first_click").isNotNull()
                & (F.col("last_purchase") >= F.col("first_click")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_converted"),
    )


@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH user_weeks AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    ),
    cohorts AS (
      SELECT user_id, min(week) AS cohort_week FROM user_weeks GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST(datediff('day', c.cohort_week, u.week) / 7 AS BIGINT)
             AS week_offset,
           count(*) AS n_users
    FROM user_weeks u JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort triangle: users grouped by their first active week
    (cohort), counted in every later week they return — the growth
    analytics staple. Both engines truncate weeks to Monday; the offset is
    exact integer day arithmetic / 7. Three aggregates, but inputs shrink
    fast: distinct (user, week) is already ~ users x weeks, the cohort
    relation is one row per user — at 100 TB the event scan dominates and
    everything downstream is orders of magnitude smaller."""
    ev = load_table(spark, sf_dir, "events")
    user_weeks = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("week"))
        .distinct()
        # referenced by the cohort aggregate AND the final join (two-branch
        # recompute discipline, SCALE.md #7)
        .localCheckpoint(eager=False)
    )
    cohorts = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        user_weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "unpivot_daily_type_counts",
    oracle=f"""
    WITH pivoted AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) FILTER (event_type = 'click') AS click,
             count(*) FILTER (event_type = 'view') AS view,
             count(*) FILTER (event_type = 'purchase') AS purchase,
             count(*) FILTER (event_type = 'signup') AS signup,
             count(*) FILTER (event_type = 'error') AS error
      FROM events GROUP BY 1
    )
    SELECT day, event_type, CAST(n AS BIGINT) AS n
    FROM (UNPIVOT pivoted ON {", ".join(_EVENT_TYPES)}
          INTO NAME event_type VALUE n)
    """,
)
def unpivot_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the §2.10 inverse of pivot_daily_type_counts): wide
    per-day type counts back to long (day, event_type, n) rows — both
    engines' native UNPIVOT, so the pivot↔unpivot pair round-trips
    entirely inside the plan (including the explicit zero rows a pivot
    materializes for absent combinations, which a plain GROUP BY would
    omit). Unpivot is a row-local Expand — zero additional shuffles after
    the pivot aggregate."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(t)
        for t in _EVENT_TYPES
    ]
    pivoted = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(*aggs)
    return pivoted.unpivot(["day"], list(_EVENT_TYPES), "event_type", "n")


@query(
    "weighted_sample_per_source",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE
               / n_chars::DOUBLE AS rank_key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_chars, rank_key,
             row_number() OVER (PARTITION BY source
                                ORDER BY rank_key, doc_id) AS rk
      FROM keyed
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rk
    FROM ranked WHERE rk <= 20
    """,
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-biased sampling: keep the 20 docs per source
    with the smallest md5(doc_id)/weight rank (weight = n_chars, so
    longer documents are proportionally likelier to survive — the
    quality-weighted downsampling step of a data recipe, made replayable).
    Like deterministic_sample_per_key but weight-biased: the rank key is
    one bigint→double conversion and one IEEE division (both correctly
    rounded, bit-identical cross-engine); sampling any corpus twice
    yields byte-identical output — the property that makes a 100 TB
    recipe auditable. One shuffle (per-source window over a projection);
    at scale a per-partition top-k pre-reduction bounds the window
    input."""
    docs = load_table(spark, sf_dir, "documents")
    rank_key = md5_long(F.col("doc_id").cast("string")).cast("double") / F.col(
        "n_chars"
    ).cast("double")
    w = W.partitionBy("source").orderBy("rank_key", "doc_id")
    return (
        docs.select(
            "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
            rank_key.alias("rank_key"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .drop("rank_key")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: per-user consecutive event-type
    bigrams (ordered by time, event_id tiebreak so the lag is
    deterministic under equal timestamps) counted corpus-wide — the
    Markov-chain estimate behind next-action models and bot detection.
    One window shuffle on user_id, then an aggregate whose key space is
    #types² — constant. At 100 TB per-user ordering state is one
    partition's rows (the same bound as secondary sort)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "user_inactivity_gaps",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events
    )
    SELECT user_id,
           count(*) AS n_gaps,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def user_inactivity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap profile per user: consecutive-event gaps in exact
    integer microseconds (no float duration arithmetic — the same
    exactness discipline as session_stats_per_user), rolled up to count
    / max / total. The churn-risk feature extraction of event analytics;
    one window shuffle + one aggregate, both keyed by user."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
        )
    )


@query(
    "table_profile_orders",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_custkey,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_totalprice,
           count(DISTINCT o_orderpriority) AS distinct_priorities,
           count(DISTINCT o_custkey) AS distinct_custkeys,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS max_price,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nonpositive_prices
    FROM orders
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality profile (the Deequ/expectation-suite
    pattern): row count, per-column null counts, distinct cardinalities,
    exact min/max, and a range-violation count — the checks a 100 TB
    ingest runs before publishing a table. ALL metrics fold into ONE
    aggregate over one scan (count-distinct rewrites to expand+two-phase
    agg inside the same job); nothing is collected row-by-row."""
    od = load_table(spark, sf_dir, "orders")
    return od.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_totalprice"),
        F.countDistinct("o_orderpriority").alias("distinct_priorities"),
        F.countDistinct("o_custkey").alias("distinct_custkeys"),
        F.min(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("min_price"),
        F.max(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("max_price"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_prices"),
    )


@query(
    "key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    top10 AS (
      SELECT sum(n) AS top10_n
      FROM (SELECT n FROM counts ORDER BY n DESC, user_id LIMIT 10)
    )
    SELECT (SELECT sum(n) FROM counts)::BIGINT AS n_rows,
           (SELECT count(*) FROM counts)::BIGINT AS n_keys,
           round((SELECT max(n) FROM counts)::DOUBLE
                 / (SELECT sum(n) FROM counts)::DOUBLE, 9) AS top1_share,
           round((SELECT top10_n FROM top10)::DOUBLE
                 / (SELECT sum(n) FROM counts)::DOUBLE, 9) AS top10_share,
           round((SELECT sum(n * n) FROM counts)::DOUBLE
                 / ((SELECT sum(n) FROM counts)::DOUBLE
                    * (SELECT sum(n) FROM counts)::DOUBLE), 9)
             AS collision_prob
    FROM (SELECT 1)
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for events.user_id — the diagnostic that
    decides salting / AQE-skew settings BEFORE a 100 TB job runs: total
    rows, distinct keys, top-1 and top-10 key shares, and the key
    collision probability sum((n_i/N)^2) (a Gini-style concentration
    measure: 1/n_keys when uniform, ->1 under a single hot key — also
    exactly the probability two random rows shuffle to the same key).

    Plan: one count aggregate over the key column, then only
    key-cardinality rows feed one stats aggregate + a deterministic
    top-10 (TakeOrderedAndProject) combined via a broadcast singleton —
    the raw table is scanned once, and nothing wider than (key, count)
    shuffles."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.localCheckpoint(eager=False)  # feeds both consumers
    stats = counts.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").alias("__max_n"),
        # decimal square: a hot key past ~3e9 rows would silently wrap a
        # BIGINT n*n — the one case a skew diagnostic must get right
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
        .cast("double")
        .alias("__sum_n2"),
    )
    top10 = (
        counts.orderBy(F.col("n").desc(), "user_id")
        .limit(10)
        .agg(F.sum("n").cast("double").alias("__top10_n"))
    )
    return (
        stats.crossJoin(F.broadcast(top10))
        .select(
            "n_rows",
            "n_keys",
            F.round(F.col("__max_n").cast("double") / F.col("n_rows"), 9).alias(
                "top1_share"
            ),
            F.round(F.col("__top10_n") / F.col("n_rows"), 9).alias("top10_share"),
            F.round(
                F.col("__sum_n2")
                / (F.col("n_rows").cast("double") * F.col("n_rows").cast("double")),
                9,
            ).alias("collision_prob"),
        )
    )


@query(
    "salted_join_hot_keys",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * len(event_type)) AS DOUBLE)
             AS weighted_sum
    FROM events
    GROUP BY event_type
    """,
)
def salted_join_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join operator driven end-to-end (round 5 — previously
    unit-tested only): events keyed by event_type are EXTREMELY skewed
    (a handful of types, tens of thousands of rows each — every key is
    hot), so the dimension join runs through operators/join.salted_join:
    the skewed side salts into 8 deterministic sub-keys, the small side
    replicates once per salt, and each hot key's rows spread over 8
    reducers instead of one. The oracle recomputes the joined weighted
    aggregate WITHOUT any join (the weight is derivable from the key),
    so the value hash proves the salted join preserved multiplicity
    EXACTLY — the property that breaks first when a salting
    implementation double-joins or drops a replica. Sums are
    exact-decimal, so salting's reordering cannot drift them.

    At 100 TB this is the escape hatch when AQE cannot see the skew
    (mid-stage skew, or a key whose hotness only materializes after a
    transform); fanout*|dims| replication is the bounded price."""
    from dataflowjavasdk_spark.operators.join import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dims = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type"))
    )
    joined = salted_join(ev, dims, on=["event_type"], fanout=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)") * F.col("weight"))
        .cast("double")
        .alias("weighted_sum"),
    )


@query(
    "ewma_user_values",
    oracle="""
    WITH cents AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT user_id, v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM cents
    )
    SELECT user_id,
           CAST(count(*) AS INT) AS n_used,
           CAST(SUM(v * (1::BIGINT << (32 - rk))) AS BIGINT) AS weighted_sum,
           CAST(SUM(v * (1::BIGINT << (32 - rk))) AS DOUBLE)
             / 4294967296.0 / 100.0 AS ewma_value
    FROM ranked WHERE rk <= 32
    GROUP BY user_id
    """,
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing EWMA smoothing, integer-exact (round 5) — the
    time-series feature the event family lacked: each user's current
    smoothed value under dyadic decay alpha = 1/2 over the TRAILING 32
    events (newest weight 1/2, then 1/4, ...). The whole computation is
    integers — cent-scaled values times power-of-two weights 2^(32-rank)
    summed as BIGINT (max |sum| < 2^53, proven against the fixture value
    range) — and the reported double is that one integer divided by
    2^32*100, an exact power-of-two-and-100 descale both engines perform
    identically, so the query value-hash oracles with zero float drift.
    Capping the window at 32 is what MAKES it exact (unbounded dyadic
    tails underflow float64 at term 53): the standard production
    trade-off of bounded-state streaming smoothing, stated honestly.

    Scale shape: one shuffle on user_id for the ordered rank window
    (WindowGroupLimit prunes to 32 rows per key before the weighted
    aggregate), then a per-key sum — state is 32 (rank, cents) pairs per
    user regardless of history length, the same bound the streaming
    trigger kernel enforces. The Beam analog composed
    Top.perKey(32, byTimestamp) + a CombineFn; here it is two window
    expressions fused into one exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = ev.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 32)
    # shiftleft() takes a literal bit count in the Python API; the
    # per-row weight 2^(32-rk) needs the SQL form
    term = F.col("v") * F.expr("shiftleft(1L, 32 - rk)")
    return ranked.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_used"),
        F.sum(term).cast("long").alias("weighted_sum"),
        (
            F.sum(term).cast("double") / F.lit(4294967296.0) / F.lit(100.0)
        ).alias("ewma_value"),
    )


@query(
    "mad_outliers_per_type",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT event_type, v,
             quantile_cont(v, 0.5) OVER (PARTITION BY event_type) AS med_c
      FROM cents
    ),
    dev AS (
      SELECT event_type, v, med_c, abs(v - med_c) AS absdev
      FROM med
    ),
    mad AS (
      SELECT event_type, med_c, absdev,
             quantile_cont(absdev, 0.5) OVER (PARTITION BY event_type) AS mad_c
      FROM dev
    )
    SELECT event_type,
           count(*) AS n,
           round(max(med_c) / 100.0, 9) AS median_value,
           round(max(mad_c) / 100.0, 9) AS mad_value,
           CAST(SUM(CASE WHEN absdev > 3 * mad_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM mad GROUP BY event_type
    """,
)
def mad_outliers_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type (round 5) — the
    median/MAD twin of zscore_outliers_per_type, which a heavy-tailed
    value column breaks (one whale inflates mean AND stddev until
    nothing is an outlier; the median absolute deviation is immune):
    flag events with |v - median| > 3*MAD. Exactness: values are
    cent-scaled integers; interpolated medians land on multiples of
    1/2, absolute deviations on 1/2, MAD on 1/4 — all dyadic fractions,
    exact in float64 — and Spark's percentile() and DuckDB's
    quantile_cont() share the (n-1)*p interpolation rule (probed), so
    the 3*MAD comparison is bit-identical in both engines; only the
    final /100 descale rounds, identically from identical inputs.

    Scale shape: both medians are WINDOW aggregates over the same
    event_type partitioning, so the whole query is one scan + ONE
    exchange (the second window and the final groupBy reuse the first
    window's partitioning); per-type state is the sorted value list the
    exact median inherently needs — the sketch family (kll_quantiles_
    rollup) is the documented mergeable-state alternative when a type's
    rows exceed executor memory."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
    )
    w = W.partitionBy("event_type")
    med = ev.withColumn("med_c", F.percentile("v", F.lit(0.5)).over(w))
    dev = med.withColumn("absdev", F.abs(F.col("v") - F.col("med_c")))
    mad = dev.withColumn("mad_c", F.percentile("absdev", F.lit(0.5)).over(w))
    return mad.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("med_c") / 100.0, 9).alias("median_value"),
        F.round(F.max("mad_c") / 100.0, 9).alias("mad_value"),
        F.sum(
            F.when(F.col("absdev") > 3 * F.col("mad_c"), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


@query(
    "event_cooccurrence_pairs",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    stypes AS (
      SELECT DISTINCT user_id, session_id, event_type FROM numbered
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM stypes a
      JOIN stypes b ON a.user_id = b.user_id
                   AND a.session_id = b.session_id
                   AND a.event_type < b.event_type
    ),
    counted AS (
      SELECT type_a, type_b, count(*) AS n_sessions,
             row_number() OVER (ORDER BY count(*) DESC, type_a, type_b) AS rk
      FROM pairs GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n_sessions, rk FROM counted WHERE rk <= 20
    """,
)
def event_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over sessions (round 5) — the market-basket
    primitive the behavioral family lacked: which event types CO-OCCUR
    in the same 30-minute session (order-free, unlike the transition
    matrix's ordered bigrams)? Sessions are the lag/cumulative-sum
    assignment both engines state identically; each session reduces to
    its DISTINCT type set; unordered pairs come from a self-join on the
    session key with type_a < type_b (each pair counted once per
    session); the global top-20 carries a deterministic (count desc,
    pair) rank. Everything is integer counts — exact hash.

    Scale shape: the self-join operates on the session-DISTINCT relation
    (#sessions x #types-per-session rows — far below the event count)
    and is an equi-join on (user, session): co-located, never cartesian;
    with T distinct types a session contributes at most T(T-1)/2 pair
    rows, so the pair stage is bounded by T^2/2 per session regardless
    of event volume. The distinct relation is pinned (both join sides
    consume it — the scan-discipline rule); the final aggregate's key
    space is type pairs: bounded, broadcastable forever."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    wo = W.partitionBy("user_id").orderBy("ts")
    # Microsecond-exact gap test: cast-to-long TRUNCATES to seconds,
    # which flips boundary gaps vs the oracle's INTERVAL comparison
    # (one consecutive gap at sf0.1 provably lands on the line).
    new_sess = (
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wo))
            < 1800 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_session")
    )
    flagged = ev.select("user_id", "ts", "event_type", new_sess)
    numbered = flagged.select(
        "user_id",
        "event_type",
        F.sum("new_session").over(
            wo.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("session_id"),
    )
    stypes = (
        numbered.select("user_id", "session_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = stypes.select("user_id", "session_id", F.col("event_type").alias("type_a"))
    b = stypes.select("user_id", "session_id", F.col("event_type").alias("type_b"))
    pairs = a.join(b, ["user_id", "session_id"]).filter(
        F.col("type_a") < F.col("type_b")
    )
    counted = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    wr = W.orderBy(F.col("n_sessions").desc(), "type_a", "type_b")
    return counted.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 20
    )


def fk_audit_edge(
    name: str, child: DataFrame, key: str, parent: DataFrame, pkey: str
) -> DataFrame:
    """One FK-conformance edge, safe under NON-UNIQUE parent keys: the
    parent is grouped by key first (one row per key value), so the
    child's left-outer join can never inflate n_child via join
    multiplicity; the grouped relation also yields n_parent_dups (key
    values appearing more than once) as a finding in its own right.
    ONE left-outer pass over the child yields both child counts — a
    separate count aggregate beside an anti-join would scan the child
    twice; at 100 TB that doubles the lineitem read for no information
    gain. The 1-row dup count attaches via broadcast cross join."""
    pk = parent.groupBy(pkey).agg(F.count(F.lit(1)).alias("pk_n"))
    pk = pk.localCheckpoint(eager=False)  # one parent scan feeds both uses
    dups = pk.agg(
        F.sum(F.when(F.col("pk_n") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_parent_dups")
    )
    joined = child.join(pk, child[key] == pk[pkey], "left_outer")
    return (
        joined.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.when(pk[pkey].isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        )
        .crossJoin(F.broadcast(dups))
        .select(
            F.lit(name).alias("fk_edge"),
            "n_child",
            "n_orphans",
            "n_parent_dups",
            F.round(
                F.col("n_orphans").cast("double")
                / F.col("n_child").cast("double"),
                9,
            ).alias("orphan_share"),
        )
    )


@query(
    "referential_integrity_audit",
    oracle="""
    WITH corrupted_orders AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 10000000
                  ELSE o_custkey END AS o_custkey
      FROM orders
    ),
    dup_customer AS (
      SELECT c_custkey FROM customer
      UNION ALL
      SELECT c_custkey FROM customer WHERE c_custkey % 53 = 0
    ),
    edges AS (
      SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
             (SELECT count(*) FROM lineitem) AS n_child,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
             (SELECT count(*) FROM (SELECT o_orderkey FROM orders
                                    GROUP BY 1 HAVING count(*) > 1) t)
               AS n_parent_dups
      UNION ALL
      SELECT 'orders.o_custkey -> customer (corrupted ingest)',
             (SELECT count(*) FROM corrupted_orders),
             (SELECT count(*) FROM corrupted_orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM (SELECT c_custkey FROM customer
                                    GROUP BY 1 HAVING count(*) > 1) t)
      UNION ALL
      SELECT 'events.user_id -> customer',
             (SELECT count(*) FROM events),
             (SELECT count(*) FROM events e
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = e.user_id)),
             (SELECT count(*) FROM (SELECT c_custkey FROM customer
                                    GROUP BY 1 HAVING count(*) > 1) t)
      UNION ALL
      SELECT 'orders.o_custkey -> customer (dup-injected parent)',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM dup_customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT count(*) FROM (SELECT c_custkey FROM dup_customer
                                    GROUP BY 1 HAVING count(*) > 1) t)
    )
    SELECT fk_edge, n_child, CAST(n_orphans AS BIGINT) AS n_orphans,
           CAST(n_parent_dups AS BIGINT) AS n_parent_dups,
           round(n_orphans::DOUBLE / n_child::DOUBLE, 9) AS orphan_share
    FROM edges
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit (round 5) — the FK half
    of data-quality checking that the single-table table_profile can't
    see (Deequ's isContainedIn/complianceConstraint shape): for each FK
    edge, count child rows whose key has no parent. Two edges are the
    clean fixtures (zero orphans — the green-CI negative control); the
    orders→customer edge is audited through a DETERMINISTICALLY
    CORRUPTED ingest (every 97th order's custkey shifted out of range,
    the dup-injection convention), so the nonzero branch of the
    operator is value-oracled too — an audit that can only ever print
    zeros is untested by construction. The fourth edge audits against a
    DUP-INJECTED parent (every 53rd customer key repeated): it proves
    the audit counts stay exact when the parent key is NOT unique —
    n_child must equal count(child), never the join multiplicity — and
    exercises the nonzero branch of n_parent_dups, the new column that
    reports parent-side uniqueness violations as findings of their own.

    Scale shape: each edge is one parent groupBy(pkey) (key bytes only —
    this is what makes non-unique parents safe: the child joins the
    GROUPED key relation, one row per key) + one left-outer pass over
    the child yielding both counts; the parent-dup count is a 1-row
    aggregate over the grouped relation, attached via broadcast. Only
    1-row relations reach the union. This is the nightly conformance
    gate a warehouse runs between ingest and publish."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    ev = load_table(spark, sf_dir, "events").select("user_id")
    corrupted = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_custkey") + 10_000_000
        )
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    dup_cu = cu.unionByName(cu.filter(F.col("c_custkey") % 53 == 0))

    out = fk_audit_edge(
        "lineitem.l_orderkey -> orders", li, "l_orderkey",
        od.select("o_orderkey"), "o_orderkey",
    )
    out = out.unionByName(
        fk_audit_edge(
            "orders.o_custkey -> customer (corrupted ingest)",
            corrupted.select("o_custkey"), "o_custkey", cu, "c_custkey",
        )
    )
    out = out.unionByName(
        fk_audit_edge(
            "events.user_id -> customer", ev, "user_id", cu, "c_custkey"
        )
    )
    return out.unionByName(
        fk_audit_edge(
            "orders.o_custkey -> customer (dup-injected parent)",
            od.select("o_custkey"), "o_custkey", dup_cu, "c_custkey",
        )
    )
