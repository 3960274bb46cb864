"""Query corpus, batch 2: JSON scalar functions, window functions
(running totals / ordered per-key picks), deterministic sampling, argmax,
set ops, cube/rollup extensions, pivot-via-expressions, exact percentiles,
and two more TPC-H-shaped joins (SURVEY.md §2.2-§2.5, §2.10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dataflowjavasdk_spark.functions.text import md5_long
from dataflowjavasdk_spark.queries.helpers import (
    SQL_DISC_PRICE,
    SQL_SUM_DISC_PRICE,
    disc_price,
    dsum,
    money,
    sql_dsum,
)
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table


@query(
    "json_props_per_type",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(json_extract_string(props, '$.k')::INT) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_props_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (SURVEY.md §2.10 — the TableRowJsonCoder
    world): get_json_object on events.props; integer sum is exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "user_running_totals",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
    """,
)
def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered state — the batch analog of per-key streaming state
    (SURVEY.md §2.9): cumulative sum + sequence number per user by event
    time. Exact-decimal running sums are order-deterministic under the
    (ts, event_id) tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wn = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
        F.row_number().over(wn).alias("rn"),
    )


@query(
    "first_events_per_user",
    oracle="""
    SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def first_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortValues (contrib/sorter SortValues.java) consumed as 'first N
    values per key in secondary order' — the per-key ordered-iterable
    pattern flattened relationally."""
    ev = load_table(spark, sf_dir, "events")
    wn = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", F.row_number().over(wn).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "deterministic_sample_per_key",
    oracle="""
    SELECT event_type, event_id, rk FROM (
      SELECT event_type, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT,
                        event_id) AS rk
      FROM events
    ) WHERE rk <= 5
    """,
)
def deterministic_sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample.fixedSizePerKey (historical sdk/transforms/Sample.java) with
    a deterministic PRG: order by md5(event_id) ≡ a fixed random
    permutation, reproducible across engines and runs (rand(seed) is NOT
    cross-engine stable; a keyed hash is)."""
    ev = load_table(spark, sf_dir, "events")
    wn = W.partitionBy("event_type").orderBy(
        md5_long(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.select("event_type", "event_id", F.row_number().over(wn).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@query(
    "argmax_event_per_type",
    oracle="""
    SELECT event_type,
           (max(struct_pack(v := value, e := event_id))).e AS top_event_id,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def argmax_event_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax via lexicographic struct max — deterministic under ties
    (event_id tiebreak), identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max(F.struct(F.col("value").alias("v"), F.col("event_id").alias("e")))["e"].alias("top_event_id"),
        F.max("value").alias("max_value"),
    )


@query(
    "set_ops_users",
    oracle="""
    SELECT
      (SELECT count(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      )) AS n_both,
      (SELECT count(*) FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      )) AS n_click_only
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect/except — absent in the reference (SURVEY.md §2.4 flags
    them as free Spark extensions)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    n_both = clicks.intersect(buys).count()
    n_click_only = clicks.exceptAll(buys).count()
    return spark.createDataFrame(
        [(n_both, n_click_only)], "n_both bigint, n_click_only bigint"
    )


@query(
    "cube_returnflag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 12, 2)} AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / cube — built-in-for-free extension beyond the
    reference (SURVEY.md §2.2 note): all 2^2 grouping combinations in one
    pass (Spark Expand operator — one shuffle, not four queries)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 12, 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           {SQL_SUM_DISC_PRICE} AS revenue, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (SURVEY.md §2.2 note) — the asymmetric set
    list ((returnflag, linestatus), (linestatus), ()) that neither CUBE
    nor ROLLUP expresses, via the Spark 4 DataFrame ``groupingSets`` API.
    One Expand + one shuffle — not three queries, and at 100 TB Expand's
    3x row amplification happens map-side before partial aggregation, so
    the shuffle carries only group keys. NULL group keys are coalesced to
    a sentinel in BOTH engines (lineitem's group columns are never null,
    so the sentinel is unambiguous)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            money(F.sum(disc_price())).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n",
        )
    )


@query(
    "pivot_daily_type_counts",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'view') AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup') AS signup,
           count(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY 1
    """,
)
def pivot_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (portable across engines, and at
    scale preferable to df.pivot: explicit columns → no extra pass to
    discover pivot values)."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(t)
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(*aggs)


@query(
    "exact_percentiles_quantity",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def exact_percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (beyond the reference's
    ApproximateQuantiles — SURVEY.md §2.2 'built-in for free' note).
    Rounded to 6 dp: interpolation arithmetic is the only cross-engine
    float risk. The approximate path (percentile_approx ≡ the reference's
    ApproximateQuantiles) carries in-plan accuracy verdicts in
    approx_quantiles_value (globally) and approx_quantiles_per_key."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25D)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50D)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75D)"), 6).alias("p75"),
    )


@query(
    "approx_quantiles_value",
    oracle="""
    SELECT count(*) AS n,
           TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p75, TRUE AS ok_p99
    FROM events
    """,
)
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApproximateQuantiles.globally (historical sdk/transforms/
    ApproximateQuantiles.java, Munro-Paterson) → Greenwald-Khanna
    percentile_approx (accuracy=100 → rank error ≤ 1%). Sketch outputs
    are engine-specific, so the query emits GK's guarantee as a verdict:
    each approximate quantile q must lie within the exact
    [percentile(q−0.01), percentile(q+0.01)] envelope, computed in the
    same plan. The oracle asserts all verdicts TRUE — accuracy becomes
    driver-checkable instead of rows-only."""
    ev = load_table(spark, sf_dir, "events")
    acc = 100
    eps = 1.0 / acc
    qs = [0.25, 0.5, 0.75, 0.99]
    agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", qs, acc).alias("__approx"),
        *[
            F.expr(f"percentile(value, {max(q - eps, 0.0)}D)").alias(f"__lo_{i}")
            for i, q in enumerate(qs)
        ],
        *[
            F.expr(f"percentile(value, {min(q + eps, 1.0)}D)").alias(f"__hi_{i}")
            for i, q in enumerate(qs)
        ],
    )
    labels = ["p25", "p50", "p75", "p99"]
    return agg.select(
        "n",
        *[
            (
                (F.col("__approx")[i] >= F.col(f"__lo_{i}"))
                & (F.col("__approx")[i] <= F.col(f"__hi_{i}"))
            ).alias(f"ok_{labels[i]}")
            for i in range(len(qs))
        ],
    )


@query(
    "approx_quantiles_per_key",
    oracle="""
    SELECT event_type, count(*) AS n,
           TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p75, TRUE AS ok_p99
    FROM events
    GROUP BY event_type
    """,
)
def approx_quantiles_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ApproximateQuantiles.perKey (historical sdk/transforms/
    ApproximateQuantiles.java perKey form) — per event_type, the GK
    sketch's rank guarantee is verified IN RANK SPACE: each approximate
    quantile av must be an actual data value whose rank interval
    [#(v<av)+1, #(v<=av)] overlaps [(q−ε)·n − 1, (q+ε)·n + 1]. A second
    aggregation recomputes the ranks exactly, so the verdict holds at ANY
    group size — an interpolated-percentile envelope (the global query's
    shape) breaks when ±ε·n is under a rank gap, i.e. for small keys.
    Scale shape: the (key × 4 quantiles) relation joins back WITHOUT a
    broadcast hint (cardinality grows with the key space); rank
    recomputation is one extra shuffle of (key, quantile) partials."""
    ev = load_table(spark, sf_dir, "events")
    acc = 100
    eps = 1.0 / acc
    qs = [0.25, 0.5, 0.75, 0.99]
    labels = {0: "p25", 1: "p50", 2: "p75", 3: "p99"}
    approx = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", qs, acc).alias("__ap"),
    )
    pairs = approx.select(
        "event_type", "n", F.posexplode("__ap").alias("qi", "av")
    )
    q_of = F.element_at(F.array(*[F.lit(q) for q in qs]), F.col("qi") + 1)
    ranks = (
        ev.join(pairs, "event_type")
        .groupBy("event_type", "qi", "n", "av")
        .agg(
            F.sum(F.when(F.col("value") < F.col("av"), 1).otherwise(0)).alias("r_lt"),
            F.sum(F.when(F.col("value") <= F.col("av"), 1).otherwise(0)).alias("r_le"),
        )
        .withColumn(
            "ok",
            (F.col("r_lt") + 1 <= (q_of + eps) * F.col("n") + 1)
            & (F.col("r_le") >= (q_of - eps) * F.col("n") - 1),
        )
    )
    return ranks.groupBy("event_type").agg(
        F.max("n").alias("n"),
        *[
            F.max(F.when(F.col("qi") == i, F.col("ok"))).alias(f"ok_{labels[i]}")
            for i in range(len(qs))
        ],
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS decorrelates to a left-semi join — the plan
    Catalyst produces from either spelling; the reference would need a
    hand-built CoGBK + filter."""
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = od.join(
        li,
        (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {SQL_SUM_DISC_PRICE} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: returned-item revenue per customer, top 20.
    customer/nation broadcast; one orderkey shuffle; TakeOrdered top-k."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money(F.sum(disc_price())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "flatten_union_counts",
    oracle="""
    WITH unioned AS (
      SELECT event_id, event_type FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_id, event_type FROM events WHERE value > 400
    )
    SELECT event_type, count(*) AS n FROM unioned GROUP BY event_type
    """,
)
def flatten_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten.pCollections (historical sdk/transforms/Flatten.java): bag
    union of three overlapping selections — duplicates preserved (bag
    semantics), then counted. Catalyst collapses the union and pushes the
    aggregate below it where legal."""
    from dataflowjavasdk_spark.operators import flatten as FL

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    u = FL.pcollections(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("value") > 400),
    )
    return u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "wordcount_via_facade",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount_via_facade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same WordCount built through the Beam-shaped PCollection
    facade (core.py) — proving the facade compiles to the identical
    relational result as the raw DataFrame spelling."""
    from dataflowjavasdk_spark.core import Pipeline
    from dataflowjavasdk_spark.functions.text import tokens

    p = Pipeline(spark)
    docs = p.read_parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.flat_map(tokens("text"), out="word")
        .count_per_element("word", out="n")
        .df
    )


@query(
    "deterministic_sample_global",
    oracle="""
    SELECT o_orderkey, rk FROM (
      SELECT o_orderkey,
             row_number() OVER (
               ORDER BY ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT,
                        o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 100
    """,
)
def deterministic_sample_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample.fixedSizeGlobally(100) (historical sdk/transforms/Sample.java
    reservoir sample) with a deterministic PRG: rank by md5(key) = one
    fixed uniform permutation. Plans as TakeOrderedAndProject over the
    hash ordering — per-partition bounded heaps, exactly the reservoir's
    memory bound, no global sort."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.select(
            "o_orderkey",
            F.row_number()
            .over(W.orderBy(md5_long(F.col("o_orderkey").cast("string")), F.col("o_orderkey")))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 100)
    )
