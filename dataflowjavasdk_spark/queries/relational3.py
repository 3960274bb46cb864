"""Query batch 3: the remaining TPC-H-style acceptance queries expressible on
the reduced fixture schema (no partsupp table; lineitem has no
shipmode/commitdate/receiptdate — predicates adapted accordingly), plus
operator-coverage queries for the reference surface not yet exercised:
SortValues (secondary sort), side-input joins (View.asSingleton),
hot-key fanout (salting), Partition.of, CalendarWindows.weeks, and the
AutoComplete example (prefix top-k).

Determinism discipline (registry docstring): every double aggregate is an
exact DECIMAL sum cast to DOUBLE; ratios are a single IEEE division of two
exact values — bit-identical across engines regardless of row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dataflowjavasdk_spark.queries.helpers import (
    SQL_DISC_PRICE,
    SQL_SUM_DISC_PRICE,
    disc_price,
    dsum,
    money,
    sql_dsum,
    sql_money,
)
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table
from dataflowjavasdk_spark.functions import text as T


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {SQL_SUM_DISC_PRICE} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
       OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: bilateral trade revenue between two
    nations per ship-year. The nation dimension joins twice (customer side
    and supplier side) — both broadcast; the disjunctive nation-pair filter
    applies after both joins. Single fact-fact shuffle on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    cn = na.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = na.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cn), cu.c_nationkey == cn.cn_key)
        .join(F.broadcast(sn), su.s_nationkey == sn.sn_key)
        .filter(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money(F.sum(disc_price())).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_rev AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {SQL_DISC_PRICE} AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'PROMO'
    )
    SELECT o_year,
           {sql_money("SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)")}
             / {sql_money("SUM(volume)")} AS mkt_share
    FROM all_rev GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: NATION_3's fraction of PROMO-part
    revenue per order-year. Conditional exact-decimal sums; one double
    division at the end. part/supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                money(F.sum(F.when(F.col("n_name") == "NATION_3", disc_price()).otherwise(zero)))
                / money(F.sum(disc_price()))
            ).alias("mkt_share")
        )
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style (adapted: fixture lineitem has no l_shipmode, so the
    group key is ship-year): high- vs low-priority line counts. The
    conditional-count pattern = Combine.perKey with a case-splitting
    CombineFn (historical sdk/transforms/Combine.java)."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer (zero-order
    customers included via left outer join — the reference's
    Join.leftOuterJoin null-value semantics)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * {sql_money(f"SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE} ELSE CAST(0 AS DECIMAL(18,4)) END)")}
                 / {SQL_SUM_DISC_PRICE} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promo revenue share for one month. part broadcasts into the
    date-pruned lineitem scan; zero shuffles beyond the 1-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    pa = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    return li.join(pa, li.l_partkey == pa.p_partkey).agg(
        (
            F.lit(100.0)
            * money(F.sum(F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)))
            / money(F.sum(disc_price()))
        ).alias("promo_revenue")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume orders: orders whose total quantity exceeds
    250 (≈ p99 of the fixture distribution), with their customer —
    exact decimal sum so the threshold comparison is engine-independent.

    Scale shape (rewritten round 9 — the ONE superlinear flag in the
    sf0.01/0.1/1 sweep, 126 → 2,671 ms for 10x rows): the old plan
    joined the full fact table to orders+customer and THEN grouped by a
    five-column key (two strings included). Past the broadcast
    threshold that is two wide sort-merge-join shuffles of 6M joined
    rows plus a wide-key aggregate. The spec's own decomposition is
    aggregate-THEN-join: group lineitem by the narrow int64 l_orderkey
    (map-side partial agg), HAVING-filter to the ~p99 survivors, and
    join only that tiny relation to orders and customer — the group key
    (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice) is
    functionally determined by o_orderkey, so rows are identical (same
    oracle). Re-measured: 2,671 → ~210 ms at sf1, slope 1.32 → sublinear."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(12,2)"))
    big = (
        li.groupBy("l_orderkey")
        .agg(qty.cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(od, big.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
    )


@query(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT {SQL_SUM_DISC_PRICE} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive bracket predicates across the join
    (adapted: no p_container/shipmode columns). Catalyst extracts the
    common join key and pushes the per-side conjuncts into both scans."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    j = li.join(pa, pa.p_partkey == li.l_partkey)
    q = F.col("l_quantity")
    s = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 40))
    )
    return j.filter(cond).agg(money(F.sum(disc_price())).alias("revenue"))


@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average balance and no orders
    since 1999 (adapted: no c_phone → group by nation; the recency cutoff
    keeps the result non-empty on the dense fixture). Composition of a singleton
    side input (Combine.globally().asSingletonView — the scalar threshold,
    broadcast via cross join) and an anti-join (NOT EXISTS). The threshold
    is an exact decimal sum / count: one IEEE division in both engines."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    recent = od.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    thr = (
        cu.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        cu.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cu.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 12, 2).alias("totacctbal"),
        )
    )


@query(
    "secondary_sort_per_user",
    oracle="""
    SELECT user_id,
           array_to_string(
             (list(event_type ORDER BY ts, event_id))[1:3], ',') AS first3_types,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def secondary_sort_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SortValues (historical contrib/sorter SortValues.java +
    BufferedExternalSorter.java): per-key secondary sort of values by a
    secondary key — here each user's first three event types in event-time
    order (ties broken by event_id). Implemented as
    array_sort(collect_list(struct(sort_key..., value))): struct comparison
    gives the (ts, event_id) lexicographic order; Spark's aggregation
    buffers spill via UnsafeExternalSorter exactly like the reference's
    external sorter. At 100 TB prefer repartition+sortWithinPartitions when
    the full sorted run must stream (operators/sort.py); here the per-key
    output is bounded (3) so the collect_list stays small."""
    ev = load_table(spark, sf_dir, "events")
    sorted_structs = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    first3 = F.transform(
        F.slice(sorted_structs, 1, 3), lambda s: s.getField("event_type")
    )
    return ev.groupBy("user_id").agg(
        F.array_join(first3, ",").alias("first3_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "side_input_global_mean",
    oracle="""
    WITH m AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
               AS mean_value
      FROM events
    )
    SELECT event_type,
           count(*) AS n_above,
           CAST(min(value) AS DOUBLE) AS min_above
    FROM events, m
    WHERE value > mean_value
    GROUP BY event_type
    """,
)
def side_input_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Singleton side input (historical sdk/transforms/View.java View.asSingleton
    + ParDo.withSideInputs; the GameStats example's global-mean abuse
    filter): Combine.globally → 1-row DataFrame, broadcast-cross-joined
    into the per-element filter. The broadcast is the Spark analog of the
    side-input channel — no shuffle of the main input."""
    ev = load_table(spark, sf_dir, "events")
    mean = ev.agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_value")
    )
    return (
        ev.crossJoin(F.broadcast(mean))
        .filter(F.col("value") > F.col("mean_value"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.min("value").alias("min_above"),
        )
    )


@query(
    "hot_key_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def hot_key_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combine.perKey(...).withHotKeyFanout(16) (historical
    sdk/transforms/Combine.java): two-level aggregation that defuses hot
    keys by salting — pass 1 groups on (key, salt) where salt spreads each
    key over 16 reducers, pass 2 merges the 16 partials per key. The salt
    must be deterministic for the oracle match, so it derives from
    event_id, not rand(). Result is identical to the plain per-key sum
    (decimal addition is associative); the plan trades one extra (tiny)
    shuffle for bounded per-reducer load at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pn"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pn").alias("n"),
    )


@query(
    "autocomplete_prefix_topk",
    oracle="""
    WITH counts AS (
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' AND length(word) >= 2
      GROUP BY word
    ),
    ranked AS (
      SELECT substr(word, 1, 2) AS prefix, word, n,
             row_number() OVER (PARTITION BY substr(word, 1, 2)
                                ORDER BY n DESC, word) AS rk
      FROM counts
    )
    SELECT prefix, word, n, rk FROM ranked WHERE rk <= 3
    """,
)
def autocomplete_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AutoComplete (historical examples/complete/AutoComplete.java):
    top-3 completions per 2-char prefix by corpus frequency — Count.perElement
    feeding Top.perKey. The window input is already one row per word (far
    smaller than the token stream), so the row_number shuffle is cheap."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(T.tokens("text")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("prefix").orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("prefix", F.substring("word", 1, 2))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("prefix", "word", "n", "rk")
    )


@query(
    "partition_split_counts",
    oracle="""
    SELECT event_id % 3 AS bucket, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def partition_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition.of(3, fn) (historical sdk/transforms/Partition.java): split
    one collection into n by a partition function. Spark-side the split is
    n filters over one cached scan; this query materializes the per-bucket
    summary proving each element lands in exactly one bucket."""
    ev = load_table(spark, sf_dir, "events")
    buckets = [
        ev.filter(F.col("event_id") % 3 == i).withColumn("bucket", F.lit(i).cast("bigint"))
        for i in range(3)
    ]
    union = buckets[0].unionByName(buckets[1]).unionByName(buckets[2])
    return union.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@query(
    "calendar_week_events",
    oracle=f"""
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           count(*) AS n_events,
           {sql_dsum('value')} AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def calendar_week_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CalendarWindows.weeks(1) (historical
    sdk/transforms/windowing/CalendarWindows.java): ISO-week calendar
    windows via date_trunc — the expression-layer window assignment of
    SURVEY.md §4.2 (both engines truncate to Monday)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {SQL_SUM_DISC_PRICE} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    scalar-subquery max becomes a 1-row broadcast (Combine.globally
    asSingletonView again); equality on the exact-decimal revenue is safe
    because both sides are the same bit pattern. Revenue aggregates once —
    the per-supplier relation is pinned (lazy localCheckpoint) so the max
    pass reads it instead of re-running the lineitem aggregation (Spark
    recomputes two-branch subplans; verified on the executed plan)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    su = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(money(F.sum(disc_price())).alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        su.join(revenue, su.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / count(*)) AS thr
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n_small
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON avgq.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#5' AND l_quantity < thr
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the classic
    correlated scalar subquery (per-part average), decorrelated into a
    per-part WINDOW average over the brand-restricted lines: since the
    brand predicate restricts whole parts (every line of a qualifying
    part survives the join), the window sees exactly the rows the
    correlated subquery would, and lineitem is scanned ONCE — the
    aggregate-plus-join form scanned it twice and averaged every part,
    not just the brand's. The 0.2×avg threshold is one multiply of one
    exact division, bit-identical cross-engine. One window exchange on
    l_partkey."""
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    w = W.partitionBy("l_partkey")
    thr = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .withColumn("thr", thr)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "value_moments_per_type",
    oracle="""
    WITH m AS (
      SELECT event_type, count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           s1 / n AS mean_value,
           round((s2 - s1 * s1 / n) / n, 6) AS var_pop
    FROM m
    """,
)
def value_moments_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean + population variance per key via exact decimal moments — the
    order-independent form of Combine.perKey(Mean/Variance). Built-in
    var_pop sums doubles in partition order (nondeterministic across
    engines); here s1 and s2 are exact decimal sums and the final
    mean/variance are a fixed sequence of IEEE ops on those exact values;
    var_pop is rounded to 6 dp because the s2 - s1²/n cancellation leaves
    ~1 ulp of engine-dependent noise (measured: 9e-13 on one group). Same single-shuffle plan as any
    multi-aggregate groupBy."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    return m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_value"),
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n"), 6
        ).alias("var_pop"),
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           (CAST(FLOOR((SUM({SQL_DISC_PRICE}
                    - CAST(0.4 AS DECIMAL(2,1))
                      * CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2)))) * 100) AS BIGINT)
            / CAST(100 AS DOUBLE)) AS sum_profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product profit per supplier-nation per year (adapted:
    no partsupp table, so supply cost is modeled as 40% of p_retailprice —
    the join/aggregation shape is Q9's exactly). All of part/supplier/
    nation broadcast; profit is pure decimal arithmetic summed exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    cost = (
        F.lit(0.4).cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money(F.sum(disc_price() - cost)).alias("sum_profit"))
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier counts per part attribute (adapted: the
    part-supplier relationship comes from lineitem instead of the absent
    partsupp). Exclusion predicates (<>, NOT IN, IN-list) all push into the
    part scan; count(DISTINCT) plans as the two-phase distinct aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
