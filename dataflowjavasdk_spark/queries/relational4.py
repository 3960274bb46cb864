"""Query batch 4: the last four TPC-H-style acceptance queries (Q2, Q11,
Q20, Q21), adapted to the reduced fixture schema (no partsupp table;
lineitem carries only l_shipdate). The adaptations preserve each query's
*shape* — the part the engine has to get right:

- Q2  : correlated scalar subquery (per-group min joined back) over a
        three-dimension snowflake (supplier -> nation -> region).
- Q11 : group-by with a HAVING threshold that is itself a scalar subquery
        over the same relation (global total, broadcast).
- Q20 : nested semi-join — suppliers qualified through an aggregated
        share-of-part predicate.
- Q21 : EXISTS + NOT EXISTS against two differently-filtered aliases of
        the same fact table (the hardest decorrelation case).

Historical counterparts ran as Combine.perKey + side-input views
[H: sdk/transforms/Combine.java, sdk/transforms/View.java]; here each is a
single declarative plan so Catalyst decorrelates, pushes predicates, and
picks broadcast sides from AQE stats.

Determinism discipline (registry docstring): aggregates are exact DECIMAL
sums cast to DOUBLE; comparisons against scaled thresholds multiply two
exactly-representable doubles — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dataflowjavasdk_spark.queries.helpers import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    SQL_SUM_CHARGE,
    SQL_SUM_DISC_PRICE,
    charge,
    disc_price,
    money,
    sql_dsum,
)
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    pp AS (SELECT p_partkey, p_brand FROM part
           WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20),
    offers AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
             min(l_extendedprice) AS offer_price
      FROM lineitem JOIN eu ON l_suppkey = s_suppkey
                    JOIN pp ON l_partkey = p_partkey
      GROUP BY p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, offer_price
    FROM offers o
    WHERE offer_price = (SELECT min(o2.offer_price) FROM offers o2
                         WHERE o2.p_partkey = o.p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (adapted: no partsupp, so the
    per-(part, supplier) offer price is the cheapest observed sale,
    min l_extendedprice). For each LARGE mid-size part, keep every EUROPE
    supplier whose offer ties the per-part regional minimum.

    The reference would run this as Combine.perKey(Min) + a side-input
    map re-joined in a DoFn; here the correlated min is a window function
    over the aggregated offers — one extra shuffle on p_partkey, no
    self-join, no correlated re-scan of the fact table. min() selects (not
    accumulates) doubles, so the equality compare is exact in both engines.
    At 100 TB: lineitem shuffles once on the (part,supplier,...) group key;
    the window repartitions the *aggregated* offers (|parts| x |suppliers
    per part| rows, orders of magnitude smaller than the fact table)."""
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    li = load_table(spark, sf_dir, "lineitem")
    eu = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(eu, li.l_suppkey == eu.s_suppkey)
        .join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("offer_price"))
    )
    part_min = F.min("offer_price").over(W.partitionBy("p_partkey"))
    return (
        offers.withColumn("part_min", part_min)
        .filter(F.col("offer_price") == F.col("part_min"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "offer_price")
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS p_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS pv_dec
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(pv_dec) AS DOUBLE) AS total_value FROM val)
    SELECT p_partkey, CAST(pv_dec AS DOUBLE) AS part_value
    FROM val, tot WHERE CAST(pv_dec AS DOUBLE) > total_value * 0.001
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock (adapted: part value = exact sum of
    l_extendedprice supplied by NATION_3 suppliers, standing in for
    ps_supplycost * ps_availqty). Keep parts whose value exceeds 0.1% of
    the national total — the HAVING > (scalar subquery) shape.

    The global total re-aggregates the per-part values — and because Spark
    recomputes a DataFrame referenced from two branches (verified: without
    materialization the executed plan scans lineitem twice, zero
    ReusedExchange), the per-part aggregate is localCheckpoint-ed first.
    It is |parts| rows — the REDUCED relation, safe to pin at any scale —
    so lineitem is scanned and shuffled exactly once, then the 1-row total
    is broadcast back via cross join (the q22 singleton-view composition).
    Decimal discipline: BOTH aggregation levels stay exact DECIMAL — the
    per-part values AND the grand total — and only the final comparison
    operands are cast to double (summing already-cast doubles would be
    order-dependent FP accumulation and could flip threshold-adjacent
    rows between engines). The threshold multiply is double * 0.001:
    both engines evaluate the identical IEEE product of identical
    inputs."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(
            su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).select(
                "s_suppkey"
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("pv_dec")
        )
        .localCheckpoint(eager=False)
    )
    tot = val.agg(F.sum("pv_dec").cast("double").alias("total_value"))
    part_value = F.col("pv_dec").cast("double")
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(part_value > F.col("total_value") * F.lit(0.001))
        .select("p_partkey", part_value.alias("part_value"))
    )


@query(
    "q20_dominant_promo_suppliers",
    oracle="""
    WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    per_ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq_dec
      FROM lineitem JOIN promo ON l_partkey = p_partkey
      GROUP BY 1, 2),
    per_p AS (SELECT l_partkey, SUM(sq_dec) AS tq_dec FROM per_ps GROUP BY 1),
    qual AS (
      SELECT a.l_suppkey, count(*) AS n_parts_dominated
      FROM per_ps a JOIN per_p b ON a.l_partkey = b.l_partkey
      WHERE CAST(a.sq_dec AS DOUBLE) > CAST(b.tq_dec AS DOUBLE) * 0.1
      GROUP BY 1)
    SELECT s_suppkey, s_name, n_name, n_parts_dominated
    FROM qual JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q20_dominant_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style (adapted: availqty > half of demand becomes supplied
    quantity > 10% of the part's total — a dominant-share supplier). The
    Q20 shape is the nested qualification: suppliers reached only through
    an aggregated predicate over (part, supplier) groups joined against
    per-part totals.

    The per-part total is a window sum OVER the already-reduced per_ps
    relation (partitioned by l_partkey), not a second aggregation branch —
    a two-branch formulation recomputes the whole fact subplan in Spark
    (verified: zero ReusedExchange), whereas the window costs one
    repartition of |part x supplier| rows. lineitem is scanned and
    shuffled exactly once. The share compare is double > double * 0.1
    with identical operands in both engines. The final supplier/nation
    joins are broadcast dimensions. DuckDB's oracle keeps the textbook
    two-CTE form — its optimizer CSEs it; the window IS that plan."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    per_ps = (
        li.join(pa.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq_dec"))
    )
    # The per-part total stays exact DECIMAL through the window (a double
    # window sum would accumulate in partition order — nondeterministic);
    # only the comparison operands are cast.
    tot = F.sum("sq_dec").over(W.partitionBy("l_partkey"))
    qual = (
        per_ps.withColumn("tq_dec", tot)
        .filter(
            F.col("sq_dec").cast("double")
            > F.col("tq_dec").cast("double") * F.lit(0.1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
    )
    return (
        qual.join(su, qual.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "n_parts_dominated")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH fl AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_suppkey, s_name, numwait FROM (
      SELECT l1.l_suppkey, count(DISTINCT l1.l_orderkey) AS numwait
      FROM fl l1
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM fl l2 WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM fl l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      GROUP BY 1) w
    JOIN supplier ON w.l_suppkey = s_suppkey
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting (adapted: a line is
    late when l_shipdate > o_orderdate + 90 days, standing in for
    receiptdate > commitdate). For finalized orders, count per supplier the
    orders where that supplier was late, at least one OTHER supplier
    participated (EXISTS), and NO other supplier was late (NOT EXISTS) —
    i.e. this supplier alone held the order up.

    Both existence tests are DECORRELATED into order-level window
    aggregates over a single pass of the finalized lines: with
    n_supp = |distinct suppliers on the order| and
    n_late_supp = |distinct LATE suppliers on the order|,
    EXISTS(other supplier)        <=> n_supp >= 2, and
    NOT EXISTS(other late suppl.) <=> n_late_supp = 1 for a late line
    (self is the only late one). A naive semi/anti-join formulation
    referenced the fact join three times and Spark recomputed it three
    times (verified: 7 parquet scans, zero ReusedExchange); this form
    scans lineitem once, with one window exchange on l_orderkey (the
    per-order distinct sets are bounded by order size) and one groupBy
    on l_suppkey. numwait is COUNT(DISTINCT orderkey) so multi-line
    lateness counts once — counts only, no float accumulation. The
    DuckDB oracle keeps the textbook EXISTS/NOT EXISTS spec."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    su = load_table(spark, sf_dir, "supplier")
    fl = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
                "late"
            ),
        )
    )
    w = W.partitionBy("l_orderkey")
    waiting = (
        fl.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
        )
        .filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
    return (
        waiting.join(su, waiting.l_suppkey == su.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )


@query(
    "scd2_customer_history",
    oracle="""
    WITH updates AS (
      SELECT c_custkey,
             'SEG' || CAST(c_custkey % 5 AS VARCHAR) AS new_segment
      FROM customer WHERE c_custkey % 3 = 0
    ),
    closed AS (
      SELECT c.c_custkey, 1 AS ver, c.c_mktsegment AS segment,
             DATE '1995-01-01' AS valid_from,
             CASE WHEN u.c_custkey IS NULL THEN NULL
                  ELSE DATE '1996-06-01' END AS valid_to
      FROM customer c LEFT JOIN updates u USING (c_custkey)
    ),
    opened AS (
      SELECT c_custkey, 2 AS ver, new_segment AS segment,
             DATE '1996-06-01' AS valid_from,
             CAST(NULL AS DATE) AS valid_to
      FROM updates
    )
    SELECT c_custkey, ver, segment, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM (SELECT * FROM closed UNION ALL SELECT * FROM opened)
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 (round 5) — the warehouse MERGE
    pattern expressed without a transactional table format: an updates
    batch (every 3rd customer moves to a derived segment, effective
    1996-06-01) is applied to the customer dimension by CLOSING the
    affected current rows (valid_to = effective date) and OPENING new
    version-2 rows (valid_to NULL), while untouched customers keep their
    open version-1 row. Emits the full bitemporal history with an
    is_current flag — the layout every point-in-time dimension join
    reads.

    Scale shape: one left join of the dimension against the (small)
    updates batch plus a union — no window, no shuffle beyond the join
    (updates broadcast under AQE); at 100 TB the dimension is still tiny
    next to facts, and the rewrite is a full-dimension copy-on-write,
    which is exactly what Delta/Iceberg MERGE does under the hood."""
    cu = load_table(spark, sf_dir, "customer")
    eff = F.lit("1996-06-01").cast("date")
    updates = cu.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("SEG"), (F.col("c_custkey") % 5).cast("string")).alias(
            "new_segment"
        ),
    )
    closed = (
        cu.join(updates, "c_custkey", "left")
        .select(
            "c_custkey",
            F.lit(1).alias("ver"),
            F.col("c_mktsegment").alias("segment"),
            F.lit("1995-01-01").cast("date").alias("valid_from"),
            F.when(F.col("new_segment").isNotNull(), eff).alias("valid_to"),
        )
    )
    opened = updates.select(
        "c_custkey",
        F.lit(2).alias("ver"),
        F.col("new_segment").alias("segment"),
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return closed.unionByName(opened).withColumn(
        "is_current", F.col("valid_to").isNull()
    )


@query(
    "q1_incremental_refresh",
    oracle=f"""
    WITH refreshed AS (
      SELECT * FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        AND l_orderkey % 23 <> 5
      UNION ALL
      SELECT * FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        AND l_orderkey % 17 = 3
    )
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 12, 2)} AS sum_qty,
           {sql_dsum('l_extendedprice', 18, 2)} AS sum_base_price,
           {SQL_SUM_DISC_PRICE} AS sum_disc_price,
           {SQL_SUM_CHARGE} AS sum_charge,
           count(*) AS count_order
    FROM refreshed
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under TPC-H-style refresh streams
    (round 5): the Q1 aggregate is maintained as a materialized view and
    REFRESHED from delta batches alone — a delete stream (orderkey%23==5,
    the RF2 shape) and an insert stream (orderkey%17==3 re-arrivals, the
    RF1 shape) — by summing SIGNED partial aggregates: mv_partials +
    insert_partials - delete_partials per group. The base relation is
    scanned once to build the MV; the refresh touches only the deltas.

    This only works EXACTLY because of the engine's exact-decimal
    discipline: decimal sums are associative and invertible, so
    incremental-apply equals full recompute BIT FOR BIT — and the oracle
    IS the full recompute over the refreshed relation, making the IVM
    identity itself the thing the driver verifies. (Float sums would
    drift under add/subtract reordering; AVG-family columns are derived
    sum/count at the end, never maintained directly.)

    Scale shape: the MV is |groups| rows (4 here; bounded by group
    cardinality at any scale); refresh cost is one aggregate over each
    delta batch + a |groups|-sized merge — independent of base size,
    which is the entire point of IVM at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )

    def partials(df: DataFrame, sign: int) -> DataFrame:
        s = F.lit(sign)
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            (s * F.sum(F.col("l_quantity").cast("decimal(12,2)"))).alias("p_qty"),
            (s * F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))).alias(
                "p_base"
            ),
            (s * F.sum(disc_price())).alias("p_disc"),
            (s * F.sum(charge())).alias("p_charge"),
            (s * F.count(F.lit(1))).alias("p_n"),
        )

    mv = partials(li, 1).localCheckpoint(eager=False)  # built once, persisted
    deletes = partials(li.filter(F.col("l_orderkey") % 23 == 5), -1)
    inserts = partials(li.filter(F.col("l_orderkey") % 17 == 3), 1)
    merged = (
        mv.unionByName(deletes)
        .unionByName(inserts)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("p_qty").cast("double").alias("sum_qty"),
            F.sum("p_base").cast("double").alias("sum_base_price"),
            money(F.sum("p_disc")).alias("sum_disc_price"),
            money(F.sum("p_charge")).alias("sum_charge"),
            F.sum("p_n").cast("long").alias("count_order"),
        )
    )
    return merged


@query(
    "right_to_erasure_audit",
    oracle="""
    WITH doomed AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
    del_orders AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM doomed)
    ),
    del_lines AS (
      SELECT l_orderkey, l_linenumber FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
    )
    SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_delete,
           CAST(COALESCE(SUM(c_custkey), 0) AS BIGINT) AS key_sum
    FROM doomed
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) FROM del_orders
    UNION ALL
    SELECT 'lineitem', CAST(count(*) AS BIGINT),
           CAST(COALESCE(SUM(l_orderkey * 10 + l_linenumber), 0) AS BIGINT)
    FROM del_lines
    """,
)
def right_to_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure cascade audit (round 6) — the GDPR deletion
    planner every user-data warehouse runs BEFORE mutating anything:
    given a deletion cohort (customers with c_custkey % 97 == 0, the
    deterministic stand-in for a deletion-request table), resolve the
    full FK cascade — orders of those customers, line items of those
    orders — and emit per-table row counts plus key checksums, so the
    executed deletion can later be verified against the plan row for
    row. The cascade is resolved with semi-joins (never fetching
    payload columns of doomed rows) and each fact table is scanned
    once.

    At 100 TB: the cohort relation is request-sized (broadcast); orders
    prune by the broadcast semi-join; the lineitem pass semi-joins on
    the (already small) doomed-order keys — deletion planning costs two
    broadcast semi-joins, not a shuffle of any fact table. The audit
    unions three constant-width rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    doomed = cust.filter(F.col("c_custkey") % 97 == 0)
    del_orders = orders.join(
        F.broadcast(doomed),
        orders.o_custkey == doomed.c_custkey,
        "left_semi",
    ).localCheckpoint(eager=False)  # feeds its own audit row AND the cascade
    del_lines = lineitem.join(
        F.broadcast(del_orders.select("o_orderkey")),
        lineitem.l_orderkey == del_orders.o_orderkey,
        "left_semi",
    )

    def audit(df: DataFrame, tbl: str, key: F.Column) -> DataFrame:
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).alias("n_delete"),
            F.coalesce(F.sum(key), F.lit(0)).cast("long").alias("key_sum"),
        ).select("tbl", "n_delete", "key_sum")

    return (
        audit(doomed, "customer", F.col("c_custkey"))
        .unionByName(audit(del_orders, "orders", F.col("o_orderkey")))
        .unionByName(
            audit(
                del_lines,
                "lineitem",
                F.col("l_orderkey") * 10 + F.col("l_linenumber"),
            )
        )
    )
