"""TPC-H shapes 2/8/9/11/13/15/16/17/20/21/22 — the remaining host-engine
query patterns from SURVEY §2.B not yet in the inventory: correlated MIN
subquery (Q2), market-share ratio over an 8-table join (Q8), LIKE-filtered
multi-join profit rollup (Q9), HAVING-vs-global-scalar (Q11), outer-join
count distribution (Q13), view + MAX-equality selection (Q15), NOT IN +
COUNT DISTINCT (Q16), correlated AVG threshold (Q17), nested IN subqueries
(Q20), EXISTS + NOT EXISTS self-joins (Q21), and scalar-AVG + anti-join
rollup (Q22).

The driver's tables have no ``partsupp``, no commit/receipt dates, and no
customer phone, so each query keeps the *shape* (the Catalyst plan
features: decorrelation, semi/anti joins, scalar subqueries, grouped
HAVING) over the columns that exist; the docstrings note the substitution.
Presto 0.123's planner handled these same shapes for the reference
connector (SURVEY §2.B); here Catalyst plans them and every aggregate /
computed column is aliased identically to the DuckDB oracle.

Scale notes (100 TB): every small side (nation, region, filtered part,
scalar aggregates) is explicitly ``broadcast``; the only fact-fact
shuffles are on join keys (l_orderkey / l_partkey / l_suppkey), which AQE
can re-plan for skew; no collect(), no cross products except 1-row scalar
broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.queries import _t, query


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, lineitem, nation, region
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size <= 15 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2, supplier s2, nation n2, region r2
        WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery): lineitem stands in for
    partsupp as the part×supplier supply relation, l_extendedprice for
    ps_supplycost. Decorrelated as a grouped MIN re-joined on
    (partkey, price) — the same rewrite Catalyst/Presto's planner does."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nations = F.broadcast(
        _t(spark, sf_dir, "nation").join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    supp = _t(spark, sf_dir, "supplier").join(
        nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    # supply relation restricted to European suppliers (matches the
    # correlated subquery's own region filter)
    supply = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(supp.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    min_cost = supply.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    parts = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
        )
    )
    return (
        supply.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .distinct()
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly volume across an
    8-table join; both nation roles (customer region gate, supplier
    nationality) joined from the same broadcast dim under different
    aliases."""
    p = F.broadcast(_t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY"))
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           round(sum(amount_e4) / 10000.0, 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
               AS amount_e4
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year over parts
    matched by LIKE. Amount omits the partsupp cost term (no partsupp
    table); the plan shape — LIKE-filtered broadcast part join pruning
    the fact scan, then two fact joins — is what the query exercises.

    The per-row amount is fixed-pointed to 1e-4 BEFORE summing: the raw
    amounts carry ~4 decimals, so round(sum(double), 2) can land exactly
    on a .xx5 boundary where Spark-vs-DuckDB sum-order jitter flips the
    last cent (observed at sf0.01). Identical per-row doubles round to
    identical integers on both engines, and an integer sum is
    order-independent — also the cheaper plan (LongAdder vs double agg)."""
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    amount_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount_e4.alias("amount_e4"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount_e4") / 10000.0, 2).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q11_important_parts",
    oracle="""
    SELECT l_partkey AS ps_partkey, round(sum(l_extendedprice), 2) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING sum(l_extendedprice) > (
      SELECT sum(l_extendedprice) * 0.001
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3')
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with HAVING against a global
    scalar (0.1% of total). The filtered fact frame is computed once and
    feeds both the per-part agg and the 1-row total, which is broadcast —
    no second scan at plan level beyond the reused exchange."""
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    s = F.broadcast(
        _t(spark, sf_dir, "supplier").join(
            n, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey")
    )
    supply = _t(spark, sf_dir, "lineitem").join(
        s, F.col("l_suppkey") == F.col("s_suppkey")
    )
    total = supply.agg(
        (F.sum("l_extendedprice") * F.lit(0.001)).alias("threshold")
    )
    return (
        supply.groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum("l_extendedprice").alias("raw_value"))
        .join(F.broadcast(total))  # 1-row scalar broadcast, not a shuffle
        .filter(F.col("raw_value") > F.col("threshold"))
        .select(
            "ps_partkey", F.round("raw_value", 2).alias("part_value")
        )
        .orderBy(F.desc("part_value"), F.asc("ps_partkey"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a filter inside the ON
    clause (not a WHERE — the distinction matters for outer joins), then
    a count-of-counts distribution. Priority filter stands in for the
    reference's o_comment NOT LIKE (no comment column)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a revenue view consumed twice — once for the MAX
    scalar, once for the equality selection. The grouped frame is tiny
    (≤ |supplier| rows) so both consumers broadcast; the underlying agg
    exchange is reused, not recomputed from the fact scan."""
    revenue = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "raw_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("raw_revenue").alias("max_revenue"))
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(revenue), F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("raw_revenue") == F.col("max_revenue"))
        .select(
            "s_suppkey", "s_name", F.round("raw_revenue", 2).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (→ anti join; l_suppkey is
    non-null so the null-semantics trap is moot), negated predicates on
    the broadcast dim, COUNT DISTINCT per group. lineitem stands in for
    partsupp as the part×supplier bridge; negative-balance suppliers for
    the reference's complaints filter."""
    excluded = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#3")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG threshold per part, decorrelated
    to a grouped agg re-joined on partkey. The threshold agg runs over
    ALL parts' lineitems (the correlation domain), not just the brand —
    same as the SQL. Quantities are integer-valued doubles, so
    sum-order differences cannot move the 0.2·avg boundary."""
    li = _t(spark, sf_dir, "lineitem")
    limits = li.groupBy(F.col("l_partkey").alias("lim_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(limits, F.col("l_partkey") == F.col("lim_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q20_promotable_suppliers",
    oracle="""
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
    ORDER BY s_name
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → two stacked semi joins
    (part names into lineitem, qualified suppliers into supplier), with
    a grouped HAVING between them. Shipped-quantity threshold stands in
    for the availqty comparison (no partsupp)."""
    small_parts = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qualified = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS and NOT EXISTS against the
    same fact table → a semi join and an anti join, each with an equi
    key (l_orderkey) plus a non-equi residual (supplier inequality).
    returnflag='R' stands in for the receipt>commit lateness predicate
    (no receipt/commit dates); the multi-supplier-order structure being
    probed is identical."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    n = F.broadcast(
        _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    )
    s = _t(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.k3) & (l1.l_suppkey != l3.s3),
            "left_anti",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT c_nationkey AS cntrycode, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 4, 7, 10, 13, 17, 20)
        AND c_acctbal > (
          SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar AVG threshold + NOT EXISTS
    anti join, rolled up by a customer code. c_nationkey stands in for
    the phone-prefix cntrycode and 'no urgent orders' for 'no orders'
    (every synthetic customer has at least one order)."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.filter(F.col("c_nationkey").isin(1, 4, 7, 10, 13, 17, 20))
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
