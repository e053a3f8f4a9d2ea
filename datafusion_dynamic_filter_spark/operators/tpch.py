"""TPC-H-adapted decision-support suite over the synthetic star schema.

The reference ships three TPC-H-shaped correctness/bench queries (Q1/Q3/Q5
shapes appear in its test corpus; see
``/root/reference/datafusion-dynamic-filter/tests/`` and SURVEY.md §2 C4/C6);
this module widens the same surface to the rest of the classic TPC-H
patterns the reduced synthetic schema can express:

- Q2  (correlated-MIN cheapest supplier)          -> ``q2_min_cost_supplier``
- Q4  (semi-join EXISTS + priority rollup)        -> ``q4_order_priority``
- Q6  (single-scan predicate-pushdown revenue)    -> ``q6_forecast_revenue``
- Q7  (two-nation volume shipping, 5-way join)    -> ``q7_volume_shipping``
- Q8  (market share ratio inside a region)        -> ``q8_market_share``
- Q9  (profit by nation x year, 5-way join)       -> ``q9_product_profit``
- Q10 (returned-items top-k, 4-way join)          -> ``q10_returned_items``
- Q11 (value share above a scalar threshold)      -> ``q11_important_stock``
- Q12 (conditional priority counts per class)     -> ``q12_priority_lines``
- Q13 (distribution of orders per customer)       -> ``q13_customer_distribution``
- Q14 (promo revenue ratio)                       -> ``q14_promo_revenue``
- Q15 (top supplier over a revenue CTE)           -> ``q15_top_supplier``
- Q16 (distinct suppliers per bucket, NOT IN)     -> ``q16_parts_supplier_relationship``
- Q17 (correlated avg-quantity threshold)         -> ``q17_small_qty_revenue``
- Q18 (large-volume orders via HAVING semi-join)  -> ``q18_large_volume_customer``
- Q19 (OR-of-conjuncts discounted revenue)        -> ``q19_discounted_revenue``
- Q20 (correlated half-of-total semi-join)        -> ``q20_potential_promotion``
- Q21 (double-correlated EXISTS / NOT EXISTS)     -> ``q21_waiting_suppliers``
- Q22 (anti-join prospects above avg balance)     -> ``q22_prospect_customers``

With Q1/Q3/Q5 in ``relational.py`` this completes all 22 classic TPC-H
query shapes (adapted to the reduced schema).

Adaptations forced by the reduced schema (no partsupp, l_commitdate,
l_receiptdate, l_shipmode, c_phone, comments): Q4's lateness EXISTS becomes
a returned-line EXISTS; Q9 prices cost as ``0.1 * p_retailprice`` per unit;
Q13's comment NOT LIKE becomes a priority exclusion; Q19 drops the
shipinstruct/shipmode conjuncts; Q22's phone-prefix country code becomes
``c_nationkey``.  Every query keeps the classic plan SHAPE — that is what
exercises the engine.

Scale notes (100 TB): every query here is a declarative Catalyst plan —
filters and projections push to the parquet scan, dimension joins
(region/nation/supplier/customer-side aggregates) broadcast under AQE, and
fact-fact joins shuffle on their keys with map-side partial aggregation.
The DataFrame-API variants (q7/q8/q10) pin the dimension broadcasts
explicitly; the SQL variants leave the choice to AQE, which picks broadcast
at these sizes and sort-merge at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query, tables


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
    AND EXISTS (SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: date-sliced orders, EXISTS semi-join against the fact
    table, tiny-cardinality rollup.  Catalyst plans the EXISTS as a
    left-semi hash join on l_orderkey; the date filter pushes to the scan."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
    CAST(count(*) AS BIGINT) AS qualifying_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l_discount BETWEEN 0.05 AND 0.07
    AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the canonical pushdown query — one scan, all four
    predicates land in PushedFilters, two-column ReadSchema, single
    global aggregate.  At 100 TB this is a pure map-side scan+combine."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS qualifying_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: fact-to-fact join chain with TWO broadcast copies of
    the nation dimension and a disjunctive cross-nation predicate.
    DataFrame API so the dimension broadcasts are pinned explicitly —
    at 100 TB nation is KB-sized and must never shuffle the fact table."""
    t = tables(spark, sf_dir)
    n1 = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    joined = (
        t["supplier"]
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
    round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
    / sum(volume), 4) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS nation
    FROM part JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 7-relation join with a conditional-share aggregate.
    region/nation (and, under AQE at this SF, part/supplier) broadcast;
    the orders-lineitem spine is the only shuffle at scale."""
    t = tables(spark, sf_dir)
    n1 = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
        )
    )
    n2 = F.broadcast(
        t["nation"].select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
        )
    )
    reg = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
    promo_parts = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    joined = (
        t["lineitem"]
        .join(promo_parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("c_nkey"))
        .join(reg, F.col("c_rkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    share = F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
    return (
        joined.groupBy("o_year")
        .agg(F.round(share / F.sum("volume"), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
    l_extendedprice * (1 - l_discount)
    - 0.1 * p_retailprice * l_quantity AS amount
    FROM part JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, sum_profit DESC, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation x order year.  The schema
    has no partsupp, so unit cost is priced as 0.1 * p_retailprice
    (documented adaptation); the LIKE filter prunes part before the join."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (SELECT n_name AS nation,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity AS amount
              FROM part JOIN lineitem ON p_partkey = l_partkey
                   JOIN supplier ON s_suppkey = l_suppkey
                   JOIN orders ON o_orderkey = l_orderkey
                   JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%') profit
        GROUP BY nation, o_year
        ORDER BY nation, sum_profit DESC, o_year
        """
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
    round(c_acctbal, 2) AS acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-revenue top-k per customer.  DataFrame API
    with the nation broadcast pinned; revenue DESC + custkey gives the
    total order the value-hash compare needs."""
    t = tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    joined = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(returned, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with a join-level residual predicate
    (the schema has no o_comment, so the classic NOT LIKE becomes a
    priority exclusion), then a distribution-of-counts re-aggregation."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                   ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: one month of lineitem joined to part, conditional
    ratio aggregate.  The date slice pushes to the fact scan so the join
    probes only ~1/36 of lineitem."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
        """
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    ORDER BY total_revenue DESC, s_suppkey
    LIMIT 1
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue CTE + argmax supplier.  The classic form
    compares against a scalar MAX subquery; a deterministic total order
    (rounded revenue DESC, suppkey) picks the same winner on both engines
    without re-scanning the CTE — on a cluster this is one shuffle for
    the agg and a broadcast of the 1-row top."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        ORDER BY total_revenue DESC, s_suppkey
        LIMIT 1
        """
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
    CAST(count(*) AS BIGINT) AS small_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
    AND l_quantity < (SELECT round(0.2 * avg(l_quantity), 6)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery — per-part average
    quantity threshold.  Catalyst de-correlates it into an aggregate +
    join (no per-row re-execution); the threshold is rounded to 6dp on
    both engines so summation order can't flip the strict inequality."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS small_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT round(0.2 * avg(l_quantity), 6)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
    CAST(count(*) AS BIGINT) AS matched_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
    AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
    AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
    AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjuncts across
    the join (shipmode/shipinstruct conjuncts dropped — not in schema).
    Catalyst extracts the common join key and pushes the p_brand IN
    (...) / p_size <= 35 envelope below the join."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS matched_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 40)
        """
    )


@query(
    "q22_prospect_customers",
    oracle="""
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
    round(sum(c_acctbal), 2) AS totacctbal
    FROM (SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    AND c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
    WHERE c_acctbal > 0.0
    AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
    AND o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_prospect_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with NO urgent
    orders (anti-join), grouped by country code.  Two schema-forced
    adaptations: the phone-prefix country code becomes c_nationkey, and
    the anti-join is against URGENT orders only (the dense synthetic
    orders table leaves no customer order-less).  The scalar avg
    broadcasts; NOT EXISTS plans as a left-anti hash join against the
    filtered o_custkey projection."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
              FROM customer
              WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
                AND c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
                                 WHERE c_acctbal > 0.0
                                   AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderpriority = '1-URGENT')
              ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode
        """
    )

@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
    strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
    round(o_totalprice, 2) AS totalprice,
    round(sum(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'),
    o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: the IN-subquery is a self-semi-join against a
    HAVING aggregate over the same fact table (top ~1% of orders by
    total quantity).  Catalyst plans it as agg -> left-semi hash join;
    at 100 TB both sides shuffle on l_orderkey/o_orderkey and AQE
    broadcasts the small qualifying-keys side."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               round(o_totalprice, 2) AS totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey,
                 date_format(o_orderdate, 'yyyy-MM-dd'), o_totalprice
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH unit_cost AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
    min(l_extendedprice * (1 - l_discount) / l_quantity) AS cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
    ), offers AS (
    SELECT uc.partkey, uc.suppkey, uc.cost, s_acctbal, s_name, n_name
    FROM unit_cost uc JOIN supplier ON s_suppkey = uc.suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
    p_partkey, p_type, round(o.cost, 4) AS min_cost
    FROM part JOIN offers o ON p_partkey = o.partkey
    WHERE p_size <= 10 AND p_type = 'STANDARD'
    AND o.cost = (SELECT min(o2.cost) FROM offers o2
    WHERE o2.partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: minimum-cost supplier per qualifying part inside one
    region, selected by a correlated MIN subquery.  Schema-forced
    adaptation (no partsupp): the per-(part, supplier) supply cost is the
    minimum observed effective unit price in lineitem history —
    ``min(l_extendedprice * (1 - l_discount) / l_quantity)`` — which keeps
    the classic plan SHAPE exactly: a grouped cost relation, dimension
    joins to restrict the region, and a correlated min over the same cost
    relation deciding the winner.

    Scale notes (100 TB): the cost relation reduces lineitem with one
    map-side-combined groupBy on (partkey, suppkey); supplier/nation/
    region are broadcast dims; Catalyst de-correlates the MIN subquery
    into an aggregate + equi-join on partkey (no per-row re-execution).
    The double equality is exact — both sides are the SAME min over the
    SAME IEEE-computed multiset, not two independently-derived floats."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        WITH unit_cost AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 min(l_extendedprice * (1 - l_discount) / l_quantity) AS cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ), offers AS (
          SELECT uc.partkey, uc.suppkey, uc.cost, s_acctbal, s_name, n_name
          FROM unit_cost uc JOIN supplier ON s_suppkey = uc.suppkey
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_type, round(o.cost, 4) AS min_cost
        FROM part JOIN offers o ON p_partkey = o.partkey
        WHERE p_size <= 10 AND p_type = 'STANDARD'
          AND o.cost = (SELECT min(o2.cost) FROM offers o2
                        WHERE o2.partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH supply AS (
    SELECT l_partkey AS partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18, 2))
    * (1 - CAST(l_discount AS DECIMAL(4, 2)))) AS value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey IN (0, 1, 2, 3, 4)
    GROUP BY l_partkey
    )
    SELECT partkey, CAST(round(value, 2) AS DOUBLE) AS value
    FROM supply
    WHERE value > (SELECT sum(value) * 0.001 FROM supply)
    ORDER BY round(value, 2) DESC, partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part supply value restricted to one supplier
    country group, kept only where the part's value exceeds a FRACTION of
    the global total (scalar subquery threshold).  Schema-forced
    adaptation (no partsupp): value = discounted revenue supplied from
    the chosen nations' suppliers, aggregated from lineitem.

    Scale notes (100 TB): one shuffle on l_partkey with map-side partial
    sums builds the supply relation; the global total is a 1-row scalar
    that broadcasts into the filter; threshold 0.1% keeps the output a
    small head.  Revenue accumulates in DECIMAL(18,2) x DECIMAL(4,2)
    arithmetic — exact and accumulation-order-independent — so the
    per-part values, the global threshold, and the 2-dp output are
    bit-identical across engines (a raw double sum flipped a half-cent
    rounding boundary here: many small part-level groups = many boundary
    draws)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        WITH supply AS (
          SELECT l_partkey AS partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                 * (1 - CAST(l_discount AS DECIMAL(4, 2)))) AS value
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          WHERE s_nationkey IN (0, 1, 2, 3, 4)
          GROUP BY l_partkey
        )
        SELECT partkey, CAST(round(value, 2) AS DOUBLE) AS value
        FROM supply
        WHERE value > (SELECT sum(value) * 0.001 FROM supply)
        ORDER BY round(value, 2) DESC, partkey
        """
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape: orders-lineitem join with conditional CASE counts
    of high- vs low-priority orders, grouped by a line attribute.
    Schema-forced adaptation (no l_shipmode/commitdate/receiptdate): the
    grouping key is l_returnflag and the date window is on l_shipdate —
    the plan SHAPE (one fact-fact equi-join, date pushdown, two
    conditional sums, 3-row output) is the classic one.

    Scale notes (100 TB): the date filter pushes to the lineitem scan;
    the join shuffles on orderkey (AQE broadcasts nothing here — both
    sides are facts); the CASE-sums partial-aggregate map-side into a
    3-group reduction.  All-integer outputs — parity is exact."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "q16_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#15'
    AND p_type NOT LIKE 'PROMO%'
    AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
    WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    qualifying (brand, type, size) bucket, excluding blacklisted
    suppliers via NOT IN.  Schema-forced adaptation (no partsupp /
    comments): the part-supplier relationship comes from lineitem
    history, and the 'customer complaints' blacklist becomes
    negative-balance suppliers.

    Scale notes (100 TB): brand/type/size predicates push to the part
    scan; the NOT IN is a tiny build side Catalyst plans as a
    null-aware anti broadcast join; count(DISTINCT) shuffles on the
    grouping key with per-key supplier sets partial-deduplicated
    map-side.  All-integer outputs."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#15'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@query(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
    sum(l_quantity) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
    SELECT sp.suppkey FROM shipped sp
    WHERE sp.qty > 0.5 * (SELECT sum(sp2.qty) FROM shipped sp2
    WHERE sp2.partkey = sp.partkey)
    )
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who dominate the supply of promoted
    ('small%') parts in a year — a semi-join whose inner side compares a
    per-(part, supplier) aggregate against a correlated 50%-of-part-total
    threshold.  Schema-forced adaptation (no partsupp.availqty): the
    classic 'availqty > half of shipped' becomes 'this supplier shipped
    more than half of the part's total' — the nested
    aggregate-with-correlated-scalar plan shape is identical.

    Scale notes (100 TB): the name LIKE pushes to the part scan and
    prunes lineitem via the join; one grouped reduction builds shipped;
    Catalyst de-correlates the scalar into a partkey-grouped total +
    equi-join (no per-row re-execution); the final IN is a left-semi
    join against the ~100-row supplier dim.  Integral quantities make
    the 0.5x compare exact in doubles on both engines."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        WITH shipped AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 sum(l_quantity) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_partkey, l_suppkey
        )
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT sp.suppkey FROM shipped sp
          WHERE sp.qty > 0.5 * (SELECT sum(sp2.qty) FROM shipped sp2
                                WHERE sp2.partkey = sp.partkey)
        )
        ORDER BY s_name
        """
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
    AND l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
    AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
    AND l3.l_suppkey <> l1.l_suppkey
    AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: in failed multi-supplier orders, count per
    supplier the lines where THIS supplier is the only one whose line
    was returned — the classic double-correlated EXISTS / NOT EXISTS
    self-join pair over the fact table.  Schema-forced adaptation (no
    commit/receipt dates): 'kept waiting' becomes 'sole returned line'
    (l_returnflag = 'R'), preserving both correlated quantifiers.

    Scale notes (100 TB): Catalyst plans the EXISTS as a left-semi and
    the NOT EXISTS as a left-anti hash join, both shuffling on
    l_orderkey — three co-partitioned passes over lineitem, no
    nested-loop anywhere; the supplier dim broadcasts.  All-integer
    outputs; (numwait DESC, s_name) is a total order."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )
