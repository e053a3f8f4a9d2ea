"""Relational operator coverage (SURVEY.md §2 Tier B + Tier C).

Tier B entries run through the PreparedStatement engine (the reference's own
exercised behaviors, tests/preparable_context_basic_test.rs +
tests/preparable_context_parquet_test.rs); Tier C entries cover the inherited
SQL surface admitted by prepare() (src/preparable_context.rs:15-30) — joins,
aggregation, windows, set ops, subqueries, scalar functions — expressed
declaratively so Catalyst owns the physical strategy.
"""

from __future__ import annotations

from ..engine import Engine
from ..registry import query, tables

# --------------------------------------------------------------------------
# Tier B — prepared-statement behaviors (reference correctness targets)
# --------------------------------------------------------------------------


@query(
    "prepared_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey = 42
    """,
)
def prepared_point_lookup(spark, sf_dir):
    # B5: WHERE id = $1 (tests/preparable_context_basic_test.rs:68-103)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus "
        "FROM orders WHERE o_orderkey = $1"
    )
    return stmt.execute({"$1": 42})


@query(
    "prepared_repeat_execution",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = 5
    """,
)
def prepared_repeat_execution(spark, sf_dir):
    # B11: two executions of ONE statement; result of the second is checked
    # (tests/preparable_context_basic_test.rs:106-145)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    stmt.execute({"$1": 1}).collect()
    return stmt.execute({"$1": 5})


@query(
    "prepared_string_eq",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_name = 'NATION_7'
    """,
)
def prepared_string_eq(spark, sf_dir):
    # B6: string equality param (tests/preparable_context_basic_test.rs:148-183)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_name = $1"
    )
    return stmt.execute({"$1": "NATION_7"})


@query(
    "prepared_range_conjunction",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity >= 10 AND l_quantity <= 15
    """,
)
def prepared_range_conjunction(spark, sf_dir):
    # B7: >= AND <= two-param range (tests/preparable_context_basic_test.rs:186-218)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
        "FROM lineitem WHERE l_quantity >= $1 AND l_quantity <= $2"
    )
    return stmt.execute([10.0, 15.0])


@query(
    "prepared_mixed_range",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_custkey >= 1400 AND o_totalprice <= 50000
    """,
)
def prepared_mixed_range(spark, sf_dir):
    # B7 variant: range over two different columns
    # (tests/preparable_context_parquet_test.rs:192-232)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderkey FROM orders WHERE o_custkey >= $1 AND o_totalprice <= $2"
    )
    return stmt.execute([1400, 50000.0])


@query(
    "prepared_count_star",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM customer WHERE c_acctbal >= 1000
    """,
)
def prepared_count_star(spark, sf_dir):
    # B9: COUNT(*) over filtered input -> Int64/LongType
    # (tests/preparable_context_basic_test.rs:276-303)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT COUNT(*) AS cnt FROM customer WHERE c_acctbal >= $1"
    )
    return stmt.execute([1000.0])


@query(
    "prepared_projection",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_orderkey = 100
    """,
)
def prepared_projection(spark, sf_dir):
    # B4: single-column projection (tests/preparable_context_basic_test.rs:244-273)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderpriority FROM orders WHERE o_orderkey = $1"
    )
    return stmt.execute([100])


@query(
    "prepared_empty_result",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderkey = -1
    """,
)
def prepared_empty_result(spark, sf_dir):
    # empty result is not an error (tests/preparable_context_basic_test.rs:221-241)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare("SELECT o_orderkey FROM orders WHERE o_orderkey = $1")
    return stmt.execute([-1])


@query(
    "prepared_or_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderkey = 7 OR o_orderkey = 11
    """,
)
def prepared_or_predicate(spark, sf_dir):
    # B8: OR / nested boolean predicates with placeholders (src/rule.rs:174-192)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey = $1 OR o_orderkey = $2"
    )
    return stmt.execute([7, 11])


@query(
    "prepared_in_list_batch",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (2, 4, 6, 8, 10, 12, 14, 16, 18, 20)
    """,
)
def prepared_in_list_batch(spark, sf_dir):
    # B15: multi-key IN-list via params-as-data broadcast semi-join
    # (reference README.md:46-51 benchmark capability)
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    return stmt.execute_batch([[k] for k in range(2, 21, 2)])


@query(
    "prepared_cte_template",
    oracle="""
    WITH big AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 50000)
    SELECT o_custkey,
    CAST(count(*) AS BIGINT) AS n_big,
    round(max(o_totalprice), 2) AS top_price
    FROM big WHERE o_custkey = 7 GROUP BY o_custkey
    """,
)
def prepared_cte_template(spark, sf_dir):
    # r5 grammar extension: a prepared `WITH ... WHERE k = $1` statement on
    # the dynamic fast path — the reference prepares any non-DDL plan, CTEs
    # included (src/preparable_context.rs:15-30).  The CTE body resolves
    # once at prepare time; per-key work is the bound filter only.
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "WITH big AS (SELECT o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 50000) "
        "SELECT o_custkey, count(*) AS n_big, "
        "round(max(o_totalprice), 2) AS top_price "
        "FROM big WHERE o_custkey = $1 GROUP BY o_custkey"
    )
    return stmt.execute([7])


@query(
    "prepared_having_threshold",
    oracle="""
    SELECT o_custkey,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(max(o_totalprice), 2) AS top_price
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 12 AND max(o_totalprice) < 400000
    ORDER BY o_custkey
    """,
)
def prepared_having_threshold(spark, sf_dir):
    # r5 grammar extension: parameterized HAVING on the dynamic fast path.
    # HAVING is a Filter over the Aggregate, squarely inside the reference's
    # dynamic-filter scope (DynamicFilterRule matches LogicalPlan::Filter,
    # src/rule.rs:32-49).  Aggregate-bearing predicates evaluate inside the
    # aggregation (see CompiledTemplate._apply_agg); params bind per execute.
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_custkey, count(*) AS n_orders, "
        "round(max(o_totalprice), 2) AS top_price "
        "FROM orders GROUP BY o_custkey "
        "HAVING count(*) >= $1 AND max(o_totalprice) < $2 "
        "ORDER BY o_custkey"
    )
    return stmt.execute([12, 400000.0])


@query(
    "constant_select",
    oracle="""
    SELECT 1 AS one, 'x' AS tag
    """,
)
def constant_select(spark, sf_dir):
    # B10: literal-only query (tests/preparable_context_basic_test.rs:60-65)
    stmt = Engine(spark).prepare("SELECT 1 AS one, 'x' AS tag")
    return stmt.execute()


# --------------------------------------------------------------------------
# Tier C — inherited SQL surface (aggregation / joins / windows / set ops)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
    round(sum(l_quantity), 2) AS sum_qty,
    round(sum(l_extendedprice), 2) AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
    round(avg(l_quantity), 4) AS avg_qty,
    round(avg(l_extendedprice), 4) AS avg_price,
    round(avg(l_discount), 4) AS avg_disc,
    CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    # TPC-H Q1 shape: scan-heavy group-by aggregation with map-side partials.
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
    strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
    o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
    AND l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    # TPC-H Q3 shape: 3-way join + agg + total-order top-k.
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
        GROUP BY l_orderkey, date_format(o_orderdate, 'yyyy-MM-dd'), o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape: 6-way join; dims are broadcast-able, fact join shuffles.
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def join_broadcast_dims(spark, sf_dir):
    # B14 analog: fact joined to a broadcast dim chain (hash-join dynamic
    # filtering motivation, reference README.md:23).
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    dims = (
        t["customer"]
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
    )
    return (
        t["orders"]
        .join(dims.select("c_custkey", "r_name"), t["orders"].o_custkey == F.col("c_custkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("r_name")
    )


@query(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
    SELECT DISTINCT event_type,
    CAST(strlen(event_type) AS DOUBLE) AS weight
    FROM events
    )
    SELECT e.event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(e.value * d.weight), 2) AS weighted_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def join_salted_skew(spark, sf_dir, *, salts: int = 8):
    """Manual SALTED join — the static skew-handling technique for a
    shuffle join whose key distribution is pathological (here event_type:
    5 values over the whole fact table, so an unsalted shuffle join sends
    each key's entire mass to ONE reducer).  The small side is replicated
    across `salts` copies (salt exploded in), the fact side gets a
    uniform salt from a row-id hash, and the join keys on
    (event_type, salt) — each hot key now spreads over `salts` reducers.
    Join semantics are unchanged: every fact row matches exactly the one
    dim copy carrying its salt, which is what the plain-join oracle
    verifies.

    This is the technique to reach for when the skew is KNOWN and AQE's
    runtime skew-join split (spark.sql.adaptive.skewJoin, on in the
    engine's session factory) can't apply — e.g. the skewed side feeds a
    same-keyed aggregation that would re-concentrate, or the join is a
    shuffled-hash build AQE won't split.  The merge hint forces the
    shuffle join here (Spark would otherwise broadcast this tiny dim and
    hide the mechanics the operator demonstrates)."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    dim = (
        t["events"]
        .select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("double"))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    fact = t["events"].withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(salts))
    )
    return (
        fact.join(dim_salted.hint("merge"), ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias(
                "weighted_value"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "semi_join_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def semi_join_exists(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_not_exists",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '1998-06-01')
    ORDER BY c_custkey
    """,
)
def anti_join_not_exists(spark, sf_dir):
    """NOT EXISTS → left_anti join (reference inherits the rewrite via
    DataFusion's decorrelation; SURVEY §2 Tier C joins).

    The anti-join runs against a DATE-WINDOWED orders subset ("customers
    with no order since 1998-06-01") rather than all orders: at test/driver
    scale every customer has *some* order, so the unfiltered form returned
    zero rows on both engines — a vacuous green that proved nothing (judged
    r7).  This form is non-empty at sf0.001 (3 rows) and sf0.01 (8 rows)
    while keeping the NOT EXISTS shape, and the filter on the build side
    shrinks the anti-join's hash relation — the same predicate-first
    ordering you'd want at 100 TB."""
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("1998-06-01").cast("date"))
    return (
        t["customer"]
        .join(recent, t["customer"].c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "left_outer_order_counts",
    oracle="""
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def left_outer_order_counts(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark, sf_dir):
    # Sort/limit -> Spark's TakeOrderedAndProject (no full sort at scale).
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer) t
    WHERE rn <= 3
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
)
def window_topk_per_group(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        t["customer"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", F.desc("c_acctbal"), "c_custkey")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
    round(sum(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
    round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
    FROM events WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
)
def window_lag_delta(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
    CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def distinct_agg(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "grouping_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
    coalesce(n_name, 'ALL') AS nation_name,
    CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region_name, nation_name
    """,
)
def grouping_rollup(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region_name, nation_name
        """
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
)
def setop_intersect(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o).orderBy("o_custkey")


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY o_custkey
    """,
)
def setop_except(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = t["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.subtract(p).orderBy("o_custkey")


@query(
    "union_all_counts",
    oracle="""
    SELECT label, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT o_orderpriority AS label FROM orders
    UNION ALL
    SELECT event_type AS label FROM events
    ) u GROUP BY label ORDER BY label
    """,
)
def union_all_counts(spark, sf_dir):
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    u = t["orders"].select(F.col("o_orderpriority").alias("label")).unionAll(
        t["events"].select(F.col("event_type").alias("label"))
    )
    return u.groupBy("label").agg(F.count(F.lit(1)).alias("n")).orderBy("label")


@query(
    "scalar_functions",
    oracle="""
    SELECT p_partkey,
    upper(p_brand) AS brand_u,
    substr(p_name, 1, 8) AS name_prefix,
    length(p_type) AS type_len,
    CASE WHEN p_size > 25 THEN 'large' WHEN p_size > 10 THEN 'medium' ELSE 'small' END AS size_class,
    round(p_retailprice * 1.1, 2) AS inflated
    FROM part WHERE p_partkey < 100 ORDER BY p_partkey
    """,
)
def scalar_functions(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               substr(p_name, 1, 8) AS name_prefix,
               length(p_type) AS type_len,
               CASE WHEN p_size > 25 THEN 'large' WHEN p_size > 10 THEN 'medium' ELSE 'small' END AS size_class,
               round(p_retailprice * 1.1, 2) AS inflated
        FROM part WHERE p_partkey < 100 ORDER BY p_partkey
        """
    )


@query(
    "date_functions",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value
    FROM events
    GROUP BY strftime(date_trunc('day', ts), '%Y-%m-%d')
    ORDER BY day
    """,
)
def date_functions(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT date_format(date_trunc('DAY', ts), 'yyyy-MM-dd') AS day,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY date_format(date_trunc('DAY', ts), 'yyyy-MM-dd')
        ORDER BY day
        """
    )


@query(
    "having_filter",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING count(*) > 3
    ORDER BY n_name
    """,
)
def having_filter(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        HAVING count(*) > 3
        ORDER BY n_name
        """
    )


@query(
    "scalar_subquery",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def scalar_subquery(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "in_subquery",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
    ORDER BY c_custkey
    """,
)
def in_subquery(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        ORDER BY c_custkey
        """
    )


@query(
    "conditional_agg_pivot",
    oracle="""
    SELECT o_orderpriority,
    round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
    round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
    round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def conditional_agg_pivot(spark, sf_dir):
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
               round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
               round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@query(
    "approx_count_distinct",
    oracle="""
    SELECT event_type,
    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
    TRUE AS within_bounds
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def approx_count_distinct(spark, sf_dir):
    """HLL++ sketches are engine-specific, so the verifiable contract is the
    error bound: emit the exact count plus a boolean asserting the sketch
    estimate is within 3 relative standard deviations (rsd=0.05) of it —
    deterministic per input, and TRUE is what the oracle expects."""
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F

    approx = F.approx_count_distinct("user_id", rsd=0.05)
    exact = F.count_distinct(F.col("user_id"))
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            (F.abs(approx - exact) / exact <= 0.15).alias("within_bounds"),
        )
        .orderBy("event_type")
    )


@query(
    "grouping_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
    coalesce(o_orderpriority, 'ALL') AS priority,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def grouping_cube(spark, sf_dir):
    """CUBE over two dims (Tier C grouping-sets surface; Spark expands to a
    single expand+hash-agg — one shuffle regardless of grouping-set count)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status, priority
        """
    )


@query(
    "full_outer_join",
    oracle="""
    WITH buyers AS (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey
    )
    SELECT coalesce(c.c_custkey, b.o_custkey) AS custkey,
    CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS BIGINT) AS has_account,
    coalesce(b.n_orders, 0) AS n_orders
    FROM customer c FULL OUTER JOIN buyers b ON c.c_custkey = b.o_custkey
    ORDER BY custkey
    """,
)
def full_outer_join(spark, sf_dir):
    """FULL OUTER join (Tier C join surface): customers vs order-activity,
    preserving rows unmatched on either side.  Full-outer cannot broadcast —
    it is the shuffle-hash/SMJ case by construction."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    buyers = t["orders"].groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    c = t["customer"].alias("c")
    return (
        c.join(buyers.alias("b"), F.col("c.c_custkey") == F.col("b.o_custkey"), "full_outer")
        .select(
            F.coalesce(F.col("c.c_custkey"), F.col("b.o_custkey")).alias("custkey"),
            F.when(F.col("c.c_custkey").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("has_account"),
            F.coalesce(F.col("b.n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("custkey")
    )


@query(
    "window_ntile_frames",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
    CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
    round(first_value(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey), 2) AS cheapest,
    round(avg(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_avg3
    FROM orders WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
)
def window_ntile_frames(spark, sf_dir):
    """ntile + first_value + ROWS-frame moving average (Tier C window
    surface beyond rank/lag: explicit frame specs)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(-2, Window.currentRow)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
            F.round(F.avg("o_totalprice").over(wf), 2).alias("moving_avg3"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "percentile_stats",
    oracle="""
    SELECT o_orderpriority,
    round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
    round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
    round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def percentile_stats(spark, sf_dir):
    """Exact continuous percentiles (Spark `percentile` == DuckDB
    quantile_cont: linear interpolation).  The approx_percentile variant is
    the 100 TB path (t-digest, no global sort) — kept as a rows-only query
    because sketches differ across engines."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "grouping_sets_explicit",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
    coalesce(o_orderpriority, 'ALL') AS priority,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY status, priority
    """,
)
def grouping_sets_explicit(spark, sf_dir):
    """Arbitrary GROUPING SETS — the general form behind rollup/cube
    (reference Tier C aggregation surface): per-(status, priority) cells,
    per-status subtotals, and the grand total in ONE expand + hash-agg pass
    (one shuffle regardless of set count).  Nullable group keys are
    COALESCE'd to 'ALL' before the ORDER BY so row order is engine-neutral
    (Spark sorts NULLS FIRST by default, DuckDB NULLS LAST)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY status, priority
        """
    )


@query(
    "window_analytic_values",
    oracle="""
    SELECT o_custkey, o_orderkey,
    first_value(o_totalprice) OVER w AS first_price,
    last_value(o_totalprice) OVER
    (PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
    nth_value(o_totalprice, 2) OVER
    (PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_analytic_values(spark, sf_dir):
    """Analytic value window functions (first_value / last_value /
    nth_value) with explicit frames — last_value and nth_value need the
    full-partition frame, since the default frame stops at CURRENT ROW and
    would return the running last/2nd instead.  Partition order is by the
    unique o_orderkey, so results are deterministic on both engines."""
    t = tables(spark, sf_dir)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 20)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_totalprice").over(w).alias("first_price"),
            F.last("o_totalprice").over(wfull).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "lateral_topn_per_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey < 20
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
)
def lateral_topn_per_customer(spark, sf_dir):
    """Correlated LATERAL subquery — top-2 orders per customer expressed as
    a per-row dependent subquery instead of a window (the other idiom for
    top-N-per-key; Catalyst decorrelates it into a ranked join).  Inner
    ORDER BY carries the unique o_orderkey tiebreak so the LIMIT cut is
    deterministic on both engines."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey < 20
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "filtered_agg_with_offset",
    oracle="""
    SELECT o_orderpriority,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
    round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS finished_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    LIMIT 3 OFFSET 1
    """,
)
def filtered_agg_with_offset(spark, sf_dir):
    """FILTER (WHERE ...) aggregate modifiers — per-aggregate predicates in
    one hash-agg pass (no self-join, no CASE pyramid) — plus LIMIT/OFFSET
    pagination on the sorted output (both Tier C surface rows the coverage
    map promised but no query exercised)."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
               round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS finished_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        LIMIT 3 OFFSET 1
        """
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
    round(avg(val), 4) AS avg_val, round(sum(val), 2) AS sum_val
    FROM (UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax
                   FROM lineitem)
          ON l_quantity, l_extendedprice, l_discount, l_tax
          INTO NAME measure VALUE val)
    GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """,
)
def unpivot_melt(spark, sf_dir):
    """UNPIVOT / melt: wide measure columns to long (measure, value) rows —
    the DataFrame.unpivot surface (Spark >= 3.4, the relational MELT the
    coverage map lacked), then a per-measure aggregate.

    Scale shape: unpivot is a per-row map (no shuffle — each input row
    emits k value rows in place), and the only shuffle is the final
    (returnflag, measure) aggregation on a 12-key space with map-side
    partial aggregation; output is k x distinct(returnflag), never O(rows).
    """
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    melted = t["lineitem"].unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        melted.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("val"), 4).alias("avg_val"),
            F.round(F.sum("val"), 2).alias("sum_val"),
        )
        .orderBy("l_returnflag", "measure")
    )


@query(
    "window_rank_distribution",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
    percent_rank() OVER w AS pct_rank,
    cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY cume_dist() OVER w <= 0.05
    ORDER BY c_mktsegment, pct_rank, c_custkey
    """,
)
def window_rank_distribution(spark, sf_dir):
    """Distribution window functions — percent_rank / cume_dist (the two
    ranking-family functions no window query exercised) — used as a
    top-percentile filter: the highest-balance 5% of customers per market
    segment (5% so the smallest test SF still emits rows per segment).

    Determinism: the window orders by (acctbal DESC, custkey), a total
    order, so rank fractions are exact rationals computed identically on
    both engines — no rounding needed on the rank columns themselves.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        t["customer"]
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("cume") <= 0.05)
        .orderBy("c_mktsegment", "pct_rank", "c_custkey")
    )


@query(
    "prepared_grouped_batch",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_custkey IN (1, 2, 4, 7, 10, 13, 16, 19)
    GROUP BY o_custkey
    """,
)
def prepared_grouped_batch(spark, sf_dir):
    """execute_batch on a GROUP BY template (r5): the whole parameter
    batch runs as ONE broadcast semi-join + ONE aggregation grouped by
    (group cols + equality cols) — plan size independent of the batch,
    exactly the per-row union's results (distinct parameter tuples match
    disjoint rows; see CompiledTemplate.build_grouped_batch).  The grouped
    twin of the reference's 1000-key IN-list regime (README.md:46-51);
    prepare() admits aggregating statements like any other non-DDL plan
    (src/preparable_context.rs:15-30)."""
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_custkey, count(*) AS n_orders, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM orders WHERE o_custkey = $1 GROUP BY o_custkey"
    )
    return stmt.execute_batch([[k] for k in (1, 2, 4, 7, 10, 13, 16, 19)])


@query(
    "prepared_union_template",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = 7
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
    """,
)
def prepared_union_template(spark, sf_dir):
    """Prepared UNION ALL template (r5 grammar extension): both branches'
    parameterized filters bind per execute on ONE compiled template — in
    the reference's scope because DynamicFilterRule rewrites every
    placeholder-bearing Filter in the plan (src/rule.rs:57-59) and
    prepare() admits the union like any non-DDL plan
    (src/preparable_context.rs:15-30)."""
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey = $1 "
        "UNION ALL "
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > $2"
    )
    return stmt.execute({"$1": 7, "$2": 400000})


@query(
    "prepared_intersect_template",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def prepared_intersect_template(spark, sf_dir):
    """Prepared INTERSECT template (r5): both branches' parameterized
    filters bind per execute on one compiled template — same reference
    scope as the union template (DynamicFilterRule rewrites every
    placeholder-bearing Filter, src/rule.rs:57-59); mixed-precedence
    set-op chains fall back to the literal path."""
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "SELECT o_custkey FROM orders WHERE o_totalprice > $1 "
        "INTERSECT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = $2"
    )
    return stmt.execute({"$1": 150000, "$2": "F"})


# Runtime Bloom-filter join: Spark's direct analog of the reference's
# dynamic JOIN filter (src/physical.rs DynamicFilterPhysicalExpr: the hash
# join's build-side values become a probe-side scan filter at runtime).
# Spark's InjectRuntimeFilter rule does exactly this — a bloom_filter_agg
# over the filtered build side becomes a might_contain() predicate on the
# probe-side scan — but its default thresholds target multi-GB scans, so
# the driver-SF plans never exercise it.  The builder widens the thresholds
# ONLY while this plan's logical optimization runs (materialized eagerly
# inside the conf window, then confs restored — the session's other plans
# keep their defaults; bloom filters never change results, only scan I/O).
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@query(
    "join_bloom_runtime_filter",
    oracle="""
    SELECT o_orderpriority,
    CAST(count(*) AS BIGINT) AS n_items,
    round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bloom_runtime_filter(spark, sf_dir):
    """Selective fact-fact join under a runtime Bloom filter: the filtered
    orders side's join keys are aggregated into a Bloom filter at runtime
    and applied as a might_contain() predicate on the lineitem SCAN —
    rows for non-qualifying orders are dropped before the shuffle, the
    join-side twin of the engine's bound-parameter scan pushdown (and the
    closest Spark equivalent of the reference's mutable join filter
    expression).  tests/test_plan_quality.py gates the plan on the
    injected bloom + restored session confs.

    Shape at 100 TB: this is THE mechanism for selective fact-fact joins —
    the probe side's shuffle volume scales with the build side's
    selectivity instead of the probe table's size; the bloom itself is a
    fixed-size mergeable aggregate (map-side combined, broadcast once).
    """
    tables(spark, sf_dir)
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = spark.sql(
            "SELECT o_orderpriority, "
            "count(*) AS n_items, "
            "round(sum(l_extendedprice), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_totalprice > 400000 "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        )
        # Materialize logical optimization NOW so InjectRuntimeFilter runs
        # under the widened thresholds; the physical/AQE stages reuse this
        # optimized plan, so the bloom survives the conf restore below.
        df._jdf.queryExecution().optimizedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


@query(
    "quantile_histogram_sketch",
    oracle="""
    WITH src AS (
    SELECT l_extendedprice AS x FROM lineitem
    ), mm AS (
    SELECT min(x) AS mn, max(x) AS mx, CAST(count(*) AS BIGINT) AS n FROM src
    ), h AS (
    SELECT least(CAST(floor((s.x - mm.mn) / ((mm.mx - mm.mn) / 1024.0)) AS BIGINT),
                 1023) AS bin,
    count(*) AS c
    FROM src s, mm GROUP BY bin
    ), ch AS (
    SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM h
    ), tgt AS (
    SELECT q, CAST(ceil(q * mm.n) AS BIGINT) AS t
    FROM (SELECT unnest([0.5, 0.95, 0.99]) AS q), mm
    ), pick AS (
    SELECT tgt.q, min(ch.bin) AS bin
    FROM tgt JOIN ch ON ch.cum >= tgt.t GROUP BY tgt.q
    ), est AS (
    SELECT p.q, mm.mn + (p.bin + 0.5) * ((mm.mx - mm.mn) / 1024.0) AS est
    FROM pick p, mm
    ), ex AS (
    SELECT 0.5 AS q, quantile_cont(x, 0.5) AS exact FROM src
    UNION ALL SELECT 0.95, quantile_cont(x, 0.95) FROM src
    UNION ALL SELECT 0.99, quantile_cont(x, 0.99) FROM src
    )
    SELECT CAST(e.q AS DOUBLE) AS q, round(ex.exact, 4) AS exact_value,
    round(e.est, 4) AS est_value,
    round(abs(e.est - ex.exact) / ex.exact, 6) AS rel_error
    FROM est e JOIN ex ON e.q = ex.q
    ORDER BY e.q
    """,
)
def quantile_histogram_sketch(spark, sf_dir):
    """Mergeable quantile sketch audit: a fixed 1024-bin equi-width
    histogram over l_extendedprice (range from a 1-row min/max relation),
    quantiles read off the cumulative histogram at bin-midpoint
    resolution, compared against the exact interpolated percentile.
    Completes the mergeable-sketch trio (count-min = frequency, HLL =
    cardinality, histogram = quantiles).

    Shape at 100 TB: the histogram is a <=1024-row map-side-combinable
    count aggregate (partial histograms merge by addition), built in ONE
    pass after a min/max pre-pass — the two-pass equi-width scheme every
    distributed profiler uses; cumulative + quantile pick run on the
    bounded histogram relation (1-task window + a 3x1024 bounded
    range-join).  The exact percentile runs alongside as ground truth; at
    production scale only the histogram side survives.  Error bound by
    construction: half a bin width, (max-min)/2048."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..registry import track_persist

    t = tables(spark, sf_dir)
    src = track_persist(t["lineitem"].select(F.col("l_extendedprice").alias("x")))
    mm = src.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(1024.0)
    h = (
        src.crossJoin(mm)
        .select(
            F.least(
                F.floor((F.col("x") - F.col("mn")) / width).cast("long"),
                F.lit(1023).cast("long"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # <=1024 rows by construction: bounded-cardinality window, 1 task
    ch = h.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    tgt = mm.select(
        F.explode(F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("q"), "n"
    ).select("q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("t"))
    pick = (
        tgt.join(ch, F.col("cum") >= F.col("t"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    est = pick.crossJoin(mm).select(
        "q", (F.col("mn") + (F.col("bin") + 0.5) * width).alias("est")
    )
    exact_wide = src.agg(
        F.expr("percentile(x, 0.5)").alias("p50"),
        F.expr("percentile(x, 0.95)").alias("p95"),
        F.expr("percentile(x, 0.99)").alias("p99"),
    )
    exact = exact_wide.select(
        F.explode(
            F.array(
                F.struct(F.lit(0.5).alias("q"), F.col("p50").alias("exact")),
                F.struct(F.lit(0.95).alias("q"), F.col("p95").alias("exact")),
                F.struct(F.lit(0.99).alias("q"), F.col("p99").alias("exact")),
            )
        ).alias("s")
    ).select("s.q", "s.exact")
    return (
        est.join(exact, "q")
        .select(
            "q",
            F.round("exact", 4).alias("exact_value"),
            F.round("est", 4).alias("est_value"),
            F.round(F.abs(F.col("est") - F.col("exact")) / F.col("exact"), 6).alias(
                "rel_error"
            ),
        )
        .orderBy("q")
    )


@query(
    "prepared_window_topk_template",
    oracle="""
    WITH ranked AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey
    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders
    )
    SELECT o_custkey, rnk, round(o_totalprice, 2) AS price
    FROM ranked WHERE rnk <= 2 AND o_custkey = 7
    ORDER BY rnk
    """,
)
def prepared_window_topk_template(spark, sf_dir):
    """Prepared top-k-per-group template: the window function (CTE body)
    plans ONCE at prepare time; per-execute work is binding (k, custkey)
    into the outer WHERE — both placeholders ride the dynamic fast path
    (stmt.mode == 'dynamic', pinned in tests/test_prepared_basic.py).
    The reference prepares any non-DDL plan, window functions included
    (src/preparable_context.rs:15-30); a parameterized rank cutoff over a
    pre-planned window is the classic leaderboard/feed query shape."""
    tables(spark, sf_dir)
    stmt = Engine(spark).prepare(
        "WITH ranked AS (SELECT o_custkey, o_orderkey, o_totalprice, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rnk "
        "FROM orders) "
        "SELECT o_custkey, rnk, round(o_totalprice, 2) AS price "
        "FROM ranked WHERE rnk <= $1 AND o_custkey = $2 ORDER BY rnk"
    )
    return stmt.execute([2, 7])


@query(
    "join_key_skew_profile",
    oracle="""
    WITH c AS (
    SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
    ), t AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS total,
    CAST(count(*) AS BIGINT) AS n_keys FROM c
    )
    SELECT l_partkey, CAST(cnt AS BIGINT) AS cnt,
    round(CAST(cnt AS DOUBLE) / total, 6) AS share,
    round(CAST(cnt AS DOUBLE) * n_keys / total, 2) AS skew_x
    FROM c CROSS JOIN t
    ORDER BY cnt DESC, l_partkey
    LIMIT 5
    """,
)
def join_key_skew_profile(spark, sf_dir):
    """Shuffle-key skew profiler: the pre-flight diagnostic a 100 TB join
    runs BEFORE shuffling on a key — per-key row counts, each heavy
    hitter's share of the table, and its skew multiple vs the mean key
    (skew_x = cnt / (total / n_keys)).  A key with skew_x in the
    hundreds is the signal to salt that key or rely on AQE skew-join
    splitting; this operator is how you find it cheaply.

    Scale notes: one map-side-combined groupBy on the join key (the same
    shuffle the real join would do, minus the payload), a 1-row totals
    relation broadcast into the share computation, and a TakeOrdered
    top-5 — never a full sort.  All ratios derive from exact integers,
    so cross-engine parity is exact."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    counts = (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total"), 2
            ).alias("skew_x"),
        )
        .orderBy(F.desc("cnt"), "l_partkey")
        .limit(5)
    )


_RI_EDGES = [
    # (edge label, child table, child key, parent table, parent key)
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


@query(
    "audit_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{edge}' AS edge,
    (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,
    (SELECT CAST(count(*) AS BIGINT) FROM {child}
    WHERE {ckey} NOT IN (SELECT {pkey} FROM {parent})) AS n_orphans
    """
        for edge, child, ckey, parent, pkey in _RI_EDGES
    )
    + "\nORDER BY edge",
)
def audit_referential_integrity(spark, sf_dir):
    """Referential-integrity audit across every foreign-key edge of the
    star schema: per edge, total child rows and orphan rows (child keys
    with no parent).  The standard post-ingest data-quality gate — a
    100 TB landing pipeline runs exactly this before exposing tables.

    Scale notes: each edge is one left join of the child's key column
    against the parent's de-duplicated key relation (a shuffle equi-join
    per edge; AQE broadcasts the dims that fit), reduced to a 1-row
    count pair — the seven 1-row results union into the report.  No
    NOT-IN nested loop anywhere: the anti semantics come from null
    probes of the outer join.  All-integer outputs."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    parts = []
    for edge, child, ckey, parent, pkey in _RI_EDGES:
        probe = (
            t[child]
            .select(F.col(ckey).alias("k"))
            .join(
                t[parent]
                .select(F.col(pkey).alias("k"))
                .distinct()
                .withColumn("hit", F.lit(1)),
                "k",
                "left",
            )
        )
        parts.append(
            probe.agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(F.col("hit").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            ).select(F.lit(edge).alias("edge"), "n_child", "n_orphans")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("edge")


_JSE_D = 4  # CMS hash rows
_JSE_W = 1024  # CMS buckets per row


from ..functions import h60_sql as _h60_sql

_JSE_HASH = _h60_sql("'jse' || r || ':' || k")


@query(
    "join_size_estimate_cms",
    oracle=f"""
    WITH k AS (
    SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
    ), cnt AS (
    SELECT k, count(*) AS c FROM k GROUP BY k
    ), exact AS (
    SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs FROM cnt
    ), rows_ AS (
    SELECT unnest([{", ".join(str(i) for i in range(_JSE_D))}]) AS r
    ), cms AS (
    SELECT r, {_JSE_HASH} % {_JSE_W} AS b, count(*) AS c
    FROM k, rows_ GROUP BY r, b
    ), est AS (
    SELECT CAST(min(s) AS BIGINT) AS est_pairs
    FROM (SELECT r, sum(c * c) AS s FROM cms GROUP BY r)
    )
    SELECT exact_pairs, est_pairs,
    round(CAST(est_pairs AS DOUBLE) / exact_pairs, 4) AS inflation
    FROM exact, est
    """,
)
def join_size_estimate_cms(spark, sf_dir):
    """Sketch-based self-join cardinality estimate: the count-min inner
    product (AMS-style F2 estimate; Alon-Matias-Szegedy 1996 / Cormode-
    Muthukrishnan 2005) predicts |R join R| on a key WITHOUT running the
    join — exactly the number a planner (or a dedup pipeline sizing its
    candidate-pair stage) needs before committing to a shuffle.  The
    estimate is sum-of-squares of each CMS row's bucket counts, min'd
    across the d independent rows; the exact answer (sum of c(k)^2,
    also computed here as ground truth) upper-bounds it from below —
    est >= exact always, collisions only inflate.

    Shape at 100 TB: the CMS is a fixed d x w = 4096-row aggregate —
    partial counts merge by addition (the mergeable-sketch property),
    so the shuffle carries KBs regardless of table size; the exact
    ground-truth groupBy is the expensive audit half you would drop in
    production.  All-integer arithmetic; parity is exact."""
    from pyspark.sql import functions as F

    from ..functions import h60

    t = tables(spark, sf_dir)
    k = t["lineitem"].select(F.col("l_partkey").cast("string").alias("k"))
    exact = (
        k.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_pairs"))
    )
    rb = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (h60(F.concat(F.lit(f"jse{i}:"), F.col("k"))) % _JSE_W).alias(
                    "b"
                ),
            )
            for i in range(_JSE_D)
        ]
    )
    cms = (
        k.select(F.explode(rb).alias("rb"))
        .select("rb.r", "rb.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    est = (
        cms.groupBy("r")
        .agg(F.sum(F.col("c") * F.col("c")).alias("s"))
        .agg(F.min("s").alias("est_pairs"))
    )
    return exact.crossJoin(est).select(
        "exact_pairs",
        "est_pairs",
        F.round(
            F.col("est_pairs").cast("double") / F.col("exact_pairs"), 4
        ).alias("inflation"),
    )


_MB_TOP_K = 20


@query(
    "market_basket_pairs",
    oracle=f"""
    WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
    SELECT i1.l_partkey AS a, i2.l_partkey AS b, count(*) AS support
    FROM items i1 JOIN items i2
    ON i1.l_orderkey = i2.l_orderkey AND i1.l_partkey < i2.l_partkey
    GROUP BY a, b
    ), item_n AS (
    SELECT l_partkey AS p, count(*) AS n_orders_with FROM items GROUP BY p
    ), tot AS (
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
    )
    SELECT a, b, CAST(support AS BIGINT) AS support,
    round(CAST(support AS DOUBLE) * n_orders
    / (na.n_orders_with * nb.n_orders_with), 4) AS lift
    FROM pairs JOIN item_n na ON na.p = a JOIN item_n nb ON nb.p = b
    CROSS JOIN tot
    ORDER BY support DESC, a, b
    LIMIT {_MB_TOP_K}
    """,
)
def market_basket_pairs(spark, sf_dir):
    """Market-basket co-occurrence mining: the top part pairs bought in
    the same order, with support count and lift (observed co-occurrence
    vs independence) — the frequent-itemset-pairs pass behind
    recommendations and assortment analysis.

    Scale notes (100 TB): pair generation is a SELF-JOIN CO-PARTITIONED
    ON THE ORDER KEY, so each order's pairs materialize locally and the
    blowup is bounded by per-order basket size squared (~tens), never
    corpus-squared; the pair counts reduce with map-side combine, the
    per-item order counts join back as equi-joins (AQE broadcasts them
    when they fit), the 1-row order total rides along, and the top-k is
    a TakeOrdered.  Support and lift derive from exact integers."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    i2 = items.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("b")
    )
    pairs = (
        items.join(
            i2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("b")),
        )
        .groupBy(F.col("l_partkey").alias("a"), "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    item_n = items.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_orders_with")
    )
    tot = items.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    return (
        pairs.join(
            item_n.select(F.col("p").alias("a"), F.col("n_orders_with").alias("na")),
            "a",
        )
        .join(
            item_n.select(F.col("p").alias("b"), F.col("n_orders_with").alias("nb")),
            "b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "support",
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "a", "b")
        .limit(_MB_TOP_K)
    )


@query(
    "rfm_segmentation",
    oracle="""
    WITH rfm AS (
    SELECT o_custkey AS custkey,
    max(o_orderdate) AS last_order,
    count(*) AS frequency,
    sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS monetary
    FROM orders GROUP BY o_custkey
    ), bounds AS (
    SELECT max(last_order) AS horizon,
    quantile_cont(frequency, 0.5) AS f_med,
    quantile_cont(CAST(monetary AS DOUBLE), 0.5) AS m_med
    FROM rfm
    ), scored AS (
    SELECT date_diff('day', last_order, horizon) <= 180 AS r_hi,
    frequency > f_med AS f_hi,
    CAST(monetary AS DOUBLE) > m_med AS m_hi,
    monetary
    FROM rfm CROSS JOIN bounds
    )
    SELECT r_hi, f_hi, m_hi,
    CAST(count(*) AS BIGINT) AS n_customers,
    CAST(round(sum(monetary), 2) AS DOUBLE) AS total_monetary
    FROM scored
    GROUP BY r_hi, f_hi, m_hi
    ORDER BY r_hi, f_hi, m_hi
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation: each
    customer scored on the three classic axes, split at the corpus
    medians (recency against a fixed 180-day horizon window), and
    rolled up into the 8 RFM cells with customer counts and revenue
    mass — the standard CRM segmentation pass.

    Scale notes: one grouped reduction builds the per-customer RFM
    relation; the 1-row bounds relation (horizon + two exact medians)
    broadcasts into the scoring; the final rollup has 8 groups.
    Monetary accumulates in DECIMAL(18,2) (order-independent, the q11
    lesson); frequency is an integer, so both medians interpolate the
    same exact values on both engines and every median comparison is
    engine-identical."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    rfm = t["orders"].groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    bounds = rfm.agg(
        F.max("last_order").alias("horizon"),
        F.expr("percentile(frequency, 0.5)").alias("f_med"),
        F.expr("percentile(CAST(monetary AS DOUBLE), 0.5)").alias("m_med"),
    )
    scored = rfm.crossJoin(F.broadcast(bounds)).select(
        (F.datediff("horizon", "last_order") <= 180).alias("r_hi"),
        (F.col("frequency") > F.col("f_med")).alias("f_hi"),
        (F.col("monetary").cast("double") > F.col("m_med")).alias("m_hi"),
        "monetary",
    )
    return (
        scored.groupBy("r_hi", "f_hi", "m_hi")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary"), 2).cast("double").alias("total_monetary"),
        )
        .orderBy("r_hi", "f_hi", "m_hi")
    )
