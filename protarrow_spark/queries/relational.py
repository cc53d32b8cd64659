"""Relational operator inventory (SURVEY.md §2.2) as runnable queries.

The reference implements none of these (it is a conversion library,
SURVEY.md §2.2 marks every row 'Not implemented'); per the north star
they are first-class in this engine, expressed with built-in DataFrame
operators so Catalyst/AQE pick physical strategies (broadcast vs
shuffle join, partial aggregation, skew handling).

Scale notes per query are in docstrings: the grading SF is small but
each plan is written for the 100 TB shape (broadcast the dimension,
shuffle on the high-cardinality key, exact-decimal sums so results are
partition-order invariant).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from protarrow_spark.functions.time import epoch_micros
from protarrow_spark.queries.registry import query
from protarrow_spark.sources.tables import spread, table

# Exact decimal accumulation: double sums are order-dependent, decimal
# sums are not. Cast each addend to decimal, sum exactly, cast back.
DEC4 = "decimal(27,4)"
DEC6 = "decimal(27,6)"


def _dsum(col, scale: str = DEC4):
    return F.sum(col.cast(scale)).cast("double")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate.

    Scale: filter reaches the parquet scan (PushedFilters), partial
    aggregation happens map-side, the shuffle carries only 6 groups.
    ``spread`` parallelizes the decimal-heavy partial aggregate when
    the local file is a single row group (one scan task); at real
    scale the scan is already wide and it is a no-op.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        spread(li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, DEC6).alias("sum_disc_price"),
            _dsum(charge, DEC6).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (_dsum(F.col("l_discount"), DEC6) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly-selective scan -> scalar aggregate.

    Scale: every predicate pushes to parquet; only 2 columns are read.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), DEC6).alias("revenue"))


@query(
    "agg_rollup_flags",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("l_quantity")).alias("sum_qty")
    )


@query(
    "agg_cube_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over two low-cardinality dimensions."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("o_totalprice")).alias("sum_price")
    )


@query(
    "agg_distinct_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain aggregates in one pass (expand-based)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        _dsum(F.col("value"), DEC6).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filter both sides, shuffle join
    orders<->lineitem on the high-cardinality orderkey, top-k.

    Scale: customer GROWS with the data (sf-proportional), so no forced
    broadcast hint — AQE picks broadcast from runtime stats while the
    filtered side is small and degrades to a shuffle join when it
    isn't (a forced hint OOMs executors at 100x). The big join
    shuffles on l_orderkey which is uniformly distributed (no skew);
    top-10 uses TakeOrderedAndProject (no global sort).
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, DEC6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, fixed dims broadcast, facts shuffled.

    Scale: region/nation are FIXED-size -> forced broadcast is always
    safe. customer/supplier grow with sf, so they carry no hint — AQE
    broadcasts them while small and falls back to shuffle joins at
    100x scale instead of OOMing executors on a forced hint. Only
    orders<->lineitem must shuffle.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(revenue, DEC6).alias("revenue"))
    )


@query(
    "join_broadcast_brand_revenue",
    oracle="""
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25
GROUP BY p_brand
""",
)
def join_broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim broadcast hash join: no shuffle of the fact table
    for the join; only the 25-group aggregate shuffles.

    This is the engine's broadcast-join demonstration, so the hint is
    explicit by design; part is sf-proportional, so at a scale where
    the filtered build side outgrows executor memory the hint comes
    off and AQE decides (the pattern every OTHER part join here uses,
    e.g. q14/q19)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(_dsum(revenue, DEC6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_left_outer_order_items",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       COUNT(l_orderkey) AS n_items,
       CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(27,4))), 0) AS DOUBLE) AS total_qty
FROM orders LEFT JOIN lineitem
  ON o_orderkey = l_orderkey AND l_shipdate > TIMESTAMP '2001-06-01'
GROUP BY o_orderkey, o_orderstatus
HAVING COUNT(l_orderkey) <= 2
ORDER BY o_orderkey
LIMIT 100
""",
)
def join_left_outer_order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched left rows, with a join-side
    predicate (kept in the ON clause, not WHERE — outer-join semantics)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > "2001-06-01"),
        "left",
    )
    return (
        joined.groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(li.l_orderkey).alias("n_items"),
            F.coalesce(F.sum(F.col("l_quantity").cast(DEC4)), F.lit(0).cast(DEC4))
            .cast("double")
            .alias("total_qty"),
        )
        .filter(F.col("n_items") <= 2)
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "join_semi_active_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
""",
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS/IN rewrite): output only left columns,
    no duplication from multiple matches."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti_dormant_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_range_bucketed",
    oracle="""
SELECT e1.event_id AS error_id,
       COUNT(e2.event_id) AS n_clicks_before
FROM events e1
LEFT JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.event_type = 'click'
 AND e2.ts >= e1.ts - INTERVAL 60 SECOND
 AND e2.ts < e1.ts
WHERE e1.event_type = 'error'
GROUP BY e1.event_id
""",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join done scalably: instead of an inequality-only join
    (BroadcastNestedLoop at scale), bucket time into 60s epochs,
    explode each probe row into its two candidate buckets, equi-join on
    (user_id, bucket), then refine with the exact range predicate.

    Scale: turns O(n*m) nested-loop into a shuffled hash join on a
    composite key — the standard interval-join trick (same plan shape
    Flink uses for interval joins).
    """
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        (epoch_micros("ts") / F.lit(60_000_000)).cast("long").alias("c_bucket"),
    )
    # Each error probes its own bucket and the previous one (window = 60s).
    probe = errors.withColumn(
        "p_bucket",
        F.explode(
            F.array(
                (epoch_micros("e_ts") / F.lit(60_000_000)).cast("long"),
                (epoch_micros("e_ts") / F.lit(60_000_000)).cast("long") - 1,
            )
        ),
    )
    joined = probe.join(
        clicks,
        (probe.e_user == clicks.c_user)
        & (probe.p_bucket == clicks.c_bucket)
        & (clicks.c_ts >= probe.e_ts - F.expr("INTERVAL 60 SECONDS"))
        & (clicks.c_ts < probe.e_ts),
        "left",
    )
    # A click can only land in one of the two probed buckets, so no dedup
    # is needed; count matches per error.
    return joined.groupBy("error_id").agg(F.count(F.col("click_id")).alias("n_clicks_before"))


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_segment",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rnk <= 3
""",
)
def window_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK over a partition; deterministic via orderkey tiebreak.

    Scale: single shuffle on the partition key; at 100 TB add a
    pre-aggregation (per-partition top-k before the window) — Catalyst
    4.x inserts a WindowGroupLimit for rank<=k filters automatically.
    """
    orders = table(spark, sf_dir, "orders")
    # customer grows with sf: no forced broadcast hint (AQE decides).
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_running_revenue",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value
FROM events
WHERE event_type = 'purchase'
""",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per key — decimal accumulation so the
    result is identical regardless of physical row order."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC6)).over(w).cast("double").alias("running_value"),
    )


@query(
    "window_lag_delta",
    oracle="""
SELECT user_id, event_id,
       epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         AS micros_since_prev
FROM events
""",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: per-user time since previous event (microseconds)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (epoch_micros("ts") - epoch_micros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
    )


@query(
    "window_sessionize",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
), marked AS (
  SELECT user_id, us, value,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                   >= 3600000000 THEN 1 ELSE 0 END AS brk
  FROM e
), numbered AS (
  SELECT user_id, us, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(us)              AS session_start_us,
       MAX(us) + 3600000000 AS session_end_us,
       COUNT(*)             AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, sid
""",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user activity sessions split at >= 1 hour of
    inactivity, via the built-in ``session_window`` (operators/sessions.py
    — same code path runs streaming with a watermark).

    Scale: one shuffle on user_id; session merging happens inside the
    JVM aggregate (streaming: in the state store), never in Python.
    The oracle pins the boundary semantics (a gap of exactly ``gap``
    starts a new session) via gaps-and-islands SQL.
    """
    from protarrow_spark.operators.sessions import sessionize

    ev = table(spark, sf_dir, "events")
    s = sessionize(
        ev,
        "ts",
        "user_id",
        gap="1 hour",
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": _dsum(F.col("value")),
        },
    )
    return s.select(
        "user_id",
        epoch_micros("session_start").alias("session_start_us"),
        epoch_micros("session_end").alias("session_end_us"),
        "n_events",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops / pivot
# ---------------------------------------------------------------------------


@query(
    "sort_topk_lineitems",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
""",
)
def sort_topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge, never a full sort at scale."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "set_union_priority_keys",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 400000
""",
)
def set_union_priority_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two filtered scans."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return a.union(b).distinct()


@query(
    "set_intersect_segments",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
""",
)
def set_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "customer")
    a = o.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = o.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return a.intersect(b)


@query(
    "set_except_nations",
    oracle="""
SELECT s_nationkey FROM supplier
EXCEPT
SELECT c_nationkey FROM customer WHERE c_acctbal < 0
""",
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey"))
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_nationkey").alias("s_nationkey"))
    )
    return s.subtract(c)  # EXCEPT (distinct) semantics


@query(
    "pivot_event_matrix",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events
GROUP BY user_id
""",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one row per user, one column per event type.

    Scale: explicit value list -> single-pass conditional aggregation,
    no second job to discover pivot values.
    """
    ev = table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )
    return piv.select("user_id", *[F.col(k).alias(f"n_{k}") for k in kinds])


# ---------------------------------------------------------------------------
# Scalar expression surface (built-ins only -> whole-stage codegen)
# ---------------------------------------------------------------------------


@query(
    "scalar_string_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       upper(o_orderpriority) AS prio_upper,
       substr(o_orderpriority, 1, 1) AS prio_code,
       length(o_orderstatus) AS status_len,
       o_orderpriority || '/' || o_orderstatus AS prio_status,
       CAST(round(o_totalprice, 0) AS DOUBLE) AS price_rounded,
       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class
FROM orders
WHERE o_orderkey <= 1000
""",
)
def scalar_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface: date part extraction, string ops,
    conditional expressions — all JVM built-ins (SURVEY §2.2 'Scalar
    functions'), no Python in the row path."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderstatus").cast("long").alias("status_len"),
        F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("prio_status"),
        F.round("o_totalprice", 0).cast("double").alias("price_rounded"),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_class"),
    )


@query(
    "subquery_above_avg_parts",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > (
  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) FROM part
)
""",
)
def subquery_above_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via SQL entry point (Catalyst rewrites to a
    broadcast of the 1-row aggregate). The threshold uses an exact
    decimal sum so the cutoff is partition-order invariant."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (
          SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) FROM part
        )
        """
    )


# ---------------------------------------------------------------------------
# Exact discrete percentiles
# ---------------------------------------------------------------------------

_PCTS = (0.25, 0.5, 0.75, 0.9)


def _pct_oracle() -> str:
    cases = ",\n       ".join(
        f"MAX(CASE WHEN rn = CAST(CEIL({q} * cnt) AS BIGINT) THEN price END) AS p{int(q * 100)}"
        for q in _PCTS
    )
    return f"""
WITH ordered AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
)
SELECT flag,
       {cases}
FROM ordered GROUP BY flag
"""


@query("agg_percentile_disc", oracle=_pct_oracle())
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p25/p50/p75/p90 of extended price
    per return flag) built from window rank + conditional aggregation
    — no engine-private interpolation, so any SQL engine reproduces
    the values exactly. The value at rank ceil(q*n) in a sorted
    multiset is deterministic even with duplicate prices, so no
    tiebreaker is needed.

    Scale: one window sort per flag partition (the same shuffle an
    exact median needs anywhere); decimal values — exact equality.
    """
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cw = Window.partitionBy("l_returnflag")
    ranked = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    aggs = [
        F.max(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("cnt")), F.col("price"))
        ).alias(f"p{int(q * 100)}")
        for q in _PCTS
    ]
    return ranked.groupBy("flag").agg(*aggs)


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@query(
    "join_asof_events",
    oracle="""
WITH u AS (
  SELECT user_id AS k, ts AS _t, 1 AS _m, CAST(-1 AS BIGINT) AS _tb,
         event_id, value,
         CAST(NULL AS STRUCT(event_id BIGINT, ts TIMESTAMP, value DOUBLE)) AS rv
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0, event_id, NULL, NULL,
         struct_pack(event_id := event_id, ts := ts, value := value)
  FROM events WHERE event_type = 'click'
),
m AS (
  SELECT k, _t, _m, event_id, value,
         last_value(rv IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY _t, _m, _tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
  FROM u
)
SELECT k AS user_id, event_id, _t AS ts, value,
       r.event_id AS r_event_id, r.ts AS r_ts, r.value AS r_value
FROM m WHERE _m = 1
""",
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward inclusive as-of join: each purchase event picks up the
    user's most recent click at-or-before it (ties: marker then max
    event_id — fully deterministic under any partitioning).

    Scale: the union-marker pattern — ONE shuffle on the key for the
    window sort; no range-join candidate explosion, no per-key state.
    """
    from protarrow_spark.operators.temporal import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        key_col="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["event_id", "ts", "value"],
        right_tiebreak="event_id",
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH u AS (
  SELECT user_id AS k, ts AS _t, 1 AS _m, CAST(-1 AS BIGINT) AS _tb,
         event_id, value,
         CAST(NULL AS STRUCT(event_id BIGINT, ts TIMESTAMP, value DOUBLE)) AS rv,
         CAST(NULL AS TIMESTAMP) AS rt
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0, event_id, NULL, NULL,
         struct_pack(event_id := event_id, ts := ts, value := value), ts
  FROM events WHERE event_type = 'click'
),
m AS (
  SELECT k, _t, _m, event_id, value,
         last_value(rv IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY _t, _m, _tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back,
         last_value(rt IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY _t, _m, _tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bt,
         first_value(rv IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY _t, (1 - _m), _tb
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd,
         first_value(rt IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY _t, (1 - _m), _tb
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ft
  FROM u
),
d AS (
  SELECT k, _t, event_id, value, back, fwd,
         CASE WHEN bt IS NOT NULL THEN epoch_us(_t) - epoch_us(bt) END AS db,
         CASE WHEN ft IS NOT NULL THEN epoch_us(ft) - epoch_us(_t) END AS df
  FROM m WHERE _m = 1
),
c AS (
  SELECT *,
         (db IS NOT NULL AND (df IS NULL OR db <= df)) AS takeb,
         (df IS NOT NULL AND (db IS NULL OR df < db)) AS takef
  FROM d
)
SELECT k AS user_id, event_id, _t AS ts, value,
       CASE WHEN takeb THEN back.event_id WHEN takef THEN fwd.event_id END AS r_event_id,
       CASE WHEN takeb THEN back.ts WHEN takef THEN fwd.ts END AS r_ts,
       CASE WHEN takeb THEN back.value WHEN takef THEN fwd.value END AS r_value,
       CASE WHEN takeb THEN 'backward' WHEN takef THEN 'forward' END AS matched_dir,
       CAST(CASE WHEN takeb THEN db WHEN takef THEN df END AS BIGINT) AS delta_us
FROM c
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (operators/temporal.py asof_join_nearest —
    pandas merge_asof direction='nearest'): each purchase picks the
    user's click minimizing |click_ts - purchase_ts|; equidistant ties
    resolve backward. Both direction passes ride ONE key shuffle (two
    in-partition sorts), so it costs the same exchange as the
    backward-only as-of — still no range-join candidate explosion."""
    from protarrow_spark.operators.temporal import asof_join_nearest

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    return asof_join_nearest(
        purchases,
        clicks,
        key_col="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["event_id", "ts", "value"],
        right_tiebreak="event_id",
    )


# ---------------------------------------------------------------------------
# Grouping sets + deterministic sampling
# ---------------------------------------------------------------------------


_GROUPING_SETS_SQL = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


@query("agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization rollup/cube compile
    to) with GROUPING() indicators so subtotal rows are
    distinguishable from genuine NULL groups. Identical SQL runs on
    both engines; Spark plans one Expand + partial/final aggregate."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


#: Deterministic sampling: keep rows whose 60-bit md5 hash of the key
#: falls under fraction * 2^60 — reproducible on any engine, stable
#: under re-partitioning, and usable as a consistent cross-table
#: sample (same key -> same decision everywhere).
SAMPLE_FRACTION = 0.1


@query(
    "sample_hash_lineitem",
    oracle=f"""
WITH sampled AS (
  SELECT * FROM lineitem
  WHERE CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                                CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT)
        < {int(SAMPLE_FRACTION * (2 ** 60))}
)
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM sampled GROUP BY l_returnflag
""",
)
def sample_hash_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample of lineitem (md5 of the primary
    key under a threshold), aggregated per return flag. Unlike
    ``df.sample()`` the decision is a pure function of the key: the
    same rows are selected on every engine, every run, and every
    partitioning — the property training-data pipelines need for
    reproducible subsets and consistent joins between sampled tables.

    Scale: the predicate is a scan-level filter (no shuffle added);
    md5 cost is per-row but branch-free and pipelined."""
    li = table(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    sampled = li.filter(h < int(SAMPLE_FRACTION * (2**60)))
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "join_salted_skew",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact-fact join (salting is the result-invariant
    treatment for keys too hot for AQE's skew split): lineitem rows
    spread each order key over 8 salted partitions; orders replicate
    8x. The oracle is the PLAIN join — salting must be invisible in
    the results, which is exactly what the gate checks."""
    from protarrow_spark.operators.temporal import salted_join

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    joined = salted_join(li, orders, "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double").alias("sum_price"),
    )


@query(
    "agg_time_rollup",
    oracle="""
SELECT date_trunc('hour', ts) AS bucket,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: events bucketed
    to the hour per type. The shape a timeseries store materializes
    incrementally; on Spark it is one partial-aggregated groupBy whose
    bucket key is derived in the scan projection (and in streaming
    mode the identical expression runs under a watermark — see
    windowed_counts). Decimal-exact sums keep it order-invariant."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sum_value"),
    )


#: Resample bucket width (seconds) — 15-minute grid.
GAPFILL_STEP_S = 900


def _dense_event_grid(spark: SparkSession, sf_dir: str, step_s: int):
    """(observed buckets, dense grid) for events on a regular grid:
    ``b`` = per-(event_type, bucket_us) count + decimal value sum for
    OBSERVED buckets; ``grid`` = every (event_type, bucket_us) cell
    between the global bounds, generated (sequence explode over the
    type dimension x a 1-row bounds broadcast), never scanned. Shared
    by the gap-fill resampler and the EWMA smoother so the two agree
    on bucketing to the microsecond."""
    from protarrow_spark.functions.time import epoch_micros

    step_us = step_s * 1_000_000
    ev = table(spark, sf_dir, "events")
    b = (
        ev.withColumn("__eus", epoch_micros(F.col("ts")))
        .groupBy(
            "event_type",
            F.expr(f"(__eus div {step_us}) * {step_us}").alias("bucket_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("v"),
        )
    )
    bounds = b.agg(F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.lit(0), F.expr(f"(hi - lo) div {step_us}"))
            ).alias("i"),
            "lo",
        )
        .select(
            "event_type", (F.col("lo") + F.col("i") * step_us).alias("bucket_us")
        )
    )
    return b, grid


@query(
    "window_gapfill_resample",
    oracle=f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL '{GAPFILL_STEP_S} seconds', ts) AS bucket,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(27,6))) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
grid AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL '{GAPFILL_STEP_S} seconds')) AS bucket
    FROM bounds
  ) g
),
j AS (
  SELECT grid.event_type, grid.bucket, b.n_events, b.v
  FROM grid LEFT JOIN b USING (event_type, bucket)
)
SELECT event_type, bucket,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       n_events IS NULL AS is_gap,
       CAST(last_value(v IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY bucket) AS DOUBLE)
         AS carried_value
FROM j
""",
)
def window_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: events are bucketed
    onto a regular 15-minute grid per event_type, EMPTY buckets are
    materialized (the hypertable ``time_bucket_gapfill`` /
    ``generate_series`` pattern), and the last observed bucket
    aggregate is carried forward (``locf``) — the alignment step
    every downstream time-series join/model expects.

    Scale: the dense grid is generated, not stored — a sequence()
    explode over the (types x 1-row bounds) dimension, never a scan;
    the observed buckets partial-aggregate map-side before their one
    shuffle; the forward fill is a per-type running ``last
    IGNORE NULLS`` window co-partitioned with the grid join. Grid
    size is types x (span/step) — independent of event volume.

    Output: event_type, bucket, n_events, is_gap, carried_value.
    """
    b, grid = _dense_event_grid(spark, sf_dir, GAPFILL_STEP_S)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["event_type", "bucket_us"], "left")
        .select(
            "event_type",
            F.timestamp_micros(F.col("bucket_us")).alias("bucket"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("n_events").isNull().alias("is_gap"),
            F.last("v", ignorenulls=True).over(w).cast("double").alias("carried_value"),
        )
    )


#: EWMA truncation depth: weights 1, 1/2, ... 1/2^(K-1) over the
#: dense grid (half-life = one bucket).
EWMA_DEPTH = 8


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"COALESCE(LAG(v_micros, {k}) OVER "
        f"(PARTITION BY event_type ORDER BY bucket), 0) // {1 << k}"
        for k in range(EWMA_DEPTH)
    )
    return f"""
WITH b AS (
  SELECT event_type, time_bucket(INTERVAL '{GAPFILL_STEP_S} seconds', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
grid AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL '{GAPFILL_STEP_S} seconds')) AS bucket
    FROM bounds
  ) g
),
dense AS (
  SELECT grid.event_type, grid.bucket, COALESCE(b.v, 0) AS v_micros
  FROM grid LEFT JOIN b USING (event_type, bucket)
)
SELECT event_type, bucket, CAST(v_micros AS BIGINT) AS v_micros,
       CAST({terms} AS BIGINT) AS ewma_micros
FROM dense
"""


@query("window_ewma_decay", oracle=_ewma_oracle())
def window_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed moving value (half-life = one bucket,
    truncated at depth 8) per event_type on the dense 15-minute grid
    — the trend/smoothing primitive of a monitoring pipeline, built
    ON the gap-filled grid (empty buckets contribute 0, so a burst
    decays through real time, not through observation count).

    Exactness: bucket sums become integer MICRO-units via an exact
    decimal multiply; the power-of-2 decay makes every term an
    integer division (v >> k), so the smoothed series is bit-exact
    cross-engine — no float accumulation anywhere.

    Scale: shares _dense_event_grid with the resampler (generated
    grid, 1-row bounds broadcast); the decay is EWMA_DEPTH lag terms
    over one per-type window — grid-sized work, volume-independent.

    Output: event_type, bucket, v_micros, ewma_micros.
    """
    b, grid = _dense_event_grid(spark, sf_dir, GAPFILL_STEP_S)
    dense = grid.join(b, ["event_type", "bucket_us"], "left").select(
        "event_type",
        "bucket_us",
        F.coalesce((F.col("v") * 1_000_000).cast("long"), F.lit(0)).alias("v_micros"),
    )
    ewma = None
    for k in range(EWMA_DEPTH):
        # FLOOR division, spelled (x - pmod(x, m)) div m: Spark's
        # integer `div` truncates toward zero while the oracle's `//`
        # floors — identical for x >= 0 but divergent on negative
        # bucket sums, which the value column permits.
        m = 1 << k
        lagv = (
            f"coalesce(lag(v_micros, {k}) over "
            f"(partition by event_type order by bucket_us), 0L)"
        )
        term = F.expr(f"(({lagv}) - pmod({lagv}, {m})) div {m}")
        ewma = term if ewma is None else ewma + term
    return dense.select(
        "event_type",
        F.timestamp_micros(F.col("bucket_us")).alias("bucket"),
        "v_micros",
        ewma.cast("long").alias("ewma_micros"),
    )


@query(
    "window_time_range_sum",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS hour_value
FROM events
WHERE event_type = 'purchase'
""",
)
def window_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour sum per user — a RANGE window frame keyed on the
    event time in microseconds (peers = every row within 3600s
    behind), the time-series 'sliding aggregate' rows-frames cannot
    express. Decimal accumulation keeps it order-invariant; ties in
    the range key are handled identically by both engines (RANGE
    frames aggregate all peers of the current key)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC6)).over(w).cast("double").alias("hour_value"),
    )


#: CUSUM drift target: the one-sided statistic accumulates spend above
#: this reference level (global purchase mean is ~48, so bursts above
#: 60 stand out while normal traffic decays back to zero).
CUSUM_REF = 60


@query(
    "window_cusum_changepoint",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(value AS DECIMAL(27,6)) - {CUSUM_REF} AS dev
  FROM events WHERE event_type = 'purchase'
),
p AS (
  SELECT user_id, event_id, ts,
         SUM(dev) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                        ROWS UNBOUNDED PRECEDING) AS pr
  FROM e
),
m AS (
  SELECT user_id, event_id, ts, pr,
         MIN(pr) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS UNBOUNDED PRECEDING) AS mn
  FROM p
),
s AS (
  -- clamp at zero via CASE, not LEAST: DuckDB's LEAST promotes
  -- DECIMAL args to DOUBLE, which would break exact-decimal parity
  SELECT user_id, event_id, ts,
         pr - (CASE WHEN mn < 0 THEN mn ELSE CAST(0 AS DECIMAL(27,6)) END) AS st
  FROM m
),
r AS (
  SELECT user_id, event_id, ts, st,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY st DESC, epoch_us(ts), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM s
)
SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(st AS DOUBLE) AS cusum_max,
       ts AS cp_ts, event_id AS cp_event_id
FROM r WHERE rn = 1
""",
)
def window_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection per user: S_i = max(0, S_{{i-1}}
    + x_i - K) flags sustained drift above the reference level K —
    the classic sequential changepoint statistic (Page 1954). The
    recursion is NOT directly window-expressible, but it equals
    P_i - min_j<=i P_j for the prefix sums P of (x - K), so two
    stacked running windows (sum, then min) compute it exactly; the
    report is each user's peak statistic and the event where it
    peaks (earliest-ts tiebreak). The running minimum is clamped at
    zero (``P_0 = 0`` is a member of the minimized prefix set): with
    the clamp omitted, a user whose very first deviation is positive
    would get ``S_1 = 0`` instead of Page's ``S_1 = x_1 - K``.
    Decimal accumulation keeps every intermediate order-invariant.

    Scale: one shuffle on user_id feeds all three window passes (sum,
    min, argmax rank share the partitioning — Catalyst collapses them
    onto a single sort), then a WindowGroupLimit-prunable rn=1 filter.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    wo = Window.partitionBy("user_id").orderBy(
        epoch_micros("ts"), F.col("event_id")
    )
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = F.col("value").cast(DEC6) - F.lit(CUSUM_REF).cast(DEC6)
    p = ev.select(
        "user_id", "event_id", "ts", F.sum(dev).over(run).alias("pr")
    )
    s = p.select(
        "user_id", "event_id", "ts",
        (
            F.col("pr")
            - F.least(F.min("pr").over(run), F.lit(0).cast(DEC6))
        ).alias("st"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("st"), epoch_micros("ts"), F.col("event_id")
    )
    r = s.select(
        "user_id", "event_id", "ts", "st",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    return r.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("st").cast("double").alias("cusum_max"),
        F.col("ts").alias("cp_ts"),
        "event_id",
    ).withColumnRenamed("event_id", "cp_event_id")


@query(
    "unpivot_order_amounts",
    oracle="""
SELECT o_orderkey, name, CAST(val AS DOUBLE) AS val
FROM (
  SELECT o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS totalprice,
         CAST(o_custkey AS DOUBLE) AS custkey
  FROM orders
)
UNPIVOT (val FOR name IN (totalprice, custkey))
""",
)
def unpivot_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide numeric columns to (key, name, value)
    rows — the inverse of pivot; a zero-shuffle Expand node."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return orders.unpivot("o_orderkey", ["totalprice", "custkey"], "name", "val")


@query(
    "scalar_json_extract",
    oracle="""
WITH j AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT)                          AS n_events,
       CAST(sum(k) AS BIGINT)                            AS sum_k,
       CAST(min(k) AS BIGINT)                            AS min_k,
       CAST(max(k) AS BIGINT)                            AS max_k,
       CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
FROM j
GROUP BY event_type
""",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column processing: parse ``events.props``
    with a typed contract (``from_json`` with an explicit schema — the
    same external-schema-is-truth stance as the proto conversion
    layer, SURVEY.md §1.1) and aggregate the extracted field.

    Scale: JSON parsing is a JVM codegen expression in the scan
    projection (no Python); one partial-aggregated groupBy on a
    low-cardinality key. Malformed JSON yields NULL, never an error —
    the PERMISSIVE contract a 100 TB ingest needs.
    """
    ev = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k long").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0)).alias("n_even"),
        )
    )


def _zorder_oracle() -> str:
    from protarrow_spark.operators.layout import ZORDER_BITS, zorder_sql

    z = zorder_sql("l_partkey", "l_suppkey", ZORDER_BITS)
    shift = 1 << (2 * ZORDER_BITS - 6)
    return f"""
WITH z AS (
  SELECT l_partkey AS x, l_suppkey AS y, ({z}) // {shift} AS bucket
  FROM lineitem
)
SELECT bucket, COUNT(*) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z
GROUP BY bucket
"""


@query("layout_zorder_lineitem", oracle=_zorder_oracle())
def layout_zorder_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering over (l_partkey, l_suppkey):
    each row's file bucket is the top 6 bits of the interleaved key,
    and the output is the per-bucket min/max statistics a reader's
    file-skipping consults — tight rectangles in both dimensions,
    which is what makes predicates on EITHER column prune most
    buckets at 100 TB (operators/layout.py).

    Scale: z-key is constant-folded shift/mask arithmetic in the scan
    projection; one partial-aggregated groupBy on <= 64 bucket keys.
    The actual rewrite is repartitionByRange(zkey) +
    sortWithinPartitions + write — the statistics here are the
    measurable effect.
    """
    from protarrow_spark.operators.layout import zorder_layout_stats

    li = table(spark, sf_dir, "lineitem")
    return zorder_layout_stats(li, "l_partkey", "l_suppkey")


@query(
    "window_ntile_bins",
    oracle="""
WITH b AS (
  SELECT event_type, value,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS bin
  FROM events
)
SELECT event_type, CAST(bin AS BIGINT) AS bin,
       COUNT(*) AS n,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM b
GROUP BY event_type, bin
""",
)
def window_ntile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quantile binning (feature bucketing): NTILE(10) per
    event type over a total order, then per-bin row counts and value
    ranges — deterministic exact decile edges, no engine-private
    interpolation (the same reason agg_percentile_disc avoids
    percentile_cont).

    Scale: one shuffle on event_type; NTILE is a single window pass;
    min/max carry raw doubles (no accumulation-order sensitivity).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type",
            "value",
            F.ntile(10).over(w).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "join_bloom_prefilter",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 480000)
GROUP BY l_returnflag
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter runtime join pruning (the composable
    version of Spark's InjectRuntimeFilter): high-value order keys
    build a <=2,048-row bit table; lineitem is pre-filtered by 4
    broadcast bit probes IN THE SCAN STAGE — no shuffle of the fact
    side — then the exact semi join removes the ~0.2% false
    positives. The oracle is the plain semi join: the filter must be
    invisible in the results. At 100 TB the win is that the rows
    entering the exact join's shuffle/broadcast drop to matches +
    epsilon, and the filter itself is a reusable artifact (persist it
    once, prune many scans — e.g. incremental daily loads probing a
    static dimension), unlike the optimizer's plan-private filter."""
    from protarrow_spark.operators.sketches import bloom_build, bloom_prefilter

    hot = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 480000)
        .select("o_orderkey")
    )
    bloom = bloom_build(hot, "o_orderkey")
    li = spread(
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice"
        )
    )
    pruned = bloom_prefilter(li, bloom, "l_orderkey")
    # Exact verification as an INNER join on the (unique) order key —
    # semantically a semi join, but spelled inner so Catalyst's
    # PushDownLeftSemiAntiJoin cannot hoist it below the bloom probes
    # (which would shuffle the UNPRUNED fact side at scale, defeating
    # the prefilter).
    exact = pruned.join(
        hot.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "inner"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_extendedprice"), DEC6).alias("sum_price"),
    )


@query(
    "table_merge_upsert",
    oracle="""
WITH ch AS (
  SELECT CASE WHEN o_orderkey % 97 = 2 THEN o_orderkey + 100000000 ELSE o_orderkey END AS k,
         CASE WHEN o_orderkey % 97 = 0 THEN 'R'
              WHEN o_orderkey % 97 = 2 THEN 'N' ELSE o_orderstatus END AS st,
         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS tp,
         CASE WHEN o_orderkey % 97 = 0 THEN 'U'
              WHEN o_orderkey % 97 = 1 THEN 'D' ELSE 'I' END AS op
  FROM orders WHERE o_orderkey % 97 IN (0, 1, 2)
),
ud AS (SELECT * FROM ch WHERE op IN ('U', 'D'))
SELECT b.o_orderkey,
       CASE WHEN ud.op = 'U' THEN ud.st ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN ud.op = 'U' THEN ud.tp ELSE b.o_totalprice END AS o_totalprice
FROM orders b LEFT JOIN ud ON b.o_orderkey = ud.k
WHERE ud.op IS NULL OR ud.op = 'U'
UNION ALL
SELECT k, st, tp FROM ch WHERE op = 'I'
""",
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / CDC apply (operators/merge.py): a deterministic
    change set — updates, deletes, and new-key inserts derived from
    the order key — merges onto the orders base table.

    Scale: the base is NEVER shuffled — updates/deletes arrive as a
    broadcast left join on the primary key (a CDC batch is bounded,
    the table is not), inserts union on afterwards; a full-outer
    formulation would hash-partition the entire base to apply a
    bounded delta. The oracle replicates the merge in SQL."""
    from protarrow_spark.operators.merge import apply_changes

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m = F.col("o_orderkey") % 97
    ch = o.filter(m.isin(0, 1, 2)).select(
        F.when(m == 2, F.col("o_orderkey") + 100000000)
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        F.when(m == 0, F.lit("R"))
        .when(m == 2, F.lit("N"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(m == 0, F.col("o_totalprice") + F.lit(1000.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(m == 0, F.lit("U"))
        .when(m == 1, F.lit("D"))
        .otherwise(F.lit("I"))
        .alias("op"),
    )
    return apply_changes(o, ch, "o_orderkey")


@query(
    "table_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 97 <> 3
),
new AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 97 = 5 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
         CASE WHEN c_custkey % 97 = 7 THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 97 <> 11
),
j AS (
  SELECT COALESCE(o.c_custkey, n.c_custkey) AS k,
         o.c_custkey IS NULL AS is_added,
         n.c_custkey IS NULL AS is_removed,
         COALESCE(o.c_mktsegment <> n.c_mktsegment, FALSE) AS seg_chg,
         COALESCE(o.c_acctbal <> n.c_acctbal, FALSE) AS bal_chg
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT CASE WHEN is_added THEN 'added'
            WHEN is_removed THEN 'removed'
            WHEN seg_chg OR bal_chg THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN seg_chg THEN 1 ELSE 0 END) AS BIGINT) AS n_seg_changed,
       CAST(SUM(CASE WHEN bal_chg THEN 1 ELSE 0 END) AS BIGINT) AS n_bal_changed
FROM j
GROUP BY 1
""",
)
def table_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two versions of a dimension (the
    data-diff / CDC-derivation op: given yesterday's and today's
    snapshots, derive added / removed / changed / unchanged with
    per-column change counts — what feeds an SCD2 build or a release
    report when the upstream gives you full dumps, not a changelog;
    pairs with report_shard_manifest's digest fast-path, which skips
    unchanged shards before this row-level diff runs).

    Both snapshots are deterministic residue-class edits of customer,
    so every classification is value-pinned. Scale: ONE full-outer
    equi-join on the key (both sides hash-partitioned once) + a
    4-group rollup; column comparisons are scan-stage codegen.
    Unlike the bounded-delta CDC appliers (table_merge_upsert), a
    snapshot diff genuinely must move both snapshots — this is the
    operator you run when no delta exists."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    m = F.col("c_custkey") % 97
    old = c.filter(m != 3)
    new = c.filter(m != 11).select(
        "c_custkey",
        "c_name",
        F.when(m == 5, F.lit("MOVED")).otherwise(F.col("c_mktsegment")).alias(
            "c_mktsegment"
        ),
        F.when(m == 7, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer").select(
        F.col("o.c_custkey").isNull().alias("is_added"),
        F.col("n.c_custkey").isNull().alias("is_removed"),
        F.coalesce(
            F.col("o.c_mktsegment") != F.col("n.c_mktsegment"), F.lit(False)
        ).alias("seg_chg"),
        F.coalesce(F.col("o.c_acctbal") != F.col("n.c_acctbal"), F.lit(False)).alias(
            "bal_chg"
        ),
    )
    status = (
        F.when(F.col("is_added"), F.lit("added"))
        .when(F.col("is_removed"), F.lit("removed"))
        .when(F.col("seg_chg") | F.col("bal_chg"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("seg_chg").cast("long")).cast("long").alias("n_seg_changed"),
            F.sum(F.col("bal_chg").cast("long")).cast("long").alias("n_bal_changed"),
        )
    )


@query(
    "table_incremental_rollup",
    oracle="""
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
FROM orders
GROUP BY o_custkey
""",
)
def table_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-customer
    order-count/revenue rollup is maintained by MERGING the stored
    view with the aggregate of a bounded delta (orders on/after
    2001-01-01, ~9% here) — mv' = reagg(mv union agg(delta)) — rather
    than recomputing over the full fact history. COUNT and decimal
    SUM are self-mergeable partial aggregates, so the merged view is
    bit-identical to the full recompute the oracle runs.

    Scale: this is the aggregate-state counterpart of
    table_merge_upsert's row-state CDC. The maintenance cost is
    O(|view| + |delta|): the base FACTS are scanned only to stand in
    for the stored view (at 100 TB the view is a written table and
    the base scan disappears); the merge shuffles view-sized rows
    (one per customer), never fact-sized, and the delta aggregate is
    partial-aggregated map-side before it ever moves."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    split = "2001-01-01"
    dec = F.col("o_totalprice").cast("decimal(27,4)")

    def rollup(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"), F.sum(dec).alias("revenue")
        )

    mv = rollup(o.filter(F.col("o_orderdate") < F.lit(split)))  # the "stored" view
    delta = rollup(o.filter(F.col("o_orderdate") >= F.lit(split)))
    return (
        mv.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue").cast("double").alias("revenue"),
        )
    )


@query(
    "table_scd2_history",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_name, c_mktsegment,
         TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
),
ch AS (
  SELECT c_custkey, c_name, 'MACHINERY' AS c_mktsegment,
         TIMESTAMP '2024-06-01 00:00:00' AS change_ts
  FROM customer WHERE c_custkey % 101 = 0
)
SELECT d.c_custkey, d.c_name, d.c_mktsegment, d.valid_from,
       CASE WHEN d.valid_to IS NULL AND ch.change_ts IS NOT NULL
            THEN ch.change_ts ELSE d.valid_to END AS valid_to
FROM dim d LEFT JOIN ch ON d.c_custkey = ch.c_custkey
UNION ALL
SELECT c_custkey, c_name, c_mktsegment, change_ts, CAST(NULL AS TIMESTAMP)
FROM ch
""",
)
def table_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 (operators/merge.py
    scd2_apply): a deterministic change batch re-segments every 101st
    customer; the current version closes at the change timestamp and
    the new version appends open-ended — the versioned-dimension
    pattern every warehouse backfill needs.

    Scale: identical contract to the CDC merge — the dimension
    history is never shuffled; the bounded change batch broadcasts."""
    from protarrow_spark.operators.merge import scd2_apply

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    dim = cust.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    ch = cust.filter(F.col("c_custkey") % 101 == 0).select(
        "c_custkey",
        "c_name",
        F.lit("MACHINERY").alias("c_mktsegment"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("change_ts"),
    )
    return scd2_apply(dim, ch, "c_custkey")


@query(
    "window_funnel_stages",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked,
       (SELECT COUNT(*) FROM p) AS n_purchased
""",
)
def window_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (ClickHouse windowFunnel shape): users
    who viewed, then clicked strictly after their first view, then
    purchased strictly after that first qualifying click.

    Scale: three chained per-user conditional MIN aggregates — every
    groupBy and join keys on user_id, so one hash partitioning is
    planned once and reused (co-partitioned joins, no re-shuffle);
    stage results shrink monotonically. The earliest-qualifying-event
    semantics (not ANY ordering) are pinned by the oracle."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased")))
    )


@query(
    "agg_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         CAST(FLOOR(MIN(epoch_us(ts)) / 604800000000) AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch_us(ts) / 604800000000) AS BIGINT) AS week
  FROM events
)
SELECT f.cohort_week,
       a.week - f.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM firsts f JOIN active a ON f.user_id = a.user_id
GROUP BY f.cohort_week, a.week - f.cohort_week
""",
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted in every subsequent week they return — the
    growth-analytics staple.

    Scale: first-activity and distinct-active-week are both user-keyed
    aggregates; the join is co-partitioned on user_id (no re-shuffle)
    and only the final rollup re-partitions on the (small)
    cohort/offset key space. Integer epoch-week arithmetic keeps the
    bucketing engine-exact."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", (F.floor(epoch_micros("ts") / F.lit(604800000000)).cast("bigint")).alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        firsts.join(active, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
WITH probes AS (
  SELECT p_partkey AS probe_id,
         substr(p_name, 1, 2) || substr(p_name, 4) AS probe_name
  FROM part WHERE p_partkey % 37 = 0
),
cand AS (
  SELECT probe_id, probe_name, p.p_partkey, p.p_name,
         levenshtein(probe_name, p.p_name) AS dist
  FROM probes JOIN part p
    ON split_part(probe_name, ' ', 2) = split_part(p.p_name, ' ', 2)
   AND abs(length(probe_name) - length(p.p_name)) <= 2
  WHERE levenshtein(probe_name, p.p_name) <= 2
),
ranked AS (
  SELECT probe_id, probe_name, p_partkey, p_name, dist,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY dist, p_partkey) AS rn
  FROM cand
)
SELECT probe_id, probe_name, p_partkey AS match_key, p_name AS match_name,
       CAST(dist AS BIGINT) AS dist
FROM ranked WHERE rn = 1
""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via a blocked fuzzy join: probe records (part
    names with a deterministically dropped character) match back to
    their canonical entities on Levenshtein distance <= 2, but only
    WITHIN blocks (same trailing word + length within 2) — the classic
    blocking technique that turns an all-pairs O(n*m) string-distance
    scan into per-block candidate sets.

    Scale: the join is an equi-join on the block key, so candidates
    co-locate in one shuffle; the length pre-filter prunes before the
    (expensive) edit distance runs; best-match-per-probe is a
    WindowGroupLimit rank. Low-cardinality blocks skew — the real-data
    mitigations are composite block keys or LSH shingles (see
    dedup_minhash_lsh), same plan shape."""
    parts = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    probes = parts.filter(F.col("p_partkey") % 37 == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
        ).alias("probe_name"),
    )
    block_p = F.split(F.col("probe_name"), " ").getItem(1)
    block_c = F.split(F.col("p_name"), " ").getItem(1)
    cand = (
        probes.join(parts, block_p == block_c)
        .filter(
            F.abs(F.length("probe_name") - F.length("p_name")) <= 2
        )
        .withColumn("dist", F.levenshtein("probe_name", "p_name"))
        .filter(F.col("dist") <= 2)
    )
    w = Window.partitionBy("probe_id").orderBy("dist", "p_partkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "probe_id",
            "probe_name",
            F.col("p_partkey").alias("match_key"),
            F.col("p_name").alias("match_name"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# layout_compaction_bins — small-file compaction planning
# ---------------------------------------------------------------------------

#: Simulated bytes per lineitem row for the file-size model (the
#: driver's parquet has no per-file listing to plan over, so files are
#: modeled as one per ship-day with bytes = rows x this).
COMPACTION_ROW_BYTES = 128


def _compaction_oracle() -> str:
    from protarrow_spark.operators.layout import COMPACTION_TARGET_BYTES

    return f"""
WITH files AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS part_id,
         CAST(EXTRACT(day FROM l_shipdate) AS BIGINT) AS file,
         CAST(COUNT(*) * {COMPACTION_ROW_BYTES} AS BIGINT) AS file_bytes
  FROM lineitem GROUP BY 1, 2
),
offs AS (
  SELECT part_id, file, file_bytes,
         COALESCE(SUM(file_bytes) OVER (
           PARTITION BY part_id ORDER BY file
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM files
),
binned AS (
  SELECT part_id, file, file_bytes,
         CAST(start_offset // {COMPACTION_TARGET_BYTES} AS BIGINT) AS bin_id
  FROM offs
)
SELECT part_id, file, file_bytes, bin_id,
       CAST(COUNT(*) OVER (PARTITION BY part_id, bin_id) AS BIGINT) AS bin_files
FROM binned
"""


@query("layout_compaction_bins", oracle=_compaction_oracle())
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (OPTIMIZE / rewrite_data_files):
    per ship-month partition, pack per-day files into contiguous
    ~target-size bins by cumulative-offset integer division — one
    metadata-sized shuffle + a window cumsum; the rewrite this plans
    touches only bins holding >= 2 files."""
    from protarrow_spark.operators.layout import compaction_bins

    li = table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("part_id"),
        F.dayofmonth("l_shipdate").cast("long").alias("file"),
    ).agg((F.count(F.lit(1)) * COMPACTION_ROW_BYTES).cast("long").alias("file_bytes"))
    return compaction_bins(files, "part_id", "file", "file_bytes")


@query(
    "agg_mode_exact",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
ranked AS (
  SELECT o_orderstatus, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS modal_priority, n AS n_orders
FROM ranked WHERE rn = 1
""",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE (most frequent value, smallest-value tie
    break): counts groupBy + a WindowGroupLimit-pruned rank — the
    deterministic version of the MODE() aggregate (whose tie behavior
    is engine-private). Two uniform shuffles; the window's rank<=1
    filter prunes map-side, so only one candidate row per (group,
    partition) reaches the final exchange."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("n").alias("n_orders"),
        )
    )


@query(
    "join_scd2_asof",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
),
ch AS (
  SELECT c_custkey, 'MACHINERY' AS c_mktsegment,
         TIMESTAMP '2024-06-01 00:00:00' AS change_ts
  FROM customer WHERE c_custkey % 101 = 0
),
hist AS (
  SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
         CASE WHEN d.valid_to IS NULL AND ch.change_ts IS NOT NULL
              THEN ch.change_ts ELSE d.valid_to END AS valid_to
  FROM dim d LEFT JOIN ch ON d.c_custkey = ch.c_custkey
  UNION ALL
  SELECT c_custkey, c_mktsegment, change_ts, CAST(NULL AS TIMESTAMP) FROM ch
)
SELECT o.o_orderkey, o.o_custkey, h.c_mktsegment AS segment_at_order,
       epoch_us(h.valid_from) AS version_from_us
FROM orders o JOIN hist h
  ON o.o_custkey = h.c_custkey
 AND h.valid_from <= o.o_orderdate
 AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
""",
)
def join_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: join each order to the SCD2
    customer version valid AT its order date (the temporal-join read
    side of table_scd2_history — what every fact-vs-versioned-dim
    query in a warehouse runs).

    Scale: equi-join on the customer key with the validity-range
    residual filter — fan-out is bounded by versions-per-key (<= 2
    here, small always), so this is a plain hash join co-partitioned
    on the key, never a range explosion; at 100 TB both sides
    hash-partition on c_custkey and AQE picks broadcast while the
    history is small."""
    from protarrow_spark.operators.merge import scd2_apply

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    ch = cust.filter(F.col("c_custkey") % 101 == 0).select(
        "c_custkey",
        F.lit("MACHINERY").alias("c_mktsegment"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("change_ts"),
    )
    hist = scd2_apply(dim, ch, "c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    od = epoch_micros("o_orderdate")
    cond = (
        (F.col("o_custkey") == F.col("c_custkey"))
        & (epoch_micros("valid_from") <= od)
        & (F.col("valid_to").isNull() | (od < epoch_micros("valid_to")))
    )
    return o.join(hist, cond).select(
        "o_orderkey",
        "o_custkey",
        F.col("c_mktsegment").alias("segment_at_order"),
        epoch_micros("valid_from").alias("version_from_us"),
    )


@query(
    "sql_revenue_by_nation",
    oracle="""
SELECT n_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point, exercised end-to-end: tables register as
    temp views (sources/tables.py register_views) and the query is
    SQL TEXT through spark.sql — same Catalyst plan as the DataFrame
    surface (pushed filters, decimal-exact sums, AQE join choice), so
    the engine's two public query APIs stay verified-equivalent."""
    from protarrow_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@query(
    "dq_outlier_mad",
    oracle="""
WITH v AS (SELECT event_id, event_type, value FROM events),
r1 AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type, MAX(n) AS n,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
  FROM r1 GROUP BY event_type
),
dev AS (
  SELECT v.event_id, v.event_type, v.value, m.med, m.n,
         ABS(v.value - m.med) AS d
  FROM v JOIN med m USING (event_type)
),
r2 AS (
  SELECT event_type, d, med, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d, event_id) AS rn
  FROM dev
),
mad AS (
  SELECT event_type, MAX(med) AS med, MAX(n) AS n,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN d END) AS mad
  FROM r2 GROUP BY event_type
)
SELECT d.event_type,
       CAST(MAX(m.n) AS BIGINT) AS n,
       MAX(m.med) AS med,
       MAX(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
""",
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per event_type, the lower MEDIAN and
    the MAD (median absolute deviation) are computed as EXACT element
    picks (row_number = (n+1) div 2 with event_id tie-breaks — no
    engine-private interpolation), and values beyond 3*MAD are
    counted — the standard distribution-free anomaly gate a numeric
    DQ suite runs where mean/stddev would be wrecked by the very
    outliers it hunts.

    Scale: two ranking passes over (event_type)-partitioned windows
    (same shuffle reused) + one broadcast of the per-type statistics
    back onto the value stream; the robust statistics themselves are
    type-cardinality-sized.

    Output: event_type, n, med, mad, n_outliers.
    """
    from pyspark.sql import Window

    v = table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def lower_median(df, val_col, out_name):
        w = Window.partitionBy("event_type").orderBy(val_col, "event_id")
        wn = Window.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                F.col(val_col).alias("__v"),
                F.row_number().over(w).alias("__rn"),
                F.count(F.lit(1)).over(wn).alias("__n"),
            )
            .filter(F.expr("__rn = (__n + 1) div 2"))
            .select(
                "event_type",
                F.col("__n").alias("n"),
                F.col("__v").alias(out_name),
            )
        )

    med = lower_median(v, "value", "med")
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("d"),
    )
    mad = lower_median(dev, "d", "mad").select("event_type", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


#: k-anonymity threshold for the privacy audit.
K_ANON = 5


@query(
    "dq_k_anonymity",
    oracle=f"""
WITH q AS (
  SELECT c_nationkey AS nation,
         c_mktsegment AS segment,
         CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_band,
         c_custkey
  FROM customer
),
g AS (
  SELECT nation, segment, bal_band, COUNT(*) AS group_size
  FROM q GROUP BY 1, 2, 3
)
SELECT nation, segment, bal_band,
       CAST(group_size AS BIGINT) AS group_size,
       group_size < {K_ANON} AS violates_k
FROM g
WHERE group_size < {K_ANON * 4}
""",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns — the privacy
    gate a dataset release runs before publishing: any combination of
    quasi-identifiers (here nation x market segment x balance band)
    shared by fewer than k individuals re-identifies them. Reports
    every small group (below 4k, so the audit shows the margin, not
    just the violations) with its size and violation flag.

    Scale: one hash aggregation on the quasi-identifier tuple — the
    report is group-cardinality-sized, never row-sized; the fact table
    is scanned once with no joins. Suppression/generalization would
    consume this report as its work list.

    Output: nation, segment, bal_band, group_size, violates_k.
    """
    cust = table(spark, sf_dir, "customer")
    q = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg").alias(
            "bal_band"
        ),
    )
    return (
        q.groupBy("nation", "segment", "bal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .filter(F.col("group_size") < K_ANON * 4)
        .select(
            "nation",
            "segment",
            "bal_band",
            "group_size",
            (F.col("group_size") < K_ANON).alias("violates_k"),
        )
    )


@query(
    "dq_rule_violations",
    oracle="""
SELECT 'orders_totalprice_positive' AS rule, COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_violations, COUNT(*) AS n_checked FROM orders
UNION ALL
SELECT 'orders_status_domain', COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')), COUNT(*) FROM orders
UNION ALL
SELECT 'lineitem_discount_range', COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1), COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_qty_positive', COUNT(*) FILTER (WHERE l_quantity <= 0), COUNT(*) FROM lineitem
UNION ALL
SELECT 'lineitem_orderkey_fk', COUNT(*) FILTER (WHERE o_orderkey IS NULL), COUNT(*)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'events_ts_not_null', COUNT(*) FILTER (WHERE ts IS NULL), COUNT(*) FROM events
""",
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation checking (Great-Expectations / dbt-test
    shape): a rule set of domain, range, not-null, and referential-
    integrity assertions evaluates in ONE pass per table — each rule is
    a conditional-count aggregate, so adding rules adds expressions,
    not jobs; the FK check is a left join keyed on the (uniform) order
    key whose probe side is the same lineitem scan.

    Scale: per-table scans aggregate map-side to 1 row each; the FK
    rule is the only shuffle/broadcast (AQE picks broadcast while
    orders' key projection fits). Violation counts, not violating
    rows, cross the wire — the rows themselves are a follow-up
    filtered scan using the same predicate expressions.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    def check(df, rule, cond):
        return df.agg(
            F.lit(rule).alias("rule"),
            F.count(F.when(cond, 1)).alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    fk = li.join(
        o.select(F.col("o_orderkey")), li.l_orderkey == F.col("o_orderkey"), "left"
    )
    checks = [
        check(o, "orders_totalprice_positive", F.col("o_totalprice") <= 0),
        check(o, "orders_status_domain", ~F.col("o_orderstatus").isin("O", "F", "P")),
        check(
            li,
            "lineitem_discount_range",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
        ),
        check(li, "lineitem_qty_positive", F.col("l_quantity") <= 0),
        check(fk, "lineitem_orderkey_fk", F.col("o_orderkey").isNull()),
        check(ev, "events_ts_not_null", F.col("ts").isNull()),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


#: The star schema's FK edges: (edge label, child table, child key,
#: parent table, parent key).
FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _ref_integrity_oracle() -> str:
    parts = []
    for edge, child, ck, parent, pk in FK_EDGES:
        parts.append(
            f"""SELECT '{edge}' AS edge,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
       CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN g.c END), 0) AS BIGINT) AS n_orphan_rows,
       CAST(COUNT(CASE WHEN p.k IS NULL THEN 1 END) AS BIGINT) AS n_orphan_keys
FROM (SELECT {ck} AS k, COUNT(*) AS c FROM {child} GROUP BY 1) g
LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {parent}) p USING (k)"""
        )
    return "\nUNION ALL\n".join(parts)


@query("dq_referential_integrity", oracle=_ref_integrity_oracle())
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-star referential-integrity audit: every FK edge of the
    schema reports its child-row count, orphaned ROWS, and orphaned
    KEYS in one result — the warehouse-wide consistency check run
    before publishing a snapshot (dq_rule_violations spot-checks one
    edge among other rules; this sweeps all seven).

    Scale: each edge pre-aggregates the child side to (key, count)
    BEFORE joining — distinct keys are orders of magnitude smaller
    than rows, so the join probes a compacted build even at 100 TB,
    and the parent side is a distinct key projection (broadcast for
    the dimension edges, shuffled equi-join for orders). Edges are
    independent jobs under one union — they schedule concurrently.
    """
    edges = []
    for edge, child, ck, parent, pk in FK_EDGES:
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        g = c.groupBy(F.col(ck).alias("k")).agg(F.count(F.lit(1)).alias("c"))
        tot = c.agg(F.count(F.lit(1)).alias("n_child_rows"))
        j = (
            g.join(p.withColumn("hit", F.lit(1)), "k", "left")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("hit").isNull(), F.col("c"))), F.lit(0)
                ).alias("n_orphan_rows"),
                F.count(F.when(F.col("hit").isNull(), 1)).alias("n_orphan_keys"),
            )
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(edge).alias("edge"),
                F.col("n_child_rows").cast("long").alias("n_child_rows"),
                F.col("n_orphan_rows").cast("long").alias("n_orphan_rows"),
                F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
            )
        )
        edges.append(j)
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


#: Freshness SLA: a stream partition whose newest event lags the
#: corpus high-water mark by more than this many microseconds is stale.
FRESHNESS_SLA_US = 3_600_000_000


@query(
    "dq_freshness_lag",
    oracle=f"""
WITH hw AS (SELECT MAX(epoch_us(ts)) AS hwm FROM events),
per AS (
  SELECT event_type, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS n_events
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(hwm - last_us AS BIGINT) AS lag_us,
       CAST(CASE WHEN hwm - last_us > {FRESHNESS_SLA_US} THEN 1 ELSE 0 END AS BIGINT)
         AS breaches_sla
FROM per CROSS JOIN hw
""",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness monitoring: each stream partition (event type)
    reports how far its newest event lags the corpus high-water mark,
    with a 1-hour SLA flag — the staleness check a warehouse runs
    before trusting a partition for downstream training cuts.

    Scale: one map-side-combined max per partition key plus a 1-row
    high-water-mark broadcast; nothing but the per-key maxima cross
    the wire."""
    ev = table(spark, sf_dir, "events")
    hw = ev.agg(F.max(epoch_micros("ts")).alias("hwm"))
    per = ev.groupBy("event_type").agg(
        F.max(epoch_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per.crossJoin(F.broadcast(hw)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("hwm") - F.col("last_us")).cast("long").alias("lag_us"),
        F.when(
            F.col("hwm") - F.col("last_us") > FRESHNESS_SLA_US, F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("breaches_sla"),
    )


@query(
    "table_purge_users",
    oracle="""
WITH del AS (SELECT DISTINCT user_id FROM events WHERE user_id % 211 = 7),
purged AS (
  SELECT e.* FROM events e LEFT JOIN del ON e.user_id = del.user_id
  WHERE del.user_id IS NULL
)
SELECT event_type,
       COUNT(*) AS n_kept,
       (SELECT COUNT(*) FROM events) - COUNT(*) AS n_total_minus_kept
FROM purged GROUP BY event_type
""",
)
def table_purge_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: a deletion set of user ids (here
    a deterministic residue class standing in for the GDPR request
    batch) is anti-joined out of the events fact table, with per-type
    audit counts — the compliance maintenance pass every user-data
    lake runs.

    Scale: the deletion set is request-sized, so it BROADCASTS to a
    left-anti join in the fact scan stage — the fact table never
    shuffles; the audit rollup aggregates map-side. Rewriting only
    affected partitions is the compaction planner's job
    (layout_compaction_bins) composed downstream.
    """
    ev = table(spark, sf_dir, "events")
    total = ev.count()
    deletions = (
        ev.filter(F.col("user_id") % 211 == 7).select("user_id").distinct()
    )
    purged = ev.join(F.broadcast(deletions), "user_id", "left_anti")
    return purged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        (F.lit(total) - F.count(F.lit(1))).alias("n_total_minus_kept"),
    )


@query(
    "window_percent_rank_price",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM orders
WHERE o_totalprice > 450000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_percent_rank_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST / NTILE over one shared window — the
    remaining classical ranking functions, all exact rationals of
    integer ranks ((rank-1)/(n-1), cume/n), so cross-engine parity is
    exact. One shuffle on the partition key; the selective price
    filter is pushed to the scan."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "agg_variance_exact",
    oracle="""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(19,6))) AS sx,
         SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6))) AS sxx
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       (CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n)
         / (n - 1) AS var_samp,
       sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n)
         / (n - 1)) AS stddev_samp
FROM s
""",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev per group with ENGINE-EXACT parity:
    the built-in VAR_SAMP streams float updates whose result depends
    on accumulation order (and differs between Welford and naive
    implementations across engines); here the two sufficient
    statistics accumulate as exact decimals (order-invariant), and
    variance is a fixed 5-op double epilogue — bit-identical anywhere.
    Same single partial-aggregated shuffle as the built-in."""
    ev = table(spark, sf_dir, "events")
    # (18,6): the squared product is decimal(37,12) — exact within the
    # 38-digit cap on BOTH engines (a (27,6)^2 product would trigger
    # engine-specific precision-loss rounding).
    d = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).alias("sx"),
        F.sum(d * d).alias("sxx"),
    )
    # decimal -> double through a string: both engines parse decimal
    # text correctly rounded, where a direct wide-decimal cast is
    # double-rounded by some engines (observed 1-ulp drift).
    sx = F.col("sx").cast("string").cast("double")
    sxx = F.col("sxx").cast("string").cast("double")
    n = F.col("n")
    var = (sxx - sx * sx / n) / (n - 1)
    return s.select("event_type", "n", var.alias("var_samp"), F.sqrt(var).alias("stddev_samp"))


@query(
    "agg_skew_kurtosis_exact",
    oracle="""
WITH q AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
  FROM events
),
s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(v AS HUGEINT)) AS s1,
         SUM(CAST(v AS HUGEINT) * v) AS s2,
         SUM(CAST(v AS HUGEINT) * v * v) AS s3,
         SUM(CAST(CAST(v AS HUGEINT) * v AS HUGEINT) * (CAST(v AS HUGEINT) * v)) AS s4
  FROM q GROUP BY event_type
),
d AS (
  SELECT event_type, n,
         CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / 1000 AS d1,
         CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / 1000000 AS d2,
         CAST(CAST(s3 AS VARCHAR) AS DOUBLE) / 1000000000 AS d3,
         CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / 1000000000000 AS d4
  FROM s
),
m AS (
  SELECT event_type, n, d1 / n AS mu, d2 / n - (d1 / n) * (d1 / n) AS m2,
         d1, d2, d3, d4
  FROM d
)
SELECT event_type, n,
       (d3 / n - 3 * mu * (d2 / n) + 2 * mu * mu * mu)
         / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
       (d4 / n - 4 * mu * (d3 / n) + 6 * mu * mu * (d2 / n) - 3 * mu * mu * mu * mu)
         / (m2 * m2) - 3 AS kurtosis_excess
FROM m
""",
)
def agg_skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per group with engine-exact
    parity — completing the exact-moments family (variance, corr,
    OLS): built-in SKEWNESS/KURTOSIS stream engine-private float
    state, so instead the four raw moments of the milli-quantized
    value accumulate as exact 128-bit integers (order-invariant;
    |sum v^4| stays ~1e29, inside both engines' 38-digit decimals),
    and the statistics are one fixed double epilogue written as the
    identical expression tree on both sides.

    Scale: one partial-aggregated shuffle, the same as a COUNT —
    four extra integer columns per partial row."""
    ev = table(spark, sf_dir, "events")
    v = (F.col("value").cast("decimal(18,3)") * 1000).cast("long")
    q = ev.select("event_type", v.alias("v"))
    d38 = F.col("v").cast("decimal(38,0)")
    v2 = (F.col("v") * F.col("v")).cast("decimal(38,0)")  # exact in int64 first
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v")).alias("s1"),
        F.sum(v2).alias("s2"),
        F.sum(v2 * d38).alias("s3"),
        F.sum(v2 * v2).alias("s4"),
    )
    d1 = F.col("s1").cast("string").cast("double") / F.lit(1000.0)
    d2 = F.col("s2").cast("string").cast("double") / F.lit(1000000.0)
    d3 = F.col("s3").cast("string").cast("double") / F.lit(1000000000.0)
    d4 = F.col("s4").cast("string").cast("double") / F.lit(1000000000000.0)
    n = F.col("n")
    mu = d1 / n
    m2 = d2 / n - mu * mu
    skew = (d3 / n - F.lit(3) * mu * (d2 / n) + F.lit(2) * mu * mu * mu) / (
        F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)
    )
    kurt = (
        d4 / n
        - F.lit(4) * mu * (d3 / n)
        + F.lit(6) * mu * mu * (d2 / n)
        - F.lit(3) * mu * mu * mu * mu
    ) / (m2 * m2) - F.lit(3)
    return s.select(
        "event_type", "n", skew.alias("skewness"), kurt.alias("kurtosis_excess")
    )


@query(
    "agg_corr_exact",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS syy,
         SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n)
         / (n - 1) AS covar_samp,
       ((CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n) / (n - 1))
         / (sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n) / (n - 1))
            * sqrt((CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n) / (n - 1)))
         AS corr
FROM s
""",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance + Pearson correlation per group from the five
    exact-decimal sufficient statistics — order-invariant accumulation,
    fixed double epilogue (same expression tree both engines), one
    partial-aggregated shuffle; the built-in CORR's streaming float
    state is engine-private and unverifiable."""
    li = table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(18,6)")
    dy = F.col("l_extendedprice").cast("decimal(18,6)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("string").cast("double")
    sy = F.col("sy").cast("string").cast("double")
    sxx = F.col("sxx").cast("string").cast("double")
    syy = F.col("syy").cast("string").cast("double")
    sxy = F.col("sxy").cast("string").cast("double")
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = cov / (
        F.sqrt((sxx - sx * sx / n) / (n - 1)) * F.sqrt((syy - sy * sy / n) / (n - 1))
    )
    return s.select("l_returnflag", "n", cov.alias("covar_samp"), corr.alias("corr"))


@query(
    "agg_linreg_exact",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(19,6))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS sxx,
         SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS sxy
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dy,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx,
         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy
  FROM s
)
SELECT l_returnflag, n,
       (dxy - dx * dy / n) / (dxx - dx * dx / n) AS slope,
       dy / n - ((dxy - dx * dy / n) / (dxx - dx * dx / n)) * (dx / n) AS intercept
FROM d
""",
)
def agg_linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit (price ~ quantity): slope and intercept from
    the same exact-decimal sufficient statistics as agg_corr_exact —
    the REGR_SLOPE/REGR_INTERCEPT aggregates with cross-engine-exact
    results (one partial-aggregated shuffle; fixed double epilogue
    via the correctly-rounded VARCHAR route)."""
    li = table(spark, sf_dir, "lineitem")
    dxq = F.col("l_quantity").cast("decimal(18,6)")
    dyq = F.col("l_extendedprice").cast("decimal(18,6)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dxq).alias("sx"),
        F.sum(dyq).alias("sy"),
        F.sum(dxq * dxq).alias("sxx"),
        F.sum(dxq * dyq).alias("sxy"),
    )
    n = F.col("n")
    dx = F.col("sx").cast("string").cast("double")
    dy = F.col("sy").cast("string").cast("double")
    dxx = F.col("sxx").cast("string").cast("double")
    dxy = F.col("sxy").cast("string").cast("double")
    slope = (dxy - dx * dy / n) / (dxx - dx * dx / n)
    intercept = dy / n - slope * (dx / n)
    return s.select("l_returnflag", "n", slope.alias("slope"), intercept.alias("intercept"))


# ---------------------------------------------------------------------------
# mine_sequence_bigrams — event-transition mining (1st-order Markov support)
# ---------------------------------------------------------------------------


@query(
    "mine_sequence_bigrams",
    oracle="""
WITH s AS (
  SELECT user_id, event_type AS prev_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events
)
SELECT prev_type, next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM s WHERE next_type IS NOT NULL
GROUP BY 1, 2
""",
)
def mine_sequence_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, order-1: counts of consecutive
    event-type transitions per user (the support table behind Markov
    session models, funnel discovery, and next-event prediction).
    One LEAD window per user timeline + one groupBy — exact integers.

    Scale: a single shuffle on user_id feeds the window sort; the
    transition matrix is |types|^2 rows, a constant. The same shape
    iterates to order-k by chaining LEADs (still one sort)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(epoch_micros("ts"), F.col("event_id"))
    s = ev.select(
        "user_id",
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    return s.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# dq_benford — first-significant-digit audit (Benford's law)
# ---------------------------------------------------------------------------

#: log10(1 + 1/d) for d = 1..9, materialized once in Python so the
#: Spark literals and the oracle literals are the SAME doubles (no
#: engine-side libm in either plan).
import math as _math

BENFORD_EXPECTED = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


@query(
    "dq_benford",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n_orders,
       CAST(n AS DOUBLE) / total AS actual_pct,
       CASE digit {' '.join(f'WHEN {d} THEN {p!r}' for d, p in enumerate(BENFORD_EXPECTED, 1))} END
         AS expected_pct,
       ABS(CAST(n AS DOUBLE) / total
           - CASE digit {' '.join(f'WHEN {d} THEN {p!r}' for d, p in enumerate(BENFORD_EXPECTED, 1))} END)
         AS abs_dev
FROM c CROSS JOIN t
""",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit: the distribution of first significant
    digits of order totals vs the log10(1+1/d) expectation — the
    classic fraud/synthetic-data screen (fabricated amounts flunk
    it). The digit comes from exact integer string formatting (no
    float log); the two reported doubles are each ONE IEEE op on
    exact integers against a shared constant table, so both engines
    agree bit-for-bit.

    Scale: map-side digit extraction + a 9-group aggregate; the
    grand total is a broadcast of a 9-row frame."""
    expected = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_EXPECTED]), F.col("digit")
    )
    d = table(spark, sf_dir, "orders").select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    actual = F.col("n").cast("double") / F.col("total")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("long").alias("n_orders"),
            actual.alias("actual_pct"),
            expected.alias("expected_pct"),
            F.abs(actual - expected).alias("abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# window_attribution_last_touch — conversion attribution
# ---------------------------------------------------------------------------


@query(
    "window_attribution_last_touch",
    oracle="""
WITH t AS (
  SELECT user_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT COALESCE(channel, '(direct)') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS attributed_value
FROM t WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def window_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent PRIOR non-purchase event type on the same user timeline
    ('(direct)' when none) — the standard marketing/journey
    attribution query, and for a training-data platform the 'which
    upstream source fed this record' lineage shape. One ignore-nulls
    running last_value over the user timeline, then a small-domain
    aggregate; decimal value sums keep it order-invariant.

    Scale: single shuffle on user_id; the output is |channels| rows."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    conv = ev.withColumn("channel", touch).filter(
        F.col("event_type") == "purchase"
    )
    return conv.groupBy(
        F.coalesce(F.col("channel"), F.lit("(direct)")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        _dsum(F.col("value"), DEC6).alias("attributed_value"),
    )


# ---------------------------------------------------------------------------
# window_rolling_median — exact holistic rolling aggregate
# ---------------------------------------------------------------------------

#: Supplier cut keeping the per-row output a few thousand rows.
ROLLMED_MAX_SUPP = 25
ROLLMED_FRAME = 5


@query(
    "window_rolling_median",
    oracle=f"""
WITH b AS (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         list(l_extendedprice)
           OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN {ROLLMED_FRAME - 1} PRECEDING AND CURRENT ROW) AS lst
  FROM lineitem WHERE l_suppkey <= {ROLLMED_MAX_SUPP}
)
SELECT l_suppkey, l_orderkey, l_linenumber,
       list_sort(lst)[(len(lst) + 1) // 2] AS rolling_median
FROM b
""",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (lower median) of extended price over the
    trailing {ROLLMED_FRAME}-row frame per supplier — the holistic
    window aggregate Spark has no built-in for (percentile_approx is
    a sketch). Implemented as collect_list over the frame +
    sort_array + middle element: the frame is a CONSTANT (5), so the
    per-row state is O(frame), not O(partition) — that bound is what
    makes a holistic aggregate windowable at scale. Median choice is
    the lower middle so even frames stay exact element picks (no
    averaging, no float synthesis).

    Scale: one shuffle on l_suppkey; everything else is per-row array
    work inside codegen. The supplier cut is pushed to the scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") <= ROLLMED_MAX_SUPP
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-(ROLLMED_FRAME - 1), Window.currentRow)
    )
    arr = F.sort_array(F.collect_list(F.col("l_extendedprice")).over(w))
    mid = F.floor((F.size(arr) + F.lit(1)) / F.lit(2)).cast("int")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.element_at(arr, mid).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# agg_hhi_concentration — market-concentration index, exact integers
# ---------------------------------------------------------------------------


@query(
    "agg_hhi_concentration",
    oracle="""
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS micro
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
agg AS (
  SELECT s_nationkey,
         COUNT(*) AS n_suppliers,
         SUM(CAST(micro AS HUGEINT) * micro) AS sumsq,
         SUM(micro) AS total
  FROM rev GROUP BY 1
)
SELECT n.n_name,
       CAST(a.n_suppliers AS BIGINT) AS n_suppliers,
       CAST(a.total AS DOUBLE) / 1000000 AS total_revenue,
       CAST(a.sumsq AS DOUBLE)
         / (CAST(a.total AS DOUBLE) * CAST(a.total AS DOUBLE)) AS hhi
FROM agg a JOIN nation n ON n.n_nationkey = a.s_nationkey
""",
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue
    within each nation: HHI = sum(share_i^2) = sum(rev_i^2) /
    (sum rev_i)^2 — the market-concentration / source-dominance
    metric (for a corpus: is one source supplying all the tokens?).
    Per-supplier revenue goes through the repo's exact decimal sums,
    is rescaled to integral micro-units, and squared in DECIMAL(38,0)
    so every accumulation is exact; the division happens ONCE on the
    final exact integers, so both engines emit identical doubles.

    Scale: fact-table aggregate on (nation, supplier), then a
    nation-sized rollup; the nation dim broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    line_rev = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ).cast(DEC6)
    rev = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg((F.sum(line_rev) * F.lit(1_000_000)).cast("long").alias("micro"))
    )
    sq = F.col("micro").cast("decimal(19,0)")
    agg = rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(sq * sq).alias("sumsq"),
        F.sum("micro").alias("total"),
    )
    return agg.join(F.broadcast(na), agg.s_nationkey == na.n_nationkey).select(
        "n_name",
        "n_suppliers",
        (F.col("total").cast("double") / F.lit(1_000_000)).alias("total_revenue"),
        (
            F.col("sumsq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# dq_drift_splithalf — batch distribution-drift audit (chi-squared terms)
# ---------------------------------------------------------------------------

#: 95% critical value of chi-squared with 1 dof — a per-category
#: "did this slice drift" flag (fixed literal shared by both engines).
DRIFT_CHI2_CRIT = 3.841


@query(
    "dq_drift_splithalf",
    oracle=f"""
WITH b AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM events
),
c AS (
  SELECT event_type,
         SUM(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END) AS n_b
  FROM events CROSS JOIN b GROUP BY event_type
),
t AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM c)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_first_half,
       CAST(n_b AS BIGINT) AS n_second_half,
       CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE) AS expected_second,
       (CAST(n_b AS DOUBLE) - CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE))
         * (CAST(n_b AS DOUBLE) - CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE))
         / (CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE)) AS chi2_term,
       (CAST(n_b AS DOUBLE) - CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE))
         * (CAST(n_b AS DOUBLE) - CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE))
         / (CAST(n_a * tot_b AS DOUBLE) / CAST(tot_a AS DOUBLE)) > {DRIFT_CHI2_CRIT}
         AS drifted
FROM c CROSS JOIN t
""",
)
def dq_drift_splithalf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch distribution-drift audit: split the event stream at the
    midpoint of its time range, compare each event type's second-half
    count against the count the first-half distribution predicts, and
    report the chi-squared contribution per type — the batch sibling
    of the streaming drift monitor, and the standard 'did the source
    mix shift under me' screen a training-data pipeline runs between
    snapshots. Every count is an exact integer; ``expected_second``
    is one exact int64 product followed by one IEEE division, and the
    chi-squared term is built from those same exact inputs with a
    fixed expression tree, so both engines emit identical bits. (At
    ~3e9 rows per half the int64 product n_a * tot_b needs
    decimal(38,0) — same plan.)

    Scale: one cheap min/max scan (1-row broadcast), then one
    map-side conditional count into a |types|-group aggregate; the
    grand totals re-broadcast onto the tiny type frame."""
    ev = table(spark, sf_dir, "events").select(
        epoch_micros("ts").alias("ep"), "event_type"
    )
    b = ev.agg(F.min("ep").alias("mn"), F.max("ep").alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("mid")
    )
    c = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ep") < F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("ep") >= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    t = c.agg(F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b"))
    expected = (F.col("n_a") * F.col("tot_b")).cast("double") / F.col(
        "tot_a"
    ).cast("double")
    dev = F.col("n_b").cast("double") - expected
    chi2 = dev * dev / expected
    return c.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("n_a").alias("n_first_half"),
        F.col("n_b").alias("n_second_half"),
        expected.alias("expected_second"),
        chi2.alias("chi2_term"),
        (chi2 > F.lit(DRIFT_CHI2_CRIT)).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# dq_ks_drift — exact two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------

#: The split predicate: high-priority orders vs the rest.
KS_HI_PRIORITIES = ("1-URGENT", "2-HIGH")


@query(
    "dq_ks_drift",
    oracle=f"""
WITH s AS (
  SELECT o_totalprice AS v,
         CASE WHEN o_orderpriority IN {KS_HI_PRIORITIES} THEN 1 ELSE 0 END AS hi
  FROM orders
),
g AS (
  SELECT v, SUM(hi) AS n_hi_v, SUM(1 - hi) AS n_lo_v FROM s GROUP BY v
),
c AS (
  SELECT v,
         SUM(n_hi_v) OVER (ORDER BY v) AS c_hi,
         SUM(n_lo_v) OVER (ORDER BY v) AS c_lo
  FROM g
),
t AS (SELECT SUM(hi) AS n_hi, SUM(1 - hi) AS n_lo FROM s),
d AS (
  SELECT v, c_hi, c_lo, n_hi, n_lo,
         abs(c_hi * n_lo - c_lo * n_hi) AS ks_num
  FROM c CROSS JOIN t
)
SELECT v AS ks_value,
       CAST(ks_num AS BIGINT) AS ks_num,
       CAST(n_hi AS BIGINT) AS n_hi,
       CAST(n_lo AS BIGINT) AS n_lo,
       CAST((ks_num * 1000000) // (n_hi * n_lo) AS BIGINT) AS ks_ppm
FROM d ORDER BY ks_num DESC, v LIMIT 1
""",
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the standard
    'did this distribution shift between slices' screen (here:
    order totalprice, high-priority vs the rest), computed with NO
    float arithmetic: D = max over observed values of
    |c_hi*n_lo - c_lo*n_hi| / (n_hi*n_lo) is evaluated on the integer
    numerator (exact in any engine), reported at ppm scale with the
    argmax value and a min-value tie-break. The raw DOUBLE order
    values serve only as grouping/ordering keys (identical bits from
    the same parquet on both engines) — never as arithmetic operands.

    Scale: one map-side conditional count into a |distinct values|
    aggregate, then a prefix sum. The global ORDER BY window pins the
    semantics; at real scale the prefix sum is repartitionByRange +
    per-partition offsets (the pack_sequences device), and the final
    argmax is a TakeOrdered. ks_num*1e6 stays in int64 up to ~3e9
    rows per slice; past that, the same plan over decimal(38,0)."""
    s = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority").isin(*KS_HI_PRIORITIES), 1)
        .otherwise(0)
        .alias("hi"),
    )
    g = s.groupBy("v").agg(
        F.sum("hi").alias("n_hi_v"), F.sum(1 - F.col("hi")).alias("n_lo_v")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        "v",
        F.sum("n_hi_v").over(w).alias("c_hi"),
        F.sum("n_lo_v").over(w).alias("c_lo"),
    )
    t = s.agg(
        F.sum("hi").alias("n_hi"), F.sum(1 - F.col("hi")).alias("n_lo")
    )
    d = c.crossJoin(F.broadcast(t)).select(
        "v",
        "n_hi",
        "n_lo",
        F.abs(F.col("c_hi") * F.col("n_lo") - F.col("c_lo") * F.col("n_hi")).alias(
            "ks_num"
        ),
    )
    return (
        d.orderBy(F.desc("ks_num"), F.asc("v"))
        .limit(1)
        .select(
            F.col("v").alias("ks_value"),
            F.col("ks_num").cast("long").alias("ks_num"),
            F.col("n_hi").cast("long").alias("n_hi"),
            F.col("n_lo").cast("long").alias("n_lo"),
            F.expr("(ks_num * 1000000) div (n_hi * n_lo)")
            .cast("long")
            .alias("ks_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# dq_completeness_profile — per-column null / blank / distinct profile
# ---------------------------------------------------------------------------

#: Column spec the profile is generated from, single-source for both
#: the Spark plan and the oracle: (name, is_text).
PROFILE_COLS = [
    ("o_orderkey", False),
    ("o_custkey", False),
    ("o_orderstatus", True),
    ("o_totalprice", False),
    ("o_orderdate", False),
    ("o_orderpriority", True),
]


def _profile_oracle() -> str:
    branches = []
    for name, is_text in PROFILE_COLS:
        blank = (
            f"SUM(CASE WHEN trim({name}) = '' THEN 1 ELSE 0 END)"
            if is_text
            else "0"
        )
        branches.append(
            f"""SELECT '{name}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
       CAST(COALESCE({blank}, 0) AS BIGINT) AS n_blank
FROM orders"""
        )
    return "\nUNION ALL\n".join(branches)


@query("dq_completeness_profile", oracle=_profile_oracle())
def dq_completeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness profile of the orders table — row
    count, nulls, exact distinct cardinality, and blank strings for
    text columns: the dataset-profiling pass (dbt/GE style) every
    ingest runs before trusting a new drop. Spark plan and oracle are
    both GENERATED from the same PROFILE_COLS spec, so the two sides
    cannot drift.

    Scale: one aggregate per column over a column-pruned scan; the
    exact distincts expand into separate partial aggregations (Spark
    plans multi-distinct via Expand — still map-side partials, no
    row-level shuffle of the fact table beyond the distinct keys).
    For approximate-is-fine profiling at 100 TB swap COUNT(DISTINCT)
    for the registered HLL sketch (sketch_hll_distinct)."""
    o = table(spark, sf_dir, "orders")
    frames = []
    for name, is_text in PROFILE_COLS:
        col = F.col(name)
        blank = (
            F.sum(F.when(F.trim(col) == "", 1).otherwise(0))
            if is_text
            else F.lit(0)
        )
        frames.append(
            o.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).cast("long").alias("n_null"),
                F.countDistinct(col).cast("long").alias("n_distinct"),
                F.coalesce(blank, F.lit(0)).cast("long").alias("n_blank"),
            ).select(
                F.lit(name).alias("col_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "n_blank",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# window_seasonal_baseline — hour-of-day seasonal profile + anomaly counts
# ---------------------------------------------------------------------------

#: Anomaly cut in population-stddev units (fixed literal, both engines).
SEASONAL_SIGMA = 2.0


@query(
    "window_seasonal_baseline",
    oracle=f"""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hr,
         value,
         CAST(value AS DECIMAL(18,6)) AS d
  FROM events
),
s AS (
  SELECT event_type, hr, COUNT(*) AS n, SUM(d) AS sx, SUM(d * d) AS sxx
  FROM e GROUP BY 1, 2
),
m AS (
  SELECT event_type, hr, n,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n AS mean,
         sqrt(GREATEST(
           CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / n
             - (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n)
               * (CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n),
           0.0)) AS sd
  FROM s
)
SELECT m.event_type,
       CAST(m.hr AS BIGINT) AS hr,
       CAST(m.n AS BIGINT) AS n_events,
       m.mean AS seasonal_mean,
       m.sd AS stddev_pop,
       CAST(SUM(CASE WHEN ABS(e.value - m.mean) > {SEASONAL_SIGMA} * m.sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM e
JOIN m ON m.event_type = e.event_type AND m.hr = e.hr
GROUP BY 1, 2, 3, 4, 5
""",
)
def window_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type with anomaly
    counts: the seasonal mean/stddev are the baseline a monitoring
    pipeline subtracts before alerting ('is this value unusual FOR
    3am'), and the per-cell anomaly count is the alert volume that
    baseline produces at the {SEASONAL_SIGMA}-sigma cut. Sufficient
    statistics accumulate as exact decimals (order-invariant, the
    agg_variance_exact pattern, decimal->double through a string);
    mean/stddev/thresholds are fixed IEEE expression trees, so both
    engines flag the identical event set. Hours come from integer
    epoch arithmetic, not engine-local time zones.

    Scale: one map-side aggregate into a |types| x 24 stats frame,
    which BROADCASTS back onto the second scan for the anomaly count
    — the fact table never shuffles and never sorts (compare: a
    window formulation would sort every partition)."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", epoch_micros("ts").alias("ep"), "value")
        .select(
            "event_type",
            F.expr("(ep div 3600000000) % 24").alias("hr"),
            "value",
            F.col("value").cast("decimal(18,6)").alias("d"),
        )
    )
    s = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sx"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
    )
    sx = F.col("sx").cast("string").cast("double")
    sxx = F.col("sxx").cast("string").cast("double")
    mean = sx / F.col("n")
    sd = F.sqrt(F.greatest(sxx / F.col("n") - mean * mean, F.lit(0.0)))
    m = s.select(
        "event_type", "hr", "n", mean.alias("mean"), sd.alias("sd")
    )
    joined = ev.join(F.broadcast(m), ["event_type", "hr"])
    return joined.groupBy(
        "event_type",
        F.col("hr").cast("long").alias("hr"),
        F.col("n").cast("long").alias("n_events"),
        F.col("mean").alias("seasonal_mean"),
        F.col("sd").alias("stddev_pop"),
    ).agg(
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("mean"))
                > F.lit(SEASONAL_SIGMA) * F.col("sd"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_anomalies")
    )


# ---------------------------------------------------------------------------
# agg_time_to_convert — view -> purchase latency distribution
# ---------------------------------------------------------------------------


@query(
    "agg_time_to_convert",
    oracle="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ep FROM events),
fv AS (SELECT user_id, MIN(ep) AS v_ep FROM e
       WHERE event_type = 'view' GROUP BY 1),
fp AS (
  SELECT e.user_id, MIN(e.ep) AS p_ep
  FROM e JOIN fv USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ep > fv.v_ep
  GROUP BY 1
),
conv AS (SELECT fp.user_id, p_ep - v_ep AS delta FROM fp JOIN fv USING (user_id)),
r AS (SELECT delta, ROW_NUMBER() OVER (ORDER BY delta) AS rn,
             COUNT(*) OVER () AS cnt
      FROM conv)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fv) AS n_with_view,
       CAST(MAX(cnt) AS BIGINT) AS n_converted,
       CAST(MIN(delta) AS BIGINT) AS min_us,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT)
                     THEN delta END) AS BIGINT) AS p50_us,
       CAST(MAX(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT)
                     THEN delta END) AS BIGINT) AS p90_us,
       CAST(MAX(delta) AS BIGINT) AS max_us
FROM r
""",
)
def agg_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event distribution: per user, the latency from their
    FIRST view to the first purchase strictly after it, summarized as
    exact discrete percentiles — the survival/conversion-latency
    analysis behind funnel SLAs (and, for a data pipeline, the
    ingest->publish lag distribution shape). Deltas are exact integer
    microseconds; percentiles are rank element picks (the
    agg_percentile_disc idiom), so every reported value is an actual
    observed latency.

    Scale: two user-keyed aggregates feeding a co-partitioned join
    (one shuffle family); the final rank runs over only the CONVERTED
    users' 1-value rows — at extreme cardinality swap in per-group
    partitioned percentiles, same idiom. The 1-row view-count frame
    broadcasts."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_micros("ts").alias("ep")
    )
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ep").alias("v_ep"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ep") > F.col("v_ep"))
        .groupBy("user_id")
        .agg(F.min("ep").alias("p_ep"), F.min("v_ep").alias("v_ep"))
    )
    conv = fp.select((F.col("p_ep") - F.col("v_ep")).alias("delta"))
    w = Window.orderBy("delta")
    cw = Window.partitionBy()
    ranked = conv.select(
        "delta",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    stats = ranked.agg(
        F.max("cnt").cast("long").alias("n_converted"),
        F.min("delta").cast("long").alias("min_us"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.lit(0.5) * F.col("cnt")), F.col("delta"))
        )
        .cast("long")
        .alias("p50_us"),
        F.max(
            F.when(F.col("rn") == F.ceil(F.lit(0.9) * F.col("cnt")), F.col("delta"))
        )
        .cast("long")
        .alias("p90_us"),
        F.max("delta").cast("long").alias("max_us"),
    )
    nv = fv.agg(F.count(F.lit(1)).cast("long").alias("n_with_view"))
    return nv.crossJoin(F.broadcast(stats)).select(
        "n_with_view", "n_converted", "min_us", "p50_us", "p90_us", "max_us"
    )
