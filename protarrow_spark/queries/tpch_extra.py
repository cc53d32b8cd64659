"""Extended TPC-H-shaped relational coverage (SURVEY.md §2.2).

The reference implements no relational operators (SURVEY.md §2.2 marks
every row 'Not implemented'); these queries widen the engine's query
surface with the classic decision-support shapes the first pack
(relational.py) didn't cover: EXISTS / NOT EXISTS semi-joins with
non-equi residuals, conditional (CASE) aggregation, disjunctive
multi-table predicates, HAVING over grouped joins, and
scalar-subquery-vs-aggregate comparisons.

The driver's parquet lacks partsupp / l_shipmode / l_commitdate, so
each query keeps its TPC-H *shape* while binding to the columns that
exist (tables in TESTDATA.md). Determinism: decimal-exact sums, unique
tiebreakers on every LIMIT.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from protarrow_spark.queries.registry import query
from protarrow_spark.queries.relational import DEC4, DEC6, _dsum
from protarrow_spark.sources.tables import table


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join with a non-equi residual.

    Scale: the semi-join shuffles both sides on l_orderkey/o_orderkey
    only; the date residual is evaluated inside the join, so lineitem
    rows never fan out. Orders' quarter filter pushes to the scan.
    """
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join + agg + top-20.

    Scale: lineitem⋈orders is the big shuffle (on the order key);
    customer joins on c_custkey after the pre-aggregation keys are
    known, nation broadcasts. TakeOrderedAndProject caps the result —
    no global sort materializes. Tiebreaker c_custkey is unique, so
    the LIMIT is deterministic.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_dsum(rev, DEC6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS high_line_count,
  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation.

    (No l_shipmode column in the driver's lineitem; l_linestatus keys
    the groups instead.) Scale: one shuffle join on the order key; the
    CASE branches fold into the partial aggregate map-side, so the
    final shuffle carries 2 groups x 2 counters.
    """
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
             ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
GROUP BY ()
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: join + ratio of conditional aggregates.

    Scale: the month filter cuts lineitem ~1/80 at the scan; part is
    sf-proportional, so no forced broadcast — AQE picks broadcast only
    while the filtered build side is genuinely small. Both sums are
    decimal-exact, so the final double ratio is partition-invariant.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(DEC6)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC6))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate CTE + scalar-subquery max filter.

    Scale: the revenue aggregate shuffles once on l_suppkey; the max
    is a 1-row broadcast crossed back against the same (reused)
    aggregate, so the CTE computes once. The max comparison happens on
    the exact decimal, never the rounded double.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(DEC6)
            ).alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev == top.max_rev)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(27,4))) > 90
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-HAVING over a join + top-100.

    Scale: aggregate lineitem by l_orderkey FIRST (one shuffle on the
    uniform order key, HAVING prunes to the rare large orders), then
    join the tiny survivor set to orders/customer — the classic
    agg-before-join rewrite so customer never sees the full lineitem.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC4)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 90)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: join with OR-of-ANDs multi-table predicate.

    Scale: Catalyst extracts the common single-table conjuncts
    (p_brand IN (...), l_quantity <= 30) as pushdown filters ahead of
    the join; the residual disjunction evaluates post-join in codegen.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return j.filter(clause).agg(_dsum(rev, DEC6).alias("revenue"))


@query(
    "q22_dormant_balance",
    oracle="""
WITH cutoff AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS totacctbal
FROM customer, cutoff
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-09-01'
  )
GROUP BY c_nationkey
""",
)
def q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average cutoff + NOT EXISTS anti-join.

    ("Dormant" = no orders since 2000-09-01 — the synthetic corpus has
    no order-less customers, so the anti-join is date-bounded to keep
    the result non-empty.) Scale: the average is a 1-row broadcast; the
    anti-join shuffles on the customer key only (orders pruned by the
    pushed date filter, projected to o_custkey). The decimal sum then
    divides once in double, so the cutoff is exact and the filter is
    partition-invariant.
    """
    cust = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-09-01")
        .select("o_custkey")
    )
    cutoff = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC4)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC4)).cast("double").alias("totacctbal"),
        )
    )
