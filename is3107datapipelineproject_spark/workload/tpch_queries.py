"""TPC-H-flavor analytic shapes beyond the reference's own workload.

The reference workload (SURVEY §2) is join/agg-light; these queries
exercise the remaining classic warehouse shapes on the same star schema
so the engine's plan quality is demonstrable across the full TPC-H
operator space: correlated EXISTS (semi-join with a non-equi residual),
HAVING-then-rejoin, disjunctive predicate pushdown, scalar-subquery
broadcast + anti-join, per-group-min rejoin, and max-equality selection.

Determinism: money sums via DECIMAL(18,2) casts (exact, order-free);
quantity sums are integral-valued doubles (exact in fp); min/max
selections compare exact values, never post-division doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.workload.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


@register(
    "order_priority_exists",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
GROUP BY 1
""",
    tags=("join", "tpch"),
)
def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor: late-shipment order-priority count. The
    correlated EXISTS becomes a LEFT SEMI join whose condition carries a
    non-equi residual (l_shipdate > o_orderdate + 75d) on top of the
    order-key equi pair — Spark hashes on the equi key and evaluates the
    residual inside the join, so the plan stays a single shuffled
    semi-join, never a cartesian. The quarter band is pushed to the
    orders scan."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 75 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "large_order_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       big.sum_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    tags=("join", "agg", "tpch"),
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 flavor: HAVING-then-rejoin. The quantity rollup runs
    first (map-side partial agg on the fact's natural key), the HAVING
    prunes ~99% of orders, and only the tiny survivor set joins back to
    orders/customer — at scale the post-HAVING side is broadcastable and
    AQE picks that up at runtime. sum(l_quantity) is integral-valued
    double → exact under any summation order."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            _dec("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "disjunctive_part_revenue",
    oracle="""
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("join", "tpch"),
)
def q_disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 flavor: OR-of-conjunctions join filter. Catalyst
    factors the disjunction: the part-only conjuncts (brand ∧ size) and
    the lineitem-only conjunct (quantity ranges) are each pushed below
    the join as an OR'd scan filter, and the full mixed predicate is
    kept as the join residual — so both scans prune before the (dim
    broadcast) join instead of filtering after it."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return joined.filter(cond).agg(F.sum(rev).cast("double").alias("revenue"))


@register(
    "dormant_rich_customers",
    oracle="""
WITH thresh AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-06-01')
GROUP BY 1
""",
    tags=("join", "tpch"),
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavor: above-average-balance customers with no recent
    orders. Two classic sub-plans in one query: the scalar AVG subquery
    becomes a 1-row broadcast cross join (computed once, streamed past
    every row — no recompute per row), and NOT EXISTS becomes a LEFT
    ANTI join against the date-pruned orders scan. The average is
    derived as exact-DECIMAL sum / count on both engines so the
    threshold comparison is bit-identical."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1997-06-01")
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(thresh)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    dormant = rich.join(recent, rich["c_custkey"] == recent["o_custkey"], "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


@register(
    "cheapest_part_per_type",
    oracle="""
WITH mn AS (SELECT p_type, min(p_retailprice) AS min_price FROM part GROUP BY 1)
SELECT p.p_type, p.p_partkey, p.p_name,
       CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS p_retailprice
FROM part p JOIN mn ON p.p_type = mn.p_type AND p.p_retailprice = mn.min_price
""",
    tags=("join", "agg", "tpch"),
)
def q_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 flavor (per-group min rejoin): for each part type, every
    part hitting the type's minimum retail price. The groupBy-min side
    has one row per type (tiny) and is broadcast back onto the part
    scan — the same decorrelation Catalyst applies to Q2's correlated
    MIN subquery, written explicitly. Equality compares the stored
    double against min() of the same stored doubles → exact."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type", "p_retailprice")
    mn = p.groupBy(F.col("p_type").alias("mt")).agg(F.min("p_retailprice").alias("min_price"))
    return (
        p.join(
            F.broadcast(mn),
            (p["p_type"] == mn["mt"]) & (p["p_retailprice"] == mn["min_price"]),
        )
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            _dec("p_retailprice").cast("double").alias("p_retailprice"),
        )
    )


@register(
    "top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(rev.total_rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
""",
    tags=("join", "agg", "tpch"),
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 flavor: supplier(s) achieving the maximum quarterly
    revenue. The revenue view aggregates once; the MAX scalar is a
    1-row broadcast joined back on exact-DECIMAL equality (ties kept,
    per spec) — no global sort, no window over the whole view. The date
    band prunes the fact scan before the supplier rollup."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.select("l_suppkey", "l_extendedprice", "l_discount")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["max_rev"])
        .join(s, rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )
