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


@register(
    "volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem l
  JOIN orders o    ON o.o_orderkey  = l.l_orderkey
  JOIN customer c  ON c.c_custkey   = o.o_custkey
  JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
  JOIN nation n1   ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2   ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
) GROUP BY 1, 2, 3
""",
    tags=("join", "agg", "tpch"),
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 flavor: bilateral trade volume between two nations by
    ship year. The nation filter is applied to each TINY dimension
    BEFORE the joins — supplier and customer are each semi-reduced to
    the two target nations by a broadcast join, so the fact rows
    surviving to the 4-way join are ~ (2/25)^2 of the band. The final
    asymmetric-pair residual (supp != cust) runs on the already-joined
    rows. All dimension joins broadcast; the only shuffle is the final
    3-key aggregation."""
    two = F.col("n_name").isin("NATION_1", "NATION_2")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name").filter(two)
    s = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "market_share",
    oracle="""
SELECT o_year,
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
            / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey   = l.l_partkey
  JOIN orders o   ON o.o_orderkey  = l.l_orderkey
  JOIN customer c ON c.c_custkey   = o.o_custkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey  = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey   = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
) GROUP BY 1
""",
    tags=("join", "agg", "tpch"),
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 flavor: NATION_3's share of ECONOMY-part volume sold
    into ASIA, by order year. Dimension reductions first: part is
    filtered to one type then broadcast; the customer side is
    semi-reduced to the ASIA region via nation⋈region (both broadcast).
    The share divides two exact DECIMAL sums (cast to double only for
    the final ratio), so the result is order-insensitive: numerator and
    denominator are each exact, and the single fp division is
    deterministic."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n2 = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    n1 = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("supp_nation"))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("volume")
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol, "supp_nation")
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    "product_profit",
    oracle="""
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey   = l.l_partkey
  JOIN supplier s ON s.s_suppkey   = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN orders o   ON o.o_orderkey  = l.l_orderkey
  WHERE p.p_type = 'PROMO'
) GROUP BY 1, 2
""",
    tags=("join", "agg", "tpch"),
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 flavor (no partsupp table in this schema, so profit is
    discounted revenue rather than revenue minus supply cost): per
    supplier-nation per order-year profit on PROMO parts. part,
    supplier and nation all broadcast; orders is the only co-shuffled
    join (fact-to-fact on orderkey), and the PROMO filter reduces the
    fact before that shuffle. Shape: star with one big join + 2-key
    agg."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_profit")
        )
    )


@register(
    "returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON o.o_custkey   = c.c_custkey
JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) DESC,
         c.c_custkey
LIMIT 20
""",
    tags=("join", "agg", "topk", "tpch"),
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 flavor: top-20 customers by returned-item revenue in a
    quarter. The returnflag + quarter filters prune the fact scan
    (pushed to parquet); nation broadcasts onto customer; the heavy
    join is lineitem⋈orders on orderkey. Top-20 runs as TakeOrdered on
    the aggregated (small) frame — sort carries c_custkey as an exact
    tiebreak so the LIMIT frontier is deterministic. Revenue ranks on
    the exact DECIMAL sum, cast to double only for output."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("rev_exact")
        )
    )
    return (
        agg.orderBy(F.col("rev_exact").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_exact").cast("double").alias("revenue"),
            _dec("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1
) GROUP BY 1
""",
    tags=("join", "agg", "tpch"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 flavor: distribution of non-urgent order counts per
    customer, INCLUDING zero-order customers — the left outer join with
    the priority predicate ON THE JOIN (not a WHERE, which would drop
    the NULL-extended rows) is the point of this shape. count(col)
    skips the NULL order keys so childless customers land in the
    c_count=0 bucket. Two aggregations: per-customer (shuffle on
    custkey, same key as the join → single exchange reused), then the
    tiny histogram."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "small_qty_revenue",
    oracle="""
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12' AND p.p_size < 10
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 flavor: revenue from unusually-small orders of one
    brand's small parts. The correlated AVG subquery is decorrelated
    by hand the way Catalyst would: per-part averages are computed ONCE
    over only the parts that survive the brand/size filter (the
    broadcast semi-reduction runs before the agg, so the avg leg scans
    ~1/25 of the fact), then broadcast back. avg of integral-valued
    doubles = exact-sum / count → bit-identical in any engine; the
    single /7.0 at the end is one fp division of an exact DECIMAL
    sum."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#12") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    branded = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        branded.join(F.broadcast(avg_qty), branded["l_partkey"] == avg_qty["ak"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "discount_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    tags=("tpch", "agg"),
)
def q_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-flavor what-if revenue: a pure scan-and-sum whose
    entire WHERE clause must reach the parquet reader as PushedFilters
    (date band + discount band + quantity) — the canonical predicate-
    pushdown probe. DECIMAL product sum, exact and order-free."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"))
    )


@register(
    "significant_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(value) AS total, CAST(count(*) AS BIGINT) AS nparts FROM pv)
SELECT l_partkey AS part_key, CAST(pv.value AS DOUBLE) AS value
FROM pv CROSS JOIN tot
WHERE CAST(pv.value AS DOUBLE) > CAST(tot.total AS DOUBLE) / nparts * 1.5
""",
    tags=("tpch", "agg"),
)
def q_significant_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-flavor significant-stock selection: per-part value vs
    a GLOBAL scalar threshold (1.5x the mean part value — like Q11's
    SF-scaled fraction, the cut is scale-INVARIANT: the selected tail
    is a stable share of parts at any corpus size). The per-part
    aggregate is the only corpus shuffle; the grand total re-aggregates
    the #parts-row frame and comes back as a 1-row broadcast — the fact
    table is never scanned twice. Threshold compare on
    exact-DECIMAL-derived doubles, identical expression both engines."""
    li = _t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_dec("l_extendedprice")).alias("value"))
    tot = pv.agg(F.sum("value").alias("total"), F.count(F.lit(1)).cast("long").alias("nparts"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value").cast("double")
            > F.col("total").cast("double") / F.col("nparts") * 1.5
        )
        .select(F.col("l_partkey").alias("part_key"), F.col("value").cast("double").alias("value"))
    )


@register(
    "priority_by_linestatus",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1996-01-01'
GROUP BY 1
""",
    tags=("tpch", "join"),
)
def q_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-flavor conditional two-way counts: the date band
    prunes lineitem AT THE SCAN, then one fact-fact equi-join on
    orderkey feeds a CASE-sum pivot — the urgent-vs-other split
    computed in a single pass, never two joins."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_linestatus")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
    )


@register(
    "part_supplier_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 11, 17, 23, 29, 35, 41)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    tags=("tpch", "join"),
)
def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-flavor supplier variety: distinct-supplier counts per
    part attribute cell, minus an excluded-supplier subquery. The
    exclusion list (delinquent accounts) is a broadcast LEFT ANTI join;
    part attributes broadcast onto the fact; one count-distinct
    aggregate on the pruned cells."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 11, 17, 23, 29, 35, 41)
    )
    excl = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(excl), "l_suppkey", "left_anti")
        .join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
              li["l_partkey"] == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "bulk_part_suppliers",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2
  HAVING sum(l_quantity) > 100
)
SELECT DISTINCT s.s_suppkey AS supp_key, s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM ps)
""",
    tags=("tpch", "join"),
)
def q_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-flavor nested semi-join chain: suppliers who moved
    bulk volume (> 100 units per part) of a name-prefixed part family.
    The part-name filter broadcasts into the fact scan as a semi-join,
    the per-(part, supplier) volume aggregate applies the correlated
    threshold, and the surviving supplier set semi-joins the dimension
    — three nested memberships, zero row explosion."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    ps = (
        li.join(F.broadcast(parts), "l_partkey", "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(ps, s["s_suppkey"] == ps["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(F.col("s_suppkey").alias("supp_key"), "s_name", F.col("n_name").alias("nation"))
        .distinct()
    )


@register(
    "sole_returned_supplier",
    oracle="""
WITH osf AS (
  SELECT l_orderkey, l_suppkey, max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY 1, 2
),
ord AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp, CAST(sum(ret) AS BIGINT) AS n_ret
  FROM osf GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM osf JOIN ord USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = osf.l_suppkey
WHERE osf.ret = 1 AND ord.n_ret = 1 AND ord.n_supp >= 2
GROUP BY 1
ORDER BY numwait DESC, s_name LIMIT 20
""",
    tags=("tpch", "join"),
)
def q_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-flavor sole-blame analysis: suppliers who were the
    ONLY supplier with returned lines in a multi-supplier order (the
    EXISTS other-supplier + NOT-EXISTS other-returned pair expressed as
    one per-order aggregate instead of two correlated self-joins — the
    fact table is read once, the per-order flag frame re-aggregates
    #orders rows, and the blame assignment is a filter + join back on
    the SAME orderkey partitioning; supplier dim broadcasts). Top-20 by
    (numwait desc, name) via TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    osf = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret")
    )
    ordf = osf.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_supp"),
        F.sum("ret").cast("long").alias("n_ret"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        osf.join(ordf, "l_orderkey")
        .filter((F.col("ret") == 1) & (F.col("n_ret") == 1) & (F.col("n_supp") >= 2))
        .join(F.broadcast(s), osf["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "skyline_parts",
    oracle="""
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
""",
    tags=("tpch", "skyline"),
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts no other part dominates on
    (retailprice min, size min) — the cheapest-and-smallest frontier a
    procurement optimizer would shortlist. The naive formulation is a
    quadratic dominance self-join (the oracle keeps exactly that shape
    as an independent strategy); the engine plan is the classic sweep
    made distributed: one partial-aggregated shuffle collapses the
    corpus to its (price -> min size) candidate frontier (bounded by
    DISTINCT price cardinality, corpus-size-independent), a running-min
    window over that small frame keeps each price iff it improves on
    every strictly-cheaper price, and the surviving (price, size) pairs
    broadcast back against the corpus to recover the frontier rows
    (ties included). The full table is scanned once and never
    self-joined."""
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    cand = p.groupBy("p_retailprice").agg(F.min("p_size").alias("min_size"))
    sweep = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        cand.withColumn("prev_min", F.min("min_size").over(sweep))
        .filter(F.col("prev_min").isNull() | (F.col("prev_min") > F.col("min_size")))
        .select("p_retailprice", F.col("min_size").alias("p_size"))
    )
    return p.join(F.broadcast(sky), ["p_retailprice", "p_size"]).select(
        "p_partkey", "p_retailprice", "p_size"
    )


@register(
    "rfm_segmentation",
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         CAST(max(o_orderdate) AS DATE) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey,
         CAST(ntile(4) OVER (ORDER BY last_order, o_custkey) AS INT) AS r,
         CAST(ntile(4) OVER (ORDER BY frequency, o_custkey) AS INT) AS f,
         CAST(ntile(4) OVER (ORDER BY monetary, o_custkey) AS INT) AS m
  FROM rfm
)
SELECT concat(CAST(r AS VARCHAR), CAST(f AS VARCHAR), CAST(m AS VARCHAR)) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1
""",
    tags=("tpch", "warehouse", "window"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency / frequency /
    monetary aggregates quartiled independently (ntile(4)), customers
    bucketed by the 3-digit segment code — the classic CRM cohorting
    every warehouse ships. Determinism: each ntile ORDER BY carries
    o_custkey as a total-order tie-break (ntile over a partial order is
    engine-dependent at quartile boundaries); monetary sums in
    DECIMAL(18,2) (exact, order-free). Plan: the fact collapses to one
    per-customer aggregate (partial-agg map-side, localCheckpoint'd so
    the three rank passes share it); each quartile rides the TWO-LEVEL
    distributed rank (operators.ranking.distributed_rank — quantile
    cutoffs → parallel in-bucket ranks + a ≤64-row offset prefix) with
    the EXACT ntile(4) recovered arithmetically from (rank, n)
    (ranking.ntile_from_rank) — no single-task sort anywhere; the
    final segment rollup is 64 rows."""
    from is3107datapipelineproject_spark.operators.ranking import (
        distributed_rank,
        ntile_from_rank,
    )

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("monetary"),
        )
        # distributed_rank buckets on a numeric cast — dates rank by
        # their epoch-day image (order-identical to the DATE order)
        .withColumn("last_day", F.datediff("last_order", F.lit("1970-01-01").cast("date")))
        .localCheckpoint(eager=False)
    )
    scored = rfm
    metrics = (("r", "last_day"), ("f", "frequency"), ("m", "monetary"))
    for i, (metric, col) in enumerate(metrics):
        scored = distributed_rank(
            scored, col, ["o_custkey"], rank_col="__rn", count_col="__n"
        ).withColumn(
            metric, ntile_from_rank(F.col("__rn"), F.col("__n"), 4)
        ).drop("__rn", "__n")
        # Checkpoint BETWEEN rank passes (not after the last — no
        # further cutoff job follows it): each distributed_rank opens
        # with an eager approxQuantile job, and without the barrier
        # pass k's cutoff job re-derives passes 1..k-1's window+join
        # lineage from scratch (measured 6.0 s → 3.0 s at sf0.1; each
        # materialization is the O(|customers|) frame, spillable,
        # linear).
        if i < len(metrics) - 1:
            scored = scored.localCheckpoint(eager=False)
    return (
        scored.select(
            F.concat(
                F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
            ).alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


_SQL_IFACE = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM {li} l
JOIN {o} o ON o.o_orderkey = l.l_orderkey
JOIN {c} c ON c.c_custkey = o.o_custkey
JOIN {n} n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2
"""


@register(
    "sql_interface_revenue",
    oracle=_SQL_IFACE.format(li="lineitem", o="orders", c="customer", n="nation")
    .replace("year(o.o_orderdate)", "CAST(year(o.o_orderdate) AS INT)"),
    tags=("tpch", "sql"),
)
def q_sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL API surface: the same engine capabilities through
    ``spark.sql`` over registered temp views — a user of the reference
    can bring plain ANSI SQL instead of the DataFrame API and get the
    identical Catalyst plan (views are lazy aliases; the optimizer
    sees one tree either way — broadcastable dims, DECIMAL-exact
    money sums, partial aggregation). The oracle is the SAME text with
    table names swapped, which is the point: this one IS
    SQL-expressible by construction. View names are sf-dir-scoped so
    concurrent registrations cannot collide."""
    import re as _re

    tag = _re.sub(r"[^a-zA-Z0-9]", "_", sf_dir.strip("/"))
    names = {}
    for t, key in (("lineitem", "li"), ("orders", "o"), ("customer", "c"), ("nation", "n")):
        v = f"__sqliface_{t}_{tag}"
        _t(spark, sf_dir, t).createOrReplaceTempView(v)
        names[key] = v
    out = spark.sql(_SQL_IFACE.format(**names))
    return out.withColumn("yr", F.col("yr").cast("int"))


# --- round 6: co-bucketed fact-table layout (build-once surface) ------------


@register(
    "fact_bucket_build",
    oracle="""
SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_orders,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_lineitems,
       CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT) AS n_li_orders
""",
    tags=("warehouse", "materialize"),
)
def q_fact_bucket_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the co-bucketed orders/lineitem pair
    (plans/indexes.py::fact_bucket_tables) and return a build-
    correctness summary scanned from the MATERIALIZED tables only (the
    oracle recomputes the same counts from the raw parquet — a lost or
    duplicated row in the bucketed rewrite fails the hash). Bucketing
    is the ingest-half of the contract; bucketed_join_revenue is the
    query-half that cashes it in."""
    from is3107datapipelineproject_spark.plans.indexes import fact_bucket_tables

    names = fact_bucket_tables(spark, sf_dir)
    o, li = spark.table(names["orders"]), spark.table(names["lineitem"])
    return (
        o.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .crossJoin(
            li.agg(
                F.count(F.lit(1)).cast("long").alias("n_lineitems"),
                F.countDistinct("l_orderkey").cast("long").alias("n_li_orders"),
            )
        )
    )


@register(
    "bucketed_join_revenue",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
    tags=("warehouse", "join", "materialize"),
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through the co-bucketed layout: the
    orders⋈lineitem equi-join reads both bucketed tables and plans as
    a sort-merge join with NO Exchange on either side — the scans
    already report the same HashPartitioning(orderkey, 16), so the only
    shuffle in the whole plan is the 5-row priority rollup. On raw
    parquet this join shuffles BOTH fact tables every time it runs; at
    100 TB that double exchange IS the query cost, and this plan is the
    reason warehouses bucket facts on the join key at ingest. Revenue
    accumulates in DECIMAL(18,2)x(1-discount) exactly like the raw-scan
    TPC-H family, so the bucketed path is hash-identical to the raw
    oracle."""
    from is3107datapipelineproject_spark.plans.indexes import fact_bucket_tables

    names = fact_bucket_tables(spark, sf_dir)
    o = spark.table(names["orders"]).select("o_orderkey", "o_orderpriority")
    li = spark.table(names["lineitem"]).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "dpp_modern_era_revenue",
    oracle="""
WITH y AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS o_year,
         CASE WHEN year(o_orderdate) >= 1996 THEN 'modern' ELSE 'early' END AS era
  FROM orders
)
SELECT o.o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice FROM orders) o
JOIN y ON y.o_year = o.o_year
WHERE y.era = 'modern'
GROUP BY 1
""",
    tags=("warehouse", "materialize", "layout"),
)
def q_dpp_modern_era_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by year for the 'modern' era through the year-PARTITIONED
    orders fact joined to the era dimension
    (plans/indexes.py::orders_year_partitioned). The query never names
    a year — the dim-side ``era = 'modern'`` predicate is the only
    filter — yet the fact scan receives a runtime ``dynamicpruning``
    PartitionFilter fed by the broadcast dim exchange, so only the
    matching year directories are listed and read
    (test_dpp_plan_prunes_partitions asserts the subquery filter in
    the scan). This is the third pruning mechanism in the layout
    family: planning-time literal partition pruning (ivfpq codes),
    stats-based row-group skipping (z-order), and now RUNTIME partition
    pruning from a join — at 100 TB, the mechanism that keeps
    date-partitioned fact scans proportional to the dim selection with
    zero query-side partition knowledge."""
    from is3107datapipelineproject_spark.plans.indexes import orders_year_partitioned

    names = orders_year_partitioned(spark, sf_dir)
    o = spark.table(names["orders"])
    y = spark.table(names["years"]).filter(F.col("era") == "modern")
    return (
        o.join(y.select("o_year"), "o_year")
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )



@register(
    "ols_price_qty_discount",
    oracle="""
WITH s AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 10000) AS BIGINT) AS d,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(q AS DECIMAL(38,0))) AS sq, sum(CAST(d AS DECIMAL(38,0))) AS sd,
         sum(CAST(y AS DECIMAL(38,0))) AS sy,
         sum(CAST(q AS DECIMAL(38,0)) * q) AS sqq,
         sum(CAST(q AS DECIMAL(38,0)) * d) AS sqd,
         sum(CAST(d AS DECIMAL(38,0)) * d) AS sdd,
         sum(CAST(q AS DECIMAL(38,0)) * y) AS sqy,
         sum(CAST(d AS DECIMAL(38,0)) * y) AS sdy,
         sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
  FROM s
),
f AS (
  SELECT CAST(n AS DOUBLE) AS n, CAST(sq AS DOUBLE) AS sq, CAST(sd AS DOUBLE) AS sd,
         CAST(sy AS DOUBLE) AS sy, CAST(sqq AS DOUBLE) AS sqq, CAST(sqd AS DOUBLE) AS sqd,
         CAST(sdd AS DOUBLE) AS sdd, CAST(sqy AS DOUBLE) AS sqy, CAST(sdy AS DOUBLE) AS sdy,
         CAST(syy AS DOUBLE) AS syy
  FROM m
),
b AS (
  SELECT n, sy, sqy, sdy, syy,
         round((sy*(sqq*sdd - sqd*sqd) - sq*(sqy*sdd - sqd*sdy) + sd*(sqy*sqd - sqq*sdy))
               / (n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd)), 6) AS b0,
         round((n*(sqy*sdd - sqd*sdy) - sy*(sq*sdd - sqd*sd) + sd*(sq*sdy - sqy*sd))
               / (n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd)), 6) AS b1,
         round((n*(sqq*sdy - sqy*sqd) - sq*(sq*sdy - sqy*sd) + sy*(sq*sqd - sqq*sd))
               / (n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd)), 6) AS b2
  FROM f
)
SELECT CAST(n AS BIGINT) AS n_rows, b0, b1, b2,
       round(1.0 - (syy - b0*sy - b1*sqy - b2*sdy) / (syy - sy*sy/n), 6) AS r2
FROM b
""",
    tags=("warehouse", "stats"),
)
def q_ols_price_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature closed-form OLS — extendedprice (cents) on quantity
    and discount (basis points) with intercept — the 'regression at
    100 TB is just moments' shape: ONE scan accumulates the ten exact
    DECIMAL(38,0) sums of the normal equations (all partial-aggregated
    map-side, no shuffle beyond one 1-row aggregate), the 3x3 system is
    solved in closed form by Cramer's rule over a single double cast of
    those sums, and R² falls out of the same moments — no residual
    second pass, no iteration, no driver-side data. Coefficients are
    rounded to 6dp BEFORE feeding the R² expression so every derived
    number is engine-identical."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("q")).alias("sq"), F.sum(dec("d")).alias("sd"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("q") * F.col("q")).alias("sqq"),
        F.sum(dec("q") * F.col("d")).alias("sqd"),
        F.sum(dec("d") * F.col("d")).alias("sdd"),
        F.sum(dec("q") * F.col("y")).alias("sqy"),
        F.sum(dec("d") * F.col("y")).alias("sdy"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    dbl = {c: F.col(c).cast("double") for c in
           ["n", "sq", "sd", "sy", "sqq", "sqd", "sdd", "sqy", "sdy", "syy"]}
    n, sq, sd, sy = dbl["n"], dbl["sq"], dbl["sd"], dbl["sy"]
    sqq, sqd, sdd = dbl["sqq"], dbl["sqd"], dbl["sdd"]
    sqy, sdy, syy = dbl["sqy"], dbl["sdy"], dbl["syy"]
    det = n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd) + sd * (sq * sqd - sqq * sd)
    b0 = F.round((sy * (sqq * sdd - sqd * sqd) - sq * (sqy * sdd - sqd * sdy)
                  + sd * (sqy * sqd - sqq * sdy)) / det, 6)
    b1 = F.round((n * (sqy * sdd - sqd * sdy) - sy * (sq * sdd - sqd * sd)
                  + sd * (sq * sdy - sqy * sd)) / det, 6)
    b2 = F.round((n * (sqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
                  + sy * (sq * sqd - sqq * sd)) / det, 6)
    out = m.select(
        F.col("n").alias("n_rows"),
        b0.alias("b0"), b1.alias("b1"), b2.alias("b2"),
        sy.alias("__sy"), sqy.alias("__sqy"), sdy.alias("__sdy"),
        syy.alias("__syy"), n.alias("__n"),
    )
    r2 = F.round(
        1.0
        - (F.col("__syy") - F.col("b0") * F.col("__sy") - F.col("b1") * F.col("__sqy")
           - F.col("b2") * F.col("__sdy"))
        / (F.col("__syy") - F.col("__sy") * F.col("__sy") / F.col("__n")),
        6,
    )
    return out.select("n_rows", "b0", "b1", "b2", r2.alias("r2"))


@register(
    "bloom_join_brand_qty",
    oracle="""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
GROUP BY 1
""",
    tags=("warehouse", "join", "layout"),
)
def q_bloom_join_brand_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension fact join — one brand's lineitem volume. The
    query itself is a plain dim-filtered join; what it carries is the
    RUNTIME ROW-FILTER contract: when the fact side is large (the
    100 TB regime — simulated in test_runtime_bloom_filter_join by
    lowering the application-side threshold), Spark injects a
    bloom_filter_agg over the filtered dim keys and a might_contain
    predicate into the FACT SCAN'S filter, discarding non-matching rows
    before the join exchange — the row-level sibling of DPP's
    partition-level pruning, and it needs no partitioning or layout at
    all. At toy SF the optimizer correctly skips the filter (the scan
    is below the threshold); the correctness contract is identical
    either way, which is why one oracle serves both regimes."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey", "p_brand"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


@register(
    "relational_division",
    oracle="""
WITH n AS (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS c FROM orders),
cp AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_priorities
FROM cp GROUP BY o_custkey
HAVING count(*) = (SELECT c FROM n)
""",
    tags=("tpch", "join"),
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION ("for all" semantics): customers who have
    placed orders in EVERY order-priority class — the one classic
    relational-algebra operator SQL has no keyword for, and the only
    §2-family shape the registry lacked. Implemented count-matching,
    not double-NOT-EXISTS: dedup the (customer, priority) pairs (one
    hash aggregate), count per customer, keep counts equal to the
    GLOBAL distinct-divisor count (1-row broadcast). Linear in the
    dividend at any scale — the textbook double-anti-join re-scans the
    fact per divisor row and the divisor-cross-join materializes
    |customers|×|divisor|; both are strictly worse plans for identical
    semantics. Divisor size comes FROM the data, so the query stays
    correct as classes appear/disappear."""
    o = _t(spark, sf_dir, "orders")
    n = o.select(F.count_distinct("o_orderpriority").cast("long").alias("c"))
    cp = o.select("o_custkey", "o_orderpriority").distinct()
    agg = cp.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_priorities")
    )
    return agg.join(
        F.broadcast(n), agg["n_priorities"] == n["c"]
    ).select("o_custkey", "n_priorities")
