"""Domain-path queries: the XML parse pipeline exercised under the
DuckDB oracle.

The testdata has no XML, so `xml_flatten` is oracled via a ROUNDTRIP:
DBLP-shaped person-page XML is synthesized from lineitem/orders with
pure column expressions (deterministic), parsed back through the real
``mapInPandas`` ElementTree kernel, and the exploded author rows must
equal what SQL derives from the base tables directly. This checks the
parser's record dispatch, author ordinals, and attribute extraction on
150k+ documents — not just the handful of fixture files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.sources.xml_source import xml_flatten
from is3107datapipelineproject_spark.workload.registry import register
from is3107datapipelineproject_spark.workload.star_queries import LINE_ORDER_SQL


def synth_order_xml(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """One DBLP-person-page-shaped XML document per order: each line item
    becomes an <author> (pid = suppkey) in LINE_ORDER, the order date's
    year becomes <year>. All values numeric → no escaping needed."""
    frag = F.concat(
        F.lit('<author pid="'),
        F.col("l_suppkey").cast("string"),
        F.lit('">s'),
        F.col("l_suppkey").cast("string"),
        F.lit("</author>"),
    )
    # array_sort over (LINE_ORDER…, frag) structs = deterministic author
    # order matching the oracle's row_number ordinal.
    sort_struct = F.struct(
        F.col("l_linenumber").alias("o0"),
        F.col("l_suppkey").alias("o1"),
        F.col("l_partkey").alias("o2"),
        F.col("l_extendedprice").alias("o3"),
        frag.alias("frag"),
    )
    authors = lineitem.groupBy("l_orderkey").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(sort_struct)), lambda s: s["frag"])
        ).alias("authors_xml")
    )
    year = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), F.year("o_orderdate").cast("int").alias("year")
    )
    return authors.join(year, "l_orderkey").select(
        F.concat(
            F.lit('<?xml version="1.0"?><dblpperson><r><article key="conf/o/'),
            F.col("l_orderkey").cast("string"),
            F.lit('" mdate="2020-01-02"><title>t</title><year>'),
            F.col("year").cast("string"),
            F.lit("</year>"),
            F.col("authors_xml"),
            F.lit("</article></r></dblpperson>"),
        ).alias("content")
    )


@register(
    "xml_flatten",
    oracle=f"""
WITH ranked AS (
  SELECT l_orderkey, l_suppkey,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY {LINE_ORDER_SQL}) AS rn
  FROM lineitem
)
SELECT 'conf/o/' || CAST(r.l_orderkey AS VARCHAR) AS paper_key,
       CAST(year(o.o_orderdate) AS INT) AS year,
       CAST(r.rn AS INT) AS pos,
       CAST(r.l_suppkey AS VARCHAR) AS pid
FROM ranked r JOIN orders o ON o.o_orderkey = r.l_orderkey
""",
    tags=("source", "xml", "domain"),
)
def q_xml_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/X2 roundtrip: synthesize per-order DBLP XML → parse with the
    real ElementTree mapInPandas kernel → explode authors. Must equal
    the direct SQL derivation (checks dispatch, ordinals, attributes)."""
    staged = synth_order_xml(load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders"))
    raw = xml_flatten(staged, "content")
    return raw.select("paper_key", "year", F.explode("authors").alias("a")).select(
        "paper_key", "year", F.col("a.pos").alias("pos"), F.col("a.pid").alias("pid")
    )
