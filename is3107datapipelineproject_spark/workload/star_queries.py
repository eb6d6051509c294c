"""Oracle-checked query workload over the driver's star-schema testdata.

Each SURVEY.md §2 operator (qname column) is instantiated on the
TPC-H-ish tables per the FIXTURES.md §A mapping — e.g. the DBLP
co-authorship pair-count becomes supplier co-occurrence per order, the
"k-th author" positional predicate becomes "supplier on the k-th line of
the order".

Every query here returns deterministic values (no arbitrary-row
dropDuplicates, no unordered LIMIT, double sums only over exact-in-fp
integral quantities or via DECIMAL) so the order-insensitive hash
comparison against DuckDB is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.pair_counts import supplier_pair_counts
from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.workload.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: A4 pair-count (ref main_dag.py:265-290 — the 13-minute loop)
# ---------------------------------------------------------------------------

PAIR_COUNTS_ORACLE = """
WITH bridge AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
),
by_year AS (
  SELECT b.l_orderkey, b.l_suppkey, CAST(year(o.o_orderdate) AS INT) AS year
  FROM bridge b JOIN orders o ON o.o_orderkey = b.l_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS cnt,
       a.year AS year,
       a.l_suppkey AS author1,
       b.l_suppkey AS author2
FROM by_year a
JOIN by_year b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
GROUP BY a.year, a.l_suppkey, b.l_suppkey
"""


@register("pair_counts", oracle=PAIR_COUNTS_ORACLE, tags=("agg", "join", "flagship"))
def q_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A4: unordered co-occurrence pair counts per year via bridge
    self-join — replaces the reference's O(pairs × rows) loop
    (main_dag.py:265-290) with two bounded shuffles."""
    return supplier_pair_counts(_t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"))
