"""Data-quality and counts-based-classification workload.

The reference pipeline trusts its inputs implicitly (main_dag.py loads
the XML dump and writes straight to the serving tables); a 100-TB
curation engine cannot — every production run starts with a constraint
battery and ends with a model-shaped audit of what the corpus contains.
These queries register that surface with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators import quality as Q
from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.workload.llm_queries import SQL_TOKS
from is3107datapipelineproject_spark.workload.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_PRIORITIES = "('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')"


@register(
    "dq_constraints",
    oracle=f"""
WITH li AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN NOT COALESCE(l_discount BETWEEN 0.00 AND 0.10, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN NOT COALESCE(l_tax BETWEEN 0.00 AND 0.08, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
         CAST(sum(CASE WHEN COALESCE(l_discount >= 0.05 AND l_quantity > 40, TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS v_rule,
         CAST(count(*) - count(l_shipdate) AS BIGINT) AS v_ship
  FROM lineitem
),
o AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN NOT COALESCE(o_orderpriority IN {_PRIORITIES}, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_prio,
         CAST(sum(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
         CAST(count(*) - count(o_custkey) AS BIGINT) AS v_cust
  FROM orders
),
rows_li AS (
  SELECT 'li_discount_range' AS "check", total, v_disc AS violations FROM li
  UNION ALL SELECT 'li_quantity_range', total, v_qty FROM li
  UNION ALL SELECT 'li_tax_range', total, v_tax FROM li
  UNION ALL SELECT 'li_rule_deep_discount_bulk', total, v_rule FROM li
  UNION ALL SELECT 'li_shipdate_complete', total, v_ship FROM li
),
rows_o AS (
  SELECT 'ord_priority_domain' AS "check", total, v_prio AS violations FROM o
  UNION ALL SELECT 'ord_totalprice_positive', total, v_price FROM o
  UNION ALL SELECT 'ord_custkey_complete', total, v_cust FROM o
),
uq AS (
  SELECT 'uq_orders_orderkey' AS "check",
         CAST(count(*) AS BIGINT) AS total,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
  FROM orders
  UNION ALL
  SELECT 'uq_lineitem_line',
         CAST(count(*) AS BIGINT),
         CAST(count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'uq_lineitem_orderkey',
         CAST(count(*) AS BIGINT),
         CAST(count(*) - count(DISTINCT l_orderkey) AS BIGINT)
  FROM lineitem
),
ri AS (
  SELECT 'ri_lineitem_orders' AS "check",
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS total,
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_orderkey = l.l_orderkey)) AS violations
  UNION ALL
  SELECT 'ri_orders_customer',
         (SELECT CAST(count(*) AS BIGINT) FROM orders),
         (SELECT CAST(count(*) AS BIGINT) FROM orders o3
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o3.o_custkey))
)
SELECT "check", total, violations, violations = 0 AS passed
FROM (SELECT * FROM rows_li UNION ALL SELECT * FROM rows_o
      UNION ALL SELECT * FROM uq UNION ALL SELECT * FROM ri)
ORDER BY "check"
""",
    tags=("quality", "agg"),
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deequ-style constraint battery over the warehouse
    (operators/quality.py): 8 row-level predicates fold into TWO scans
    (one per table) of conditional sums, 3 uniqueness checks are exact
    key-cardinality aggregates, 2 referential checks are left-anti
    probes against broadcast key sets. 13 rows out regardless of corpus
    size — the report a 100-TB ingest gate reads before promoting a
    batch. The deliberate rule check (deep discount on bulk orders)
    fires on real rows so the nonzero-violation path is exercised."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li_rows = Q.row_checks(
        li,
        {
            "li_discount_range": ~F.col("l_discount").between(0.00, 0.10),
            "li_quantity_range": ~F.col("l_quantity").between(1, 50),
            "li_tax_range": ~F.col("l_tax").between(0.00, 0.08),
            "li_rule_deep_discount_bulk": (F.col("l_discount") >= 0.05) & (F.col("l_quantity") > 40),
            "li_shipdate_complete": F.col("l_shipdate").isNull(),
        },
    )
    o_rows = Q.row_checks(
        o,
        {
            "ord_priority_domain": ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
            "ord_totalprice_positive": ~(F.col("o_totalprice") > 0),
            "ord_custkey_complete": F.col("o_custkey").isNull(),
        },
    )
    return Q.constraint_report(
        [
            li_rows,
            o_rows,
            Q.uniqueness_check(o, "uq_orders_orderkey", ["o_orderkey"]),
            Q.uniqueness_check(li, "uq_lineitem_line", ["l_orderkey", "l_linenumber"]),
            Q.uniqueness_check(li, "uq_lineitem_orderkey", ["l_orderkey"]),
            Q.referential_check(li, "ri_lineitem_orders", "l_orderkey", o, "o_orderkey"),
            Q.referential_check(o, "ri_orders_customer", "o_custkey", c, "c_custkey"),
        ]
    )


@register(
    "chi2_terms",
    oracle=f"""
WITH t AS (SELECT doc_id, source AS cls, {SQL_TOKS} AS toks FROM documents),
dt AS (SELECT cls, unnest(list_distinct(toks)) AS term FROM t),
tc AS (SELECT term, cls, CAST(count(*) AS BIGINT) AS a FROM dt GROUP BY 1, 2),
tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS t_all FROM tc GROUP BY 1 HAVING sum(a) >= 5),
ct AS (SELECT source AS cls, CAST(count(*) AS BIGINT) AS n_c FROM documents GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
sc AS (
  SELECT tc.cls, tc.term, tc.a AS df_in_class,
         round(CASE WHEN (CAST(tc.a AS DOUBLE) + (tt.t_all - tc.a))
                         * ((ct.n_c - tc.a) + (nt.n - tt.t_all - ct.n_c + tc.a))
                         * (CAST(tc.a AS DOUBLE) + (ct.n_c - tc.a))
                         * ((tt.t_all - tc.a) + (nt.n - tt.t_all - ct.n_c + tc.a)) > 0
                    THEN CAST(nt.n AS DOUBLE)
                         * (CAST(tc.a AS DOUBLE) * (nt.n - tt.t_all - ct.n_c + tc.a)
                            - CAST(tt.t_all - tc.a AS DOUBLE) * (ct.n_c - tc.a))
                         * (CAST(tc.a AS DOUBLE) * (nt.n - tt.t_all - ct.n_c + tc.a)
                            - CAST(tt.t_all - tc.a AS DOUBLE) * (ct.n_c - tc.a))
                         / ((CAST(tc.a AS DOUBLE) + (tt.t_all - tc.a))
                            * ((ct.n_c - tc.a) + (nt.n - tt.t_all - ct.n_c + tc.a))
                            * (CAST(tc.a AS DOUBLE) + (ct.n_c - tc.a))
                            * ((tt.t_all - tc.a) + (nt.n - tt.t_all - ct.n_c + tc.a)))
               END, 4) AS chi2
  FROM tc JOIN tt USING (term) JOIN ct USING (cls) CROSS JOIN nt
)
SELECT cls AS class, term, df_in_class, chi2,
       CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY cls ORDER BY chi2 DESC NULLS LAST, term) AS rank FROM sc)
WHERE rank <= 15
""",
    tags=("quality", "text", "llm"),
)
def q_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source discriminative vocabulary by 2x2 document-frequency
    chi-square (operators/quality.py::chi2_terms) — the feature-selection
    audit a curation pipeline runs to see WHAT distinguishes each source
    before weighting it. One corpus scan explodes per-doc distinct
    terms; everything downstream is vocabulary-sized with the
    #classes-row totals broadcast."""
    docs = _t(spark, sf_dir, "documents")
    return Q.chi2_terms(docs, "text", "source", "doc_id", top_n=15, min_df=5)


@register(
    "naive_bayes_confusion",
    oracle=f"""
WITH toks AS (SELECT doc_id AS did, lang AS lbl, unnest({SQL_TOKS}) AS term FROM documents),
train_t AS (SELECT * FROM toks WHERE did % 2 = 0),
test_t AS (SELECT * FROM toks WHERE did % 2 = 1),
tl AS (SELECT term, lbl, CAST(count(*) AS BIGINT) AS c_tl FROM train_t GROUP BY 1, 2),
lt AS (SELECT lbl, CAST(sum(c_tl) AS BIGINT) AS t_l FROM tl GROUP BY 1),
vocab AS (SELECT DISTINCT term FROM tl),
vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
grid AS (
  SELECT vocab.term, lt.lbl,
         CAST(round(ln((COALESCE(tl.c_tl, 0) + 1) / CAST(lt.t_l + vs.v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS logp
  FROM vocab CROSS JOIN lt
  LEFT JOIN tl ON tl.term = vocab.term AND tl.lbl = lt.lbl
  CROSS JOIN vs
),
tr_docs AS (SELECT doc_id, lang AS lbl FROM documents WHERE doc_id % 2 = 0),
ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr_docs),
prior AS (
  SELECT lbl, CAST(round(ln(count(*) / CAST(ntr.n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS log_prior
  FROM tr_docs CROSS JOIN ntr GROUP BY lbl, ntr.n
),
scores AS (
  SELECT s.did, s.actual, s.lbl,
         s.s_tok + CAST(prior.log_prior AS DECIMAL(28,6)) AS score
  FROM (
    SELECT test_t.did, test_t.lbl AS actual, grid.lbl,
           sum(CAST(grid.logp AS DECIMAL(28,6))) AS s_tok
    FROM test_t JOIN grid ON grid.term = test_t.term
    GROUP BY 1, 2, 3
  ) s JOIN prior ON prior.lbl = s.lbl
),
pred AS (
  SELECT did, actual, lbl AS predicted
  FROM (SELECT *, row_number() OVER (PARTITION BY did ORDER BY score DESC, lbl) AS rk FROM scores)
  WHERE rk = 1
)
SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("quality", "text", "llm"),
)
def q_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language audit
    (operators/quality.py::naive_bayes_confusion): train on even
    doc_ids, score odd, emit the |langs|^2 confusion matrix. The whole
    classifier is counts — the model is a vocabulary-sized aggregate,
    scoring is a term-keyed join with exact DECIMAL log-prob sums
    (argmax replayable in SQL), nothing ever loops on the driver."""
    docs = _t(spark, sf_dir, "documents")
    return Q.naive_bayes_confusion(docs, "text", "doc_id", "lang")
