"""Incremental snapshot merge — SURVEY.md §2.8 (ST2/ST4).

The reference maintains three CSV caches per run (`main_dag.py:242-262`):
``new`` = fetched ∖ known, ``to_be_deleted`` = known ∖ fetched,
``unique`` = (known ∖ deleted) ∪ new — with insert-only upsert semantics
("assumed publication details won't change", docx §Limitations): a
re-seen key keeps the OLD row.

Spark-first this is three anti/semi joins over one shuffle key. At
cluster scale the unique table is partitioned (``partitionBy(year,
category)``) and the merge is a Delta ``MERGE INTO`` with insert +
delete clauses; the plain-parquet expression below has identical
semantics and is what the engine tests.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.relational import deleted_rows, new_rows, union_all


@dataclass
class MergeResult:
    new: DataFrame          # rows to insert (parsed keys unseen before)
    deleted: DataFrame      # old rows whose key disappeared this snapshot
    next_unique: DataFrame  # the refreshed cache


def incremental_merge(known: DataFrame, parsed: DataFrame, key: str | Sequence[str]) -> MergeResult:
    """Compute the reference's cache-refresh contract in one pass.

    Insert-only upsert (ST4): for keys present on both sides the OLD row
    wins — ``next_unique = (known ⋉ parsed) ∪ (parsed ▷ known)`` where ⋉
    is left-semi and ▷ is left-anti on ``key``.

    Property invariants (tested): ``new ∩ known = ∅`` (by key),
    ``next_unique = (known ∖ deleted) ∪ new``, and a no-change snapshot
    yields empty ``new`` and ``deleted`` (the reference's header-only
    cache files, `new_data_year_and_category.csv:1`).
    """
    keys = [key] if isinstance(key, str) else list(key)
    new = new_rows(parsed, known, keys)
    deleted = deleted_rows(known, parsed, keys)
    survivors = known.join(parsed.select(*keys), keys, "left_semi")
    next_unique = union_all(survivors, new.select(*known.columns))
    return MergeResult(new=new, deleted=deleted, next_unique=next_unique)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus version diff — the dataset-release counterpart of the
    reference's new/deleted CDC (ref main_dag.py:242-262), extended with
    CONTENT-change detection: every id on either side is classified

    - ``added``:     id only in ``new``
    - ``removed``:   id only in ``old``
    - ``changed``:   id on both sides, normalized-content fingerprint
                     differs (edits invisible to key-based CDC)
    - ``unchanged``: id on both sides, same fingerprint

    Returns ``(id_col, status)``. Plan: each side reduces to (id,
    fingerprint) narrowly, then one co-partitioned full-outer join on
    the id — the scan is the cost; at 100 TB both sides would read
    PERSISTED fingerprint manifests (the same persist-don't-recompute
    shape as the dedup signature table)."""
    from is3107datapipelineproject_spark.operators.dedup import exact_fingerprint

    o = old.select(F.col(id_col), exact_fingerprint(text_col).alias("__ofp"))
    n = new.select(F.col(id_col), exact_fingerprint(text_col).alias("__nfp"))
    joined = o.withColumnRenamed(id_col, "__oid").join(
        n.withColumnRenamed(id_col, "__nid"),
        F.col("__oid") == F.col("__nid"),
        "full_outer",
    )
    status = (
        F.when(F.col("__oid").isNull(), F.lit("added"))
        .when(F.col("__nid").isNull(), F.lit("removed"))
        .when(F.col("__ofp") != F.col("__nfp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("__oid"), F.col("__nid")).alias(id_col),
        status.alias("status"),
    )
