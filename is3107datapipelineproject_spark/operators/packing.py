"""Training-sequence packing: concat-and-chunk document → sequence
assignment via a DISTRIBUTED prefix sum.

Beyond-reference surface (driver mandate). LLM pretraining consumes the
corpus as fixed-length token sequences: documents are concatenated in a
deterministic order and chunked every ``seq_len`` tokens (the GPT-style
pack). The per-document assignment is therefore a running sum of token
counts in corpus order — and the naive Spark expression,

    sum(tokens) OVER (ORDER BY doc_id)

is a single-partition window: at 100 TB one task sorts and scans the
whole corpus. The scalable plan is the textbook two-level prefix sum,
entirely in DataFrame ops:

1. range-bucket the corpus on the order key — buckets come from the
   KEY DOMAIN (min/max from a 1-row aggregate), not from sampling, so
   the assignment is deterministic and oracle-reproducible;
2. local running sum inside each bucket (window partitioned BY bucket —
   parallel, memory-bounded);
3. bucket totals (tiny: n_buckets rows) get their own running sum with
   a window over buckets — the only global window, over n_buckets rows;
4. join the bucket prefix back (broadcast) and add.

Skewed key domains only unbalance bucket sizes, never correctness; pick
``n_buckets`` ≈ cluster parallelism. Every doc's global start offset =
bucket_prefix + local_cumsum − tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    seq_len: int = 512,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign each document its position in the concat-and-chunk token
    stream, ordered by ``id_col``:

    - ``start_offset``: global token offset where this doc begins;
    - ``seq_id``:       training sequence (chunk of ``seq_len``) the doc
                        starts in — ``start_offset // seq_len``;
    - ``seq_offset``:   offset within that sequence.

    Returns ``(id_col, token_count_col, start_offset, seq_id,
    seq_offset)``. Oracle twin: a single ``sum() OVER (ORDER BY id)``
    window — semantically identical, physically single-partition; this
    implementation is the distributed equivalent.
    """
    bounds = df.agg(
        F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi")
    )
    # Bucket width from the key domain (ceil division); deterministic,
    # no sampling. The scalar bounds attach via a 1-row cross join —
    # Catalyst broadcasts it, nothing reaches the driver.
    w_bucket = (F.col("__hi") - F.col("__lo") + F.lit(n_buckets)) / F.lit(n_buckets)
    t = (
        df.select(id_col, token_count_col)
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "__bucket",
            F.floor((F.col(id_col) - F.col("__lo")) / w_bucket).cast("int"),
        )
        .drop("__lo", "__hi")
    )

    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("__local_cum", F.sum(token_count_col).over(local_w))

    totals = t.groupBy("__bucket").agg(F.max("__local_cum").alias("__total"))
    prefix_w = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(prefix_w), F.lit(0)).alias("__prefix"),
    )

    start = (F.col("__prefix") + F.col("__local_cum") - F.col(token_count_col)).cast("long")
    return (
        t.join(F.broadcast(prefixes), "__bucket")
        .select(
            id_col,
            token_count_col,
            start.alias("start_offset"),
            (start / F.lit(seq_len)).cast("long").alias("seq_id"),
            (start % F.lit(seq_len)).cast("long").alias("seq_offset"),
        )
    )
