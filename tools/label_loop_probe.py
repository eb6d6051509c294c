"""End-to-end ×K probe of the STREAMING label-maintenance loop
(round-10 verdict item 5): the round-9 SCALING rows measured the
incremental-CC pieces through the batch operators; this probe drives
the actual maintained-state loop — one-time corpus build through
cluster_ingest_sink, then per-trigger ingest of a small batch against
the PERSISTED band/label state, label-log compaction, and the
steady-state read — so the amortized claim for the newest dedup family
is measured, not inferred.

The sink callables are invoked directly (the same functions
foreachBatch triggers); Structured Streaming's trigger scheduling
overhead is out of scope — the probe measures the state-maintenance
work itself.

Prints one JSON line:
  {"factor": K, "corpus_rows": N, "batch_rows": M,
   "build_sec": ..., "ingest_sec": ..., "compact_sec": ...,
   "read_sec": ..., "labels": L}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from is3107datapipelineproject_spark.session import get_spark  # noqa: E402
from is3107datapipelineproject_spark.streaming import windows as W  # noqa: E402
from tools.scale_probe import build  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--batch-mod", type=int, default=100,
                    help="doc_id %% mod == 0 plays the arriving batch (default 1%%)")
    args = ap.parse_args()

    partitions = 32 * max(1, (args.factor + 9) // 10)
    spark = get_spark(app_name="label_loop_probe", shuffle_partitions=partitions)
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, args.factor, {"docs"})
    docs = spark.read.parquet(f"{big}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % args.batch_mod != 0)
    batch = docs.filter(F.col("doc_id") % args.batch_mod == 0)

    root = "/tmp/spark_graft_scale/label_loop"
    if os.path.exists(root):
        shutil.rmtree(root)
    sig_dir = f"{root}/sigs"
    labels_dir = f"{root}/labels"
    sink = W.cluster_ingest_sink(sig_dir, labels_dir)

    t0 = time.perf_counter()
    sink(corpus, 0)  # one-time: the corpus enters as the first batch
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    sink(batch, 1)  # the loop cost: batch bands + new×old vs persisted state
    ingest_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    files_before, files_after = W.cluster_compact_state(spark, labels_dir)
    compact_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels = W.cluster_labels_read(spark, labels_dir).count()
    read_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "factor": args.factor,
                "corpus_rows": corpus.count(),
                "batch_rows": batch.count(),
                "build_sec": round(build_sec, 2),
                "ingest_sec": round(ingest_sec, 2),
                "compact_sec": round(compact_sec, 2),
                "compact_files": [files_before, files_after],
                "read_sec": round(read_sec, 2),
                "labels": labels,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
