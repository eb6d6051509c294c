"""×K probe of the edit-tier purge (round 10): ingest a replicated
corpus through edit_ingest_sink (with the member ledger), then time a
1% right-to-be-forgotten purge via edit_purge_state — the cost shape
claimed in SCALING part 21 (one rename-aside rewrite per state dir plus
an affected-title-bounded pair recompute), measured instead of inferred.

Titles are the documents' first 40 normalized characters — long enough
for the PassJoin tier, short enough that replicas collide into realistic
shared-title groups (which is exactly what makes purge re-election
non-trivial: most deletions hit multi-member groups).

Prints one JSON line:
  {"factor": K, "corpus_rows": N, "batch_rows": M, "deleted_rows": D,
   "build_sec": ..., "ingest_sec": ..., "purge_sec": ...,
   "titles_after": T, "pairs_after": P}
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
    ap.add_argument("--batch-mod", type=int, default=100)
    ap.add_argument("--purge-mod", type=int, default=100,
                    help="doc_id %% mod == 1 is purged (default 1%%)")
    args = ap.parse_args()

    partitions = 32 * max(1, (args.factor + 9) // 10)
    spark = get_spark(app_name="edit_purge_probe", shuffle_partitions=partitions)
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, args.factor, {"docs"})
    docs = spark.read.parquet(f"{big}/documents.parquet").select(
        "doc_id",
        F.substring(F.regexp_replace(F.lower("text"), r"\s+", " "), 1, 40).alias("title"),
    )
    corpus = docs.filter(F.col("doc_id") % args.batch_mod != 0)
    batch = docs.filter(F.col("doc_id") % args.batch_mod == 0)

    root = "/tmp/spark_graft_scale/edit_purge"
    if os.path.exists(root):
        shutil.rmtree(root)
    dirs = tuple(f"{root}/{d}" for d in ("titles", "keys", "pairs", "members"))
    sink = W.edit_ingest_sink(*dirs, hot_key_cap=1_000_000)

    t0 = time.perf_counter()
    sink(corpus, 0)
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    sink(batch, 1)
    ingest_sec = time.perf_counter() - t0

    deleted = docs.filter(F.col("doc_id") % args.purge_mod == 1)
    t0 = time.perf_counter()
    W.edit_purge_state(spark, *dirs, deleted)
    purge_sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "factor": args.factor,
                "corpus_rows": corpus.count(),
                "batch_rows": batch.count(),
                "deleted_rows": deleted.count(),
                "build_sec": round(build_sec, 2),
                "ingest_sec": round(ingest_sec, 2),
                "purge_sec": round(purge_sec, 2),
                "titles_after": spark.read.parquet(dirs[0]).count(),
                "pairs_after": spark.read.parquet(dirs[2]).count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
