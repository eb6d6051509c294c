"""Scale probe: measure how the engine's novel operators scale with
corpus size, on a replicated corpus the box can still hold.

Builds ``/tmp/spark_graft_scale/x{K}/{documents,embeddings,events}.parquet``
by replicating the sf0.1 tables K times with disjoint id/user spaces:

- ``documents``: each replica's text gets a replica-unique 4-token
  prefix AND suffix, pushing cross-replica Jaccard to ~0.7 (< the 0.8
  near-dup threshold) so planted near-dup structure stays *within*
  replicas and the true pair count scales ~K, not K².
- ``embeddings``: ids offset per replica; the query set (vec_id < 50)
  stays fixed so what is measured is corpus-scan growth.
- ``events``: user ids offset per replica — per-user event density is
  constant, so windows/sessions/as-of state per key stays fixed while
  key count grows K×.

Run:  python tools/scale_probe.py [--factor 10] [--ops a,b,c]
Prints one JSON line per op:
  {"op": ..., "x1_sec": ..., "xK_sec": ..., "ratio": ..., "x1_rows": ..., "xK_rows": ...}

Interpretation: ratio ≈ K → linear (scan-bound, the design target for
dedup/rollup/as-of); ratio < K → sublinear constants amortizing;
ratio >> K → a super-linear stage (quadratic candidate generation, a
fact-side broadcast, a driver collect) that must be found and fixed
BEFORE believing the operator survives 100 TB.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.session import get_spark
from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.workload import registry

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/spark_graft_scale"

DEFAULT_OPS = [
    "exact_dedup",
    "minhash_neardup",
    "corpus_dedup_keep",
    "text_quality",
    "cosine_topk",
    "ivf_topk",
    "asof_join",
    "interval_join",
    "time_rollup",
    "events_session_window",
    "hash_split",
    "pair_counts",
    "salted_join_agg",
    "shipping_priority",
    "local_supplier_volume",
    "order_priority_exists",
    "large_order_customers",
    "top_supplier_revenue",
    "dormant_rich_customers",
    "curation_pipeline",
    "tfidf_top_terms",
    "events_dedup_keys",
    "click_purchase_attribution",
    # round 9: incremental/lifecycle surfaces
    "incremental_neardup_clusters",
    "cluster_retract",
    "ann_index_delete",
    "edge_table_retract",
    "neardup_clusters_from_state",
]


def build(spark, k: int, tables: set[str] | None = None) -> str:
    """Replicate the base corpus K×. ``tables`` ∈ {docs, emb, events,
    star} limits the build — an x100 docs-only sweep should not pay for
    100× lineitem."""
    tables = tables or {"docs", "emb", "events", "star"}
    out = f"{ROOT}/x{k}"
    os.makedirs(out, exist_ok=True)

    def _done(name: str) -> bool:
        return os.path.exists(f"{out}/{name}.parquet")

    if "docs" in tables and not _done("documents"):
        _build_docs(spark, out, k)
    if "emb" in tables and not _done("embeddings"):
        _build_emb(spark, out, k)
    if "events" in tables and not _done("events"):
        _build_events(spark, out, k)
    if "star" in tables and not _done("lineitem"):
        _build_star(spark, out, k)
    return out


def _build_docs(spark, out: str, k: int) -> None:
    docs = load_table(spark, BASE, "documents")
    reps = []
    for i in range(k):
        # Replica salt must scale with document LENGTH in DISTINCT
        # shingles: a fixed few-token salt (or a repeated one — repeats
        # collapse to O(1) distinct k-grams) leaves long replicas above
        # the 0.8 Jaccard threshold, planting C(K,2) cross-replica
        # near-dup pairs per leaky doc. Position-distinct salt tokens
        # (~1 per 4 original tokens, each side) keep cross-replica
        # Jaccard ≈ 0.65 at every length.
        n_rep = F.greatest(F.lit(4), (F.col("n_chars") / F.lit(20)).cast("int"))
        def _salt(tag: str):
            return F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), n_rep),
                    lambda p: F.concat(F.lit(f"{tag}{i}x"), p.cast("string")),
                ),
            )
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(_salt("ra"), F.lit(" "), F.col("text"), F.lit(" "), _salt("rz")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    _union_write(reps, f"{out}/documents.parquet")


def _build_docs_blockgrowth(spark, out: str, k: int) -> None:
    """documents replicated k× with UNCHANGED source values but a
    per-replica token namespace (every token prefixed ``r<i>x``): the
    blocking key's blocks grow k× while cross-replica token-set Jaccard
    is exactly 0, so TRUE within-block pairs grow k×, never k². This is
    the corpus that distinguishes candidate-bound blocked dedup
    (``blocked_jaccard_pairs``' PPJoin-within-block: per-(block, token)
    posting lists never mix replicas, cost ~ true pairs) from a raw
    within-block self-join (cost ~ block², ×k² here) — the standard
    ``_build_docs`` salt corpus cannot make that distinction at τ=0.5,
    because its ~0.65 cross-replica Jaccard sits ABOVE the ngram
    threshold and the true output itself goes k²."""
    docs = load_table(spark, BASE, "documents")
    reps = []
    for i in range(k):
        ns = F.array_join(
            F.transform(
                F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " "),
                lambda t: F.concat(F.lit(f"r{i}x"), t),
            ),
            " ",
        )
        reps.append(
            docs.select(
                # replica offset is a MULTIPLE OF 7 so the incremental
                # probe's doc_id % 7 batch split selects the SAME base
                # docs in every replica — true new×old pairs then grow
                # exactly ×K, making the SCALING claim auditable
                (F.col("doc_id") + F.lit(i * 10_000_004)).alias("doc_id"),
                ns.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    _union_write(reps, f"{out}/documents.parquet")


def _build_emb(spark, out: str, k: int) -> None:
    emb = load_table(spark, BASE, "embeddings")
    _union_write(
        [
            emb.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(k)
        ],
        f"{out}/embeddings.parquet",
    )


def _build_events(spark, out: str, k: int) -> None:
    ev = load_table(spark, BASE, "events")
    _union_write(
        [
            ev.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(k)
        ],
        f"{out}/events.parquet",
    )


def _build_star(spark, out: str, k: int) -> None:
    # Star-schema facts: offset every key column jointly so each replica
    # is a self-contained sub-universe — per-replica join fan-outs and
    # group sizes are IDENTICAL to 1×, so output and work scale K× and
    # any super-linear stage shows up as ratio >> K. Dimension tables
    # (nation/region) are shared, as they would be at 100 TB.
    _replicate_keyed(spark, out, k, "orders", {"o_orderkey": 100_000_000, "o_custkey": 10_000_000})
    _replicate_keyed(
        spark,
        out,
        k,
        "lineitem",
        {"l_orderkey": 100_000_000, "l_partkey": 10_000_000, "l_suppkey": 10_000_000},
    )
    _replicate_keyed(spark, out, k, "customer", {"c_custkey": 10_000_000})
    _replicate_keyed(spark, out, k, "supplier", {"s_suppkey": 10_000_000})
    _replicate_keyed(spark, out, k, "part", {"p_partkey": 10_000_000})
    for dim in ("nation", "region"):
        load_table(spark, BASE, dim).write.mode("overwrite").parquet(f"{out}/{dim}.parquet")


def _replicate_keyed(spark, out: str, k: int, table: str, key_steps: dict[str, int]) -> None:
    df = load_table(spark, BASE, table)
    reps = []
    for i in range(k):
        rep = df
        for col, step in key_steps.items():
            rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
        reps.append(rep)
    _union_write(reps, f"{out}/{table}.parquet")


def _union_write(frames, path):
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    df.write.mode("overwrite").parquet(path)


def time_funnel_stream(spark, sf_dir: str) -> tuple[float, int]:
    """Streaming sweep for the stateful funnel: drain the whole events
    directory through applyInPandasWithState (availableNow) and report
    wall time + state cardinality (distinct users). Per-user state is a
    fixed few dozen bytes, so time should scale with event volume and
    state memory with users — never superlinearly."""
    import tempfile

    from is3107datapipelineproject_spark.streaming import windows as W

    events_dir = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events_dir).schema
    raw = spark.readStream.schema(schema).parquet(events_dir)
    src = W.normalize_event_time(raw).select("user_id", "ts_ns", "event_type")
    t0 = time.perf_counter()
    q = (
        W.funnel_state(src)
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="funnel_ckpt_"))
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    users = spark.read.parquet(events_dir).select("user_id").distinct().count()
    return dt, users


def time_blocked_ingest(spark, sf_dir: str) -> tuple[float, int]:
    """Streaming blocked-tier ingest sweep: fold the corpus slice
    (doc_id % 7 != 0) as batch 0, then time the ARRIVING batch
    (doc_id % 7 == 0) through blocked_ingest_sink — the measured span
    is one trigger's full cost (fixed-order postings/sets encode,
    loud-fail guards, broadcast candidate join against the persisted
    corpus postings, exact verify, three batch=1 writes). Returns
    (ingest_sec, pairs_found). On the blockgrowth corpus true pairs
    must grow exactly ×K while ingest time stays far under ×K (the
    corpus never reshuffles — it streams through one map-side join)."""
    import shutil as _shutil

    from is3107datapipelineproject_spark.streaming import windows as W

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    root = f"{ROOT}/blocked_ingest"
    _shutil.rmtree(root, ignore_errors=True)
    dirs = (f"{root}/postings", f"{root}/sets", f"{root}/pairs")
    sink = W.blocked_ingest_sink(*dirs, threshold=0.5)
    t0 = time.perf_counter()
    sink(corpus, 0)
    build_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    sink(batch, 1)
    ingest_sec = time.perf_counter() - t0
    pairs = spark.read.parquet(dirs[2]).count()
    print(json.dumps({"op_detail": "blocked_ingest", "sf_dir": sf_dir,
                      "corpus_build_sec": round(build_sec, 2)}))
    return ingest_sec, pairs


def time_op(spark, fn, sf_dir: str) -> tuple[float, int]:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt, df.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--ops", type=str, default=",".join(DEFAULT_OPS))
    ap.add_argument("--tables", type=str, default="docs,emb,events,star",
                    help="comma subset of docs,emb,events,star to replicate")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle partitions; default scales with --factor "
                         "(a fixed 32 at x100 puts ~2M rows in each aggregate "
                         "task — partition count must grow with the data, "
                         "exactly as a cluster deployment would size it)")
    args = ap.parse_args()

    if args.rebuild and os.path.exists(ROOT):
        shutil.rmtree(ROOT)

    partitions = args.partitions or 32 * max(1, (args.factor + 9) // 10)
    spark = get_spark(app_name="scale_probe", shuffle_partitions=partitions)
    spark.sparkContext.setLogLevel("ERROR")
    ops_list = [o for o in args.ops.split(",") if o]
    # blockgrowth-corpus ops never touch the standard salt replicas —
    # don't spend the (large) replication build when only they run
    bg_only = {"blocked_ingest_blockgrowth", "ngram_blockgrowth",
               "incremental_ngram_blockgrowth"}
    big = None if set(ops_list) <= bg_only else build(
        spark, args.factor, set(args.tables.split(","))
    )
    qs = registry.queries()

    for op in ops_list:
        if op == "funnel_state":
            # stream op: x1 side also needs a directory-of-parts layout
            small = build(spark, 1, {"events"})
            time_funnel_stream(spark, small)  # warm-up: worker forks, state store init
            t1, r1 = time_funnel_stream(spark, small)
            tk, rk = time_funnel_stream(spark, big)
        elif op == "blocked_ingest_blockgrowth":
            # streaming twin of incremental_blocked_jaccard on the same
            # K×-growing-blocks corpus (true pairs ×K, never ×K²)
            bg = f"{ROOT}/x{args.factor}_blockgrowth"
            os.makedirs(bg, exist_ok=True)
            if not os.path.exists(f"{bg}/documents.parquet"):
                _build_docs_blockgrowth(spark, bg, args.factor)
            t1, r1 = time_blocked_ingest(spark, BASE)
            tk, rk = time_blocked_ingest(spark, bg)
        elif op in ("ngram_blockgrowth", "incremental_ngram_blockgrowth"):
            # blocked tier under k×-GROWING blocks with k× (not k²)
            # true pairs — see _build_docs_blockgrowth. The incremental
            # variant probes the batch×corpus split on the same corpus
            # (the standard salt corpus is unusable at τ=0.5: its ~0.65
            # cross-replica Jaccard sits above the threshold, so true
            # output itself would grow k²).
            bg = f"{ROOT}/x{args.factor}_blockgrowth"
            os.makedirs(bg, exist_ok=True)
            if not os.path.exists(f"{bg}/documents.parquet"):
                _build_docs_blockgrowth(spark, bg, args.factor)
            fn = qs[
                "ngram_jaccard" if op == "ngram_blockgrowth" else "incremental_blocked_jaccard"
            ]
            t1, r1 = time_op(spark, fn, BASE)
            tk, rk = time_op(spark, fn, bg)
        else:
            fn = qs.get(op)
            if fn is None:
                print(json.dumps({"op": op, "error": "not registered"}))
                continue
            t1, r1 = time_op(spark, fn, BASE)
            tk, rk = time_op(spark, fn, big)
        print(
            json.dumps(
                {
                    "op": op,
                    "factor": args.factor,
                    "x1_sec": round(t1, 2),
                    "xK_sec": round(tk, 2),
                    "ratio": round(tk / t1, 2) if t1 > 0 else None,
                    "x1_rows": r1,
                    "xK_rows": rk,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
