"""Per-query profiler for the optimization rounds (guide §1).

Breaks the bench's timed span into its two components — driver-side
plan construction (the ``fn(spark, sf_dir)`` call: Python DSL build,
any eager driver jobs like approxQuantile probes or guard collects)
and distributed execution (the noop-sink write) — and optionally dumps
``.explain("formatted")`` for plan evidence. Uses the exact bench
methodology (warm-up run, then a timed fresh-plan run) so numbers are
comparable with BENCH_DETAIL.json rows.

Usage:
    python tools/qprof.py q1,q2,...            # profile named queries
    python tools/qprof.py q1 --explain DIR     # also write DIR/q1.txt
    python tools/qprof.py --top N              # slowest N from BENCH_DETAIL.json
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _explain_str(df) -> str:
    buf = io.StringIO()
    stdout = sys.stdout
    try:
        sys.stdout = buf
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="?", default="", help="comma-separated query names")
    ap.add_argument("--top", type=int, default=0, help="profile slowest N per BENCH_DETAIL.json")
    ap.add_argument("--explain", default="", help="directory to write explain('formatted') dumps")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1, help="timed repetitions (min reported)")
    args = ap.parse_args()

    names = [n for n in args.names.split(",") if n]
    if args.top:
        with open(os.path.join(HERE, "BENCH_DETAIL.json")) as f:
            det = json.load(f)
        names += [
            k
            for k, _ in sorted(det["queries"].items(), key=lambda kv: -kv[1])[: args.top]
            if k not in names
        ]

    from is3107datapipelineproject_spark.session import get_spark
    from is3107datapipelineproject_spark.workload import registry

    spark = get_spark(app_name="qprof")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    qs["agg_count_by_year"](spark, args.sf).write.format("noop").mode("overwrite").save()

    print(f"{'query':35s} {'plan_s':>7s} {'exec_s':>7s} {'timed_s':>8s}")
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qprof warmup: {name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"qprof timed: {name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t_plan = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            rec = (t_plan + t_exec, t_plan, t_exec)
            if best is None or rec[0] < best[0]:
                best = rec
        total, t_plan, t_exec = best
        print(f"{name:35s} {t_plan:7.3f} {t_exec:7.3f} {total:8.3f}", flush=True)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(_explain_str(fn(spark, args.sf)))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
