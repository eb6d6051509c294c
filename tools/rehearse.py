"""Full-surface driver rehearsal: replicate the external driver's
CORRECTNESS gate over EVERY registered query from a clean process.

For each entry in ``__spark_entry__.queries()``: run the Spark query at
sf0.01, run its ``oracle_sql()`` twin in DuckDB on the same parquet
tables, and compare with the same canonicalization the parity tests use
(sorted columns, canonicalized cells, exact multiset equality — stricter
than the driver's order-insensitive value hash).

Run from OUTSIDE the repo (catches relative-path and pickling bugs the
repo-cwd pytest run cannot):

    cd /tmp && python /root/repo/tools/rehearse.py [--only a,b,c]

Prints one line per query (OK/FAIL) and a final summary; exit code 1 on
any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_state_doctor(repo_root: str) -> None:
    """Self-heal crash leftovers before the sweep (README ops section):
    a bench/probe/rehearsal killed mid-write leaves marker-guarded
    warehouse tables or stream state wedged — primary renamed aside,
    stale tmp, staged purge marker — and the NEXT run fails on
    PATH_NOT_FOUND or refuses ingest by design. state_doctor applies
    the same recovery table the maintenance prologues implement;
    report-only findings (in-flight purges, orphan tmps) are printed
    for the operator and never auto-touched."""
    sys.path.insert(0, os.path.join(repo_root, "tools"))
    import json as _json

    import state_doctor as SD

    roots = {
        os.path.join(repo_root, "spark-warehouse"),
        os.path.join(os.getcwd(), "spark-warehouse"),
    }
    for root in sorted(roots):
        if not os.path.isdir(root):
            continue
        for f in SD.repair(SD.diagnose(root)):
            print(f"doctor[{root}]: {_json.dumps(f)}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="", help="comma list of query names")
    ap.add_argument(
        "--no-doctor",
        action="store_true",
        help="skip the pre-sweep state_doctor repair pass",
    )
    args = ap.parse_args()

    if not args.no_doctor and not os.environ.get("SPARK_GRAFT_NO_DOCTOR"):
        run_state_doctor(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from oracle_utils import compare_spark_duckdb

    # plain session, like the driver (no engine confs beyond the entry
    # module's own apply_runtime_confs wrapping)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    names = [n for n in args.only.split(",") if n] or list(qs)
    failures: list[str] = []
    t_start = time.time()
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            if name in osql:
                compare_spark_duckdb(qs[name](spark, SF_DIR), con, osql[name], name)
                status = "OK"
            else:
                n = qs[name](spark, SF_DIR).count()
                status = f"OK(rows-only n={n})"
        except Exception as ex:  # noqa: BLE001 — rehearsal must not stop
            status = f"FAIL {type(ex).__name__}: {str(ex)[:300]}"
            failures.append(name)
        print(f"[{i}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(
        f"\n{len(names) - len(failures)}/{len(names)} green in "
        f"{time.time() - t_start:.0f}s; failures: {failures}"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
