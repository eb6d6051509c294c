"""One-off audit: list every registered query whose optimized plan
contains an unpartitioned Window node (single-task sort risk), with the
window's order expressions. Feeds the plan-lint allowlist."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from is3107datapipelineproject_spark.session import get_spark  # noqa: E402
from is3107datapipelineproject_spark.workload import registry  # noqa: E402

SF = "/root/testdata/sf0.001"


def unpartitioned_windows(df) -> list[str]:
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    out = []
    for n in nodes:
        cls = n.get("class", "")
        if cls.endswith(".Window") and not n.get("partitionSpec"):
            order = json.dumps(n.get("orderSpec", []))[:120]
            out.append(order)
    return out


def main() -> None:
    spark = get_spark()
    hits = {}
    names = sorted(registry.queries())
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    for i, name in enumerate(names):
        if only and name not in only:
            continue
        fn = registry.queries()[name]
        try:
            w = unpartitioned_windows(fn(spark, SF))
        except Exception as e:  # noqa: BLE001
            w = [f"ERR {e}"]
        if w:
            hits[name] = len(w)
            print(f"HIT {name} n={len(w)}", flush=True)
    print(json.dumps(hits))


if __name__ == "__main__":
    main()
