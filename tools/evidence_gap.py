"""Evidence-coverage diff: which registered queries have never had a
green driver CORRECTNESS row, and is the rotation window big enough?

The driver samples the FIRST 50 entries of the ordered registry
(workload/registry.py::_EVIDENCE_PRIORITY) each round and records
per-query results in CORRECTNESS_r{N}.json. This tool computes, from
the repo state alone:

- never-sampled  = registered − union of all CORRECTNESS_r*.json keys
- stale-window   = never-sampled queries NOT in the first-50 window
  (would stay unsampled next round — the round-5/6 failure mode)
- red rows       = any sampled query whose LATEST row is not fully green

Run it at the start of a round to build the rotation, and at the end to
prove the standing rule held (a round may add at most
50 − #backlog − #edited new queries).

With ``--rotation [edited,names,...]`` it instead emits the AGE-ROTATED
window (the round-8 standing rule): queries named as edited lead, then
every query ordered by last-green driver round ASCENDING (ties
alphabetical), truncated to 50 — paste-ready for
registry._EVIDENCE_PRIORITY. It also reports the per-round age
histogram so the "no green row older than N rounds" freshness claim is
checkable at a glance.

Usage: python tools/evidence_gap.py [repo_root] [--rotation q1,q2,...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main() -> None:
    args = sys.argv[1:]
    edited: list[str] = []
    rotation = False
    if "--rotation" in args:
        i = args.index("--rotation")
        rotation = True
        if i + 1 < len(args):
            edited = [q for q in args[i + 1].split(",") if q]
            args = args[:i] + args[i + 2 :]
        else:
            args = args[:i]
    root = args[0] if args else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from is3107datapipelineproject_spark.workload import registry

    ordered = list(registry.queries())
    window = ordered[:50]

    sampled: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            prev = sampled.get(name)
            if prev is None or rnd >= prev[0]:
                sampled[name] = (rnd, row)

    never = [n for n in ordered if n not in sampled]
    stale = [n for n in never if n not in window]
    red = {
        n: row
        for n, (_, row) in sampled.items()
        if not (
            row.get("rows_match")
            and row.get("schema_match") is not False
            and row.get("hash_match") is not False  # content mismatch IS red
            and row.get("err") is None
        )
    }

    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("err") is None:
                last_green[name] = max(last_green.get(name, 0), rnd)

    if rotation:
        unknown = [n for n in edited if n not in ordered]
        if unknown:
            raise SystemExit(
                f"--rotation: not registered: {unknown} — a misspelled edited "
                "name would silently shrink the 50-slot window"
            )
        rest = sorted(
            (n for n in ordered if n not in edited),
            key=lambda n: (last_green.get(n, 0), n),
        )
        window50 = edited + rest[: 50 - len(edited)]
        hist: dict[int, int] = {}
        for n in ordered:
            hist[last_green.get(n, 0)] = hist.get(last_green.get(n, 0), 0) + 1
        print(json.dumps({
            "age_histogram_by_last_green_round": {str(k): v for k, v in sorted(hist.items())},
            "rotated_window": window50,
        }, indent=2))
        return

    print(json.dumps({
        "registered": len(ordered),
        "driver_sampled_ever": len([n for n in ordered if n in sampled]),
        "never_sampled": never,
        "never_sampled_count": len(never),
        "never_sampled_outside_window": stale,
        "latest_red": red,
        "window_head": window[: len(never) + 5],
    }, indent=2))


if __name__ == "__main__":
    main()
