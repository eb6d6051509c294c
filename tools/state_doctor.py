"""State doctor: scan a state root for crash leftovers of the engine's
rename-aside rewrite machinery and report (or repair) each one.

Every stateful maintenance path in this repo — compact_stream_dir,
rewrite_stream_dir, the edit keys rebuild, the composite purges — keeps
a complete copy of the state at the primary path or at a sibling at
every instant (plans/layout.py::staged_swap). A crash therefore leaves
one of a small, fully-enumerable set of artifacts, each with one
correct recovery:

| artifact | meaning | repair |
|---|---|---|
| ``d.compact_old`` with ``d`` present | swap completed, aside not yet reclaimed | delete the aside |
| ``d.compact_old`` with ``d`` missing | mid-swap crash — the aside IS the corpus | rename it back to ``d`` |
| ``d.compact_tmp`` with ``d`` or ``d.compact_old`` present | incomplete rewrite output | delete (the original is intact; the rewrite re-runs) |
| ``d.compact_tmp`` alone | inconsistent (no complete copy found) | REPORT ONLY — never auto-repair |
| ``d.purge_intent`` / ``.old`` / ``.tmp`` | a composite purge is in flight | REPORT ONLY — re-run the purge (any deleted set; the pending one merges in) |

``--repair`` applies exactly the first three rows — the same decisions
plans/layout.py::recover_stale_sibling and the rewrites' stale-tmp
prologue make, so running the doctor is equivalent to letting the next
maintenance call recover, just without waiting for one. Purge markers
are never cleared here: only a completed purge may clear its marker
(plans/layout.py::clear_purge_intent), and the ingest sinks refuse to
run while it exists — that refusal is the safety property, not a fault.

Local filesystems only (the scan is an os.walk); on object stores run
the equivalent listing and apply the same table.

Usage: python tools/state_doctor.py ROOT [--repair]
Prints one JSON line per finding and a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

OLD, TMP = ".compact_old", ".compact_tmp"
PURGE = (".purge_intent", ".purge_intent.old", ".purge_intent.tmp")


def diagnose(root: str) -> list[dict]:
    """All findings under ``root`` (see module table), repair-ordered:
    aside restores first, so a tmp next to a restored primary is
    classified against the POST-restore state."""
    findings: list[dict] = []
    seen: set[str] = set()
    for dirpath, dirnames, filenames in os.walk(root):
        for name in list(dirnames) + list(filenames):
            full = os.path.join(dirpath, name)
            if full in seen:
                continue
            if name.endswith(OLD):
                primary = full[: -len(OLD)]
                if os.path.exists(primary):
                    findings.append(
                        {"path": full, "kind": "superseded_aside", "repair": "delete"}
                    )
                else:
                    findings.append(
                        {"path": full, "kind": "midswap_aside", "repair": f"rename to {primary}"}
                    )
                seen.add(full)
            elif name.endswith(TMP):
                primary = full[: -len(TMP)]
                if os.path.exists(primary) or os.path.exists(primary + OLD):
                    findings.append(
                        {"path": full, "kind": "stale_tmp", "repair": "delete"}
                    )
                else:
                    findings.append(
                        {"path": full, "kind": "orphan_tmp_no_copy", "repair": "MANUAL"}
                    )
                seen.add(full)
            elif any(name.endswith(s) for s in PURGE):
                state = full.split(".purge_intent")[0]
                findings.append(
                    {
                        "path": full,
                        "kind": "purge_in_flight",
                        "repair": f"re-run the purge over {state} (pending set merges in)",
                    }
                )
                seen.add(full)
        # don't descend into artifact dirs themselves
        dirnames[:] = [
            d
            for d in dirnames
            if not (d.endswith(OLD) or d.endswith(TMP) or ".purge_intent" in d)
        ]
    return findings


def repair(findings: list[dict]) -> list[dict]:
    """Apply the auto-repairable rows; returns findings annotated with
    ``applied``. Restores run before deletes so a stale tmp next to a
    mid-swap aside is judged against the restored primary."""
    order = {"midswap_aside": 0, "superseded_aside": 1, "stale_tmp": 2}
    for f in sorted(findings, key=lambda f: order.get(f["kind"], 9)):
        if f["kind"] == "midswap_aside":
            os.rename(f["path"], f["path"][: -len(OLD)])
            f["applied"] = True
        elif f["kind"] in ("superseded_aside", "stale_tmp"):
            if os.path.isdir(f["path"]):
                shutil.rmtree(f["path"])
            else:
                os.remove(f["path"])
            f["applied"] = True
        else:
            f["applied"] = False
    return findings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--repair", action="store_true")
    args = ap.parse_args()
    found = diagnose(args.root)
    if args.repair:
        found = repair(found)
    for f in found:
        print(json.dumps(f))
    n_manual = sum(1 for f in found if f["kind"] in ("orphan_tmp_no_copy", "purge_in_flight"))
    print(
        json.dumps(
            {
                "summary": True,
                "findings": len(found),
                "auto_repairable": len(found) - n_manual,
                "repaired": sum(1 for f in found if f.get("applied")),
                "needs_attention": n_manual,
            }
        )
    )
    sys.exit(0 if not n_manual else 1)


if __name__ == "__main__":
    main()
