#!/usr/bin/env python
"""Interleaved old/new A/B under a PERSISTENT io storm: min-of-many-reps.

Usage: python scripts/ab_minloop.py OLD NEW ROUNDS out.jsonl name [name...]

When `ab_gate.py`'s quiet-window gate cannot open at all (the r11/r12
host storms last hours, with sub-minute quiet gaps), the honest fallback
is volume: run the two arms back-to-back for ROUNDS rounds regardless of
host state, record the fsync probe around every arm, and compare each
entry's MIN across all reps per tree. The storm is one-sided noise —
it only ever ADDS time — so with enough interleaved samples the per-tree
min converges on the quiet-window value; the interleaving guarantees both
arms sample the same storm distribution. Every rep and probe is recorded,
nothing is filtered.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_gate import fsync_ms, loadavg1, run_arm  # noqa: E402


def main() -> None:
    old_tree, new_tree, rounds_s, out_path = sys.argv[1:5]
    names = sys.argv[5:]
    rounds = int(rounds_s)
    reps = int(os.environ.get("AB_REPS", "3"))
    mins: dict[str, dict[str, float]] = {"old": {}, "new": {}}
    with open(out_path, "a") as fh:
        for r in range(rounds):
            io0 = fsync_ms()
            old = run_arm(old_tree, reps, names)
            io1 = fsync_ms()
            new = run_arm(new_tree, reps, names)
            io2 = fsync_ms()
            rec = {
                "ts": round(time.time(), 1),
                "round": r,
                "io_ms": [io0, io1, io2],
                "load1": loadavg1(),
                "old": old,
                "new": new,
            }
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            for arm, res in (("old", old), ("new", new)):
                for k, v in res.items():
                    cur = mins[arm].get(k)
                    m = min(v)
                    mins[arm][k] = m if cur is None else min(cur, m)
            print(f"round {r} io={rec['io_ms']}", flush=True)
            for k in names:
                o, n = mins["old"].get(k), mins["new"].get(k)
                if o and n:
                    print(f"  {k}: min old {o:.3f} new {n:.3f} "
                          f"({o / n:.2f}x)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
