#!/usr/bin/env python
"""Storm-gated interleaved A/B between two trees (r12 measurement harness).

Usage: python scripts/ab_gate.py OLD_TREE NEW_TREE PAIRS out.jsonl name [name...]

The r11/r12 sandbox host suffers external IO/CPU storms on minute
timescales (fsync 0.25-12.9 ms/op), so unpaired timings are garbage.
This harness collects PAIRS of runs (old arm then new arm, back-to-back
in the same window) and gates each pair on host quietness:

- launch gate: 4 KB write+fsync probe < 0.65 ms/op (the SCALE.md quiet
  band top used by bench.py) and 1-min loadavg < 2;
- accept gate: the fsync probe RE-READ between the arms and after the
  pair must stay < 0.9 ms/op, else the pair is recorded as rejected.

Each accepted pair appends one JSON line with both arms' per-rep times
(from scripts/time_entries.py, median-of-N noop-sink replication of the
bench measurement shape). Compare MINS across accepted pairs — mins are
the robust statistic under one-sided (storm) noise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def fsync_ms(n: int = 60) -> float:
    d = tempfile.mkdtemp(prefix="ab_gate_io_")
    t0 = time.perf_counter()
    for i in range(n):
        p = os.path.join(d, f"f{i}")
        fd = os.open(p, os.O_CREAT | os.O_WRONLY)
        os.write(fd, b"x" * 4096)
        os.fsync(fd)
        os.close(fd)
    dt = (time.perf_counter() - t0) / n * 1000
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return round(dt, 3)


def loadavg1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def run_arm(tree: str, reps: int, names: list[str]) -> dict[str, list[float]]:
    out = subprocess.run(
        [sys.executable, "scripts/time_entries.py", "-n", str(reps), *names],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    res: dict[str, list[float]] = {}
    for line in out.stdout.splitlines():
        if ": median=" in line and "reps=[" in line:
            name = line.split(":", 1)[0].strip()
            reps_s = line.split("reps=[", 1)[1].split("]", 1)[0]
            res[name] = [float(x) for x in reps_s.split(",")]
    return res


def main() -> None:
    old_tree, new_tree, pairs_s, out_path = sys.argv[1:5]
    names = sys.argv[5:]
    want = int(pairs_s)
    reps = int(os.environ.get("AB_REPS", "3"))
    got = 0
    attempts = 0
    with open(out_path, "a") as fh:
        while got < want and attempts < 40:
            attempts += 1
            io0 = fsync_ms()
            if io0 > 0.65 or loadavg1() > 2.0:
                print(
                    f"gate closed (io {io0} ms/op, load {loadavg1()}); wait",
                    flush=True,
                )
                time.sleep(45)
                continue
            old = run_arm(old_tree, reps, names)
            io1 = fsync_ms()
            new = run_arm(new_tree, reps, names)
            io2 = fsync_ms()
            rec = {
                "ts": round(time.time(), 1),
                "io_ms": [io0, io1, io2],
                "accepted": max(io1, io2) < 0.9,
                "old": old,
                "new": new,
            }
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            got += 1 if rec["accepted"] else 0
            print(
                f"pair {'ACCEPT' if rec['accepted'] else 'reject'} "
                f"io={rec['io_ms']} old={old} new={new}",
                flush=True,
            )
    print(f"done: {got}/{want} accepted in {attempts} attempts", flush=True)


if __name__ == "__main__":
    main()
