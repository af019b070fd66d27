#!/usr/bin/env python
"""Single-leg window sniper for the committed-bench build row.

The full bench needs one credible window per LEVEL (8c and 32c) before
`index_build_best_credible` can appear, but the host's quiet windows are
often shorter than a whole bench run. This loop fires exactly ONE build
leg (alternating 8/32) whenever the single-proc kernel rate clears the
credible floor; bench._run_leg records the leg's own pre-leg mini-rate
into build_legs_log.jsonl, so each capture is self-evidencing and
bench.py's _best_credible_pair picks the best credible 8/32 pair across
every run on record.

Coordinates with tools/quiet_probe.py via the shared /tmp flag.

Usage: python tools/leg_sniper.py [floor] [max_captures]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FLAG = "/tmp/quietbench.running"


def main() -> None:
    import bench

    floor = float(sys.argv[1]) if len(sys.argv) > 1 else 1.9e6
    max_caps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.makedirs(bench.WORK_DIR, exist_ok=True)
    cores_cycle = (8, 32)
    i = caps = 0
    while caps < max_caps:
        if os.path.exists(FLAG):
            time.sleep(60)
            continue
        mini = bench._kernel_throughput(1)
        if mini < floor:
            time.sleep(90)
            continue
        open(FLAG, "w").close()
        try:
            r = bench._run_leg(cores_cycle[i % 2])
        finally:
            try:
                os.unlink(FLAG)
            except OSError:
                pass
        i += 1
        caps += 1
        print(json.dumps({"leg": r["cores"],
                          "build_sec": round(r["build_sec"], 2),
                          "mini_gate": round(mini, 1),
                          "mini_pre_leg": r["mini_rate_before"]}), flush=True)
        time.sleep(120)


if __name__ == "__main__":
    main()
