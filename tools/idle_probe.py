"""Verified-idle protocol probe for bench anchoring (BASELINE.md).

Prints one JSON line: 1-minute loadavg, a pure-CPU loop time (the
host-speed canary used since round 9 to separate host drift from code
regressions), and a pass/fail verdict against the given thresholds.

Usage:
  python tools/idle_probe.py [--max-load 0.2] [--iters 20000000]

Protocol (BASELINE.md round-10 section): require load < 0.2, record
the loop seconds next to the bench artifact, and when comparing bench
vintages, first ratio the two probes — a uniform shift with no
per-query structure is host drift, not a regression.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def cpu_loop_seconds(iters: int) -> float:
    t = time.monotonic()
    x = 0
    for i in range(iters):
        x += i
    return round(time.monotonic() - t, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-load", type=float, default=0.2)
    ap.add_argument("--iters", type=int, default=20_000_000)
    args = ap.parse_args()

    load1 = os.getloadavg()[0]
    # run the loop twice, keep the faster (first run may absorb a
    # scheduler migration)
    loop = min(cpu_loop_seconds(args.iters), cpu_loop_seconds(args.iters))
    print(
        json.dumps(
            {
                "load1": round(load1, 3),
                "cpu_loop_sec": loop,
                "iters": args.iters,
                "idle": load1 < args.max_load,
            }
        )
    )


if __name__ == "__main__":
    main()
