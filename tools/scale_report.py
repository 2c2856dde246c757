"""Per-query scaling slopes across two bench JSON files.

Usage: python tools/scale_report.py BENCH_A.json BENCH_B.json [--top N]

Prints queries sorted by time ratio (B/A) with the catalog total, for
extending SCALE.md's measured-scaling table after a gen_sf.py run.
Sub-100ms rows at the smaller SF are noise-dominated and marked ~.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    with open(args.a) as f:
        a = json.load(f)
    with open(args.b) as f:
        b = json.load(f)
    qa, qb = a["queries"], b["queries"]
    shared = [k for k in qa if k in qb and qa[k] > 0 and qb[k] > 0]
    rows = sorted(
        ((qb[k] / qa[k], qa[k], qb[k], k) for k in shared), reverse=True
    )
    print(f"total: {a['value']:.1f}s (sf={a.get('sf')}) -> "
          f"{b['value']:.1f}s (sf={b.get('sf')}) = {b['value']/a['value']:.2f}x "
          f"over {len(shared)} shared queries")
    print(f"{'ratio':>7}  {'A sec':>8}  {'B sec':>8}  query")
    for r, ta, tb, k in rows[: args.top]:
        noise = "~" if ta < 0.1 else " "
        print(f"{r:7.2f}{noise} {ta:8.3f}  {tb:8.3f}  {k}")


if __name__ == "__main__":
    main()
