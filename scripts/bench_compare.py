"""Diff two bench outputs: per-query deltas, top regressions/improvements.

Accepts either bench.py's one-line JSON or the driver's BENCH_r{N}.json
wrapper (whose `tail` field embeds — possibly truncated — bench output;
truncated heads are recovered pair-by-pair).

Usage: python scripts/bench_compare.py OLD NEW [top_n]

Interpretation guard (memory: bench-vm-variance): this VM swings 2-3x
minute to minute — treat any single-run delta under ~2x as noise and
re-measure before chasing it.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return dict(d["queries"])
    blob = d.get("tail", "")
    try:
        start = blob.index('{"metric"')
        return dict(json.loads(blob[start:].splitlines()[-1])["queries"])
    except (ValueError, json.JSONDecodeError):
        pairs = re.findall(r'"(\w+)": ([\d.]+)', blob)
        skip = {"n", "rc", "cpus", "sf", "n_queries", "value"}
        return {k: float(v) for k, v in pairs if k not in skip}


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    shared = sorted(set(old) & set(new))
    deltas = sorted(((new[k] - old[k], k) for k in shared), reverse=True)
    print(f"shared queries: {len(shared)}  "
          f"(old-only: {len(set(old) - set(new))}, new-only: {len(set(new) - set(old))})")
    print(f"shared totals: {sum(old[k] for k in shared):.1f}s -> "
          f"{sum(new[k] for k in shared):.1f}s")
    print(f"\ntop {top_n} regressions:")
    for d, k in deltas[:top_n]:
        if d <= 0:
            break
        print(f"  {k}: {old[k]} -> {new[k]} (+{d:.2f}s)")
    print(f"\ntop {top_n} improvements:")
    for d, k in reversed(deltas[-top_n:]):
        if d >= 0:
            break
        print(f"  {k}: {old[k]} -> {new[k]} ({d:.2f}s)")
    only_new = sorted(set(new) - set(old), key=lambda k: -new[k])
    if only_new:
        print("\nnew queries (cost):")
        for k in only_new[:top_n]:
            print(f"  {k}: {new[k]}s")


if __name__ == "__main__":
    main()
