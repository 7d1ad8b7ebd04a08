"""Per-query bench regression guard.

Compares the current `bench.py` output (or a saved BENCH_r{N}.json) against
a previous round's BENCH_r{N}.json and flags any query slower than the
allowed ratio (default 1.3x, VERDICT round-1 item 10).

Usage:
    python bench.py > /tmp/bench_now.json            # or use a BENCH_r file
    python tools/bench_compare.py BENCH_r01.json /tmp/bench_now.json [ratio]

Exit 1 if any query regressed beyond the ratio. Both driver-format files
(`{"parsed": {...}}`) and raw bench.py lines are accepted.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # driver BENCH_r{N}.json wraps the bench line under "parsed"; bench.py
    # prints the line bare (possibly after progress noise)
    try:
        d = json.loads(text)
        if "parsed" in d:
            return d["parsed"]
        if "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    for line in reversed(text.strip().splitlines()):
        if line.startswith("{"):
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no bench record found in {path}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base, now = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    failures = []
    rows = []
    for name, t_new in sorted(now["queries"].items()):
        t_old = base["queries"].get(name)
        if t_old is None:
            rows.append((name, None, t_new, "NEW"))
            continue
        r = t_new / t_old if t_old else float("inf")
        status = "OK" if r <= ratio else "REGRESSED"
        if status == "REGRESSED":
            failures.append(name)
        rows.append((name, t_old, t_new, f"{r:.2f}x {status}"))
    w = max(len(n) for n, *_ in rows)
    for name, t_old, t_new, status in rows:
        old = f"{t_old:7.3f}s" if t_old is not None else "      - "
        print(f"{name:<{w}}  {old} -> {t_new:7.3f}s  {status}")
    for metric in ("cdc_throughput_eps", "cdc_throughput_eps_mor"):
        if metric in base and metric in now:
            print(
                f"{metric:<{w}}  {base[metric]:>10,.0f} -> {now[metric]:>10,.0f} eps"
                f"  ({now[metric] / base[metric]:.2f}x)"
            )
    if failures:
        print(f"\nREGRESSIONS (> {ratio}x): {', '.join(failures)}")
        return 1
    print(f"\nno regressions beyond {ratio}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
