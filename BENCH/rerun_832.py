"""One-pair patch run: redo the 8->32 scaling pair (both write modes)
with more trials in a single window, plus that window's own host-ceiling
controls, and print the JSON. Used when the full run_scaling pass had a
pair's trials straddle an ambient-load wave (this box's 1-min loadavg
swings 0-20 uncontrolled; see BENCH/BASELINE.md methodology) - the
per-level min-of-K is only honest when the K trials of BOTH levels see
comparable windows, so a wrecked pair is re-measured whole, never
spliced level-by-level across windows."""

import json
import sys

from run_scaling import attach_ceiling, bench_pair, cpu_ceiling

if __name__ == "__main__":
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    p_mor = bench_pair(8, 32, events, trials, write_mode="mor")
    p_cow = bench_pair(8, 32, events, trials, write_mode="cow")
    ceil = cpu_ceiling(8, 32)
    attach_ceiling(p_mor, ceil)
    attach_ceiling(p_cow, ceil)
    print(json.dumps({"p832_mor": p_mor, "p832": p_cow}))
