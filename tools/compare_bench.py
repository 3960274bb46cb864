"""Round-over-round bench regression check.

Compares a BENCH_r{N}.json (or fresh `python bench.py` output) against:
1. the previous round's BENCH_r{N-1}.json per query (drift ratio), and
2. BASELINE.md's same-protocol rows for the externally-comparable
   queries (q1/q3/tumbling — see tools/measure_baseline.py).

Flags queries whose warm time regressed beyond the noise band (default
1.5×, run-to-run spread is roughly ±30 %). Exit code 1 on any flag, so a
round can gate on it.

Usage: python tools/compare_bench.py NEW.json [OLD.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

NOISE = 1.5

# BASELINE.md "Same-protocol rows" (ms) — keep in sync with that table
# (round-4 same-day re-measurement; this machine runs ~35% faster than
# during round 3, so round-3 rows would overstate headroom).
SAME_PROTOCOL_MS = {
    "q1_pricing_summary": 39,
    "q3_join_agg": 43,
    "tumbling_hourly_events": 40,
}
BASELINE_GATE = 2.0  # the driver's "within 2x of BASELINE" bar


def load(path: str) -> dict:
    """Accept either bench.py's raw JSON line or the driver's BENCH_r{N}
    wrapper ({'parsed': {...}} with the bench line under 'parsed')."""
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    new_path = sys.argv[1]
    if len(sys.argv) > 2:
        old_path = sys.argv[2]
    else:
        # Exclude the file under test from the candidates: comparing the
        # latest checked-in round against itself reports 1.00x everywhere
        # and silently masks every regression.
        rounds = [
            p
            for p in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
            if os.path.abspath(p) != os.path.abspath(new_path)
        ]
        old_path = rounds[-1] if rounds else None
        if old_path is None:
            print("no distinct prior BENCH_r*.json to compare against", file=sys.stderr)
            return 2

    new = load(new_path)["queries"]
    flags = []

    if old_path:
        old = load(old_path)["queries"]
        print(f"vs {os.path.basename(old_path)}:")
        for name, t_new in sorted(new.items()):
            if name not in old:
                print(f"  {name:34s} {t_new*1000:8.1f} ms  (new this round)")
                continue
            ratio = t_new / max(old[name], 1e-9)
            mark = ""
            if ratio > NOISE:
                mark = "  <-- REGRESSED"
                flags.append((name, f"{ratio:.2f}x vs prev round"))
            print(f"  {name:34s} {t_new*1000:8.1f} ms  {ratio:5.2f}x{mark}")

    # first_run (one-shot pipeline cost incl. checkpoint materialization):
    # compare when both rounds carry it — pre-checkpoint-stage regressions
    # are invisible to the steady-state reps above and surface only here.
    if old_path:
        new_fr = load(new_path).get("first_run") or {}
        old_fr = load(old_path).get("first_run") or {}
        common = sorted(set(new_fr) & set(old_fr))
        if common:
            print("\nfirst_run (one-shot pipeline cost):")
            for name in common:
                ratio = new_fr[name] / max(old_fr[name], 1e-9)
                mark = ""
                if ratio > NOISE:
                    mark = "  <-- REGRESSED"
                    flags.append((name, f"{ratio:.2f}x first_run vs prev round"))
                print(f"  {name:34s} {new_fr[name]*1000:8.1f} ms  {ratio:5.2f}x{mark}")

    print("\nvs BASELINE.md same-protocol rows:")
    for name, base_ms in SAME_PROTOCOL_MS.items():
        if name not in new:
            continue
        ratio = new[name] * 1000 / base_ms
        mark = ""
        if ratio > BASELINE_GATE:
            mark = "  <-- OVER 2x GATE"
            flags.append((name, f"{ratio:.2f}x vs baseline"))
        print(f"  {name:34s} {new[name]*1000:8.1f} ms  {ratio:5.2f}x{mark}")

    if flags:
        print(f"\n{len(flags)} flag(s): {flags}")
        return 1
    print("\nno regressions flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
