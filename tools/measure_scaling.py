"""Scale-slope measurement (VERDICT r8 #1): run the bench headliners at
sf0.01 / sf0.1 / sf1 in ONE session with interleaved reps, and report the
per-query scaling exponent.

Why one session: separate bench.py runs per scale drift 2x+ on sub-50 ms
queries (session-to-session JIT/page-cache variance measured this round:
q1 31 ms vs 77 ms across runs of the SAME code+data). Interleaving the
scales rep-by-rep means every (query, sf) pair sees the same JVM state,
so the RATIO between scales — the thing a slope is made of — is clean
even when absolute numbers wobble.

Protocol: phase 1 builds + executes every (query, scale) once in scale
order (first_run, absorbs codegen/checkpoint materialization); phase 2
takes `reps` interleaved timed re-executions per (query, scale), median.

Exponent: slope = log10(t_sf1 / t_sf0.1) for the 0.1→1 decade (and
log10(t_sf0.1 / t_sf0.01) for the smaller decade, reported for context —
it is floor-dominated: a 25 ms query is mostly fixed plan/session
overhead at BOTH small scales, which reads as slope ~0). A query is
flagged SUPERLINEAR when t_sf1 > 10 * t_sf0.1 * TOLERANCE — more than
linear-in-rows growth beyond the noise band, i.e. a plan that would NOT
survive the next 100x.

The sf1 fixture set is synthesized by tools/synthesize_sf.py (honest
cardinality scaling — see its docstring). Regenerate with:
    python tools/synthesize_sf.py --dest /tmp/sf1
Usage:
    python tools/measure_scaling.py [--reps 3] [--out /tmp/scaling.json]
        [--only name1,name2] [--sf1 /tmp/sf1] [--all]

--all widens the sweep from the bench headliners to EVERY registered
query (round 9: the remaining 111 non-headline registry entries get
measured slopes too, so the scale ledger covers the whole surface).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

TOLERANCE = 1.3

# A row joins the throughput-baseline pool only if its warm time tracks
# input scale: largest-decade slope >= 0.3 (warm time at least ~2x over a
# 10x decade). Pinned-aggregate warm paths read ~flat ms at any scale, so
# their top-scale ms_per_krow is an arbitrary small constant, not a
# throughput (round-10 false flags: edit_distance_near_dups 32.2x and the
# long-cleared pii_redaction 27.6x vs a curation2 median set by flat rows).
SCALE_TRACKING_MIN = 0.3


def apply_throughput_flags(report, top_key, slope_key, fam_of) -> int:
    """Annotate `report` rows with the family-relative throughput verdict.

    Every row with a top-scale ms_per_krow is JUDGED, but only
    scale-tracking rows (see SCALE_TRACKING_MIN) define the family /
    global baseline medians. Families need >=3 baseline members (else
    fall back to the global baseline median, needing >=5; else skip the
    judgment rather than fabricate a baseline). Returns the number of
    rows flagged `throughput_outlier`. Pure dict-in/dict-out so the
    membership rule is unit-testable without Spark."""
    per_family: dict[str, list[float]] = {}
    tops: dict[str, float] = {}
    for name, row in report.items():
        v = (row.get("ms_per_krow") or {}).get(top_key)
        if v is None:
            continue
        tops[name] = v
        tracking = (
            slope_key is not None
            and row.get(slope_key) is not None
            and row[slope_key] >= SCALE_TRACKING_MIN
        )
        row["throughput_baseline_member"] = tracking
        if tracking:
            per_family.setdefault(fam_of(name), []).append(v)
    all_vals = sorted(
        v
        for name, v in tops.items()
        if report[name].get("throughput_baseline_member")
    )
    n_flagged = 0
    for name, row in report.items():
        v = tops.get(name)
        if v is None:
            continue
        fam = fam_of(name)
        fam_vals = per_family.get(fam, [])
        if len(fam_vals) >= 3:
            base = statistics.median(fam_vals)
        elif len(all_vals) >= 5:
            base = statistics.median(all_vals)
        else:
            continue
        row["throughput_family"] = fam
        row["throughput_vs_family_median"] = round(v / base, 2) if base else None
        if base and v > 8 * base:
            row["throughput_outlier"] = True
            n_flagged += 1
    return n_flagged


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/scaling.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--all", action="store_true", help="measure every registered query, not just bench headliners")
    ap.add_argument(
        "--scales",
        default="",
        help="override scale grid: comma list of sf:dir pairs, ascending",
    )
    args = ap.parse_args()

    import bench
    from dataflowjavasdk_spark.queries import all_queries
    from dataflowjavasdk_spark.session import get_spark

    scales = [
        (0.01, "/root/testdata/sf0.01"),
        (0.1, "/root/testdata/sf0.1"),
        (1.0, args.sf1),
    ]
    if args.scales:
        # override: comma list of sf:dir pairs, ascending (e.g.
        # "0.1:/root/testdata/sf0.1,1.0:/tmp/sf1,10.0:/tmp/sf10" for the
        # second measured decade). Slope/flag semantics generalize: one
        # slope per consecutive pair, superlinear judged on the LAST
        # (largest) pair against its actual sf ratio.
        scales = []
        for part in args.scales.split(","):
            sf_s, d = part.split(":", 1)
            scales.append((float(sf_s), d))
    for _, d in scales:
        if not os.path.isdir(d):
            print(f"missing fixture dir {d} (run tools/synthesize_sf.py?)", file=sys.stderr)
            return 2

    spark = get_spark(app_name="scaling", shuffle_partitions=32)
    qs = all_queries()
    if args.all:
        # headliners first (comparable to the committed SCALING_r09 rows),
        # then the rest of the registry in its deterministic order
        names = [n for n in bench.HEADLINE if n in qs]
        names += [n for n in qs if n not in set(names)]
    else:
        names = [n for n in bench.HEADLINE if n in qs]
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    # Phase 1: build + first execution per (query, scale)
    dfs: dict[tuple[str, float], object] = {}
    first_run: dict[str, dict[str, float]] = {}
    for name in names:
        first_run[name] = {}
        for sf, d in scales:
            t0 = time.perf_counter()
            try:
                df = qs[name](spark, d)
                bench._run(df)
            except Exception as exc:  # noqa: BLE001
                print(f"FAIL {name}@sf{sf}: {exc}", flush=True)
                df = None
            dfs[(name, sf)] = df
            first_run[name][str(sf)] = round(time.perf_counter() - t0, 4)
        print(f"built {name}: first_run {first_run[name]}", flush=True)

    # Phase 2: interleaved timed reps
    samples: dict[tuple[str, float], list[float]] = {k: [] for k in dfs}
    for rep in range(args.reps):
        for name in names:
            for sf, _ in scales:
                df = dfs[(name, sf)]
                if df is None:
                    continue
                t0 = time.perf_counter()
                bench._run(df)
                samples[(name, sf)].append(time.perf_counter() - t0)
        print(f"rep {rep + 1}/{args.reps} done", flush=True)

    def _fmt(sf: float) -> str:
        # Historical names for the standard grid: 0.01->"001", 0.1->"01",
        # 1->"1", 10->"10" (committed SCALING_r09* artifacts use these).
        # Any OTHER scale falls back to str(sf) with "." -> "p" — the
        # strip-leading-"0."-heuristic collapses distinct nonstandard
        # scales into ambiguous keys (0.25 -> "025", 0.5 -> "05").
        names = {0.01: "001", 0.1: "01", 1.0: "1", 10.0: "10"}
        return names.get(sf, str(sf).replace(".", "p"))

    def _fixture_rows(d: str) -> int:
        import glob

        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )

    # Throughput denominator (round-9 ledger lesson, VERDICT r9 #2): a
    # linear slope can hide a 7x CONSTANT, and "7x the cluster bill" needs
    # a per-row number to show up in. ms_per_krow divides the median by
    # the fixture's total row count at that scale — the same denominator
    # for every query, so family-relative comparison is denominator-free,
    # and a healthy linear query reads as a FLAT ms/krow across scales.
    fixture_krows = {str(sf): _fixture_rows(d) / 1000.0 for sf, d in scales}

    report: dict[str, dict] = {}
    n_flagged = 0
    for name in names:
        med = {}
        for sf, _ in scales:
            s = samples[(name, sf)]
            med[str(sf)] = round(statistics.median(s) * 1000, 1) if s else None
        row: dict = {"ms": med, "first_run_s": first_run[name]}

        # one slope per consecutive scale pair (default scales produce the
        # historical slope_001_to_01 / slope_01_to_1 key names verbatim);
        # the superlinear flag is judged on the LAST (largest) pair
        # against its actual sf ratio
        for (sa, _), (sb, _) in zip(scales, scales[1:]):
            a, b = med.get(str(sa)), med.get(str(sb))
            if a and b:
                row[f"slope_{_fmt(sa)}_to_{_fmt(sb)}"] = round(
                    math.log10(b / a), 3
                )
        if len(scales) >= 2:
            last_a, last_b = scales[-2][0], scales[-1][0]
            a, b = med.get(str(last_a)), med.get(str(last_b))
            if a and b:
                row["superlinear"] = b > (last_b / last_a) * a * TOLERANCE
                n_flagged += row["superlinear"]
            elif b is None:
                # a query that CRASHED/OOMed at the top scale is the worst
                # scaling outcome there is — flag it, don't exit 0
                row["superlinear"] = True
                row["failed_at_top_scale"] = True
                n_flagged += 1
        # Throughput sanity (round-9 lesson): a perfectly linear slope can
        # hide an awful CONSTANT — intra_doc_repetition_trim measured
        # slope 1.01 at ~6 ms/doc (320 s at sf1) before its O(n^2)
        # array_position scan was rewritten. Warn (don't gate) when the
        # top-scale median exceeds the absolute band every healthy
        # headliner sits under; the band is calibrated at sf1 (60 s) and
        # scales with the top sf so a healthy linear query doesn't trip
        # it merely by being measured at a larger fixture.
        top = med.get(str(scales[-1][0]))
        if top:
            row["heavy_constant"] = top > 60_000 * max(scales[-1][0], 1.0)
        row["ms_per_krow"] = {
            k: round(v / fixture_krows[k], 4)
            for k, v in med.items()
            if v and fixture_krows.get(k)
        }
        report[name] = row

    # Family-relative throughput outliers: compare each query's top-scale
    # ms_per_krow against the median of its query MODULE (dedup, text,
    # curation*, ...) — the automatic version of the audit that caught
    # intra_doc_trim (~7x its text-family peers) and the minhash verify
    # constant by hand in round 9. Only scale-tracking rows define the
    # baseline (see apply_throughput_flags / SCALE_TRACKING_MIN — the
    # round-10 fix for the pinned-flat-baseline false flags).
    n_flagged += apply_throughput_flags(
        report,
        top_key=str(scales[-1][0]),
        slope_key=(
            f"slope_{_fmt(scales[-2][0])}_to_{_fmt(scales[-1][0])}"
            if len(scales) >= 2
            else None
        ),
        fam_of=lambda n: getattr(qs[n], "__module__", "?").rsplit(".", 1)[-1],
    )

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    hdr = " ".join(f"{'sf' + str(sf):>9s}" for sf, _ in scales)
    print(f"\n{'query':36s} {hdr} {'slope':>6s}")
    # the printed slope column is ALWAYS the largest decade, derived from
    # the scale grid itself — not from whichever keys the first report
    # row happened to get (a first-row top-scale failure would silently
    # switch every row to the small decade)
    last_slope = (
        f"slope_{_fmt(scales[-2][0])}_to_{_fmt(scales[-1][0])}"
        if len(scales) >= 2
        else None
    )
    for name, row in report.items():
        m = row["ms"]
        sl = row.get(last_slope) if last_slope else None
        mark = "  <-- SUPERLINEAR" if row.get("superlinear") else ""
        if row.get("failed_at_top_scale"):
            mark = "  <-- FAILED AT TOP SCALE"
        if row.get("heavy_constant"):
            mark += "  <-- HEAVY CONSTANT"
        if row.get("throughput_outlier"):
            mark += (
                f"  <-- THROUGHPUT OUTLIER "
                f"({row.get('throughput_vs_family_median')}x "
                f"{row.get('throughput_family')} median)"
            )
        cells = " ".join(
            f"{(m.get(str(sf)) or -1):9.1f}" for sf, _ in scales
        )
        print(f"{name:36s} {cells} {sl if sl is not None else -9:6.2f}{mark}")
    print(f"\n{n_flagged} superlinear flag(s); report -> {args.out}")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
