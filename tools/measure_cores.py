"""Core-count scaling at sf1 (VERDICT r10 #6): measure the named
queries at local[8] and local[32] on the SAME sf1 fixture and report
the 32c/8c warm speedup — so "parallelizes at scale" is a measured
number instead of an inference from plans. At sf0.1 most warm rows are
scheduling-overhead-bound and 8 cores beat 32; sf1 is the first decade
where the parallel families can actually spread.

Method: each (core count) runs in its OWN subprocess (master is a
static conf), alternating 8/32 across `--rounds` rounds so both see the
same host weather; per round a subprocess builds every query once
(first_run) and medians `--reps` warm re-executions. The final number
per (query, cores) is the median across rounds. Output JSON:
{query: {"ms_8c", "ms_32c", "speedup_32c_over_8c",
         "first_s_8c", "first_s_32c"}}

Usage:
    python tools/measure_cores.py --sf /tmp/sf1 --out /tmp/cores.json \
        [--queries name1,name2,...] [--rounds 3] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Default list: the top headliners by round-10 driver cost (VERDICT r10
# "Done = scaling artifact with sf1 rows for the top-20 headliners by
# cost").
DEFAULT_QUERIES = [
    "image_resize_features", "cogbk_sorted_stream",
    "cogroup_nation_customer_supplier", "gif_frame_features",
    "mjpeg_frame_sample", "tfidf_regex", "audio_wav_features",
    "jpeg_image_features", "audio_frame_energy", "audio_tone_detect",
    "mad_outliers_per_type", "pii_redaction", "tfidf",
    "custom_merged_windows_events", "session_windows_events",
    "q18_large_orders", "bpe_token_stats", "chunk_dedup_boilerplate",
    "user_inactivity_gaps", "minhash_lsh_near_dups",
]

_CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from dataflowjavasdk_spark.queries import all_queries
from dataflowjavasdk_spark.session import get_spark

spark = get_spark(app_name="cores", shuffle_partitions=32)
qs = all_queries()
out = {{}}
for name in {names!r}:
    t0 = time.perf_counter()
    df = qs[name](spark, {sf!r})
    df.toArrow().num_rows
    first = time.perf_counter() - t0
    df.toArrow().num_rows
    samples = []
    for _ in range({reps}):
        t0 = time.perf_counter()
        df.toArrow().num_rows
        samples.append(time.perf_counter() - t0)
    out[name] = {{"warm_s": statistics.median(samples), "first_s": first}}
print("CORES_JSON " + json.dumps(out), flush=True)
"""


def run_child(cpus: int, names: list[str], sf: str, reps: int) -> dict:
    code = _CHILD.format(repo=_REPO_ROOT, names=names, sf=sf, reps=reps)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CORES_JSON "):
            return json.loads(line[len("CORES_JSON "):])
    raise RuntimeError(
        f"child (cpus={cpus}) produced no result:\n{proc.stdout[-1500:]}\n"
        f"{proc.stderr[-1500:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/cores.json")
    ap.add_argument("--queries", default="")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else DEFAULT_QUERIES
    )

    acc: dict[int, dict[str, list[dict]]] = {8: {}, 32: {}}
    for rnd in range(args.rounds):
        for cpus in (8, 32):  # alternate so both see the same weather
            res = run_child(cpus, names, args.sf, args.reps)
            for name, row in res.items():
                acc[cpus].setdefault(name, []).append(row)
            print(f"round {rnd + 1}/{args.rounds} cpus={cpus} done", flush=True)

    report: dict[str, dict] = {}
    for name in names:
        if not acc[8].get(name) or not acc[32].get(name):
            continue
        w8 = statistics.median(r["warm_s"] for r in acc[8][name])
        w32 = statistics.median(r["warm_s"] for r in acc[32][name])
        report[name] = {
            "ms_8c": round(w8 * 1000, 1),
            "ms_32c": round(w32 * 1000, 1),
            "speedup_32c_over_8c": round(w8 / max(w32, 1e-9), 2),
            "first_s_8c": round(
                statistics.median(r["first_s"] for r in acc[8][name]), 2
            ),
            "first_s_32c": round(
                statistics.median(r["first_s"] for r in acc[32][name]), 2
            ),
        }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
        fh.write("\n")
    for name, row in sorted(
        report.items(), key=lambda kv: -kv[1]["speedup_32c_over_8c"]
    ):
        print(
            f"{name:38s} 8c {row['ms_8c']:8.1f} ms  32c {row['ms_32c']:8.1f} ms"
            f"  x{row['speedup_32c_over_8c']:.2f}"
        )


if __name__ == "__main__":
    main()
