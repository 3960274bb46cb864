"""Streaming-kernel throughput measurement (VERDICT r9 #3).

Every scaling artifact before round 10 was batch-only: the trigger
kernel (streaming/triggers.py — the engine's one genuinely custom
component) and its session twin had measured SEMANTICS but no measured
THROUGHPUT. This harness feeds a synthetic event stream through
triggered_window_aggregate and triggered_session_aggregate via the
MicroBatchHarness drop-dir path (RocksDB state store provider ON, the
documented large-key-space posture), at two input scales, and records:

- events/s end-to-end (wall clock across all availableNow rounds,
  including the drop-dir read, the shuffle into the stateful operator,
  the Arrow-batched Python kernel, and the foreachBatch sink)
- peak stateful-operator rows (query progress numRowsTotal)
- on-disk state-store bytes under the checkpoint after the final round
- emitted pane rows

Scale shape of the input: `--events` keys x 50 events each — 10
sessions of 5 events (1 s apart) per key, sessions 120 s apart (gap
30 s => they stay distinct), all keys in parallel over a ~20 min span.
Four batches split by session index so the watermark advances between
rounds and closes earlier windows/sessions — state is created AND
reclaimed within the run, like production, not a single
all-state-resident spike.

Throughput at 4x the events with 4x the keys should be ~flat (the
kernel is per-key-group Arrow batches; more keys = more groups, same
per-group cost) — a degrading events/s across scales is the streaming
analog of a superlinear batch slope.

Usage:
    python tools/measure_streaming.py [--scales 250000,1000000]
        [--out /tmp/streaming_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

EVENTS_PER_KEY = 50  # 10 sessions x 5 events
SESSIONS_PER_KEY = 10
EVENTS_PER_SESSION = 5
SESSION_SPACING_S = 120
N_BATCHES = 4

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _events(spark, n: int, batch: int):
    """Deterministic synthetic stream slice for feed round `batch`."""
    from pyspark.sql import functions as F

    n_keys = n // EVENTS_PER_KEY
    sessions_per_batch = SESSIONS_PER_KEY // N_BATCHES + 1
    lo = batch * sessions_per_batch
    hi = min((batch + 1) * sessions_per_batch, SESSIONS_PER_KEY)
    if lo >= hi:
        return None
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % EVENTS_PER_KEY).alias("seq"),
        (F.col("id") / EVENTS_PER_KEY).cast("long").alias("keyn"),
    )
    df = df.withColumn("session_idx", (F.col("seq") / EVENTS_PER_SESSION).cast("long"))
    df = df.filter((F.col("session_idx") >= lo) & (F.col("session_idx") < hi))
    return df.select(
        "event_id",
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.col("session_idx") * SESSION_SPACING_S
            + (F.col("seq") % EVENTS_PER_SESSION)
        ).alias("ts"),
        F.concat(F.lit("u"), F.col("keyn")).alias("key"),
        (F.col("seq") % 7).cast("double").alias("value"),
    ), df.count()


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _measure_kernel(spark, n: int, build) -> dict:
    from dataflowjavasdk_spark.streaming.core import MicroBatchHarness

    schema = "event_id long, ts timestamp, key string, value double"
    h = MicroBatchHarness(spark, schema)
    wall = 0.0
    out_rows = 0
    peak_state = 0
    try:
        for b in range(N_BATCHES):
            made = _events(spark, n, b)
            if made is None:
                continue
            df, _ = made
            h.feed(df)
            t0 = time.perf_counter()
            out = h.run_round(build, output_mode="update")
            wall += time.perf_counter() - t0
            out_rows += len(out)
            peak_state = max(peak_state, h.state_rows or 0)
        state_bytes = _dir_bytes(os.path.join(h.checkpoint, "state"))
    finally:
        h.close()
    return {
        "events": n,
        "wall_s": round(wall, 2),
        "events_per_s": int(n / wall) if wall else None,
        "out_rows": out_rows,
        "peak_state_rows": peak_state,
        "state_bytes_final": state_bytes,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="250000,1000000")
    ap.add_argument("--out", default="/tmp/streaming_scaling.json")
    args = ap.parse_args()

    from dataflowjavasdk_spark.session import get_spark
    from dataflowjavasdk_spark.streaming.triggers import (
        ACCUMULATING,
        AfterCount,
        AfterWatermark,
        triggered_session_aggregate,
        triggered_window_aggregate,
    )

    spark = get_spark(app_name="streaming-scaling", shuffle_partitions=32)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)

    def window_build(stream):
        return triggered_window_aggregate(
            stream,
            keys=["key"],
            value_col="value",
            window_size="60 seconds",
            trigger=AfterWatermark(early=AfterCount(1000)),
            accumulation=ACCUMULATING,
            allowed_lateness="0 seconds",
        )

    def session_build(stream):
        return triggered_session_aggregate(
            stream,
            keys=["key"],
            value_col="value",
            gap="30 seconds",
            trigger=AfterWatermark(),
            accumulation=ACCUMULATING,
            allowed_lateness="0 seconds",
        )

    report: dict[str, dict] = {"protocol": {
        "batches": N_BATCHES,
        "events_per_key": EVENTS_PER_KEY,
        "state_store": "rocksdb",
        "note": "events/s is end-to-end wall: drop-dir scan + shuffle + "
        "Arrow kernel + sink; availableNow rounds with advancing watermark",
    }}
    for kernel, build in (("triggered_window_aggregate", window_build),
                          ("triggered_session_aggregate", session_build)):
        report[kernel] = {}
        for n in [int(s) for s in args.scales.split(",")]:
            r = _measure_kernel(spark, n, build)
            report[kernel][str(n)] = r
            print(f"{kernel} @ {n}: {r}", flush=True)
        scales = sorted(report[kernel], key=int)
        if len(scales) >= 2:
            lo, hi = report[kernel][scales[0]], report[kernel][scales[-1]]
            if lo["events_per_s"] and hi["events_per_s"]:
                ratio = hi["events_per_s"] / lo["events_per_s"]
                report[kernel]["throughput_ratio_hi_vs_lo"] = round(ratio, 2)
                # flat-or-better is healthy; <0.5 means per-event cost
                # DOUBLED with scale — the streaming superlinear analog
                report[kernel]["degrades_with_scale"] = ratio < 0.5

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {args.out}")
    flagged = any(
        isinstance(v, dict) and v.get("degrades_with_scale") for v in report.values()
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
