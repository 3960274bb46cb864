"""Trigger kernel: the Beam trigger grammar on applyInPandasWithState.

This is the engine's one genuinely custom component (SURVEY.md §4.2, §7.2):
the reference implements it as ~1k LoC of runner machinery (historical
sdk/util/ReduceFnRunner.java + TriggerRunner.java + WatermarkHold.java +
PaneInfoTracker.java; triggers under sdk/transforms/windowing/:
AfterWatermark, AfterPane.elementCountAtLeast, AfterProcessingTime,
Repeatedly, AfterFirst, AfterAll — Dataflow VLDB 2015 §2.3-2.4).

Model implemented per (key, window):
- buffered accumulators (count + sum v1) ≡ SystemReduceFn state
- a trigger state machine deciding when panes fire
- PaneInfo synthesis: timing EARLY/ON_TIME/LATE, pane_index,
  is_first/is_last — absent natively in Spark
- accumulatingFiredPanes vs discardingFiredPanes
- allowed lateness: late data within the horizon fires LATE panes;
  beyond it state is garbage-collected and stragglers are dropped
  (identical to the reference's lateness contract)

Execution: one stateful shuffle on (key, window-start); per micro-batch
each key-group gets its new rows (Arrow batches) + its GroupState;
event-time timeouts fire when the watermark passes window end (on-time
pane) and window end + lateness (cleanup). Scale: state is per
(key,window) and bounded by lateness GC — the same bound Windmill
enforces; swap the state store to RocksDB for large key spaces
(session.py note).

Semantic deviations (documented, SURVEY.md §7.2):
- processing-time triggers evaluate at micro-batch boundaries, not
  arbitrary wall-clock instants (Spark has no per-key processing timers in
  applyInPandasWithState with event-time timeouts active).
- the on-time pane needs a watermark advance past window end, which in a
  file-replay world means one more batch must arrive (Spark watermarks
  advance per batch).
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator
from dataclasses import dataclass, field
from time import time as _now

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Trigger grammar (static config objects; per-key dynamic state is a JSON
# dict living inside the group state, keyed by the trigger's tree path)
# --------------------------------------------------------------------------


class Trigger:
    """Sub-trigger protocol: mutate dynamic state on elements, answer
    should_fire, reset on fire."""

    def on_elements(self, dyn: dict, path: str, n_new: int, now_ms: int) -> None:
        pass

    def should_fire(self, dyn: dict, path: str, now_ms: int) -> bool:
        raise NotImplementedError

    def on_fire(self, dyn: dict, path: str) -> None:
        pass


@dataclass(frozen=True)
class AfterCount(Trigger):
    """AfterPane.elementCountAtLeast(n) (historical
    sdk/transforms/windowing/AfterPane.java)."""

    n: int

    def on_elements(self, dyn, path, n_new, now_ms):
        dyn[path + ".c"] = dyn.get(path + ".c", 0) + n_new

    def should_fire(self, dyn, path, now_ms):
        return dyn.get(path + ".c", 0) >= self.n

    def on_fire(self, dyn, path):
        dyn[path + ".c"] = 0


@dataclass(frozen=True)
class AfterProcessingTime(Trigger):
    """AfterProcessingTime.pastFirstElementInPane().plusDelayOf(delay_ms)
    (historical sdk/transforms/windowing/AfterProcessingTime.java).
    Evaluated at micro-batch boundaries (see module deviation note)."""

    delay_ms: int

    def on_elements(self, dyn, path, n_new, now_ms):
        dyn.setdefault(path + ".first", now_ms)

    def should_fire(self, dyn, path, now_ms):
        first = dyn.get(path + ".first")
        return first is not None and now_ms >= first + self.delay_ms

    def on_fire(self, dyn, path):
        dyn.pop(path + ".first", None)


@dataclass(frozen=True)
class Repeatedly(Trigger):
    """Repeatedly.forever(t): re-arms its sub-trigger after every fire."""

    trigger: Trigger

    def on_elements(self, dyn, path, n_new, now_ms):
        self.trigger.on_elements(dyn, path + ".r", n_new, now_ms)

    def should_fire(self, dyn, path, now_ms):
        return self.trigger.should_fire(dyn, path + ".r", now_ms)

    def on_fire(self, dyn, path):
        self.trigger.on_fire(dyn, path + ".r")


@dataclass(frozen=True)
class AfterFirst(Trigger):
    """AfterFirst.of(a, b, ...): fires when ANY sub-trigger would."""

    triggers: tuple[Trigger, ...]

    def on_elements(self, dyn, path, n_new, now_ms):
        for i, t in enumerate(self.triggers):
            t.on_elements(dyn, f"{path}.f{i}", n_new, now_ms)

    def should_fire(self, dyn, path, now_ms):
        return any(
            t.should_fire(dyn, f"{path}.f{i}", now_ms)
            for i, t in enumerate(self.triggers)
        )

    def on_fire(self, dyn, path):
        for i, t in enumerate(self.triggers):
            t.on_fire(dyn, f"{path}.f{i}")


@dataclass(frozen=True)
class AfterAll(Trigger):
    """AfterAll.of(a, b, ...): fires when EVERY sub-trigger would."""

    triggers: tuple[Trigger, ...]

    def on_elements(self, dyn, path, n_new, now_ms):
        for i, t in enumerate(self.triggers):
            t.on_elements(dyn, f"{path}.a{i}", n_new, now_ms)

    def should_fire(self, dyn, path, now_ms):
        return all(
            t.should_fire(dyn, f"{path}.a{i}", now_ms)
            for i, t in enumerate(self.triggers)
        )

    def on_fire(self, dyn, path):
        for i, t in enumerate(self.triggers):
            t.on_fire(dyn, f"{path}.a{i}")


@dataclass(frozen=True)
class Never(Trigger):
    """Never.ever() (historical sdk/transforms/windowing/Never.java): a
    trigger that never fires — as OrFinally's main it means "only the
    until-condition ever emits"."""

    def should_fire(self, dyn, path, now_ms):
        return False


@dataclass(frozen=True)
class AfterEach(Trigger):
    """AfterEach.inOrder(t1, t2, ...) (historical
    sdk/transforms/windowing/AfterEach.java): runs sub-triggers in
    sequence — the active one fires, finishes, and hands over to the next;
    after the last finishes the trigger is done. (A sub-trigger here
    finishes on its first fire, Beam's semantics for non-repeated
    sub-triggers.)"""

    triggers: tuple[Trigger, ...]

    def _i(self, dyn, path) -> int:
        return dyn.get(path + ".i", 0)

    def on_elements(self, dyn, path, n_new, now_ms):
        i = self._i(dyn, path)
        if i < len(self.triggers):
            self.triggers[i].on_elements(dyn, f"{path}.e{i}", n_new, now_ms)

    def should_fire(self, dyn, path, now_ms):
        i = self._i(dyn, path)
        return i < len(self.triggers) and self.triggers[i].should_fire(
            dyn, f"{path}.e{i}", now_ms
        )

    def on_fire(self, dyn, path):
        i = self._i(dyn, path)
        if i < len(self.triggers):
            self.triggers[i].on_fire(dyn, f"{path}.e{i}")
            dyn[path + ".i"] = i + 1


@dataclass(frozen=True)
class OrFinally(Trigger):
    """t.orFinally(until) (historical OrFinallyTrigger in
    sdk/transforms/windowing/Trigger.java): behaves as `main` until
    `until` fires once, which finishes the trigger permanently. The
    kernel calls should_fire exactly once before on_fire, so the
    until-branch decision is stashed in dynamic state between the two."""

    main: Trigger
    until: Trigger

    def on_elements(self, dyn, path, n_new, now_ms):
        if dyn.get(path + ".done"):
            return
        self.main.on_elements(dyn, f"{path}.m", n_new, now_ms)
        self.until.on_elements(dyn, f"{path}.u", n_new, now_ms)

    def should_fire(self, dyn, path, now_ms):
        if dyn.get(path + ".done"):
            return False
        u = self.until.should_fire(dyn, f"{path}.u", now_ms)
        dyn[path + ".upending"] = u
        return u or self.main.should_fire(dyn, f"{path}.m", now_ms)

    def on_fire(self, dyn, path):
        self.main.on_fire(dyn, f"{path}.m")
        if dyn.pop(path + ".upending", False):
            dyn[path + ".done"] = True


@dataclass(frozen=True)
class AfterWatermark(Trigger):
    """AfterWatermark.pastEndOfWindow().withEarlyFirings(e).withLateFirings(l)
    — the root trigger (historical sdk/transforms/windowing/
    AfterWatermark.java). The kernel itself handles the watermark
    crossing; `early`/`late` govern speculative and refinement panes."""

    early: Trigger | None = None
    late: Trigger | None = None


ACCUMULATING = "accumulating"
DISCARDING = "discarding"

_STATE_SCHEMA = (
    "acc_count long, acc_sum double, pane_count long, pane_sum double, "
    "pane_index long, on_time_fired boolean, dyn string, "
    # OutputTimeFn accumulators (epoch ms; -1 = unset): min/max input ts
    # over all accumulated elements and over the current pane only.
    "acc_min_ts long, acc_max_ts long, pane_min_ts long, pane_max_ts long"
)

# OutputTimeFn policies (historical sdk/transforms/windowing/OutputTimeFn.java)
OUTPUT_END_OF_WINDOW = "end_of_window"
OUTPUT_EARLIEST = "earliest"
OUTPUT_LATEST = "latest"

# ClosingBehavior (historical sdk/transforms/windowing/Window.java
# ClosingBehavior.FIRE_IF_NON_EMPTY / FIRE_ALWAYS): whether the window's
# final pane at the lateness horizon fires even when nothing new arrived
# since the last firing. FIRE_ALWAYS guarantees every window emits a pane
# carrying is_last=True — downstream consumers can treat it as the
# window-closed signal.
CLOSING_FIRE_IF_NON_EMPTY = "fire_if_non_empty"
CLOSING_FIRE_ALWAYS = "fire_always"


def triggered_window_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    window_size: str,
    trigger: AfterWatermark,
    accumulation: str = ACCUMULATING,
    allowed_lateness: str = "0 seconds",
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
    output_time: str | None = None,
    closing_behavior: str = CLOSING_FIRE_IF_NON_EMPTY,
    window_period: str | None = None,
) -> DataFrame:
    """Count+sum per (key, fixed window) under the full trigger grammar.

    Output: keys..., window_start, window_end, n, total, pane_index,
    pane_timing (EARLY|ON_TIME|LATE), is_first, is_last
    [, emit_ts when `output_time` is set].

    `window_period` switches assignment from FixedWindows to
    SlidingWindows.of(window_size).every(window_period): each element
    lands in size/period overlapping windows and every (key, window)
    runs the full trigger/pane lifecycle independently.

    `output_time` (end_of_window | earliest | latest) adds the pane's
    emitted event-time timestamp: END_OF_WINDOW = window end − 1 ms
    (Beam's maxTimestamp), EARLIEST/LATEST = min/max input timestamp of
    the pane's contents (all accumulated elements under ACCUMULATING,
    only the new ones under DISCARDING) — the reference's
    OutputTimeFn.outputAtEarliest/LatestInputTimestamp.
    """
    lateness_ms = _duration_ms(allowed_lateness)
    # Spark's stateful operator drops input rows behind ITS watermark, but
    # Beam accepts data up to `allowed_lateness` behind the true watermark.
    # Reconciliation: declare watermark_delay + lateness to Spark, so
    #   spark_wm = true_wm - lateness.
    # Rows later than lateness are then dropped by Spark itself (exactly
    # Beam's drop rule); the kernel converts back via
    #   true_wm = spark_wm + lateness
    # for all pane timing decisions.
    spark_delay_ms = _duration_ms(watermark_delay) + lateness_ms
    key_fields = ", ".join(f"{k} {dict(df.dtypes)[k]}" for k in keys)
    out_schema = (
        f"{key_fields}, window_start timestamp, window_end timestamp, "
        "n long, total double, pane_index long, pane_timing string, "
        "is_first boolean, is_last boolean"
    )
    if output_time is not None:
        if output_time not in (OUTPUT_END_OF_WINDOW, OUTPUT_EARLIEST, OUTPUT_LATEST):
            raise ValueError(f"unknown output_time {output_time!r}")
        out_schema += ", emit_ts timestamp"
    if closing_behavior not in (CLOSING_FIRE_IF_NON_EMPTY, CLOSING_FIRE_ALWAYS):
        raise ValueError(f"unknown closing_behavior {closing_behavior!r}")

    # Window assignment: fixed (default) or sliding when window_period is
    # given (SlidingWindows.of(size).every(period)). Sliding uses Spark's
    # native multi-assign — the Expand is map-side and pipelined; each
    # (key, window) then owns an independent trigger-kernel state cell,
    # exactly Beam's per-window pane semantics over overlapping windows.
    window_expr = (
        F.window(ts_col, window_size)
        if window_period is None
        else F.window(ts_col, window_size, window_period)
    )
    windowed = (
        df.withWatermark(ts_col, f"{spark_delay_ms} milliseconds")
        .withColumn("__w__", window_expr)
        .select(
            *keys,
            F.col("__w__.start").alias("window_start"),
            F.col("__w__.end").alias("window_end"),
            F.col(value_col).alias("__v__"),
            # keep the watermarked event-time column in the projection:
            # extracting window fields drops the watermark tag, and the
            # stateful operator requires a watermarked column to allow
            # EventTimeTimeout.
            F.col(ts_col),
        )
    )

    def process(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        *user_key, w_start, w_end = key
        w_end_ms = int(pd.Timestamp(w_end).timestamp() * 1000)
        spark_wm = state.getCurrentWatermarkMs()
        watermark_ms = spark_wm + lateness_ms  # the Beam-true watermark
        now_ms = int(_now() * 1000)

        if state.exists:
            (acc_n, acc_sum, pane_n, pane_sum, pane_idx, on_time_fired, dyn_json,
             acc_min, acc_max, pane_min, pane_max) = state.get
            dyn = json.loads(dyn_json)
        else:
            acc_n = pane_n = pane_idx = 0
            acc_sum = pane_sum = 0.0
            on_time_fired = False
            dyn = {}
            acc_min = pane_min = acc_max = pane_max = -1

        new_n, new_sum = 0, 0.0
        new_min, new_max = -1, -1
        for pdf in pdfs:
            if len(pdf):
                new_n += len(pdf)
                new_sum += float(pdf["__v__"].sum())
                lo = int(pd.Timestamp(pdf[ts_col].min()).timestamp() * 1000)
                hi = int(pd.Timestamp(pdf[ts_col].max()).timestamp() * 1000)
                new_min = lo if new_min < 0 else min(new_min, lo)
                new_max = max(new_max, hi)

        # GC horizon: stragglers beyond window_end + lateness are dropped —
        # do not resurrect state the cleanup timeout already removed.
        if watermark_ms >= w_end_ms + lateness_ms and not state.exists:
            return

        acc_n += new_n
        acc_sum += new_sum
        pane_n += new_n
        pane_sum += new_sum
        if new_n:
            acc_min = new_min if acc_min < 0 else min(acc_min, new_min)
            acc_max = max(acc_max, new_max)
            pane_min = new_min if pane_min < 0 else min(pane_min, new_min)
            pane_max = max(pane_max, new_max)

        panes: list[dict] = []

        def _emit_ts(lo: int, hi: int):
            if output_time == OUTPUT_END_OF_WINDOW:
                ms = w_end_ms - 1
            elif output_time == OUTPUT_EARLIEST:
                ms = lo
            else:
                ms = hi
            return pd.Timestamp(ms, unit="ms") if ms >= 0 else pd.NaT

        def emit(timing: str, is_last: bool) -> None:
            nonlocal pane_idx, pane_n, pane_sum, pane_min, pane_max
            n, total = (acc_n, acc_sum) if accumulation == ACCUMULATING else (pane_n, pane_sum)
            pane = dict(
                zip(keys, user_key),
                window_start=w_start,
                window_end=w_end,
                n=n,
                total=total,
                pane_index=pane_idx,
                pane_timing=timing,
                is_first=pane_idx == 0,
                is_last=is_last,
            )
            if output_time is not None:
                lo, hi = (
                    (acc_min, acc_max)
                    if accumulation == ACCUMULATING
                    else (pane_min, pane_max)
                )
                pane["emit_ts"] = _emit_ts(lo, hi)
            panes.append(pane)
            pane_idx += 1
            pane_n, pane_sum = 0, 0.0
            pane_min, pane_max = -1, -1

        before_end_of_window = watermark_ms < w_end_ms

        if before_end_of_window:
            # speculative EARLY panes
            if trigger.early is not None and new_n:
                trigger.early.on_elements(dyn, "e", new_n, now_ms)
                if trigger.early.should_fire(dyn, "e", now_ms):
                    trigger.early.on_fire(dyn, "e")
                    emit("EARLY", is_last=False)
            state.update((acc_n, acc_sum, pane_n, pane_sum, pane_idx, False,
                          json.dumps(dyn), acc_min, acc_max, pane_min, pane_max))
            # wake when the TRUE watermark passes the end of the window,
            # i.e. when the Spark watermark reaches w_end - lateness
            state.setTimeoutTimestamp(max(w_end_ms - lateness_ms, spark_wm + 1))
        else:
            final_horizon = watermark_ms >= w_end_ms + lateness_ms
            emitted_closing = False
            if not on_time_fired:
                # ON_TIME: the watermark crossed window end (timeout or a
                # batch carrying late-ish rows observed after crossing)
                emit("ON_TIME", is_last=final_horizon)
                on_time_fired = True
                emitted_closing = final_horizon
            elif new_n:
                # refinements within the lateness horizon
                fire_late = True
                if trigger.late is not None:
                    trigger.late.on_elements(dyn, "l", new_n, now_ms)
                    fire_late = trigger.late.should_fire(dyn, "l", now_ms)
                    if fire_late:
                        trigger.late.on_fire(dyn, "l")
                if fire_late:
                    emit("LATE", is_last=final_horizon)
                    emitted_closing = final_horizon
            if final_horizon:
                if not emitted_closing and (
                    closing_behavior == CLOSING_FIRE_ALWAYS or pane_n
                ):
                    # Closing pane at the lateness horizon. FIRE_ALWAYS:
                    # emit even though nothing new arrived since the last
                    # firing (empty under DISCARDING, the running totals
                    # under ACCUMULATING) — the guaranteed is_last
                    # window-closed signal. Default FIRE_IF_NON_EMPTY:
                    # emit iff the pane holds data not yet fired — e.g. a
                    # late element buffered by an unready late trigger
                    # (AfterCount(2) with one arrival); Beam fires the
                    # final pane whenever there is new data since the
                    # last firing, so dropping it here would lose the
                    # element's contribution forever.
                    emit("LATE", is_last=True)
                state.remove()
            else:
                state.update((acc_n, acc_sum, pane_n, pane_sum, pane_idx, True,
                              json.dumps(dyn), acc_min, acc_max, pane_min, pane_max))
                # GC when true_wm reaches w_end + lateness ⟺ spark_wm reaches w_end
                state.setTimeoutTimestamp(max(w_end_ms, spark_wm + 1))

        if panes:
            yield pd.DataFrame(panes)

    return windowed.groupBy(*keys, "window_start", "window_end").applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )


def _duration_ms(s: str) -> int:
    qty, unit = s.split()
    unit_ms = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]
    return int(qty) * unit_ms


def triggered_session_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    gap: str,
    trigger: AfterWatermark,
    accumulation: str = ACCUMULATING,
    allowed_lateness: str = "0 seconds",
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
    output_time: str | None = None,
    closing_behavior: str = CLOSING_FIRE_IF_NON_EMPTY,
) -> DataFrame:
    """The trigger grammar over MERGING session windows — the streaming
    ReduceFnRunner for Sessions (historical sdk/util/ReduceFnRunner.java +
    Sessions.java): per-key state holds the open session set; each element
    is a proto-session [ts, ts + gap) merged into it (merging windows merge
    their accumulators AND their trigger state — Beam's onMerge contract);
    the watermark closes sessions (ON_TIME), late data within
    allowed_lateness refines (LATE) or opens new sessions that may re-merge.

    This is the piece native Structured Streaming cannot express:
    session_window supports only watermark-close (append) semantics, while
    this kernel runs early/late firings, accumulation modes, and PaneInfo
    over merging windows. Output: keys..., window_start, window_end, n,
    total, pane_index, pane_timing, is_first, is_last.

    Scale: state per key = open sessions only (each a few scalars), the
    same bound as Spark's native MergingSessions and Windmill's per-key
    window state; one shuffle on the key.

    `output_time` (end_of_window | earliest | latest) adds an emit_ts
    column per pane; for merging windows END_OF_WINDOW tracks the
    session's CURRENT end (end − 1 ms) at firing time, and
    EARLIEST/LATEST merge across fused sessions (onMerge takes min/max).
    """
    gap_ms = _duration_ms(gap)
    lateness_ms = _duration_ms(allowed_lateness)
    spark_delay_ms = _duration_ms(watermark_delay) + lateness_ms
    key_fields = ", ".join(f"{k} {dict(df.dtypes)[k]}" for k in keys)
    out_schema = (
        f"{key_fields}, window_start timestamp, window_end timestamp, "
        "n long, total double, pane_index long, pane_timing string, "
        "is_first boolean, is_last boolean"
    )
    if output_time is not None:
        if output_time not in (OUTPUT_END_OF_WINDOW, OUTPUT_EARLIEST, OUTPUT_LATEST):
            raise ValueError(f"unknown output_time {output_time!r}")
        out_schema += ", emit_ts timestamp"
    if closing_behavior not in (CLOSING_FIRE_IF_NON_EMPTY, CLOSING_FIRE_ALWAYS):
        raise ValueError(f"unknown closing_behavior {closing_behavior!r}")

    windowed = df.withWatermark(ts_col, f"{spark_delay_ms} milliseconds").select(
        *keys, F.col(value_col).alias("__v__"), F.col(ts_col)
    )

    def process(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user_key = key
        spark_wm = state.getCurrentWatermarkMs()
        watermark_ms = spark_wm + lateness_ms  # Beam-true watermark
        now_ms = int(_now() * 1000)

        sessions: list[dict] = (
            json.loads(state.get[0])["sessions"] if state.exists else []
        )

        # 1. fold new elements in as proto-sessions
        new_protos: list[dict] = []
        for pdf in pdfs:
            for ts_v, v in zip(pdf[ts_col], pdf["__v__"]):
                t_ms = int(pd.Timestamp(ts_v).value // 1_000_000)
                # Beam drop rule: data later than the lateness horizon
                # relative to ITS OWN session end can't resurrect GC'd
                # state; Spark's watermark already culled older rows.
                new_protos.append(
                    dict(start=t_ms, end=t_ms + gap_ms, acc_n=1,
                         acc_sum=float(v), pane_n=1, pane_sum=float(v),
                         pane_idx=0, on_time_fired=False, dyn={},
                         new_n=1,
                         acc_min=t_ms, acc_max=t_ms,
                         pane_min=t_ms, pane_max=t_ms)
                )

        # 2. merge: sort all intervals, union overlapping ones, merging
        # accumulators and trigger state (onMerge: counts add, pane index
        # continues from the max, on_time stays fired if any part fired).
        for p in new_protos:
            sessions.append(p)
        sessions.sort(key=lambda s: (s["start"], s["end"]))
        merged: list[dict] = []
        for s in sessions:
            if merged and s["start"] < merged[-1]["end"]:
                m = merged[-1]
                m["end"] = max(m["end"], s["end"])
                m["acc_n"] += s["acc_n"]
                m["acc_sum"] += s["acc_sum"]
                m["pane_n"] += s["pane_n"]
                m["pane_sum"] += s["pane_sum"]
                m["pane_idx"] = max(m["pane_idx"], s["pane_idx"])
                m["on_time_fired"] = m["on_time_fired"] or s["on_time_fired"]
                m["new_n"] = m.get("new_n", 0) + s.get("new_n", 0)
                # onMerge for OutputTimeFn holds: min/max across parts
                # (-1 = unset pane accumulator after a discarding emit)
                for lo_k in ("acc_min", "pane_min"):
                    a, b = m.get(lo_k, -1), s.get(lo_k, -1)
                    m[lo_k] = b if a < 0 else (a if b < 0 else min(a, b))
                for hi_k in ("acc_max", "pane_max"):
                    m[hi_k] = max(m.get(hi_k, -1), s.get(hi_k, -1))
                # merge trigger dynamic state by summing counters
                for dk, dv in s.get("dyn", {}).items():
                    if isinstance(dv, (int, float)):
                        m["dyn"][dk] = m["dyn"].get(dk, 0) + dv
                    else:
                        m["dyn"].setdefault(dk, dv)
            else:
                merged.append(s)
        sessions = merged

        panes: list[dict] = []

        def emit(s: dict, timing: str, is_last: bool) -> None:
            n, total = (
                (s["acc_n"], s["acc_sum"])
                if accumulation == ACCUMULATING
                else (s["pane_n"], s["pane_sum"])
            )
            pane = dict(
                zip(keys, user_key),
                window_start=pd.Timestamp(s["start"], unit="ms"),
                window_end=pd.Timestamp(s["end"], unit="ms"),
                n=n,
                total=total,
                pane_index=s["pane_idx"],
                pane_timing=timing,
                is_first=s["pane_idx"] == 0,
                is_last=is_last,
            )
            if output_time is not None:
                if output_time == OUTPUT_END_OF_WINDOW:
                    ms = s["end"] - 1
                elif output_time == OUTPUT_EARLIEST:
                    ms = (s.get("acc_min", -1) if accumulation == ACCUMULATING
                          else s.get("pane_min", -1))
                else:
                    ms = (s.get("acc_max", -1) if accumulation == ACCUMULATING
                          else s.get("pane_max", -1))
                pane["emit_ts"] = pd.Timestamp(ms, unit="ms") if ms >= 0 else pd.NaT
            panes.append(pane)
            s["pane_idx"] += 1
            s["pane_n"], s["pane_sum"] = 0, 0.0
            s["pane_min"], s["pane_max"] = -1, -1

        # 3. run the trigger per session
        keep: list[dict] = []
        for s in sessions:
            new_n = s.pop("new_n", 0)
            final_horizon = watermark_ms >= s["end"] + lateness_ms
            if watermark_ms < s["end"]:
                if trigger.early is not None and new_n:
                    trigger.early.on_elements(s["dyn"], "e", new_n, now_ms)
                    if trigger.early.should_fire(s["dyn"], "e", now_ms):
                        trigger.early.on_fire(s["dyn"], "e")
                        emit(s, "EARLY", is_last=False)
                keep.append(s)
            else:
                emitted_closing = False
                if not s["on_time_fired"]:
                    emit(s, "ON_TIME", is_last=final_horizon)
                    s["on_time_fired"] = True
                    emitted_closing = final_horizon
                elif new_n:
                    fire_late = True
                    if trigger.late is not None:
                        trigger.late.on_elements(s["dyn"], "l", new_n, now_ms)
                        fire_late = trigger.late.should_fire(s["dyn"], "l", now_ms)
                        if fire_late:
                            trigger.late.on_fire(s["dyn"], "l")
                    if fire_late:
                        emit(s, "LATE", is_last=final_horizon)
                        emitted_closing = final_horizon
                if final_horizon:
                    # Closing pane over merging windows: FIRE_ALWAYS
                    # guarantees the session's final is_last pane at the
                    # lateness horizon even when nothing new arrived;
                    # default FIRE_IF_NON_EMPTY still fires when the pane
                    # holds data no earlier firing emitted (late element
                    # buffered by an unready late trigger) — Beam's
                    # "final pane if there is new data since the last
                    # firing" contract.
                    if not emitted_closing and (
                        closing_behavior == CLOSING_FIRE_ALWAYS or s["pane_n"]
                    ):
                        emit(s, "LATE", is_last=True)
                else:
                    keep.append(s)  # still refinable within lateness

        # 4. persist / GC / wake-up
        if keep:
            state.update((json.dumps({"sessions": keep}),))
            targets = []
            for s in keep:
                if not s["on_time_fired"]:
                    targets.append(s["end"] - lateness_ms)  # spark clock
                else:
                    targets.append(s["end"])  # GC point on spark clock
            state.setTimeoutTimestamp(max(min(targets), spark_wm + 1))
        elif state.exists:
            state.remove()

        if panes:
            yield pd.DataFrame(panes)

    return windowed.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType="sessions string",
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )
