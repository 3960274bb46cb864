"""WindowFn unit tests (mirrors historical tests/transforms/windowing/
WindowingTest + WindowFnTestUtils patterns: timestamped fixture rows at
0s,5s,9s,12s,30s — FIXTURES.md micro-fixtures)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.core import Pipeline
from dataflowjavasdk_spark.operators import windowing


@pytest.fixture(scope="module")
def stamped(spark):
    rows = [("k", s) for s in (0, 5, 9, 12, 30)]
    pc = Pipeline(spark).create(rows, "key string, sec int")
    return pc.with_timestamps(F.timestamp_seconds(F.col("sec")))


def _epoch(dt: datetime.datetime) -> int:
    return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp())


def test_fixed_windows_assignment(stamped):
    out = stamped.window_into(windowing.FixedWindows("10 seconds")).assign_windows()
    got = sorted(
        (_epoch(r["window"]["start"]), r["sec"]) for r in out.collect()
    )
    # 0,5,9 → [0,10); 12 → [10,20); 30 → [30,40)
    assert got == [(0, 0), (0, 5), (0, 9), (10, 12), (30, 30)]


def test_sliding_windows_multi_assignment(stamped):
    out = (
        stamped.window_into(windowing.SlidingWindows("10 seconds", "5 seconds"))
        .count_per_key(["key"])
    )
    got = {
        _epoch(r["window"]["start"]): r["n"] for r in out.collect()
    }
    # element@0 ∈ [-5,5),[0,10); @5 ∈ [0,10),[5,15); @9 ∈ [0,10),[5,15); ...
    assert got[0] == 3 and got[5] == 3


def test_sessions_merge_at_gbk(stamped):
    out = stamped.window_into(windowing.Sessions("10 seconds")).count_per_key(["key"])
    got = sorted(
        (_epoch(r["window"]["start"]), _epoch(r["window"]["end"]), r["n"])
        for r in out.collect()
    )
    # 0,5,9,12 merge (gaps <10s) → [0, 22); 30 alone → [30, 40)
    assert got == [(0, 22, 4), (30, 40, 1)]


def test_sessions_gaps_islands_row_identity(spark):
    """The gaps-and-islands batch formulation (VERDICT r8 #2 race — lost
    to native session_window 366 vs 261 ms at sf0.1, kept for
    per-element session-id consumers) must emit rows IDENTICAL to the
    native merge, static and dynamic gap alike, on real fixture data."""
    from tests.conftest import SMOKE_SF

    from dataflowjavasdk_spark.sources.tables import load_table

    ev = load_table(spark, SMOKE_SF, "events").select("user_id", "ts")

    # static gap
    fn = windowing.Sessions("30 minutes")
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("window"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "window.start", "window.end", "n")
    )
    gi = (
        fn.group_by_gaps_islands(ev, ["user_id"])
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "window.start", "window.end", "n")
    )
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, gi.collect()))

    # dynamic (per-element) gap: even user_ids get a tighter gap
    # (duration STRINGS — session_window's dynamic-gap contract)
    gap = F.when(F.col("user_id") % 2 == 0, F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    fn_dyn = windowing.Sessions(gap)
    native_d = (
        ev.groupBy(F.session_window("ts", gap).alias("window"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "window.start", "window.end", "n")
    )
    gi_d = (
        fn_dyn.group_by_gaps_islands(ev, ["user_id"])
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "window.start", "window.end", "n")
    )
    assert sorted(map(tuple, native_d.collect())) == sorted(map(tuple, gi_d.collect()))


def test_global_window_plain_groupby(stamped):
    out = stamped.count_per_key(["key"])
    assert [tuple(r) for r in out.collect()] == [("k", 5)]


def test_calendar_windows_month(spark):
    rows = [("2024-01-05",), ("2024-01-31",), ("2024-02-01",), ("2024-12-31",)]
    pc = (
        Pipeline(spark)
        .create(rows, "d string")
        .with_timestamps(F.to_timestamp("d"))
        .window_into(windowing.CalendarWindows.months())
        .assign_windows()
    )
    got = sorted(
        (str(r["window"]["start"]), str(r["window"]["end"])) for r in pc.collect()
    )
    assert got == [
        ("2024-01-01 00:00:00", "2024-02-01 00:00:00"),
        ("2024-01-01 00:00:00", "2024-02-01 00:00:00"),
        ("2024-02-01 00:00:00", "2024-03-01 00:00:00"),
        ("2024-12-01 00:00:00", "2025-01-01 00:00:00"),
    ]


def test_calendar_windows_month_tz_offset_boundaries(spark):
    """CalendarWindows.months(tz_offset) — the month-boundary + timezone
    bug site (VERDICT r3 #4). With a −08:00 civil calendar: an instant at
    07:59 UTC on the civil 1st still belongs to the PREVIOUS month's
    window, 08:00 UTC opens the new one; Feb's end honors leap years; and
    window boundaries stay instants (start/end are the local midnights
    shifted back to the shared timeline)."""
    rows = [
        ("2024-02-01 07:59:59",),  # local Jan 31 23:59 → January window
        ("2024-02-01 08:00:00",),  # local Feb 1 00:00 → February window
        ("2024-03-01 07:59:59",),  # local Feb 29 23:59 (leap) → February
        ("2024-03-01 08:00:00",),  # local Mar 1 → March
    ]
    pc = (
        Pipeline(spark)
        .create(rows, "d string")
        .with_timestamps(F.to_timestamp("d"))
        .window_into(windowing.CalendarWindows.months("-8 hours"))
        .assign_windows()
    )
    got = sorted(
        (str(r["window"]["start"]), str(r["window"]["end"])) for r in pc.collect()
    )
    assert got == [
        ("2024-01-01 08:00:00", "2024-02-01 08:00:00"),
        ("2024-02-01 08:00:00", "2024-03-01 08:00:00"),
        ("2024-02-01 08:00:00", "2024-03-01 08:00:00"),
        ("2024-03-01 08:00:00", "2024-04-01 08:00:00"),
    ]


def test_calendar_windows_year_positive_offset(spark):
    """Years + a non-hour-aligned positive offset (IST +05:30): the civil
    year flips at 18:30 UTC Dec 31, and a leap-year window is 366 days."""
    rows = [
        ("2023-12-31 18:29:59",),  # local Dec 31 23:59 → 2023 window
        ("2023-12-31 18:30:00",),  # local Jan 1 00:00 → 2024 window
    ]
    pc = (
        Pipeline(spark)
        .create(rows, "d string")
        .with_timestamps(F.to_timestamp("d"))
        .window_into(windowing.CalendarWindows.years("5 hours 30 minutes"))
        .assign_windows()
    )
    got = sorted(
        (str(r["window"]["start"]), str(r["window"]["end"])) for r in pc.collect()
    )
    assert got == [
        ("2022-12-31 18:30:00", "2023-12-31 18:30:00"),
        ("2023-12-31 18:30:00", "2024-12-31 18:30:00"),
    ]
    # 2024 is a leap year: the window spans 366 days.
    span = datetime.datetime(2024, 12, 31) - datetime.datetime(2023, 12, 31)
    assert span.days == 366


def test_sessions_assign_raises(stamped):
    with pytest.raises(TypeError):
        windowing.Sessions("10 seconds").assign(F.col("ts"))


def test_output_time_fn_batch_policies(stamped):
    """Batch OutputTimeFn: combine_per_key(output_time=...) attaches
    emit_ts — EARLIEST/LATEST as min/max(ts) accumulators, END_OF_WINDOW
    as window.end − 1 ms (Beam's maxTimestamp)."""
    fixed = stamped.window_into(windowing.FixedWindows("10 seconds"))
    aggs = {"n": F.count(F.lit(1))}

    def by_window(pc):
        return {
            _epoch(r["window"]["start"]): r["emit_ts"]
            for r in pc.collect()
        }

    earliest = by_window(
        fixed.combine_per_key(["key"], aggs, output_time=windowing.OutputTimeFn.EARLIEST)
    )
    latest = by_window(
        fixed.combine_per_key(["key"], aggs, output_time=windowing.OutputTimeFn.LATEST)
    )
    eow = by_window(
        fixed.combine_per_key(["key"], aggs, output_time=windowing.OutputTimeFn.END_OF_WINDOW)
    )
    assert {k: _epoch(v) for k, v in earliest.items()} == {0: 0, 10: 12, 30: 30}
    assert {k: _epoch(v) for k, v in latest.items()} == {0: 9, 10: 12, 30: 30}
    # end-of-window: 9.999s / 19.999s / 39.999s
    assert {k: v.microsecond for k, v in eow.items()} == {0: 999000, 10: 999000, 30: 999000}
    assert {k: _epoch(v.replace(microsecond=0)) for k, v in eow.items()} == {0: 9, 10: 19, 30: 39}


def test_output_time_fn_global_window_null_end(spark):
    """END_OF_WINDOW under the global window (unbounded end) emits NULL."""
    pc = (
        Pipeline(spark)
        .create([("k", 1)], "key string, sec int")
        .with_timestamps(F.timestamp_seconds(F.col("sec")))
    )
    out = pc.combine_per_key(
        ["key"], {"n": F.count(F.lit(1))},
        output_time=windowing.OutputTimeFn.END_OF_WINDOW,
    ).collect()
    assert out[0]["emit_ts"] is None


def test_interval_merge_semantics(spark):
    """merge_intervals: overlapping [start,end) per key union into one
    window; disjoint stay apart; adjacent (start == prior end) do NOT
    merge (half-open intervals, Beam IntervalWindow semantics)."""
    rows = [
        # key a: [0,10) + [5,20) overlap → [0,20); [20,30) adjacent → separate
        ("a", 0, 10), ("a", 5, 20), ("a", 20, 30),
        # key b: fully nested [0,100) ⊃ [10,20) → one window [0,100)
        ("b", 0, 100), ("b", 10, 20),
    ]
    df = spark.createDataFrame(rows, "key string, s int, e int").select(
        "key",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    out = windowing.merge_intervals(df, ["key"], F.col("s"), F.col("e"))
    got = sorted(
        (r["key"], _epoch(r["window"]["start"]), _epoch(r["window"]["end"]))
        for r in out.collect()
    )
    assert got == [
        ("a", 0, 20), ("a", 0, 20), ("a", 20, 30),
        ("b", 0, 100), ("b", 0, 100),
    ]


def test_custom_merging_window_fn_via_group_by(spark):
    """IntervalMergingWindowFn end-to-end through group_by_window."""
    class Pad(windowing.IntervalMergingWindowFn):
        def assign_interval(self, ts):
            return ts - F.expr("INTERVAL 2 SECONDS"), ts + F.expr("INTERVAL 2 SECONDS")

    rows = [("k", 0), ("k", 3), ("k", 20)]  # 0 and 3 overlap via ±2s padding
    df = spark.createDataFrame(rows, "key string, sec int").select(
        "key", F.timestamp_seconds("sec").alias("ts")
    )
    out = (
        windowing.group_by_window(df, Pad(), ["key"], "ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = sorted((_epoch(r["window"]["start"]), r["n"]) for r in out)
    assert got == [(-2, 2), (18, 1)]
