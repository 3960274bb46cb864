"""Pipeline testing surface (SURVEY.md §5.1) — the analogs of the
reference's sdk/testing package:

- `TestPipeline` (historical sdk/testing/TestPipeline.java): a Pipeline
  over a local session with tiny shuffle fan-out.
- `assert_that` (historical sdk/testing/DataflowAssert.java — PAssert in
  later Beam): assertions on a PCollection's CONTENT as an unordered bag,
  the model's §1.1 invariant. `containsInAnyOrder` ≡ contains_in_any_order,
  `satisfies` ≡ satisfies, plus singleton/empty helpers.

Unlike the reference (which ran assertions INSIDE the pipeline as side
effects of a ParDo, because results were unreachable from the driver),
Spark can just collect the tiny test output — same contract, simpler
mechanics. Used by tests/test_testing_surface.py and available to users
as the supported way to unit-test their own pipelines.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import SparkSession

from dataflowjavasdk_spark.core import Pipeline, PCollection


class TestPipeline(Pipeline):
    """TestPipeline.create(): a Pipeline wired to a local session with
    small shuffle fan-out (fast on tiny data, still exercises exchanges)."""

    @staticmethod
    def create(app_name: str = "test-pipeline") -> "TestPipeline":
        from dataflowjavasdk_spark.session import get_spark

        return TestPipeline(get_spark(app_name=app_name, shuffle_partitions=4))


def _as_bag(rows: Iterable[Any]) -> list[tuple]:
    out = []
    for r in rows:
        out.append(tuple(r) if not isinstance(r, (str, bytes)) else (r,))
    return sorted(out, key=repr)


class PCollectionAssert:
    """Fluent assertion handle; every method raises AssertionError with a
    bag-diff message on mismatch and returns self for chaining."""

    def __init__(self, pc: PCollection | Any):
        self._df = pc.df if isinstance(pc, PCollection) else pc
        self._rows = None

    def _collected(self) -> list:
        if self._rows is None:
            self._rows = self._df.collect()
        return self._rows

    def contains_in_any_order(self, expected: Iterable[Any]) -> "PCollectionAssert":
        got, want = _as_bag(self._collected()), _as_bag(expected)
        if got != want:
            missing = [r for r in want if r not in got]
            extra = [r for r in got if r not in want]
            raise AssertionError(
                f"PCollection mismatch.\n  missing: {missing}\n  unexpected: {extra}"
            )
        return self

    def is_empty(self) -> "PCollectionAssert":
        got = self._collected()
        if got:
            raise AssertionError(f"expected empty PCollection, got {len(got)} rows: {got[:5]}")
        return self

    def singleton_equals(self, expected: Any) -> "PCollectionAssert":
        got = self._collected()
        if len(got) != 1:
            raise AssertionError(f"expected exactly 1 row, got {len(got)}")
        if _as_bag(got) != _as_bag([expected]):
            raise AssertionError(f"singleton mismatch: got {tuple(got[0])}, want {expected}")
        return self

    def satisfies(self, fn: Callable[[list], Any]) -> "PCollectionAssert":
        """SerializableFunction check: fn receives the collected rows (an
        unordered bag); it may raise on failure, or return a falsy non-None
        value (e.g. False or an empty/failure message) — both fail the
        assertion. Returning None or a truthy value passes."""
        result = fn(self._collected())
        if result is not None and not result:
            raise AssertionError(f"satisfies predicate failed: {result!r}")
        return self


def assert_that(pc: PCollection | Any) -> PCollectionAssert:
    """DataflowAssert.that(pc) — entry point."""
    return PCollectionAssert(pc)
