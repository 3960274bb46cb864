"""The testing surface itself (DataflowAssert/TestPipeline analogs) —
mirrors historical sdk/testing/DataflowAssertTest.java."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.core import Pipeline
from dataflowjavasdk_spark.testing import assert_that


def test_contains_in_any_order_passes_and_fails(spark):
    pc = Pipeline(spark).create([(1, "a"), (2, "b")], "id int, s string")
    assert_that(pc).contains_in_any_order([(2, "b"), (1, "a")])
    with pytest.raises(AssertionError, match="missing"):
        assert_that(pc).contains_in_any_order([(1, "a"), (3, "c")])


def test_empty_and_singleton(spark):
    p = Pipeline(spark)
    empty = p.create([(1,)], "v int").filter(F.col("v") > 10)
    assert_that(empty).is_empty()
    one = p.create([(5,), (7,)], "v int").apply(lambda df: df.agg(F.sum("v").alias("s")))
    assert_that(one).singleton_equals((12,))
    with pytest.raises(AssertionError, match="expected empty"):
        assert_that(one).is_empty()


def test_satisfies_custom_predicate(spark):
    pc = Pipeline(spark).counting_input(100)

    def all_nonneg(rows):
        assert all(r.value >= 0 for r in rows)

    assert_that(pc).satisfies(all_nonneg).contains_in_any_order(
        [(i,) for i in range(100)]
    )


def test_satisfies_falsy_return_fails(spark):
    """A predicate written in the documented 'return falsy-with-message'
    style must actually fail the assertion (was silently discarded)."""
    import pytest as _pytest

    from dataflowjavasdk_spark.core import PCollection
    from dataflowjavasdk_spark.testing import assert_that

    pc = PCollection(spark.createDataFrame([(1,)], "x int"))
    with _pytest.raises(AssertionError, match="satisfies"):
        assert_that(pc).satisfies(lambda rows: False)
    assert_that(pc).satisfies(lambda rows: True)
    assert_that(pc).satisfies(lambda rows: None)  # raise-style predicates
