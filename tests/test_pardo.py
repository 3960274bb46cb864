"""ParDo-family unit tests (mirrors historical tests/transforms/ParDoTest,
FilterTest, KeysTest, KvSwapTest, WithKeysTest, PartitionTest — the
DoFnTester analog: tiny literal DataFrames + order-insensitive asserts)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.core import Pipeline
from dataflowjavasdk_spark.operators import pardo


@pytest.fixture(scope="module")
def kv(spark):
    return Pipeline(spark).create(
        [("a", 1), ("a", 2), ("b", 3)], "key string, value int"
    )


def rows(pc):
    return sorted(tuple(r) for r in pc.collect())


def test_map_elements(kv):
    out = kv.map(key=F.upper("key"), doubled=F.col("value") * 2)
    assert rows(out) == [("A", 2), ("A", 4), ("B", 6)]


def test_filter_variants(spark, kv):
    assert rows(kv.filter(F.col("value") > 1)) == [("a", 2), ("b", 3)]
    df = kv.df
    assert pardo.Filter.less_than(df, "value", 2).count() == 1
    assert pardo.Filter.greater_than_eq(df, "value", 2).count() == 2
    assert pardo.Filter.equal(df, "key", "a").count() == 2


def test_flat_map_explode(spark):
    pc = Pipeline(spark).create([("a b c",), ("d",)], "line string")
    out = pc.flat_map(F.split("line", " "), out="word")
    assert rows(out) == [("a",), ("b",), ("c",), ("d",)]


def test_keys_values_swap(kv):
    assert rows(kv.keys()) == [("a",), ("a",), ("b",)]
    assert rows(kv.values()) == [(1,), (2,), (3,)]
    assert rows(kv.kv_swap()) == [(1, "a"), (2, "a"), (3, "b")]


def test_with_keys_and_timestamps(spark):
    pc = Pipeline(spark).create([(10,), (25,)], "value int")
    keyed = pc.with_keys(F.col("value") % 2, key="parity")
    assert rows(keyed.map(parity=F.col("parity"))) == [(0,), (1,)]
    stamped = pc.with_timestamps(F.timestamp_seconds(F.col("value")))
    assert stamped.ts_col == "ts"
    assert "ts" in stamped.df.columns


def test_partition_covers_all_elements(spark):
    pc = Pipeline(spark).create([(i,) for i in range(10)], "value int")
    parts = pc.partition(3, F.col("value"))
    sizes = [p.df.count() for p in parts]
    assert sum(sizes) == 10
    union = sorted(t[0] for p in parts for t in rows(p))
    assert union == list(range(10))


def test_pardo_dofn_bundle_lifecycle(spark):
    class AddTag(pardo.DoFn):
        def __init__(self):
            self.started = 0

        def start_bundle(self):
            self.started += 1

        def process(self, batch: pd.DataFrame):
            out = batch.assign(tagged=batch["value"] * 10)
            yield out[["tagged"]]

    pc = Pipeline(spark).create([(1,), (2,), (3,)], "value int")
    out = pc.par_do(AddTag(), "tagged int")
    assert rows(out) == [(10,), (20,), (30,)]


def test_pardo_multi_output_tags(spark):
    pc = Pipeline(spark).create([(1,), (2,), (3,), (4,)], "value int")
    outs = pc.par_do_with_outputs(
        F.when(F.col("value") % 2 == 0, "even").otherwise("odd"), ["even", "odd"]
    )
    assert rows(outs["even"]) == [(2,), (4,)]
    assert rows(outs["odd"]) == [(1,), (3,)]


def test_counting_input_and_observe(spark):
    pc = Pipeline(spark).counting_input(100)
    observed = pc.observe("metrics", F.sum("value"), F.count(F.lit(1)))
    assert observed.df.count() == 100


def test_python_udtf_as_table_function(spark):
    """DoFn-as-UDTF (SURVEY §2.11): a true table function — 1 row → N rows
    with multiple output columns — via pyspark.sql.functions.udtf, usable
    both as a function call and from SQL with LATERAL."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    got = sorted(tuple(r) for r in SplitWords(lit("the quick fox")).collect())
    assert got == [("fox", 2), ("quick", 1), ("the", 0)]

    spark.udtf.register("split_words", SplitWords)
    spark.createDataFrame([("a b",), ("c",)], "text string").createOrReplaceTempView(
        "udtf_docs"
    )
    rows = spark.sql(
        "SELECT text, word, pos FROM udtf_docs, LATERAL split_words(text)"
    ).collect()
    assert sorted(tuple(r) for r in rows) == [
        ("a b", "a", 0), ("a b", "b", 1), ("c", "c", 0)
    ]


def test_reshuffle_preserves_rows_and_rebalances(spark):
    """Reshuffle: identity on content; adds one round-robin exchange that
    spreads a skewed input (everything in 1 partition) across tasks."""
    pc = Pipeline(spark).counting_input(1000).apply(lambda df: df.coalesce(1))
    assert pc.df.rdd.getNumPartitions() == 1
    out = pc.reshuffle(8)
    assert out.df.rdd.getNumPartitions() == 8
    assert sorted(r[0] for r in out.collect()) == list(range(1000))
    assert "RoundRobinPartitioning" in out.df._jdf.queryExecution().executedPlan().toString()
