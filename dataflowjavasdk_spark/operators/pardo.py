"""The ParDo family — element-wise transforms (SURVEY.md §2.1).

Reference surface: ParDo.of(DoFn) with bundle lifecycle, side inputs and
multi-output tags (historical sdk/transforms/ParDo.java ~1,300 LoC +
DoFn.java ~600 LoC). Here the universal element-wise op splits into:

- expression path (preferred): select/withColumn/filter on Columns —
  stays inside WholeStageCodegen, fully optimizable by Catalyst. The
  reference could never do this: its DoFns are opaque Java (SURVEY.md §4.1).
- vectorized Python path: mapInPandas over Arrow batches — the DoFn
  bundle lifecycle (startBundle/processElement/finishBundle) maps to
  (generator setup / per-batch body / generator cleanup).

Scale: a DoFn expressed as Columns costs ~nothing; a DoFn that must run
Python costs one Arrow round-trip per batch — still 10-100× faster than
row-at-a-time UDFs, and it pipelines (no shuffle, no materialization).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class DoFn:
    """Per-bundle Python transform over Arrow batches.

    Mirrors the reference DoFn contract (historical sdk/transforms/DoFn.java):
    ``start_bundle`` / ``process`` / ``finish_bundle``, where ``process``
    receives a pandas DataFrame (a bundle = an Arrow batch) and yields
    zero-or-more output DataFrames — the 0..N output freedom of
    ``processElement`` vectorized.
    """

    def start_bundle(self) -> None:  # noqa: B027
        """Per-task setup (open connections, load models, ...)."""

    def process(self, batch: pd.DataFrame) -> Iterable[pd.DataFrame]:
        raise NotImplementedError

    def finish_bundle(self) -> Iterable[pd.DataFrame]:  # noqa: B027
        """Flush buffered state; yields trailing output batches."""
        return ()


class ParDo:
    """ParDo.of(dofn) — apply a DoFn with bundle lifecycle via mapInPandas."""

    @staticmethod
    def of(dofn: DoFn, output_schema: StructType | str) -> Callable[[DataFrame], DataFrame]:
        def transform(df: DataFrame) -> DataFrame:
            def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                dofn.start_bundle()
                for batch in batches:
                    yield from dofn.process(batch)
                yield from dofn.finish_bundle()

            return df.mapInPandas(run, schema=output_schema)

        return transform

    @staticmethod
    def with_output_tags(
        df: DataFrame, tag_col: Column, tags: Iterable[str]
    ) -> dict[str, DataFrame]:
        """Multi-output ParDo (ParDo.withOutputTags / TupleTag, historical
        sdk/values/TupleTag.java): compute the discriminator once, cache,
        then one filter per tag. The cache trades one materialization for
        N passes — the same cost shape as the reference's multi-output
        (which also materializes each tagged stream through shuffle)."""
        tagged = df.withColumn("__tag__", tag_col).cache()
        return {
            tag: tagged.filter(F.col("__tag__") == tag).drop("__tag__") for tag in tags
        }


def map_elements(df: DataFrame, **named_exprs: Column) -> DataFrame:
    """MapElements.via (historical sdk/transforms/MapElements.java): 1→1
    typed map as a pure projection."""
    return df.select(*[expr.alias(name) for name, expr in named_exprs.items()])


def flat_map_elements(df: DataFrame, array_expr: Column, out: str, keep: list[str] | None = None) -> DataFrame:
    """FlatMapElements.via (historical sdk/transforms/FlatMapElements.java):
    1→N via explode of an array expression — generator projection, no
    Python, no shuffle."""
    cols = [F.col(c) for c in (keep or [])]
    return df.select(*cols, F.explode(array_expr).alias(out))


class Filter:
    """Filter.by + comparison sugar (historical sdk/transforms/Filter.java)."""

    @staticmethod
    def by(df: DataFrame, predicate: Column) -> DataFrame:
        return df.filter(predicate)

    @staticmethod
    def less_than(df: DataFrame, col: str, value: Any) -> DataFrame:
        return df.filter(F.col(col) < value)

    @staticmethod
    def less_than_eq(df: DataFrame, col: str, value: Any) -> DataFrame:
        return df.filter(F.col(col) <= value)

    @staticmethod
    def greater_than(df: DataFrame, col: str, value: Any) -> DataFrame:
        return df.filter(F.col(col) > value)

    @staticmethod
    def greater_than_eq(df: DataFrame, col: str, value: Any) -> DataFrame:
        return df.filter(F.col(col) >= value)

    @staticmethod
    def equal(df: DataFrame, col: str, value: Any) -> DataFrame:
        return df.filter(F.col(col) == value)


def keys(df: DataFrame, key: str = "key") -> DataFrame:
    """Keys.create (historical sdk/transforms/Keys.java)."""
    return df.select(key)


def values(df: DataFrame, value: str = "value") -> DataFrame:
    """Values.create (historical sdk/transforms/Values.java)."""
    return df.select(value)


def kv_swap(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """KvSwap.create (historical sdk/transforms/KvSwap.java)."""
    return df.select(F.col(value).alias(key), F.col(key).alias(value))


def with_keys(df: DataFrame, key_expr: Column, key: str = "key") -> DataFrame:
    """WithKeys.of (historical sdk/transforms/WithKeys.java): attach a
    computed key column. KV<K,V> ≡ (key column, remaining columns)."""
    return df.withColumn(key, key_expr)


def with_timestamps(df: DataFrame, ts_expr: Column, ts: str = "ts") -> DataFrame:
    """WithTimestamps.of (historical sdk/transforms/WithTimestamps.java):
    assign event-time timestamps; downstream windowing and watermarks key
    off this column."""
    return df.withColumn(ts, ts_expr)


def partition(df: DataFrame, n: int, fn: Column) -> list[DataFrame]:
    """Partition.of(n, fn) (historical sdk/transforms/Partition.java):
    split into n collections by a computed partition index ∈ [0, n)."""
    part = df.withColumn("__p__", fn % n)
    return [part.filter(F.col("__p__") == i).drop("__p__") for i in range(n)]


def create(spark, values: list, schema) -> DataFrame:
    """Create.of (historical sdk/transforms/Create.java): in-memory source."""
    return spark.createDataFrame(values, schema)


def reshuffle(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Reshuffle (historical sdk/util/Reshuffle.java): a fusion break that
    redistributes rows so downstream work is load-balanced independently of
    upstream partitioning. The reference implemented it as a random-key
    GroupByKey + ungroup; here it is a single round-robin exchange
    (Exchange RoundRobinPartitioning) — same rebalancing, no key
    materialization. Use before expensive per-row work whose input arrives
    skewed (e.g. a filter that kept 0.1% of rows in a few partitions).

    At 100 TB: this is the one shuffle you ADD on purpose; size it with
    `num_partitions` (default: spark.sql.shuffle.partitions) so each task
    gets 128-256 MB."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    return df.repartition(num_partitions)
