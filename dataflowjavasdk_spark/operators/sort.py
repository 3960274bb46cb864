"""SortValues — per-key secondary sort (SURVEY.md §2.5).

Reference: contrib/sorter SortValues.java + BufferedExternalSorter.java
(in-memory buffer → disk merge, ~700 LoC of explicit spill machinery).
Spark's UnsafeExternalSorter gives the same spill-to-disk behavior inside
sortWithinPartitions for free.

The model deliberately has no global sort (PCollections are unordered);
our engine exposes Spark's range-partitioned orderBy anyway as an
extension (SURVEY.md §2.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_values(
    df: DataFrame, keys: Sequence[str], secondary: Sequence[str]
) -> DataFrame:
    """SortValues.create: within each key, values ordered by the secondary
    key. Implementation: hash-partition by key, then a partition-local
    external sort on (key, secondary) — one shuffle, no global ordering
    imposed (matching the reference's contract, which orders only within
    a key's iterable)."""
    return df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *keys, *secondary
    )


def sorted_iterables(
    df: DataFrame, keys: Sequence[str], secondary: str, value: str, out: str = "values"
) -> DataFrame:
    """GBK + per-key sorted iterable: groupBy(key).agg(sort_array(
    collect_list(struct(secondary, value)))) — the exact output shape of
    the reference's SortValues (KV<K, Iterable<KV<K2,V>>>)."""
    return df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct(secondary, value))).alias(out)
    )
