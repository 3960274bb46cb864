"""Flatten (SURVEY.md §2.4) — historical sdk/transforms/Flatten.java."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pcollections(*dfs: DataFrame) -> DataFrame:
    """Flatten.pCollections: bag union (union-all, no dedup) of same-typed
    collections. unionByName keeps it schema-safe; Catalyst collapses
    union chains and pushes consumers below the union (the reference
    service's "flatten unzipping", built-in)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def iterables(df: DataFrame, col: str | Column, out: str = "element") -> DataFrame:
    """Flatten.iterables: PC<Iterable<T>> → PC<T> via explode."""
    return df.select(F.explode(col).alias(out))
