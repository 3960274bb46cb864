"""Operator library: the reference's transform surface (SURVEY.md §2),
re-expressed as functions/classes that compile to Spark DataFrame plans.

Layout mirrors the historical package structure so parity is auditable:
- pardo.py      ← sdk/transforms/{ParDo,DoFn,MapElements,FlatMapElements,
                   Filter,Keys,Values,KvSwap,WithKeys,WithTimestamps,
                   Partition,Create}.java
- combine.py    ← sdk/transforms/{Combine,Count,Sum,Min,Max,Mean,Top,
                   Sample,ApproximateQuantiles,ApproximateUnique,
                   RemoveDuplicates}.java
- join.py       ← sdk/transforms/join/* + contrib/join-library + View.java
- flatten.py    ← sdk/transforms/Flatten.java
- sort.py       ← contrib/sorter (SortValues)
- windowing.py  ← sdk/transforms/windowing/*
"""

from dataflowjavasdk_spark.operators import (  # noqa: F401
    combine,
    flatten,
    join,
    pardo,
    sort,
    windowing,
)
