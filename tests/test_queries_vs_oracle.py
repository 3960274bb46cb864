"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the DataflowAssert.containsInAnyOrder analog — order-insensitive
exact equality; SURVEY.md §5).

The driver runs the same comparison at sf0.01; this is the fast local gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SMOKE_SF
from tools.check_correctness import compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = _QUERIES[name](spark, SMOKE_SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    sql = _ORACLES.get(name)
    if sql is None:
        assert len(spark_rows) > 0, f"{name}: zero rows (rows-only query)"
        return
    cur = duck.execute(sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    issues, _ = compare(spark_rows, spark_cols, duck_rows, duck_cols)
    assert not issues, f"{name}: {issues}"
