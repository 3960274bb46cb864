"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        "sum_value",
    }


def test_every_query_has_callable_and_named_columns(spark):
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_reference_known_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys without queries(): {unknown}"
