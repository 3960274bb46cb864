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


def test_generated_order_is_new_changed_then_stalest():
    """The driver-emission order is GENERATED (round 9): never-sampled
    queries first, then _CHANGED_THIS_ROUND re-entries, then ascending
    latest-evidence round — and it must be a permutation of the registry
    (a generator bug dropping or duplicating a name would silently lose
    a query from the driver gate)."""
    from dataflowjavasdk_spark.queries import registry as R

    R._load_all()
    ordered = [rq.name for rq in R._ordered()]
    assert sorted(ordered) == sorted(R._REGISTRY), "order is not a permutation"
    latest = R._driver_evidence_rounds()
    changed = [n for n in R._CHANGED_THIS_ROUND if n not in R._REGISTRY]
    assert not changed, f"_CHANGED_THIS_ROUND names not registered: {changed}"

    def group(n: str) -> int:
        if n not in latest:
            return 0
        return 1 if n in R._CHANGED_THIS_ROUND else 2

    groups = [group(n) for n in ordered]
    assert groups == sorted(groups), "groups out of order (new, changed, stale)"
    # within the stale group, evidence rounds must be non-decreasing
    stale_rounds = [latest[n] for n in ordered if group(n) == 2]
    assert stale_rounds == sorted(stale_rounds), "stale cohort not oldest-first"


def test_priority_prefix_maximizes_fresh_driver_coverage():
    """The driver samples a 50-entry prefix of queries() per round; a slot
    spent on a query already green in the LAST round's CORRECTNESS file is
    a slot a never/stale-checked query lost (derived here instead of a
    hand-counted registry comment, per r3 ADVICE). Skips if no driver
    CORRECTNESS artifact exists (fresh checkout)."""
    import json
    import os
    import re

    import pytest

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        f for f in os.listdir(root) if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    if not rounds:
        pytest.skip("no driver CORRECTNESS artifact yet")
    from dataflowjavasdk_spark.queries.registry import _PRIORITY_ROUND

    latest_round = int(re.findall(r"\d+", rounds[-1])[0])
    if latest_round >= _PRIORITY_ROUND:
        pytest.skip(
            f"_CHANGED_THIS_ROUND was pruned for round {_PRIORITY_ROUND} and "
            f"the driver has already recorded round {latest_round} — the "
            "generated order self-rotates, but prune the changed set and "
            "bump _PRIORITY_ROUND, then this invariant re-arms"
        )
    with open(os.path.join(root, rounds[-1])) as fh:
        last = {
            name
            for name, row in json.load(fh).items()
            # Green means FULLY green: a rows_match row whose values
            # hash-mismatched (hash_match=false — three such rows exist in
            # CORRECTNESS_r01) is exactly a query that must be allowed
            # back into the sample prefix, not counted as covered.
            if row.get("err") is None
            and row.get("rows_match")
            and row.get("schema_match") is not False
            and row.get("hash_match") is not False
        }
    from dataflowjavasdk_spark.queries import all_queries

    from dataflowjavasdk_spark.queries.registry import _CHANGED_THIS_ROUND

    prefix = list(all_queries())[:50]
    # A query whose code/oracle materially changed this round re-enters
    # the sample even though its previous row is green — that row
    # describes the old code. The registry declares exactly which.
    wasted = [n for n in prefix if n in last and n not in _CHANGED_THIS_ROUND]
    assert not wasted, (
        f"{len(wasted)} of the 50 driver sample slots repeat queries already "
        f"green in {rounds[-1]}: {wasted}"
    )


def test_bench_contract_line_fits_driver_capture():
    """The driver's tail capture is 2,000 chars; rounds 3 AND 4 both lost
    BENCH_r{N}.json to an over-wide console line. Construct the line with
    the CURRENT headline list and worst-plausible widths (9999 ms per
    query, 4-decimal totals) and pin it under bench.py's own 1,800-byte
    assertion so headline growth can't silently re-break the contract."""
    import bench

    names = list(bench.HEADLINE)
    payload = {
        "metric": "headline_queries_warm_total",
        "value": 9999.9999,
        "unit": "sec",
        "queries": {n: 9.9990 for n in names},
        "first_run_total": 9999.9999,
        "sf": 0.1,
    }
    line = bench.contract_line(payload)
    assert len(line) <= 1800, f"{len(line)} bytes at {len(names)} queries"
    # Shortened keys must stay unique (a collision would silently merge
    # two queries' timings in the driver artifact).
    keymap = bench.short_keys(names)
    assert len(set(keymap.values())) == len(names)
    # And the line must be valid JSON with every query represented.
    import json as _json

    parsed = _json.loads(line)
    assert len(parsed["queries"]) == len(names)
    assert parsed["queries_unit"] == "ms"
