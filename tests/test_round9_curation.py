"""Round-9 scale-planning semantics tests: LSH operating-point planner
invariants (s-curve monotonicity, probability bounds) and the sampled
dedup-rate estimator (fingerprint-bucket unbiasedness vs the uniform
control's collapse)."""

from __future__ import annotations

from dataflowjavasdk_spark.queries.registry import get
from tests.conftest import SMOKE_SF


def test_lsh_plan_recall_monotone_in_rows(spark):
    rows = get("lsh_plan_expected_recall").fn(spark, SMOKE_SF).collect()
    by_r = {r["r_rows"]: r for r in rows}
    # every config over the same observed pair set, full budget split
    assert sorted(by_r) == [1, 2, 4, 8, 16, 32, 64, 128]
    assert len({r["n_pairs"] for r in rows}) == 1
    assert all(r["r_rows"] * r["n_bands"] == 128 for r in rows)
    # probabilities are nano-unit bounded
    for r in rows:
        assert 0 <= r["mean_recall_e9"] <= 1_000_000_000
        assert 0 <= r["n_caught_half"] <= r["n_pairs"]
    # for pairs with s >= 0.5, detection probability 1-(1-s^r)^b falls
    # monotonically as rows-per-band grows (bands shrink with it): the
    # planner's whole point is making this trade measurable
    recalls = [by_r[2**k]["mean_recall_e9"] for k in range(8)]
    assert recalls == sorted(recalls, reverse=True)
    caught = [by_r[2**k]["n_caught_half"] for k in range(8)]
    assert caught == sorted(caught, reverse=True)
    # r=1 (128 OR-ed single-hash bands) catches essentially everything
    # observed at s >= 0.5
    assert by_r[1]["mean_recall_e9"] > 990_000_000


def test_dedup_rate_estimator_beats_uniform_control(spark):
    rows = {
        r["method"]: r
        for r in get("dedup_rate_bucket_estimate").fn(spark, SMOKE_SF).collect()
    }
    assert set(rows) == {"exact", "fingerprint_bucket", "doc_id_uniform"}
    exact = rows["exact"]
    fp = rows["fingerprint_bucket"]
    uni = rows["doc_id_uniform"]
    # the corpus construction injects exact duplicates — ground truth > 0
    assert exact["dup_permille"] > 0
    # both samples are genuine subsets
    assert 0 < fp["n_docs"] < exact["n_docs"]
    assert 0 < uni["n_docs"] < exact["n_docs"]
    # fingerprint-bucket sampling keeps duplicate groups whole: its rate
    # estimate lands nearer the truth than the uniform control, which
    # splits pairs (both members must survive a 1/7 draw => ~1/49 of
    # pairs) and collapses toward zero
    fp_err = abs(fp["dup_permille"] - exact["dup_permille"])
    uni_err = abs(uni["dup_permille"] - exact["dup_permille"])
    assert uni["dup_permille"] < exact["dup_permille"]
    assert fp_err < uni_err


def test_intra_doc_trim_removes_injection_and_stays_map_only(spark):
    from dataflowjavasdk_spark.plans import audit

    df = get("intra_doc_repetition_trim").fn(spark, SMOKE_SF)
    # scale pin: self-repetition trimming is per-row array algebra —
    # ZERO exchanges, zero Python evals (the whole point of the plan)
    p = audit(df)
    assert p.exchanges == 0
    assert p.python_evals == 0
    rows = df.collect()
    natural = [r for r in rows if r["doc_id"] < 4_000_000]
    injected = [r for r in rows if r["doc_id"] >= 4_000_000]
    assert natural and injected
    for r in rows:
        # first occurrence is always kept: token 1 is never covered
        assert 0 <= r["n_removed"] < r["n_tokens"]
    # every injected doc carries a 5x-repeated 3-token tail (15 tokens);
    # all repeats past the first appended gram must be trimmed
    assert all(r["n_removed"] >= 12 for r in injected)
    # each injected doc removes at least as much as its base doc plus
    # the repeated tail it gained
    base = {r["doc_id"]: r for r in natural}
    for r in injected:
        b = base[r["doc_id"] - 4_000_000]
        assert r["n_tokens"] == b["n_tokens"] + 15
        assert r["n_removed"] > b["n_removed"]


def test_trim_edge_cases_tiny_docs(spark):
    """Spark's sequence(1, 0) is DESCENDING [1, 0] (DuckDB's range(1,1)
    is empty) — pin the n<3 guards on crafted 0/1/2-token docs, plus a
    known removal and idempotence on the trimmed output."""
    from pyspark.sql import functions as F

    from dataflowjavasdk_spark.queries.curation6 import _trim_repeated_trigrams

    rows = [
        (0, []),                          # empty doc
        (1, ["a"]),                       # 1 token
        (2, ["a", "b"]),                  # 2 tokens
        (3, ["a", "b", "c"]),             # 3 tokens, no repeat
        (4, "a b c a b c a b c".split()), # trigram repeated twice
        (5, "x x x x x x".split()),       # degenerate same-token run
    ]
    df = spark.createDataFrame(rows, "doc_id long, tk array<string>")
    got = {
        r["doc_id"]: r
        for r in _trim_repeated_trigrams(df)
        .select("doc_id", "n", "kept_tk")
        .collect()
    }
    # sub-3-token docs: nothing fabricated, nothing removed
    assert got[0]["kept_tk"] == []
    assert got[1]["kept_tk"] == ["a"]
    assert got[2]["kept_tk"] == ["a", "b"]
    assert got[3]["kept_tk"] == ["a", "b", "c"]
    # repeats trimmed to the first occurrence
    assert got[4]["kept_tk"] == ["a", "b", "c"]
    # overlap semantics: occurrences at 2,3,4 are repeats of the gram at
    # 1, and their 3-token covers reach back over positions 2-3 — only
    # the very first token survives a same-token run
    assert got[5]["kept_tk"] == ["x"]
    # idempotence: trimming the trimmed tokens removes nothing more
    trimmed = spark.createDataFrame(
        [(k, r["kept_tk"]) for k, r in got.items()],
        "doc_id long, tk array<string>",
    )
    again = {
        r["doc_id"]: r["kept_tk"]
        for r in _trim_repeated_trigrams(trimmed).select("doc_id", "kept_tk").collect()
    }
    for k in got:
        assert again[k] == got[k]["kept_tk"]
