"""Semantic invariants for the round-3c curation operators — properties
the oracle equality check can't express: Bloom-filter soundness (no false
negatives), Levenshtein exactness against an independent reference
implementation, incremental-dedup verdict correctness per construction,
redaction completeness, and grouping-set additivity.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.registry import get
from dataflowjavasdk_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF


def test_bloom_decontamination_has_no_false_negatives(spark):
    """A Bloom filter may over-report, never under-report: every doc the
    exact 8-gram check flags must appear in the bloom output with
    n_bloom >= its exact shared-gram count, and per row n_bloom >= n_exact."""
    bloom = {
        r["doc_id"]: (r["n_bloom"], r["n_exact"])
        for r in get("bloom_ngram_decontamination").fn(spark, SMOKE_SF).collect()
    }
    exact = {
        r["doc_id"]: r["n_shared"]
        for r in get("ngram_decontamination").fn(spark, SMOKE_SF).collect()
    }
    for doc_id, n_shared in exact.items():
        assert doc_id in bloom, f"doc {doc_id} exact-flagged but bloom-missed"
        n_bloom, n_exact = bloom[doc_id]
        assert n_exact == n_shared
        assert n_bloom >= n_exact
    for doc_id, (n_bloom, n_exact) in bloom.items():
        assert n_bloom >= n_exact >= 0


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_are_exact_and_find_truncations(spark):
    """Every emitted lev value must equal an independent Python
    Levenshtein on the pair's texts; rel <= 0.25 holds; and the fixture's
    constructed truncation pairs (base, base+2M) appear."""
    out = get("edit_distance_near_dups").fn(spark, SMOKE_SF).collect()
    from dataflowjavasdk_spark.queries.dedup import _corpus

    texts = {r["doc_id"]: r["text"] for r in _corpus(spark, SMOKE_SF).collect()}
    assert out, "expected at least one near-dup pair"
    for r in out[:50]:  # exactness spot-check is O(len^2) per pair
        lev = _levenshtein(texts[r["id_a"]], texts[r["id_b"]])
        assert lev == r["lev"]
        assert r["rel"] <= 0.25
    pair_keys = {(r["id_a"], r["id_b"]) for r in out}
    found = [
        (i, i + 2_000_000)
        for i in texts
        if i < 1_000_000 and (i, i + 2_000_000) in pair_keys
    ]
    assert found, "constructed truncation near-dups must be detected"


def test_banded_levenshtein_matches_unbanded_at_threshold_boundary(spark):
    """The round-10 banded verify keeps a pair iff
    levenshtein(a, b, floor(0.25·max_len)) >= 0, claiming that is
    exactly rel <= 0.25 with exact lev values for kept pairs. Pin the
    boundary: lev == floor(T·max) is kept with the true distance,
    lev == floor(T·max)+1 returns -1 (rejected), including max_len
    where T·max is exactly integral and the empty-string edge."""
    cases = [
        ("abcdefgh", "abcdefXY"),   # len 8, lev 2 = 0.25*8 → boundary keep
        ("abcdefgh", "abcdeXYZ"),   # len 8, lev 3 > 2 → reject
        ("abcd", "abcX"),           # len 4, lev 1 = floor(1.0) → keep
        ("abcd", "abXY"),           # len 4, lev 2 → reject
        ("abc", "abc"),             # lev 0 → keep
        ("", ""),                   # greatest(...,1) guard: band 0, lev 0
        ("ab", "abcdefghij"),       # length gap 8 > band 2 → reject w/o DP
    ]
    df = spark.createDataFrame(cases, "text_a string, text_b string")
    banded = F.expr(
        "levenshtein(text_a, text_b, cast(floor(0.25 * "
        "greatest(length(text_a), length(text_b), 1)) as int))"
    )
    rows = df.select(
        "text_a", "text_b", banded.alias("banded"), F.levenshtein("text_a", "text_b").alias("full")
    ).collect()
    for r in rows:
        mx = max(len(r["text_a"]), len(r["text_b"]), 1)
        kept_old = r["full"] / mx <= 0.25
        if kept_old:
            assert r["banded"] == r["full"], r
        else:
            assert r["banded"] == -1, r


def test_incremental_dedup_verdicts_match_construction(spark):
    """Every +1M batch doc is an exact copy -> verdict 'exact' with a
    match whose text fingerprint-normalizes identically; +2M docs are
    5-token truncations -> 'near' or 'exact' (never 'unique' unless the
    doc was too short to share capped grams, which the fixture avoids)."""
    out = get("incremental_dedup").fn(spark, SMOKE_SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SMOKE_SF, "documents").collect()
    }
    n_exact_ids = len([d for d in docs if d % 20 == 0])
    n_near_ids = len([d for d in docs if d % 10 == 0])
    assert len(out) == n_exact_ids + n_near_ids
    def grams(toks: list[str]) -> set[str]:
        return {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        }

    for r in out:
        if r["doc_id"] >= 2_000_000:
            # A truncation is 'near' exactly when its 3-gram Jaccard with
            # the base doc clears the 0.5 threshold (short docs may not).
            base = r["doc_id"] - 2_000_000
            toks = [t for t in docs[base].split(" ") if t]
            ga = grams(toks)
            gb = grams(toks[: max(len(toks) - 5, 1)])
            jacc = len(ga & gb) / max(len(ga | gb), 1)
            if jacc >= 0.5:
                assert r["verdict"] in ("near", "exact"), (
                    f"truncated copy of {base} (jacc={jacc:.2f}) "
                    f"classified {r['verdict']}"
                )
        else:
            base = r["doc_id"] - 1_000_000
            assert r["verdict"] == "exact"
            norm = re.sub(r"\s+", " ", docs[base].lower().strip())
            match_norm = re.sub(r"\s+", " ", docs[r["match_id"]].lower().strip())
            assert norm == match_norm


def test_pii_redaction_is_complete(spark):
    """Redacted docs: counts equal the injected span count and re-running
    the patterns over the reconstructed redacted text finds nothing."""
    out = {
        r["doc_id"]: r for r in get("pii_redaction").fn(spark, SMOKE_SF).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SMOKE_SF, "documents").collect()
    }
    email = re.compile(r"[a-z0-9.]+@[a-z0-9]+[.][a-z]+")
    url = re.compile(r"https?://[a-z0-9./_-]+")
    flagged = {d for d in docs if d % 7 == 0 or d % 11 == 0}
    assert set(out) == flagged
    for doc_id in flagged:
        expected = (1 if doc_id % 7 == 0 else 0) + (1 if doc_id % 11 == 0 else 0)
        assert out[doc_id]["n_redacted"] == expected
        text = docs[doc_id]
        if doc_id % 7 == 0:
            text += f" contact user{doc_id}@example.com"
        if doc_id % 11 == 0:
            text += f" see https://site{doc_id}.org/page"
        redacted = url.sub("<URL>", email.sub("<EMAIL>", text))
        assert not email.search(redacted) and not url.search(redacted)
        assert out[doc_id]["redacted_len"] == len(redacted)


def test_grouping_sets_are_additive(spark):
    """The () grand-total row must equal the sum of the (linestatus) rows,
    which must equal the sum of the (returnflag, linestatus) rows —
    exactly for counts, and within double re-association tolerance for
    revenue (each row is an exact decimal sum cast once to double)."""
    rows = get("grouping_sets_revenue").fn(spark, SMOKE_SF).collect()
    grand = [r for r in rows if r["returnflag"] == "ALL" and r["linestatus"] == "ALL"]
    per_ls = [r for r in rows if r["returnflag"] == "ALL" and r["linestatus"] != "ALL"]
    leaves = [r for r in rows if r["returnflag"] != "ALL" and r["linestatus"] != "ALL"]
    import math

    assert len(grand) == 1
    assert grand[0]["n"] == sum(r["n"] for r in per_ls) == sum(r["n"] for r in leaves)
    # money() floors EACH row's exact decimal sum to integer cents before
    # the double cast (helpers.py, round-9 cross-engine rule), so a group
    # of k rows can sum up to k cents below the grand total (which itself
    # floors once). Bound the additivity check by that worst case plus a
    # cent for the grand row; counts above stay exactly additive.
    assert math.isclose(
        grand[0]["revenue"],
        sum(r["revenue"] for r in per_ls),
        abs_tol=0.01 * (len(per_ls) + 1),
    )
    assert math.isclose(
        grand[0]["revenue"],
        sum(r["revenue"] for r in leaves),
        abs_tol=0.01 * (len(leaves) + 1),
    )


def test_bpe_train_until_convergence_round_count_independent(spark):
    """The production train-until loop (VERDICT r5 #6): with a
    data-derived threshold the loop must stop early, every adopted merge
    must clear the threshold, the hypothetical next merge must not, and
    raising the round budget must change NOTHING once converged —
    round-count independence at fixture scale. The fixed-round twin's
    first merges must be a prefix of the converged run (same argmax
    sequence, one implementation)."""
    from dataflowjavasdk_spark.queries.curation2 import (
        _bpe_step,
        _bpe_train_rounds,
        _bpe_train_until,
        _bpe_vocab_tok,
    )

    tok0 = _bpe_vocab_tok(spark, SMOKE_SF)
    # data-derived threshold: half the first round's best count decays
    # within a handful of rounds on any Zipf-ish corpus
    best0, _, _ = _bpe_step(tok0, 1)
    thr = best0.collect()[0]["cnt"] // 2

    outs, final_tok, n_rounds = _bpe_train_until(tok0, thr, max_rounds=20)
    assert 1 <= n_rounds < 20, "expected an early, data-driven stop"
    merges = [o.collect()[0] for o in outs]
    assert len(merges) == n_rounds
    assert all(m["pair_count"] >= thr for m in merges)
    # the merge the loop REFUSED is genuinely below threshold
    next_best, _, _ = _bpe_step(final_tok, n_rounds + 1)
    assert next_best.collect()[0]["cnt"] < thr

    # round-count independence: a bigger budget changes nothing
    outs2, final2, n2 = _bpe_train_until(tok0, thr, max_rounds=27)
    assert n2 == n_rounds
    assert [tuple(o.collect()[0]) for o in outs2] == [tuple(m) for m in merges]
    chk = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert chk(final2) == chk(final_tok)

    # the fixed-round twin is the converged run's prefix
    fixed, _ = _bpe_train_rounds(tok0, rounds=min(3, n_rounds))
    for f, m in zip(fixed, merges):
        assert tuple(f.collect()[0]) == tuple(m)
