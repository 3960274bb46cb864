"""Round-8 batch-2 semantics tests: BM25 ranking invariants, the
embedding-compression recall ladder's self-check, C4-normalized exact
dedup's containment of raw-text dedup, and the char-entropy gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.functions import text as T
from dataflowjavasdk_spark.queries.registry import get
from tests.conftest import SMOKE_SF


def test_char_entropy_crafted_values(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("ab",), ("abab",), ("aabb",)], "s string"
    )
    got = [
        r["e"]
        for r in df.select(F.round(T.char_entropy("s"), 9).alias("e"))
        .orderBy("s")
        .collect()
    ]
    # orderBy: aaaa, aabb, ab, abab → 0 bits, 1 bit, 1 bit, 1 bit
    assert got == [0.0, 1.0, 1.0, 1.0]


def test_char_entropy_gate_separates_injected_repetition(spark):
    rows = get("char_entropy_quality").fn(spark, SMOKE_SF).collect()
    natural = [r for r in rows if r["doc_id"] < 4_000_000]
    injected = [r for r in rows if r["doc_id"] >= 4_000_000]
    assert natural and injected
    # healthy fixture English never trips the gate
    assert all(not r["low_entropy"] for r in natural)
    # repeated-single-token docs sit strictly below every natural doc
    assert max(r["entropy"] for r in injected) < min(
        r["entropy"] for r in natural
    )
    # and the 3.0 production threshold actually fires on the injection
    assert any(r["low_entropy"] for r in injected)


def test_normalized_dedup_contains_raw_dedup_and_catches_mirrors(spark):
    exact = {
        r["canonical_id"]: r["group_size"]
        for r in get("dedup_exact").fn(spark, SMOKE_SF).collect()
    }
    norm = {
        r["canonical_id"]: r
        for r in get("normalized_exact_dedup").fn(spark, SMOKE_SF).collect()
    }
    # normalization only MERGES groups: every raw-text dup group survives
    # with the same canonical (mirror ids are +3M > all corpus ids, so the
    # min is unchanged) and at-least-equal size
    for canonical, size in exact.items():
        assert canonical in norm, f"raw dup group {canonical} lost"
        assert norm[canonical]["group_size"] >= size
    # every injected re-punctuated mirror (doc_id%10==5 → +3,000,000)
    # lands in a group — raw-text dedup cannot see any of them
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    n_mirrors = docs.filter(F.col("doc_id") % 10 == 5).count()
    caught = sum(1 for r in norm.values() if r["max_id"] >= 3_000_000)
    assert caught == n_mirrors


def test_bm25_ranking_invariants(spark):
    rows = get("bm25_retrieval_topk").fn(spark, SMOKE_SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) == 10  # 50-doc smoke corpus has ≥ 10 candidates
        # idf > 0 and tf-part > 0 → every matched doc scores positive
        assert all(r["score_micro"] > 0 for r in rs)
        # scores non-increasing in rank; ties broken by doc_id ascending
        for a, b in zip(rs, rs[1:]):
            assert a["score_micro"] > b["score_micro"] or (
                a["score_micro"] == b["score_micro"] and a["doc_id"] < b["doc_id"]
            )
        assert all(r["doc_id"] != qid for r in rs)


def test_compression_recall_self_check_and_bounds(spark):
    rows = get("embedding_compression_recall").fn(spark, SMOKE_SF).collect()
    assert len(rows) == 4 * 5  # 4 representations × 5 queries
    for r in rows:
        # n_exact is now MEASURED (ADVICE r8); structurally 10 whenever
        # the corpus holds >= 11 vectors, which every fixture does
        assert r["n_exact"] == 10
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert r["recall_pct"] == (r["n_hits"] * 100) // r["n_exact"]
    full = [r for r in rows if r["variant"] == "full_fp32"]
    assert len(full) == 5
    # the full-precision representation IS the ground truth
    assert all(r["recall_pct"] == 100 for r in full)
    bytes_by_variant = {r["variant"]: r["bytes_per_vec"] for r in rows}
    assert bytes_by_variant == {
        "full_fp32": 256,
        "dim32": 128,
        "dim16": 64,
        "int8": 68,
    }


def test_rrf_fusion_exactly_recomputable_from_legs(spark):
    """The fused score must equal the python-side recomputation from the
    two legs' ranks — catches any defect in the union, the point
    function, or the flag accounting."""
    from dataflowjavasdk_spark.queries.retrieval import _bm25_ranked, _RRF_C

    lex = {
        (r["query_id"], r["doc_id"]): r["rk"]
        for r in _bm25_ranked(spark, SMOKE_SF).collect()
    }
    # dense leg recomputed through the registered brute-force shape:
    # rebuild it exactly as the query does (cosine desc, vec_id tiebreak)
    emb = spark.read.parquet(f"{SMOKE_SF}/embeddings.parquet")
    import math

    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        # sequential left-fold double arithmetic — the engine's contract
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return dot / math.sqrt(na * nb)

    dense = {}
    for qid in (0, 1, 2):
        ranked = sorted(
            ((cos(vecs[qid], v), vid) for vid, v in vecs.items() if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        for rk, (_, vid) in enumerate(ranked, start=1):
            dense[(qid, vid)] = rk

    expected = {}
    for (qid, did), rk in lex.items():
        expected.setdefault((qid, did), [0, 0, 0])
        expected[(qid, did)][0] += math.floor(1e9 / (_RRF_C + rk))
        expected[(qid, did)][1] = 1
    for (qid, did), rk in dense.items():
        expected.setdefault((qid, did), [0, 0, 0])
        expected[(qid, did)][0] += math.floor(1e9 / (_RRF_C + rk))
        expected[(qid, did)][2] = 1

    got = get("hybrid_rrf_fusion").fn(spark, SMOKE_SF).collect()
    assert got and all(r["rk"] <= 10 for r in got)
    for r in got:
        key = (r["query_id"], r["doc_id"])
        exp_score, exp_lex, exp_dense = expected[key]
        assert r["rrf_nano"] == exp_score, key
        assert r["in_lexical"] == exp_lex and r["in_dense"] == exp_dense, key
    # the emitted top-10 is exactly the 10 highest expected fused scores
    for qid in (0, 1, 2):
        exp_top = sorted(
            ((v[0], did) for (q, did), v in expected.items() if q == qid),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        got_q = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rk"]
        )
        assert [(r["rrf_nano"], r["doc_id"]) for r in got_q] == exp_top


def test_label_precision_grid_and_bounds(spark):
    rows = get("retrieval_label_precision").fn(spark, SMOKE_SF).collect()
    grid = {(r["leg"], r["query_id"]) for r in rows}
    assert grid == {
        (leg, q) for leg in ("lexical", "dense", "fused") for q in (0, 1, 2)
    }
    for r in rows:
        # denominator is measured per (leg, query) — the BM25 leg may
        # retrieve < k on term-starved corpora (ADVICE r8); at fixture
        # scale every leg fills its k=10
        assert r["n_retrieved"] == 10
        assert 0 <= r["n_hits"] <= r["n_retrieved"]
        assert r["precision_pct"] == (r["n_hits"] * 100) // r["n_retrieved"]


def test_source_quality_cap_accounting(spark):
    rows = get("source_quality_cap").fn(spark, SMOKE_SF).collect()
    docs = spark.read.parquet(f"{SMOKE_SF}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_kept"] <= 15
        # dropped implies the cap was binding
        assert r["n_dropped"] == max(0, r["n_docs"] - 15)
        assert r["kept_tokens"] >= 0 and r["dropped_tokens"] >= 0
        if r["n_dropped"] == 0:
            assert r["dropped_tokens"] == 0


def test_char_entropy_handles_leading_nul(spark):
    """The run-length fold must not treat any real character as the
    pre-first-element state (a NUL sentinel once did)."""
    import math

    df = spark.createDataFrame([("\x00\x00a",), ("\x00",)], "s string")
    rows = (
        df.select("s", T.char_entropy_stats("s").alias("st"))
        .collect()
    )
    by_s = {r["s"]: r["st"] for r in rows}
    assert by_s["\x00"]["nd"] == 1
    assert by_s["\x00"]["ent_nats"] == 0.0
    st = by_s["\x00\x00a"]
    assert st["nd"] == 2
    expected = (2 / 3) * math.log(3 / 2) + (1 / 3) * math.log(3)
    assert abs(st["ent_nats"] - expected) < 1e-12


def test_bm25_plain_baseline_twin_is_row_identical(spark, monkeypatch):
    """BASELINE.md's BM25 comparable is only meaningful if the plain
    formulation computes the SAME relation as the engine query — pin
    that equivalence (it was hand-verified before the first protocol
    run; this keeps it true as either side evolves)."""
    import importlib
    import sys

    monkeypatch.setattr(sys, "argv", ["measure_baseline", SMOKE_SF])
    import tools.measure_baseline as mb

    mb = importlib.reload(mb)  # re-reads SF_DIR from the patched argv
    plain = mb.spark_queries(spark)["bm25_plain"]().collect()
    engine = get("bm25_retrieval_topk").fn(spark, SMOKE_SF).collect()
    key = lambda r: (r["query_id"], r["doc_id"], r["score_micro"], r["rk"])
    assert sorted(map(key, plain)) == sorted(map(key, engine))


def test_dim_energy_monotone_and_complete(spark):
    rows = sorted(
        get("embedding_dim_energy").fn(spark, SMOKE_SF).collect(),
        key=lambda r: r["idx"],
    )
    assert [r["idx"] for r in rows] == list(range(1, 65))
    assert all(r["variance"] > 0 for r in rows)
    # cumulative energy is strictly increasing and ends at exactly 100%
    cums = [r["cum_energy_bp"] for r in rows]
    assert cums == sorted(cums) and cums[-1] == 10000
    nanos = [r["cum_var_nano"] for r in rows]
    assert all(b > a for a, b in zip(nanos, nanos[1:]))
