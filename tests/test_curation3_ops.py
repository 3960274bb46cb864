"""Behavioral tests for the round-4 curation batch (queries/curation3.py);
exact values are covered by the DuckDB oracles — these pin the semantic
properties that must hold at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.registry import get
from tests.conftest import SMOKE_SF


def test_filter_funnel_is_monotone(spark):
    """Each successive stage can only shrink the survivor set, per source."""
    for r in get("curation_filter_funnel").fn(spark, SMOKE_SF).collect():
        assert (
            r["n_total"] >= r["n_pass_len"] >= r["n_pass_rep"] >= r["n_pass_all"]
        ), r


def test_vocab_coverage_curve_is_monotone(spark):
    rows = sorted(
        get("vocab_coverage_curve").fn(spark, SMOKE_SF).collect(),
        key=lambda r: r["pct"],
    )
    assert [r["pct"] for r in rows] == [50, 90, 99]
    ranks = [r["top_tokens"] for r in rows]
    shares = [r["cum_share"] for r in rows]
    assert ranks == sorted(ranks)
    assert shares == sorted(shares)
    for r in rows:
        # the crossing rank's share actually reaches its threshold
        assert r["cum_share"] >= r["pct"] / 100.0


def test_source_repetition_mix_bounds_and_determinism(spark):
    """n_out is bounded by [floor(w), ceil(w)] epochs of the source's
    docs, and the draw is replayable (two runs agree exactly)."""
    q = get("source_repetition_mix").fn
    a = {r["source"]: r.asDict() for r in q(spark, SMOKE_SF).collect()}
    b = {r["source"]: r.asDict() for r in q(spark, SMOKE_SF).collect()}
    assert a == b  # deterministic / replayable
    for src, r in a.items():
        full = r["epochs_centi"] // 100
        assert full * r["n_docs"] <= r["n_out"] <= (full + 1) * r["n_docs"], r
    # fractional epochs exist in the fixture's md5-derived weights
    assert any(r["epochs_centi"] % 100 for r in a.values())


def test_duplicate_passage_flags_are_symmetric(spark):
    """If a doc's spans are flagged duplicated, at least one OTHER doc
    shares a gram — so flagged docs can never be a singleton set, and
    every fraction lies in [0, 1]."""
    rows = get("duplicate_passage_stats").fn(spark, SMOKE_SF).collect()
    flagged = [r for r in rows if r["n_dup_spans"] > 0]
    assert len(flagged) != 1
    for r in rows:
        assert 0 <= r["n_dup_spans"] <= r["n_spans"], r
        assert 0.0 <= r["dup_fraction"] <= 1.0, r


def test_duplicate_passage_planted_pair(spark, tmp_path_factory):
    """Plant two documents sharing one 8-gram passage among unique filler:
    both get exactly the shared positions flagged, the third doc none."""
    d = tmp_path_factory.mktemp("dp")
    shared = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {shared} a4 a5", "en", "src0", 1),
            (2, f"b1 b2 {shared} b3 b4 b5 b6", "en", "src0", 1),
            (3, " ".join(f"c{i}" for i in range(20)), "en", "src0", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(d / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in get("duplicate_passage_stats").fn(spark, str(d)).collect()
    }
    # Only the exact shared 8-gram is duplicated: 1 position per doc.
    assert got[1]["n_dup_spans"] == 1 and got[2]["n_dup_spans"] == 1
    assert got[3]["n_dup_spans"] == 0


def test_bpe_encode_conserves_symbol_mass(spark):
    """Trainer/encoder consistency: every applied merge collapses two
    adjacent symbols into one, so the encoded corpus must contain
    exactly (total pre-merge symbols - sum of the three pair_counts)
    symbol occurrences — a conservation law linking bpe_train_merges'
    reported counts to bpe_encoded_token_freq's input relation."""
    from dataflowjavasdk_spark.queries.curation2 import (
        _bpe_train_rounds,
        _bpe_vocab_tok,
    )

    tok0 = _bpe_vocab_tok(spark, SMOKE_SF)
    outs, tok3 = _bpe_train_rounds(tok0, rounds=3)

    def total_symbols(tok):
        return (
            tok.select(
                F.sum(
                    F.size(F.split(F.trim("tok"), " ")) * F.col("c")
                ).alias("n")
            ).collect()[0]["n"]
        )

    merged_occurrences = sum(o.collect()[0]["pair_count"] for o in outs)
    assert total_symbols(tok3) == total_symbols(tok0) - merged_occurrences

    # and the registered encode query agrees with a direct recount of
    # its own top row
    top = get("bpe_encoded_token_freq").fn(spark, SMOKE_SF).collect()
    assert len(top) == 15
    assert [r["rk"] for r in top] == list(range(1, 16))
    assert all(r["n_chars"] == len(r["token"]) for r in top)
    # at least one multi-character merged symbol must appear in the
    # top-15 — the observable effect of encoding with the merges
    assert any(r["n_chars"] >= 2 for r in top)


def test_shard_manifest_partitions_and_balances(spark):
    """The manifest must partition the corpus exactly (no doc lost or
    double-assigned) and md5 uniformity must keep every shard within a
    loose 3x band of the ideal size — a modulo-on-sequential-key bug
    (shard correlating with doc_id ranges) would blow the band or
    collapse the key ranges."""
    rows = get("training_shard_manifest").fn(spark, SMOKE_SF).collect()
    total = sum(r["n_docs"] for r in rows)
    from dataflowjavasdk_spark.sources.tables import load_table

    n = load_table(spark, SMOKE_SF, "documents").count()
    assert total == n
    assert {r["shard"] for r in rows} == set(range(16))
    ideal = n / 16
    for r in rows:
        assert ideal / 3 <= r["n_docs"] <= ideal * 3, (r["shard"], r["n_docs"])
    # hash assignment: every shard's key range spans nearly the whole
    # corpus (a sequential/modulo assignment would give disjoint ranges)
    for r in rows:
        assert r["max_doc_id"] - r["min_doc_id"] > n // 2


def test_chunk_overlap_windows_boundary_formula(spark):
    """Chunk counts must follow the window/stride formula per document:
    n_chunks(n) = 1 + ceil(max(n - W, 0) / S) — checked against raw
    token lengths; token mass of chunk 0 equals min(n, W) summed."""
    import math

    from dataflowjavasdk_spark.queries.curation3 import (
        _RAG_STRIDE,
        _RAG_WINDOW,
    )
    from dataflowjavasdk_spark.queries.registry import get
    from dataflowjavasdk_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = {r["chunk_idx"]: r for r in get("chunk_overlap_windows").fn(spark, SMOKE_SF).collect()}
    lens = [
        r["n"]
        for r in load_table(spark, SMOKE_SF, "documents")
        .select(F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"))
        .collect()
        if r["n"] > 0
    ]
    expected_total = sum(
        1 + math.ceil(max(n - _RAG_WINDOW, 0) / _RAG_STRIDE) for n in lens
    )
    assert sum(r["n_chunks"] for r in out.values()) == expected_total
    # every doc contributes exactly one chunk 0 of min(n, W) tokens
    assert out[0]["n_chunks"] == len(lens)
    assert out[0]["sum_tokens"] == sum(min(n, _RAG_WINDOW) for n in lens)


def test_lm_fluency_filter_gate_sanity(spark):
    """The fluency gate is a real partition: every language bucket's
    extremes bracket the corpus mean decision, keeps are nonzero
    somewhere and never exceed totals."""
    from dataflowjavasdk_spark.queries.registry import get

    rows = get("lm_fluency_filter").fn(spark, SMOKE_SF).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept < total  # the mean splits a non-degenerate corpus
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["min_fluency"] <= r["max_fluency"]
        assert r["min_fluency"] * r["n_docs"] <= r["sum_fluency"] <= r["max_fluency"] * r["n_docs"]
