"""Round-8 curation operators (queries/curation5.py) — semantic
invariants beyond the DuckDB value-hash gate."""

from __future__ import annotations

from dataflowjavasdk_spark.queries.registry import get
from tests.conftest import SMOKE_SF


def test_novelty_partitions_gram_first_occurrences(spark):
    """Every distinct gram is novel in EXACTLY one document (its min
    doc_id), so sum(n_novel) over the profile must equal the number of
    distinct grams corpus-wide, and novelty_pct stays in [0, 100]."""
    from pyspark.sql import functions as F

    from dataflowjavasdk_spark.queries.curation5 import _doc_grams

    rows = get("ngram_novelty_profile").fn(spark, SMOKE_SF).collect()
    assert rows
    total_novel = sum(r["n_novel"] for r in rows)
    n_distinct = (
        _doc_grams(spark, SMOKE_SF).agg(F.count_distinct("gram")).collect()[0][0]
    )
    assert total_novel == n_distinct
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert 0 <= r["novelty_pct"] <= 100


def test_contamination_fraction_bounds_and_coverage(spark):
    """The fractional report covers EVERY corpus doc with >= 8 tokens
    (zero-overlap rows included), percentages bound the counts, and the
    dirty verdict is exactly the >= 20% rule."""
    rows = get("contamination_overlap_fraction").fn(spark, SMOKE_SF).collect()
    assert rows
    assert any(r["n_shared"] == 0 for r in rows), "zero-overlap docs missing"
    for r in rows:
        assert r["doc_id"] % 20 != 0  # benchmark docs never scored
        assert 0 <= r["n_shared"] <= r["n_grams"]
        assert r["overlap_pct"] == (100 * r["n_shared"]) // r["n_grams"]
        assert r["is_dirty"] == (r["overlap_pct"] >= 20)


def test_post_dedup_mix_shift_invariants(spark):
    """Dedup can only shrink a source; allocations stay within budget
    (integer-division remainder only); the duplicated-corpus fixture
    guarantees a real shift exists somewhere."""
    from dataflowjavasdk_spark.queries.curation5 import _MIX_BUDGET

    rows = get("post_dedup_mix_shift").fn(spark, SMOKE_SF).collect()
    assert rows
    for r in rows:
        assert r["n_docs_after"] <= r["n_docs_before"]
        assert r["tokens_after"] <= r["tokens_before"]
        assert r["alloc_shift"] == r["alloc_after"] - r["alloc_before"]
    assert sum(r["alloc_before"] for r in rows) <= _MIX_BUDGET
    assert sum(r["alloc_after"] for r in rows) <= _MIX_BUDGET
    assert sum(r["n_docs_before"] - r["n_docs_after"] for r in rows) > 0, (
        "the %20 clone corpus must contain removable duplicates"
    )


def test_dispersion_bounds_and_label_coverage(spark):
    """Mean member→centroid cosine is a true mean of cosines: within
    [-1, 1], one row per label, n sums to the corpus size."""
    from dataflowjavasdk_spark.sources.tables import load_table

    rows = get("embedding_dispersion_by_label").fn(spark, SMOKE_SF).collect()
    emb = load_table(spark, SMOKE_SF, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels
    assert sum(r["n"] for r in rows) == emb.count()
    for r in rows:
        assert -1.0 <= r["mean_centroid_cosine"] <= 1.0
