"""Registry binding each named query to its Spark implementation and its
DuckDB-runnable oracle SQL twin (SURVEY.md §5.2 — sqllogictest-in-spirit
differential testing; the DataflowAssert/PAssert analog at scale).

Conventions (driver contract, __spark_entry__.py):
- Spark fn signature: (spark, sf_dir) -> DataFrame.
- Column names must match the oracle exactly (driver sorts columns by name
  before value-hashing).
- Double aggregates are computed over exact DECIMAL casts and emitted as
  DOUBLE in BOTH engines, so results are bit-identical regardless of
  summation order (floating-point sums are otherwise order-dependent and a
  PCollection is an unordered bag — SURVEY.md §1.1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with an optional oracle SQL twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


# Emission order for the driver contract. The driver's correctness run
# checks a bounded prefix of ``queries()`` (50 entries per round), so the
# dict is ordered per VERDICT.md round-2 "Next round" #3 — no query may go
# two rounds unchecked: (1) queries whose code or oracle changed this round
# (must be re-verified by the driver), (2) new queries added this round,
# (3) the 39 queries whose only driver row is CORRECTNESS_r01 (stale by a
# round — windowing/combine code changed under them in round 2), then (4)
# the r02-green tail. Names not listed follow in registration order;
# listed-but-unregistered names are ignored (guarded by a registry test).
# The round this _PRIORITY ordering was authored FOR (the driver round
# whose 50-slot sample it optimizes). test_entry_contract uses it to know
# whether the no-wasted-slot invariant is still checkable or the ordering
# is due for its per-round rotation.
_PRIORITY_ROUND = 6

_PRIORITY: tuple[str, ...] = (
    # Round-6 ordering (VERDICT.md r5 "Next round" #1). The 50-slot
    # driver sample = the 42 never-sampled queries (27 round-5-new that
    # missed the r5 cut + 15 round-6-new) followed by the first 8 of
    # the r03-freshest list (the oldest current-fixture evidence),
    # value-bearing pipelines first. The r03 entries past slot 50 and
    # the other r03-fresh rows head round 7's rotation; the full local
    # gate re-verifies every registered query each session regardless.
    # (1) round-6-new — no driver row exists at all
    "pagerank_converged",
    "chunk_overlap_windows",
    "lm_fluency_filter",
    "gopher_quality_rules",
    "tfrecord_roundtrip_checksum",
    "prefix_filter_jaccard_pairs",
    "dsir_importance_select",
    "video_keyframe_detect",
    "audio_silence_segments",
    "winnowing_dup_spans",
    "rag_retrieval_pipeline",
    "epoch_shuffle_manifest",
    "zorder_clustered_shards",
    "hard_negative_mining",
    "right_to_erasure_audit",
    "trainer_egress_pipeline",
    "cdc_chunk_dedup",
    "late_interaction_topk",
    # (2) round-5-new that missed the r5 sample cut (never sampled);
    # composed/value-bearing pipelines first, per-format decodes after
    "multimodal_curation_pipeline",
    "pagerank_near_dup",
    "referential_integrity_audit",
    "token_bigram_lm",
    "salted_join_hot_keys",
    "scd2_customer_history",
    "q1_incremental_refresh",
    "json_deadletter_split",
    "cluster_representative_dedup",
    "image_ahash_dedup",
    "pq_adc_topk",
    "ivfpq_adc_topk",
    "ann_recall_report",
    "bpe_train_merges",
    "bpe_encoded_token_freq",
    "training_shard_manifest",
    "ingest_drift_report",
    "event_cooccurrence_pairs",
    "ewma_user_values",
    "mad_outliers_per_type",
    "media_sniff_prune",
    "mjpeg_frame_sample",
    "gif_frame_features",
    "image_resize_features",
    "audio_frame_energy",
    "audio_tone_detect",
    "warc_ingest_checksum",
    # (3) freshest driver row is r03 — 20 of 50, value-bearing first;
    # the 30 left (mostly format-roundtrip checksums) head round 7's
    # rotation, and the full local gate re-verifies them every session
    "q2_min_cost_supplier",
    "q3_join_agg",
    "q5_region_revenue",
    "q11_important_stock",
    "q17_small_quantity_revenue",
    "q20_dominant_promo_suppliers",
    "q21_waiting_suppliers",
    "tfidf",
    "training_data_pipeline",
    "minhash_signatures",
    "near_dup_pairs_jaccard",
    "near_dup_clusters",
    "near_dup_graph_triangles",
    "edit_distance_near_dups",
    "incremental_dedup",
    "leakage_safe_split",
    "sequence_packing",
    "session_funnel_click_purchase",
    "weekly_retention_cohorts",
    "event_transition_matrix",
    # (4) everything else follows in registration order — the full local
    # gate (tools/check_correctness.py, all queries, every session)
    # re-verifies all of them meanwhile. test_entry_contract derives the
    # group accounting instead of this comment repeating counts that can
    # drift (r3 ADVICE).
)


def _ordered() -> list[RegisteredQuery]:
    _load_all()
    prioritized = [_REGISTRY[n] for n in _PRIORITY if n in _REGISTRY]
    named = set(_PRIORITY)
    tail = [rq for name, rq in _REGISTRY.items() if name not in named]
    return prioritized + tail


def all_queries() -> dict[str, QueryFn]:
    return {rq.name: rq.fn for rq in _ordered()}


def all_oracles() -> dict[str, str]:
    return {rq.name: rq.oracle for rq in _ordered() if rq.oracle}


def get(name: str) -> RegisteredQuery:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (import = registration)."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in (
        "relational",
        "relational2",
        "relational3",
        "relational4",
        "examples",
        "windowing",
        "text",
        "similarity",
        "dedup",
        "sketches",
        "curation",
        "curation2",
        "curation3",
        "curation4",
        "analytics",
    ):
        try:
            importlib.import_module(f"dataflowjavasdk_spark.queries.{mod}")
        except ModuleNotFoundError as exc:
            # Allow partially built trees during development, but only for
            # our own missing submodules.
            if f"queries.{mod}" not in str(exc):
                raise
    _LOADED = True
