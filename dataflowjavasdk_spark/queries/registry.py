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
_PRIORITY_ROUND = 5

_PRIORITY: tuple[str, ...] = (
    # Round-5 ordering (VERDICT.md r4 "Next round" #2). CORRECTNESS_r03 ∪
    # r04 covered 100 distinct queries on the current (post-regeneration)
    # fixtures; the 48 below are exactly the queries whose FRESHEST driver
    # row is still r01/r02 — i.e. measured against fixtures that no longer
    # exist (they pass the local gate every session). They fill 48 of the
    # driver's 50 sample slots; the 2 spare slots at the head go to
    # round-5-new queries (no driver row at all yet — per r4 verdict #9,
    # never-sampled beats stale-but-once-green).
    # (1) new this round — no prior driver row exists at all
    "jpeg_image_features",
    "tfidf_regex",
    # (2) freshest driver row is r01/r02 (pre-regeneration fixtures):
    # derived from CORRECTNESS_r0{1..4}.json, latest-round-wins. Ordered
    # value-bearing pipelines first, cheap checksum/roundtrip rows last.
    "minhash_lsh_near_dups",
    "simhash_near_dup_pairs",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q12_priority_shipping",
    "join_left_outer_customer_orders",
    "join_semi_anti_counts",
    "asof_join_click_purchase",
    "range_join_click_purchase",
    "approx_distinct_users",
    "approx_quantiles_value",
    "json_props_per_type",
    "session_stats_per_user",
    "multimodal_payload_stats",
    "ivf_ann_topk",
    "ivf_ann_multiprobe",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ann_lsh_multitable",
    "embedding_label_stats",
    "embedding_near_dup_pairs",
    "tumbling_hourly_events",
    "sliding_windows_events",
    "session_windows_events",
    "session_windows_dynamic_gap",
    "calendar_day_events",
    "global_window_events",
    "rollup_hourly_to_daily",
    "custom_merged_windows_events",
    "top_sessions",
    "user_running_totals",
    "value_moments_per_type",
    "topk_per_group",
    "wordcount",
    "wordcount_via_facade",
    "token_count_stats",
    "language_id_quality",
    "doc_fingerprints",
    "dedup_exact",
    "simhash_fingerprints",
    "distinct_users_rollup",
    "hll_distinct_rollup",
    "theta_audience_overlap",
    "bpe_token_stats",
    "ngram_decontamination",
    "stratified_source_mix",
    "counting_input_checksum",
    "avro_roundtrip_checksum",
    # (3) round-5-new queries that missed the 50-slot cut queue here —
    # first in line for round 6 (the local gate covers them meanwhile).
    # Deliberate trade vs the never-sampled-first policy: the r4 verdict's
    # done-criterion for THIS round is "every query registered at verdict
    # time gets a current-fixture driver row" — displacing stale entries
    # with these would break that; their never-sampled priority applies
    # at the round-6 rotation instead.
    "media_sniff_prune",
    "mjpeg_frame_sample",
    "gif_frame_features",
    "warc_ingest_checksum",
    "pq_adc_topk",
    "bpe_train_merges",
    "pagerank_near_dup",
    "scd2_customer_history",
    "ivfpq_adc_topk",
    "q1_incremental_refresh",
    "json_deadletter_split",
    "salted_join_hot_keys",
    "audio_frame_energy",
    "bpe_encoded_token_freq",
    "image_resize_features",
    "audio_tone_detect",
    "cluster_representative_dedup",
    "ewma_user_values",
    "mad_outliers_per_type",
    "multimodal_curation_pipeline",
    "event_cooccurrence_pairs",
    "training_shard_manifest",
    "ann_recall_report",
    "image_ahash_dedup",
    "referential_integrity_audit",
    "token_bigram_lm",
    "ingest_drift_report",
    # (4) everything r03/r04-green follows in registration order — the
    # full local gate (tools/check_correctness.py, all queries, every
    # session) re-verifies all of them meanwhile. test_entry_contract
    # derives the group accounting instead of this comment repeating
    # counts that can drift (r3 ADVICE).
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
