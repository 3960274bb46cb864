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
_PRIORITY: tuple[str, ...] = (
    # (1) VALUE-critical changes in round 3: output reshaped, oracle
    # rewritten, or query logic rewritten — where the driver could see
    # different VALUES than r02. Plan-only changes (pins, dropped hints)
    # are demoted below the never-checked group: their values were
    # r02-green and the local gate re-verifies them every session.
    "minhash_signatures",       # output reshaped to (doc_id, hash_idx, minhash)
    "tfidf",                    # in-plan N, un-hinted term-df join
    "training_data_pipeline",   # un-hinted metadata join + checkpoint pins
    "near_dup_clusters",        # oracle now df-capped like the engine
    "near_dup_pairs_jaccard",   # shares the capped-pair SQL helper + pin
    "q17_small_quantity_revenue",  # window decorrelation rewrite
    # (2) new this round — no prior driver row exists at all
    "avro_logical_types_roundtrip",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_dominant_promo_suppliers",
    "q21_waiting_suppliers",
    "chunk_dedup_boilerplate",
    "sequence_packing",
    "unigram_rarity_quality",
    "leakage_safe_split",
    "temperature_mix_sqrt",
    "leaderboard_team_windows",
    "quantile_bucketed_docs",
    "csv_roundtrip_checksum",
    "json_roundtrip_checksum",
    "xml_roundtrip_checksum",
    "pii_redaction",
    "edit_distance_near_dups",
    "bloom_ngram_decontamination",
    "incremental_dedup",
    "grouping_sets_revenue",
    "orc_roundtrip_checksum",
    "domain_blocklist_filter",
    "bpe_merge_candidates",
    "value_histogram_per_type",
    "zscore_outliers_per_type",
    "session_funnel_click_purchase",
    "weekly_retention_cohorts",
    "unpivot_daily_type_counts",
    "weighted_sample_per_source",
    "near_dup_graph_triangles",
    "event_transition_matrix",
    "user_inactivity_gaps",
    "table_profile_orders",
    "countmin_term_frequencies",
    "gzip_json_roundtrip_checksum",
    "partitioned_write_prune_checksum",
    "repetition_ratio_quality",
    "pii_detection_stats",
    "grouped_batches_stats",
    "calendar_day_events_tz",
    "bucketed_join_revenue",
    "approx_quantiles_per_key",
    # (2b) plan-only changes in round 3 (pins / dropped broadcast hints):
    # values were r02-green and unchanged; re-verified by the local gate
    # every session, so they rank below never-driver-checked queries.
    "q3_join_agg",              # customer broadcast hint dropped
    "q5_region_revenue",        # customer broadcast hint dropped
    "minhash_lsh_near_dups",    # signature relation pinned
    "simhash_near_dup_pairs",   # fingerprint relation pinned
    "kmeans_ivf_refined",       # per-iteration checkpoints
    "q15_top_supplier",         # revenue relation pinned
    # (3) last checked in round 1 — every row below is one round stale
    "argmax_event_per_type",
    "autocomplete_prefix_topk",
    "calendar_week_events",
    "cogroup_customer_orders",
    "count_per_element_priority",
    "count_per_key_events",
    "cube_returnflag_status",
    "deterministic_sample_global",
    "deterministic_sample_per_key",
    "distinct_event_users",
    "exact_percentiles_quantity",
    "first_events_per_user",
    "flatten_union_counts",
    "grouped_stats_nation",
    "hot_key_salted_agg",
    "partition_split_counts",
    "pivot_daily_type_counts",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q16_part_supplier_counts",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_idle_rich_customers",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "secondary_sort_per_user",
    "set_ops_users",
    "side_input_global_mean",
    "top_global_orders",
    "top_sessions",
    "topk_per_group",
    "user_running_totals",
    "value_moments_per_type",
    "wordcount_via_facade",
    # (4) past the 50-slot budget — first in line for the round-4 sample;
    # the full local gate (tools/check_correctness.py, all queries)
    # covers everything meanwhile. Honest accounting: group (1) has 6
    # value-critical changed entries and group (2) all 43 queries with no
    # driver row at all — together 49, so 1 slot remains for group (2b)
    # (plan-only changes, r02-green values) and the stale-r01 group (3)
    # spills to round 4 entirely. With 132 registered queries and 50
    # driver slots per round, many frozen green rows will be two rounds
    # driver-stale — the local gate re-verifies all 132 every session,
    # and a query whose VALUES could have changed always outranks a
    # stale-but-frozen one.
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
