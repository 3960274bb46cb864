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
# dict is ordered per the standing rotation policy (VERDICT round-2
# "Next round" #3, re-derived each round): no query may go two rounds
# unchecked — the sample prefers (1) queries new this round (no driver
# row exists), (2) queries whose code/oracle materially changed
# (_CHANGED_THIS_ROUND), then (3) the queries with the OLDEST driver
# evidence on current fixtures. Names not listed follow in registration
# order; listed-but-unregistered names are ignored (guarded by a
# registry test). _PRIORITY_ROUND is the driver round whose 50-slot
# sample this ordering optimizes; test_entry_contract uses it to know
# whether the no-wasted-slot invariant is still checkable or the
# ordering is due for its per-round rotation.
_PRIORITY_ROUND = 8

# Queries whose code or oracle materially changed in _PRIORITY_ROUND's
# round: they re-enter the 50-slot sample even though their previous
# driver row is green (that row describes the OLD code/oracle).
# test_entry_contract exempts exactly these from the no-wasted-slot
# invariant; prune the set at each rotation.
_CHANGED_THIS_ROUND: frozenset[str] = frozenset(
    {
        # cents_sum vectorized to integer-cents Series arithmetic
        # (VERDICT r7 next-round #4); r07 row describes the old fold
        "cogroup_nation_customer_supplier",
        # avro/tfrecord readers now exclude _temporary/ and uncommitted
        # batch=N dirs (ADVICE r7 #1); r07 row predates the fix
        "avro_logical_types_roundtrip",
    }
)

_PRIORITY: tuple[str, ...] = (
    # Round-8 ordering (VERDICT.md r7 "Next round" #1). The 50-slot
    # driver sample = the 4 never-driver-sampled round-7-late queries,
    # then queries NEW in round 8, then round-8 changed re-entries
    # (_CHANGED_THIS_ROUND + read-path-fixed format sinks whose evidence
    # is r05/r06), then the oldest-evidence queries (the r04-freshest
    # cohort — after r07 no registered query's evidence is older than
    # r04). Names displaced past slot 50 are re-verified by the full
    # local gate + the judge's registry re-run every session regardless.
    # (1) registered last round but never driver-sampled (VERDICT r7 #1)
    "dup_span_removal",
    "containment_sketch_calibration",
    "epoch_token_budget",
    "source_contamination_matrix",
    # (2) new in round 8 — no driver row exists (uncommented as each is
    # registered; test_priority_names_registered enforces existence)
    "cogbk_sorted_stream",
    "exact_dup_spans_50",
    "ann_recall_report_k20",
    "media_egress_pipeline",
    "ngram_novelty_profile",
    "contamination_overlap_fraction",
    "post_dedup_mix_shift",
    "embedding_dispersion_by_label",
    "minhash_jaccard_calibration",
    "normalized_exact_dedup",
    "char_entropy_quality",
    "bm25_retrieval_topk",
    "embedding_compression_recall",
    "hybrid_rrf_fusion",
    "retrieval_label_precision",
    "source_quality_cap",
    "embedding_dim_energy",
    # (3) round-8 changed re-entries: _CHANGED_THIS_ROUND (r07 rows
    # describing pre-change code) + the format sinks whose read path
    # gained the crash-leftover exclusions (r05/r06 evidence)
    "cogroup_nation_customer_supplier",
    "avro_logical_types_roundtrip",
    "tfrecord_roundtrip_checksum",
    "trainer_egress_pipeline",
    "avro_roundtrip_checksum",
    # k-parametrized this round (shared impl with the new k20 twin);
    # its r06 row describes the pre-parametrization code
    "ann_recall_report",
    # (4) the r04-freshest cohort, value-bearing pipelines first; the
    # tail past slot 50 slips to round 9 by design
    "kmeans_ivf_refined",
    "embedding_decontamination",
    "autocomplete_prefix_topk",
    "hot_key_salted_agg",
    "secondary_sort_per_user",
    "side_input_global_mean",
    "cogroup_customer_orders",
    "deterministic_sample_per_key",
    "deterministic_sample_global",
    "argmax_event_per_type",
    "first_events_per_user",
    "grouped_stats_nation",
    "count_per_key_events",
    "count_per_element_priority",
    "distinct_event_users",
    "set_ops_users",
    "flatten_union_counts",
    "partition_split_counts",
    "top_global_orders",
    "exact_percentiles_quantity",
    "cube_returnflag_status",
    "pivot_daily_type_counts",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q18_large_orders",
    # --- slot-50 boundary falls in this region; order below still
    # matters for round 9's "oldest evidence" computation ---
    "q19_bracket_revenue",
    "q22_idle_rich_customers",
    "calendar_week_events",
    "calendar_month_events_tz",
    "calendar_year_orders",
    "tumbling_emit_time_earliest",
    "wordcount_regex",
    "kll_quantiles_rollup",
    "vocab_coverage_curve",
    "source_repetition_mix",
    "curation_filter_funnel",
    "duplicate_passage_stats",
    "key_skew_profile",
    "audio_wav_features",
    "bmp_image_features",
    "png_image_features",
    "media_meta_sniff",
    "bzip2_json_roundtrip_checksum",
    # (5) everything else follows in registration order — the full local
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
        "curation5",
        "retrieval",
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
