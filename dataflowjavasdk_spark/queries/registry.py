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
# checks a bounded prefix of ``queries()`` (50 entries in round 1), so the
# dict is ordered: (1) queries whose oracle changed and need a fresh driver
# check, (2) queries with no driver-green row yet (flagship, windowing,
# text/dedup/similarity/sketches/curation, examples remainder), (3) new
# queries added this round, then (4) the long tail that is already
# driver-green from a prior round (CORRECTNESS_r01.json). Names not listed
# here follow in registration order; listed-but-unregistered names are
# ignored (guarded by a registry test).
_PRIORITY: tuple[str, ...] = (
    # (1) oracle fixed this round — must be re-checked by the driver
    "json_props_per_type",
    "q12_priority_shipping",
    "session_stats_per_user",
    "approx_distinct_users",
    "approx_quantiles_value",
    # (2) no driver row in CORRECTNESS_r01.json yet
    "tumbling_hourly_events",
    "sliding_windows_events",
    "session_windows_events",
    "calendar_day_events",
    "global_window_events",
    "session_windows_dynamic_gap",
    "rollup_hourly_to_daily",
    "wordcount",
    "tfidf",
    "token_count_stats",
    "language_id_quality",
    "doc_fingerprints",
    "dedup_exact",
    "minhash_signatures",
    "near_dup_pairs_jaccard",
    "minhash_lsh_near_dups",
    "simhash_fingerprints",
    "near_dup_clusters",
    "training_data_pipeline",
    "simhash_near_dup_pairs",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "embedding_label_stats",
    "embedding_near_dup_pairs",
    "ann_lsh_multitable",
    "distinct_users_rollup",
    "hll_distinct_rollup",
    "theta_audience_overlap",
    "bpe_token_stats",
    "ngram_decontamination",
    "stratified_source_mix",
    "counting_input_checksum",
    "multimodal_payload_stats",
    "ivf_ann_topk",
    "asof_join_click_purchase",
    "range_join_click_purchase",
    "ivf_ann_multiprobe",
    # (3) new this round — no prior driver row exists at all
    "avro_roundtrip_checksum",
    "custom_merged_windows_events",
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
        "examples",
        "windowing",
        "text",
        "similarity",
        "dedup",
        "sketches",
        "curation",
    ):
        try:
            importlib.import_module(f"dataflowjavasdk_spark.queries.{mod}")
        except ModuleNotFoundError as exc:
            # Allow partially built trees during development, but only for
            # our own missing submodules.
            if f"queries.{mod}" not in str(exc):
                raise
    _LOADED = True
