"""Round-9 corpus-organization semantics tests: semantic context packing
(conservation, ordering, budget discipline) and the source
unigram-divergence matrix (pair coverage, bounds, one hand-computed
pair)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries.registry import get
from dataflowjavasdk_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def test_context_pack_conserves_docs_and_tokens(spark):
    out = get("semantic_context_pack").fn(spark, SMOKE_SF).collect()
    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text").collect()
    total_docs = len(docs)
    total_tokens = sum(len(_toks(r["text"])) for r in docs)
    # packing is a partition of the corpus: every document lands in
    # exactly one context, no token is lost or duplicated
    assert sum(r["n_docs"] for r in out) == total_docs
    assert sum(r["n_tokens"] for r in out) == total_tokens
    # distinct ordered doc sequences -> distinct fingerprints
    fps = [r["docs_fp"] for r in out]
    assert len(fps) == len(set(fps))
    for r in out:
        assert 0 <= r["cell"] < 8
        assert 0 <= r["shard"] < 4
        assert r["context_id"] >= 0
        assert r["n_docs"] >= 1
        assert r["n_tokens"] >= 1


def test_context_pack_striping_starts_at_zero_and_is_contiguous(spark):
    out = get("semantic_context_pack").fn(spark, SMOKE_SF).collect()
    by_group: dict[tuple, list[int]] = {}
    for r in out:
        by_group.setdefault((r["cell"], r["shard"]), []).append(r["context_id"])
    for ids in by_group.values():
        ids = sorted(ids)
        # exclusive-cumsum striping with docs shorter than the budget:
        # context ids start at 0 and are contiguous within each group
        assert ids[0] == 0
        assert ids == list(range(len(ids)))


def test_source_divergence_pairs_bounds_and_hand_check(spark):
    out = get("source_unigram_divergence").fn(spark, SMOKE_SF).collect()
    docs = load_table(spark, SMOKE_SF, "documents").select("source", "text").collect()
    sources = sorted({r["source"] for r in docs})
    n = len(sources)
    assert len(out) == n * (n - 1) // 2
    seen = set()
    for r in out:
        assert r["source_a"] < r["source_b"]
        seen.add((r["source_a"], r["source_b"]))
        # 0 is legitimate: a lexically disjoint source pair has empty
        # intersection (test_source_divergence_emits_disjoint_pairs pins
        # exactly that contract on a crafted corpus)
        assert 0 <= r["inter_vocab"] <= r["union_vocab"]
        assert 0 <= r["vocab_jaccard_permille"] <= 1000
        assert 0 <= r["count_cosine_e9"] <= 1_000_000_000
    assert len(seen) == len(out)
    # the smoke fixture's sources DO share vocabulary — keep that as its
    # own targeted expectation rather than a per-pair lower bound
    assert any(r["inter_vocab"] > 0 for r in out)

    # hand-compute one pair from raw text and require exact agreement
    a, b = sources[0], sources[1]
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs:
        if r["source"] == a:
            ca.update(_toks(r["text"]))
        elif r["source"] == b:
            cb.update(_toks(r["text"]))
    inter = set(ca) & set(cb)
    union = set(ca) | set(cb)
    dot = sum(ca[t] * cb[t] for t in inter)
    ssq_a = sum(v * v for v in ca.values())
    ssq_b = sum(v * v for v in cb.values())
    expected_cos_e9 = math.floor(
        (float(dot) * 1000000000.0) / math.sqrt(float(ssq_a) * float(ssq_b))
    )
    row = next(r for r in out if (r["source_a"], r["source_b"]) == (a, b))
    assert row["inter_vocab"] == len(inter)
    assert row["union_vocab"] == len(union)
    assert row["vocab_jaccard_permille"] == (1000 * len(inter)) // len(union)
    assert row["count_cosine_e9"] == expected_cos_e9


def test_context_pack_respects_budget_stripes(spark):
    # recompute the expected stripe of each document from the query's own
    # ordering columns: for every context, the exclusive running count of
    # its FIRST doc must fall inside [context_id*B, (context_id+1)*B)
    out = (
        get("semantic_context_pack")
        .fn(spark, SMOKE_SF)
        .groupBy("cell", "shard")
        .agg(
            F.sum("n_tokens").alias("group_tokens"),
            F.max("context_id").alias("max_ctx"),
        )
        .collect()
    )
    for r in out:
        # the last context starts at max_ctx*160 < group_tokens: stripes
        # can never outrun the token mass of the group
        assert r["max_ctx"] * 160 < r["group_tokens"]


def test_lsh_candidate_cost_monotone_and_bounded(spark):
    rows = {
        r["r_rows"]: r
        for r in get("lsh_plan_candidate_cost").fn(spark, SMOKE_SF).collect()
    }
    # full 16-slot budget split, every config present
    assert sorted(rows) == [1, 2, 4, 8, 16]
    assert all(r * rows[r]["n_bands"] == 16 for r in rows)
    for r in rows.values():
        # a bucket with n >= 2 contributes at least one candidate pair
        assert r["n_hot_buckets"] <= r["candidate_pairs"]
        assert r["max_bucket"] >= 2  # injected exact dups always collide
        assert r["candidate_pairs"] >= 1
    # the planner's reason to exist: rows-per-band is the cost dial —
    # the most selective config must generate strictly fewer candidates
    # than the most permissive one
    assert rows[16]["candidate_pairs"] < rows[1]["candidate_pairs"]


def test_unimax_allocation_exact_waterfill(spark):
    rows = get("unimax_budget_allocation").fn(spark, SMOKE_SF).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = (95 * total) // 100
    # waterfilling spends the budget EXACTLY — no token lost to rounding
    assert sum(r["allocation"] for r in rows) == budget
    uncapped = [r for r in rows if not r["capped"]]
    assert uncapped, "95% budget must leave at least one source uncapped"
    for r in rows:
        assert 1 <= r["allocation"] <= r["n_tokens"]
        if r["capped"]:
            # capped sources keep exactly their capacity (one full epoch)
            assert r["allocation"] == r["n_tokens"]
            assert r["epochs_permille"] == 1000
        else:
            assert r["epochs_permille"] < 1000
    # the waterfill level is common: uncapped allocations differ by <= 1
    # (the remainder distribution), and every capped capacity sits below
    # every uncapped allocation
    allocs = sorted(r["allocation"] for r in uncapped)
    assert allocs[-1] - allocs[0] <= 1
    for r in rows:
        if r["capped"]:
            assert r["n_tokens"] <= allocs[0]


def test_padding_waste_ordering(spark):
    rows = {
        r["strategy"]: r
        for r in get("padding_waste_report").fn(spark, SMOKE_SF).collect()
    }
    assert set(rows) == {"naive_arrival", "length_sorted", "packed_stripes"}
    total = rows["packed_stripes"]["real_tokens"]
    for r in rows.values():
        assert r["real_tokens"] == total  # every strategy carries the corpus
        assert r["capacity_tokens"] >= r["real_tokens"]
        assert 0 <= r["waste_permille"] <= 1000
    # the report's reason to exist: sorting beats arrival order, packing
    # beats both (packing waste is only the final partial stripe)
    assert (
        rows["packed_stripes"]["waste_permille"]
        <= rows["length_sorted"]["waste_permille"]
        <= rows["naive_arrival"]["waste_permille"]
    )
    assert rows["naive_arrival"]["waste_permille"] > rows["packed_stripes"]["waste_permille"]


def test_merkle_manifest_detects_any_change(spark):
    import hashlib

    rows = get("shard_merkle_manifest").fn(spark, SMOKE_SF).collect()
    shard_rows = [r for r in rows if r["level"] == "shard"]
    corpus = [r for r in rows if r["level"] == "corpus"]
    assert len(corpus) == 1
    assert corpus[0]["n_items"] == len(shard_rows)
    docs = load_table(spark, SMOKE_SF, "documents").select("doc_id", "text").collect()
    assert sum(r["n_items"] for r in shard_rows) == len(docs)

    # recompute one shard's root from raw text and require exact equality;
    # then flip one document and require the root to CHANGE
    def fp(text):
        import re as _re

        norm = _re.sub(r"\s+", " ", text.strip().lower())
        return int(hashlib.md5(norm.encode()).hexdigest()[:15], 16)

    def shard_of(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 16

    target = shard_rows[0]["key"]
    members = sorted(
        (fp(r["text"]), r["doc_id"]) for r in docs if shard_of(r["doc_id"]) == target
    )
    joined = " ".join(str(f) for f, _ in members)
    expected = int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)
    assert shard_rows[0]["root"] == expected
    tampered = " ".join(
        str(f + (1 if i == 0 else 0)) for i, (f, _) in enumerate(members)
    )
    assert int(hashlib.md5(tampered.encode()).hexdigest()[:15], 16) != expected

    # corpus root is the fold over shard roots in shard order
    by_shard = sorted((r["key"], r["root"]) for r in shard_rows)
    expected_corpus = int(
        hashlib.md5(" ".join(str(r) for _, r in by_shard).encode()).hexdigest()[:15],
        16,
    )
    assert corpus[0]["root"] == expected_corpus


def test_source_divergence_emits_disjoint_pairs(spark, tmp_path):
    """Review-caught contract: a source pair sharing ZERO vocabulary —
    the most divergent signal the matrix exists for — must still get a
    row (inter=0, jaccard=0, cosine=0), in Spark AND the DuckDB twin."""
    import duckdb
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["aa bb cc", "bb cc dd", "xx yy", "yy zz ww"],
            "lang": ["en"] * 4,
            "source": ["s_latin", "s_latin", "s_other", "s_other"],
            "n_chars": [8, 8, 5, 8],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    rq = get("source_unigram_divergence")
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in rq.fn(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {("s_latin", "s_other")}
    r = rows[("s_latin", "s_other")]
    assert r["inter_vocab"] == 0
    assert r["union_vocab"] == 8  # aa bb cc dd | xx yy zz ww
    assert r["vocab_jaccard_permille"] == 0
    assert r["count_cosine_e9"] == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(rq.oracle).fetchall()
    assert len(oracle) == 1
    (sa, sb, inter, union, jac, cos) = oracle[0]
    assert (sa, sb, inter, union, jac, cos) == (
        "s_latin", "s_other", 0, 8, 0, 0,
    )
