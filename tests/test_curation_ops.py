"""Semantic invariants for the round-3 curation operators — properties the
oracle equality check can't express (it would just repeat the same SQL):
losslessness and structural guarantees of chunk dedup and sequence packing.
"""

from __future__ import annotations

import math


from dataflowjavasdk_spark.queries.registry import get
from dataflowjavasdk_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def test_chunk_dedup_is_lossless_for_unique_docs(spark):
    """A document with zero boilerplate chunks must reassemble to exactly
    its tokenized text (chunking + explode + join + regroup loses
    nothing), and n_chunks must equal ceil(n_tok / 8)."""
    out = get("chunk_dedup_boilerplate").fn(spark, SMOKE_SF)
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SMOKE_SF, "documents").collect()
    }
    rows = out.collect()
    assert len(rows) == len(docs)
    clean_seen = 0
    for r in rows:
        toks = _tokens(docs[r["doc_id"]])
        assert r["n_chunks"] == math.ceil(len(toks) / 8)
        if r["n_boilerplate"] == 0:
            assert r["clean_text"] == " ".join(toks)
            clean_seen += 1
    assert clean_seen > 0, "fixture should contain boilerplate-free docs"


def test_chunk_dedup_removes_only_cross_doc_repeats(spark):
    """Every dropped chunk must occur in >= 2 distinct documents; cleaned
    text is always a subsequence of the original chunk sequence."""
    out = get("chunk_dedup_boilerplate").fn(spark, SMOKE_SF)
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SMOKE_SF, "documents").collect()
    }
    chunk_docs: dict[str, set[int]] = {}
    for doc_id, text in docs.items():
        toks = _tokens(text)
        for i in range(0, len(toks), 8):
            chunk_docs.setdefault(" ".join(toks[i : i + 8]), set()).add(doc_id)
    for r in out.collect():
        toks = _tokens(docs[r["doc_id"]])
        chunks = [" ".join(toks[i : i + 8]) for i in range(0, len(toks), 8)]
        kept = [c for c in chunks if len(chunk_docs[c]) < 2]
        dropped = [c for c in chunks if len(chunk_docs[c]) >= 2]
        assert r["clean_text"] == " ".join(kept)
        assert r["n_boilerplate"] == len(dropped)


def test_sequence_packing_is_lossless_and_contiguous(spark):
    """Packing never drops or double-counts tokens: per source, the sum of
    pack_tokens equals the shard's token total, pack ids are contiguous
    from 0, and every pack start honours the 256-token budget layout
    (pack p begins before offset 256*(p+1))."""
    out = get("sequence_packing").fn(spark, SMOKE_SF).collect()
    totals: dict[str, int] = {}
    for r in load_table(spark, SMOKE_SF, "documents").collect():
        totals[r["source"]] = totals.get(r["source"], 0) + len(_tokens(r["text"]))
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for source, rows in by_source.items():
        assert sum(r["pack_tokens"] for r in rows) == totals[source]
        ids = sorted(r["pack_id"] for r in rows)
        assert ids == list(range(len(ids))), f"{source}: gaps in pack ids"
        # cumulative starts: pack p exists iff some doc starts in
        # [256p, 256(p+1)); equivalently each pack's cumulative start
        # offset is below its upper boundary.
        cum = 0
        packed = sorted(rows, key=lambda r: r["pack_id"])
        for r in packed:
            assert cum < 256 * (r["pack_id"] + 1)
            cum += r["pack_tokens"]


def test_quantile_buckets_match_direct_ntile_on_crafted_corpora(spark, tmp_path):
    """quantile_bucketed_docs (round 10) computes the global ntile(4)
    WITHOUT the single-partition corpus window, from the per-length
    histogram: each length's contiguous rank interval is intersected
    with the 4 ntile rank ranges. The oracle pins the fixture; this
    pins the part the fixture can't stress — the remainder rule (first
    N%4 buckets take the extra row) at every N mod 4, with duplicated
    lengths straddling bucket boundaries — against a direct ntile
    window computed on the same rows."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    fn = get("quantile_bucketed_docs").fn
    for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 101, 102, 103):
        # lengths repeat every 3 docs -> same-length runs cross quartile
        # boundaries for most n; doc_id is the ntile tiebreak.
        rows = [(i, (i % 3) * 10 + 7) for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        sf_dir = tmp_path / f"n{n}"
        sf_dir.mkdir()
        df.coalesce(1).write.parquet(str(sf_dir / "documents.parquet"))
        expect = {
            tuple(r)
            for r in df.select(
                "n_chars",
                F.ntile(4).over(W.orderBy("n_chars", "doc_id")).alias("bucket"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("n_chars").cast("long").alias("min_chars"),
                F.max("n_chars").cast("long").alias("max_chars"),
                F.sum("n_chars").cast("long").alias("total_chars"),
            )
            .collect()
        }
        got = {tuple(r) for r in fn(spark, str(sf_dir)).collect()}
        assert got == expect, f"n={n}: {sorted(got)} != {sorted(expect)}"


def test_quantile_buckets_plan_has_no_corpus_window(spark):
    """The rewrite's invariant: no partitionless window (ntile or any
    other) runs over the corpus-scale documents relation — the only
    single-partition exchange feeds from the vocabulary-sized length
    histogram (a HashAggregate), never from the raw scan."""
    import re

    df = get("quantile_bucketed_docs").fn(spark, SMOKE_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan
    # every SinglePartition exchange must sit directly on an aggregate,
    # not on the parquet scan
    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.end() : m.end() + 400]
        assert "HashAggregate" in tail.split("Scan parquet")[0], tail
