"""Training-data curation queries beyond dedup (SURVEY.md §2 "training
pipeline extensions"): tokenizer-accurate counting and benchmark
decontamination — the two checks every pretraining corpus runs after
dedup (queries/dedup.py) and quality filtering (queries/text.py).

Both are pure Column expressions over `documents`; the only shuffle in
decontamination is the shingle equi-join (blocking-key shape — never
all-pairs), identical at 100 TB to the near-dup join in dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowjavasdk_spark.functions.text import md5_long
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table

# GPT-style pre-tokenizer classes: letter runs, single digits, other marks.
# Kept to constructs RE2 (DuckDB) and Java regex interpret identically.
# Shared with wordcount_regex (queries/text.py) via functions.text.
from dataflowjavasdk_spark.functions.text import BPE_PRETOKEN_PAT as _BPE_PAT


@query(
    "bpe_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_PAT}')) AS n_bpe,
           len(list_distinct(regexp_extract_all(text, '{_BPE_PAT}'))) AS n_unique,
           round(len(list_distinct(regexp_extract_all(text, '{_BPE_PAT}')))::DOUBLE
                 / greatest(len(regexp_extract_all(text, '{_BPE_PAT}')), 1)::DOUBLE,
                 9) AS ttr
    FROM documents
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-style pre-tokenizer regex (letter
    runs / digits / punctuation marks) rather than whitespace — the count
    that actually predicts LLM token cost. ttr = type-token ratio, a
    cheap lexical-diversity quality signal. Zero shuffles; scan-speed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), 0)
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_bpe"),
        uniq.cast("long").alias("n_unique"),
        F.round(
            uniq.cast("double") / F.greatest(n, F.lit(1)).cast("double"), 9
        ).alias("ttr"),
    )


@query(
    "ngram_decontamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(tk) - 6, 1)),
               i -> array_to_string(array_slice(tk, i, i + 7), ' ')
             )) AS grams
      FROM toks WHERE len(tk) >= 8
    ),
    exploded AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
    bench AS (SELECT DISTINCT gram FROM exploded WHERE doc_id % 20 = 0)
    SELECT e.doc_id, count(DISTINCT e.gram) AS n_shared
    FROM exploded e JOIN bench b ON e.gram = b.gram
    WHERE e.doc_id % 20 <> 0
    GROUP BY e.doc_id
    """,
)
def ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    8-token n-gram with the held-out set (here: every 20th doc stands in
    for the benchmark). The industry-standard leakage check (GPT-3 §C /
    PaLM-style 8-gram overlap). Plan: distinct benchmark grams are the
    blocking keys — dedup them FIRST (the benchmark is small), then one
    equi-join against corpus grams; at 100 TB the benchmark-gram side
    broadcasts and the corpus is a single scan."""
    from dataflowjavasdk_spark.functions import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", S.shingles("text", 8).alias("grams"))
    exploded = sh.select("doc_id", F.explode("grams").alias("gram"))
    bench = (
        exploded.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    )
    corpus = exploded.filter(F.col("doc_id") % 20 != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
    )


@query(
    "stratified_source_mix",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source, n_chars,
             CASE
               WHEN source IN ('src0','src1','src2','src3') THEN 1.0
               WHEN source IN ('src4','src5','src6','src7') THEN 0.5
               ELSE 0.2
             END AS rate,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS bucket
      FROM documents
    )
    SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM rated
    WHERE bucket < (rate * 10000)::BIGINT
    GROUP BY source
    """,
)
def stratified_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing — the data-recipe step of corpus curation: downsample
    each source to a target rate (here: keep src0-3 fully, src4-7 at 50%,
    the long tail at 20%). The keep/drop decision is a deterministic
    per-row hash threshold (md5(doc_id) mod 10000 < rate·10000):
    reproducible across engines, runs, AND data arrivals — re-running on a
    grown corpus keeps exactly the old rows plus the same fraction of new
    ones (rand(seed) guarantees neither). Zero shuffles before the final
    per-source stats; at 100 TB the filter is scan-side."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3"), F.lit(1.0))
        .when(F.col("source").isin("src4", "src5", "src6", "src7"), F.lit(0.5))
        .otherwise(F.lit(0.2))
    )
    bucket = F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(10000))
    return (
        docs.filter(bucket < (rate * 10000).cast("long"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )


@query(
    "quantile_bucketed_docs",
    oracle="""
    WITH bucketed AS (
      SELECT n_chars,
             ntile(4) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    SELECT bucket,
           count(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM bucketed
    GROUP BY bucket
    """,
)
def quantile_bucketed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-quartile bucketing for curriculum/mixing decisions (the
    ApproximateQuantiles-driven partitioning a training pipeline applies
    before sampling — historical sdk/transforms/ApproximateQuantiles.java
    as the reference surface, here the EXACT ntile so the oracle matches
    bit-for-bit).

    Computed WITHOUT the global ntile window (which moves every row to
    one partition for the total order): the output only aggregates
    n_chars per bucket, and under ORDER BY (n_chars, doc_id) all docs
    sharing a length occupy one contiguous rank interval
    [off+1, off+cnt] (off = count of strictly shorter docs), with the
    doc_id tiebreak only permuting docs WITHIN that interval — the
    per-bucket aggregates never see it. So: build the per-length
    histogram (one map-side-combined corpus exchange, vocabulary-sized
    result), turn ntile's bucket sizes (q = N div 4 with the remainder
    r spread one-per-bucket from bucket 1, per the SQL standard both
    engines implement) into 4 rank ranges, and intersect each length's
    interval with each range. Every post-histogram relation is
    distinct-lengths-sized; nothing corpus-scale crosses a single
    partition. Equivalence is pinned by the unchanged oracle ntile."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    per_len = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    lw = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, -1)
    aw = W.orderBy("n_chars").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = per_len.select(
        "n_chars",
        "cnt",
        F.coalesce(F.sum("cnt").over(lw), F.lit(0)).alias("off"),
        F.sum("cnt").over(aw).alias("n_total"),
    )
    q = F.expr("n_total DIV 4")
    r = F.col("n_total") % 4
    b = F.col("bucket")
    rk_start = (b - 1) * q + F.least(b - 1, r) + 1
    rk_end = b * q + F.least(b, r)
    overlap = (
        offs.select(
            "n_chars",
            "cnt",
            "off",
            "n_total",
            F.explode(F.array([F.lit(i) for i in range(1, 5)])).alias("bucket"),
        )
        .filter(
            (F.col("off") + 1 <= rk_end) & (F.col("off") + F.col("cnt") >= rk_start)
        )
        .select(
            "bucket",
            "n_chars",
            (
                F.least(rk_end, F.col("off") + F.col("cnt"))
                - F.greatest(rk_start, F.col("off") + 1)
                + 1
            ).alias("n_ov"),
        )
    )
    return overlap.groupBy("bucket").agg(
        F.sum("n_ov").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum(F.col("n_ov") * F.col("n_chars")).cast("long").alias("total_chars"),
    )


_CHUNK = 8  # tokens per chunk; fixture text is single-line so fixed-size
#            token chunks stand in for the paragraph/line splitter.


@query(
    "chunk_dedup_boilerplate",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(t[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}], ' ') AS chunk
      FROM tk, UNNEST(range(CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT))) AS u(i)),
    hashed AS (
      SELECT doc_id, chunk_idx, chunk,
             ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS chunk_h
      FROM chunks),
    dfc AS (
      SELECT chunk_h, count(DISTINCT doc_id) AS df FROM hashed GROUP BY 1)
    SELECT c.doc_id,
           count(*) AS n_chunks,
           CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           coalesce(string_agg(CASE WHEN d.df < 2 THEN c.chunk END, ' '
                               ORDER BY c.chunk_idx), '') AS clean_text
    FROM hashed c JOIN dfc d ON c.chunk_h = d.chunk_h
    GROUP BY c.doc_id
    """,
)
def chunk_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style line-level dedup: drop text chunks that
    recur across >= 2 distinct documents (boilerplate — headers, nav
    bars, license blurbs) and reassemble each document from its surviving
    chunks in order. Fixture text is single-line, so non-overlapping
    8-token windows stand in for the line/paragraph splitter; the Spark
    shape is identical for any splitter. The oracle groups on the same
    60-bit md5 key as the engine (functions/text.py::md5_long's verified
    DuckDB twin), so both sides share even hash-collision behavior.

    100 TB shape: posexplode is map-side; "appears in >= 2 distinct docs"
    is min(doc_id) != max(doc_id) over a window partitioned by the 60-bit
    md5 of the chunk (8-byte shuffle key; min/max are constant-state, so a
    corpus-wide boilerplate chunk with millions of occurrences streams
    through one task without buffering); reassembly groups by doc_id.
    TWO key-partitioned exchanges and ONE corpus scan — a
    groupBy-count + join-back formulation would scan and explode the
    corpus twice (Spark recomputes two-branch subplans; verified on the
    executed plan), and no all-pairs anything — the same blocking
    discipline as the shingle joins in dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_chunks = F.ceil(F.size(tk) / F.lit(float(_CHUNK))).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - F.lit(1)),
        lambda i: F.array_join(F.slice(tk, i * _CHUNK + 1, _CHUNK), " "),
    )
    exploded = (
        docs.select("doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk"))
        .filter(F.col("chunk") != "")
        .withColumn("chunk_h", md5_long(F.col("chunk")))
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("chunk_h")
    flagged = exploded.withColumn(
        "boiler", F.min("doc_id").over(w) != F.max("doc_id").over(w)
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("boiler"), F.struct("chunk_idx", "chunk"))
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("boiler"), 1).otherwise(0))
        .cast("long")
        .alias("n_boilerplate"),
        F.array_join(
            F.transform(kept, lambda s: s.getField("chunk")), " "
        ).alias("clean_text"),
    )


_PACK_BUDGET = 256  # tokens per training sequence pack


@query(
    "sequence_packing",
    oracle=f"""
    WITH tk AS (
      SELECT source, doc_id,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM documents),
    packed AS (
      SELECT source, doc_id, n_tok,
             CAST(floor((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tok)
                        / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
      FROM tk)
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY source, pack_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: concat-then-chunk
    assignment — within each source shard, documents in deterministic
    doc_id order are laid end-to-end and a document belongs to the pack
    where its first token lands (pack budget 256 tokens).
    This is the GPT-style packing layout expressed as a running-sum
    window, not a driver-side loop.

    100 TB shape: the running sum partitions by source, so no global
    total order exists anywhere — each shard packs independently and in
    parallel, exactly how a real pretokenization job shards packing. One
    exchange on source (skew-safe as long as shards are bounded; a hash
    sub-shard key composes trivially), then a groupBy on
    (source, pack_id) that reuses the same partitioning."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = docs.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
    ).withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(_PACK_BUDGET))),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("pack_tokens"),
    )


@query(
    "temperature_mix_sqrt",
    oracle="""
    WITH counts AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
    nmin AS (SELECT min(n_s) AS n_min FROM counts),
    rated AS (
      SELECT d.doc_id, d.source, c.n_s,
             sqrt(CAST(n_min AS DOUBLE) / CAST(c.n_s AS DOUBLE)) AS rate,
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000
               AS bucket
      FROM documents d JOIN counts c USING (source), nmin)
    SELECT source, n_s AS n_total,
           CAST(SUM(CASE WHEN bucket < CAST(floor(rate * 10000) AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(rate, 9) AS rate
    FROM rated GROUP BY source, n_s, rate
    """,
)
def temperature_mix_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixing (the DoReMi/data-recipe idiom
    at alpha = 0.5): each source keeps a deterministic
    sqrt(n_min / n_s) fraction, so over-represented sources are
    down-weighted toward the smallest one while the ordering of source
    sizes is preserved — the standard compromise between proportional
    (alpha=1) and uniform (alpha=0) mixing. alpha=0.5 specifically
    because IEEE sqrt is CORRECTLY ROUNDED (unlike pow), so the rate is
    bit-identical across engines; the keep decision reuses the
    stratified-mix hash-threshold idiom (md5 mod 10000 <
    floor(rate*10000) — floor on BOTH sides: DuckDB's double->BIGINT
    cast rounds, Spark's truncates). Reproducible across engines, runs,
    and corpus growth.

    100 TB shape: per-source counts are one map-side-combined groupBy
    (|sources| rows, pinned for its two consumers — the global min and
    the join back); the per-document decision is scan-side."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"))
        .localCheckpoint(eager=False)
    )
    nmin = counts.agg(F.min("n_s").alias("n_min"))
    rate = F.sqrt(F.col("n_min").cast("double") / F.col("n_s").cast("double"))
    bucket = F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(10000))
    return (
        docs.join(counts, "source")
        .crossJoin(F.broadcast(nmin))
        .withColumn("rate", F.round(rate, 9))
        .withColumn(
            "kept",
            F.when(bucket < F.floor(rate * 10000), 1).otherwise(0),
        )
        .groupBy("source", F.col("n_s").alias("n_total"), "rate")
        .agg(F.sum("kept").cast("long").alias("n_kept"))
        .select("source", "n_total", "n_kept", "rate")
    )
