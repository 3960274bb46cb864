"""Round-4 training-data curation ops (SURVEY.md §2.13): tokenizer
planning (vocabulary coverage), epoch-aware source repetition, the
filter-funnel observability report, and sequence-level duplicate passage
profiling (the Lee et al. 2021 "Deduplicating Training Data" span view —
here as the intra-corpus profiling twin of the benchmark decontaminations).

Cross-engine discipline as everywhere: thresholds and shares stay in
integer arithmetic until one final IEEE division (rounded to 9 dp), and
every pseudo-random choice is an md5-derived integer — so the DuckDB
oracles reproduce results bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dataflowjavasdk_spark.functions.text import tokens
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.queries.text import _GSW
from dataflowjavasdk_spark.sources.tables import load_table


@query(
    "vocab_coverage_curve",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      FROM documents
    ),
    counts AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
    ranked AS (
      SELECT tok, n,
             row_number() OVER (ORDER BY n DESC, tok) AS rk,
             sum(n) OVER (ORDER BY n DESC, tok
                          ROWS UNBOUNDED PRECEDING) AS cum_n,
             sum(n) OVER () AS total_n
      FROM counts
    ),
    crossings AS (
      SELECT unnest([50, 90, 99]) AS pct, rk, cum_n, total_n, n
      FROM ranked
    )
    SELECT pct,
           CAST(rk AS BIGINT) AS top_tokens,
           round(cum_n::DOUBLE / total_n::DOUBLE, 9) AS cum_share
    FROM crossings
    WHERE cum_n * 100 >= pct * total_n
      AND (cum_n - n) * 100 < pct * total_n
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-planning curve: how many top-frequency tokens cover 50 /
    90 / 99 % of all token occurrences. The crossing rank is found with
    pure integer arithmetic (cum*100 vs pct*total), so both engines agree
    exactly; the share is one rounded IEEE division.

    Scale shape: the windowed relation is VOCABULARY-bounded (not
    corpus-bounded) — the token-count aggregate reduces the corpus to
    ~1e6-1e7 vocab rows first, and the unpartitioned ordered window over
    vocab rows is the same single-sorted-pass shape the Count-Min top-k
    already uses. Each threshold's crossing row is identified in-row
    (first row where the cumulative crosses), no second join."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy(F.col("n").desc(), "tok")
    ranked = counts.select(
        "tok",
        "n",
        F.row_number().over(w).alias("rk"),
        F.sum("n").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cum_n"),
        F.sum("n").over(W.partitionBy()).alias("total_n"),
    )
    pcts = F.array(F.lit(50), F.lit(90), F.lit(99))
    crossed = ranked.select(
        F.explode(
            F.filter(
                pcts,
                lambda p: (F.col("cum_n") * 100 >= p * F.col("total_n"))
                & ((F.col("cum_n") - F.col("n")) * 100 < p * F.col("total_n")),
            )
        ).alias("pct"),
        F.col("rk").cast("long").alias("top_tokens"),
        F.round(
            F.col("cum_n").cast("double") / F.col("total_n").cast("double"), 9
        ).alias("cum_share"),
    )
    return crossed


@query(
    "source_repetition_mix",
    oracle="""
    WITH weighted AS (
      SELECT source, count(*) AS n_docs,
             100 + (('0x' || substr(md5(min(source)), 1, 4))::BIGINT % 200)
               AS epochs_centi
      FROM documents GROUP BY source
    ),
    docs_w AS (
      SELECT d.doc_id, d.source, w.epochs_centi,
             w.epochs_centi // 100 AS full_copies,
             w.epochs_centi % 100 AS frac_centi
      FROM documents d JOIN weighted w USING (source)
    ),
    copies AS (
      SELECT doc_id, source, epochs_centi, full_copies, frac_centi,
             unnest(range(0, full_copies + 1)) AS copy_idx
      FROM docs_w
    ),
    kept AS (
      SELECT * FROM copies
      WHERE copy_idx < full_copies
         OR (('0x' || substr(md5(doc_id::VARCHAR || ':' || copy_idx::VARCHAR),
              1, 4))::BIGINT % 100) < frac_centi
    )
    SELECT source,
           min(epochs_centi) AS epochs_centi,
           (SELECT n_docs FROM weighted w WHERE w.source = kept.source)
             AS n_docs,
           count(*) AS n_out
    FROM kept GROUP BY source
    """,
)
def source_repetition_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware source repetition (the data-mixing recipe where
    high-quality sources repeat fractionally, e.g. "books x2.3 epochs"):
    each source gets a deterministic target epoch count in [1.00, 2.99]
    (md5 of the source name, centi-epochs so the arithmetic stays
    integer); every document emits floor(w) full copies plus one
    fractional copy kept when an md5 draw on (doc_id, copy) lands under
    the fractional part. Replayable — the same corpus always yields the
    same mixture (the property training reproducibility needs).

    Scale shape: the per-source weight table is aggregated once
    (source-cardinality rows) and joined back broadcast; the copy
    explosion is a generator projection (factor <= ceil(w)); output here
    is the per-source audit (counts), a real run would write the exploded
    rows. One aggregate shuffle on source at each end."""
    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.lit(100)
            + F.conv(F.substring(F.md5(F.min("source")), 1, 4), 16, 10).cast(
                "long"
            )
            % 200
        ).alias("epochs_centi"),
    )
    docs_w = docs.join(F.broadcast(weighted), "source").select(
        "doc_id",
        "source",
        "epochs_centi",
        "n_docs",
        (F.col("epochs_centi") / 100).cast("long").alias("full_copies"),
        (F.col("epochs_centi") % 100).alias("frac_centi"),
    )
    copies = docs_w.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("full_copies"))).alias("copy_idx")
    )
    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("copy_idx").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    kept = copies.filter(
        (F.col("copy_idx") < F.col("full_copies")) | (draw < F.col("frac_centi"))
    )
    return kept.groupBy("source").agg(
        F.min("epochs_centi").alias("epochs_centi"),
        F.min("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_out"),
    )


@query(
    "curation_filter_funnel",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, n_chars, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS ws
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             n_chars >= 200 AS pass_len,
             CASE WHEN len(ws) < 2 THEN 0.0
                  ELSE 1.0 - len(list_distinct(list_transform(
                         range(1, len(ws)),
                         i -> array_to_string(array_slice(ws, i, i + 1), ' ')
                       )))::DOUBLE / (len(ws) - 1)::DOUBLE
             END <= 0.03 AS pass_rep,
             NOT regexp_matches(text,
               '[a-z0-9.]+@[a-z0-9]+[.][a-z]+|https?://[a-z0-9./_-]+')
               AS pass_pii
      FROM toks
    )
    SELECT source,
           count(*) AS n_total,
           CAST(SUM(CASE WHEN pass_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass_len,
           CAST(SUM(CASE WHEN pass_len AND pass_rep THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pass_rep,
           CAST(SUM(CASE WHEN pass_len AND pass_rep AND pass_pii THEN 1
                ELSE 0 END) AS BIGINT) AS n_pass_all
    FROM scored
    GROUP BY source
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability report: how many documents per source
    survive each successive curation stage (length → Gopher repetition →
    PII-free), as ONE pass of conditional aggregates — the survival
    report every production curation pipeline logs next to its output.
    Composes the already-oracled signals (quantile/length, Gopher 2-gram
    repetition, the PII regexes) into their funnel, so stage interactions
    (a filter that only drops rows another already dropped) are visible.

    Scale: pure expressions + one aggregate shuffle of source-cardinality
    partials; the text column is read once."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    k = F.size(ws) - F.lit(1)
    g2 = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rep_ratio = F.when(F.size(g2) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(g2)).cast("double") / F.size(g2).cast("double")
    )
    pii_pat = "[a-z0-9.]+@[a-z0-9]+[.][a-z]+|https?://[a-z0-9./_-]+"
    scored = docs.select(
        "source",
        (F.col("n_chars") >= 200).alias("pass_len"),
        (rep_ratio <= 0.03).alias("pass_rep"),
        (~(F.col("text").rlike(pii_pat))).alias("pass_pii"),
    )
    one = F.lit(1)
    return scored.groupBy("source").agg(
        F.count(one).alias("n_total"),
        F.sum(F.when(F.col("pass_len"), one).otherwise(0)).cast("long").alias("n_pass_len"),
        F.sum(F.when(F.col("pass_len") & F.col("pass_rep"), one).otherwise(0))
        .cast("long")
        .alias("n_pass_rep"),
        F.sum(
            F.when(F.col("pass_len") & F.col("pass_rep") & F.col("pass_pii"), one).otherwise(0)
        )
        .cast("long")
        .alias("n_pass_all"),
    )


@query(
    "duplicate_passage_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    spans AS (
      SELECT doc_id,
             array_to_string(array_slice(tk, i, i + 7), ' ') AS gram
      FROM toks CROSS JOIN unnest(range(1, greatest(len(tk) - 6, 1))) AS u(i)
      WHERE len(tk) >= 8
    ),
    gram_df AS (
      SELECT gram, count(DISTINCT doc_id) AS df FROM spans GROUP BY gram
    )
    SELECT s.doc_id,
           count(*) AS n_spans,
           CAST(SUM(CASE WHEN g.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           round(SUM(CASE WHEN g.df >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 9) AS dup_fraction
    FROM spans s JOIN gram_df g USING (gram)
    GROUP BY s.doc_id
    """,
)
def duplicate_passage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-level duplicate-passage profiling (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    repeated-span view of the corpus): per document, the fraction of its
    8-gram positions whose gram also occurs in at least one OTHER
    document. The intra-corpus twin of the 8-gram benchmark
    decontamination: same shingle unit, but the reference set is the
    corpus itself (gram document-frequency), so this is the signal that
    drives span-level dedup decisions.

    Scale shape: the inverted-index pattern the engine already uses for
    incremental ingest dedup — one aggregate building (gram, df), one
    equi-join of positions against it, one per-doc rollup. Grams are
    hashed to 16-byte md5 digests BEFORE the shuffle (same digest
    discipline as dedup_exact's fingerprint; collisions at 128 bits are
    negligible at any corpus size) — measured at sf0.1: 43 → 16 bytes
    per key cuts the one-shot pipeline 3.9 s → 1.7 s and warm 66 → 48 ms
    (SCALE.md round-4 ledger). The oracle recomputes from raw gram
    strings, so the digest substitution itself is value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    spans = (
        docs.select("doc_id", tokens("text").alias("tk"))
        .filter(F.size("tk") >= 8)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - F.lit(8)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, 8)),
                )
            ).alias("gram"),
        )
        # digest before the shuffle: the join/aggregate keys are 16-byte
        # binaries, never the ~40-byte gram strings
        .select("doc_id", F.unhex(F.md5("gram")).alias("gram"))
        .localCheckpoint(eager=False)  # feeds the df aggregate AND the join
    )
    gram_df = spans.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("df")
    )
    joined = spans.join(gram_df, "gram")
    dup = F.when(F.col("df") >= 2, F.lit(1)).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(dup).cast("long").alias("n_dup_spans"),
        F.round(
            F.sum(dup).cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("dup_fraction"),
    )


def _bpe_encode_oracle() -> str:
    from dataflowjavasdk_spark.queries.curation2 import (
        _BPE_WORDS_T0_SQL,
        _bpe_stage_sql,
    )

    stages = ",".join(_bpe_stage_sql(i) for i in (1, 2, 3))
    return f"""
    WITH {_BPE_WORDS_T0_SQL},{stages},
    syms AS (
      SELECT c, unnest(string_split(trim(tok), ' ')) AS sym FROM t3
    ),
    counted AS (
      SELECT sym AS token,
             CAST(length(sym) AS INT) AS n_chars,
             CAST(SUM(c) AS BIGINT) AS n_occurrences,
             row_number() OVER (ORDER BY SUM(c) DESC, sym) AS rk
      FROM syms GROUP BY sym
    )
    SELECT token, n_chars, n_occurrences, rk FROM counted WHERE rk <= 15
    """


@query("bpe_encoded_token_freq", oracle=_bpe_encode_oracle())
def bpe_encoded_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the trained merges (round 5) — the apply half
    of the train→encode tokenizer loop that bpe_train_merges opened: the
    three learned merges are applied to the whole vocabulary (the
    trainer's final per-word tokenization IS the encoded corpus, because
    encoding is word-local and words carry their corpus counts), and the
    corpus-wide token frequency table of the ENCODED text is reported —
    the top-15 (token, length, occurrences) rows with a deterministic
    (count desc, token) rank. Merged multi-character symbols entering
    the top ranks is the observable proof that encoding actually applied
    the merges rather than re-counting characters.

    Cross-engine exactness: the encoder inherits the trainer's
    guarantees — greedy left-to-right literal replace() with identical
    non-overlapping semantics in Spark and DuckDB, integer counts
    throughout, no floats anywhere — so the whole encode pipeline
    value-hash oracles exactly.

    Scale shape: encoding never touches the corpus again — it operates
    on the VOCABULARY relation (distinct pre-tokens with counts; the
    count-weighted symbol explode is vocab-sized), so the marginal cost
    of encoding after training is one explode + one bounded aggregate +
    a top-15 TakeOrderedAndProject. At 100 TB the corpus-sized work
    happened once in the shared word-count aggregate (pinned by the
    trainer), which is exactly how a production tokenizer build amortizes
    its corpus pass."""
    from dataflowjavasdk_spark.queries.curation2 import (
        _bpe_train_rounds,
        _bpe_vocab_tok,
    )

    _outs, tok = _bpe_train_rounds(_bpe_vocab_tok(spark, sf_dir), rounds=3)
    syms = tok.select(
        "c", F.explode(F.split(F.trim(F.col("tok")), " ")).alias("sym")
    )
    counted = syms.groupBy("sym").agg(F.sum("c").alias("n"))
    w = W.orderBy(F.col("n").desc(), F.col("sym"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 15)
        .select(
            F.col("sym").alias("token"),
            F.length("sym").cast("int").alias("n_chars"),
            F.col("n").cast("long").alias("n_occurrences"),
            "rk",
        )
    )


@query(
    "training_shard_manifest",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16
               AS shard
      FROM documents
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM assigned GROUP BY shard
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding + manifest (round 5) — the last
    step of every training-data build: docs are hash-assigned to 16
    shards (md5 of the key, NOT doc_id % N — modulo on a sequential key
    correlates shard with ingest time and skews any time-correlated
    column; the md5 draw is the same replayable-randomness idiom as the
    source mixers), and the MANIFEST rows a downstream loader checks
    before reading (per-shard doc count, byte mass, key range) are the
    query output. Integer-only, exact hash; the assignment is
    reproducible forever from the key alone, which is what makes
    incremental re-builds and loader-side verification possible.

    Scale shape: one scan, one aggregate with a 16-key space; in
    production the same expression feeds write.partitionBy (or
    repartition(N, shard) + per-task files) and THIS query is the
    cheap audit run against what landed. Balance expectation: md5
    uniformity puts each shard within ~2 sigma of n/16 — the skew
    check is the test's assertion, not an aggregate average."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    from dataflowjavasdk_spark.functions.text import md5_long

    assigned = docs.withColumn(
        "shard", md5_long(F.col("doc_id").cast("string")) % 16
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@query(
    "token_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]') AS tk
      FROM documents
    ),
    bigrams AS (
      SELECT tk[i] AS lhs, tk[i + 1] AS rhs
      FROM (SELECT tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
    ),
    counted AS (
      SELECT lhs, rhs, count(*) AS c_ab FROM bigrams GROUP BY lhs, rhs
    ),
    scored AS (
      SELECT lhs, rhs, c_ab,
             SUM(c_ab) OVER (PARTITION BY lhs) AS c_a,
             (SELECT count(DISTINCT rhs) FROM counted) AS v
      FROM counted
    ),
    ranked AS (
      SELECT lhs, rhs, CAST(c_ab AS BIGINT) AS c_ab,
             CAST(c_a AS BIGINT) AS c_a,
             round((c_ab + 1)::DOUBLE / (c_a + v)::DOUBLE, 9) AS p_smoothed,
             row_number() OVER (
               ORDER BY (c_ab + 1)::DOUBLE / (c_a + v)::DOUBLE DESC,
                        lhs, rhs) AS rk
      FROM scored
    )
    SELECT lhs, rhs, c_ab, c_a, p_smoothed, rk FROM ranked WHERE rk <= 20
    """,
)
def token_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed bigram language model (round 5) — the MODELING quantity
    on top of raw adjacency counts (bpe_merge_candidates ranks c(ab);
    a language model needs P(b|a)): add-one-smoothed conditional
    probability (c_ab + 1) / (c_a + V) over the regex pre-tokens, V =
    the conditional support size. Everything is integers until ONE
    division per row — identical correctly-rounded IEEE in both engines
    from identical integer inputs — and the top-20 rank orders by that
    same quotient with a deterministic (lhs, rhs) tiebreak, so the whole
    model head value-hash oracles at 9 dp. This is the next-token
    statistic of classic LM pipelines (and the perplexity scorer's
    numerator); the transition matrix is its event-sequence cousin.

    Scale shape: ONE corpus pass builds the bigram-count relation
    (row-local zip explode, one aggregate whose key space is the bigram
    vocabulary — bounded); the antecedent totals are a window over that
    same vocab-bounded relation (no second corpus scan, no join), V is
    a 1-row aggregate, and the global rank is a single-partition sorted
    window over the VOCAB-bounded scored relation — the same
    single-sorted-pass shape vocab_coverage_curve documents (the rank
    column rules out TakeOrderedAndProject; the one-task stage is
    bounded by vocabulary size, never by the corpus). The corpus is
    touched exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.regexp_extract_all(
        F.col("text"), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0
    )
    s = docs.select(tk.alias("tk")).filter(F.size("tk") >= 2)
    bigrams = s.select(
        F.explode(
            F.zip_with(
                F.slice("tk", 1, F.size("tk") - 1),
                F.slice("tk", 2, F.size("tk") - 1),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
            )
        ).alias("p")
    ).select("p.lhs", "p.rhs")
    counted = bigrams.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).alias("c_ab")
    ).localCheckpoint(eager=False)  # feeds the window AND the V aggregate
    v = counted.agg(F.count_distinct("rhs").alias("v"))
    scored = counted.crossJoin(F.broadcast(v)).withColumn(
        "c_a", F.sum("c_ab").over(W.partitionBy("lhs"))
    )
    p = (F.col("c_ab") + 1).cast("double") / (F.col("c_a") + F.col("v")).cast(
        "double"
    )
    wr = W.orderBy(p.desc(), "lhs", "rhs")
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select(
            "lhs",
            "rhs",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.round(p, 9).alias("p_smoothed"),
            "rk",
        )
    )


@query(
    "ingest_drift_report",
    oracle="""
    WITH a AS (
      SELECT source, count(*) AS n_a,
             CAST(SUM(n_chars) AS BIGINT) AS chars_a
      FROM documents WHERE doc_id % 10 <> 0 GROUP BY source
    ),
    b AS (
      SELECT source, count(*) AS n_b,
             CAST(SUM(n_chars) AS BIGINT) AS chars_b
      FROM documents GROUP BY source
    )
    SELECT b.source,
           coalesce(a.n_a, 0) AS n_prev,
           b.n_b AS n_curr,
           b.n_b - coalesce(a.n_a, 0) AS delta_docs,
           CASE WHEN coalesce(a.n_a, 0) = 0 THEN NULL
                ELSE round((b.n_b - a.n_a) * 100.0 / a.n_a, 9) END
             AS growth_pct,
           round(chars_b::DOUBLE / b.n_b, 9) AS mean_chars_curr,
           CASE WHEN coalesce(a.n_a, 0) = 0 THEN NULL
                ELSE round(chars_b::DOUBLE / b.n_b
                           - chars_a::DOUBLE / a.n_a, 9) END
             AS mean_chars_drift
    FROM b LEFT JOIN a USING (source)
    """,
)
def ingest_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot ingest drift (round 5) — the BETWEEN-runs twin of
    curation_filter_funnel's within-run survival report, and the check a
    daily pipeline runs before publishing: per source, document-count
    and mean-length drift between the previous snapshot (simulated as
    the doc_id%10<>0 subset — a deterministic 10% delta, so both drift
    branches produce non-trivial values) and the current one. A source
    appearing only in the current snapshot reports NULL drift columns
    (the new-source signal) rather than dividing by zero. Exactness:
    counts and char masses are integers; each reported rate is ONE
    correctly-rounded IEEE division (or a difference of two), identical
    cross-engine from identical integers, rounded at 9 dp.

    Scale shape: two source-keyed aggregates (key space = #sources,
    bounded) and a broadcast-sized join between them; in production the
    'previous' side is yesterday's persisted manifest — a few rows per
    source — so the daily drift gate costs one aggregate over today's
    ingest plus a tiny join, never a scan of history."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    a = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_a"),
            F.sum("n_chars").cast("long").alias("chars_a"),
        )
    )
    b = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("n_chars").cast("long").alias("chars_b"),
    )
    j = b.join(a, "source", "left")
    n_prev = F.coalesce(F.col("n_a"), F.lit(0))
    mean_curr = F.col("chars_b").cast("double") / F.col("n_b")
    mean_prev = F.col("chars_a").cast("double") / F.col("n_a")
    return j.select(
        "source",
        n_prev.alias("n_prev"),
        F.col("n_b").alias("n_curr"),
        (F.col("n_b") - n_prev).alias("delta_docs"),
        F.when(
            n_prev == 0, F.lit(None).cast("double")
        ).otherwise(
            F.round((F.col("n_b") - F.col("n_a")) * 100.0 / F.col("n_a"), 9)
        ).alias("growth_pct"),
        F.round(mean_curr, 9).alias("mean_chars_curr"),
        F.when(n_prev == 0, F.lit(None).cast("double"))
        .otherwise(F.round(mean_curr - mean_prev, 9))
        .alias("mean_chars_drift"),
    )


# RAG-style chunking: window/stride in tokens. Overlap = window - stride
# keeps boundary context shared between adjacent chunks (the retrieval
# convention); sequence_packing is the training-side packer, this is the
# indexing-side splitter.
_RAG_WINDOW = 32
_RAG_STRIDE = 24


@query(
    "chunk_overlap_windows",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    base AS (SELECT doc_id, t, len(t) AS n FROM tk WHERE len(t) > 0),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             array_to_string(
               t[i*{_RAG_STRIDE}+1 : i*{_RAG_STRIDE}+{_RAG_WINDOW}], ' '
             ) AS chunk
      FROM base, UNNEST(range(
        1 + CASE WHEN n > {_RAG_WINDOW}
                 THEN CAST(ceil((n - {_RAG_WINDOW}) / {_RAG_STRIDE}.0) AS BIGINT)
                 ELSE 0 END)) AS u(i)
    )
    SELECT chunk_idx,
           count(*) AS n_chunks,
           CAST(SUM(len(list_filter(string_split(chunk, ' '), t -> t <> '')))
             AS BIGINT) AS sum_tokens,
           CAST(bit_xor(('0x' || substr(md5(chunk), 1, 15))::BIGINT)
             AS BIGINT) AS xor_hash
    FROM chunks GROUP BY chunk_idx
    """,
)
def chunk_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunking (round 6) — the indexing-side
    splitter every retrieval corpus needs: token windows of 32 with
    stride 24 (8 tokens of shared boundary context per adjacent
    pair), last window clipped to the document tail, docs
    shorter than one window kept whole. The per-chunk-index report
    (chunk count, token mass, bit_xor of 60-bit md5 chunk hashes) makes
    every boundary decision value-hash-checkable: an off-by-one in any
    start offset, clip, or stride flips a hash. bit_xor (not SUM) folds
    the 2^60-range hashes without overflow and stays order-independent.

    Scale shape: pure row-local expression fan-out (sequence + explode +
    slice — no Python, no shuffle before the bounded per-chunk-index
    aggregate, whose key space is the max chunk count of the longest
    document, corpus-size-independent). One corpus scan. The companion
    training-side op is sequence_packing; the dedup-side is
    chunk_dedup_boilerplate."""
    from dataflowjavasdk_spark.functions.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    base = docs.select(tk.alias("t")).withColumn("n", F.size("t")).filter(
        F.col("n") > 0
    )
    n_chunks = F.lit(1) + F.when(
        F.col("n") > _RAG_WINDOW,
        F.ceil((F.col("n") - _RAG_WINDOW) / F.lit(float(_RAG_STRIDE))),
    ).otherwise(0)
    per_chunk = base.select(
        F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias(
            "chunk_idx"
        ),
        F.slice(
            "t", F.col("chunk_idx").cast("int") * _RAG_STRIDE + 1, _RAG_WINDOW
        ).alias("ctoks"),
    )
    # token count from the slice directly; the hash from the joined text
    # (identical to the oracle's re-split because tokens are non-empty
    # and space-free by construction of the split)
    return (
        per_chunk.select(
            "chunk_idx",
            F.size("ctoks").alias("n_tok"),
            md5_long(F.array_join("ctoks", " ")).alias("h"),
        )
        .groupBy("chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tok").cast("long").alias("sum_tokens"),
            F.expr("bit_xor(h)").cast("long").alias("xor_hash"),
        )
    )


# Scaled-integer fluency scoring: SCALE * P_smoothed stays exact in both
# engines (integer multiply + floor divide), so the CCNet-style LM gate
# below is value-hash-checkable end to end.
_FLUENCY_SCALE = 1_000_000_000


@query(
    "lm_fluency_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]') AS tk
      FROM documents
    ),
    db AS (
      SELECT doc_id, lang, tk[i] AS lhs, tk[i + 1] AS rhs
      FROM (SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
    ),
    counted AS (
      SELECT lhs, rhs, count(*) AS c_ab FROM db GROUP BY lhs, rhs
    ),
    lm AS (
      SELECT lhs, rhs, c_ab, SUM(c_ab) OVER (PARTITION BY lhs) AS c_a
      FROM counted
    ),
    vv AS (SELECT count(DISTINCT rhs) AS v FROM counted),
    scored AS (
      SELECT d.doc_id, d.lang,
             SUM(({_FLUENCY_SCALE} * (m.c_ab + 1))
                 // (m.c_a + (SELECT v FROM vv))) // count(*) AS fluency
      FROM db d JOIN lm m ON m.lhs = d.lhs AND m.rhs = d.rhs
      GROUP BY d.doc_id, d.lang
    ),
    gate AS (SELECT SUM(fluency) // count(*) AS mean_fluency FROM scored)
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN fluency >= (SELECT mean_fluency FROM gate)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(fluency) AS BIGINT) AS sum_fluency,
           CAST(MIN(fluency) AS BIGINT) AS min_fluency,
           CAST(MAX(fluency) AS BIGINT) AS max_fluency
    FROM scored GROUP BY lang
    """,
)
def lm_fluency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM fluency gating (round 6) — the classic perplexity
    filter reshaped for exact cross-engine checking: train the add-one
    bigram LM on the corpus (token_bigram_lm's model), score every
    document by its mean scaled conditional probability — per bigram
    floor(SCALE * (c_ab+1) / (c_a+V)), per doc the integer mean — and
    gate on the corpus mean fluency. Log-perplexity itself is
    transcendental (not value-hash-oracle-able); the scaled linear
    conditional keeps the same keep/drop ordering for a fixed-length
    comparison while staying bit-identical in both engines. Report:
    per-language survival counts + fluency extremes — the
    quality-funnel row a curation run logs before dropping the tail.

    Scale shape: ONE corpus pass builds the pinned per-doc bigram
    relation; the LM is derived from it by a vocab-bounded aggregate +
    window (no second corpus scan); scoring joins the bigram relation
    back to the LM on (lhs, rhs) — an equi-join whose build side is the
    vocab-bounded model, broadcast when small, shuffled when not (AQE
    decides); V and the gate mean attach as 1-row broadcasts. No
    Python, no cartesian, two corpus-sized exchanges (the score join +
    the doc regroup)."""
    scored = _fluency_scored(spark, sf_dir)
    gate = scored.agg(
        F.expr("sum(fluency) DIV count(1)").alias("mean_fluency")
    )
    return (
        scored.crossJoin(F.broadcast(gate))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("fluency") >= F.col("mean_fluency"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
            F.sum("fluency").cast("long").alias("sum_fluency"),
            F.min("fluency").cast("long").alias("min_fluency"),
            F.max("fluency").cast("long").alias("max_fluency"),
        )
    )


def _fluency_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document scaled bigram fluency (doc_id, lang, fluency) — the
    lm_fluency_filter scoring pipeline exposed so the agreement report
    can consume the same verdicts (pinned: feeds the gate mean AND any
    downstream report)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.regexp_extract_all(
        F.col("text"), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), 0
    )
    s = docs.select("doc_id", "lang", tk.alias("tk")).filter(
        F.size("tk") >= 2
    )
    db = s.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice("tk", 1, F.size("tk") - 1),
                F.slice("tk", 2, F.size("tk") - 1),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
            )
        ).alias("p"),
    ).select("doc_id", "lang", "p.lhs", "p.rhs").localCheckpoint(eager=False)
    counted = db.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).alias("c_ab")
    ).localCheckpoint(eager=False)  # feeds the window AND the V aggregate
    lm = counted.withColumn("c_a", F.sum("c_ab").over(W.partitionBy("lhs")))
    v = counted.agg(F.count_distinct("rhs").alias("v"))
    bscore = F.expr(
        f"({_FLUENCY_SCALE} * (c_ab + 1)) DIV (c_a + v)"
    ).alias("bscore")
    scored = (
        db.join(lm, ["lhs", "rhs"])
        .crossJoin(F.broadcast(v))
        .select("doc_id", "lang", bscore)
        .groupBy("doc_id", "lang")
        .agg(F.expr("sum(bscore) DIV count(1)").alias("fluency"))
        .localCheckpoint(eager=False)  # feeds the gate AND the report
    )
    return scored


@query(
    "quality_gate_agreement",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]') AS tk
      FROM documents
    ),
    db AS (
      SELECT doc_id, lang, tk[i] AS lhs, tk[i + 1] AS rhs
      FROM (SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
    ),
    counted AS (
      SELECT lhs, rhs, count(*) AS c_ab FROM db GROUP BY lhs, rhs
    ),
    lm AS (
      SELECT lhs, rhs, c_ab, SUM(c_ab) OVER (PARTITION BY lhs) AS c_a
      FROM counted
    ),
    vv AS (SELECT count(DISTINCT rhs) AS v FROM counted),
    scored AS MATERIALIZED (
      SELECT d.doc_id, d.lang,
             SUM(({_FLUENCY_SCALE} * (m.c_ab + 1))
                 // (m.c_a + (SELECT v FROM vv))) // count(*) AS fluency
      FROM db d JOIN lm m ON m.lhs = d.lhs AND m.rhs = d.rhs
      GROUP BY d.doc_id, d.lang
    ),
    gate AS (SELECT SUM(fluency) // count(*) AS mean_fluency FROM scored),
    gfeat AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    gm AS (
      SELECT doc_id,
             len(toks) AS n,
             length(array_to_string(toks, '')) AS sum_len,
             len(list_filter(toks, t -> contains(t, '#')
                                        OR contains(t, '...'))) AS n_sym,
             len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
               AS n_alpha,
             len(list_filter(list_distinct(toks), t -> t IN ({_GSW})))
               AS n_sw
      FROM gfeat
    ),
    gv AS (
      SELECT doc_id,
             CASE WHEN (CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END)
                     + (CASE WHEN sum_len < 3 * n OR sum_len > 10 * n
                             THEN 1 ELSE 0 END)
                     + (CASE WHEN 10 * n_sym > n THEN 1 ELSE 0 END)
                     + (CASE WHEN 5 * n_alpha < 4 * n THEN 1 ELSE 0 END)
                     + (CASE WHEN n_sw < 2 THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END AS gopher_pass
      FROM gm
    ),
    verdicts AS (
      SELECT s.lang,
             CASE WHEN s.fluency >= (SELECT mean_fluency FROM gate)
                  THEN 1 ELSE 0 END AS lm_pass,
             g.gopher_pass
      FROM scored s JOIN gv g USING (doc_id)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(SUM(lm_pass * gopher_pass) AS BIGINT) AS n_both_pass,
           CAST(SUM(lm_pass * (1 - gopher_pass)) AS BIGINT) AS n_lm_only,
           CAST(SUM((1 - lm_pass) * gopher_pass) AS BIGINT) AS n_gopher_only,
           CAST(SUM((1 - lm_pass) * (1 - gopher_pass)) AS BIGINT)
             AS n_both_fail,
           CAST((100 * SUM(CASE WHEN lm_pass = gopher_pass THEN 1 ELSE 0 END))
                  // count(*) AS BIGINT) AS agreement_pct
    FROM verdicts GROUP BY lang
    """,
)
def quality_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate AGREEMENT report (round 7) — the calibration question
    every multi-filter curation pipeline must answer before composing
    gates: do the model-based filter (CCNet-style LM fluency,
    lm_fluency_filter) and the rule-based filter (Gopher rules,
    gopher_quality_rules) agree, and on which language slices? Per-doc
    verdicts from BOTH gates join on doc_id into a per-language confusion
    matrix (both-pass / lm-only / gopher-only / both-fail) plus an
    integer agreement percentage. Disagreement cells are the review
    queue: lm-only = fluent boilerplate the rules catch; gopher-only =
    rule-passing gibberish the LM catches. Docs the LM cannot score
    (< 2 tokens) are excluded from the matrix, matching the fluency
    filter's own domain.

    Scale shape: reuses _fluency_scored's pinned per-doc relation (one
    corpus pass + vocab-bounded model join); the Gopher flags are pure
    row-local expressions on a second pruned scan; the verdict join is
    doc_id equi — one exchange. No Python, no cartesian."""
    from dataflowjavasdk_spark.queries.text import gopher_violation_flags

    scored = _fluency_scored(spark, sf_dir)
    gate = scored.agg(
        F.expr("sum(fluency) DIV count(1)").alias("mean_fluency")
    )
    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_violation_flags(docs.select("doc_id", "text"))
    gopher = flags.select(
        "doc_id",
        F.when(
            F.col("v_wordcount")
            + F.col("v_wordlen")
            + F.col("v_symbol")
            + F.col("v_alpha")
            + F.col("v_stopword")
            == 0,
            1,
        )
        .otherwise(0)
        .alias("gopher_pass"),
    )
    verdicts = (
        scored.crossJoin(F.broadcast(gate))
        .select(
            "doc_id",
            "lang",
            F.when(F.col("fluency") >= F.col("mean_fluency"), 1)
            .otherwise(0)
            .alias("lm_pass"),
        )
        .join(gopher, "doc_id")
    )
    return verdicts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("lm_pass") * F.col("gopher_pass"))
        .cast("bigint")
        .alias("n_both_pass"),
        F.sum(F.col("lm_pass") * (1 - F.col("gopher_pass")))
        .cast("bigint")
        .alias("n_lm_only"),
        F.sum((1 - F.col("lm_pass")) * F.col("gopher_pass"))
        .cast("bigint")
        .alias("n_gopher_only"),
        F.sum((1 - F.col("lm_pass")) * (1 - F.col("gopher_pass")))
        .cast("bigint")
        .alias("n_both_fail"),
        F.expr(
            "CAST((100 * sum(CASE WHEN lm_pass = gopher_pass THEN 1 ELSE 0 END))"
            " DIV count(1) AS BIGINT)"
        ).alias("agreement_pct"),
    )
