"""Query batch — round-8 curation operators: stream-order novelty
profiling, fractional contamination scoring, and the dedup→mixture
interaction report.

Shared discipline (SCALE.md): gram-keyed exchanges only (never
all-pairs), benchmark-sized relations broadcast, every emitted number
integer-exact or a round(x, 9) of an identical operation tree so the
DuckDB twin hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflowjavasdk_spark.functions import similarity as S
from dataflowjavasdk_spark.functions.text import tokens
from dataflowjavasdk_spark.queries.curation4 import _isqrt_sql
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table

# Distinct 8-gram sets per document — the decontamination family's gram
# recipe (curation.py ngram_decontamination), shared by the two gram
# queries below.
_GRAMS_SQL = """toks AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(tk) - 6, 1)),
               i -> array_to_string(array_slice(tk, i, i + 7), ' ')
             )) AS grams
      FROM toks WHERE len(tk) >= 8
    ),
    g AS (SELECT doc_id, source, unnest(grams) AS gram FROM sh)"""


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, gram) over distinct per-doc 8-grams, docs with
    >= 8 tokens — the Spark twin of _GRAMS_SQL."""
    docs = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    return (
        docs.filter(F.size(tk) >= 8)
        .select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(S.kgrams_with_dups(tk, 8))).alias("gram"),
        )
    )


@query(
    "ngram_novelty_profile",
    oracle=f"""
    WITH {_GRAMS_SQL},
    first AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST((100 * SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END))
                  // count(*) AS BIGINT) AS novelty_pct
    FROM g JOIN first USING (gram)
    GROUP BY doc_id
    """,
)
def ngram_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-order n-gram NOVELTY per document (round 8) — the
    curation diagnostic behind "how much of this shard is new text?"
    (Lee et al. ACL'22 report the dual, duplicate fraction): a doc's
    distinct 8-grams are NOVEL iff this doc is the first (min doc_id —
    ingestion order) to contain them; the profile emits per-doc gram
    count, novel count, and the integer novelty percentage. Low-novelty
    docs are the crawl's echo chamber — candidates for the dedup
    families; the profile is the cheap scan that decides whether to run
    them.

    At 100 TB: gram first-occurrence is ONE gram-keyed exchange
    (partial min map-side); attribution joins back on the SAME gram
    key (co-partitioned, no second shuffle of the big side under AQE);
    the per-doc rollup rides a doc_id exchange of counting rows only.
    No df cap needed — min() is insensitive to hot grams (contrast the
    pair-join families, which must cap)."""
    g = _doc_grams(spark, sf_dir).localCheckpoint(eager=False)  # feeds both
    first = g.groupBy("gram").agg(F.min("doc_id").alias("fd"))
    novel = F.when(F.col("doc_id") == F.col("fd"), 1).otherwise(0)
    return (
        g.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(100 * n_novel) DIV n_grams").alias("novelty_pct"),
        )
    )


@query(
    "contamination_overlap_fraction",
    oracle=f"""
    WITH {_GRAMS_SQL},
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
    shared AS (
      SELECT g.doc_id, count(*) AS n_shared
      FROM g JOIN bench USING (gram)
      WHERE g.doc_id % 20 <> 0
      GROUP BY g.doc_id
    ),
    corpus AS (
      SELECT doc_id, len(grams) AS n_grams FROM sh WHERE doc_id % 20 <> 0
    )
    SELECT c.doc_id,
           CAST(c.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
           CAST((100 * COALESCE(s.n_shared, 0)) // c.n_grams AS BIGINT)
             AS overlap_pct,
           (100 * COALESCE(s.n_shared, 0)) // c.n_grams >= 20 AS is_dirty
    FROM corpus c LEFT JOIN shared s USING (doc_id)
    """,
)
def contamination_overlap_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRACTIONAL benchmark-overlap decontamination (round 8) — the
    GPT-3 appendix-C operating point the binary families
    (ngram_decontamination: any shared gram; bloom: membership) don't
    express: per corpus document, the PERCENTAGE of its distinct
    8-grams found in the benchmark set (docs with doc_id % 20 = 0, the
    family's held-out convention), with the dirty verdict at >= 20%
    overlap. Unlike ngram_decontamination this emits EVERY corpus doc
    — the zero-overlap rows are the clean majority a reviewer audits
    against — and the integer percentage makes the whole report
    value-hash exact.

    At 100 TB: the benchmark gram set is benchmark-sized (constant) —
    broadcast; the corpus gram stream joins against it map-side, so the
    only exchange is the per-doc count rollup. The 20% threshold is a
    Column literal — sweeping it is free."""
    g = _doc_grams(spark, sf_dir).localCheckpoint(eager=False)
    bench = g.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    corpus = (
        g.filter(F.col("doc_id") % 20 != 0)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    shared = (
        g.filter(F.col("doc_id") % 20 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        corpus.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            F.expr("(100 * coalesce(n_shared, 0)) DIV n_grams").alias(
                "overlap_pct"
            ),
            (
                F.expr("(100 * coalesce(n_shared, 0)) DIV n_grams") >= 20
            ).alias("is_dirty"),
        )
    )


_MIX_BUDGET = 5_000


@query(
    "post_dedup_mix_shift",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, source
      FROM documents WHERE doc_id % 20 = 0
    ),
    tok AS (
      SELECT doc_id, source, md5(text) AS fp,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM corpus
    ),
    kept AS (
      SELECT doc_id, source, n_tok FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
        FROM tok) WHERE rk = 1
    ),
    b AS (SELECT source, count(*) AS n_docs_before,
                 CAST(SUM(n_tok) AS BIGINT) AS tokens_before
          FROM tok GROUP BY source),
    a AS (SELECT source, count(*) AS n_docs_after,
                 CAST(SUM(n_tok) AS BIGINT) AS tokens_after
          FROM kept GROUP BY source),
    w AS (SELECT b.source, n_docs_before, tokens_before,
                 n_docs_after, tokens_after,
                 {_isqrt_sql("tokens_before", "//")} AS w_before,
                 {_isqrt_sql("tokens_after", "//")} AS w_after
          FROM b JOIN a ON a.source = b.source),
    sw AS (SELECT SUM(w_before) AS swb, SUM(w_after) AS swa FROM w)
    SELECT source, n_docs_before, n_docs_after, tokens_before, tokens_after,
           CAST(({_MIX_BUDGET} * w_before) // (SELECT swb FROM sw) AS BIGINT)
             AS alloc_before,
           CAST(({_MIX_BUDGET} * w_after) // (SELECT swa FROM sw) AS BIGINT)
             AS alloc_after,
           CAST(({_MIX_BUDGET} * w_after) // (SELECT swa FROM sw)
              - ({_MIX_BUDGET} * w_before) // (SELECT swb FROM sw) AS BIGINT)
             AS alloc_shift
    FROM w
    """,
)
def post_dedup_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEDUP → MIXTURE interaction report (round 8): exact dedup
    changes per-source token totals, which changes the sqrt-temperature
    mixing weights, which changes every source's token allocation — a
    real pipeline runs the mix AFTER dedup or trains on stale weights.
    Over the duplicated-corpus fixture (the dedup family's %20 clone
    convention; clones keep their source): fingerprint dedup keeps the
    min-doc_id copy (a text duplicated ACROSS sources credits the
    earliest source — exactly the cross-source mass transfer the report
    exists to expose), then both allocations compute with the exact
    int64 isqrt (curation4._isqrt_sql) and integer division against the
    same {_MIX_BUDGET}-token budget, so alloc_shift is integer-exact
    per source.

    At 100 TB: dedup is ONE fingerprint-keyed exchange of 16-byte keys
    (row_number, keep-first); the before/after rollups are source-keyed
    partial aggregates; the weight sums are 1-row broadcasts — the
    report costs one corpus scan plus bounded exchanges."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text", "source").unionByName(
        docs.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
        )
    )
    tok = corpus.select(
        "doc_id",
        "source",
        F.md5("text").alias("fp"),
        F.size(tokens("text")).alias("n_tok"),
    ).localCheckpoint(eager=False)  # feeds the before rollup AND dedup
    from pyspark.sql.window import Window as W

    rw = W.partitionBy("fp").orderBy("doc_id")
    kept = (
        tok.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "n_tok")
    )
    before = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_before"),
        F.sum("n_tok").cast("long").alias("tokens_before"),
    )
    after = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_after"),
        F.sum("n_tok").cast("long").alias("tokens_after"),
    )
    w = (
        before.join(after, "source")
        .withColumn("w_before", F.expr(_isqrt_sql("tokens_before", "DIV")))
        .withColumn("w_after", F.expr(_isqrt_sql("tokens_after", "DIV")))
        .localCheckpoint(eager=False)  # feeds the weight sums AND the report
    )
    sw = w.agg(
        F.sum("w_before").alias("swb"), F.sum("w_after").alias("swa")
    )
    return w.crossJoin(F.broadcast(sw)).select(
        "source",
        "n_docs_before",
        "n_docs_after",
        "tokens_before",
        "tokens_after",
        F.expr(f"({_MIX_BUDGET} * w_before) DIV swb").alias("alloc_before"),
        F.expr(f"({_MIX_BUDGET} * w_after) DIV swa").alias("alloc_after"),
        F.expr(
            f"({_MIX_BUDGET} * w_after) DIV swa"
            f" - ({_MIX_BUDGET} * w_before) DIV swb"
        ).alias("alloc_shift"),
    )


@query(
    "embedding_dispersion_by_label",
    oracle="""
    WITH ex AS (
      SELECT label, vec_id, i AS idx, embedding[i]::DOUBLE AS val
      FROM (SELECT *, unnest(range(1, len(embedding) + 1)) AS i
            FROM embeddings)
    ),
    comp AS (
      SELECT label, idx,
             SUM(CAST(round(val, 9) AS DECIMAL(28,9))) AS s,
             count(*) AS n
      FROM ex GROUP BY label, idx
    ),
    cent AS (
      SELECT label, list(CAST(s AS DOUBLE) / n ORDER BY idx) AS cv
      FROM comp GROUP BY label
    ),
    scored AS (
      SELECT e.label, e.vec_id,
             round((list_reduce(list_prepend(0.0::DOUBLE,
                      list_transform(list_zip(e.embedding, c.cv),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE)),
                      (x, y) -> x + y))
                   / sqrt((list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(list_zip(e.embedding, e.embedding),
                                       p -> p[1]::DOUBLE * p[2]::DOUBLE)),
                        (x, y) -> x + y))
                      * (list_reduce(list_prepend(0.0::DOUBLE,
                        list_transform(list_zip(c.cv, c.cv),
                                       p -> p[1]::DOUBLE * p[2]::DOUBLE)),
                        (x, y) -> x + y))), 9) AS cos9
      FROM embeddings e JOIN cent c USING (label)
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(cos9 AS DECIMAL(28,9))) AS DOUBLE) / count(*)
                AS DOUBLE) AS mean_centroid_cosine
    FROM scored GROUP BY label
    """,
)
def embedding_dispersion_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding DISPERSION (round 8) — the diversity twin of
    the dedup families: a group whose members sit tight around their
    centroid (mean member→centroid cosine near 1) is semantically
    redundant — SemDeDup will prune it hard; a dispersed group carries
    diverse signal. The report is the cheap scan that predicts pruning
    yield before running it (Abbas et al. 2023 motivate pruning by
    exactly this within-cluster similarity structure).

    Exactness discipline: centroid components are DECIMAL(28,9) sums of
    round(val, 9) doubles divided once (order-independent both
    engines); member→centroid cosine is the bit-identical left fold
    against the SAME centroid doubles; the per-group mean re-applies
    the round→DECIMAL→divide recipe — the whole report value-hash
    oracles with no float summation anywhere.

    At 100 TB: the component sums ride ONE (label, idx) exchange of
    decimal partials (map-side combined, dim×|labels| rows out);
    centroids are a |labels|-row broadcast; scoring is map-side; the
    final rollup exchanges |labels| partials. Nothing pairwise, nothing
    corpus-sized shuffles."""
    from dataflowjavasdk_spark.functions import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("idx0", "val")
    ).select("label", (F.col("idx0") + 1).alias("idx"), "val")
    comp = ex.groupBy("label", "idx").agg(
        F.sum(
            F.round(F.col("val").cast("double"), 9).cast("decimal(28,9)")
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = (
        comp.select(
            "label", "idx", (F.col("s").cast("double") / F.col("n")).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "c"))),
                lambda st: st.c,
            ).alias("cv")
        )
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label",
        F.round(SIM.cosine(F.col("embedding"), F.col("cv")), 9).alias("cos9"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("cos9").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("mean_centroid_cosine"),
    )


_SOURCE_CAP = 15  # max docs kept per source (bites at sf0.01: ~25/source)


@query(
    "source_quality_cap",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks,
             length(text)::DOUBLE AS n_chars
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
             0.4 * least(greatest(len(toks), 1)::DOUBLE / 200.0, 1.0)
             + 0.3 * (CASE WHEN n_chars / greatest(len(toks), 1)
                                BETWEEN 3.0 AND 10.0
                           THEN 1.0 ELSE 0.5 END)
             + 0.3 * (len(list_distinct(toks))::DOUBLE
                      / greatest(len(toks), 1)) AS quality
      FROM feat
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rk
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= {_SOURCE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk > {_SOURCE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rk <= {_SOURCE_CAP} THEN n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN rk > {_SOURCE_CAP} THEN n_tokens ELSE 0 END)
                AS BIGINT) AS dropped_tokens
    FROM ranked GROUP BY source
    """,
)
def source_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-ranked cap (round 8) — the per-DOMAIN cap every
    web-scale pipeline applies against SEO farms and over-crawled hosts:
    keep at most _SOURCE_CAP (15) documents per source, chosen by quality
    score (functions/text.py::quality_score) with doc_id as the deterministic
    tiebreak, and account the kept/dropped token mass per source. This is
    the RANKED counterpart of the probabilistic samplers
    (stratified_source_mix samples proportionally;
    weighted_sample_per_source hashes) — a cap selects the BEST N, not a
    random N, which is what production does when the per-domain excess is
    adversarial rather than redundant.

    Cross-engine exactness: the quality score is fixed IEEE arithmetic
    over exact integer features (the language_id_quality contract), so
    ranks match bit-for-bit and every emitted number is an integer.

    Scale shape: ONE exchange on the source key; row_number + the
    capped/uncapped conditional sums all ride that single partitioning
    (the window and the rollup share it), and nothing corpus-sized moves
    twice. A skewed mega-domain streams through one partition's sorter
    (UnsafeExternalSorter spills; at 100 TB the salting escape hatch in
    salted_join_hot_keys applies if one domain dominates a task)."""
    from pyspark.sql.window import Window as W

    from dataflowjavasdk_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    )
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    )
    ranked = scored.withColumn("rk", rk)
    kept = F.col("rk") <= _SOURCE_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum(F.when(~kept, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("dropped_tokens"),
    )


@query(
    "embedding_dim_energy",
    oracle="""
    WITH ex AS (
      SELECT i AS idx, embedding[i]::DOUBLE AS val
      FROM (SELECT *, unnest(range(1, len(embedding) + 1)) AS i
            FROM embeddings)
    ),
    comp AS (
      SELECT idx,
             count(*) AS n,
             SUM(CAST(round(val, 9) AS DECIMAL(28,9))) AS s,
             SUM(CAST(round(val * val, 9) AS DECIMAL(28,9))) AS s2
      FROM ex GROUP BY idx
    ),
    stats AS (
      SELECT idx, n,
             CAST(s AS DOUBLE) / n AS mean,
             (CAST(s2 AS DOUBLE) / n)
               - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS var
      FROM comp
    ),
    nano AS (
      SELECT idx, CAST(n AS BIGINT) AS n,
             round(mean, 9) AS mean,
             round(var, 9) AS variance,
             floor(var * 1000000000.0)::BIGINT AS var_nano
      FROM stats
    )
    SELECT idx, n, mean, variance,
           CAST(sum(var_nano) OVER (ORDER BY idx
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_var_nano,
           CAST(floor(sum(var_nano) OVER (ORDER BY idx
                                          ROWS UNBOUNDED PRECEDING)
                      * 10000.0 / sum(var_nano) OVER ()) AS BIGINT)
             AS cum_energy_bp
    FROM nano
    """,
)
def embedding_dim_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension energy profile (round 8) — the report that decides
    whether Matryoshka-style truncation (embedding_compression_recall's
    dim32/dim16 rows) is justified: per dim, the corpus variance and the
    CUMULATIVE energy share in basis points. An embedding trained with
    Matryoshka loss front-loads energy (cum share at dim 16 ≫ 2500 bp);
    an isotropic embedding — like this synthetic fixture, MEASURED at
    sf0.01: 2558 bp at dim 16, 5068 bp at dim 32 — carries ~uniform
    energy, so truncation loses recall proportionally, which is exactly
    what the compression ladder measures. Read together, the two
    reports turn "can we store a quarter of the vector?" into arithmetic.

    Exactness discipline: per-dim Σx and Σx² are DECIMAL(28,9) sums of
    round(·, 9) doubles (order-free), divided once; the variance chain is
    fixed IEEE on those deterministic doubles; cumulative sums run over
    floor(var·1e9) int64 — exact window arithmetic — and the share is an
    integer floor against the same int total, so every emitted column
    value-hashes (mean/variance are round-9 doubles, the rest integers).

    At 100 TB: ONE idx-keyed exchange of decimal partials (map-side
    combined, dim rows out); the window pass runs over the dim-sized
    relation (64 rows) — free at any corpus size."""
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("idx0", "val")).select(
        (F.col("idx0") + 1).alias("idx"), F.col("val").cast("double").alias("val")
    )
    comp = ex.groupBy("idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("val"), 9).cast("decimal(28,9)")).alias("s"),
        F.sum(
            F.round(F.col("val") * F.col("val"), 9).cast("decimal(28,9)")
        ).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("s2").cast("double") / F.col("n")) - mean * mean
    nano = comp.select(
        "idx",
        F.col("n").cast("long").alias("n"),
        F.round(mean, 9).alias("mean"),
        F.round(var, 9).alias("variance"),
        F.floor(var * 1_000_000_000.0).cast("long").alias("var_nano"),
    )
    w_cum = W.orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.orderBy("idx").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return nano.select(
        "idx",
        "n",
        "mean",
        "variance",
        F.sum("var_nano").over(w_cum).cast("long").alias("cum_var_nano"),
        F.floor(
            F.sum("var_nano").over(w_cum)
            * 10000.0
            / F.sum("var_nano").over(w_all)
        )
        .cast("long")
        .alias("cum_energy_bp"),
    )
