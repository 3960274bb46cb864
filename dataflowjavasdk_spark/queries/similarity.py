"""Similarity-search queries over `embeddings` (array<float> × 64) —
the ANN surface a training-data pipeline needs (SURVEY.md §7.1 P7).

Cross-engine exactness: cosine is computed as sequential left-fold double
arithmetic in BOTH engines (Spark F.aggregate ≡ DuckDB list_reduce over
list_transform), which is bit-identical (verified this session) — so even
top-k ranks match exactly without tolerance hacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dataflowjavasdk_spark.functions import similarity as S
from dataflowjavasdk_spark.queries.registry import query
from dataflowjavasdk_spark.sources.tables import load_table

_SQL_DOT = """
  list_reduce(
    list_prepend(0.0::DOUBLE,
      list_transform(list_zip({a}, {b}),
                     p -> p[1]::DOUBLE * p[2]::DOUBLE)),
    (x, y) -> x + y)
"""


def _sql_cosine(a: str, b: str) -> str:
    dot = _SQL_DOT.format(a=a, b=b)
    na = _SQL_DOT.format(a=a, b=a)
    nb = _SQL_DOT.format(a=b, b=b)
    return f"({dot}) / sqrt(({na}) * ({nb}))"


def _sql_bucket(v: str, planes: int = 8) -> str:
    """DuckDB twin of functions/similarity.py random_hyperplane_bucket
    (dim 64): identical md5-derived plane components and the same
    sequential left-fold dot, so bucket ids match bit-for-bit."""
    return f"""list_reduce(list_prepend(0, list_transform(range(0, {planes}), p ->
      CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(0, 64), d ->
          {v}[d + 1]::DOUBLE *
          (((('0x' || substr(md5('plane:' || p::VARCHAR || ':' || d::VARCHAR), 1, 15))::BIGINT % 2001)::DOUBLE - 1000.0) / 1000.0)
        )), (a, b) -> a + b) >= 0 THEN 1 ELSE 0 END)),
      (acc, b) -> acc * 2 + b)"""


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_sql_cosine('q.qv', 'e.embedding')} AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a query set (vec_id < 5) against the
    corpus. Scale shape: the query set broadcasts (never the corpus); the
    corpus streams through the scorer map-side; per-query top-k via
    window row_number over the scored (small) side. At 100 TB you shard
    the query set and keep the corpus scan single-pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.cosine(F.col("qv"), F.col("embedding")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
          FROM b WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_sql_cosine('q.qv', 'e.embedding')} AS cosine
      FROM q JOIN b e ON e.bucket = q.qbucket AND e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via sign-random-projection LSH:
    bucket every vector by 8 deterministic hyperplane signs (per-row
    expression, zero shuffle), then score only within the query's bucket —
    the candidate set shrinks ~2^8 vs brute force. Fully SQL-oracled —
    the hyperplanes are md5-derived and the dot a bit-identical left fold,
    so DuckDB reproduces buckets AND ranks exactly; recall vs brute force
    is additionally unit-tested (tests/test_dedup_similarity.py).
    At scale: multiple hash tables (OR-amplification) raise recall; each
    is one more bucket column, same join shape."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", S.random_hyperplane_bucket(F.col("embedding"), planes=8, dim=64)
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        emb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            S.cosine(F.col("qv"), F.col("embedding")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "embedding_label_stats",
    oracle="""
    SELECT label, count(*) AS n,
           CAST(SUM(CAST(round(
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
               (a, b) -> a + b), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm2
    FROM embeddings GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count + exact sum of squared norms. The per-row norm² is
    a bit-identical left fold; rounding to 6 dp then exact-decimal summing
    makes the cross-row aggregate order-independent (the fold is per-row
    deterministic, but summing doubles across rows would not be)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(S.norm2(F.col("embedding")), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_norm2"),
    )


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_sql_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= 0.35
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-family twin of the
    ANN queries: emit (a, b) with cosine ≥ τ, candidates blocked by an
    equi-join key (label here; at 100 TB an LSH bucket or IVF cell — never
    an unblocked cross join). The fixture embeddings are random, so τ=0.35
    sits at the tail of the within-label similarity distribution (max
    observed 0.47) purely to exercise the operator; real near-dup corpora
    use τ≈0.95+. Deterministic: the cosine fold is bit-identical
    cross-engine, so the threshold comparison can never disagree."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("label"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
    )
    return (
        a.join(b, (a.label == b.label_b) & (a.vec_a < b.vec_b))
        .withColumn("cosine", S.cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= 0.35)
        .select("label", "vec_a", "vec_b", "cosine")
    )


@query(
    "ann_lsh_multitable",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_sql_bucket('embedding', 8)} AS b0,
             ({_sql_bucket('embedding', 16)}) % 256 AS b1
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, b0 AS qb0, b1 AS qb1
          FROM b WHERE vec_id < 5),
    pairs AS (
      SELECT DISTINCT q.query_id, e.vec_id AS neighbor_id
      FROM q JOIN b e
        ON (e.b0 = q.qb0 OR e.b1 = q.qb1) AND e.vec_id <> q.query_id
    ),
    scored AS (
      SELECT p.query_id, p.neighbor_id,
             {_sql_cosine('q.qv', 'e.embedding')} AS cosine
      FROM pairs p
      JOIN q ON q.query_id = p.query_id
      JOIN b e ON e.vec_id = p.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
    """,
)
def ann_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified LSH ANN: two independent hyperplane tables; a corpus
    vector is a candidate if it collides with the query in EITHER table —
    the recall-raising construction the single-table variant documents.
    Implemented as a union of two equi-joins (each hash-partitioned — the
    OR never becomes a non-equi join) + distinct. Fully SQL-oracled (both
    plane families are md5-deterministic); recall ≥ the single-table
    query is additionally asserted in tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    tabled = emb.withColumn(
        "b0", S.random_hyperplane_bucket(F.col("embedding"), planes=8, dim=64)
    ).withColumn(
        # a disjoint plane family: offset the plane index namespace
        "b1",
        S.random_hyperplane_bucket(F.col("embedding"), planes=16, dim=64) % 256,
    )
    q = tabled.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )
    def table_join(bucket_col: str, q_bucket: str):
        return tabled.join(
            F.broadcast(q),
            (F.col(bucket_col) == F.col(q_bucket))
            & (F.col("vec_id") != F.col("query_id")),
        ).select("query_id", F.col("vec_id").alias("neighbor_id"), "qv", "embedding")

    cands = table_join("b0", "qb0").unionByName(table_join("b1", "qb1")).distinct()
    scored = cands.select(
        "query_id",
        "neighbor_id",
        S.cosine(F.col("qv"), F.col("embedding")).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "embedding_decontamination",
    oracle=f"""
    WITH b AS (SELECT vec_id AS bench_id, embedding AS bv FROM embeddings
               WHERE vec_id % 20 = 0),
    c AS (SELECT vec_id, label, embedding FROM embeddings
          WHERE vec_id % 20 <> 0),
    scored AS (
      SELECT c.vec_id, c.label, b.bench_id,
             {_sql_cosine('c.embedding', 'b.bv')} AS cosine
      FROM c CROSS JOIN b
    ),
    best AS (
      SELECT vec_id, label, bench_id, cosine,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, bench_id) AS rk
      FROM scored
    )
    SELECT vec_id, label, bench_id, cosine,
           cosine >= 0.4 AS is_contaminated
    FROM best WHERE rk = 1
    """,
)
def embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination — the embedding-space sibling of
    the 8-gram/Bloom lexical decontaminations (queries/curation*.py): a
    corpus vector is contaminated when its cosine against ANY benchmark
    vector (vec_id % 20 = 0, the same held-out convention) reaches the
    threshold. Emits every corpus row with its closest benchmark match
    and the verdict, so both branches are value-oracled (the fold cosine
    is bit-identical cross-engine, like the other similarity queries).

    Scale shape: the benchmark registry is constant-size (it is a
    benchmark, not a corpus) -> broadcast; the corpus streams through the
    scorer map-side in one pass; per-row best match is a window over the
    scored side partitioned by corpus id. When the benchmark side grows
    past broadcast range, the LSH-bucket prefilter (ann_lsh_multitable's
    OR-amplified tables, tuned for recall) bounds candidates instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("bv")
    )
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "label",
        "bench_id",
        S.cosine(F.col("embedding"), F.col("bv")).alias("cosine"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("bench_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            "label",
            "bench_id",
            "cosine",
            (F.col("cosine") >= 0.4).alias("is_contaminated"),
        )
    )


@query(
    "ann_recall_report",
    oracle=f"""
    WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id < 5),
    ex_scored AS (
      SELECT q0.query_id, e.vec_id AS neighbor_id,
             {_sql_cosine('q0.qv', 'e.embedding')} AS cosine
      FROM q0 CROSS JOIN embeddings e
      WHERE e.vec_id <> q0.query_id
    ),
    ex_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM ex_scored) WHERE rk <= 5
    ),
    b AS (
      SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
      FROM embeddings
    ),
    qb AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
           FROM b WHERE vec_id < 5),
    ann_scored AS (
      SELECT qb.query_id, e.vec_id AS neighbor_id,
             {_sql_cosine('qb.qv', 'e.embedding')} AS cosine
      FROM qb JOIN b e ON e.bucket = qb.qbucket AND e.vec_id <> qb.query_id
    ),
    ann_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rk
        FROM ann_scored) WHERE rk <= 5
    )
    SELECT x.query_id,
           count(*) AS n_exact,
           (SELECT count(*) FROM ann_top a
            WHERE a.query_id = x.query_id) AS n_ann,
           CAST(SUM(CASE WHEN EXISTS (
                  SELECT 1 FROM ann_top a
                  WHERE a.query_id = x.query_id
                    AND a.neighbor_id = x.neighbor_id)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN EXISTS (
                  SELECT 1 FROM ann_top a
                  WHERE a.query_id = x.query_id
                    AND a.neighbor_id = x.neighbor_id)
                THEN 1 ELSE 0 END) * 20 AS BIGINT) AS recall_pct
    FROM ex_top x GROUP BY x.query_id
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality EVAL, in-plan (round 5) — the measurement every ANN
    deployment runs before trusting an index: recall@5 of the LSH index
    (ann_lsh_topk) against brute-force ground truth
    (cosine_topk_bruteforce), per query. Both pipelines are the already-
    oracled registered queries composed unchanged; the report joins
    their top-5 sets and counts overlap — n_hits*20 gives an INTEGER
    recall percentage (k=5), so the whole eval value-hash oracles with
    no float output at all (the cosine scores never leave the ranking).
    A query whose LSH bucket holds fewer than 5 neighbors shows
    n_ann < 5 — the candidate-starvation signal that tells an operator
    to add tables (ann_lsh_multitable) or raise nprobe (IVF).

    Scale shape: ground truth costs one corpus scan per query batch (the
    documented brute-force baseline — at 100 TB you run it over a
    SAMPLED query set, which is exactly what the vec_id < 5 probe set
    is); the report side joins two 25-row relations. Production recall
    tracking is this query on a nightly sample."""
    # Pin both 25-row top-k relations: each feeds its count aggregate AND
    # the hit join — without the pin Spark re-derives the full scoring
    # pipeline per consumer (8 corpus scans; the scan-discipline rule).
    exact = (
        cosine_topk_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    ann = (
        ann_lsh_topk(spark, sf_dir)
        .select("query_id", F.col("neighbor_id").alias("ann_neighbor_id"))
        .localCheckpoint(eager=False)
    )
    exact_g = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    ann_g = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    hits = (
        exact.join(
            ann,
            (exact.query_id == ann.query_id)
            & (exact.neighbor_id == ann.ann_neighbor_id),
        )
        .groupBy(exact.query_id)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = (
        exact_g.join(ann_g, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).alias("n_ann"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) * 20).alias("recall_pct"),
        )
    )
    return out


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neg_label,
             {_sql_cosine('q.qv', 'e.embedding')} AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.label <> q.qlabel
    ),
    ranked AS (
      SELECT query_id, neighbor_id, neg_label, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, neg_label, cosine, rk
    FROM ranked WHERE rk <= 5
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (round 6) — the contrastive-training data op:
    for each query vector, the most cosine-similar corpus vectors whose
    LABEL differs (similar-looking, semantically wrong — the negatives
    that actually teach a retrieval model). Same scale shape as
    cosine_topk_bruteforce: the query set broadcasts with its labels,
    the corpus streams map-side, the label-mismatch predicate filters
    before ranking, and per-query top-5 rides a bounded window. The
    label column is the fixture's weak ground truth; production swaps in
    the deduped cluster id (near_dup_clusters) so near-dups of the
    positive can never be mined as negatives — the standard
    false-negative guard."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = emb.join(
        F.broadcast(q), F.col("label") != F.col("qlabel")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neg_label"),
        S.cosine(F.col("qv"), F.col("embedding")).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )


def _li_score_sql(q: str, d: str, n_sub: int = 4, sub: int = 16) -> str:
    """DuckDB text of the late-interaction score: sum over query
    subvectors of the max cosine against any doc subvector. Expanded
    literally (n_sub x n_sub cosine fragments) so both engines run the
    identical fold shapes."""

    def sl(v: str, m: int) -> str:
        return f"array_slice({v}, {m * sub + 1}, {(m + 1) * sub})"

    per_q = []
    for mq in range(n_sub):
        cos = [
            f"({_sql_cosine(sl(q, mq), sl(d, md))})" for md in range(n_sub)
        ]
        per_q.append(f"greatest({', '.join(cos)})")
    return "(" + " + ".join(per_q) + ")"


@query(
    "late_interaction_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_li_score_sql('q.qv', 'e.embedding')} AS li_score
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, li_score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY li_score DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, li_score, rk FROM ranked WHERE rk <= 5
    """,
)
def late_interaction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (round 6, public method:
    Khattab & Zaharia 2020) on the fixture's single-vector table: the
    64-dim embedding is treated as 4 x 16-dim "token" subvectors, and
    the relevance score is MaxSim — for each query subvector, the best
    cosine against any document subvector, summed. Captures partial /
    aspect matches a single whole-vector cosine averages away. The
    score is a pure JVM expression tree (16 slice-cosines, 4 greatest,
    one sum — no UDF); the DuckDB twin expands the identical folds, so
    ranking oracles exactly.

    Scale shape: identical to cosine_topk_bruteforce — query set (with
    subvector structure) broadcasts, the corpus streams map-side
    through the scorer, per-query top-5 rides a bounded window. The
    production variant stores subvectors pre-sliced; the expression
    shape (and its cost, ~n_sub^2 fused multiply-adds per pair) is the
    same."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )

    def sl(col, m):
        return F.slice(col, m * 16 + 1, 16)

    def li_score(qv, dv):
        return sum(
            F.greatest(*[S.cosine(sl(qv, mq), sl(dv, md)) for md in range(4)])
            for mq in range(4)
        )

    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        li_score(F.col("qv"), F.col("embedding")).alias("li_score"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("li_score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )
