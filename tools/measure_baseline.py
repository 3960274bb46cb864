"""Re-measure BASELINE.md's PySpark comparables under bench.py's exact
protocol (round-3b, two-phase): one shared session; phase 1 executes
EVERY query once (concentrates JVM-wide JIT before any timing), then per
query a re-warm followed by the median of 5 timed re-executions of the
retained DataFrame, materialized via toArrow(). These plain queries pin
nothing, so a retained-DataFrame rep is a full re-execution — the same
steady-state semantics as bench.py's `queries` timings.

Round-1 BASELINE rows for q1/q3/tumbling were measured with per-query
session-cold costs that bench.py amortizes, which made BENCH_r01 look
0.07–0.16× of baseline — a headroom illusion that would mask real
round-over-round regressions (VERDICT.md round 1, "Next round" #8).

The formulations here are deliberately PLAIN PySpark — the obvious
DataFrame code a user would write against the parquet fixtures, no engine
imports. Since round 4 both the plain rows and their engine twins run in
ONE shared session that carries the engine's runtime confs (AQE,
advisory partition size, UTC) — the controlled variable is the QUERY
FORMULATION, with identical confs/JIT/host conditions on both sides, so
the ratio column isolates what the engine's code shape costs or saves.
It is NOT an out-of-the-box-Spark yardstick (out-of-box defaults would
disadvantage both sides equally anyway, chiefly via 200 shuffle
partitions). DuckDB twins run under the same warm protocol for the
oracle-speed column.

Usage: python tools/measure_baseline.py [sf_dir]  → markdown rows on stdout
"""

from __future__ import annotations

import sys
import time

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def spark_queries(spark):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cu = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ev_raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # Normalize events.ts per fixture vintage: TIMESTAMP(NANOS) rounds read
    # as bigint nanos (nanosAsLong conf) and need integer-division micros
    # (float `/1000` loses ulps: epoch-nanos exceed double's 53-bit
    # mantissa); TIMESTAMP(MICROS) NTZ rounds just cast to session time.
    ts_type = dict(ev_raw.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev_raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    else:
        ev = ev_raw.withColumn("ts", F.col("ts").cast("timestamp"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def q1():
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ).alias("sum_charge"),
                F.avg("l_quantity").alias("avg_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    def q3():
        return (
            cu.filter(F.col("c_mktsegment") == "BUILDING")
            .join(od, F.col("c_custkey") == F.col("o_custkey"))
            .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "l_orderkey")
            .limit(10)
        )

    def tumbling():
        return (
            ev.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )

    def approx_distinct():
        return ev.agg(F.approx_count_distinct("user_id").alias("approx_users"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def wordcount():
        return (
            docs.select(
                F.explode(F.split("text", r"\s+")).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy("word")
            .count()
        )

    def dedup_exact():
        fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
        return (
            docs.select("doc_id", fp.alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )

    def session_windows():
        return (
            ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        )

    def topk_per_group():
        from pyspark.sql.window import Window as W

        sums = ev.groupBy("event_type", "user_id").agg(
            F.sum("value").alias("sum_value")
        )
        w = W.partitionBy("event_type").orderBy(
            F.col("sum_value").desc(), F.col("user_id")
        )
        return sums.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)

    def quantile_rollup():
        # The plain formulation kll_quantiles_rollup competes with: built-in
        # percentile_approx per type plus a global row via rollup — no
        # mergeable sketch store, rescans values for every rollup level.
        return (
            ev.rollup("event_type")
            .agg(
                F.percentile_approx(
                    "value", [0.25, 0.5, 0.75, 0.9], 10000
                ).alias("qs")
            )
            .select(
                F.coalesce("event_type", F.lit("ALL")).alias("scope"), "qs"
            )
        )

    def tfidf_regex():
        # Plain user's TF-IDF over the regex tokenizer: driver-side
        # count() for N, no pinning (the tokenized relation recomputes
        # for both branches), no broadcast decisions — the obvious code.
        from pyspark.sql.window import Window as W

        pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
        tok = docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
            ).alias("term"),
        )
        tf = (
            tok.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("n_term"))
            .withColumn("n_doc", F.sum("n_term").over(W.partitionBy("doc_id")))
        )
        dfr = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        n_docs = docs.count()
        return tf.join(dfr, "term").select(
            "doc_id",
            "term",
            F.round(
                (F.col("n_term").cast("double") / F.col("n_doc"))
                * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
                9,
            ).alias("tfidf"),
        )

    def tfidf_ws():
        # Plain user's TF-IDF over the whitespace tokenizer — the plain
        # twin of the engine's `tfidf` query (added round 7 to adjudicate
        # the r6 driver-bench outlier with an interleaved same-session
        # number): driver-side count() for N, no pinning (the tokenized
        # relation recomputes for both branches), no broadcast decisions.
        from pyspark.sql.window import Window as W

        tok = docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        tf = (
            tok.filter(F.col("term") != "")
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("n_term"))
            .withColumn("n_doc", F.sum("n_term").over(W.partitionBy("doc_id")))
        )
        dfr = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        n_docs = docs.count()
        return tf.join(dfr, "term").select(
            "doc_id",
            "term",
            F.round(
                (F.col("n_term").cast("double") / F.col("n_doc"))
                * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
                9,
            ).alias("tfidf"),
        )

    def bm25_plain():
        # Plain user's BM25 (round-8 twin of bm25_retrieval_topk): the
        # obvious code — driver-side count() for N and avgdl (two extra
        # full passes), no pinning (tok recomputes for tf and df), df via
        # countDistinct on the raw explode, same floor-to-micro scoring.
        from pyspark.sql.window import Window as W

        tok = docs.select(
            "doc_id", F.explode(F.split("text", r"\s+")).alias("term")
        ).filter(F.col("term") != "")
        tf = (
            tok.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")))
        )
        dfr = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        n_docs = docs.count()
        avgdl = tok.count() / n_docs
        qterms = docs.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(
                    F.slice(
                        F.filter(
                            F.split("text", r"\s+"), lambda t: t != F.lit("")
                        ),
                        1,
                        4,
                    )
                )
            ).alias("term"),
        )
        idf = F.round(
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
            9,
        )
        tf_part = (F.col("tf").cast("double") * 2.2) / (
            F.col("tf").cast("double")
            + 1.2 * (0.25 + 0.75 * F.col("dl").cast("double") / F.lit(avgdl))
        )
        contrib = (
            tf.join(qterms, "term")
            .filter(F.col("doc_id") != F.col("query_id"))
            .join(dfr, "term")
            .select(
                "query_id",
                "doc_id",
                F.floor(idf * tf_part * 1_000_000.0).cast("long").alias("micro"),
            )
        )
        scored = contrib.groupBy("query_id", "doc_id").agg(
            F.sum("micro").alias("score_micro")
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("score_micro").desc(), "doc_id"
        )
        return scored.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= 10
        )

    def context_pack_plain():
        # Plain user's in-context packing (round-9 twin of
        # semantic_context_pack): the obvious code — zip_with+aggregate
        # cosine, a window rank for nearest-centroid, a second window
        # pair for order + running sum, groupBy for the contexts.
        from pyspark.sql.window import Window as W

        def dot(a, b):
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )

        cent = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cell"), F.col("embedding").alias("cv")
        )
        scored = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "cell",
            (
                dot(F.col("embedding"), F.col("cv"))
                / F.sqrt(
                    dot(F.col("embedding"), F.col("embedding"))
                    * dot(F.col("cv"), F.col("cv"))
                )
            ).alias("ccos"),
        )
        cw = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cell"))
        asg = (
            scored.withColumn("crk", F.row_number().over(cw))
            .filter(F.col("crk") == 1)
            .select("vec_id", "cell", "ccos", (F.col("vec_id") % 4).alias("shard"))
        )
        dtok = docs.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
            ).alias("n_tok"),
        )
        j = dtok.join(asg, dtok.doc_id == asg.vec_id)
        ow = W.partitionBy("cell", "shard").orderBy(
            F.col("ccos").desc(), F.col("doc_id")
        )
        ordered = j.select(
            "doc_id",
            "cell",
            "shard",
            "n_tok",
            F.row_number().over(ow).alias("rn"),
            F.sum("n_tok").over(ow.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        )
        return (
            ordered.withColumn("context_id", F.expr("(cum - n_tok) DIV 160"))
            .groupBy("cell", "shard", "context_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").alias("n_tokens"),
                # same per-context fingerprint the engine emits — the
                # comparable must produce the same OUTPUT, not a subset
                F.conv(
                    F.substring(
                        F.md5(
                            F.array_join(
                                F.transform(
                                    F.array_sort(
                                        F.collect_list(F.struct("rn", "doc_id"))
                                    ),
                                    lambda s: s["doc_id"].cast("string"),
                                ),
                                " ",
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long").alias("docs_fp"),
            )
        )

    def wav_features_plain():
        # Plain user's WAV feature pass (round-10 13th protocol row — the
        # python_evals family finally has a same-protocol comparable):
        # one mapInPandas that synthesizes the payload corpus and decodes
        # it with the stdlib wave module per clip — the obvious code.
        # Like the engine twin, the synthesized corpus is pinned
        # (payloads are STORED in production; steady state measures the
        # DECODE pass, first_run pays the one-time build).
        docs_wav = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "n_chars"
        )

        def synth(batches):
            import io
            import wave

            import numpy as np
            import pandas as pd

            for pdf in batches:
                payloads = []
                for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                    n = 100 + int(n_chars) % 400
                    amp = 1000 * (int(doc_id) % 9 + 1)
                    pcm = np.full(n, amp, dtype="<i2")
                    pcm[1::2] = -amp
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(8000)
                        w.writeframes(pcm.tobytes())
                    payloads.append(buf.getvalue())
                yield pd.DataFrame(
                    {"media_id": pdf["doc_id"], "payload": payloads}
                )

        media = docs_wav.mapInPandas(
            synth, schema="media_id long, payload binary"
        ).localCheckpoint(eager=False)

        def feats(batches):
            import io
            import wave

            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = []
                for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        rate = w.getframerate()
                        n = w.getnframes()
                        pcm = np.frombuffer(
                            w.readframes(n), dtype="<i2"
                        ).astype(np.float64)
                    rms = float(np.sqrt(np.mean(pcm**2))) if n else 0.0
                    zcr = (
                        float(
                            np.mean(
                                np.abs(
                                    np.diff(np.signbit(pcm).astype(np.int8))
                                )
                            )
                        )
                        if n > 1
                        else 0.0
                    )
                    rows.append(
                        {
                            "media_id": media_id,
                            "sample_rate": rate,
                            "n_samples": n,
                            "duration_s": n / rate,
                            "rms": rms / 32768.0,
                            "zero_crossing_rate": zcr,
                        }
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "sample_rate", "n_samples",
                        "duration_s", "rms", "zero_crossing_rate",
                    ],
                )

        return media.mapInPandas(
            feats,
            schema=(
                "media_id long, sample_rate long, n_samples long, "
                "duration_s double, rms double, zero_crossing_rate double"
            ),
        ).select(
            "media_id",
            "sample_rate",
            "n_samples",
            F.round("duration_s", 9).alias("duration_s"),
            F.round("rms", 9).alias("rms"),
            "zero_crossing_rate",
        )

    return {
        "q1_pricing_summary": q1,
        "q3_join_agg": q3,
        "tumbling_window_events": tumbling,
        "approx_distinct": approx_distinct,
        "wordcount": wordcount,
        "dedup_exact_shape": dedup_exact,
        "session_windows_events": session_windows,
        "topk_per_group": topk_per_group,
        "quantile_rollup": quantile_rollup,
        "tfidf_regex": tfidf_regex,
        "tfidf_ws": tfidf_ws,
        "bm25_plain": bm25_plain,
        "context_pack_plain": context_pack_plain,
        "wav_features_plain": wav_features_plain,
    }


DUCK_SQL = {
    "wav_features_plain": """
        SELECT doc_id AS media_id, 8000 AS sample_rate,
               CAST(100 + (n_chars % 400) AS BIGINT) AS n_samples,
               round((100 + (n_chars % 400)) / 8000.0, 9) AS duration_s,
               round((1000 * (doc_id % 9 + 1)) / 32768.0, 9) AS rms,
               1.0::DOUBLE AS zero_crossing_rate
        FROM documents""",
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
               sum(l_extendedprice*(1-l_discount)),
               sum(l_extendedprice*(1-l_discount)*(1+l_tax)),
               avg(l_quantity), avg(l_extendedprice), count(*)
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2 ORDER BY 1, 2""",
    "q3_join_agg": """
        SELECT l_orderkey, o_orderdate,
               sum(l_extendedprice*(1-l_discount)) AS revenue
        FROM customer JOIN orders ON c_custkey=o_custkey
        JOIN lineitem ON o_orderkey=l_orderkey
        WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tumbling_window_events": """
        SELECT date_trunc('hour', ts) AS h, event_type, count(*), sum(value)
        FROM events GROUP BY 1, 2""",
    "approx_distinct": "SELECT approx_count_distinct(user_id) FROM events",
    "wordcount": """
        SELECT word, count(*) FROM
          (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word""",
    "dedup_exact_shape": """
        SELECT fp, min(doc_id), count(*) FROM
          (SELECT doc_id,
                  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
           FROM documents)
        GROUP BY fp HAVING count(*) > 1""",
    "session_windows_events": """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
          FROM events),
        numbered AS (
          SELECT user_id, ts, value,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged)
        SELECT user_id, count(*), sum(value)
        FROM numbered GROUP BY user_id, session_id""",
    "topk_per_group": """
        WITH sums AS (
          SELECT event_type, user_id, sum(value) AS sum_value
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT event_type, user_id, sum_value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY sum_value DESC, user_id) AS rk
          FROM sums)
        SELECT * FROM ranked WHERE rk <= 3""",
    "tfidf_regex": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS n_term,
                 sum(count(*)) OVER (PARTITION BY doc_id) AS n_doc
          FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term,
               round((tf.n_term::DOUBLE / tf.n_doc)
                     * ln((n.n_docs + 1)::DOUBLE / (df.df + 1)), 9)
        FROM tf JOIN df USING (term) CROSS JOIN n""",
    "tfidf_ws": """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS n_term,
                 sum(count(*)) OVER (PARTITION BY doc_id) AS n_doc
          FROM tok WHERE term <> '' GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.term,
               round((tf.n_term::DOUBLE / tf.n_doc)
                     * ln((n.n_docs + 1)::DOUBLE / (df.df + 1)), 9)
        FROM tf JOIN df USING (term) CROSS JOIN n""",
    "quantile_rollup": """
        SELECT coalesce(event_type, 'ALL') AS scope,
               quantile_cont(value, [0.25, 0.5, 0.75, 0.9]) AS qs
        FROM events GROUP BY ROLLUP(event_type)""",
    "bm25_plain": """
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS tf,
                 sum(count(*)) OVER (PARTITION BY doc_id) AS dl
          FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        stats AS (
          SELECT (SELECT count(*) FROM documents) AS n_docs,
                 (SELECT count(*) FROM tok)::DOUBLE
                   / (SELECT count(*) FROM documents) AS avgdl),
        q AS (
          SELECT doc_id AS query_id,
                 unnest(list_distinct(
                   array_slice(list_filter(string_split(text, ' '),
                                           t -> t <> ''), 1, 4))) AS term
          FROM documents WHERE doc_id < 3),
        contrib AS (
          SELECT q.query_id, tf.doc_id,
                 floor(round(ln(1.0 + (stats.n_docs - df.df + 0.5)
                                      / (df.df + 0.5)), 9)
                       * (tf.tf::DOUBLE * 2.2)
                       / (tf.tf::DOUBLE
                          + 1.2 * (0.25 + 0.75 * tf.dl::DOUBLE / stats.avgdl))
                       * 1000000.0)::BIGINT AS micro
          FROM tf JOIN q ON q.term = tf.term AND tf.doc_id <> q.query_id
          JOIN df ON df.term = tf.term CROSS JOIN stats),
        scored AS (
          SELECT query_id, doc_id, CAST(sum(micro) AS BIGINT) AS score_micro
          FROM contrib GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, score_micro, rk FROM (
          SELECT query_id, doc_id, score_micro,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_micro DESC, doc_id) AS rk
          FROM scored)
        WHERE rk <= 10""",
    "context_pack_plain": """
        WITH centroids AS (SELECT vec_id AS cell, embedding AS cv
                           FROM embeddings WHERE vec_id < 8),
        ranked AS (
          SELECT e.vec_id, c.cell,
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(list_zip(e.embedding, c.cv),
                                  p -> p[1]::DOUBLE * p[2]::DOUBLE)),
                   (x, y) -> x + y)
                 / sqrt(
                     list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(list_zip(e.embedding, e.embedding),
                                      p -> p[1]::DOUBLE * p[2]::DOUBLE)),
                       (x, y) -> x + y)
                     * list_reduce(list_prepend(0.0::DOUBLE,
                         list_transform(list_zip(c.cv, c.cv),
                                        p -> p[1]::DOUBLE * p[2]::DOUBLE)),
                         (x, y) -> x + y)) AS ccos
          FROM embeddings e CROSS JOIN centroids c
        ),
        asg AS (
          SELECT vec_id, cell, ccos, vec_id % 4 AS shard FROM (
            SELECT vec_id, cell, ccos,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, cell) AS crk
            FROM ranked) WHERE crk = 1
        ),
        docs AS (
          SELECT d.doc_id, a.cell, a.shard, a.ccos,
                 len(list_filter(string_split(d.text, ' '), t -> t <> ''))
                   AS n_tok
          FROM documents d JOIN asg a ON a.vec_id = d.doc_id
        ),
        ordered AS (
          SELECT doc_id, cell, shard, n_tok, ccos,
                 sum(n_tok) OVER (PARTITION BY cell, shard
                                  ORDER BY ccos DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
          FROM docs
        )
        SELECT cell, shard, (cum - n_tok) // 160 AS context_id,
               count(*) AS n_docs, sum(n_tok) AS n_tokens,
               ('0x' || substr(md5(
                 string_agg(doc_id::VARCHAR, ' ' ORDER BY ccos DESC, doc_id)),
                 1, 15))::BIGINT AS docs_fp
        FROM ordered GROUP BY 1, 2, 3""",
}


# Engine twin of each plain formulation (registered query name). Timed in
# the SAME session and interleaved with the plain runs, so the ratio
# column is immune to the machine-speed drift that cross-run comparisons
# (plain from one session, BENCH.json from another) suffer — measured
# drift between sessions on this host is up to ~40%.
ENGINE_TWIN = {
    "q1_pricing_summary": "q1_pricing_summary",
    "q3_join_agg": "q3_join_agg",
    "tumbling_window_events": "tumbling_hourly_events",
    "wordcount": "wordcount",
    "dedup_exact_shape": "dedup_exact",
    "session_windows_events": "session_windows_events",
    "topk_per_group": "topk_per_group",
    "quantile_rollup": "kll_quantiles_rollup",
    "tfidf_regex": "tfidf_regex",
    "tfidf_ws": "tfidf",
    "bm25_plain": "bm25_retrieval_topk",
    "context_pack_plain": "semantic_context_pack",
    "wav_features_plain": "audio_wav_features",
}


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    qs = spark_queries(spark)

    con = duckdb.connect()
    for t in ("lineitem", "customer", "orders", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    import statistics

    # Same two-phase protocol as bench.py: warm EVERY query once before
    # timing ANY (concentrates JVM-wide JIT in the warm pass), then
    # median of 5 re-executions of the retained DataFrame per query.
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from dataflowjavasdk_spark.queries.registry import get as _get
    from dataflowjavasdk_spark.session import configure_session

    configure_session(spark)  # the engine twins need the runtime confs
    dfs = {name: build() for name, build in qs.items()}
    engine_dfs = {
        name: _get(twin).fn(spark, SF_DIR) for name, twin in ENGINE_TWIN.items()
    }
    for df in list(dfs.values()) + list(engine_dfs.values()):
        df.toArrow()

    def _median5(df):
        df.toArrow()
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.toArrow()
            samples.append(time.perf_counter() - t0)
        return statistics.median(samples) * 1000

    print(
        f"| metric | plain PySpark (two-phase) | engine (same session) | "
        f"ratio | DuckDB warm | sf_dir={SF_DIR} |"
    )
    print("|---|---|---|---|---|---|")
    ratios = []
    for name, df in dfs.items():
        spark_ms = _median5(df)
        engine_ms = _median5(engine_dfs[name]) if name in engine_dfs else None

        sql = DUCK_SQL[name]
        con.execute(sql).fetchall()  # warm-up
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        duck_ms = statistics.median(samples) * 1000
        if engine_ms is not None:
            ratios.append(engine_ms / spark_ms)
            print(
                f"| {name} | {spark_ms:.1f} ms | {engine_ms:.1f} ms | "
                f"{engine_ms / spark_ms:.2f}x | {duck_ms:.1f} ms | |"
            )
        else:
            print(f"| {name} | {spark_ms:.1f} ms | — | — | {duck_ms:.1f} ms | |")
    if ratios:
        import math

        gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        print(f"\ngeomean engine/plain: {gm:.2f}x over {len(ratios)} rows")


if __name__ == "__main__":
    main()
