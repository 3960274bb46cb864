"""Text-function unit tests: tokenization, language ID accuracy against
the fixture's ground-truth lang column, quality scoring, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.functions import text as T
from dataflowjavasdk_spark.sources.tables import load_table
from tests.conftest import SMOKE_SF


def test_fixture_text_is_single_space_delimited():
    """Enforce the oracle-parity contract documented at functions/text.py
    tokens(): Spark tokenizes on \\s+ while every DuckDB twin splits on a
    literal single space — the two agree only because the fixture corpus
    (TESTDATA.md) is single-space-delimited by construction. A regenerated
    fixture with tabs/newlines/double spaces would make every token-based
    oracle diverge with confusing hash mismatches; fail HERE instead
    (r3 ADVICE). Checks every sf the driver uses."""
    import glob
    import os

    import duckdb

    testdata_root = os.path.dirname(SMOKE_SF)
    sf_dirs = sorted(glob.glob(os.path.join(testdata_root, "sf*")))
    if not sf_dirs:
        pytest.skip(f"no fixture dirs under {testdata_root}")
    for sf_dir in sf_dirs:
        bad = duckdb.sql(
            f"""
            SELECT count(*) FROM '{sf_dir}/documents.parquet'
            WHERE regexp_matches(text, '[\\t\\n\\r]')
               OR regexp_matches(text, '  ')
               OR text LIKE ' %' OR text LIKE '% '
            """
        ).fetchone()[0]
        assert bad == 0, (
            f"{sf_dir}/documents.text violates the single-space contract "
            f"({bad} rows) — the \\s+-vs-literal-space oracle parity no "
            "longer holds; normalize in tokens() twins before trusting "
            "token-based oracles"
        )


def test_tokens_filters_empties(spark):
    df = spark.createDataFrame([("a  b c",), ("",)], "s string")
    got = df.select(T.tokens("s").alias("t")).collect()
    assert got[0]["t"] == ["a", "b", "c"]
    assert got[1]["t"] == []


def test_token_count(spark):
    df = spark.createDataFrame([("one two three",)], "s string")
    assert df.select(T.token_count("s")).collect()[0][0] == 3


def test_language_id_on_synthetic_texts(spark):
    # The fixture's lang column is a random label over one shared
    # English-ish vocabulary (verified: stopword density is identical
    # across langs), so content-based language ID is only testable on
    # synthetic text with real linguistic signal.
    df = spark.createDataFrame(
        [
            ("en1", "the cat sat on the mat and it was the best of days"),
            ("en2", "this is a test of the system and it should be fine"),
            ("und1", "zxcv qwer asdf uiop hjkl vbnm qwerty asdfgh zxcvbn"),
            ("und2", "foo bar baz qux quux corge grault garply waldo fred"),
        ],
        "id string, s string",
    )
    got = {r["id"]: r["p"] for r in df.select("id", T.language_id("s").alias("p")).collect()}
    assert got["en1"] == "en" and got["en2"] == "en"
    assert got["und1"] == "und" and got["und2"] == "und"


def test_quality_score_bounds_and_monotonicity(spark):
    df = spark.createDataFrame(
        [
            ("long", " ".join(f"tok{i}" for i in range(250))),
            ("short", "one two"),
            ("repetitive", "spam " * 100),
        ],
        "name string, s string",
    )
    got = {r["name"]: r["q"] for r in df.select("name", T.quality_score("s").alias("q")).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got["long"] > got["short"]
    assert got["long"] > got["repetitive"]  # repetition penalized


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("a", "Hello  world"), ("b", "hello world"), ("c", "different")],
        "id string, s string",
    )
    got = {r["id"]: r["fp"] for r in df.select("id", T.fingerprint("s").alias("fp")).collect()}
    assert got["a"] == got["b"]  # case + whitespace normalized
    assert got["a"] != got["c"]


def test_variant_json_path(spark):
    """SURVEY §1.3: TableRowJsonCoder's arbitrary-JSON rows map to PySpark
    4's VariantType — parse once, extract typed paths without a declared
    schema."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"a": {"b": 3, "tags": ["x", "y"]}}',), ('{"a": {"b": 7}}',)], "j string"
    )
    out = df.select(
        F.variant_get(F.try_parse_json("j"), "$.a.b", "int").alias("b"),
        F.variant_get(F.try_parse_json("j"), "$.a.tags[0]", "string").alias("t0"),
    )
    assert sorted(tuple(r) for r in out.collect()) == [(3, "x"), (7, None)]


def test_repetition_gram_guard_short_docs(spark):
    """The 2-gram build inside repetition_ratio_quality must yield an
    EMPTY gram list for docs with <2 tokens — an unguarded
    F.sequence(0, size-2) emits [0, -1] for those docs and slice(ws,0,2)
    crashes the whole query (round-3 review finding, fixed)."""
    from pyspark.sql import functions as F

    ws = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    k = F.size(ws) - F.lit(1)
    g2 = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(ws, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two tokens",), ("a b c",)], "text string"
    )
    got = [r["n"] for r in df.select(F.size(g2).alias("n")).collect()]
    assert got == [0, 0, 0, 1, 2]


def test_gopher_violation_flags_every_rule_both_branches(spark):
    """Each Gopher rule must trip on its crafted violator and stay
    silent on the clean doc — the fixture corpus never exercises the
    wordlen/symbol/alpha violations, so this pins their nonzero
    branches."""
    from dataflowjavasdk_spark.queries.text import gopher_violation_flags

    clean = " ".join(["the", "a", "is"] + ["word"] * 60)  # 63 tokens, len 4ish
    too_short = " ".join(["the", "is"] + ["word"] * 10)  # 12 tokens, mean len ok
    long_words = " ".join(["the", "a"] + ["x" * 40] * 60)
    symbols = " ".join(["the", "a", "is"] + ["#tag"] * 30 + ["word"] * 30)
    numeric = " ".join(["the", "a", "is"] + ["12345"] * 60)
    no_stop = " ".join(["word"] * 60)
    rows = [
        (1, clean), (2, too_short), (3, long_words),
        (4, symbols), (5, numeric), (6, no_stop),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_violation_flags(df).collect()}

    def flags(i):
        r = got[i]
        return (r["v_wordcount"], r["v_wordlen"], r["v_symbol"],
                r["v_alpha"], r["v_stopword"])

    assert flags(1) == (0, 0, 0, 0, 0)
    assert flags(2) == (1, 0, 0, 0, 0)          # word count < 50
    assert flags(3)[1] == 1                     # mean word length > 10
    assert flags(4)[2] == 1 and flags(4)[0] == 0  # symbol ratio > 10%
    assert flags(5)[3] == 1                     # < 80% alphabetic tokens
    assert flags(6)[4] == 1                     # < 2 canonical stopwords
