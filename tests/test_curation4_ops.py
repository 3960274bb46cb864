"""Round-6 curation operators (queries/curation4.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflowjavasdk_spark.queries import curation4 as C4


def test_dsir_ranks_target_like_docs_first(spark, monkeypatch):
    """A raw doc written in the target domain's vocabulary must outscore
    raw docs written in an off-domain vocabulary (score is summed
    per-gram target/raw count ratio)."""
    rows = []
    # target corpus (src0): "alpha beta gamma" vocabulary
    for i in range(10):
        rows.append((i, "src0", "alpha beta gamma alpha beta"))
    # off-domain bulk (src9): "delta epsilon zeta" vocabulary
    for i in range(10, 40):
        rows.append((i, "src9", "delta epsilon zeta delta epsilon"))
    # the probe: an src9 doc that LOOKS like the target domain
    rows.append((99, "src9", "alpha beta gamma alpha beta"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    monkeypatch.setattr(
        C4, "load_table", lambda _spark, _sf, _name: df
    )
    out = C4.dsir_importance_select(spark, "unused").collect()
    by_rank = sorted(out, key=lambda r: r["rk"])
    # every target-vocab doc (the 10 src0 docs + probe 99) precedes every
    # off-domain doc
    target_like = {99, *range(10)}
    n_target = len(target_like)
    head_ids = {r["doc_id"] for r in by_rank[:n_target]}
    assert head_ids == target_like
    probe = next(r for r in out if r["doc_id"] == 99)
    worst_off_domain = max(
        r["score"] for r in out if r["doc_id"] not in target_like
    )
    assert probe["score"] > worst_off_domain


def test_zorder_shards_are_tiles(spark):
    """Aligned z-range shards must be exact 256x256 tiles: per shard,
    BOTH dimension spans <= 255 and the tile origin is shard-derived."""
    from dataflowjavasdk_spark.queries.curation4 import zorder_clustered_shards
    from tests.conftest import SMOKE_SF

    rows = zorder_clustered_shards(spark, SMOKE_SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["shard"] < 16
        assert r["max_x"] - r["min_x"] <= 255
        assert r["max_y"] - r["min_y"] <= 255
        # tile origin: shard bits de-interleave to (x_hi, y_hi) quadrant
        s = r["shard"]
        x_hi = ((s >> 0) & 1) | (((s >> 2) & 1) << 1)
        y_hi = ((s >> 1) & 1) | (((s >> 3) & 1) << 1)
        assert x_hi * 256 <= r["min_x"] and r["max_x"] < (x_hi + 1) * 256
        assert y_hi * 256 <= r["min_y"] and r["max_y"] < (y_hi + 1) * 256


def test_isqrt_sql_exact_above_2_52(spark):
    """ADVICE r7: floor(sqrt(double)) alone misrounds k*k-1 -> k above
    ~2^52; the correction steps in _isqrt_sql must pin the exact isqrt
    in BOTH engines over adversarial boundary inputs."""
    import math

    import duckdb

    cases = []
    for k in (3_037_000_499, 2**31 + 12345, 10**9 + 7, 94_906_266):
        cases += [k * k - 1, k * k, k * k + 1]
    cases += [0, 1, 2, 3, 4, 2**52 - 1, 2**52, 2**62, 2**63 - 1]
    expected = [math.isqrt(x) for x in cases]

    sdf = spark.createDataFrame([(x,) for x in cases], "x long").select(
        "x", F.expr(C4._isqrt_sql("x", "DIV")).alias("w")
    )
    got_spark = {r["x"]: r["w"] for r in sdf.collect()}
    assert [got_spark[x] for x in cases] == expected

    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {C4._isqrt_sql('x', '//')} FROM (SELECT CAST(? AS BIGINT) AS x)",
            [x],
        ).fetchone()[0]
        for x in cases
    ]
    assert got_duck == expected
    # and the naive floor(sqrt()) really IS wrong somewhere in the set,
    # proving the correction is load-bearing
    naive = [math.floor(math.sqrt(x)) for x in cases]
    assert naive != expected
