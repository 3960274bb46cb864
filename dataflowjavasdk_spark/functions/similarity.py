"""Similarity & dedup primitives: shingles, MinHash, SimHash, cosine.

Scale design (the whole point of these at 100 TB):
- MinHash/LSH: signature computation is a per-row expression (no shuffle);
  banding turns O(n²) near-dup into an equi-join on band keys — Spark
  shuffles once on band hash, AQE splits skewed buckets.
- Cosine: per-row left-fold expressions (bit-identical to DuckDB's
  list_reduce, verified); brute-force top-k is a broadcast cross join of
  the (small) query set against the corpus — no shuffle of the corpus.
- SimHash: vectorized Pandas UDF (numpy bit ops over Arrow batches) —
  the documented Python-unavoidable path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataflowjavasdk_spark.functions.text import md5_long, tokens


def shingles(col: str | Column, n: int = 3) -> Column:
    """Token n-gram shingles (distinct). Expression-only: transform over a
    token-index sequence, join with spaces."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def kgrams_with_dups(toks: Column, n: int = 4) -> Column:
    """Positional token n-grams over an already-tokenized column,
    duplicates KEPT (winnowing consumes every occurrence with its
    position; `shingles` dedups because set similarity wants sets).
    Expression-only, row-local."""
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: sig[j] = min over shingles of h_j(s), with
    h_j(s) = md5_long(j || ':' || s). Pure expressions; cross-engine exact
    (DuckDB twin uses the same md5 construction). Empty shingle sets get
    sentinel max."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    max_long = F.lit(2**60).cast("long")
    return F.transform(
        seeds,
        lambda j: F.aggregate(
            shingles_col,
            max_long,
            lambda acc, s: F.least(
                acc, md5_long(F.concat(j.cast("string"), F.lit(":"), s))
            ),
        ),
    )


def band_keys(signature_col: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each signature slice to a band bucket key. Docs
    sharing any band key are near-dup candidates. Returns
    array<struct<band:int, bucket:bigint>> for explode + equi-join."""
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return F.transform(
        band_idx,
        lambda b: F.struct(
            b.cast("int").alias("band"),
            md5_long(
                F.concat(
                    b.cast("string"),
                    F.lit("|"),
                    F.array_join(
                        F.transform(
                            F.slice(signature_col, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    ),
                )
            ).alias("bucket"),
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays: |∩| / |∪| as a
    single IEEE division of exact ints."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / F.greatest(union, F.lit(1.0))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double — bit-identical to DuckDB's
    sequential list_reduce (verified this session)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def l2sq(a: Column, b: Column) -> Column:
    """Left-fold squared L2 distance in double — the same sequential fold
    shape as `dot`, so DuckDB's list_reduce reproduces it bit for bit."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def simhash64_udf():
    """Vectorized 64-bit SimHash over pre-tokenized arrays.

    For each doc: per-token 64-bit hash — the first 16 hex chars of
    md5(token), the same cross-engine-reproducible construction as
    md5_long/minhash (DuckDB twin: ('0x' || substr(md5(t),1,16))::UBIGINT)
    — then bit b of the result = majority vote of token-hash bits.
    Returns a pandas_udf for array<string> → long. The md5 hash family
    (rather than blake2b) makes the fingerprint SQL-oracleable: the
    simhash queries recompute it exactly in DuckDB."""
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    @_pandas_udf("long")
    def simhash64(token_arrays: pd.Series) -> pd.Series:
        import hashlib

        def one(toks) -> int:
            if toks is None or len(toks) == 0:
                return 0
            counts = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for t in toks:
                h = np.uint64(
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                )
                bits = (h >> shifts) & np.uint64(1)
                counts += np.where(bits == 1, 1, -1)
            out = 0
            for b in range(64):
                if counts[b] > 0:
                    out |= 1 << b
            # fold to signed 64-bit for Spark LongType
            return out - (1 << 64) if out >= (1 << 63) else out

        return token_arrays.map(one)

    return simhash64


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64-bit simhashes."""
    return F.bit_count(a.bitwiseXOR(b))


def random_hyperplane_bucket(vec: Column, planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection LSH bucket id ∈ [0, 2^planes). Plane p's
    component d is a deterministic pseudo-random value in [-1, 1)
    derived from md5(p, d) — no stored model, reproducible everywhere.
    Cosine-similar vectors land in the same bucket with high probability."""
    plane_component = lambda p, d: (
        F.pmod(md5_long(F.concat(F.lit("plane:"), p.cast("string"), F.lit(":"), d.cast("string"))), F.lit(2001)).cast("double")
        - F.lit(1000.0)
    ) / F.lit(1000.0)
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    plane_dot = lambda p: F.aggregate(
        F.zip_with(
            vec,
            F.transform(dims, lambda d: plane_component(p, d)),
            lambda x, w: x.cast("double") * w,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    planes_seq = F.sequence(F.lit(0), F.lit(planes - 1))
    bits = F.transform(
        planes_seq,
        lambda p: F.when(plane_dot(p) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    # binary fold: bucket = Σ bit_p · 2^p expressed as acc*2 + bit
    return F.aggregate(bits, F.lit(0), lambda acc, b: acc * 2 + b)
