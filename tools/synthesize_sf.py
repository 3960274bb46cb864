"""Synthesize a larger scale-factor fixture set from /root/testdata/sf0.1
(VERDICT r8 #1 — measure the 100x claim instead of arguing it).

The driver's fixtures are read-only and top out at sf0.1, so the sf1
set is built locally by replicating sf0.1 `mult` times with PERTURBED
keys so cardinalities scale HONESTLY:

- Join/group keys get per-replica offsets (custkey/orderkey/partkey/
  suppkey/user_id/doc_id/vec_id...), and every foreign key follows its
  primary consistently — so group COUNTS scale linearly while per-group
  sizes stay constant (the TPC-H scaling contract; nation/region stay
  fixed like the spec's constant dimensions).
- documents.text for replica r>0 suffixes EVERY token with "r{r}":
  within-replica duplicate/near-dup/shingle structure is isomorphic to
  the original, while cross-replica Jaccard is 0 — replication can't
  manufacture a superlinear near-dup pair explosion that would
  contaminate the slope measurement. (Vocabulary scales linearly —
  harsher than a real corpus's sublinear vocab growth, i.e. the
  conservative direction for term-keyed plans. The suffixes also
  inflate text BYTES ~1.33x beyond the row multiple at --mult 10 —
  avg base token 5.5 chars + 2-3 char suffix — so char-bound scan
  slopes read up to ~0.12 HIGH; a byte-linear query can brush the
  13.0x superlinear gate from inflation alone. Bias direction is
  conservative: it can only overstate, never hide, superlinearity.)
- embeddings for replica r>0 apply a SIGNED PERMUTATION (circular roll
  by r, sign-flip of the first r dims): orthogonal, so all
  within-replica cosines/norms are bit-preserved while cross-replica
  similarity is decorrelated — no artificial ANN near-dup inflation.
- events keep their timestamps (more users in the same time range —
  sessions per user unchanged, session count scales linearly).

Usage: python tools/synthesize_sf.py [--mult 10] [--src /root/testdata/sf0.1] [--dest /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key-column offsets per replica (well above each table's max base key)
OFFSETS = {
    "c_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 10_000_000,
    "vec_id": 1_000_000,
}

CONSTANT_TABLES = ("region", "nation")
SCALED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _offset_keys(tbl: pa.Table, r: int) -> pa.Table:
    for name, step in OFFSETS.items():
        if name in tbl.column_names:
            i = tbl.column_names.index(name)
            col = pc.add(tbl.column(name), pa.scalar(r * step, tbl.column(name).type))
            tbl = tbl.set_column(i, name, col)
    return tbl


def _suffix_tokens(texts: list[str | None], r: int) -> list[str | None]:
    suf = f"r{r}"
    return [
        None if t is None else " ".join(tok + suf for tok in t.split(" "))
        for t in texts
    ]


def _signed_permute(emb: np.ndarray, r: int) -> np.ndarray:
    """Orthogonal per-replica transform: circular roll by r mod dim plus a
    DETERMINISTIC md5-derived sign vector per replica. The earlier
    first-r-dims sign flip degenerated once r reached the embedding dim
    (review-caught: at --mult 100, replica 64 was the exact NEGATION of
    replica 0 and pairs (r, r+64) had matched cosines ~ -1, violating
    the decorrelation invariant; at mult >= 193 replicas repeated
    bit-for-bit). An md5 sign pattern per (replica, dim) keeps every
    transform orthogonal — within-replica norm/cosine VALUES are
    preserved up to fold-order ulp (sign flips are exact, but the
    circular roll reorders dimensions, so the engines' sequential
    left-fold dot/ssq sums accumulate in a different order and the last
    ulp can differ between replicas) — while making any two replicas'
    transforms differ in ~half the dims for ANY r, no wrap-around
    period."""
    import hashlib

    dim = emb.shape[1]
    out = np.roll(emb, r % dim, axis=1).copy()
    if r:
        digest = b""
        while len(digest) < dim:
            digest += hashlib.md5(f"sign:{r}:{len(digest)}".encode()).digest()
        signs = np.array(
            [1.0 if (digest[d] & 1) else -1.0 for d in range(dim)],
            dtype=np.float32,
        )
        out *= signs
    return out


def replicate(src: str, dest: str, mult: int) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in CONSTANT_TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dest, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} rows (constant dimension)")

    for t in SCALED_TABLES:
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        # hoist the Arrow->Python conversions out of the replica loop
        # (they were rebuilt mult-1 times) and stream replicas through
        # one ParquetWriter so peak memory is one replica, not the
        # whole output table
        base_texts = (
            base.column("text").to_pylist() if t == "documents" else None
        )
        base_emb = (
            np.asarray(base.column("embedding").to_pylist(), dtype=np.float32)
            if t == "embeddings"
            else None
        )
        emb_type = (
            base.schema.field("embedding").type if t == "embeddings" else None
        )
        writer = None
        total = 0
        for r in range(mult):
            rep = _offset_keys(base, r)
            if t == "documents" and r:
                texts = _suffix_tokens(base_texts, r)
                i = rep.column_names.index("text")
                rep = rep.set_column(i, "text", pa.array(texts, pa.string()))
                if "n_chars" in rep.column_names:
                    # keep the n_chars == len(text) fixture invariant on
                    # suffixed replicas (review-caught: the copied column
                    # understated the lengthened text by ~33%)
                    j = rep.column_names.index("n_chars")
                    rep = rep.set_column(
                        j,
                        "n_chars",
                        pa.array(
                            [None if s is None else len(s) for s in texts],
                            rep.column("n_chars").type,
                        ),
                    )
            if t == "embeddings" and r:
                perm = _signed_permute(base_emb, r)
                i = rep.column_names.index("embedding")
                # reuse the base column's exact list type so concat /
                # readers never depend on pyarrow's nested-field-name
                # unification
                rep = rep.set_column(
                    i, "embedding", pa.array(list(perm), emb_type)
                )
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(dest, f"{t}.parquet"), rep.schema
                )
            writer.write_table(rep)
            total += rep.num_rows
        if writer is not None:
            writer.close()
        print(f"{t}: {base.num_rows} -> {total} rows")

    import json as _json

    with open(os.path.join(dest, "manifest.json"), "w") as fh:
        _json.dump({"src": src, "mult": mult}, fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dest",
        default=None,
        help="defaults to /tmp/sf{mult/10:g} so --mult 100 cannot "
        "silently overwrite the sf1 fixture",
    )
    args = ap.parse_args()
    dest = args.dest or f"/tmp/sf{args.mult / 10:g}"
    print(f"writing to {dest} (mult={args.mult})")
    replicate(args.src, dest, args.mult)


if __name__ == "__main__":
    main()
