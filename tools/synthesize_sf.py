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
  conservative direction for term-keyed plans.)
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
    out = np.roll(emb, r, axis=1).copy()
    if r:
        out[:, :r] = -out[:, :r]
    return out


def replicate(src: str, dest: str, mult: int) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in CONSTANT_TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dest, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} rows (constant dimension)")

    for t in SCALED_TABLES:
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        parts = []
        for r in range(mult):
            rep = _offset_keys(base, r)
            if t == "documents" and r:
                texts = _suffix_tokens(base.column("text").to_pylist(), r)
                i = rep.column_names.index("text")
                rep = rep.set_column(i, "text", pa.array(texts, pa.string()))
            if t == "embeddings" and r:
                emb = np.asarray(base.column("embedding").to_pylist(), dtype=np.float32)
                perm = _signed_permute(emb, r)
                i = rep.column_names.index("embedding")
                rep = rep.set_column(
                    i,
                    "embedding",
                    pa.array(list(perm), pa.list_(pa.float32())),
                )
            parts.append(rep)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dest, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/tmp/sf1")
    args = ap.parse_args()
    replicate(args.src, args.dest, args.mult)


if __name__ == "__main__":
    main()
