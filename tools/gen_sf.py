"""Deterministic sf1.0 test-table generator (r8).

/root/testdata is read-only and tops out at sf0.1, so the sf1.0
evidence corpus is derived here: every fact table is expanded K×10 by
key-shifted replication (the TPC-H convention — region/nation dims
stay fixed; every foreign key shifts consistently so joins hold),
documents get an INDEPENDENT text per copy (hash-seeded Fisher-Yates
word shuffle — same length/vocabulary/unigram stats as the source
row, different n-gram structure, so the 10 copies are not near-dups),
and embeddings get a k-step cyclic dimension roll (norm- and
distribution-preserving). Everything is seeded from (row key, copy)
— re-running reproduces byte-identical tables.

Usage: python tools/gen_sf.py [K] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /root/repo/testdata/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 — the deterministic seed/hash
    primitive (no RNG state, no platform drift)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _shuffle_words(text: str, seed: int) -> str:
    words = text.split(" ")
    n = len(words)
    if n < 2:
        return text
    idx = np.arange(n, dtype=np.uint64)
    keys = _splitmix(idx + np.uint64(seed) * np.uint64(0x1000003))
    order = np.argsort(keys, kind="stable")
    return " ".join(words[i] for i in order)


def _key_shift(tbl: pa.Table, col: str, k: int, span: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    arr = tbl.column(i).to_numpy(zero_copy_only=False) + k * span
    return tbl.set_column(i, col, pa.array(arr, type=tbl.schema.field(i).type))


def main() -> int:
    k_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/testdata/sf1.0"
    os.makedirs(out, exist_ok=True)

    def rd(name: str) -> pa.Table:
        return pq.read_table(f"{src}/{name}.parquet")

    def wr(name: str, tbl: pa.Table) -> None:
        pq.write_table(tbl, f"{out}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")

    # fixed dims — never scale (TPC-H convention)
    for dim in ("region", "nation"):
        wr(dim, rd(dim))

    def span_of(tbl: pa.Table, col: str) -> int:
        return int(
            tbl.column(col).to_numpy(zero_copy_only=False).max()
        ) + 1

    # key spans read from the SOURCE so every FK shifts identically
    cust, supp, part = rd("customer"), rd("supplier"), rd("part")
    orders, lineitem, events = rd("orders"), rd("lineitem"), rd("events")
    docs, emb = rd("documents"), rd("embeddings")
    CS, SS, PS = span_of(cust, "c_custkey"), span_of(supp, "s_suppkey"), span_of(part, "p_partkey")
    OS, ES = span_of(orders, "o_orderkey"), span_of(events, "event_id")
    US = span_of(events, "user_id")
    DS, VS = span_of(docs, "doc_id"), span_of(emb, "vec_id")

    def replicate(tbl: pa.Table, shifts: dict[str, int], per_copy=None) -> pa.Table:
        copies = []
        for k in range(k_copies):
            t = tbl
            for col, span in shifts.items():
                t = _key_shift(t, col, k, span)
            if per_copy is not None:
                t = per_copy(t, k)
            copies.append(t)
        return pa.concat_tables(copies)

    wr("customer", replicate(cust, {"c_custkey": CS}))
    wr("supplier", replicate(supp, {"s_suppkey": SS}))
    wr("part", replicate(part, {"p_partkey": PS}))
    wr("orders", replicate(orders, {"o_orderkey": OS, "o_custkey": CS}))
    wr(
        "lineitem",
        replicate(
            lineitem,
            {"l_orderkey": OS, "l_partkey": PS, "l_suppkey": SS},
        ),
    )
    wr("events", replicate(events, {"event_id": ES, "user_id": US}))

    def doc_copy(t: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return t
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        new = [_shuffle_words(tx, did * 16 + k) for did, tx in zip(ids, texts)]
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, "text", pa.array(new, type=pa.string()))
        ni = t.schema.get_field_index("n_chars")
        t = t.set_column(
            ni, "n_chars", pa.array([len(x) for x in new], type=pa.int64())
        )
        return t

    wr("documents", replicate(docs, {"doc_id": DS}, per_copy=doc_copy))

    def emb_copy(t: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return t
        vecs = t.column("embedding").to_pylist()
        rolled = [v[k % len(v):] + v[: k % len(v)] for v in vecs]
        ei = t.schema.get_field_index("embedding")
        return t.set_column(
            ei, "embedding", pa.array(rolled, type=pa.list_(pa.float32()))
        )

    wr("embeddings", replicate(emb, {"vec_id": VS}, per_copy=emb_copy))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
