"""Deterministic sf1 testdata synthesis: 10 key-shifted replicas of
the driver's sf0.1 tables.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, seed=42) and the round-5
mandate is to prove the whole contract one decade up. No external data
is allowed, so sf1 is synthesized FROM sf0.1 by the shifted-replica
construction — the honest way to scale a fixed corpus:

* every table becomes 10 copies (k = 0..9), copy 0 byte-identical to
  sf0.1, so sf1 is a strict superset of the proven scale;
* all dense 0-based keys are strided by copy (``key + k * stride``)
  with foreign keys strided consistently, so per-key workloads (events
  per user, lineitems per order) keep the sf0.1 distribution and total
  work grows LINEARLY — the same growth a real 10x corpus shows;
* ``documents.text`` is token-perturbed for k>0 (each token kept or
  replaced with a copy-unique word by an md5 coin, p=0.5), so
  cross-copy Jaccard ~ 0.15 stays far below every dedup threshold —
  verbatim replication would instead create a QUADRATIC cross-copy
  near-dup blowup no real corpus has;
* ``embeddings.embedding`` is cyclically rotated by 7k dims with
  md5-seeded sign flips for k>0 — norm-preserving, so within-copy
  geometry is exactly sf0.1's while cross-copy cosines are ~N(0, 1/64)
  noise, again linear growth for the similarity family;
* dimension tables (region, nation) are fixed — they do not scale;
* generated names keep the key bijection (Customer#<key>).

Everything is hashlib-deterministic: same output bytes on every run,
no RNG state, no wall clock. Copies stream into one ParquetWriter, so
peak memory is a single sf0.1 copy regardless of the copy count — the
r6 sf10 build (100 copies, 500k docs / 200k embeddings) uses the same
machinery with a table subset. Because the per-copy transform depends
only on (k, key), the sf10 tables are strict supersets of sf1's, which
are strict supersets of sf0.1's.

Run:  python tools/gen_testdata.py [out_dir] [n_copies] [tables...]
  (no tables → all fact tables; with tables → the listed tables are
  replicated and the REST pass through at sf0.1 scale, so only queries
  over the listed tables may be evidenced from that directory —
  .data/sf10 scales documents+embeddings for the pair-generating
  dedup/similarity families.)
"""
from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(os.path.dirname(__file__), "..", ".data", "sf1")
N_COPIES = 10

# key strides = sf0.1 table sizes (dense 0-based ids, verified)
STRIDES = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "o_custkey": 15_000,
    "l_orderkey": 150_000,
    "l_partkey": 20_000,
    "l_suppkey": 1_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}


def _coin(parts: tuple, mod: int) -> int:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big") % mod


def _shift_keys(tbl: pa.Table, k: int) -> pa.Table:
    cols = {}
    for name in tbl.column_names:
        col = tbl[name]
        if name in STRIDES and k > 0:
            arr = col.to_numpy(zero_copy_only=False) + k * STRIDES[name]
            cols[name] = pa.array(arr, type=col.type)
        else:
            cols[name] = col
    return pa.table(cols)


def _regen_names(tbl: pa.Table, key: str, name_col: str, fmt: str) -> pa.Table:
    keys = tbl[key].to_numpy(zero_copy_only=False)
    names = pa.array([fmt % x for x in keys], type=pa.string())
    return tbl.set_column(tbl.column_names.index(name_col), name_col, names)


def _perturb_text(tbl: pa.Table, k: int) -> pa.Table:
    """Token-level perturbation for copy k>0 (see module docstring)."""
    if k == 0:
        return tbl
    doc_ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    out = []
    for did, txt in zip(doc_ids, texts):
        toks = txt.split(" ")
        new = [
            t
            if _coin((k, did, i, "keep"), 2) == 0
            else "w%d%s" % (
                k,
                hashlib.md5(
                    ("%d|%d|%d" % (k, did, i)).encode()
                ).hexdigest()[:6],
            )
            for i, t in enumerate(toks)
        ]
        out.append(" ".join(new))
    tbl = tbl.set_column(
        tbl.column_names.index("text"), "text", pa.array(out, pa.string())
    )
    n_chars = pa.array([len(t) for t in out], pa.int64())
    return tbl.set_column(
        tbl.column_names.index("n_chars"), "n_chars", n_chars
    )


def _rotate_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    shift = (7 * k) % dim
    signs = np.array(
        [1.0 if _coin((k, d, "sign"), 2) == 0 else -1.0 for d in range(dim)],
        dtype=np.float32,
    )
    rot = np.roll(emb, shift, axis=1) * signs
    arr = pa.array(list(rot), type=pa.list_(pa.float32()))
    return tbl.set_column(
        tbl.column_names.index("embedding"), "embedding", arr
    )


FACT_TABLES = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)


def build(
    out_dir: str = DEFAULT_OUT,
    n_copies: int = N_COPIES,
    tables: tuple[str, ...] | None = None,
    passthrough_rest: bool = False,
) -> None:
    """Replicate ``tables`` (default: all fact tables) ``n_copies``
    times into ``out_dir``. Copies stream into one ParquetWriter so
    peak memory is one copy regardless of n_copies (the sf10 builds
    use n_copies=100). ``passthrough_rest`` copies the UNSCALED sf0.1
    file for every fact table not in ``tables`` — used by the selective
    sf10 build so the directory still satisfies the 10-table contract
    (the non-subset tables are explicitly NOT at sf10; only queries
    over the scaled tables may be evidenced from such a directory)."""
    tables = tuple(tables) if tables else FACT_TABLES
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(src, f"{out_dir}/{t}.parquet")
        print(f"{t}: {src.num_rows} (fixed dim)")
    for t in FACT_TABLES:
        src = pq.read_table(f"{SRC}/{t}.parquet")
        if t not in tables:
            if passthrough_rest:
                pq.write_table(src, f"{out_dir}/{t}.parquet")
                print(f"{t}: {src.num_rows} (passthrough, NOT scaled)")
            continue
        writer = None
        n_out = 0
        for k in range(n_copies):
            c = _shift_keys(src, k)
            if t == "customer":
                c = _regen_names(c, "c_custkey", "c_name", "Customer#%09d")
            elif t == "supplier":
                c = _regen_names(c, "s_suppkey", "s_name", "Supplier#%09d")
            elif t == "documents":
                c = _perturb_text(c, k)
            elif t == "embeddings":
                c = _rotate_embeddings(c, k)
            if writer is None:
                writer = pq.ParquetWriter(f"{out_dir}/{t}.parquet", c.schema)
            writer.write_table(c)
            n_out += c.num_rows
        writer.close()
        print(f"{t}: {src.num_rows} -> {n_out}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_COPIES
    tbls = tuple(sys.argv[3:]) or None
    build(out, n, tbls, passthrough_rest=tbls is not None)
