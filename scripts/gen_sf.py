"""Scale-up testdata generator: synthesize an sf{10x} dir by key-shifted
replication of an existing driver-generated sf dir (VERDICT r4 ask #2 —
validate the contract beyond sf0.1 without touching /root/testdata).

Usage: python scripts/gen_sf.py SRC_DIR OUT_DIR [FACTOR=10]

Semantics, chosen so every contract query stays meaningful at the bigger
scale rather than merely bigger:

* dimension tables (region, nation) copy through unchanged;
* every fact/keyed table is replicated FACTOR times with each key column
  offset by ``replica * stride``, where stride is the next power of ten
  above the source's max key — replicas are disjoint key ranges and all
  foreign keys stay referentially consistent (an order's lineitems move
  with it, a customer's orders move with it);
* non-key payloads (text, prices, dates, JSON props) replicate verbatim:
  duplicate document text across replicas is the web-realistic shape
  (re-hosted content) and exercises the dedup family's scale behavior
  honestly;
* embeddings get a small deterministic per-replica perturbation
  (seeded normal noise, sigma 0.02) so the ANN family sees near-dup
  structure across replicas instead of degenerate exact ties.

The output is a synthetic derivative for local stress runs — both the
Spark queries and the DuckDB oracle read the SAME generated parquet, so
the correctness gate's comparison semantics are unchanged.
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns per table -> offset by replica * stride(source max)
KEYED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
DIMS = ["region", "nation"]
# key -> the table whose own max defines the stride (FKs share the PK's
# stride so references stay aligned)
STRIDE_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
}

EMB_NOISE_SIGMA = 0.02
EMB_NOISE_SEED = 4242


def _stride(max_val: int) -> int:
    s = 10
    while s <= max_val:
        s *= 10
    return s


def generate(src: str, out: str, factor: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for key, (tbl, col) in STRIDE_OWNER.items():
        mx = con.sql(
            f"SELECT max({col}) FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()[0]
        strides[key] = _stride(int(mx))

    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t, keys in KEYED.items():
        cols = [
            d[0]
            for d in con.sql(
                f"SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0"
            ).description
        ]
        sel = ", ".join(
            f"({c} + r.i * {strides[c]})::BIGINT AS {c}" if c in keys else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({factor}) r(i) ORDER BY r.i) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    _embeddings(src, out, factor)


def _embeddings(src: str, out: str, factor: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = tbl["vec_id"].to_numpy()
    emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
    label = tbl["label"].to_numpy()
    stride = _stride(int(vec_id.max()))
    ids, vecs, labels = [], [], []
    for i in range(factor):
        ids.append(vec_id + i * stride)
        if i == 0:
            vecs.append(emb)
        else:
            rng = np.random.default_rng(EMB_NOISE_SEED + i)
            vecs.append(
                emb + rng.normal(0.0, EMB_NOISE_SIGMA, emb.shape).astype(np.float32)
            )
        labels.append(label)
    out_tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.concatenate(vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(labels), type=pa.int32()),
        }
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, factor)
    print(f"wrote {out} (factor {factor} of {src})")
