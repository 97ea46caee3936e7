"""Similarity search over an embedding column (array<float>, dim 64).

Two tiers, as a 100 TB pipeline needs both:

* **Brute-force cosine top-k** — the exactness baseline.  Query set x full
  corpus; the query side is small and broadcast, so the plan is a broadcast
  nested-loop with the per-pair dot product computed by codegen'd
  higher-order functions (``zip_with`` + ``aggregate`` sequential fold —
  the same left-to-right order DuckDB's list functions use, keeping the
  oracle comparison on rounded values stable).

* **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (seeded, generated once in Python and inlined as literals into BOTH the
  Spark plan and the DuckDB oracle SQL) put near vectors into the same
  bucket; candidate generation is then a bucket-join exactly like the
  MinHash dedup path — no cross join anywhere.  An IVF variant would swap
  the hyperplane bucketer for k-means centroids; same physical shape.
"""

from __future__ import annotations

import random
from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

EMB_DIM = 64
N_PLANES = 8
PLANE_SEED = 7

# Deterministic hyperplanes, shared verbatim by Spark and the SQL oracle.
_rng = random.Random(PLANE_SEED)
PLANES: list[list[int]] = [
    [(1 if _rng.random() < 0.5 else -1) for _ in range(EMB_DIM)] for _ in range(N_PLANES)
]


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def cosine_topk(
    embeddings: "DataFrame",
    k: int = 5,
    query_mod: int = 97,
) -> "DataFrame":
    """Exact top-k cosine neighbors for the deterministic query subset
    ``vec_id % query_mod == 0`` (self excluded).

    Output: (query_id, neighbor_id, cos_sim rounded, rank).  Rank ties break
    on neighbor_id so results are unique and oracle-comparable.
    """
    base = embeddings.select("vec_id", "embedding")
    queries = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        F.broadcast(queries)
        .crossJoin(base)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.expr(
                    f"{_dot_expr('q_emb', 'embedding')} / "
                    f"({_norm_expr('q_emb')} * {_norm_expr('embedding')})"
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _planes_sql_array(fmt_row) -> str:
    return ", ".join(fmt_row(p) for p in PLANES)


def lsh_signature_expr(emb: str) -> str:
    """Spark SQL: sign-bit signature of ``emb`` against PLANES (bit j set if
    dot(plane_j, emb) > 0)."""
    terms = []
    for j, plane in enumerate(PLANES):
        arr = "array(" + ", ".join(f"{v}D" for v in plane) + ")"
        terms.append(
            f"IF({_dot_expr(arr, emb)} > 0D, shiftleft(CAST(1 AS BIGINT), {j}), CAST(0 AS BIGINT))"
        )
    return " + ".join(terms)


def lsh_buckets(embeddings: "DataFrame") -> "DataFrame":
    """(vec_id, bucket) — the ANN partitioning primitive."""
    return embeddings.select(
        "vec_id", F.expr(lsh_signature_expr("embedding")).alias("bucket")
    )


def lsh_bucket_stats(embeddings: "DataFrame") -> "DataFrame":
    """Bucket occupancy — the skew diagnostic for the ANN index."""
    return (
        lsh_buckets(embeddings)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


def ann_topk_in_bucket(embeddings: "DataFrame", k: int = 5, query_mod: int = 97) -> "DataFrame":
    """ANN: neighbors restricted to the query's LSH bucket (bucket-join),
    then exact cosine within the bucket.  Recall < 1 by design; the scale
    win is that the join key is the bucket, not a cross join."""
    with_b = lsh_buckets(embeddings).join(embeddings, "vec_id")
    queries = with_b.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("embedding").alias("q_emb"),
    )
    cands = queries.join(with_b, "bucket").filter(F.col("vec_id") != F.col("query_id"))
    pairs = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(
                f"{_dot_expr('q_emb', 'embedding')} / "
                f"({_norm_expr('q_emb')} * {_norm_expr('embedding')})"
            ),
            4,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup(embeddings: "DataFrame", threshold: float = 0.98) -> "DataFrame":
    """Embedding-cosine near-duplicate pairs within LSH buckets (a < b)."""
    with_b = lsh_buckets(embeddings).join(embeddings, "vec_id")
    a = with_b.select(F.col("bucket"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = with_b.select(F.col("bucket"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                F.expr(
                    f"{_dot_expr('emb_a', 'emb_b')} / "
                    f"({_norm_expr('emb_a')} * {_norm_expr('emb_b')})"
                ),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
