"""End-to-end training-corpus materialization: the composed LLM-data
pipeline the individual operators exist for.

    documents
      -> Gopher-rule quality filter          (text_analysis.gopher_quality)
      -> Gopher repetition filter            (text_analysis.repetition_stats)
      -> exact dedup, keep digest-canonical  (dedup.dedup_exact)
      -> near-dup clusters, keep canonical   (dedup.dedup_clusters)
      -> (doc_id, digest, n_tokens)

Order matters and is part of the contract: filtering first shrinks every
downstream shuffle (the 100 TB rule — drop rows before they cost; both
quality gates are narrow zero-shuffle passes), exact dedup next removes
byte-identical copies cheaply (16-byte digest shuffle), and the expensive
LSH/cluster pass runs only over the survivors.  Each stage is the
already-verified operator; this module only composes them, and the driver
twin composes the same SQL fragments over the same filtered subsets.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from manga_translator_spark.functions.texthash import tokens_spark
from manga_translator_spark.operators.dedup import dedup_clusters, dedup_exact
from manga_translator_spark.operators.text_analysis import (
    gopher_quality,
    repetition_stats,
)

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def training_corpus(docs: "DataFrame") -> "DataFrame":
    """(doc_id, digest, n_tokens) for every document surviving the full
    quality -> exact-dedup -> near-dup-cluster pipeline."""
    kept = docs.join(
        gopher_quality(docs).filter(F.col("keep") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    ).join(
        repetition_stats(docs).filter(F.col("rep_keep") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    exact_canonical = dedup_exact(kept).select(F.col("canonical_id").alias("doc_id"))
    kept2 = kept.join(exact_canonical, "doc_id", "left_semi")
    clusters = dedup_clusters(kept2)
    canonical = clusters.filter(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    return (
        kept2.join(canonical, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.md5(F.col("text")).alias("digest"),
            F.size(F.expr(tokens_spark("text"))).alias("n_tokens"),
        )
    )
