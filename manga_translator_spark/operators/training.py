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

from typing import TYPE_CHECKING, Mapping

from pyspark.sql import functions as F

from manga_translator_spark.operators.common import spread
from manga_translator_spark.operators.curation import (
    DECONTAM_W,
    decontaminate,
    sample_stratified,
)
from manga_translator_spark.operators.dedup import dedup_clusters, dedup_exact
from manga_translator_spark.operators.text_analysis import (
    c4_keep_condition,
    gopher_keep_condition,
    quality_repetition_signals,
)

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def training_corpus(docs: "DataFrame") -> "DataFrame":
    """(doc_id, digest, n_tokens) for every document surviving the full
    quality -> exact-dedup -> near-dup-cluster pipeline.

    The two quality gates AND the output ``n_tokens`` all come from ONE
    fused tokenization pass (``quality_repetition_signals``, VERDICT r03
    #3) — the r3 composition ran the interpreted tokenizer fold three
    times (gopher gate, repetition gate, final projection); now it runs
    once and ``n_tokens`` rides the keep join.  The near-dup stage still
    re-shingles its (already twice-filtered) survivors — shingles are a
    different derivation than tokens and only exist for the smallest
    surviving subset, which is the right order at 100 TB."""
    # checkpoint the (doc_id, n_tokens) keep list — NOT the kept corpus:
    # `kept` feeds three consumers (exact-dedup agg, the cluster pass, the
    # final projection), and without the checkpoint each consumer re-runs
    # the interpreted gate fold over every document.  The id list is tiny
    # (16 bytes/doc); re-joining it against the pruned docs scan is cheap,
    # and the expensive fold runs exactly once.  A 100 TB deployment
    # materializes this boundary to a table between stages — localCheckpoint
    # is the single-job analogue (the IVF `ranked` discipline).
    keep = (
        quality_repetition_signals(docs)
        .filter((F.col("gq_keep") == 1) & (F.col("rep_keep") == 1))
        .select("doc_id", "n_tokens")
        .localCheckpoint(eager=False)
    )
    kept = docs.join(keep, "doc_id")
    exact_canonical = dedup_exact(kept).select(F.col("canonical_id").alias("doc_id"))
    # checkpoint the exact-dedup survivors: THREE consumers re-run the
    # docs-join-keep-join-canonical chain otherwise (the LSH pair pass
    # inside dedup_clusters, its final doc mapping, and the output
    # projection) — the survivors table is the stage boundary a 100 TB
    # run materializes between exact and near-dup dedup (r6; ~1.2 s per
    # avoided recompute at sf1)
    kept2 = kept.join(exact_canonical, "doc_id", "left_semi").localCheckpoint(
        eager=False
    )
    clusters = dedup_clusters(kept2)
    canonical = clusters.filter(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
    return (
        kept2.join(canonical, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.md5(F.col("text")).alias("digest"),
            "n_tokens",
        )
    )


def curate_corpus(
    docs: "DataFrame",
    bench: "DataFrame",
    rates: Mapping[str, int],
    *,
    blocklist: tuple[str, ...] = (),
    w: int = DECONTAM_W,
    default_ppt: int = 0,
    text_col: str = "text",
    stratum_col: str = "lang",
) -> "DataFrame":
    """The full modern web-corpus curation recipe as ONE audit table —
    the C4/FineWeb pipeline order, each stage an already-verified
    operator:

        C4 heuristic rules -> Gopher statistical gate      (narrow, fused)
        -> exact dedup, keep digest-canonical              (16-byte shuffle)
        -> benchmark decontamination (any shared w-gram)   (survivors only)
        -> stratified hash sampling                        (map-side)

    Output: one row per input doc — ``doc_id``, ``c4_keep``,
    ``gopher_keep`` (0/1 over every doc), ``canonical`` (0/1 over docs
    passing both gates, NULL otherwise), ``contaminated`` (0/1 over
    canonical docs, NULL otherwise — GPT-3's any-hit rule), ``sampled``
    (0/1 over clean canonical docs, NULL otherwise), ``keep`` =
    ``coalesce(sampled, 0)``.  Later-stage flags are NULL exactly where
    the stage never ran, so the table doubles as the per-stage funnel a
    curation run reports.

    Order is the contract (the training_corpus rule): both rule gates are
    narrow zero-shuffle passes evaluated in ONE projection over one scan,
    dedup's digest shuffle runs over gate survivors, and the gram-explode
    decontamination runs only over canonical survivors.  The (doc_id,
    flag, flag) gate table is checkpointed — 12 bytes/doc, the table
    boundary a 100 TB deployment materializes between stages — so the
    interpreted token folds run exactly once, not once per consumer.
    """
    flags = (
        spread(docs)
        .select(
            "doc_id",
            c4_keep_condition(text_col, blocklist).cast("int").alias("c4_keep"),
            # NULL text makes the gopher condition NULL (it can never pass:
            # zero tokens < min words); pin it to 0 so the audit flag is
            # total and the DuckDB twin's CASE agrees
            F.coalesce(
                gopher_keep_condition(text_col).cast("int"), F.lit(0)
            ).alias("gopher_keep"),
        )
        .localCheckpoint(eager=False)
    )
    keep_ids = flags.filter("c4_keep = 1 AND gopher_keep = 1").select("doc_id")
    kept = docs.join(keep_ids, "doc_id")
    digests = kept.select("doc_id", F.md5(F.col(text_col)).alias("digest"))
    canon = (
        digests.join(
            digests.groupBy("digest").agg(F.min("doc_id").alias("canonical_id")),
            "digest",
        )
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("canonical_id")).cast("int").alias("canonical"),
        )
    )
    canon_docs = kept.join(canon.filter("canonical = 1"), "doc_id", "left_semi")
    cont = decontaminate(canon_docs, bench, w=w, text_col=text_col).select(
        "doc_id", F.lit(1).alias("hit")
    )
    clean = canon_docs.join(cont, "doc_id", "left_anti")
    samp = sample_stratified(
        clean,
        rates,
        default_ppt=default_ppt,
        stratum_col=stratum_col,
    ).select("doc_id", F.lit(1).alias("s_hit"))
    return (
        flags.join(canon, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(samp, "doc_id", "left")
        .select(
            "doc_id",
            "c4_keep",
            "gopher_keep",
            "canonical",
            F.expr(
                "CAST(CASE WHEN canonical = 1 THEN coalesce(hit, 0) END AS INT)"
            ).alias("contaminated"),
            F.expr(
                "CAST(CASE WHEN canonical = 1 AND coalesce(hit, 0) = 0"
                " THEN coalesce(s_hit, 0) END AS INT)"
            ).alias("sampled"),
        )
        .withColumn("keep", F.expr("coalesce(sampled, 0)"))
    )
