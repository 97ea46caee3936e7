"""Shared physical helpers for operators."""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# Shuffle-introducing logical nodes: a frame containing one already has its
# parallelism set by spark.sql.shuffle.partitions, so spread() must not add
# a redundant exchange on top.  Matched as the FIRST token of a plan line
# (after the tree art and the unresolved-plan apostrophe), never as a raw
# substring — a column/view named 'WindowEvents' or a path containing
# 'Join' must not silently disable the repartition (ADVICE r4 #4).
_SHUFFLE_NODE_RE = re.compile(
    r"^[\s:+|-]*'?"
    r"(?:Join|Aggregate|Repartition(?:ByExpression)?|Window|Deduplicate)\b",
    re.MULTILINE,
)


def spread(df: "DataFrame", min_factor: int = 1) -> "DataFrame":
    """Repartition a small-file scan up to the cluster's parallelism.

    Heavy per-row compute (minhash, simhash, language-ID) over a table that
    arrives as one or two parquet files otherwise runs on one core — the
    classic small-input/expensive-map shape.  At 100 TB inputs are already
    wide and this is a no-op; the check costs one catalog file listing.
    The round-robin shuffle moves only the small input once, and is repaid
    ~parallelism-fold by the map stage.

    The probe is ``inputFiles()`` (logical-plan file listing), NOT
    ``df.rdd.getNumPartitions()`` — the latter converts the physical plan
    to an RDD at *plan* time for every scoring operator (VERDICT r03 #5).
    Non-file-backed frames (in-memory test frames, checkpointed RDD-backed
    frames) report zero files and pass through untouched.  A wide
    multi-file scan (>= target files) also passes through; a few big
    splittable files under-count partitions and get a
    redundant-but-harmless round-robin — at corpus scale file counts
    dwarf the target, so this is the small-input case by construction.

    ``inputFiles()`` sees THROUGH wide operators to the leaf scan (a
    joined/aggregated frame still reports the leaf parquet files — r4
    review), so a small file count alone would add a redundant exchange
    after every join.  The second, logical-plan guard handles that: any
    shuffle-introducing node (Join/Aggregate/Repartition/Window/
    Deduplicate) means the frame's parallelism is already set by
    ``spark.sql.shuffle.partitions`` and spread must not touch it.  The
    logical plan is already built at this point — the node-name match
    (first token per plan line, not a raw substring) costs no analysis
    work and is immune to identifiers that merely contain a node name.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    try:
        n_files = len(df.inputFiles())
    except Exception:  # pragma: no cover - defensive: unresolvable plans
        return df
    if not (0 < n_files < target):
        return df
    plan = df._jdf.queryExecution().logical().toString()
    if _SHUFFLE_NODE_RE.search(plan):
        return df
    return df.repartition(target)
