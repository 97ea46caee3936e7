"""Classify stage: block features -> (cls, score), pure column expressions.

The analogue of the detector's class+confidence decision (reference
detection/yolo.py:23-28; classes core/constants.py:6-8).  Runs entirely in
whole-stage-codegen'd higher-order array functions — zero Python, zero
shuffle.  The decision rule is the *expression twin* of
``functions.blocks.classify_block`` / ``score_block``: integer-only
comparisons and identical float64 operation order, so the Spark result is
bit-identical to the oracle's (SURVEY.md §7 determinism rules).

Keep the two in sync — tests/test_pipeline.py asserts equality over the
whole synthetic corpus.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import (
    LINK_DENSITY_DEN,
    MIN_MAIN_CHARS,
)

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# CASE order mirrors classify_block(): img > hint > short > link-dense > MAIN.
_CLASSIFY_EXPR = f"""
transform(blocks, b -> named_struct(
  'block_idx', b.block_idx, 'tag', b.tag, 'depth', b.depth, 'text', b.text,
  'n_chars', b.n_chars, 'n_links', b.n_links, 'n_link_chars', b.n_link_chars,
  'hint', b.hint, 'img_payload', b.img_payload,
  'cls', CASE
           WHEN b.img_payload IS NOT NULL THEN 2
           WHEN b.hint THEN 1
           WHEN b.n_chars < {MIN_MAIN_CHARS} THEN 1
           WHEN {LINK_DENSITY_DEN} * b.n_link_chars >= b.n_chars THEN 1
           ELSE 0
         END,
  'score', CASE
             WHEN b.img_payload IS NOT NULL THEN CAST(0.0 AS DOUBLE)
             WHEN b.hint THEN (CAST(b.n_chars - b.n_link_chars AS DOUBLE)
                               / (CAST(b.n_chars AS DOUBLE) + 1.0D)) * 0.5D
             ELSE CAST(b.n_chars - b.n_link_chars AS DOUBLE)
                  / (CAST(b.n_chars AS DOUBLE) + 1.0D)
           END))
"""


def classify_blocks(detected: "DataFrame") -> "DataFrame":
    """Replace ``blocks`` with the classified struct array."""
    return detected.withColumn("blocks", F.expr(_CLASSIFY_EXPR))
