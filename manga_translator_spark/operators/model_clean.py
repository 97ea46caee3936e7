"""Model-based cleaner: batched inference over boilerplate *patches* only.

Transplant of the deep-inpainting cleaners (reference cleaning/lama.py:
145-168 and deepfillv2.py:39-167): they never run the model on whole
frames — they extract masked patches with padding (``extract_patches``
lama.py:77-116), batch same-shaped patches through the network
(``clean_patches`` :118-142), and paste results back by offset.  The
engine's analogue: only blocks the classifier flagged as boilerplate-but-
borderline (score in a gray zone) are sent to a "repair model" that
decides keep-vs-drop and can rewrite the text; everything else never
leaves the JVM.

Physical shape == operators/recognize.py: explode the patch rows, one
vectorized model call per Arrow batch, model as a per-worker singleton,
group back by key.  The model here is a deterministic heuristic STUB
(sandbox has no ONNX runtime — functions/recognize_kernel.py documents the
drop-in point); the batching/schema/join plumbing is the real design.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import CLS_BOILERPLATE

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# gray zone: boilerplate blocks whose text-density score is still highish —
# the patches worth a model's second opinion (patch selection analogue of
# inpaint_patches=True, lama.py:45)
GRAY_LO = 0.5

_OUT = "url string, block_idx int, keep boolean, text string"

_MODEL = None


def _model_call(texts: list[str], scores: list[float]) -> list[tuple[bool, str]]:
    """STUB model: keep gray-zone blocks that end in sentence punctuation
    and exceed 60 chars; trims trailing furniture separators.  Replace body
    with an onnxruntime session.run over tokenized batches for a real
    model (loaded once per worker — reference lama.py:51)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = True  # stand-in for session load
    out = []
    for t, s in zip(texts, scores):
        t2 = t.rstrip(" |·-•")
        out.append((len(t2) >= 60 and t2.endswith((".", "!", "?")), t2))
    return out


def repair_candidates(classified: "DataFrame") -> "DataFrame":
    """Explode only the gray-zone boilerplate patches (T9-style fan-out)."""
    return (
        classified.select("url", F.explode("blocks").alias("b"))
        .filter(
            (F.col("b.cls") == CLS_BOILERPLATE)
            & (F.col("b.score") >= GRAY_LO)
            & (F.length("b.text") > 0)
        )
        .select(
            "url",
            F.col("b.block_idx").alias("block_idx"),
            F.col("b.text").alias("text"),
            F.col("b.score").alias("score"),
        )
    )


def model_clean(classified: "DataFrame") -> "DataFrame":
    """(url, blocks...) -> (url, repaired: array<struct<block_idx, keep, text>>).

    Join the (small) verdict table back on url; pages without gray-zone
    patches simply don't appear — callers coalesce, exactly like the
    recognize stage.
    """
    cands = repair_candidates(classified)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            verdicts = _model_call(list(pdf["text"]), list(pdf["score"]))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "block_idx": pdf["block_idx"],
                    "keep": [k for k, _ in verdicts],
                    "text": [t for _, t in verdicts],
                }
            )

    verdicts = cands.mapInPandas(run, schema=_OUT)
    return (
        verdicts.groupBy("url")
        .agg(
            F.sort_array(F.collect_list(F.struct("block_idx", "keep", "text"))).alias(
                "repaired"
            )
        )
    )
