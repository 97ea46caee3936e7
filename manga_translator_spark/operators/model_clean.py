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
group back by key.  The model is a REAL fixed-weight numpy network
(functions/verdict_model.py: featurize -> one matmul + argmax per Arrow
batch over committed .npz weights, per-worker singleton like reference
cleaning/lama.py:51); a plain-predicate fallback covers the no-numpy
case.  An ONNX model drops in at PatchVerdictNet.infer.
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

# separator/chrome characters that furniture runs are made of
_FURNITURE_CHARS = frozenset(" |·•-–—»«><:/")


def usable_span(text: str) -> tuple[int, int]:
    """Largest usable interior span of a block's text — the 1-D transplant
    of the reference's largest-interior-rectangle (utils.py:354-379: given
    a mask, find the maximal axis-aligned rectangle of usable cells; here
    the mask is per-character 'is furniture', and the text being one line
    makes the maximal interior run exactly the span between the furniture
    margins).  Returns half-open (start, end); (0, 0) if all furniture.
    """
    n = len(text)
    start = 0
    while start < n and text[start] in _FURNITURE_CHARS:
        start += 1
    end = n
    while end > start and text[end - 1] in _FURNITURE_CHARS:
        end -= 1
    return start, end


def _model_call(texts: list[str], scores: list[float]) -> list[tuple[bool, str]]:
    """Patch extraction + batched verdict inference.

    Trim each patch to its usable interior span (the T11 patch-extraction
    step — reference extract_patches, lama.py:77-116), then run ONE
    matmul+argmax over the whole batch's feature tensor through the
    per-worker verdict network (functions/verdict_model.py — the
    clean_patches analogue, lama.py:118-142).  Falls back to the plain
    predicate if numpy is unavailable."""
    trimmed = []
    for t in texts:
        lo, hi = usable_span(t)
        trimmed.append(t[lo:hi])
    from manga_translator_spark.functions import verdict_model as vm

    if vm.np is None:  # pragma: no cover — numpy is baked into the sandbox
        keeps = [vm.rule_keep(t) for t in trimmed]
    else:
        keeps = vm.get_verdict_model().infer(trimmed).tolist()
    return list(zip(keeps, trimmed))


def repair_candidates(classified: "DataFrame", gray_lo: float = GRAY_LO) -> "DataFrame":
    """Explode only the gray-zone boilerplate patches (T9-style fan-out).

    ``gray_lo`` is the gray-zone floor — the per-corpus knob describe()
    advertises (wired through repair_model/model_clean; r4 review found
    it advertised but unreachable)."""
    return (
        classified.select("url", F.explode("blocks").alias("b"))
        .filter(
            (F.col("b.cls") == CLS_BOILERPLATE)
            & (F.col("b.score") >= gray_lo)
            & (F.length("b.text") > 0)
        )
        .select(
            "url",
            F.col("b.block_idx").alias("block_idx"),
            F.col("b.text").alias("text"),
            F.col("b.score").alias("score"),
        )
    )


def model_clean(classified: "DataFrame", gray_lo: float = GRAY_LO) -> "DataFrame":
    """(url, blocks...) -> (url, repaired: array<struct<block_idx, keep, text>>).

    Join the (small) verdict table back on url; pages without gray-zone
    patches simply don't appear — callers coalesce, exactly like the
    recognize stage.
    """
    cands = repair_candidates(classified, gray_lo)

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


def apply_repairs(classified: "DataFrame", verdicts: "DataFrame") -> "DataFrame":
    """Fold the model's verdicts back into the block array.

    A gray-zone block whose verdict is ``keep`` is promoted to MAIN with the
    model's (possibly trimmed) text; everything else is untouched.  This is
    the paste-back step of the patch cleaners (reference lama.py:160-168
    writes repaired patches back by offset; our offset is ``block_idx``).

    Pages without verdicts keep their blocks verbatim (left join + coalesce
    to an empty array — the pass-through contract).
    """
    joined = classified.join(verdicts, "url", "left").withColumn(
        "rep",
        F.expr(
            "coalesce(repaired, CAST(array() AS "
            "ARRAY<STRUCT<block_idx: INT, keep: BOOLEAN, text: STRING>>))"
        ),
    )
    # let-bind the per-block verdict lookup via the single-element transform
    # idiom (HOF lambdas are interpreted; see functions/texthash.py) so the
    # filter() runs once per block, not once per referenced field.
    patched = """transform(blocks, b -> element_at(transform(
        array(try_element_at(filter(rep, r -> r.block_idx = b.block_idx AND r.keep), 1)),
        rv -> CASE WHEN rv IS NULL THEN b ELSE named_struct(
          'block_idx', b.block_idx, 'tag', b.tag, 'depth', b.depth,
          'text', rv.text, 'n_chars', length(rv.text),
          'n_links', b.n_links, 'n_link_chars', b.n_link_chars,
          'hint', b.hint, 'img_payload', b.img_payload,
          'cls', 0, 'score', b.score) END), 1))"""
    return joined.withColumn("blocks", F.expr(patched)).drop("repaired", "rep")


def repair_model(classified: "DataFrame", gray_lo: float = GRAY_LO) -> "DataFrame":
    """Config-selectable repair plugin: verdicts + paste-back in one step."""
    return apply_repairs(classified, model_clean(classified, gray_lo))


def repair_none(classified: "DataFrame", **_) -> "DataFrame":
    return classified


# name -> strategy; the cleaner-registry analogue (reference cleaning/
# get.py:6-11 exposes LaMa/DeepFillV2 as named, config-selected plugins).
REPAIRERS = {
    "none": repair_none,
    "model": repair_model,
}
