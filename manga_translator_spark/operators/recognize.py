"""Recognize stage: batched text recognition over embedded-image blocks.

OCR-stage transplant (reference ocr/manga_ocr.py:19-67 batches crops through
one model call per batch; base contract core/plugin.py:151-165; empty-result
compaction image_to_image.py:130-137).  Physical shape:

  1. fan OUT only the embedded-image blocks (posexplode + filter) — the
     reference likewise runs inference on cropped patches, never whole
     frames (lama.py:45 ``inpaint_patches=True``);
  2. one vectorized "model" call per Arrow batch inside ``mapInPandas``
     (model held as a per-worker singleton, never per-batch — reference
     loads models once in plugin __init__, detection/yolo.py:11);
  3. drop blank results (T14 compaction) BEFORE the group-back so the
     shuffle carries only real text;
  4. fan IN by ``groupBy(url)`` with key-sorted arrays.

At 100 TB the exploded img-block side is a small fraction of pages, so the
final join back is broadcast-able — AQE picks that up at runtime; callers
join via :func:`with_recognized`.

The model is the deterministic PNG-tEXt stub (functions/recognize_kernel.py)
because the sandbox has no ONNX runtime; a real
``onnxruntime.InferenceSession`` drops into ``_model_call`` unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import CLS_EMBEDDED_IMG
from manga_translator_spark.functions.recognize_kernel import recognize_batch

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

_REC_SCHEMA = "url string, block_idx int, text string"

# Per-worker model singleton slot (reference: model loaded once in plugin
# __init__, reused across batches — detection/yolo.py:11, manga_ocr.py:24-27).
_MODEL = None


def _model_call(payloads: list[bytes | None]) -> list[str]:
    global _MODEL
    if _MODEL is None:
        _MODEL = recognize_batch  # stand-in for onnxruntime session load
    return _MODEL(payloads)


def recognize_embedded(classified: "DataFrame") -> "DataFrame":
    """(url, blocks, ...) -> (url, recognized: array<struct<block_idx,text>>).

    Only urls with >=1 non-blank recognition appear — join with
    :func:`with_recognized` to restore the pass-through contract.
    """
    imgs = (
        classified.select("url", F.explode("blocks").alias("b"))
        .filter(F.col("b.cls") == CLS_EMBEDDED_IMG)
        .select(
            "url",
            F.col("b.block_idx").alias("block_idx"),
            F.col("b.img_payload").alias("img_payload"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from manga_translator_spark.functions.normalize import is_blank

        for pdf in batches:
            texts = _model_call(list(pdf["img_payload"]))
            # T14 compaction with the SHARED is_blank (all-whitespace
            # aware), in the same Python pass the fused path uses — the
            # SQL trim() below strips ASCII spaces only, so a model
            # emitting '\t' would diverge staged-vs-fused without this
            # (r4 review; latent: post_process_ocr strips whitespace)
            keep = [not is_blank(t) for t in texts]
            yield pd.DataFrame(
                {
                    "url": [u for u, k in zip(pdf["url"], keep) if k],
                    "block_idx": [b for b, k in zip(pdf["block_idx"], keep) if k],
                    "text": [t for t, k in zip(texts, keep) if k],
                }
            )

    recognized = imgs.mapInPandas(run, schema=_REC_SCHEMA)
    return (
        recognized.filter(F.length(F.trim("text")) > 0)  # redundant guard
        .groupBy("url")
        .agg(F.sort_array(F.collect_list(F.struct("block_idx", "text"))).alias("recognized"))
    )


def with_recognized(assembled: "DataFrame", recognized: "DataFrame") -> "DataFrame":
    """Left join the (small) recognition results back onto the page grain;
    missing -> empty array (every-input-yields-an-output, T20)."""
    return assembled.join(recognized, "url", "left").withColumn(
        "recognized",
        F.coalesce(
            "recognized",
            F.expr("CAST(array() AS ARRAY<STRUCT<block_idx: INT, text: STRING>>)"),
        ),
    )
