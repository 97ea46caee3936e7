"""Fused physical mode: parse -> classify -> clean -> recognize -> assemble
in ONE mapInPandas pass, emitting only the compact per-page result.

Why this exists (measured, 160k pages, local[32]): the staged plan ships
every page's full nested ``blocks ARRAY<STRUCT<...>>`` back through Arrow
into JVM rows only for the very next operators to reduce it to a short
string + spans.  That materialization allocates tens of millions of short-
lived JVM objects per run; the resulting GC pauses stall all executor
threads and flat-line scaling (detect stage: 7-13s erratic).  Fusing the
per-page stages keeps the heavy intermediate inside the Python worker and
sends ~100 bytes/page back — the same reduction the reference applies when
it inpaints patches instead of whole frames (cleaning/lama.py:45).

This is also exactly the reference's execution shape: its pipeline runs all
stages over one batch in one process (ImageToImagePipeline.__call__,
image_to_image.py:91-172), with cross-record model batching inside the
batch — which is what a real ONNX recognizer would do here per Arrow chunk
(one session.run per batch over all pages' image blocks, reference
detection/yolo.py:14-16).

Byte-identity: computed by the SAME shared kernels as the staged plan and
the oracle (functions/blocks.py et al.); tests assert staged == fused ==
oracle.  The staged plan (plans/pipeline.py mode="staged") remains the
composable/introspectable variant (until=, cleaner/assembler registries).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from manga_translator_spark.functions.blocks import CLS_EMBEDDED_IMG, extract_blocks
from manga_translator_spark.functions.normalize import is_blank
from manga_translator_spark.functions.recognize_kernel import recognize_batch
from manga_translator_spark.oracle import assemble
from manga_translator_spark.schema import EXTRACTED_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def create_stage_metrics(spark) -> dict:
    """Per-stage wall-time accumulators (ms), updated from every executor
    batch — the lineage/metrics per-stage timing promised in FIXTURES.md §4
    / SURVEY §6 (the reference has no metrics at all)."""
    sc = spark.sparkContext
    return {name: sc.accumulator(0) for name in ("parse_ms", "recognize_ms", "assemble_ms")}


from pyspark.accumulators import AccumulatorParam


class DictSumParam(AccumulatorParam):
    """AccumulatorParam summing per-key counts — used for per-bucket
    rows_in counting inside the fused pass (metrics-grade: task retries may
    double-count, like every Spark accumulator; lineage uses it for skew
    visibility, correctness comes from the written data)."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a


def extract_fused(pages: "DataFrame", metrics: dict | None = None) -> "DataFrame":
    """(url, html, ...) -> EXTRACTED_SCHEMA rows, one per input row.

    Cross-page model batching: image payloads from ALL pages in the Arrow
    batch go through one recognize_batch call (the reference's batched-
    inference pattern), then scatter back by (page, block) index.
    """
    import time

    # when the caller pre-bucketed the pages (lineage/resume path), the
    # bucket column rides through the UDF: rows_in is counted executor-side
    # into the dict accumulator (no extra input-scan job), and the output
    # already carries the write-partitioning column (no url re-join).
    carry_bucket = "bucket" in pages.columns and metrics is not None and "rows_in_by_bucket" in metrics

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = list(pdf["url"])
            if carry_bucket:
                metrics["rows_in_by_bucket"].add(
                    {int(k): int(v) for k, v in pdf["bucket"].value_counts().items()}
                )
            t0 = time.perf_counter()
            page_blocks = [extract_blocks(h) for h in pdf["html"]]
            t1 = time.perf_counter()

            # batched recognition across the whole Arrow chunk
            flat_payloads, owners = [], []
            for pi, blocks in enumerate(page_blocks):
                for b in blocks:
                    if b.cls == CLS_EMBEDDED_IMG and b.img_payload is not None:
                        flat_payloads.append(b.img_payload)
                        owners.append((pi, b.block_idx))
            rec_texts = recognize_batch(flat_payloads) if flat_payloads else []
            t2 = time.perf_counter()
            rec_by_page: dict[int, list[dict]] = {}
            for (pi, bidx), txt in zip(owners, rec_texts):
                if not is_blank(txt):
                    rec_by_page.setdefault(pi, []).append(
                        {"block_idx": bidx, "text": txt}
                    )

            out_text, out_spans, out_n, out_rec = [], [], [], []
            for pi, blocks in enumerate(page_blocks):
                text, spans = assemble(blocks)
                out_text.append(text)
                out_spans.append(
                    [{"block_idx": i, "start": s, "end": e} for i, s, e in spans]
                )
                out_n.append(len(spans))
                out_rec.append(sorted(rec_by_page.get(pi, []), key=lambda r: r["block_idx"]))
            if metrics is not None:
                t3 = time.perf_counter()
                metrics["parse_ms"].add(int((t1 - t0) * 1000))
                metrics["recognize_ms"].add(int((t2 - t1) * 1000))
                metrics["assemble_ms"].add(int((t3 - t2) * 1000))
            cols = {
                "url": urls,
                "extracted_text": out_text,
                "spans": out_spans,
                "n_blocks": out_n,
                "recognized": out_rec,
            }
            if carry_bucket:
                cols["bucket"] = pdf["bucket"]
            yield pd.DataFrame(cols)

    if carry_bucket:
        from pyspark.sql import types as T

        schema = T.StructType(
            EXTRACTED_SCHEMA.fields + [T.StructField("bucket", T.IntegerType(), False)]
        )
        return pages.select("url", "html", "bucket").mapInPandas(run, schema=schema)
    return pages.select("url", "html").mapInPandas(run, schema=EXTRACTED_SCHEMA)
