"""Detect stage: ``html:binary`` -> ``blocks`` array column (mapInPandas).

Transplant of the batched region detector (reference detection/yolo.py:14-32,
contract core/plugin.py:237-251): one vectorized call per batch of frames,
emitting a per-record list of detections.  Here the "model" is the shared
pure-Python DOM flattener (functions/blocks.py) run once per row inside an
Arrow batch — no per-row Python UDF round trips, one JVM<->Python transfer
per ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows.

Scale notes (100 TB shape):
* Only ``url`` and ``html`` cross into Python — callers should ``select``
  those first so Catalyst prunes the parquet scan to two columns.
* The stage is embarrassingly parallel: no shuffle is introduced here; the
  caller controls partitioning (sources/pages.py hash-buckets on url).
* ``html`` is dropped from the output — the dominant byte-weight never
  travels past this stage (the reference's analogue: inpainting patches,
  not whole frames, cleaning/lama.py:45).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from manga_translator_spark.functions.blocks import extract_blocks
from manga_translator_spark.schema import detected_schema

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def _blocks_of(html: bytes | None) -> list[dict]:
    if html is None:
        return []
    return [
        {
            "block_idx": b.block_idx,
            "tag": b.tag,
            "depth": b.depth,
            "text": b.text,
            "n_chars": b.n_chars,
            "n_links": b.n_links,
            "n_link_chars": b.n_link_chars,
            "hint": b.hint,
            "img_payload": b.img_payload,
        }
        for b in extract_blocks(html)
    ]


def detect_blocks(pages: "DataFrame") -> "DataFrame":
    """(url, html) -> (url, blocks).  Pages with no blocks keep an empty
    array — the pass-through contract (image_to_image.py:100): every input
    row survives to the output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf["url"], "blocks": [_blocks_of(h) for h in pdf["html"]]}
            )

    return pages.select("url", "html").mapInPandas(run, schema=detected_schema())
