"""PDF payload extraction + the content-type router.

The north rule's extraction tier covers "PDF/layout parse": a crawl table
mixes text/html and application/pdf payloads in the same ``html: binary``
column, and the engine must extract both.  This module adds:

* ``extract_pdfs`` — mapInPandas over (url, payload): the stdlib PDF
  kernel (functions/pdf.py) inflates content streams, collects positioned
  text runs, orders them by layout (top-down, left-right — NOT stream
  order), normalizes each run with the SAME ``normalize_text`` the HTML
  path uses, and emits the engine's standard extraction row
  (url, extracted_text, spans, n_blocks, recognized=[]) — schema-
  compatible with ``plans.pipeline.extract`` so sinks/lineage work
  unchanged.
* ``extract_any`` — the router: payloads beginning ``%PDF-`` take the PDF
  path, everything else the HTML pipeline; one unionByName of the two
  branches.  Both branch filters push down to the scan, so each row's
  bytes are read once by exactly one branch — at 100 TB this is two
  narrow zero-shuffle passes over disjoint row sets, not a fan-out.

Reading-order assembly mirrors the HTML drawer contract: blank-normalized
runs are dropped (T14 compaction), survivors join with single spaces, and
spans carry per-run [start, end) offsets into the joined text.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import functions as F

from manga_translator_spark.functions.normalize import normalize_text
from manga_translator_spark.functions.pdf import extract_pdf_blocks
from manga_translator_spark.operators.common import spread
from manga_translator_spark.schema import EXTRACTED_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# hex of b"%PDF-" for the JVM-side router predicate (binary-safe, no UDF)
_PDF_MAGIC_HEX = "255044462D"


def pdf_extract_kernel(payload: bytes | None) -> tuple[str, list, int]:
    """One payload -> (extracted_text, spans, n_blocks).  Shared by the
    Spark stage and tests (byte-identity discipline)."""
    runs = extract_pdf_blocks(payload)
    texts = [normalize_text(r.text) for r in runs]
    kept = [(i, t) for i, t in enumerate(texts) if t]
    parts = []
    spans = []
    pos = 0
    for i, t in kept:
        if parts:
            pos += 1  # joining space
        parts.append(t)
        spans.append({"block_idx": i, "start": pos, "end": pos + len(t)})
        pos += len(t)
    return " ".join(parts), spans, len(spans)


def extract_pdfs(pages: "DataFrame") -> "DataFrame":
    """(url, html=pdf bytes, ...) -> standard extraction rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, spans, counts = [], [], []
            for payload in pdf["html"]:
                t, s, n = pdf_extract_kernel(payload)
                texts.append(t)
                spans.append(s)
                counts.append(n)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": texts,
                    "spans": spans,
                    "n_blocks": counts,
                    "recognized": [[] for _ in texts],
                }
            )

    # spread: the per-payload deflate+layout kernel is the expensive part;
    # a narrow (single-file) scan would run it on one task (wide scans and
    # in-memory frames pass through — operators/common.spread contract)
    return spread(pages.select("url", "html")).mapInPandas(run, schema=EXTRACTED_SCHEMA)


def is_pdf_payload() -> "F.Column":
    """JVM-side content sniff: first five payload bytes == %PDF-.

    NULL-safe: a NULL payload is NOT a pdf (coalesce false) — a bare
    equality is NULL for NULL html, which fails BOTH router branch
    filters and silently drops the row, breaking the pass-through
    row-count contract the HTML path guarantees (r4 review; the HTML
    kernel handles None payloads explicitly)."""
    return F.expr(
        f"coalesce(substring(html, 1, 5) = X'{_PDF_MAGIC_HEX}', false)"
    )


def extract_any(pages: "DataFrame", config=None, *, metrics=None) -> "DataFrame":
    """Route mixed html/pdf payloads to their extractors; union the rows.

    The HTML branch returns plans.pipeline.extract's full output (incl.
    recognized); the PDF branch emits the same schema.  Column order is
    aligned by name.  ``metrics`` passes through to the HTML pipeline's
    stage accumulators (the PDF branch is a single kernel stage).

    Input contract: each branch filter re-executes ``pages`` — for a
    file-backed crawl table that is the intended shape (two pushed-down
    scans over disjoint row sets), but a COMPUTED input (a union, a
    mapInPandas synthesis) would run twice; materialize such inputs first
    (``.localCheckpoint(eager=False)`` — see _q_extract_routed).
    """
    from manga_translator_spark.plans.pipeline import (
        PipelineConfig,
        extract,
        resolve_enricher,
    )

    cfg = config or PipelineConfig()
    sniff = is_pdf_payload()
    html_rows = extract(pages.filter(~sniff), cfg, metrics=metrics)
    # the enricher slot applies to BOTH branches — extract() runs it on
    # html rows, so pdf rows must get the same pass or a configured
    # translator silently skips every pdf (r5 review; jobs/serve.py
    # enriches its pdf branch and the served answer must match batch)
    pdf_rows = resolve_enricher(cfg)(extract_pdfs(pages.filter(sniff)))
    return html_rows.select(*EXTRACTED_SCHEMA.fieldNames()).unionByName(pdf_rows)
