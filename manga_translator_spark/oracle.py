"""Single-process reference extractor — the golden-output generator.

Role-equivalent to the reference repo's committed converted example images
(reference README.md:45-122): the trusted end-to-end output the distributed
pipeline must reproduce.  The north_rule gate is **byte-identical
extracted_text per url** between this oracle and the Spark pipeline.

It composes the exact shared kernels the Spark stages use
(functions/blocks.py, functions/normalize.py, functions/recognize_kernel.py),
so agreement is by construction; what the Spark side adds — partitioning,
Arrow batching, shuffles, joins — must not change a single byte.

Stage order mirrors ImageToImagePipeline.__call__
(reference pipelines/image_to_image.py:91-172):
  detect -> filter no-detection passthrough -> clean(strip) -> explode ->
  recognize -> drop blanks -> assemble ordered text+spans -> scatter back.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from manga_translator_spark.functions.blocks import (
    CLS_EMBEDDED_IMG,
    CLS_MAIN,
    Block,
    extract_blocks,
)
from manga_translator_spark.functions.normalize import is_blank
from manga_translator_spark.functions.recognize_kernel import recognize_batch

SEPARATOR = "\n\n"  # block joiner in the composite stage (drawer analogue)


@dataclass
class Extracted:
    """Golden row (FIXTURES.md §2)."""

    url: str
    extracted_text: str
    spans: list[tuple[int, int, int]] = field(default_factory=list)  # (block_idx, start, end)
    n_blocks: int = 0
    recognized: list[tuple[int, str]] = field(default_factory=list)  # (block_idx, text)


def assemble(blocks: list[Block]) -> tuple[str, list[tuple[int, int, int]]]:
    """Ordered reassembly: MAIN blocks in document order, '\\n\\n'-joined,
    with char spans — the drawer/composite analogue (image_to_image.py:155-163).
    """
    parts: list[str] = []
    spans: list[tuple[int, int, int]] = []
    offset = 0
    for b in blocks:
        if b.cls != CLS_MAIN or is_blank(b.text):
            continue
        if parts:
            offset += len(SEPARATOR)
        start = offset
        parts.append(b.text)
        offset += len(b.text)
        spans.append((b.block_idx, start, offset))
    return SEPARATOR.join(parts), spans


def extract_page(url: str, html: bytes, *, recognize: bool = True) -> Extracted:
    """Full per-page pipeline, one record at a time.

    ``recognize=False`` skips the glyph model entirely (the /clean route
    contract — previously the serve path ran the model on every embedded
    image and threw the result away; r5 review)."""
    blocks = extract_blocks(html)
    text, spans = assemble(blocks)
    if recognize:
        img_blocks = [b for b in blocks if b.cls == CLS_EMBEDDED_IMG]
        texts = recognize_batch([b.img_payload for b in img_blocks])
        recognized = [
            (b.block_idx, t) for b, t in zip(img_blocks, texts) if not is_blank(t)
        ]
    else:
        recognized = []
    return Extracted(
        url=url,
        extracted_text=text,
        spans=spans,
        n_blocks=len(spans),
        recognized=recognized,
    )


def extract_corpus(rows: list[dict]) -> list[Extracted]:
    """Oracle over a corpus; preserves the every-input-yields-an-output
    contract (results pre-filled with originals, image_to_image.py:100)."""
    return [extract_page(r["url"], r["html"]) for r in rows]
