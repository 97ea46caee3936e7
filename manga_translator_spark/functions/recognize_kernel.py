"""Text-recognition kernel for embedded images (OCR-stage analogue).

The reference's OCR stage (translator/src/manga_translator/ocr/manga_ocr.py:
41-53) batches image crops through a VisionEncoderDecoder model, then
post-processes the decoded strings (manga_ocr.py:31-38).  The sandbox ships
no ONNX runtime, so the default *model* here is a tiny fixed-weight numpy
network (functions/glyph_model.py): real grayscale-PNG pixel decode ->
same-shape batch stacking -> one matmul+argmax per shape group, weights
loaded once per worker from a committed .npz.  A deterministic tEXt-chunk
stub remains as the no-numpy / unknown-layout fallback.  The batching,
schema and UDF plumbing in ``operators/recognize.py`` would wrap an
``onnxruntime.InferenceSession`` identically (one ``session.run`` per Arrow
batch, model as a per-worker singleton — reference analogues
detection/yolo.py:11, ocr/manga_ocr.py:24-27).

Shared by oracle and Spark stage => identical recognized text by construction.
"""

from __future__ import annotations

import struct

from manga_translator_spark.functions.normalize import _DOTS_RE, _dot_run, h2z_text


def post_process_ocr(text: str) -> str:
    """OCR-output post-process — the full MangaOCR.post_process transplant
    (reference ocr/manga_ocr.py:31-38), steps in the reference's order:
      1. remove ALL whitespace (``"".join(text.split())`` — manga_ocr.py:33;
         NOT the web-text single-space collapse, ADVICE r02),
      2. fold U+2026 ellipsis to "..." (manga_ocr.py:34),
      3. run-length-preserving ``[・.]{2,}`` rewrite (manga_ocr.py:35),
      4. half->full width folding (jaconv.h2z(ascii=True, digit=True)
         analogue, manga_ocr.py:36).
    Width folding applies to *recognized* text only; web block text keeps
    halfwidth ASCII and single spaces (normalize_text)."""
    if not text:
        return ""
    text = "".join(text.split())
    text = text.replace("…", "...")
    text = _DOTS_RE.sub(_dot_run, text)
    return h2z_text(text)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

try:  # real model path — absent in this sandbox, kept behind an import-try
    import onnxruntime  # noqa: F401

    HAVE_ONNX = True
except ImportError:
    HAVE_ONNX = False

try:  # numpy glyph model: REAL tensor inference over the PNG pixels
    from manga_translator_spark.functions.glyph_model import (
        decode_png_gray,
        get_glyph_model,
    )

    HAVE_GLYPH_MODEL = True
except ImportError:  # no numpy: the tEXt stub below is the fallback
    HAVE_GLYPH_MODEL = False


def decode_png_text(payload: bytes) -> str:
    """STUB inference: read the tEXt(Description) chunk of a PNG.

    Walks chunks defensively; returns "" for non-PNG / chunk-less payloads
    (the OCR base class likewise returns "" — reference core/plugin.py:160).
    """
    if not payload or not bytes(payload).startswith(_PNG_SIG):
        return ""
    data = bytes(payload)
    pos = len(_PNG_SIG)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"tEXt":
            key, _, value = body.partition(b"\x00")
            if key == b"Description":
                return value.decode("utf-8", errors="replace")
        if tag == b"IEND":
            break
        pos += 12 + length
    return ""


def recognize_batch(payloads: list[bytes | None]) -> list[str]:
    """Batched model call: list in, positionally aligned list out — the
    exact contract of the reference OCR plugin (plugin.py:151-165), with
    post-processing (manga_ocr.py:31-38 analogue) applied.

    Default path is REAL batched inference: grayscale PNG pixels ->
    per-worker-singleton GlyphRecognizer (one matmul per same-shape group,
    glyph_model.py).  Payloads the pixel decoder cannot handle (RGB PNGs,
    non-PNG bytes) and no-numpy environments fall back to the tEXt stub.
    """
    texts: list[str | None] = [None] * len(payloads)
    if HAVE_GLYPH_MODEL:
        model = get_glyph_model()
        texts = model.infer_arrays([decode_png_gray(p) for p in payloads])
    return [
        post_process_ocr(
            t if t is not None else (decode_png_text(p) if p is not None else "")
        )
        for t, p in zip(texts, payloads)
    ]
