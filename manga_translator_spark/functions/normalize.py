"""Shared text-normalization kernel (the OCR post-process analogue).

The reference pipeline normalizes recognized text in
``MangaOCR.post_process`` (reference: translator/src/manga_translator/ocr/
manga_ocr.py:31-38): strip whitespace, fold the ellipsis character to
``...``, collapse ``[.·]{2,}`` runs, half->full width folding.

This module is the single source of truth for our transplanted rules.  It is
imported by BOTH the single-process oracle and the Spark pandas UDFs, so
byte-identical output is guaranteed by construction rather than by carefully
mirroring two implementations (SURVEY.md §5, §7 risk register).

Pure Python, stdlib only, no Spark imports — safe to ship to executors via
``--py-files`` and to import from the DuckDB-side oracle.
"""

from __future__ import annotations

import re
import unicodedata

# Run of any Unicode whitespace -> single ASCII space.
_WS_RE = re.compile(r"\s+")
# Runs of 2+ dots / katakana middle dots -> canonical "..."
# (transplant of reference ocr/manga_ocr.py:35, which collapses [・.]{2,}).
_DOTS_RE = re.compile(r"[.・…]{2,}")


def normalize_text(raw: str) -> str:
    """Canonicalize a block's visible text.

    Rules (applied in order, each deterministic):
      1. Unicode NFC (charset discipline; the reference's BGR<->RGB analogue).
      2. fold U+2026 HORIZONTAL ELLIPSIS to "..." (manga_ocr.py:34).
      3. collapse runs of dots / U+30FB to "..." (manga_ocr.py:35).
      4. collapse all whitespace runs to a single space and strip.
    """
    if not raw:
        return ""
    # fast guards: NFC is identity on ASCII; the dot-collapse rules only
    # fire when their trigger chars are present (same output, fewer regexes)
    if raw.isascii():
        text = raw
    else:
        text = unicodedata.normalize("NFC", raw)
        if "…" in text:
            text = text.replace("…", "...")
    if ".." in text or "・" in text:
        text = _DOTS_RE.sub("...", text)
    text = _WS_RE.sub(" ", text).strip()
    return text


def is_blank(text: str | None) -> bool:
    """Emptiness predicate used by both compaction filters.

    Transplant of ``text.strip()`` emptiness checks at reference
    pipelines/image_to_image.py:130,142.
    """
    return text is None or not text.strip()


# Explicit charset handling for html:binary -> str.  The reference's analogue
# is its color-space discipline (utils.py:337-352 cv2<->PIL conversions).
_CHARSET_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


def decode_html(payload: bytes) -> str:
    """Decode raw page bytes to text deterministically.

    Sniffs a ``<meta charset=...>`` declaration in the first 1024 bytes;
    falls back to UTF-8.  Undecodable bytes become U+FFFD replacement chars
    (FIXTURES.md edge case id%79==0), identically on oracle and executors.
    """
    if payload is None:
        return ""
    if isinstance(payload, (bytearray, memoryview)):
        payload = bytes(payload)
    charset = "utf-8"
    m = _CHARSET_META_RE.search(payload[:1024])
    if m:
        declared = m.group(1).decode("ascii", "replace").lower()
        try:
            import codecs

            codecs.lookup(declared)
            charset = declared
        except LookupError:
            charset = "utf-8"
    return payload.decode(charset, errors="replace")
