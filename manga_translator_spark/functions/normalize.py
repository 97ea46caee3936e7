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
# Runs of 2+ dots / katakana middle dots, rewritten to a same-length run of
# ASCII dots (transplant of reference ocr/manga_ocr.py:35:
# ``re.sub("[・.]{2,}", lambda x: (x.end() - x.start()) * ".", text)`` —
# run length preserved; the only visible effect is ・ inside a run folding
# to '.').  … is folded to "..." *first* (manga_ocr.py:34), so each
# ellipsis contributes 3 dots to the run, exactly as in the reference.
_DOTS_RE = re.compile(r"[.・]{2,}")


def _dot_run(m: re.Match) -> str:
    return "." * (m.end() - m.start())


def normalize_text(raw: str) -> str:
    """Canonicalize a block's visible text.

    Rules (applied in order, each deterministic):
      1. Unicode NFC (charset discipline; the reference's BGR<->RGB analogue).
      2. fold U+2026 HORIZONTAL ELLIPSIS to "..." (manga_ocr.py:34).
      3. rewrite [・.]{2,} runs to same-length ASCII-dot runs (manga_ocr.py:35).
      4. collapse all whitespace runs to a single space and strip (web-text
         adaptation of manga_ocr.py:33's whitespace removal — documented
         deviation: Japanese OCR drops spaces entirely, web text keeps one).
    """
    if not raw:
        return ""
    # fast guards: NFC is identity on ASCII; the dot-run rule only fires
    # when a ・ is present (pure-dot runs map to themselves)
    if raw.isascii():
        text = raw
    else:
        text = unicodedata.normalize("NFC", raw)
        if "…" in text:
            text = text.replace("…", "...")
        if "・" in text:
            text = _DOTS_RE.sub(_dot_run, text)
    text = _WS_RE.sub(" ", text).strip()
    return text


# --------------------------------------------------------------------------
# Half->full width folding — the jaconv.h2z analogue (reference
# ocr/manga_ocr.py:36: ``jaconv.h2z(text, ascii=True, digit=True)``),
# implemented as explicit char maps so no dependency is needed.
# Voiced/semi-voiced halfwidth kana pairs (base + U+FF9E/U+FF9F) merge into
# the single precomposed fullwidth codepoint first, then remaining
# singles/ASCII map via str.translate.
# --------------------------------------------------------------------------

_H2Z_HALF = (
    "｡｢｣､･ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝﾞﾟ"
)
_H2Z_FULL = (
    "。「」、・ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテト"
    "ナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン゛゜"
)
assert len(_H2Z_HALF) == len(_H2Z_FULL) == 0x9F - 0x61 + 1

_H2Z_DAKUTEN = dict(
    zip("ｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾊﾋﾌﾍﾎｳﾜｦ", "ガギグゲゴザジズゼゾダヂヅデドバビブベボヴヷヺ")
)
_H2Z_HANDAKUTEN = dict(zip("ﾊﾋﾌﾍﾎ", "パピプペポ"))
_H2Z_PAIR_RE = re.compile("([ｶ-ﾄﾊ-ﾎｳﾜｦ])ﾞ|([ﾊ-ﾎ])ﾟ")

_H2Z_TABLE = {ord(h): ord(f) for h, f in zip(_H2Z_HALF, _H2Z_FULL)}
# ASCII U+0021..U+007E -> fullwidth forms U+FF01..U+FF5E; space -> U+3000
# (the ascii=True/digit=True flags of the reference call).
_H2Z_ASCII_TABLE = {c: c - 0x21 + 0xFF01 for c in range(0x21, 0x7F)}
_H2Z_ASCII_TABLE[0x20] = 0x3000


def _h2z_pair(m: re.Match) -> str:
    if m.group(1) is not None:
        return _H2Z_DAKUTEN[m.group(1)]
    return _H2Z_HANDAKUTEN[m.group(2)]


def h2z_text(text: str, *, kana: bool = True, ascii_: bool = True, digit: bool = True) -> str:
    """Halfwidth -> fullwidth fold (jaconv.h2z analogue, manga_ocr.py:36).

    Defaults mirror the reference call (kana + ascii + digit all folded;
    ``digit`` is a subset of ``ascii_`` kept for signature parity).  Used by
    the OCR post-process only — web block text keeps its halfwidth ASCII.
    """
    if not text:
        return text
    if kana and any("｡" <= ch <= "ﾟ" for ch in text):
        text = _H2Z_PAIR_RE.sub(_h2z_pair, text)
        text = text.translate(_H2Z_TABLE)
    table = {}
    if ascii_:
        table.update(_H2Z_ASCII_TABLE)
    elif digit:
        table.update({c: c - 0x30 + 0xFF10 for c in range(0x30, 0x3A)})
    if table:
        text = text.translate(table)
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
