"""Minimal-but-real PDF text/layout kernel (stdlib only).

The north rule's extraction tier includes "PDF/layout parse": web crawls
carry application/pdf payloads whose text lives in page content streams,
not DOM nodes.  This kernel implements the honest subset a crawl-scale
extractor needs, with zero dependencies:

* ``make_pdf`` — deterministic single-page PDF writer (header, catalog/
  pages/page/font objects, ONE Flate-compressed content stream of
  ``BT .. Tf .. Td (text) Tj .. ET`` runs, xref table, trailer).  Plays
  the role ``corpus.make_png`` plays for the OCR stage: fixtures whose
  expected extraction is known byte-exactly.
* ``extract_pdf_blocks`` — tolerant extractor: scans ``N 0 obj``
  dictionaries for ``stream`` payloads, inflates ``/FlateDecode`` ones
  (zlib is stdlib), tokenizes content streams, tracks the text cursor
  through ``Td``/``TD``/``Tm``/``T*``, decodes PDF string escapes
  (backslash pairs + octal) and hex strings (UTF-16BE with BOM, else
  latin-1), and emits positioned text runs.  Blocks are
  returned in READING ORDER — top-down then left-right by cursor
  position, not stream order — which is the "layout parse" part: PDF
  content streams may emit text in any order, and span-correct
  extraction must reorder geometrically (the analogue of the HTML side's
  DOM-order contract).

Reference analogue: the OCR stage consumes positioned regions and the
drawer re-assembles them in reading order (pipelines/image_to_image.py
explode -> recognize -> ordered composite); here the "regions" are text
runs and the geometry is the PDF text matrix.

Deliberately out of scope (documented, not hidden): CID/Type0 composite
fonts, encrypted PDFs, cross-reference streams (PDF 1.5+ compressed
xref), and non-Flate filters.  Payloads using those yield zero blocks
rather than wrong text — at crawl scale the router's job is to extract
what is extractable and never emit garbage.
"""

from __future__ import annotations

import re
import zlib
from typing import NamedTuple

PDF_MAGIC = b"%PDF-"


class PdfBlock(NamedTuple):
    page: int  # content-stream index (page order in the file)
    x: float
    y: float
    size: float
    text: str


# ---------------------------------------------------------------------------
# Writer (fixture synthesizer)


def _esc(text: str) -> bytes:
    out = text.encode("latin-1")  # callers route non-latin-1 to _pdf_string
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _pdf_string(text: str) -> bytes:
    """A PDF string token for ``text``: a literal ``(...)`` string when the
    text is latin-1, else a hex string ``<FEFF...>`` in UTF-16BE with BOM
    (ISO 32000 §7.9.2.2) — the round-trip is LOSSLESS either way.  The old
    latin-1 'replace' encoding silently turned CJK fixtures into '?' while
    the DuckDB twin expected the original text (r3 review)."""
    try:
        return b"(" + _esc(text) + b")"
    except UnicodeEncodeError:
        payload = ("\ufeff" + text).encode("utf-16-be")
        return b"<" + payload.hex().upper().encode("ascii") + b">"


def make_pdf(blocks: list[tuple[float, float, float, str]]) -> bytes:
    """Deterministic single-page PDF with one positioned text run per
    (x, y, size, text) tuple, content stream Flate-compressed."""
    runs = []
    for x, y, size, text in blocks:
        runs.append(
            b"BT /F1 %.2f Tf %.2f %.2f Td %s Tj ET"
            % (size, x, y, _pdf_string(text))
        )
    content = zlib.compress(b"\n".join(runs))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
        + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Extractor

# innermost (non-nested) dict immediately preceding the stream keyword —
# Contents dicts are flat (<< /Length n /Filter /FlateDecode >>); nested
# stream dicts fall outside the supported subset and are skipped
_STREAM_RE = re.compile(
    rb"<<(?P<dict>[^<>]*)>>\s*stream\r?\n(?P<body>.*?)endstream", re.DOTALL
)
# A direct length only: '/Length 6 0 R' is an INDIRECT reference whose
# digits are an object number, not a byte count — treating it as literal
# would truncate the body (r3 review).  (?![0-9]) keeps the match from
# backtracking '/Length 66 0 R' into a bogus '/Length 6'.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")

# content-stream tokens we track: strings, hex strings, numbers, operators
_TOK_RE = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)"  # (string) with escapes
    rb"|<(?P<hex>[0-9A-Fa-f \t\r\n]*)>"  # <hex string> (ISO 32000 7.3.4.3)
    rb"|(?P<num>[+-]?\d*\.?\d+)"
    rb"|(?P<op>[A-Za-z'\"*]+)"
)

_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            m = _OCTAL_RE.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
                continue
            nxt = raw[i + 1 : i + 2]
            if nxt == b"\n":  # line continuation
                i += 2
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _unhex(raw: bytes) -> str:
    """Decode a hex-string payload: whitespace ignored, odd final digit
    padded with 0 (spec), UTF-16BE when the bytes open with a BOM, else
    latin-1 (the PDFDocEncoding ASCII range this kernel supports)."""
    digits = b"".join(raw.split())
    if len(digits) % 2:
        digits += b"0"
    try:
        payload = bytes.fromhex(digits.decode("ascii"))
    except ValueError:
        return ""
    if payload[:2] == b"\xfe\xff":
        try:
            return payload[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return ""  # malformed UTF-16: drop, never emit U+FFFD garbage
    return payload.decode("latin-1")


def _content_streams(data: bytes) -> list[bytes]:
    """Every decodable stream payload: raw, or zlib-inflated when the
    object dict names /FlateDecode.  Undecodable filters are skipped.

    The byte extent is ambiguous when /Length is indirect or absent
    (compressed bytes may legitimately END in \\r or \\n, so EOL-stripping
    is a guess, not a rule) — the declared /Length is authoritative when
    present, and the inflate is retried over the candidate extents
    otherwise.  A candidate that fails to inflate is skipped, never
    emitted as garbage."""
    out = []
    for m in _STREAM_RE.finditer(data):
        d = m.group("dict")
        body = m.group("body")
        candidates = []
        lm = _LENGTH_RE.search(d)
        if lm:
            candidates.append(body[: int(lm.group(1))])
        candidates.append(body)
        if body.endswith(b"\r\n"):
            candidates.append(body[:-2])
        if body.endswith(b"\n"):
            candidates.append(body[:-1])
        if b"/FlateDecode" in d:
            for c in candidates:
                try:
                    out.append(zlib.decompress(c))
                    break
                except zlib.error:
                    continue
        elif b"/Filter" in d:
            continue  # unsupported filter: skip, never emit garbage
        else:
            out.append(candidates[0])
    return out


def _runs_from_stream(stream: bytes) -> list[PdfBlock]:
    """Walk one content stream's text operators.

    Tracked state: current font size (Tf), text cursor (Td/TD/Tm/T*),
    leading (TL, set by TD).  Each Tj/'/TJ emits a run at the cursor; TJ
    concatenates its array's strings (kerning numbers dropped)."""
    runs: list[PdfBlock] = []
    stack: list[bytes | float] = []
    strings_since: list[str] = []
    x = y = 0.0
    size = 0.0
    leading = 0.0
    in_text = False
    for m in _TOK_RE.finditer(stream):
        if m.group("str") is not None:
            strings_since.append(_unescape(m.group("str")))
            stack.append(m.group("str"))
            continue
        if m.group("hex") is not None:
            strings_since.append(_unhex(m.group("hex")))
            stack.append(m.group("hex"))
            continue
        if m.group("num") is not None:
            stack.append(float(m.group("num")))
            continue
        op = m.group("op")
        nums = [v for v in stack if isinstance(v, float)]
        if op == b"BT":
            in_text, x, y = True, 0.0, 0.0
        elif op == b"ET":
            in_text = False
        elif op == b"Tf" and nums:
            size = nums[-1]
        elif op in (b"Td", b"TD") and len(nums) >= 2:
            x, y = x + nums[-2], y + nums[-1]
            if op == b"TD":
                leading = -nums[-1]
        elif op == b"TL" and nums:
            leading = nums[-1]
        elif op == b"Tm" and len(nums) >= 6:
            x, y = nums[-2], nums[-1]
        elif op == b"T*":
            y -= leading
        elif op in (b"Tj", b"'", b'"') and in_text and strings_since:
            if op in (b"'", b'"'):  # both move to the next line first
                y -= leading
            runs.append(PdfBlock(0, x, y, size, strings_since[-1]))
        elif op == b"TJ" and in_text and strings_since:
            runs.append(PdfBlock(0, x, y, size, "".join(strings_since)))
        stack.clear()
        strings_since.clear()
    return runs


def extract_pdf_blocks(data: bytes | None) -> list[PdfBlock]:
    """Positioned text runs of a PDF payload, in READING ORDER: page
    (content-stream index) major, then top-down by y, then left-right by
    x (PDF y grows upward).  Sorting y globally would interleave pages —
    page 2's header outranks page 1's footer — so the stream index is the
    primary key.  Non-PDF / undecodable payloads yield []."""
    if not data or not bytes(data[:5]) == PDF_MAGIC:
        return []
    runs: list[PdfBlock] = []
    for page, stream in enumerate(_content_streams(bytes(data))):
        runs.extend(
            r._replace(page=page) for r in _runs_from_stream(stream)
        )
    runs.sort(key=lambda r: (r.page, -r.y, r.x))
    return runs


def extract_pdf_text(data: bytes | None) -> str:
    """Reading-ordered plain text: one space between runs, normalized by
    the caller (shared normalize_text keeps HTML/PDF paths consistent)."""
    return " ".join(r.text for r in extract_pdf_blocks(data))
