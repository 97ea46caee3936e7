"""PDF layout kernel + routed extraction (the north rule's PDF parse)."""

from __future__ import annotations

import pandas as pd
import pytest

from manga_translator_spark.functions.normalize import normalize_text
from manga_translator_spark.functions.pdf import (
    extract_pdf_blocks,
    extract_pdf_text,
    make_pdf,
)
from manga_translator_spark.operators.pdf_extract import (
    extract_any,
    pdf_extract_kernel,
)
from manga_translator_spark.schema import PAGES_SCHEMA


def test_round_trip_reading_order():
    """Stream order is adversarial (body first, title second); extraction
    must come back in layout order — the 'layout parse' contract."""
    pdf = make_pdf(
        [
            (72, 600, 11, "body paragraph, stream-first but reading-second."),
            (72, 700, 18, "Title Line"),
            (310, 700, 11, "sidebar right of title"),
        ]
    )
    texts = [b.text for b in extract_pdf_blocks(pdf)]
    assert texts == [
        "Title Line",
        "sidebar right of title",
        "body paragraph, stream-first but reading-second.",
    ]
    assert extract_pdf_text(pdf) == " ".join(texts)


def test_string_escapes_and_operators():
    pdf = make_pdf([(10, 20, 9, "par(en)s \\ mixed")])
    assert extract_pdf_blocks(pdf)[0].text == "par(en)s \\ mixed"
    # octal + named escapes through a hand-built stream
    import zlib

    content = zlib.compress(rb"BT /F1 10 Tf 5 5 Td (\110i\tthere) Tj ET")
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    blocks = extract_pdf_blocks(raw)
    assert blocks and blocks[0].text == "Hi\tthere"


def test_tm_tstar_and_leading():
    """Tm absolute positioning and T*/TL line stepping order correctly."""
    import zlib

    content = zlib.compress(
        b"BT /F1 10 Tf 14 TL 1 0 0 1 50 500 Tm (first) Tj T* (second) Tj ET"
    )
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    assert [b.text for b in extract_pdf_blocks(raw)] == ["first", "second"]


def test_garbage_and_unsupported_yield_empty():
    assert extract_pdf_blocks(None) == []
    assert extract_pdf_blocks(b"<html>not a pdf</html>") == []
    assert extract_pdf_blocks(b"%PDF-1.4 truncated") == []
    # unsupported filter: skipped, never garbage
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\n"
        b"\xff\xd8\xff\xe0\nendstream\nendobj\n"
    )
    assert extract_pdf_blocks(raw) == []


def test_kernel_spans_and_blank_compaction():
    pdf = make_pdf(
        [
            (72, 700, 12, "alpha"),
            (72, 650, 12, "   "),  # blank after normalization: dropped (T14)
            (72, 600, 12, "beta gamma"),
        ]
    )
    text, spans, n = pdf_extract_kernel(pdf)
    assert text == "alpha beta gamma" and n == 2
    assert [(s["start"], s["end"]) for s in spans] == [(0, 5), (6, 16)]
    assert [text[s["start"] : s["end"]] for s in spans] == ["alpha", "beta gamma"]
    # block_idx preserves reading-order index incl. the dropped blank
    assert [s["block_idx"] for s in spans] == [0, 2]


def test_extract_any_routes_mixed_payloads(spark, corpus_rows):
    """html rows take the DOM pipeline, %PDF- rows the PDF kernel; the
    union carries both with the standard schema, byte-identical to the
    respective oracles."""
    from manga_translator_spark.oracle import extract_corpus

    html_rows = [dict(r) for r in corpus_rows[:25]]
    pdf_pages = []
    for i in range(10):
        body = f"pdf body text number {i}, long enough to matter."
        pdf_pages.append(
            {
                "url": f"pdf://doc/{i}",
                "warc_ts": None,
                "html": make_pdf(
                    [(72, 600, 11, body), (72, 700, 16, f"Heading {i}")]
                ),
                "text": "",
                "lang": "en",
            }
        )
    # a NULL payload must survive the router as an empty extraction, not
    # vanish (NULL fails both branch filters with a bare equality sniff)
    null_row = [{"url": "null://0", "warc_ts": None, "html": None, "text": "", "lang": "en"}]
    df = spark.createDataFrame(
        pd.DataFrame(html_rows + pdf_pages + null_row), schema=PAGES_SCHEMA
    )
    out = {r["url"]: r for r in extract_any(df).collect()}
    assert len(out) == 36
    assert out["null://0"]["extracted_text"] == "" and out["null://0"]["n_blocks"] == 0
    golden = {e.url: e.extracted_text for e in extract_corpus(html_rows)}
    for r in html_rows:
        assert out[r["url"]]["extracted_text"] == golden[r["url"]]
    for i in range(10):
        row = out[f"pdf://doc/{i}"]
        exp_text, exp_spans, exp_n = pdf_extract_kernel(pdf_pages[i]["html"])
        assert row["extracted_text"] == exp_text == (
            normalize_text(f"Heading {i}")
            + " "
            + normalize_text(f"pdf body text number {i}, long enough to matter.")
        )
        assert row["n_blocks"] == exp_n == 2
        assert [(s["start"], s["end"]) for s in row["spans"]] == [
            (s["start"], s["end"]) for s in exp_spans
        ]
        assert row["recognized"] == []


def test_stream_extent_uses_declared_length():
    """Compressed bodies may legitimately end in CR/LF bytes; the declared
    /Length must win over EOL-strip guessing (regression: docs whose
    deflate output ends in 0x0D parsed to zero blocks)."""
    import zlib

    import random

    rng = random.Random(3)
    content = None
    # find a text whose compressed stream ends with CR (the failing shape)
    for n in range(20000):
        word = bytes(rng.choice(b"abcdefghij") for _ in range(rng.randrange(3, 20)))
        cand = zlib.compress(b"BT /F1 10 Tf 5 5 Td (x%d %s) Tj ET" % (n, word))
        if cand.endswith(b"\r"):
            content = cand
            tag = "x%d %s" % (n, word.decode())
            break
    assert content is not None
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    blocks = extract_pdf_blocks(raw)
    assert blocks and blocks[0].text == tag


def test_non_latin1_round_trip_hex_strings():
    """CJK fixture text round-trips losslessly: make_pdf emits a UTF-16BE
    hex string (BOM-prefixed) and the extractor decodes it back byte-exact
    (regression: latin-1 'replace' silently turned CJK into '?')."""
    import re as _re
    import zlib as _z

    texts = ["日本語テスト", "mixed 日本語 and ascii", "plain ascii stays literal"]
    pdf = make_pdf([(72, 700 - 50 * i, 12, t) for i, t in enumerate(texts)])
    assert [b.text for b in extract_pdf_blocks(pdf)] == texts
    # ascii-only blocks still use literal (...) strings (no hex blow-up)
    ascii_pdf = make_pdf([(72, 700, 12, "plain ascii")])
    m = _re.search(rb"stream\r?\n(.*?)\nendstream", ascii_pdf, _re.DOTALL)
    assert m and b"(plain ascii)" in _z.decompress(m.group(1))


def test_hex_string_whitespace_and_odd_padding():
    """Hex strings may contain whitespace and an odd digit count (padded
    with 0 per spec); latin-1 payloads decode without a BOM."""
    import zlib

    content = zlib.compress(b"BT /F1 10 Tf 5 5 Td <48 65 6C6C 6F2> Tj ET")
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    blocks = extract_pdf_blocks(raw)
    assert blocks and blocks[0].text == "Hello "  # 0x20 from the padded '2'


def test_indirect_length_never_truncates():
    """'/Length 6 0 R' names object 6, not six bytes: a filterless stream
    must fall through to the full-body candidate, not emit a 6-byte
    truncated block (r3 review; '/Length 66 0 R' guards the backtrack)."""
    for declared in (b"6 0 R", b"66 0 R"):
        raw = (
            b"%PDF-1.4\n1 0 obj\n<< /Length " + declared + b" >>\nstream\n"
            b"BT /F1 10 Tf 5 5 Td (full text survives) Tj ET"
            b"\nendstream\nendobj\n"
        )
        blocks = extract_pdf_blocks(raw)
        assert blocks and blocks[0].text == "full text survives"
    # a DIRECT length is still authoritative
    body = b"BT /F1 10 Tf 5 5 Td (kept) Tj ET"
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d >>\nstream\n" % len(body)
        + body
        + b"\nendstream\nendobj\n"
    )
    assert [b.text for b in extract_pdf_blocks(raw)] == ["kept"]


def test_multipage_reading_order_is_page_major():
    """Two content streams (two pages): page 1's bottom line must precede
    page 2's top line — a global y sort would interleave them."""
    import zlib

    def obj(n, content):
        return (
            b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % (n, len(content))
            + content
            + b"\nendstream\nendobj\n"
        )

    c1 = zlib.compress(b"BT /F1 10 Tf 50 700 Td (p1 top) Tj ET\n"
                       b"BT /F1 10 Tf 50 100 Td (p1 bottom) Tj ET")
    c2 = zlib.compress(b"BT /F1 10 Tf 50 700 Td (p2 top) Tj ET")
    raw = b"%PDF-1.4\n" + obj(1, c1) + obj(2, c2)
    texts = [b.text for b in extract_pdf_blocks(raw)]
    assert texts == ["p1 top", "p1 bottom", "p2 top"]
    pages = [b.page for b in extract_pdf_blocks(raw)]
    assert pages == [0, 0, 1]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_extract_any_enriches_pdf_branch(spark, corpus_rows):
    """The configured enricher applies to BOTH router branches — a pdf row
    must come out enriched exactly like an html row (r5 review; the serve
    job enriches its pdf branch, and served == batch is the contract)."""
    from manga_translator_spark.plans.pipeline import PipelineConfig

    html_rows = [dict(r) for r in corpus_rows[:5]]
    pdf_pages = [
        {
            "url": "pdf://enrich/0",
            "warc_ts": None,
            "html": make_pdf([(72, 600, 11, "pdf body text, long enough to pass.")]),
            "text": "",
            "lang": "en",
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(html_rows + pdf_pages), schema=PAGES_SCHEMA)
    out = {r["url"]: r for r in extract_any(df, PipelineConfig(enricher="debug")).collect()}
    assert out["pdf://enrich/0"]["extracted_text"] == "meow"
    nonempty_html = [
        out[r["url"]]["extracted_text"]
        for r in html_rows
        if out[r["url"]]["extracted_text"]
    ]
    assert nonempty_html and all(t == "meow" for t in nonempty_html)
