"""Unit tests for the pure shared kernels (no Spark).

Mirrors the reference's isolation strategy: deterministic stand-ins per
stage (SURVEY.md §5; reference ocr/debug.py, translation/pipe.py).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from manga_translator_spark.corpus import generate_page, make_png
from manga_translator_spark.functions.blocks import (
    CLS_BOILERPLATE,
    CLS_EMBEDDED_IMG,
    CLS_MAIN,
    classify_block,
    extract_blocks,
)
from manga_translator_spark.functions.normalize import decode_html, is_blank, normalize_text
from manga_translator_spark.functions.recognize_kernel import decode_png_text, recognize_batch


# ---- normalize (T13 analogue) ------------------------------------------


def test_normalize_whitespace_collapse():
    assert normalize_text("  a \t b\n\nc  ") == "a b c"


def test_normalize_ellipsis_and_dots():
    # run-length-preserving dot rule (reference manga_ocr.py:34-35:
    # "…"->"..." first, then [・.]{2,} -> same-length ASCII-dot run)
    assert normalize_text("wait… what") == "wait... what"
    assert normalize_text("so.....") == "so....."
    assert normalize_text("a・・b") == "a..b"
    assert normalize_text("mix.・・z") == "mix...z"
    assert normalize_text("・alone") == "・alone"  # single ・ not in a run
    assert normalize_text("x……y") == "x......y"  # each … is 3 dots


def test_h2z_width_folding():
    # jaconv.h2z(ascii=True, digit=True) analogue (manga_ocr.py:36) —
    # applied in the OCR post-process only (post_process_ocr)
    from manga_translator_spark.functions.normalize import h2z_text
    from manga_translator_spark.functions.recognize_kernel import post_process_ocr

    assert h2z_text("ｶﾞｷﾞ") == "ガギ"
    assert h2z_text("ﾊﾟﾝ") == "パン"
    assert h2z_text("ｳﾞ") == "ヴ"
    assert h2z_text("ｱｲｳｴｵ｡｢｣ｰ") == "アイウエオ。「」ー"
    assert h2z_text("abc 09") == "ａｂｃ　０９"
    assert h2z_text("ﾟ") == "゜"  # bare (semi)voiced mark: no base to merge
    assert h2z_text("kana only", ascii_=False, digit=False) == "kana only"
    # the OCR path removes ALL whitespace before folding (manga_ocr.py:33),
    # so no U+3000 appears between the words (ADVICE r02 fix)
    assert post_process_ocr("ﾃｽﾄ  ok…") == "テストｏｋ．．．"
    assert post_process_ocr(" a\tb\nc ") == "ａｂｃ"


def test_normalize_empty():
    assert normalize_text("") == ""
    assert normalize_text(None) == ""
    assert is_blank("") and is_blank("   ") and is_blank(None)
    assert not is_blank("x")


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


def test_decode_html_charset_sniff():
    assert decode_html("héllo".encode("utf-8")) == "héllo"
    latin = b'<meta charset="latin-1">caf\xe9'
    assert "caf\xe9" in decode_html(latin)
    # bogus charset falls back to utf-8
    bogus = b'<meta charset="not-a-charset">ok'
    assert "ok" in decode_html(bogus)
    # undecodable bytes -> replacement chars, never an exception
    assert "�" in decode_html(b'<meta charset="utf-8">\xff\xfe')


# ---- block parser (T1 detector analogue) --------------------------------


def test_blocks_basic_order_and_classes():
    html = (
        b"<html><head><title>T</title><script>skip()</script></head><body>"
        b'<nav><a href="/a">home link here</a> more nav words go here</nav>'
        b"<p>This paragraph is long enough to be main content for sure.</p>"
        b'<div class="ad banner">Buy this thing now from our sponsor!!</div>'
        b"<p>tiny</p>"
        b"</body></html>"
    )
    blocks = extract_blocks(html)
    tags = [(b.tag, b.cls) for b in blocks]
    assert [b.block_idx for b in blocks] == list(range(len(blocks)))
    # nav is hint -> boilerplate; ad div hint -> boilerplate; tiny < 25 chars
    by_text = {b.text[:4]: b for b in blocks}
    assert by_text["This"].cls == CLS_MAIN
    assert by_text["Buy "].cls == CLS_BOILERPLATE
    assert by_text["tiny"].cls == CLS_BOILERPLATE
    nav_block = next(b for b in blocks if b.tag == "nav")
    assert nav_block.hint and nav_block.cls == CLS_BOILERPLATE
    assert nav_block.n_links == 1 and nav_block.n_link_chars > 0
    assert tags  # script content never appears
    assert not any("skip()" in b.text for b in blocks)


def test_blocks_link_density_rule():
    # > 1/3 of chars inside <a> -> boilerplate even without hint class
    html = b'<p><a href="/x">twenty characters aa</a> short tail text</p>'
    (b,) = extract_blocks(html)
    assert 3 * b.n_link_chars >= b.n_chars
    assert b.cls == CLS_BOILERPLATE


def test_blocks_img_data_uri():
    png = make_png("hello png")
    import base64

    html = (
        b'<p>Real main content paragraph with plenty of characters.</p>'
        b'<img src="data:image/png;base64,' + base64.b64encode(png) + b'" />'
    )
    blocks = extract_blocks(html)
    img = next(b for b in blocks if b.tag == "img")
    assert img.cls == CLS_EMBEDDED_IMG and img.img_payload == png
    assert decode_png_text(img.img_payload) == "hello png"


def test_blocks_malformed_tolerated():
    html = b"<p>Unclosed paragraph with enough characters to be main.</div><p>Another main paragraph of respectable length here."
    blocks = extract_blocks(html)
    assert len(blocks) == 2
    assert all(b.cls == CLS_MAIN for b in blocks)


def test_blocks_empty_inputs():
    assert extract_blocks(b"") == []
    assert extract_blocks(b"<html><body></body></html>") == []


def test_classify_block_rules():
    assert classify_block(100, 0, False, False) == CLS_MAIN
    assert classify_block(100, 0, True, False) == CLS_BOILERPLATE
    assert classify_block(24, 0, False, False) == CLS_BOILERPLATE
    assert classify_block(90, 30, False, False) == CLS_BOILERPLATE  # 3*30>=90
    assert classify_block(91, 30, False, False) == CLS_MAIN
    assert classify_block(0, 0, False, True) == CLS_EMBEDDED_IMG


_HTMLISH = st.lists(
    st.sampled_from(
        list("abcdefg <>/=\"'&;!?-.\nちは日本")
        + ["<p>", "</p>", "<div class='ad'>", "<a href='/x'>", "</a>", "&amp;", "&#65;",
           "<script>", "</script>", "<!--", "-->", "<img src=x>", "<br>"]
    ),
    max_size=120,
).map("".join)


# richer alphabet for the cross-engine fuzz: the r01 advice found the fast
# engine diverging on end-tag forms outside the original alphabet
# ('</ script>', '</scriptx>'), so those shapes are first-class tokens here
_HTMLISH_ENDTAGS = st.lists(
    st.sampled_from(
        list("abc <>/=\"'&\n\t")
        + ["<p>", "</p>", "</ p>", "</ p >", "</p@>", "</p x>", "</>",
           "<script>", "</script>", "</ script>", "</scriptx>", "</script x>",
           "<style>", "</style>", "</ style >", "<div>", "</div>", "<a href='/x'>",
           "</a>", "</ a>", "<!--", "-->", "<img src=x>", "<P>", "</P>"]
    ),
    max_size=60,
).map("".join)


@given(_HTMLISH_ENDTAGS)
@settings(max_examples=400, deadline=None)
def test_engine_equality_fuzz(s):
    """Fast tokenizer == stdlib engine on adversarial end-tag-heavy input —
    the char-identical invariant, fuzzed over the forms that diverged in
    round 1 (ADVICE: rawtext close, whitespace-after-</)."""
    assert extract_blocks(s, engine="fast") == extract_blocks(s, engine="stdlib"), s


@given(_HTMLISH)
@settings(max_examples=300, deadline=None)
def test_parser_fuzz_deterministic_and_total(s):
    """Any input parses without raising, deterministically, with valid
    block invariants (the tolerant-parser contract; FIXTURES malformed
    edge case, generalized)."""
    a = extract_blocks(s.encode("utf-8"))
    b = extract_blocks(s.encode("utf-8"))
    assert a == b
    for i, blk in enumerate(a):
        assert blk.block_idx == i
        assert blk.n_chars == len(blk.text)
        assert 0 <= blk.n_link_chars
        assert blk.cls in (0, 1, 2)


def test_fast_engine_equals_stdlib_engine():
    """The fast tokenizer drives the same state machine as html.parser and
    must produce identical blocks over the whole corpus (incl. malformed,
    charset and empty edge pages) and over adversarial snippets."""
    from manga_translator_spark.corpus import generate_corpus

    for row in generate_corpus(400):
        assert extract_blocks(row["html"], engine="stdlib") == extract_blocks(
            row["html"], engine="fast"
        ), row["url"]
    snippets = [
        b"<p>a<!-- comment --><p>b</p>",
        b"<!DOCTYPE html><p>Doc with enough characters to be main maybe.</p>",
        b"<a href='q>x'>weird attr</a><p>after odd quoting of attributes.</p>",
        b"<P CLASS='AD'>upper case tag and attr</P>",
        b"<div id = 'sidebar'>spaced equals hint detection block here</div>",
        b"<script>var a = '<p>not a block</p>';</script><p>Real block after script tag here.</p>",
        b"<style>p{}</style>text outside blocks",
        b"<img src=x><img><br><hr>",
        b"1 < 2 but > 0",
        # rawtext close-tag forms: stdlib ends CDATA on r'</\s*tag\s*>'
        # (whitespace allowed around the name, '>' required) — the fast
        # engine must match exactly (ADVICE r01)
        b"<body><script>x</ script><p>real paragraph content here okay</p></body>",
        b"<body><script>a</scriptx>b</script><p>tail paragraph content here</p></body>",
        b"<body><script>a</script x>b</script><p>tail two content here</p></body>",
        b"<body><style>.x{}</ style ><p>styled content paragraph here</p></body>",
        b"<body><script>never closed <p>ghost</p>",
        b"<body><p>one</ p><p>two paragraphs of content here</p></body>",
        b"<body><p>a</p@><p>second paragraph with plenty of content</p></body>",
        b"<body><p>a</ p ><p>second paragraph with plenty of content</p></body>",
        b"<body><p>a</></p><p>second paragraph with plenty of content</p></body>",
        # r02 fuzz-found minimal divergences, each fixed and pinned:
        b"<!--",  # unterminated comment: bogus-data recovery, not a drop
        b"<!-->trailing text becomes data",  # comment with no proper close
        b"<!---- >after",  # stdlib comment close is r'--\s*>'
        b"<p<>;",  # tolerant tag names include almost anything
        b"<x'>",  # dangling quote is part of the tag name
        b"<f/'>",  # dangling quote as a bare attribute NAME
        b"x</p",  # incomplete end tag at EOF -> '<' + tail as data
        b"x<p class='a",  # incomplete open tag at EOF
        b"<![CDATA[x]]>tail",  # marked section consumed, tail parses
        b"<![CDATA[<br>",  # unterminated marked section: data to '>'
        b"<![foo[x]]>",  # unknown keyword raises in both engines
        # r03 (ADVICE r02 high): tagfind_tolerant excludes \x00 from tag
        # names — a NUL inside an end tag must tokenize identically
        b"<p>one</p\x00>two paragraphs of content here</p>",
        b"<p>a</p\x00 b>tail paragraph with plenty of content</p>",
        b"<div\x00id=x>NUL in start tag name here too</div>",
    ]
    for s in snippets:
        assert extract_blocks(s, engine="stdlib") == extract_blocks(s, engine="fast"), s


# ---- recognition stub (T12 analogue) ------------------------------------


def test_recognize_roundtrip():
    # recognize_batch applies the full OCR post-process (manga_ocr.py:31-38):
    # ALL whitespace removed (step 1), then width-folded (h2z ascii=True)
    assert recognize_batch([make_png("seed text 42")]) == ["ｓｅｅｄｔｅｘｔ４２"]
    assert decode_png_text(make_png("seed text 42")) == "seed text 42"
    assert recognize_batch([None, b"not a png", b""]) == ["", "", ""]


def test_png_is_valid_chunk_layout():
    png = make_png("abc")
    assert png.startswith(b"\x89PNG\r\n\x1a\n") and png.endswith(b"\x00\x00\x00\x00IEND\xaeB`\x82")


# ---- corpus determinism -------------------------------------------------


def test_corpus_deterministic_and_order_free():
    a = generate_page(123)
    b = generate_page(123)
    assert a == b
    assert a["url"].endswith("page000123")
    assert a["html"].startswith(b"<html>")


def test_giant_page_skew_probe():
    """The 42424 skew-probe page (1000 paragraphs) parses and assembles
    correctly — the one-mega-page-per-bucket straggler case (SURVEY §7)."""
    from manga_translator_spark.oracle import extract_page

    row = generate_page(42424)
    e = extract_page(row["url"], row["html"])
    # most of the 1000 paragraphs are MAIN; a few random ones fall under
    # the 25-char threshold (correctly classified boilerplate)
    assert 900 <= e.n_blocks <= 1000
    assert e.spans[-1][2] == len(e.extracted_text)
    # spans strictly ordered and non-overlapping
    prev = -1
    for _, start, end in e.spans:
        assert start > prev and end >= start
        prev = end


def test_corpus_edge_pages():
    empty = generate_page(0)  # 0 % 97 == 0 -> empty body
    assert b"<body></body>" in empty["html"]
    boiler = generate_page(89)  # all boilerplate: article holds no <p> paragraphs
    article = boiler["html"].split(b"<article>")[1].split(b"</article>")[0]
    assert b"<p>" not in article
    charset = generate_page(79)
    assert b'charset="shift_jis"' in charset["html"]
