"""Text-flow (wrap) stage: kernel semantics + three-way engine equality.

The kernel transplants wrap_text_pure / find_best_font_size (reference
utils.py:135-169, 273-335) onto a unit-cell metric; these tests pin the
reference-shaped contracts (None on overlong words, line offsets with
spacing, bounds, memo cache) and assert the Python kernel, the Spark SQL
fold and the DuckDB recursive-CTE twin produce identical lines.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from manga_translator_spark.functions.wrap import (
    WidthCache,
    fit_wrap_width,
    wrap_fold_spark,
    wrap_lines,
    wrap_sql_duck,
    wrap_text_pure,
    words_expr_spark,
)


def test_wrap_reference_contracts():
    # greedy fill at width 8 (hand-checked against utils.py:135-169)
    assert wrap_lines("hello world a b ccc", 8) == ["hello", "world a", "b ccc"]
    # word wider than the wrap => None (the font-retry contract)
    assert wrap_lines("superlong xx", 8) is None
    assert wrap_lines("", 8) == [""]
    assert wrap_lines("   \t\n ", 8) == [""]
    assert wrap_lines("one", 8) == ["one"]
    # infinite width: everything on one line (wrap_text default)
    assert wrap_lines("a b c d e", float("inf")) == ["a b c d e"]
    # offsets/bounds shape: line offsets step by height+line_spacing
    res = wrap_text_pure("hello world a b ccc", 8, line_spacing=2)
    assert [ln.offset for ln in res.lines] == [0, 3, 6]
    assert all(ln.height == 1 for ln in res.lines)
    assert res.bounds == (8, 7)  # x clamps at the wrap width; y = last offset + height


def test_liang_hyphenation_points():
    """Liang scoring over the committed table: the canonical trace, the
    affix rules, min-length guards, and the exception override."""
    from manga_translator_spark.functions.hyphen import (
        MIN_PREFIX,
        MIN_SUFFIX,
        Hyphenator,
    )

    h = Hyphenator()
    # the classic demo cluster reproduces hy-phen-ation from PATTERNS
    # (odd 3 in hy3ph, odd 5 in hen5at overriding the even 2 in n2at/2io)
    assert h.points("hyphenation") == (2, 6)
    assert h.points("running") == (3, 4)  # n1n + 1ing.
    assert h.points("committee") == (3, 6)  # m1m + t1t
    # exception list overrides scoring entirely
    assert h.points("present") == ()
    # guards: short words, non-alpha, min prefix/suffix bounds
    assert h.points("abba") == ()  # < MIN_WORD
    assert h.points("x1y2z") == ()  # non-alpha
    for w in ("unbelievable", "transformation", "misspelling"):
        for p in h.points(w):
            assert MIN_PREFIX <= p <= len(w) - MIN_SUFFIX
    # scoring is case-insensitive and cached
    assert h.points("Hyphenation".lower()) == h.points("hyphenation")


def test_hyphenated_wrap_reference_contracts():
    """wrap_text_with_hyphenator transplant: splits engage exactly when a
    whole word cannot fill the remaining line, parts carry the dash, and
    the no-version case is None."""
    from manga_translator_spark.functions.hyphen import (
        Hyphenator,
        wrap_lines_hyphenated,
        wrap_text_hyphenated,
    )

    # width 12: 'unbelievable' (12) fits a fresh line but not after 'the '
    # -> the un-/believable split fills the first line instead
    got = wrap_lines_hyphenated("the unbelievable hyphenation committee", 12)
    assert got == ["the un-", "believable", "hyphenation", "committee"]
    # same text, pure wrapper: no split, 'the' alone on line one
    assert wrap_lines("the unbelievable hyphenation committee", 12) == [
        "the", "unbelievable", "hyphenation", "committee",
    ]
    # a word too wide even for its narrowest version -> None (retry contract)
    assert wrap_lines_hyphenated("xylophones", 4) is None
    # ... but hyphenation rescues words the pure wrapper gives up on
    assert wrap_lines("hyphenation", 8) is None
    assert wrap_lines_hyphenated("hyphenation", 8) == ["hyphen-", "ation"]
    # offsets step with line_spacing exactly like the pure kernel
    res = wrap_text_hyphenated("the unbelievable word", 12, line_spacing=2)
    assert [ln.offset for ln in res.lines] == [0, 3, 6]
    # exception words never split even when splitting would help
    assert wrap_lines_hyphenated("present", 5, hyphenator=Hyphenator()) is None


@given(
    st.lists(
        st.sampled_from(
            ["the", "unbelievable", "hyphenation", "running", "committee",
             "transformation", "a", "x1", "misspelling", "wrestling"]
        ),
        min_size=0,
        max_size=10,
    ),
    st.integers(min_value=5, max_value=20),
)
@settings(max_examples=60, deadline=None)
def test_hyphenated_wrap_width_invariant(words, w):
    """Whenever the hyphenated wrap succeeds, EVERY emitted line fits the
    wrap width — the invariant the transplanted fit/flow quirks must
    preserve (each part is placed only when its end <= width)."""
    from manga_translator_spark.functions.hyphen import wrap_lines_hyphenated

    lines = wrap_lines_hyphenated(" ".join(words), w)
    if lines is not None:
        assert all(len(ln) <= w for ln in lines), (lines, w)


@given(st.lists(st.text(alphabet="ab1 ", min_size=0, max_size=8), max_size=8),
       st.integers(min_value=3, max_value=12))
@settings(max_examples=60, deadline=None)
def test_hyphenated_equals_pure_when_no_split_possible(parts, w):
    """Words with no hyphenation points reduce the hyphenated wrapper to
    the pure one — the reference's two variants collapse to the same
    path the same way.  Liang-splittable words are filtered out by
    QUERYING the scorer, not assumed from the alphabet (hypothesis found
    'abbaa', which b1b splits — exactly the divergence the hyphenated
    variant exists to provide)."""
    from hypothesis import assume

    from manga_translator_spark.functions.hyphen import (
        Hyphenator,
        wrap_lines_hyphenated,
    )

    h = Hyphenator()
    text = " ".join(parts)
    assume(all(not h.points(word) for word in text.split()))
    assert wrap_lines_hyphenated(text, w) == wrap_lines(text, w)


def test_wrap_lines_hyphenate_operator(spark):
    """The mapInPandas path (wrap_lines(hyphenate=True)) matches the
    Python kernel row-for-row on real documents and keeps the SQL path's
    schema."""
    from manga_translator_spark.functions.hyphen import (
        Hyphenator,
        wrap_lines_hyphenated,
    )
    from manga_translator_spark.operators.text_analysis import wrap_lines as op

    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # the synthetic corpus is short-word text (no split ever engages), so
    # it proves operator==kernel and hyphenated==plain on no-split input;
    # an injected hyphenation-rich frame proves the splits flow through.
    rich = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100001, 100002, 100003],
                "text": [
                    "the unbelievable hyphenation committee",
                    "hyphenation",  # pure wrapper fails at 12? no — at 8
                    "transformation running overfull",
                ],
            }
        )
    )
    docs = real.select("doc_id", "text").unionByName(rich)
    for width in (40, 12):
        got = {r["doc_id"]: r.asDict() for r in op(docs, width=width, hyphenate=True).collect()}
        plain = {r["doc_id"]: r.asDict() for r in op(docs, width=width).collect()}
        assert set(got) == set(plain)
        hyph = Hyphenator()
        n_diff = 0
        for r in docs.collect():
            exp = wrap_lines_hyphenated(r["text"], width, hyphenator=hyph)
            g = got[r["doc_id"]]
            if exp is None:
                assert g["fits"] == 0 and g["wrapped"] is None
            else:
                assert g["fits"] == 1 and g["wrapped"] == "\n".join(exp)
                assert g["n_lines"] == len(exp)
            if g["wrapped"] != plain[r["doc_id"]]["wrapped"]:
                n_diff += 1
        if width == 12:
            assert n_diff > 0  # the rich frame exercises real splits


def test_wrap_lines_null_text_contract(spark):
    """NULL text shares one contract across BOTH variants (ADVICE r4 #2):
    (n_lines NULL, wrapped NULL, fits 0) — the hyphenated mapInPandas
    path used to raise TypeError in the worker where the codegen fold
    yielded the NULL row."""
    from manga_translator_spark.operators.text_analysis import wrap_lines as op

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", None]})
    )
    for hyphenate in (False, True):
        rows = {r["doc_id"]: r for r in op(docs, width=12, hyphenate=hyphenate).collect()}
        assert rows[1]["fits"] == 1 and rows[1]["wrapped"] == "alpha beta"
        null_row = rows[2]
        assert null_row["n_lines"] is None
        assert null_row["wrapped"] is None
        assert null_row["fits"] == 0


def test_hyphenator_respects_plugged_metric():
    """A reused Hyphenator must not serve widths computed under a
    different metric: versions are assembled from the CALLER's WidthCache
    every call (r4 review — a (word,width)-keyed version cache returned
    stale unit-cell widths to a double-width metric)."""
    from manga_translator_spark.functions.hyphen import Hyphenator, wrap_text_hyphenated

    class DoubleCache(WidthCache):
        def get(self, word: str) -> int:
            w = self.cache.get(word)
            if w is None:
                w = self.cache[word] = 2 * len(word)
            return w

    h = Hyphenator()
    unit = wrap_text_hyphenated("hello world", 12, hyphenator=h)
    assert [ln.text for ln in unit.lines] == ["hello world"]
    wide = wrap_text_hyphenated(
        "hello world", 12, hyphenator=h, cache=DoubleCache()
    )
    assert [ln.text for ln in wide.lines] == ["hello", "world"]


def test_pdf_malformed_utf16_hex_never_emits_garbage():
    """A BOM-prefixed hex string with an odd UTF-16 payload must drop to
    empty text, not U+FFFD (the never-emit-garbage kernel rule)."""
    import zlib

    from manga_translator_spark.functions.pdf import extract_pdf_blocks

    content = zlib.compress(b"BT /F1 10 Tf 5 5 Td <FEFF41> Tj ET")
    raw = (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    texts = [b.text for b in extract_pdf_blocks(raw)]
    assert all("�" not in t for t in texts)
    assert texts in ([], [""])


def test_width_cache_memoizes():
    cache = WidthCache()
    wrap_text_pure("aa bb aa aa bb", 10, cache=cache)
    assert set(cache.cache) == {"aa", "bb"} and cache.cache["aa"] == 2


def test_fit_wrap_width_bisection():
    text = "word " * 20  # 20 words of width 4
    w, lines = fit_wrap_width(text, max_lines=4, min_width=5, max_width=60)
    assert len(lines) <= 4
    # the found width is locally minimal: a meaningfully narrower wrap overflows
    narrower = wrap_lines(text, w - 8)
    assert narrower is None or len(narrower) > 4
    # impossible budget at max_width => None
    assert fit_wrap_width("x " * 500, max_lines=1, min_width=5, max_width=20) is None


@settings(max_examples=150, deadline=None)
@given(
    st.text(alphabet="ab c\t\n.", max_size=60),
    st.integers(min_value=1, max_value=12),
)
def test_wrap_total_and_lines_fit(s, w):
    lines = wrap_lines(s, w)
    if lines is None:
        assert any(len(word) > w for word in s.split())
    else:
        assert "\n".join(lines).split() == s.split()  # no word lost/reordered
        for ln in lines[:-1] if len(lines) > 1 else lines:
            assert len(ln) <= w or " " not in ln


def _expected(texts, width):
    out = []
    for t in texts:
        lines = wrap_lines(t, width)
        out.append(
            (None, None, 0) if lines is None else ("\n".join(lines), len(lines), 1)
        )
    return out


def test_three_way_engine_equality(spark):
    texts = [
        "hello world a b ccc",
        "",
        "   ",
        "one",
        "superlongwordhere xx",
        "a\tb\nc  d",
        "x " * 50,
        "word " * 123,
        "mixed width words of unequal size spread over several lines nicely",
    ]
    width = 8
    exp = _expected(texts, width)
    # Spark fold
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    fold = wrap_fold_spark(words_expr_spark("text"), width)
    got_spark = {
        r["doc_id"]: (r["w"]["wrapped"], r["w"]["n_lines"])
        for r in df.selectExpr("doc_id", f"({fold}) AS w").collect()
    }
    # DuckDB recursive CTE
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got_duck = {
        r[0]: (r[2], r[1], r[3])
        for r in con.sql(wrap_sql_duck("documents", width)).fetchall()
    }
    for i, (w_exp, n_exp, fits) in enumerate(exp):
        assert got_spark[i] == (w_exp, n_exp), f"spark row {i}"
        assert got_duck[i] == (w_exp, n_exp, fits), f"duck row {i}"


def test_with_wrapped_lines_matches_kernel(spark, pages_df, golden):
    """The assemble feature's per-span lines equal the kernel wrap of each
    golden span's text (goldens-backed, byte-identical)."""
    from pyspark.sql import functions as F

    from manga_translator_spark.operators.assemble import with_wrapped_lines
    from manga_translator_spark.plans.pipeline import PipelineConfig, extract

    width = 18
    out = with_wrapped_lines(extract(pages_df, PipelineConfig()), width).collect()
    n_spans = 0
    for r in out:
        g = golden[r["url"]]
        assert len(r["lines"]) == len(g.spans)
        for entry, (block_idx, start, end) in zip(r["lines"], g.spans):
            span_text = g.extracted_text[start:end]
            exp = wrap_lines(span_text, width)
            got = None if entry["lines"] is None else list(entry["lines"])
            assert got == exp and entry["block_idx"] == block_idx, (r["url"], block_idx)
            n_spans += 1
    assert n_spans > 100


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
