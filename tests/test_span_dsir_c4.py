"""Round-5 part-5 operators against independent pure-Python references:
ExactSubstr span dedup (overlapping-window coverage recomputed from scratch
with a Counter + set walk), DSIR scoring (bag model + integer ratio math via
hashlib), and the C4 rule flags (hand-written expectations per rule).  No
shared code with the operators beyond the constants, so Spark, DuckDB twin,
and these references can only agree or fail together."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd
import pytest

from manga_translator_spark.operators import curation, text_analysis
from manga_translator_spark.operators.dedup import dedup_duplicate_spans


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9 ]", " ", (text or "").lower()).split() if t]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# fixtures: planted duplicate runs, a zero-token doc, short-doc copies, and
# one doc that is a verbatim copy end-to-end (fully covered -> '')
# ---------------------------------------------------------------------------

_DUP_RUN = "the quick brown fox jumps over the lazy dog tonight"


@pytest.fixture(scope="module")
def span_pdf():
    rows = []
    for i in range(40):
        # per-doc tokens every <= 4 positions so no UNPLANTED 5-window repeats
        base = f"alpha bravo charlie delta n{i} echo foxtrot golf m{i} india"
        if i % 5 == 0:
            base = base + " " + _DUP_RUN  # planted duplicated tail
        rows.append({"doc_id": i, "text": base})
    rows.append({"doc_id": 40, "text": ""})               # zero tokens -> NULL
    rows.append({"doc_id": 41, "text": "one two three"})  # < w: whole-doc window
    rows.append({"doc_id": 42, "text": "one two three"})  # its copy -> ''
    rows.append({"doc_id": 43, "text": _DUP_RUN})         # fully duplicated -> ''
    rows.append({"doc_id": 44, "text": None})             # NULL text == no tokens
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def span_df(spark, span_pdf):
    return spark.createDataFrame(span_pdf)


def _span_reference(texts: dict[int, str], w: int, mc: int):
    toks = {d: _tokens(t) for d, t in texts.items()}
    wins, cnt = {}, Counter()
    for d, tt in toks.items():
        s = (
            [" ".join(tt[i : i + w]) for i in range(len(tt) - w + 1)]
            if len(tt) >= w
            else ([" ".join(tt)] if tt else [])
        )
        wins[d] = s
        cnt.update(s)
    dup = {s for s, n in cnt.items() if n > mc}
    out = {}
    for d, tt in toks.items():
        cov: set[int] = set()
        for i, s in enumerate(wins[d]):
            if s in dup:
                cov.update(range(i, min(i + w, len(tt))))
        text = None if not tt else " ".join(t for p, t in enumerate(tt) if p not in cov)
        out[d] = (text, len(tt) - len(cov), len(cov))
    return out


def test_dedup_spans_matches_reference(spark, span_pdf, span_df):
    w, mc = 5, 1
    expected = _span_reference(
        dict(zip(span_pdf["doc_id"], span_pdf["text"])), w, mc
    )
    got = {
        r["doc_id"]: (r["text_despanned"], r["n_kept"], r["n_dropped"])
        for r in dedup_duplicate_spans(span_df, width=w, max_count=mc).collect()
    }
    assert got == expected
    # the fixture exercises every contract branch: untouched docs, partial
    # coverage, the NULL row, and both ''-yielding shapes
    assert got[40] == (None, 0, 0)
    assert got[44] == (None, 0, 0)        # NULL text == zero tokens
    assert got[42] == ("", 0, 3)          # short-doc verbatim copy
    assert got[43] == ("", 0, 10)         # fully duplicated long doc
    assert got[1][2] == 0 and got[1][0]   # a clean doc survives intact
    assert 0 < got[0][2] < got[0][1] + got[0][2]  # partial coverage happened


def test_dedup_spans_alignment_independent(spark):
    """The overlapping windows catch a duplicated run at ANY offset — the
    property segment_dedup (non-overlapping) cannot provide."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                # same 6-token run embedded at offsets 1 and 3
                "text": [
                    "x aa bb cc dd ee ff tail1 tail2 tail3",
                    "y1 y2 y3 aa bb cc dd ee ff z",
                ],
            }
        )
    )
    out = {
        r["doc_id"]: r["n_dropped"]
        for r in dedup_duplicate_spans(df, width=6, max_count=1).collect()
    }
    assert out == {0: 6, 1: 6}


# ---------------------------------------------------------------------------
# dsir_scores
# ---------------------------------------------------------------------------


def _dsir_reference(texts: dict[int, str], target_ids: set[int], n_buckets: int):
    feats = {}
    for d, t in texts.items():
        tt = _tokens(t)
        fs = (
            tt
            if len(tt) < 2
            else tt + [f"{tt[i]} {tt[i + 1]}" for i in range(len(tt) - 1)]
        )
        feats[d] = [_h60(s) % n_buckets for s in fs]
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for d, bs in feats.items():
        raw.update(bs)
        if d in target_ids:
            tgt.update(bs)
    w = {b: (curation.DSIR_SCALE * (tgt[b] + 1)) // (raw[b] + 1) for b in raw}
    return {
        d: (len(bs), (sum(w[b] for b in bs) // len(bs)) if bs else None)
        for d, bs in feats.items()
    }


def test_dsir_scores_matches_reference(spark, span_pdf, span_df):
    n_buckets = 64  # small space so bucket collisions are exercised too
    target_ids = {int(d) for d in span_pdf["doc_id"] if d % 4 == 0}
    expected = _dsir_reference(
        dict(zip(span_pdf["doc_id"], span_pdf["text"])), target_ids, n_buckets
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_ppm"])
        for r in curation.dsir_scores(
            span_df, span_df.filter("doc_id % 4 = 0"), n_buckets=n_buckets
        ).collect()
    }
    assert got == expected
    assert got[40] == (0, None)  # zero-token doc: no features, NULL score
    # non-degenerate: the scores actually discriminate between documents
    assert len({s for _, s in got.values() if s is not None}) > 1


def test_dsir_single_token_doc_has_no_bigram(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": ["solo", "a b"]}))
    out = {
        r["doc_id"]: r["n_feats"]
        for r in curation.dsir_scores(df, df.filter("doc_id = 0")).collect()
    }
    assert out == {0: 1, 1: 3}  # 1 unigram; 2 unigrams + 1 bigram


# ---------------------------------------------------------------------------
# c4_rules
# ---------------------------------------------------------------------------


def test_c4_rules_flags(spark):
    docs = [
        (0, "plain good text with five words more", 0, 0, 0, 0, 0, 0, 1),
        (1, "code block { inside braces found here", 1, 0, 0, 0, 0, 0, 0),
        (2, "Lorem Ipsum filler text sits right here", 0, 1, 0, 0, 0, 0, 0),
        (3, "please enable JavaScript to view this page", 0, 0, 1, 0, 0, 0, 0),
        (4, "we updated our Privacy Policy this week", 0, 0, 0, 1, 0, 0, 0),
        (5, "this site uses cookies for analytics now", 0, 0, 0, 1, 0, 0, 0),
        (6, "an offer with spamword right in it", 0, 0, 0, 0, 1, 0, 0),
        # substring must NOT match: the bad-word rule is token-level
        (7, "spamwordy is a different token entirely ok", 0, 0, 0, 0, 0, 0, 1),
        (8, "too short", 0, 0, 0, 0, 0, 1, 0),
        (9, "", 0, 0, 0, 0, 0, 1, 0),
        (10, None, 0, 0, 0, 0, 0, 1, 0),  # NULL text == zero tokens
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [d[0] for d in docs], "text": [d[1] for d in docs]})
    )
    out = {
        r["doc_id"]: (
            r["has_brace"], r["has_lorem"], r["has_js"], r["has_policy"],
            r["has_blocked"], r["too_short"], r["keep"],
        )
        for r in text_analysis.c4_rules(df, blocklist=("spamword",)).collect()
    }
    assert out == {d[0]: d[2:] for d in docs}


def test_c4_rules_blocklist_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        text_analysis.c4_rules(df, blocklist=("two words",))
    with pytest.raises(ValueError):
        text_analysis.c4_rules(df, blocklist=("qu'ote",))


# ---------------------------------------------------------------------------
# c4_keep_condition == c4_rules.keep, and the composed curation recipe
# ---------------------------------------------------------------------------


def test_c4_condition_equals_flags(spark, span_pdf, span_df):
    flags = {
        r["doc_id"]: r["keep"]
        for r in text_analysis.c4_rules(span_df, blocklist=("bravo",)).collect()
    }
    cond = {
        r["doc_id"]: int(r["k"])
        for r in span_df.select(
            "doc_id",
            text_analysis.c4_keep_condition(blocklist=("bravo",)).alias("k"),
        ).collect()
    }
    assert cond == flags
    assert set(flags.values()) == {0, 1}  # the blocklist word actually fires


def _c4_keep_ref(text: str, blocklist: tuple) -> int:
    tt, low = _tokens(text), (text or "").lower()
    if "{" in (text or ""):
        return 0
    if any(p in low for p in text_analysis.C4_BLOCK_PHRASES):
        return 0
    if "javascript" in tt:
        return 0
    if any(p in low for p in text_analysis.C4_POLICY_PHRASES):
        return 0
    if any(b in tt for b in blocklist):
        return 0
    if len(tt) < text_analysis.C4_MIN_WORDS:
        return 0
    return 1


def _gopher_keep_ref(text: str) -> int:
    ta = text_analysis
    tt, n = _tokens(text), len(_tokens(text))
    if not (ta.GOPHER_MIN_WORDS <= n <= ta.GOPHER_MAX_WORDS) or n == 0:
        return 0
    s = sum(len(t) for t in tt)
    if not (ta.GOPHER_MIN_MEAN_WORD_LEN * n <= s <= ta.GOPHER_MAX_MEAN_WORD_LEN * n):
        return 0
    if 100 * sum(text.count(c) for c in "#…") > ta.GOPHER_MAX_SYMBOL_RATIO_PCT * max(n, 1):
        return 0
    stops = set().union(*ta.STOPWORDS.values())
    if sum(1 for t in tt if t in stops) < ta.GOPHER_MIN_STOPWORD_HITS:
        return 0
    return 1


def _ngrams_ref(text: str, w: int) -> set:
    tt = _tokens(text)
    if not tt:
        return set()
    if len(tt) < w:
        return {" ".join(tt)}
    return {" ".join(tt[i : i + w]) for i in range(len(tt) - w + 1)}


@pytest.fixture(scope="module")
def recipe_pdf():
    """Every recipe stage must fire: c4-tripping docs, gopher-failing
    (short) docs, an exact-dup pair, bench-contaminated docs, and strata
    with rates 1000/0/partial."""
    base = ("the quick brown fox jumps over a lazy dog and then runs far "
            "away to find some more food now")  # 20 tokens, has stopwords
    rows = []
    for i in range(30):
        text = f"{base} extra{i}"
        lang = ["en", "de", "fr"][i % 3]
        if i % 10 == 3:
            text += " lorem ipsum"          # c4 drop
        if i % 10 == 4:
            text = "way too short"          # gopher (and c4) drop
        if i in (7, 17):
            text = f"{base} duplicated"     # exact-dup pair: 17 loses to 7
        if i % 10 == 8:
            text += " planted bench overlap run"  # contaminated (see bench)
        rows.append({"doc_id": i, "text": text, "lang": lang})
    rows.append({"doc_id": 30, "text": None, "lang": "en"})  # NULL text
    return pd.DataFrame(rows)


def test_curate_corpus_matches_reference(spark, recipe_pdf):
    from manga_translator_spark.operators.training import curate_corpus

    w, rates, bl = 3, {"en": 1000, "de": 0, "fr": 500}, ()
    bench_texts = ["the planted bench overlap run appears here"]
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1000], "text": bench_texts, "lang": ["en"]})
    )
    df = spark.createDataFrame(recipe_pdf)
    got = {
        r["doc_id"]: (
            r["c4_keep"], r["gopher_keep"], r["canonical"],
            r["contaminated"], r["sampled"], r["keep"],
        )
        for r in curate_corpus(df, bench, rates, blocklist=bl, w=w).collect()
    }
    # independent reference
    texts = dict(zip(recipe_pdf["doc_id"], recipe_pdf["text"]))
    langs = dict(zip(recipe_pdf["doc_id"], recipe_pdf["lang"]))
    c4k = {d: _c4_keep_ref(t, bl) for d, t in texts.items()}
    gk = {d: _gopher_keep_ref(t) for d, t in texts.items()}
    kept = [d for d in texts if c4k[d] and gk[d]]
    bydig = {}
    for d in kept:
        bydig.setdefault(hashlib.md5(texts[d].encode()).hexdigest(), []).append(d)
    canonical = {d: int(d == min(g)) for g in bydig.values() for d in g}
    bg = set().union(*(_ngrams_ref(t, w) for t in bench_texts))
    cont = {d: int(bool(_ngrams_ref(texts[d], w) & bg))
            for d in kept if canonical[d]}
    samp = {
        d: int(_h60(f"sample:{d}") % 1000 < rates.get(langs[d], 0))
        for d, c in cont.items() if c == 0
    }
    expected = {}
    for d in texts:
        canon = canonical.get(d) if d in kept else None
        ct = cont.get(d) if canon == 1 else None
        sp = samp.get(d) if ct == 0 else None
        expected[d] = (c4k[d], gk[d], canon, ct, sp, sp if sp is not None else 0)
    assert got == expected
    # every stage fired in the fixture
    vals = list(zip(*got.values()))
    assert 0 in vals[0] and 0 in vals[1]                       # gates drop
    assert 0 in [v for v in vals[2] if v is not None]          # a dup lost
    assert 1 in [v for v in vals[3] if v is not None]          # contamination
    assert {0, 1} <= {v for v in vals[4] if v is not None}     # sampling split
