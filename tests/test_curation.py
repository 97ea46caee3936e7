"""Curation operators (operators/curation.py) against independent pure-
Python references: decontamination set math, the greedy packing loop, and
the md5 sampling rule are each recomputed here from scratch (no shared
code with the operators beyond the constants), so Spark, DuckDB twin, and
this reference can only agree or fail together."""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from manga_translator_spark.operators import curation

# ---------------------------------------------------------------------------
# pure-Python reference implementations
# ---------------------------------------------------------------------------


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if t]


def _ngrams(text: str, w: int) -> set[str]:
    toks = _tokens(text)
    if not toks:
        return set()
    if len(toks) < w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _greedy_pack(sized: list[tuple[int, int]], cap: int) -> dict[int, int]:
    """doc_id -> pack_id over (doc_id, n_tokens) sorted by doc_id."""
    pid, fill, out = 0, 0, {}
    for doc_id, n in sorted(sized):
        if fill > 0 and fill + n > cap:
            pid, fill = pid + 1, 0
        out[doc_id] = pid
        fill += n
    return out


# ---------------------------------------------------------------------------
# fixtures: a small corpus with planted cross-split overlaps
# ---------------------------------------------------------------------------

LANG_CYCLE = ["en", "en", "en", "zh", "de", "fr", "xx"]


@pytest.fixture(scope="module")
def docs_pdf():
    rows = []
    for i in range(60):
        base = f"alpha beta gamma delta {i} epsilon zeta eta theta iota kappa"
        if i % 7 == 0:
            # planted verbatim 5-gram shared with the i+1 doc
            base += " shared run of five tokens exactly here"
        if i % 7 == 1:
            base += " shared run of five tokens exactly here too"
        rows.append(
            {
                "doc_id": i,
                "text": base,
                "lang": LANG_CYCLE[i % len(LANG_CYCLE)],
            }
        )
    rows.append({"doc_id": 60, "text": "", "lang": "en"})        # zero tokens
    rows.append({"doc_id": 61, "text": "one two", "lang": "en"})  # < w tokens
    rows.append({"doc_id": 62, "text": "one two", "lang": "en"})  # its verbatim copy
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def docs_df(spark, docs_pdf):
    return spark.createDataFrame(docs_pdf)


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_matches_set_reference(spark, docs_pdf, docs_df):
    w = 5
    bench_mask = docs_pdf["doc_id"] % 3 == 0
    bench_pdf, train_pdf = docs_pdf[bench_mask], docs_pdf[~bench_mask]
    bench_grams = set().union(*(_ngrams(t, w) for t in bench_pdf["text"]))
    expected = {}
    for _, r in train_pdf.iterrows():
        g = _ngrams(r["text"], w)
        hits = len(g & bench_grams)
        if hits:
            expected[r["doc_id"]] = (hits, len(g))
    got = {
        r["doc_id"]: (r["n_hits"], r["n_ngrams"])
        for r in curation.decontaminate(
            docs_df.filter("doc_id % 3 != 0"),
            docs_df.filter("doc_id % 3 = 0"),
            w=w,
        ).collect()
    }
    assert got == expected and expected  # non-trivial: planted overlaps hit


def test_decontaminate_short_and_empty_docs(spark, docs_df):
    """Docs shorter than w decontaminate on whole-sequence equality (61 is
    benchmark 'one two', 62 its train copy -> flagged); the zero-token doc
    never appears on either side."""
    out = {
        r["doc_id"]: r["n_hits"]
        for r in curation.decontaminate(
            docs_df.filter("doc_id >= 60 and doc_id != 61"),
            docs_df.filter("doc_id = 61"),
            w=13,
        ).collect()
    }
    assert out == {62: 1}


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_matches_greedy_reference(spark, docs_pdf, docs_df):
    cap, shards = 30, 4
    out = curation.pack_sequences(docs_df, capacity=cap, n_shards=shards).collect()
    assert len(out) == len(docs_pdf)
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for _, r in docs_pdf.iterrows():
        by_shard.setdefault(int(r["doc_id"]) % shards, []).append(
            (int(r["doc_id"]), len(_tokens(r["text"])))
        )
    expected = {s: _greedy_pack(v, cap) for s, v in by_shard.items()}
    for r in out:
        assert r["pack_id"] == expected[r["shard"]][r["doc_id"]], r
        assert r["n_tokens"] == dict(by_shard[r["shard"]])[r["doc_id"]]


def test_pack_invariants(spark, docs_df):
    """Multi-doc packs never exceed capacity; pack ids are dense per
    shard; an oversize doc sits alone in its pack."""
    from pyspark.sql import functions as F

    cap = 12
    p = curation.pack_sequences(docs_df, capacity=cap, n_shards=2)
    agg = p.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("s"), F.count("*").alias("c")
    )
    rows = agg.collect()
    assert all(r["s"] <= cap for r in rows if r["c"] > 1)
    assert all(r["c"] == 1 for r in rows if r["s"] > cap)
    per_shard: dict[int, set[int]] = {}
    for r in rows:
        per_shard.setdefault(r["shard"], set()).add(r["pack_id"])
    for pids in per_shard.values():
        assert pids == set(range(len(pids)))  # dense from 0


# ---------------------------------------------------------------------------
# sample_stratified
# ---------------------------------------------------------------------------

RATES = {"en": 250, "zh": 500, "de": 500, "fr": 500}


def test_sample_matches_md5_reference(spark, docs_pdf, docs_df):
    expected = {}
    for _, r in docs_pdf.iterrows():
        bucket = _h60(f"sample:{r['doc_id']}") % curation.SAMPLE_MOD
        if bucket < RATES.get(r["lang"], 0):
            expected[int(r["doc_id"])] = (r["lang"], bucket)
    got = {
        r["doc_id"]: (r["stratum"], r["bucket"])
        for r in curation.sample_stratified(docs_df, RATES).collect()
    }
    assert got == expected and expected
    assert not any(s == "xx" for s, _ in got.values())  # default_ppt=0 drops


def test_sample_default_rate_and_determinism(spark, docs_df):
    a = sorted(
        r["doc_id"]
        for r in curation.sample_stratified(
            docs_df, {}, default_ppt=500
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in curation.sample_stratified(
            docs_df, {}, default_ppt=500
        ).collect()
    )
    assert a == b and 0 < len(a) < 63  # deterministic, non-degenerate


def test_sample_rate_case_guards():
    with pytest.raises(ValueError, match="break the SQL literal"):
        curation.sample_rate_case_sql({"e'n": 10}, 0, "lang")
    with pytest.raises(ValueError, match="0..1000"):
        curation.sample_rate_case_sql({"en": 1500}, 0, "lang")


# ---------------------------------------------------------------------------
# chunk_tokens
# ---------------------------------------------------------------------------


def _ref_chunks(text: str, size: int, stride: int) -> list[tuple[int, str]]:
    toks = _tokens(text)
    out = []
    s = 0
    while s < len(toks):
        if s > 0 and s - stride + size >= len(toks):
            break  # predecessor window already reached the last token
        out.append((len(toks[s : s + size]), " ".join(toks[s : s + size])))
        s += stride
    return out


def test_chunk_tokens_matches_reference(spark, docs_pdf, docs_df):
    size, stride = 6, 4
    got: dict[int, list[tuple[int, str]]] = {}
    for r in curation.chunk_tokens(docs_df, size=size, stride=stride).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        )
    for _, row in docs_pdf.iterrows():
        exp = _ref_chunks(row["text"], size, stride)
        rows = sorted(got.get(int(row["doc_id"]), []))
        assert [(n, t) for _, n, t in rows] == exp, row["doc_id"]
        assert [i for i, _, _ in rows] == list(range(len(exp)))
    # coverage property: every token position is inside >= 1 chunk
    for _, row in docs_pdf.iterrows():
        toks = _tokens(row["text"])
        covered = set()
        s = 0
        for n, _ in _ref_chunks(row["text"], size, stride):
            covered.update(range(s, s + n))
            s += stride
        assert covered == set(range(len(toks)))


def test_chunk_tokens_arg_guards(docs_df):
    with pytest.raises(ValueError, match="stride"):
        curation.chunk_tokens(docs_df, size=4, stride=8)
    with pytest.raises(ValueError, match="stride"):
        curation.chunk_tokens(docs_df, size=4, stride=0)
