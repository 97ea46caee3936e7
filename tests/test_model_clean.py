"""Model-based cleaner stage: patch selection + batched verdicts."""

from __future__ import annotations

from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import CLS_BOILERPLATE
from manga_translator_spark.operators.model_clean import (
    GRAY_LO,
    model_clean,
    repair_candidates,
)
from manga_translator_spark.plans.pipeline import extract


def test_candidates_are_gray_zone_boilerplate_only(pages_df):
    classified = extract(pages_df, until="classify")
    cands = repair_candidates(classified).collect()
    assert cands  # corpus has link-dense-but-texty blocks
    blocks = {
        (r["url"], b["block_idx"]): b
        for r in classified.collect()
        for b in r["blocks"]
    }
    for c in cands:
        b = blocks[(c["url"], c["block_idx"])]
        assert b["cls"] == CLS_BOILERPLATE and b["score"] >= GRAY_LO


def test_gray_lo_knob_is_wired(pages_df):
    """describe() advertises gray_lo for the model repairer — it must be
    SETTABLE via PipelineConfig.extra (r4 review: it was advertised but
    unreachable).  gray_lo above every score selects zero candidates, so
    repair='model' degrades to a byte-exact no-op; gray_lo=0 widens the
    candidate set beyond the default."""
    from manga_translator_spark.plans.pipeline import PipelineConfig

    classified = extract(pages_df, until="classify")
    n_default = repair_candidates(classified).count()
    n_all = repair_candidates(classified, gray_lo=0.0).count()
    assert repair_candidates(classified, gray_lo=1e9).count() == 0
    assert n_all >= n_default > 0
    none = extract(pages_df, PipelineConfig(repair="none", recognize=False)).collect()
    muted = extract(
        pages_df,
        PipelineConfig(repair="model", recognize=False, extra={"gray_lo": 1e9}),
    ).collect()
    assert {r["url"]: r["extracted_text"] for r in muted} == {
        r["url"]: r["extracted_text"] for r in none
    }


def test_usable_span_interior():
    from manga_translator_spark.operators.model_clean import usable_span

    assert usable_span("| · core text — ") == (4, 13)
    assert usable_span("plain") == (0, 5)
    assert usable_span(" |·—") == (0, 0) or usable_span(" |·—")[0] == usable_span(" |·—")[1]
    s = ">> keep this sentence intact. |"
    lo, hi = usable_span(s)
    assert s[lo:hi] == "keep this sentence intact."


def _crafted_pages(spark, extra_rows: int = 30):
    """Corpus pages plus one crafted page holding a gray-zone block that the
    stub model KEEPS: link-dense enough to classify boilerplate
    (3*n_link_chars >= n_chars), texty enough to score >= GRAY_LO, >= 60
    chars, ends with '.'."""
    from manga_translator_spark.corpus import generate_corpus
    from manga_translator_spark.schema import PAGES_SCHEMA

    link = "forty chars of anchor text right here ok"  # 40 visible chars
    plain = " plus sixty-ish plain chars follow here now then a stop."
    html = f'<body><p>head <a href="/x">{link}</a>{plain}</p></body>'.encode()
    rows = generate_corpus(extra_rows) + [
        {"url": "https://crafted.example.com/gray", "warc_ts": None, "html": html,
         "text": "", "lang": "en"}
    ]
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA)


def test_repair_plugin_config_selected(spark):
    """repair='model' is reachable via PipelineConfig like reference
    cleaners via cleaning/get.py:6-11; keep-verdict blocks are promoted to
    MAIN with the model text, everything else byte-identical."""
    from manga_translator_spark.plans.pipeline import PipelineConfig

    pages_df = _crafted_pages(spark)
    base = {r["url"]: r for r in extract(pages_df, until="classify").collect()}
    repaired = {
        r["url"]: r
        for r in extract(pages_df, PipelineConfig(repair="model"), until="repair").collect()
    }
    verdicts = {
        (r["url"], x["block_idx"]): x
        for r in model_clean(extract(pages_df, until="classify")).collect()
        for x in r["repaired"]
    }
    assert any(v["keep"] for v in verdicts.values())  # crafted page hits the path
    assert set(base) == set(repaired)
    n_promoted = 0
    for url, row in repaired.items():
        for b, b0 in zip(row["blocks"], base[url]["blocks"]):
            v = verdicts.get((url, b["block_idx"]))
            if v is not None and v["keep"]:
                assert b["cls"] == 0 and b["text"] == v["text"]
                assert b["n_chars"] == len(v["text"])
                n_promoted += 1
            else:
                assert b == b0
    assert n_promoted > 0


def test_repair_none_is_identity(pages_df):
    from manga_translator_spark.plans.pipeline import PipelineConfig

    a = extract(pages_df, until="classify").collect()
    b = extract(pages_df, PipelineConfig(repair="none"), until="repair").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_model_clean_verdicts_deterministic_and_keyed(pages_df):
    classified = extract(pages_df, until="classify")
    a = {r["url"]: r["repaired"] for r in model_clean(classified).collect()}
    b = {r["url"]: r["repaired"] for r in model_clean(classified).collect()}
    assert a == b
    for url, repaired in a.items():
        idxs = [x["block_idx"] for x in repaired]
        assert idxs == sorted(idxs)
        for x in repaired:
            assert x["keep"] == (len(x["text"]) >= 60 and x["text"].endswith((".", "!", "?")))
