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
