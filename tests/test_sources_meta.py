"""Archive source (S2 analogue), metadata stage (T21), lang dim (§2.4),
registry introspection (/info analogue)."""

from __future__ import annotations

import io
import zipfile

import pandas as pd

from pyspark.sql import functions as F

from manga_translator_spark.functions.langcodes import LANG_DIM, normalize_lang
from manga_translator_spark.operators.metadata import with_charset, with_constant
from manga_translator_spark.plans.pipeline import PipelineConfig, describe, extract
from manga_translator_spark.sources.archive import archive_pages, explode_archive_members


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _archives_df(spark, blobs: dict[str, bytes]):
    pdf = pd.DataFrame({"path": list(blobs), "content": list(blobs.values())})
    return spark.createDataFrame(pdf, schema="path string, content binary")


def test_archive_members_sorted_and_filtered(spark, corpus_rows):
    # members inserted out of order; .txt ignored; order must be sorted
    blob = _zip_bytes(
        {
            "z_last.html": corpus_rows[1]["html"],
            "a_first.html": corpus_rows[2]["html"],
            "skip.txt": b"not html",
            "m_mid.htm": corpus_rows[3]["html"],
        }
    )
    df = explode_archive_members(_archives_df(spark, {"arc1.zip": blob}))
    rows = df.collect()
    assert [r["member"] for r in rows] == ["a_first.html", "m_mid.htm", "z_last.html"]


def test_archive_bad_zip_yields_no_rows_not_crash(spark):
    df = explode_archive_members(
        _archives_df(spark, {"bad.zip": b"this is not a zip", "empty.zip": b""})
    )
    assert df.count() == 0


def test_archive_pages_run_through_pipeline(spark, corpus_rows, golden):
    blob = _zip_bytes({f"p{i}.html": corpus_rows[i]["html"] for i in range(5, 10)})
    pages = archive_pages(_archives_df(spark, {"c.zip": blob}))
    out = {r["url"]: r["extracted_text"] for r in extract(pages, PipelineConfig()).collect()}
    assert len(out) == 5
    for i in range(5, 10):
        assert out[f"c.zip!p{i}.html"] == golden[corpus_rows[i]["url"]].extracted_text


def test_with_charset(spark, pages_df):
    got = {r["url"]: r["charset"] for r in with_charset(pages_df).collect()}
    # page ids with %79==0 declare shift_jis; all others utf-8
    sjis = [u for u, c in got.items() if c == "shift_jis"]
    assert sjis and all(c in ("utf-8", "shift_jis") for c in got.values())


def test_with_constant_stub(pages_df):
    df = with_constant(pages_df, "color", "black")
    assert df.select(F.collect_set("color")).first()[0] == ["black"]


def test_normalize_lang_broadcast_join(spark):
    df = spark.createDataFrame(
        [("a", "eng"), ("b", "JA"), ("c", "jpn"), ("d", "xx"), ("e", "de")],
        "id string, lang string",
    )
    got = {r["id"]: r["lang_norm"] for r in normalize_lang(df, spark).collect()}
    assert got == {"a": "en", "b": "ja", "c": "ja", "d": "xx", "e": "de"}
    assert len(LANG_DIM) >= 10


def test_describe_registry():
    info = describe()
    assert info["slots"]["cleaner"] == ["mask", "noop", "strip"]
    assert info["slots"]["assembler"] == ["arrays", "exploded"]
    assert info["slots"]["repairer"] == ["model", "none"]
    assert "fused" in info["modes"]
    assert "detect" in info["stages"] and "repair" in info["stages"]
    # every registry entry carries an argument schema (GET /info analogue,
    # reference ui/main.py:223-305), and config_fields expose type+default
    for slot, names in info["slots"].items():
        for name in names:
            assert "args" in info["plugins"][slot][name], (slot, name)
    for arg in info["plugins"]["enricher"]["debug"]["args"].values():
        assert {"type", "default"} <= set(arg)
    assert info["config_fields"]["repair"]["default"] == "none"
    import json

    json.dumps(info)  # the whole payload is JSON-serializable (served as-is)


def test_archive_pdf_members_route_through_pdf_kernel(spark, corpus_rows):
    """A zip mixing html and pdf members: the explode keeps both, and
    extract_any routes each member to the right kernel."""
    from pyspark.sql import functions as F

    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.pdf_extract import (
        extract_any,
        pdf_extract_kernel,
    )

    pdf_payload = make_pdf([(72, 600, 11, "archived pdf body"), (72, 700, 14, "APDF")])
    blob = _zip_bytes(
        {
            "b_doc.pdf": pdf_payload,
            "a_page.html": corpus_rows[4]["html"],
            "skip.txt": b"neither",
        }
    )
    members = explode_archive_members(_archives_df(spark, {"mix.zip": blob}))
    rows = members.collect()
    assert [r["member"] for r in rows] == ["a_page.html", "b_doc.pdf"]
    pages = members.select(
        F.concat_ws("!", "archive", "member").alias("url"), "html"
    )
    out = {r["url"]: r for r in extract_any(pages).collect()}
    exp_text, _, _ = pdf_extract_kernel(pdf_payload)
    assert out["mix.zip!b_doc.pdf"]["extracted_text"] == exp_text == "APDF archived pdf body"
    assert out["mix.zip!a_page.html"]["n_blocks"] >= 0  # html branch ran
