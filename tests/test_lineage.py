"""Resumability + lineage (north_rule): failed buckets resume without
recomputing done ones; lineage records per-bucket metrics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from manga_translator_spark.sources.lineage import done_buckets, read_lineage, run_extraction
from manga_translator_spark.sources.pages import with_bucket

N_BUCKETS = 8


def test_run_writes_all_rows_and_lineage(spark, pages_df, golden, tmp_path):
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    run_extraction(spark, pages_df, out, lin, n_buckets=N_BUCKETS, buckets_per_job=4)
    got = spark.read.parquet(out)
    assert got.count() == len(golden)
    # byte-identical through the sink as well
    for r in got.collect():
        assert r["extracted_text"] == golden[r["url"]].extracted_text
    lineage = read_lineage(spark, lin)
    assert lineage.filter(F.col("status") == "done").count() == N_BUCKETS
    rows = lineage.collect()
    assert all(r["rows_in"] == r["rows_out"] for r in rows)  # pass-through
    assert sum(r["rows_in"] for r in rows) == len(golden)
    # no task retries in-test => accumulator counts are verified exact
    assert all(r["rows_in_exact"] for r in rows)


def test_failed_bucket_resumes_without_recompute(spark, pages_df, golden, tmp_path):
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    # first attempt: buckets {6,7} group blows up mid-run
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction(
            spark, pages_df, out, lin,
            n_buckets=N_BUCKETS, buckets_per_job=2, fail_buckets={7},
        )
    done_before = done_buckets(spark, lin)
    assert 0 < len(done_before) < N_BUCKETS
    failed = read_lineage(spark, lin).filter(F.col("status") == "failed")
    assert failed.count() > 0

    # resume: only the not-done buckets run (witnessed via lineage row count)
    run_extraction(spark, pages_df, out, lin, n_buckets=N_BUCKETS, buckets_per_job=2)
    lineage = read_lineage(spark, lin)
    done_rows = lineage.filter(F.col("status") == "done").collect()
    assert {r["bucket"] for r in done_rows} == set(range(N_BUCKETS))
    # done buckets from attempt 1 were NOT re-run in attempt 2
    assert len(done_rows) == N_BUCKETS

    got = spark.read.parquet(out)
    assert got.count() == len(golden)
    # no duplicates from the failed attempt (dynamic partition overwrite)
    assert got.select("url").distinct().count() == len(golden)


def test_bucket_assignment_stable(spark, pages_df):
    a = with_bucket(pages_df, 16).select("url", "bucket")
    b = with_bucket(pages_df, 16).select("url", "bucket")
    assert a.exceptAll(b).count() == 0
    assert a.select("bucket").distinct().count() > 8  # spread, not collapsed


def test_routed_run_extracts_mixed_html_pdf(spark, corpus_rows, tmp_path):
    """run_extraction with the pdf/html router: every row lands exactly
    once, PDF rows via the layout kernel, lineage exact (custom transforms
    take the recount path)."""
    import pandas as pd

    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.pdf_extract import (
        extract_any,
        pdf_extract_kernel,
    )
    from manga_translator_spark.schema import PAGES_SCHEMA

    html_rows = [dict(r) for r in corpus_rows[:30]]
    pdf_pages = [
        {
            "url": f"pdf://mix/{i}",
            "warc_ts": None,
            "html": make_pdf([(72, 600, 11, f"pdf body {i} text"), (72, 700, 16, f"T{i}")]),
            "text": "",
            "lang": "en",
        }
        for i in range(12)
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(html_rows + pdf_pages), schema=PAGES_SCHEMA
    )
    out, lin = str(tmp_path / "out"), str(tmp_path / "lineage")
    run_extraction(
        spark, pages, out, lin, n_buckets=8, buckets_per_job=4, transform=extract_any
    )
    got = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 42
    for p in pdf_pages:
        exp_text, _, exp_n = pdf_extract_kernel(p["html"])
        assert got[p["url"]]["extracted_text"] == exp_text
        assert got[p["url"]]["n_blocks"] == exp_n == 2
    lineage = read_lineage(spark, lin).collect()
    assert sum(r["rows_in"] for r in lineage) == 42
    assert all(r["rows_in"] == r["rows_out"] and r["rows_in_exact"] for r in lineage)


def test_extract_delta_skips_unchanged_reextracts_changed(spark, corpus_rows):
    """(url, digest) anti-join semantics: unchanged pages skip, a url with
    CHANGED bytes re-extracts, brand-new urls extract."""
    import pandas as pd

    from manga_translator_spark.schema import PAGES_SCHEMA
    from manga_translator_spark.sources.lineage import extract_delta

    rows = [dict(r) for r in corpus_rows[:20]]
    pages = spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA)
    # previous run saw the first 10 urls; url[0] has since CHANGED bytes
    prev_rows = rows[:10]
    prev = spark.createDataFrame(
        pd.DataFrame(prev_rows), schema=PAGES_SCHEMA
    ).select("url", F.md5("html").alias("digest"))
    changed = dict(rows[0])
    changed["html"] = changed["html"] + b"<!-- updated -->"
    pages2 = spark.createDataFrame(
        pd.DataFrame([changed] + rows[1:]), schema=PAGES_SCHEMA
    )
    out_urls = {r["url"] for r in extract_delta(pages2, prev).select("url").collect()}
    expected = {changed["url"]} | {r["url"] for r in rows[10:]}
    assert out_urls == expected  # urls 1..9 unchanged -> skipped
