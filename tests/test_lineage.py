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
