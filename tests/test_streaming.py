"""Streaming wrapper: same bytes out as the batch pipeline, via both the
pure streaming plan and the foreachBatch sink."""

from __future__ import annotations

import pandas as pd
import pytest

from manga_translator_spark.plans.pipeline import PipelineConfig
from manga_translator_spark.schema import PAGES_SCHEMA
from manga_translator_spark.streaming.extract_stream import (
    extract_stream,
    read_pages_stream,
    run_foreach_batch,
)


@pytest.fixture(scope="module")
def pages_path(spark, corpus_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "pages")
    df = spark.createDataFrame(pd.DataFrame(corpus_rows), schema=PAGES_SCHEMA)
    df.repartition(6).write.parquet(path)  # several files -> several triggers
    return path


def test_streaming_plan_matches_golden(spark, pages_path, golden, tmp_path):
    stream = extract_stream(read_pages_stream(spark, pages_path))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("extract_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from extract_mem").collect()
    assert len(rows) == len(golden)
    for r in rows:
        assert r["extracted_text"] == golden[r["url"]].extracted_text


def test_streaming_rejects_non_streamable_config(spark, pages_path):
    stream = read_pages_stream(spark, pages_path)
    with pytest.raises(ValueError, match="fused"):
        extract_stream(stream, PipelineConfig(mode="staged"))


def test_windowed_host_rate_matches_batch(spark, pages_path, tmp_path):
    """Watermark + event-time window aggregation: a single availableNow
    epoch (watermark starts at -inf, nothing late) must equal the batch
    computation of the same windows."""
    from pyspark.sql import functions as F

    from manga_translator_spark.streaming.extract_stream import host_rate_windowed

    q = (
        host_rate_windowed(read_pages_stream(spark, pages_path, max_files_per_trigger=100))
        .writeStream.format("memory")
        .queryName("host_rate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["win_start"], r["host"]): r["n_pages"]
        for r in spark.sql("select * from host_rate").collect()
    }
    batch = spark.read.schema(PAGES_SCHEMA).parquet(pages_path)
    import datetime as dt

    max_ts = batch.agg(F.max("warc_ts")).first()[0]
    watermark = max_ts - dt.timedelta(minutes=30)
    want = {
        (r["win"]["start"], r["host"]): r["n"]
        for r in batch.groupBy(
            F.window("warc_ts", "10 minutes").alias("win"),
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
        # append mode emits a window only once the watermark passes its
        # end; the final (still-open) windows stay in state — that IS the
        # late-data contract being exercised
        if r["win"]["end"] <= watermark
    }
    assert got == want and len(got) > 5
    # and the plan really carries the watermark (late rows WOULD drop)
    analyzed = (
        host_rate_windowed(read_pages_stream(spark, pages_path))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "EventTimeWatermark" in analyzed


def test_stateful_host_totals(spark, pages_path, corpus_rows, tmp_path):
    """applyInPandasWithState: per-host running totals across multiple
    micro-batches; final update per host equals the batch count and state
    accumulates over >1 batch."""
    from manga_translator_spark.streaming.extract_stream import host_page_totals

    q = (
        host_page_totals(read_pages_stream(spark, pages_path, max_files_per_trigger=2))
        .writeStream.format("memory")
        .queryName("host_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from host_totals").collect()
    # last update per host (max batches) carries the final running total
    final = {}
    for r in rows:
        cur = final.get(r["host"])
        if cur is None or r["n_batches"] > cur["n_batches"]:
            final[r["host"]] = r
    import collections

    want = collections.Counter(
        row["url"].split("://", 1)[1].split("/", 1)[0] for row in corpus_rows
    )
    assert {h: r["n_pages"] for h, r in final.items()} == dict(want)
    assert max(r["n_batches"] for r in rows) > 1  # state really crossed batches


def test_foreach_batch_sink(spark, pages_path, golden, tmp_path):
    out = str(tmp_path / "out")
    q = run_foreach_batch(
        spark, pages_path, out, str(tmp_path / "ckpt2"), max_files_per_trigger=2
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == len(golden)
    sample = {r["url"]: r["extracted_text"] for r in got.limit(50).collect()}
    assert all(golden[u].extracted_text == t for u, t in sample.items())
