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
