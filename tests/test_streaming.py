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
    # idempotency: replaying an epoch (the crash-between-write-and-
    # checkpoint-commit case) must not duplicate rows — the epoch-keyed
    # dynamic overwrite re-overwrites exactly its own partition
    from manga_translator_spark.streaming.extract_stream import write_epoch

    n_before = got.count()
    # eager localCheckpoint materializes the rows off the sink files
    # before we overwrite into the same path
    replay = got.filter("epoch = 0").drop("epoch").localCheckpoint()
    write_epoch(replay, 0, out)
    assert spark.read.parquet(out).count() == n_before


def test_streaming_dedup_within_watermark(spark, corpus_rows, tmp_path):
    """Duplicated pages (same html bytes, distinct urls) collapse to one
    row per digest; uniques all survive.  Exactly the batch dedup_exact
    grouping, expressed as bounded streaming state."""
    import datetime as dt

    from manga_translator_spark.streaming.extract_stream import dedup_pages_stream

    base = list(corpus_rows[:40])
    dupes = []
    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    for i, row in enumerate(base[:10]):  # 10 re-fetches of the first 10 pages
        d = dict(row)
        d["url"] = row["url"] + "?refetch"
        d["warc_ts"] = t0
        dupes.append(d)
    df = spark.createDataFrame(pd.DataFrame(base + dupes), schema=PAGES_SCHEMA)
    path = str(tmp_path / "dup_pages")
    df.repartition(4).write.parquet(path)

    out = dedup_pages_stream(read_pages_stream(spark, path))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from dedup_mem").collect()
    n_unique_html = len({bytes(r["html"]) for r in base})
    assert len(rows) == n_unique_html
    assert len({bytes(r["html"]) for r in rows}) == n_unique_html


def test_quality_extract_stream_matches_batch_gate(spark, tmp_path):
    """The streaming quality gate keeps exactly the pages the batch
    pipeline + gopher_keep_condition keeps (the corpus word lists contain
    no stopwords, so this fixture synthesizes pages that straddle the
    gate: quality prose with stopwords, a too-short page, a symbol-heavy
    page)."""
    from manga_translator_spark.operators.text_analysis import gopher_keep_condition
    from manga_translator_spark.plans.pipeline import extract
    from manga_translator_spark.streaming.extract_stream import quality_extract_stream

    quality = (
        "The archive of the harbor is a record that was kept for the town "
        "and it is read with care in the winter when the tide is low."
    )
    rows = [
        {"url": "q://good", "text": quality},
        {"url": "q://short", "text": "the end"},  # fails word-count rule
        {"url": "q://symbols", "text": ("the # " * 40).strip()},  # symbol rule
        {"url": "q://nostops", "text": "archive beacon cadence drift " * 10},
    ]
    import datetime as dt

    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    pages = pd.DataFrame(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [t0] * len(rows),
            "html": [
                f"<html><body><article><p>{r['text']}</p></article></body></html>".encode()
                for r in rows
            ],
            "text": [r["text"] for r in rows],
            "lang": ["en"] * len(rows),
        }
    )
    df = spark.createDataFrame(pages, schema=PAGES_SCHEMA)
    path = str(tmp_path / "q_pages")
    df.write.parquet(path)

    out = quality_extract_stream(read_pages_stream(spark, path))
    q = (
        out.writeStream.format("memory")
        .queryName("qext_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt_q"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got_urls = {r["url"] for r in spark.sql("select url from qext_mem").collect()}
    batch_kept = {
        r["url"]
        for r in extract(df)
        .filter(gopher_keep_condition("extracted_text"))
        .select("url")
        .collect()
    }
    assert got_urls == batch_kept == {"q://good"}


def test_gopher_keep_condition_equals_gopher_quality(spark, corpus_rows):
    """The single-expression keep condition and the flag-table operator
    agree row-for-row on the same text (shared constants, same rules)."""
    from pyspark.sql import functions as F

    from manga_translator_spark.operators.text_analysis import (
        gopher_keep_condition,
        gopher_quality,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(corpus_rows)),
                "text": [r["text"] for r in corpus_rows],
            }
        )
    )
    flags = {r["doc_id"]: r["keep"] for r in gopher_quality(docs).collect()}
    conds = {
        r["doc_id"]: int(r["k"])
        for r in docs.select("doc_id", gopher_keep_condition("text").alias("k")).collect()
    }
    assert flags == conds


def test_stream_job_cli_dedup(corpus_rows, tmp_path):
    """jobs/stream.py end-to-end in a subprocess (own session — the job
    stops its SparkSession, so it must not share pytest's): re-fetches are
    deduped, sink row count equals the unique page count."""
    import datetime as dt
    import json
    import os
    import subprocess
    import sys

    import pyspark.sql  # noqa: F401 — ensures pyspark importable for the child

    rows = [dict(r) for r in corpus_rows[:60]]
    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    for r in rows:
        r["warc_ts"] = t0
    dupes = []
    for r in rows[:10]:
        d = dict(r)
        d["url"] = r["url"] + "?re"
        dupes.append(d)
    import duckdb

    pdf = pd.DataFrame(rows + dupes)
    con = duckdb.connect()
    con.register("p", pdf)
    os.makedirs(tmp_path / "pages", exist_ok=True)
    con.execute(
        f"COPY (SELECT * FROM p) TO '{tmp_path / 'pages' / 'part0.parquet'}' (FORMAT PARQUET)"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "stream.py"),
         "--input", str(tmp_path / "pages"), "--out", str(tmp_path / "ext"),
         "--checkpoint", str(tmp_path / "ckpt"), "--dedup", "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-500:] + out.stderr[-1500:]
    res = json.loads(lines[-1])
    assert res["rows_in_sink"] == 60 and res["dedup"] is True


def test_routed_stream_matches_batch_router(spark, corpus_rows, tmp_path):
    """Streaming html/pdf routing == batch extract_any on the same mixed
    table (availableNow replay)."""
    import datetime as dt

    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.pdf_extract import extract_any
    from manga_translator_spark.streaming.extract_stream import routed_extract_stream

    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    rows = [dict(r) for r in corpus_rows[:30]]
    for r in rows:
        r["warc_ts"] = t0
    pdfs = [
        {
            "url": f"pdf://s/{i}",
            "warc_ts": t0,
            "html": make_pdf([(72, 600, 11, f"stream pdf {i}"), (72, 700, 14, f"S{i}")]),
            "text": "",
            "lang": "en",
        }
        for i in range(8)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows + pdfs), schema=PAGES_SCHEMA)
    path = str(tmp_path / "mixed_pages")
    df.repartition(2).write.parquet(path)

    out = routed_extract_stream(read_pages_stream(spark, path))
    q = (
        out.writeStream.format("memory")
        .queryName("routed_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt_routed"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["url"]: (r["extracted_text"], r["n_blocks"])
        for r in spark.sql("select * from routed_mem").collect()
    }
    exp = {
        r["url"]: (r["extracted_text"], r["n_blocks"])
        for r in extract_any(df).collect()
    }
    assert got == exp and len(got) == 38


def test_stream_job_cli_dedup_route_pdf(corpus_rows, tmp_path):
    """--dedup --route-pdf together take the foreachBatch path (routing a
    batch-pinned frame so the watermarked dedup state store is built ONCE,
    not once per router branch — r5 review): re-fetch dupes of both html
    and pdf pages collapse, and the routed sink matches batch extract_any
    over the unique set."""
    import datetime as dt
    import json
    import os
    import subprocess
    import sys

    import duckdb

    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.pdf_extract import extract_any

    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    rows = [dict(r) for r in corpus_rows[:30]]
    for r in rows:
        r["warc_ts"] = t0
    pdfs = [
        {
            "url": f"pdf://j/{i}",
            "warc_ts": t0,
            "html": make_pdf([(72, 600, 11, f"job pdf body {i} long enough."), (72, 700, 14, f"J{i}")]),
            "text": "",
            "lang": "en",
        }
        for i in range(6)
    ]
    dupes = []
    for r in rows[:8] + pdfs[:2]:
        d = dict(r)
        d["url"] = r["url"] + "?re"
        dupes.append(d)
    con = duckdb.connect()
    con.register("p", pd.DataFrame(rows + pdfs + dupes))
    os.makedirs(tmp_path / "pages", exist_ok=True)
    con.execute(
        f"COPY (SELECT * FROM p) TO '{tmp_path / 'pages' / 'part0.parquet'}' (FORMAT PARQUET)"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "stream.py"),
         "--input", str(tmp_path / "pages"), "--out", str(tmp_path / "ext"),
         "--checkpoint", str(tmp_path / "ckpt"), "--dedup", "--route-pdf",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-500:] + out.stderr[-1500:]
    res = json.loads(lines[-1])
    assert res["rows_in_sink"] == 36 and res["route_pdf"] is True


def test_stream_job_routed_sink_matches_batch(spark, corpus_rows, tmp_path):
    """The foreachBatch-routed sink's rows are value-identical to batch
    extract_any over the same unique pages (url -> extracted_text)."""
    import datetime as dt

    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.pdf_extract import extract_any
    from manga_translator_spark.streaming.extract_stream import write_epoch

    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    rows = [dict(r) for r in corpus_rows[:20]]
    for r in rows:
        r["warc_ts"] = t0
    pdfs = [
        {
            "url": f"pdf://m/{i}",
            "warc_ts": t0,
            "html": make_pdf([(72, 600, 11, f"match pdf body {i} ok here."), (72, 700, 14, f"M{i}")]),
            "text": "",
            "lang": "en",
        }
        for i in range(4)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows + pdfs), schema=PAGES_SCHEMA)
    routed = extract_any(df.localCheckpoint(eager=False))
    write_epoch(routed, 0, str(tmp_path / "sink"))
    got = {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    exp = {r["url"]: r["extracted_text"] for r in extract_any(df).collect()}
    assert got == exp and len(got) == 24


def test_stream_job_refuses_mixed_sink_layouts(tmp_path):
    """Rerunning a sink with flags that select the OTHER writer mode must
    fail fast (before Spark startup): epoch-partitioned foreachBatch
    output vs _spark_metadata-manifested file-sink output are
    incompatible layouts (r5 review)."""
    import os

    import pytest as _pytest

    from jobs.stream import main

    # epoch-partitioned sink, rerun WITHOUT dedup+route-pdf
    sink1 = tmp_path / "s1"
    os.makedirs(sink1 / "epoch=0")
    with _pytest.raises(SystemExit) as e:
        main(["--input", "x", "--out", str(sink1), "--checkpoint", "c"])
    assert e.value.code == 2
    # manifest sink, rerun WITH dedup+route-pdf
    sink2 = tmp_path / "s2"
    os.makedirs(sink2 / "_spark_metadata")
    with _pytest.raises(SystemExit) as e:
        main(["--input", "x", "--out", str(sink2), "--checkpoint", "c",
              "--dedup", "--route-pdf"])
    assert e.value.code == 2
