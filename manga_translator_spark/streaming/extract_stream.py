"""Structured Streaming wrapper around the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.5: no watermarks, no state),
and the stage graph is stateless per record — so the streaming form is the
batch plan applied to a stream, exactly as the survey predicted
("a later foreachBatch wrapper is mechanical").  Two variants:

* :func:`extract_stream` — pure streaming DataFrame: readStream ->
  extract (all narrow transforms in fused mode, fully streaming-safe) ->
  caller attaches a writeStream sink.
* :func:`run_foreach_batch` — micro-batch loop writing parquet with the
  same sink layout as the batch job; gives exactly-once per epoch via the
  checkpointLocation, and is the shape a real ingest (WARC drops landing in
  object storage) would run at scale: file-source backpressure via
  ``maxFilesPerTrigger``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from manga_translator_spark.plans.pipeline import PipelineConfig, extract
from manga_translator_spark.schema import PAGES_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.streaming import StreamingQuery


def read_pages_stream(
    spark: "SparkSession", path: str, max_files_per_trigger: int = 4
) -> "DataFrame":
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(pages_stream: "DataFrame", config: PipelineConfig | None = None) -> "DataFrame":
    """Streaming extraction plan (narrow transforms only -> append mode).

    The fused mode has no aggregation, so it is legal in append output mode
    without watermarks; the staged mode's recognize group-back would need
    one, which is why the streaming path pins recognize into the fused UDF.
    """
    cfg = config or PipelineConfig()
    # any non-default slot silently selects the staged plan inside extract()
    # (joins/aggregations -> illegal in append mode without watermarks), so
    # reject every config that would leave the fused path
    if (
        cfg.mode != "fused"
        or not cfg.recognize
        or cfg.repair != "none"
        or cfg.cleaner != "strip"
        or cfg.assembler != "arrays"
    ):
        raise ValueError("streaming supports the fused pipeline mode only")
    return extract(pages_stream, cfg)


def host_rate_windowed(
    pages_stream: "DataFrame",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> "DataFrame":
    """Watermarked event-time windowed aggregation: pages per host per
    ``warc_ts`` window.

    The late-data contract: rows older than ``max(event time) - watermark``
    are dropped and their windows finalize — which is what makes the
    aggregation legal in append mode (a window emits exactly once, when the
    watermark passes its end).  This is the ingest-rate/skew monitor a
    crawl pipeline runs beside extraction.
    """
    from pyspark.sql import functions as F

    from manga_translator_spark.operators.host_stats import host_expr

    host = host_expr("url").alias("host")
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), host)
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "n_pages",
        )
    )


# output/state schemas for the stateful per-host counter
_HOST_STATE_OUT = "host string, n_pages bigint, n_batches int"
_HOST_STATE = "n_pages bigint, n_batches int"


def host_page_totals(pages_stream: "DataFrame") -> "DataFrame":
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-host page totals across micro-batches (update mode).

    The state (total pages, batches seen) lives in the state store and
    survives restarts via the checkpoint — the arbitrary-stateful-operator
    pattern (session trackers, per-key rate limiters) that windowed
    aggregation can't express.  Kernel is vectorized per Arrow batch.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from manga_translator_spark.operators.host_stats import host_expr

    host = host_expr("url").alias("host")
    keyed = pages_stream.select(host, "url")

    def update(key, pdfs, state):
        (host_val,) = key
        total, batches = state.get if state.exists else (0, 0)
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total += n
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame({"host": [host_val], "n_pages": [total], "n_batches": [batches]})

    return keyed.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=_HOST_STATE_OUT,
        stateStructType=_HOST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_epoch(out: "DataFrame", epoch_id: int, out_path: str) -> None:
    """Idempotent micro-batch write: the rows land in their own
    ``epoch=<id>`` partition under dynamic partition overwrite, so
    replaying an epoch re-overwrites exactly that partition and nothing
    else (idempotency is tested by double-writing the same epoch).
    Note the contract is same-epoch replay (what the streaming
    checkpoint guarantees on restart), not fresh-checkpoint reruns —
    those may batch the input differently."""
    from pyspark.sql import functions as F

    (
        out.withColumn("epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(out_path)
    )


def run_foreach_batch(
    spark: "SparkSession",
    in_path: str,
    out_path: str,
    checkpoint: str,
    config: PipelineConfig | None = None,
    max_files_per_trigger: int = 4,
) -> "StreamingQuery":
    """Micro-batch sink: each epoch writes its extraction output into its
    OWN ``epoch=<id>`` partition via dynamic partition overwrite.

    foreachBatch gets the *batch* DataFrame, so the full batch plan —
    including the staged mode — is usable here; resume-on-restart comes
    from the streaming checkpoint instead of the lineage table.

    The epoch-keyed overwrite is what makes the handler IDEMPOTENT — the
    precondition foreachBatch's exactly-once guarantee actually rests on
    (a plain append double-writes any epoch that is replayed after the
    sink write succeeded but before the checkpoint committed; r4
    review).  A replayed epoch re-overwrites only its own partition, so
    the sink converges to exactly-once under crash/retry.
    """
    stream = read_pages_stream(spark, in_path, max_files_per_trigger)

    def handle(batch_df: "DataFrame", epoch_id: int) -> None:
        write_epoch(extract(batch_df, config), epoch_id, out_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedup_pages_stream(
    pages_stream: "DataFrame", watermark: str = "30 minutes"
) -> "DataFrame":
    """Streaming exact dedup: keep the first page per html digest seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The state-store key is the 16-byte md5 digest, not the page — the same
    shuffle-the-digest design as the batch ``dedup_exact`` — and the
    watermark bounds state: a crawl's re-fetches cluster in time, so keys
    older than the horizon are evicted instead of accumulating forever
    (the property that keeps this runnable on an unbounded stream).
    Append-mode legal; emits the page columns unchanged.

    NULL html (a failed fetch, legal per PAGES_SCHEMA) gets a per-url
    sentinel key instead of md5(NULL): dropDuplicatesWithinWatermark
    treats NULL keys as equal, so a batch of DISTINCT failed-fetch rows
    would silently collapse to one (r5 review).  Re-fetch failures of
    the SAME url within the horizon still dedup to one row.
    """
    from pyspark.sql import functions as F

    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .withColumn(
            "digest",
            F.coalesce(
                F.md5(F.col("html")),
                F.concat(F.lit("null-html:"), F.col("url")),
            ),
        )
        .dropDuplicatesWithinWatermark(["digest"])
        .drop("digest")
    )


def quality_extract_stream(
    pages_stream: "DataFrame", config: PipelineConfig | None = None
) -> "DataFrame":
    """Streaming extraction gated by the Gopher quality rule: extract ->
    filter(gopher_keep_condition(extracted_text)).

    Both stages are narrow (fused UDF + one codegen predicate), so the
    composed plan stays append-mode legal with zero state — the in-flight
    form of the batch ``training_corpus`` quality gate.
    """
    from manga_translator_spark.operators.text_analysis import gopher_keep_condition

    return extract_stream(pages_stream, config).filter(
        gopher_keep_condition("extracted_text")
    )


def routed_extract_stream(
    pages_stream: "DataFrame", config: PipelineConfig | None = None
) -> "DataFrame":
    """Streaming html/pdf router: the batch ``extract_any`` applied to a
    stream.  Both branches are narrow (filter + mapInPandas) and the union
    of two append-legal streaming plans over the same source is itself
    append-legal — no state, no watermark needed."""
    from manga_translator_spark.operators.pdf_extract import (
        extract_pdfs,
        is_pdf_payload,
    )
    from manga_translator_spark.plans.pipeline import resolve_enricher
    from manga_translator_spark.schema import EXTRACTED_SCHEMA

    cfg = config or PipelineConfig()
    sniff = is_pdf_payload()
    html_rows = extract_stream(pages_stream.filter(~sniff), cfg)
    # same enricher on both branches as batch extract_any (r5 review);
    # every enricher is a narrow map, so the plan stays append-legal
    pdf_rows = resolve_enricher(cfg)(extract_pdfs(pages_stream.filter(sniff)))
    return html_rows.select(*EXTRACTED_SCHEMA.fieldNames()).unionByName(pdf_rows)
