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


def run_foreach_batch(
    spark: "SparkSession",
    in_path: str,
    out_path: str,
    checkpoint: str,
    config: PipelineConfig | None = None,
    max_files_per_trigger: int = 4,
) -> "StreamingQuery":
    """Micro-batch sink: each epoch appends its extraction output.

    foreachBatch gets the *batch* DataFrame, so the full batch plan —
    including the staged mode — is usable here; resume-on-restart comes
    from the streaming checkpoint instead of the lineage table.
    """
    stream = read_pages_stream(spark, in_path, max_files_per_trigger)

    def handle(batch_df: "DataFrame", epoch_id: int) -> None:
        out = extract(batch_df, config)
        out.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
