"""spark-submit entry point: streaming extraction over a growing pages dir.

The in-flight form of jobs/extract.py: watch a parquet directory of pages,
optionally dedup re-fetches (watermarked digest state) and gate on the
Gopher quality rules, extract, and append to a parquet sink.  Restart
resumes from the streaming checkpoint — the streaming analogue of the
batch job's lineage-table resume (reference cli/main.py:31-107 runs the
same pipeline as one-shot batches; a crawl pipeline runs it forever).

Examples
--------
# drain everything currently in --input, then exit (availableNow):
python jobs/stream.py --input /data/pages --out /data/extracted \
    --checkpoint /data/ckpt --dedup --quality

# stay up and follow the directory (continuous micro-batches):
python jobs/stream.py --input /data/pages --out /data/extracted \
    --checkpoint /data/ckpt --follow
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manga_translator_spark.plans.pipeline import PipelineConfig
from manga_translator_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages parquet dir (watched)")
    p.add_argument("--out", required=True, help="append-mode parquet sink dir")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--master", default=None)
    p.add_argument("--dedup", action="store_true",
                   help="drop re-fetched pages within the watermark horizon")
    p.add_argument("--watermark", default="30 minutes",
                   help="digest-state eviction horizon (with --dedup)")
    p.add_argument("--quality", action="store_true",
                   help="keep only pages passing the Gopher rules")
    p.add_argument("--route-pdf", action="store_true",
                   help="route %%PDF- payloads through the PDF layout kernel")
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument("--follow", action="store_true",
                   help="keep running on new files instead of draining once")
    p.add_argument("--timeout-sec", type=int, default=0,
                   help="with --follow: stop after this many seconds (0 = forever)")
    args = p.parse_args(argv)

    # the two writer modes produce INCOMPATIBLE sink layouts: foreachBatch
    # (dedup+route_pdf) writes epoch=N-partitioned dynamic-overwrite
    # parquet, the streaming file sink writes flat files tracked by a
    # _spark_metadata manifest (which readers PREFER — mixing the two
    # makes foreachBatch files invisible or the schema inconsistent).
    # Refuse to reuse a sink created by the other mode (r5 review).
    wants_epoch = bool(args.route_pdf and args.dedup)
    if os.path.isdir(args.out):
        entries = os.listdir(args.out)
        has_epoch = any(e.startswith("epoch=") for e in entries)
        has_manifest = "_spark_metadata" in entries
        if (has_epoch and not wants_epoch) or (has_manifest and wants_epoch):
            p.error(
                f"sink {args.out} was written by the "
                f"{'foreachBatch (epoch-partitioned)' if has_epoch else 'streaming file'} "
                "sink; rerunning with these flags would mix incompatible "
                "layouts — use a fresh --out"
            )

    spark = get_spark(app="stream_extract", master=args.master)
    from manga_translator_spark.operators.text_analysis import gopher_keep_condition
    from manga_translator_spark.streaming.extract_stream import (
        dedup_pages_stream,
        extract_stream,
        read_pages_stream,
        routed_extract_stream,
    )

    stream = read_pages_stream(spark, args.input, args.max_files_per_trigger)
    if args.dedup:
        stream = dedup_pages_stream(stream, args.watermark)

    if args.route_pdf and args.dedup:
        # route inside foreachBatch: extract_any's two branch filters
        # re-execute their input, which in a streaming plan instantiates
        # the watermarked dedup state store TWICE — double state-store
        # memory, double checkpoint, a second source pass per micro-batch
        # (r5 review).  foreachBatch hands the already-deduped batch; pin
        # it once and route it as a batch plan.  The epoch-keyed dynamic
        # overwrite keeps the sink exactly-once under replay.
        from manga_translator_spark.operators.pdf_extract import extract_any
        from manga_translator_spark.streaming.extract_stream import write_epoch

        def handle(batch_df, epoch_id):
            routed = extract_any(batch_df.localCheckpoint(eager=False), PipelineConfig())
            if args.quality:
                routed = routed.filter(gopher_keep_condition("extracted_text"))
            write_epoch(routed, epoch_id, args.out)

        writer = stream.writeStream.foreachBatch(handle).option(
            "checkpointLocation", args.checkpoint
        )
    else:
        extractor = routed_extract_stream if args.route_pdf else extract_stream
        out = extractor(stream, PipelineConfig())
        if args.quality:
            out = out.filter(gopher_keep_condition("extracted_text"))
        writer = (
            out.writeStream.format("parquet")
            .option("path", args.out)
            .option("checkpointLocation", args.checkpoint)
            .outputMode("append")
        )
    if not args.follow:
        writer = writer.trigger(availableNow=True)
    # clock spans start()..drain only: starting it after start() skipped
    # the checkpoint/source-listing setup, and reading it inside print()
    # billed the post-drain sink count to the drain (r5 review)
    t0 = time.time()
    q = writer.start()
    if args.follow and args.timeout_sec:
        q.awaitTermination(args.timeout_sec)
        q.stop()
        q.awaitTermination()
    else:
        q.awaitTermination()
    wall = time.time() - t0
    try:
        n_rows = spark.read.parquet(args.out).count()
    except Exception:
        # zero micro-batches committed (empty input dir, or every row
        # filtered before the first commit): the sink path was never
        # created — report 0 instead of crashing a successful drain
        n_rows = 0
    print(json.dumps({
        "sink": args.out,
        "rows_in_sink": n_rows,
        "wall_sec": round(wall, 3),
        "dedup": bool(args.dedup),
        "quality": bool(args.quality),
        "route_pdf": bool(args.route_pdf),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
