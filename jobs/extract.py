"""spark-submit entry point: extract main content from a pages table.

CLI analogue of the reference's cli/main.py:31-107 (args -> config ->
pipeline -> batched read/process/write loop), rebuilt as a bucketed,
resumable Spark job (north_rule: spark-submit --py-files launch, explicit
partitioning, per-partition lineage + resume).

Examples
--------
# extract a parquet pages table, 64 buckets, resumable:
spark-submit --py-files dist/manga_translator_spark.zip jobs/extract.py \
    --input /data/pages --out /data/extracted --lineage /data/lineage

# generate the seeded corpus on the fly (bench/smoke):
python jobs/extract.py --n-pages 10000 --out /tmp/x --lineage /tmp/x_lineage
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python jobs/extract.py` from a repo checkout (spark-submit ships the
# package via --py-files instead; scripts/submit.sh)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from manga_translator_spark.plans.pipeline import PipelineConfig
from manga_translator_spark.session import get_spark
from manga_translator_spark.sources.lineage import run_extraction
from manga_translator_spark.sources.pages import corpus_df, read_pages


def _pdf_router():
    from manga_translator_spark.operators.pdf_extract import extract_any

    return extract_any


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    p.add_argument("--n-pages", type=int, help="generate the seeded corpus instead of reading --input")
    p.add_argument("--out", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--master", default=None, help="override spark master (default: env/local[32])")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--buckets-per-job", type=int, default=8)
    p.add_argument("--cleaner", default="strip")
    p.add_argument("--assembler", default="arrays")
    p.add_argument("--enricher", default="pipe")
    p.add_argument("--repair", default="none", help="gray-zone repair model (none|model)")
    p.add_argument("--prev", help="previous crawl snapshot (pages parquet) or a "
                   "(url, digest) manifest: pages with an identical digest "
                   "there are skipped (content-level incremental crawl)")
    p.add_argument("--route-pdf", action="store_true",
                   help="route %%PDF- payloads through the PDF layout kernel "
                        "(mixed html/pdf tables)")
    p.add_argument("--no-recognize", action="store_true")
    p.add_argument(
        "--until",
        choices=["detect", "classify", "repair", "clean", "assemble", "recognize"],
        help="stop after this stage and write the intermediate table "
        "(prefix-composability: the reference UI's /clean endpoint analogue)",
    )
    p.add_argument("--config", help="YAML pipeline config (overrides the stage flags)")
    args = p.parse_args(argv)
    if not args.input and not args.n_pages:
        p.error("one of --input / --n-pages is required")

    cfg = (
        PipelineConfig.from_yaml(args.config)
        if args.config
        else PipelineConfig(
            cleaner=args.cleaner,
            assembler=args.assembler,
            enricher=args.enricher,
            repair=args.repair,
            recognize=not args.no_recognize,
        )
    )

    spark = get_spark(app="extract", master=args.master)
    try:
        pages = (
            read_pages(spark, args.input)
            if args.input
            else corpus_df(spark, args.n_pages)
        )
        if args.prev:
            prev_df = spark.read.parquet(args.prev)
            prev = (
                prev_df.select("url", F.md5("html").alias("digest"))
                if "html" in prev_df.columns
                else prev_df.select("url", "digest")
            )
            cur = pages.withColumn("digest", F.md5("html"))
            pages = cur.join(prev, ["url", "digest"], "left_anti").drop("digest")
        if args.until and args.route_pdf:
            p.error(
                "--route-pdf is not supported with --until: staged-prefix "
                "debugging runs the HTML pipeline only (the router would be "
                "silently bypassed)"
            )
        if args.until:
            from manga_translator_spark.plans.pipeline import extract

            t0 = time.monotonic()
            df = extract(pages, cfg, until=args.until)
            if "blocks" in df.columns:
                df = df.withColumn("n_blocks", F.size("blocks"))
            df.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            wall = time.monotonic() - t0
            print(json.dumps({"until": args.until, "rows": n, "wall_sec": round(wall, 2)}))
            return 0
        t0 = time.monotonic()
        run_id = run_extraction(
            spark,
            pages,
            args.out,
            args.lineage,
            config=cfg,
            n_buckets=args.n_buckets,
            buckets_per_job=args.buckets_per_job,
            transform=_pdf_router() if args.route_pdf else None,
        )
        wall = time.monotonic() - t0
        # throughput over THIS run's lineage rows, not the whole sink — a
        # resumed run that processed 1 of 32 buckets would otherwise
        # report ~32x its true docs_per_sec (r5 review); rows_total keeps
        # the full-table count for sink-level sanity checks
        run_rows = (
            spark.read.parquet(args.lineage)
            .filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .agg(F.sum("rows_out"))
            .first()[0]
            or 0
        )
        n_total = spark.read.parquet(args.out).count()
        print(json.dumps({
            "run_id": run_id,
            "rows": int(run_rows),
            "rows_total": n_total,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(run_rows / wall, 1),
        }))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
