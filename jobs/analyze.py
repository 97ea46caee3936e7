"""spark-submit entry point: run any training-data/relational operator
query over a tables directory and write the result as parquet.

Every entry in the driver contract (``__spark_entry__.queries()``) — dedup,
similarity search, text analysis, the relational coverage queries, the
flagship extraction — is runnable as a standalone job, so the engine's
operator surface is a user-facing CLI, not only a test harness:

    python jobs/analyze.py --list
    python jobs/analyze.py --op dedup_exact --tables /root/testdata/sf0.01 --out /tmp/dups
    spark-submit --py-files dist/manga_translator_spark.zip jobs/analyze.py \
        --op lsh_candidate_pairs --tables /data/tables --out /data/pairs

The tables directory must hold ``<name>.parquet`` files for the tables the
op reads (documents/embeddings/orders/... — the TESTDATA.md layout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from manga_translator_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    qs = entry_mod.queries()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--op", choices=sorted(qs), help="operator query to run")
    p.add_argument("--tables", help="directory of <table>.parquet inputs")
    p.add_argument("--out", help="output parquet path")
    p.add_argument("--master", default=None)
    p.add_argument("--list", action="store_true", help="list ops and exit")
    args = p.parse_args(argv)

    if args.list:
        for name in sorted(qs):
            print(name)
        return 0
    if not (args.op and args.tables and args.out):
        p.error("--op, --tables and --out are required (or --list)")

    spark = get_spark(app=f"analyze:{args.op}", master=args.master)
    try:
        t0 = time.monotonic()
        df = qs[args.op](spark, args.tables.rstrip("/"))
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"op": args.op, "rows": n, "wall_sec": round(time.monotonic() - t0, 2)}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
