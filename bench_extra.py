"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

bench.py is frozen for measurement; this file exists so the optimization
rounds can time an arbitrary subset of queries with the noop sink,
min-of-N interleaved, without paying for the full 65-workload suite per
iteration.  Numbers quoted in OPTIMIZATION_r*.md cite this file.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_ROUNDS        interleaved rounds per workload (default 3)
  BENCH_QUERIES       comma-separated query names (default: all except
                      extract_pipeline/stream_dedup_digests, like bench.py)

The canary protocol (BENCH/BASELINE.md "Measurement lesson"): pdf_extract
is always timed FIRST and its reading printed, so a steal-contaminated
window is visible in the artifact itself (quiet record ~0.46 s @ sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    want = os.environ.get("BENCH_QUERIES", "")

    import __spark_entry__ as entry_mod
    from manga_translator_spark.session import get_spark

    spark = get_spark(app="bench_extra", master=f"local[{cpus}]")
    qs = entry_mod.queries()
    excluded = ("extract_pipeline", "stream_dedup_digests")
    names = (
        [n.strip() for n in want.split(",") if n.strip()]
        if want
        else [n for n in qs if n not in excluded]
    )
    for n in names:
        assert n in qs, f"unknown query {n}"

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    # canary first (quiet-window check), then warm-up pass over the subset
    canary = run("pdf_extract")
    for n in names:
        run(n)

    best: dict[str, float] = {}
    for _ in range(rounds):
        for n in names:
            w = run(n)
            best[n] = min(best.get(n, float("inf")), w)

    timings = {n: round(w, 3) for n, w in best.items()}
    print(
        json.dumps(
            {
                "metric": "bench_extra_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "canary_pdf_extract": round(canary, 3),
                "sf_dir": sf_dir,
                "bench_rounds": rounds,
                "cpus": cpus,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
