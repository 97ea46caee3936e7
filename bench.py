"""Headline benchmark — one JSON line for the driver.

Runs (a) the flagship extraction pipeline over a parquet snapshot of the
deterministically seeded corpus — scan -> extract, the engine's workload
shape at 100 TB; corpus *generation* is staged once outside every clock —
and (b) the heavier operator queries from the driver contract at
$SPARK_GRAFT_SF_DIR.

Noise discipline (BENCH/BASELINE.md): this sandbox VM has heavy,
time-varying CPU steal — identical jobs swing up to 4x minutes apart — so
every timing here is the **min over BENCH_ROUNDS interleaved rounds**
(round-robin across all workloads, so a steal spike hits one round of many
workloads instead of every run of one), after a warm-up pass that spins up
the Python-worker pool and whole-stage codegen.  Min-of-N estimates
capability; the interleaving is the single-process analogue of
scripts/bench_scaling.py's ABBA protocol.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_PAGES         corpus size for the extraction leg (default 40000;
                      smaller sizes under-report docs/sec — fixed
                      scheduling/scan overhead dominates a sub-2s job)
  BENCH_ROUNDS        interleaved rounds per workload (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Every contract query except two, so a regression anywhere is visible.
# The list is DERIVED from queries() at run time (r4 review: a
# hand-maintained copy silently excluded newly added queries); only the
# exclusions are hand-maintained, with their reasons:
# - extract_pipeline: the extract_corpus leg times the same pipeline
#   over a pre-staged parquet scan (the 100 TB shape) without the
#   per-call page synthesis;
# - stream_dedup_digests: stages a temp parquet snapshot + checkpoint
#   dir inside the call — fixture I/O, not operator time.  Its operator
#   cost IS timed: the stream_dedup_drain leg below runs the same
#   availableNow drain over a pre-staged snapshot (VERDICT r4 ask #4).
EXCLUDED_QUERIES = ("extract_pipeline", "stream_dedup_digests")


def query_names(qs: dict) -> list:
    missing = [n for n in EXCLUDED_QUERIES if n not in qs]
    assert not missing, f"excluded names not in queries(): {missing}"
    return [n for n in qs if n not in EXCLUDED_QUERIES]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "40000"))
    # 5 rounds: session-N-style steal windows can contaminate every round
    # of a min-of-3; two extra rounds materially improve the min's chance
    # of landing in a quiet slice (~80 s total, still cheap)
    rounds = int(os.environ.get("BENCH_ROUNDS", "5"))

    import tempfile

    import __spark_entry__ as entry_mod
    from manga_translator_spark.operators.fused import create_stage_metrics
    from manga_translator_spark.plans.pipeline import PipelineConfig, extract
    from manga_translator_spark.session import get_spark
    from manga_translator_spark.sources.pages import corpus_df, read_pages

    spark = get_spark(app="bench", master=f"local[{cpus}]")
    qs = entry_mod.queries()
    names = query_names(qs)
    stage_acc = create_stage_metrics(spark)

    # stage the corpus to parquet ONCE, outside every clock: the engine's
    # workload at 100 TB is scan -> extract, and synthetic-page *generation*
    # costs ~4x the parse itself — timing it was measuring the fixture
    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    # try/finally: a single failing workload of 52 must not leak the
    # 40k-page staged corpus in /tmp or the live session (r4 review)
    try:
        pages_path = f"{tmp}/pages.parquet"
        corpus_df(spark, n_pages, partitions=cpus * 2).write.mode("overwrite").parquet(pages_path)

        def run_extract() -> int:
            return extract(read_pages(spark, pages_path), PipelineConfig(), metrics=stage_acc).count()

        def make_q(name: str):
            return lambda: qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        workloads: list[tuple[str, object]] = [("extract_corpus", run_extract)]
        workloads += [(n, make_q(n)) for n in names]

        # streaming leg (VERDICT r4 ask #4): wall-clock of the
        # watermarked-dedup availableNow micro-batch drain over the sf
        # corpus.  Input staging is outside every clock like the batch
        # corpus; each run gets a FRESH checkpoint dir so the drain
        # replays in full instead of no-opping on committed offsets.
        from itertools import count

        from manga_translator_spark.streaming.extract_stream import (
            dedup_pages_stream,
            read_pages_stream,
        )

        stream_path = f"{tmp}/stream_pages.parquet"
        entry_mod._stream_dedup_input(spark, sf_dir).write.mode("overwrite").parquet(
            stream_path
        )
        stream_ckpt = count()

        def run_stream_dedup() -> None:
            q = (
                dedup_pages_stream(read_pages_stream(spark, stream_path))
                .writeStream.format("noop")
                .option("checkpointLocation", f"{tmp}/stream_ckpt_{next(stream_ckpt)}")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise TimeoutError("stream_dedup drain timed out")

        workloads.append(("stream_dedup_drain", run_stream_dedup))

        # warm-up: python-worker pool, codegen compile, parquet footer cache
        extract(read_pages(spark, pages_path).sample(0.1, seed=1), PipelineConfig()).count()
        for _, fn in workloads[1:]:
            fn()

        best: dict[str, float] = {}
        stage_best: dict[str, int] = {}
        for _ in range(rounds):
            for name, fn in workloads:
                snap = {k: int(v.value) for k, v in stage_acc.items()}
                t0 = time.monotonic()
                out = fn()
                wall = time.monotonic() - t0
                if name == "extract_corpus":
                    assert out == n_pages, f"pass-through violated: {out} != {n_pages}"
                    if wall < best.get(name, float("inf")):
                        stage_best = {
                            k: int(v.value) - snap[k] for k, v in stage_acc.items()
                        }
                best[name] = min(best.get(name, float("inf")), wall)

        timings = {name: round(w, 3) for name, w in best.items()}
        total = round(sum(timings.values()), 3)
        docs_per_sec = round(n_pages / best["extract_corpus"], 1)
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(
            json.dumps(
                {
                    "metric": "total_bench_sec",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "extract_docs_per_sec": docs_per_sec,
                    "extract_pages": n_pages,
                    "extract_stage_ms": stage_best,
                    "bench_rounds": rounds,
                    "estimator": "min-of-rounds, interleaved",
                    "cpus": cpus,
                }
            )
        )
        return 0
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
