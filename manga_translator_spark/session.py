"""SparkSession factory with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "manga_translator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build a session.

    Defaults chosen for the engine's workload (and asserted on in the
    plan tests): AQE on (runtime coalesce + skew-join splitting), Arrow
    enabled with a bounded batch size so the parse/recognize UDFs see
    right-sized pandas chunks (the reference's batch_size analogue,
    cbz.py:44 — ours is rows-per-Arrow-batch, default 512).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cores = _core_count(master)
    shuffle_partitions = shuffle_partitions or max(cores, 1) * 2
    # Arrow batch size scales DOWN with executor width: at high widths the
    # single JVM feeding N Python workers becomes the bottleneck, and
    # smaller batches pipeline scan/serialize against parse far better
    # (measured, 160k pages: local[32] 2048->25-39k docs/s vs 768->52.6k,
    # +7% cost at local[8] — matches a real cluster where each executor has
    # few cores and its own JVM).  Override via SPARK_GRAFT_ARROW_BATCH.
    arrow_batch = int(
        os.environ.get("SPARK_GRAFT_ARROW_BATCH", "768" if cores >= 16 else "2048")
    )

    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        # local mode: the driver JVM hosts all executor threads — an
        # undersized heap turns Arrow batch churn into GC stalls that
        # flat-line UDF scaling (measured: detect stage 4.0s@8g -> 2.7s@48g
        # at local[32] on 40k pages)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # InferFiltersFromGenerate rewrites every explode(expensive_expr)
        # into Filter(size(expensive_expr)>0 AND isnotnull(expensive_expr))
        # + Generate — and the filter's predicate re-inlines the WHOLE
        # generator expression twice more per row (HOF exprs are
        # interpreted and get no subexpression elimination in FilterExec).
        # For this engine's explode-heavy operators the "pruning" filter
        # tripled the dominant tokenize/shingle/hash cost: token_surprise
        # ran the tokenizer fold 6x per doc instead of 2x (plans/r06/
        # token_surprise_before.txt nodes 2/8), decontaminate its w-gram
        # chain 3x per side.  The rows it prunes are exactly the rows
        # explode drops anyway, so removing the rule changes no result.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """addPyFile the engine package so executor Python workers can import
    it regardless of the driver's cwd/sys.path (same mechanism as
    scripts/submit.sh --py-files)."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="mts_pyfiles_")
    archive = shutil.make_archive(
        os.path.join(staging, "manga_translator_spark_pkg"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir="manga_translator_spark",
    )
    spark.sparkContext.addPyFile(archive)


def _core_count(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return 32
