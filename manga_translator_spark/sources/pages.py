"""Pages source/sink helpers (SURVEY §2.1).

Reference I/O is file-per-record images + zip archives with explicit
filename sorting for determinism (cbz.py:26-41, sort at :39).  Ours is
columnar: parquet (Iceberg-shaped — the sandbox has no Iceberg catalog, but
every writer goes through one chokepoint so swapping ``writeTo(table)`` in
is mechanical), partitioned/hash-bucketed on ``url``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import functions as F

from manga_translator_spark.corpus import SEED, generate_page
from manga_translator_spark.schema import PAGES_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def read_pages(spark: "SparkSession", path: str) -> "DataFrame":
    """Typed scan of a pages table; schema pinned, never inferred."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def corpus_df(spark: "SparkSession", n_pages: int, seed: int = SEED, partitions: int = 32) -> "DataFrame":
    """Distributed deterministic corpus: ``spark.range`` -> mapInPandas.

    Row content depends only on (seed, page_id), so any partitioning of the
    id range yields the same table — generation scales to bench sizes
    without a driver bottleneck.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [generate_page(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_pages, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def with_bucket(df: "DataFrame", n_buckets: int) -> "DataFrame":
    """Stable url-hash bucket column — unit of checkpoint/resume and of the
    explicit repartitioning the north_rule requires."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def write_extracted(df: "DataFrame", path: str, partition_by: str | None = "bucket") -> None:
    """Sink chokepoint (S6 analogue).  ``sortWithinPartitions`` keeps output
    files deterministic given a fixed partitioning (reference sorts
    filenames for the same reason, cbz.py:39)."""
    writer = df.sortWithinPartitions("url").write.mode("overwrite")
    if partition_by and partition_by in df.columns:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)
