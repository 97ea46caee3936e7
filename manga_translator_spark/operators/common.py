"""Shared physical helpers for operators."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def spread(df: "DataFrame", min_factor: int = 1) -> "DataFrame":
    """Repartition a small-file scan up to the cluster's parallelism.

    Heavy per-row compute (minhash, simhash, language-ID) over a table that
    arrives as one or two parquet files otherwise runs on one core — the
    classic small-input/expensive-map shape.  At 100 TB inputs are already
    wide and this is a no-op; the check costs one partition-count lookup.
    The round-robin shuffle moves only the small input once, and is repaid
    ~parallelism-fold by the map stage.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
