"""Salted two-phase aggregation: identical results to the direct group-by
over the Zipf-skewed corpus hosts (FIXTURES.md §1: s=1.3 over 50 hosts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from manga_translator_spark.operators.host_stats import (
    host_metrics_direct,
    host_metrics_salted,
    salted_group_count,
    with_host,
)


def test_hosts_are_skewed(pages_df):
    counts = [r["n_pages"] for r in host_metrics_direct(pages_df).collect()]
    assert max(counts) > 5 * (sum(counts) / len(counts))  # Zipf head


def test_salted_equals_direct(pages_df):
    a = host_metrics_salted(pages_df).withColumn("avg_len", F.round("avg_len", 9))
    b = host_metrics_direct(pages_df).withColumn("avg_len", F.round("avg_len", 9))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_generic_count(pages_df):
    with_h = with_host(pages_df)
    a = {r["host"]: r["n"] for r in salted_group_count(with_h, "host", "url").collect()}
    b = {r["host"]: r["n_pages"] for r in host_metrics_direct(pages_df).collect()}
    assert a == b
