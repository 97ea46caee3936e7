"""Host-grain metrics with key salting — the skew story (SURVEY §4).

Web corpora are host-skewed (the synthetic corpus draws hosts from a
Zipf(s=1.3) law for exactly this reason — FIXTURES.md §1): a handful of
hosts own a large share of pages, so a plain ``groupBy(host)`` hashes a hot
key into one reducer task.  The salted two-phase aggregate bounds any
single task at ~1/salt of the hot key:

  phase 1: groupBy(host, salt = xxhash64(url) % S)  -> partial aggregates
  phase 2: groupBy(host)                            -> merge partials

Results are provably identical to the direct aggregate (tests assert it);
only the shuffle shape changes.  For *algebraic* aggregates Spark's own
map-side partial aggregation already does much of this — the salt matters
for holistic aggregates (collect_list/percentile) and for AQE-less
engines; it is exposed here as the explicit pattern the north_rule names.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def with_host(pages: "DataFrame", url_col: str = "url") -> "DataFrame":
    return pages.withColumn("host", host_expr(url_col))


def host_expr(url_col: str = "url") -> "F.Column":
    """The ONE host-grouping key (JVM parse_url HOST: case-robust, port
    stripped) — batch metrics AND the streaming monitors share it so
    their groupings can never drift (r4 review: a streaming regex
    re-implementation bucketed uppercase schemes under '')."""
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def host_metrics_salted(
    pages: "DataFrame", url_col: str = "url", n_salts: int = 16
) -> "DataFrame":
    """Pages/extractions per host + mean text length, salted two-phase."""
    length_col = (
        F.length("extracted_text")
        if "extracted_text" in pages.columns
        else F.length("text")
    )
    partial = (
        with_host(pages, url_col)
        .withColumn("salt", F.pmod(F.xxhash64(url_col), F.lit(n_salts)))
        .groupBy("host", "salt")
        .agg(
            F.count("*").alias("_n"),
            # _nn counts NON-NULL lengths: avg must divide by it, not by
            # the row count, or a host with NULL-text rows diverges from
            # host_metrics_direct's F.avg (r4 review); nullif keeps the
            # all-NULL host at NULL like avg (and ANSI-safe).
            F.count(length_col).alias("_nn"),
            F.sum(length_col.cast("long")).alias("_len"),
        )
    )
    return partial.groupBy("host").agg(
        F.sum("_n").alias("n_pages"),
        F.expr("sum(_len) / nullif(sum(_nn), 0)").alias("avg_len"),
    )


def host_metrics_direct(pages: "DataFrame", url_col: str = "url") -> "DataFrame":
    """The unsalted equivalent (semantics oracle for the salted path)."""
    length_col = (
        F.length("extracted_text")
        if "extracted_text" in pages.columns
        else F.length("text")
    )
    return (
        with_host(pages, url_col)
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(length_col.cast("long")).alias("avg_len"),
        )
    )


def salted_group_count(df: "DataFrame", key: str, unique_col: str, n_salts: int = 16) -> "DataFrame":
    """Generic salted count+sum two-phase aggregate on any skewed key."""
    partial = (
        df.withColumn("salt", F.pmod(F.xxhash64(unique_col), F.lit(n_salts)))
        .groupBy(key, "salt")
        .agg(F.count("*").alias("_n"))
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))
