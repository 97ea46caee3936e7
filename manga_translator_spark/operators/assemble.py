"""Assemble stage: ordered main-content text + character spans per url.

Drawer/composite analogue (reference drawing/horizontal.py:127-135 renders
per-section text; pipelines/image_to_image.py:157-163 groups sections by
``source_index`` and composites per frame).  Two physical strategies with
identical semantics:

* :func:`assemble_arrays` — DEFAULT.  Pure higher-order array functions on
  the per-page ``blocks`` column: filter MAIN -> ``array_join`` text ->
  ``aggregate`` running-offset spans.  **Zero shuffle**: because the detect
  stage already delivers all of a page's blocks in one row, fan-out/fan-in
  is unnecessary — at 100 TB this keeps extraction embarrassingly parallel
  (the whole parse->classify->clean->assemble chain is one narrow pipeline
  over the scan, no exchange in the plan).

* :func:`assemble_exploded` — literal transplant of the reference's
  explode/group-back shape (T9 posexplode, T18 groupBy, T19 running-sum
  window, T20 left join).  Kept for parity tests and as the template for
  stages that genuinely need per-block rows (the recognizer).  Costs two
  shuffles (window + groupBy, same key so Catalyst reuses the exchange) +
  a join.

Determinism: block order is ``block_idx`` (document order) — every concat
is preceded by an explicit sort, never by arrival order (SURVEY §4
"deterministic input ordering"; reference sorts filenames, cbz.py:39).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import CLS_MAIN
from manga_translator_spark.oracle import SEPARATOR

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

_SEP_LEN = len(SEPARATOR)

_SPANS_EXPR = f"""
aggregate(
  filter(blocks, b -> b.cls = {CLS_MAIN} AND length(b.text) > 0),
  named_struct(
    'off', CAST(0 AS BIGINT),
    'spans', CAST(array() AS ARRAY<STRUCT<block_idx: INT, start: BIGINT, end: BIGINT>>)),
  (acc, b) -> named_struct(
    'off', acc.off + length(b.text) + {_SEP_LEN},
    'spans', concat(acc.spans, array(named_struct(
      'block_idx', b.block_idx,
      'start', acc.off,
      'end', acc.off + CAST(length(b.text) AS BIGINT))))),
  acc -> acc.spans)
"""

_TEXT_EXPR = (
    f"array_join(transform(filter(blocks, b -> b.cls = {CLS_MAIN} "
    f"AND length(b.text) > 0), b -> b.text), '{SEPARATOR}')"
)


def assemble_arrays(classified: "DataFrame") -> "DataFrame":
    """(url, blocks, ...) -> (url, extracted_text, spans, n_blocks). No shuffle."""
    return (
        classified.withColumn("extracted_text", F.expr(_TEXT_EXPR))
        .withColumn("spans", F.expr(_SPANS_EXPR))
        .withColumn("n_blocks", F.size("spans"))
        .drop("blocks")
    )


def assemble_exploded(classified: "DataFrame") -> "DataFrame":
    """Reference-shaped fan-out/fan-in: explode -> window offsets ->
    group-back -> left join (preserves empty pages).  Semantically equal to
    :func:`assemble_arrays`; tests assert it."""
    urls = classified.select("url")
    sections = (
        classified.select("url", F.explode("blocks").alias("b"))  # T9 fan-out
        .filter((F.col("b.cls") == CLS_MAIN) & (F.length("b.text") > 0))  # T14
        .select("url", F.col("b.block_idx").alias("block_idx"), F.col("b.text").alias("text"))
    )
    w = W.partitionBy("url").orderBy("block_idx")
    sections = sections.withColumn(
        "start",
        F.coalesce(
            F.sum(F.length("text") + _SEP_LEN).over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    ).withColumn("end", (F.col("start") + F.length("text")).cast("long"))
    grouped = sections.groupBy("url").agg(  # T18 fan-in, ordered by key not arrival
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(block_idx, text))), x -> x.text)"),
            SEPARATOR,
        ).alias("extracted_text"),
        F.sort_array(F.collect_list(F.struct("block_idx", "start", "end"))).alias("spans"),
        F.count("*").cast("int").alias("n_blocks"),
    )
    return (  # T20 scatter-back: every input url yields an output row
        urls.join(grouped, "url", "left")
        .withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))
        .withColumn(
            "spans",
            F.coalesce(
                "spans",
                F.expr("CAST(array() AS ARRAY<STRUCT<block_idx: INT, start: BIGINT, end: BIGINT>>)"),
            ),
        )
        .withColumn("n_blocks", F.coalesce("n_blocks", F.lit(0)))
    )


def with_wrapped_lines(assembled: "DataFrame", wrap_width: int = 40) -> "DataFrame":
    """Optional drawer-style text flow per span (VERDICT r02 #5): each main
    span's text greedily wrapped at ``wrap_width`` unit cells — the
    wrap_text_pure transplant (reference utils.py:135-169, kernel + SQL
    fold in functions/wrap.py).

    Adds ``lines ARRAY<STRUCT<block_idx: INT, lines: ARRAY<STRING>>>``
    aligned with ``spans``; a span whose longest word exceeds the width
    carries NULL lines (the kernel's None/retry contract).  Pure codegen
    transform over the already-assembled columns: zero shuffle, fused- and
    staged-compatible, byte-identical to the Python kernel (tests assert).
    """
    from manga_translator_spark.functions.wrap import wrap_fold_spark, words_expr_spark

    span_text = "substring(extracted_text, CAST(s.start AS INT) + 1, CAST(s.end - s.start AS INT))"
    fold = wrap_fold_spark(words_expr_spark(span_text), wrap_width)
    return assembled.withColumn(
        "lines",
        F.expr(
            "transform(spans, s -> named_struct("
            f"'block_idx', s.block_idx, "
            f"'lines', split(({fold}).wrapped, char(10))))"
        ),
    )
