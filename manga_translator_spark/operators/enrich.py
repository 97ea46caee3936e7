"""Enrich stage: the translator-slot analogue.

The reference's Translator plugins transform recognized text batch-wise
(base core/plugin.py:174-188): PipeTranslator is identity
(translation/pipe.py:14-15), DebugTranslator a constant
(translation/debug.py:19-20), DeepL/OpenAI/HuggingFace call external models
(out of scope here: no network — SURVEY §2.2 T15).

v1 ships the deterministic members of the family as column-op strategies on
the assembled result; an external-model enricher would be a mapInPandas
stage shaped exactly like operators/recognize.py (batch in, positionally
aligned batch out, blank-compaction after — T16).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def enrich_pipe(df: "DataFrame") -> "DataFrame":
    """Identity (PipeTranslator analogue) — the default: extraction output
    stays byte-identical to the oracle."""
    return df


def make_enrich_debug(constant: str = "meow") -> Callable[["DataFrame"], "DataFrame"]:
    """DebugTranslator analogue: replace every non-empty extraction with a
    constant (the repo's 'Japanese => Meow' README example)."""

    def enrich(df: "DataFrame") -> "DataFrame":
        return df.withColumn(
            "extracted_text",
            F.when(F.length("extracted_text") > 0, F.lit(constant)).otherwise(
                F.col("extracted_text")
            ),
        )

    return enrich


def enrich_batched(df: "DataFrame") -> "DataFrame":
    """The external-model batching pattern (OpenAI translator analogue).

    The reference joins a batch of strings with ``<s>``, makes ONE model
    call, and splits the response back (translation/openai.py:59-73).
    Relationally that is: group -> ``concat_ws`` -> one call per group ->
    ``split`` -> posexplode, re-keyed by position within the group.  The
    "model" here is identity (no network), so output equals input — the
    test asserts exactly that, which proves the round-trip bookkeeping.
    """
    from pyspark.sql import functions as F

    # Separator collision handling: the reference splits the LLM response on
    # a bare '<s>' and corrupts any text containing it (openai.py:71-73).
    # We escape instead: ESC -> ESC+'E', SEP -> ESC+'S' before joining, and
    # invert after splitting — lossless for ALL inputs (probe-tested).
    sep, esc = "␞", "␛"
    enc = (
        f"replace(replace(x.extracted_text, '{esc}', '{esc}E'), '{sep}', '{esc}S')"
    )
    grouped = (
        df.withColumn("_grp", F.pmod(F.xxhash64("url"), F.lit(64)))
        .groupBy("_grp")
        .agg(
            F.array_sort(F.collect_list(F.struct("url", "extracted_text"))).alias("batch")
        )
        .withColumn("joined", F.expr(f"array_join(transform(batch, x -> {enc}), '{sep}')"))
        # one external call per group would happen here (mapInPandas);
        # identity model keeps the engine deterministic and offline
        .withColumn("response", F.col("joined"))
        .withColumn("parts", F.split("response", sep, -1))
    )
    exploded = grouped.select(
        F.posexplode("batch").alias("pos", "item"), F.col("parts")
    ).select(
        F.col("item.url").alias("url"),
        F.expr(
            f"replace(replace(element_at(parts, pos + 1), '{esc}S', '{sep}'), "
            f"'{esc}E', '{esc}')"
        ).alias("enriched_text"),
    )
    return df.join(exploded, "url", "left").withColumn(
        "extracted_text", F.coalesce("enriched_text", "extracted_text")
    ).drop("enriched_text")


ENRICHERS: dict[str, Callable[["DataFrame"], "DataFrame"]] = {
    "pipe": enrich_pipe,
    "debug": make_enrich_debug(),
    "batched": enrich_batched,
}
