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


ENRICHERS: dict[str, Callable[["DataFrame"], "DataFrame"]] = {
    "pipe": enrich_pipe,
    "debug": make_enrich_debug(),
}
