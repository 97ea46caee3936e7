"""Clean stage: boilerplate removal — the cleaner plugin family.

The reference ships interchangeable cleaners behind one interface
(cleaning/get.py:6-11): AllWhiteCleaner (blank the masked region,
all_white_cleaner.py:11-19), OpenCvCleaner (inpaint, opencv.py:13-22),
LaMa/DeepFillV2 (model-based patch inpainting, lama.py:145-168).  Ours are
strategies over the classified ``blocks`` array, all pure higher-order
column functions (zero Python, zero shuffle):

* ``strip``  — drop boilerplate blocks entirely (AllWhite analogue: the
  masked region ceases to exist).
* ``mask``   — keep block structure, blank boilerplate text (closer to the
  inpaint cleaners: geometry preserved, content removed).
* ``noop``   — identity (base Cleaner contract: return copies,
  core/plugin.py:279-286).

A model-based cleaner (LaMa analogue) would slot in as a mapInPandas stage
over the *boilerplate patches only* (reference processes masked patches, not
whole frames — lama.py:45); out of scope while the sandbox has no runtime.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import CLS_BOILERPLATE

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def clean_strip(df: "DataFrame") -> "DataFrame":
    return df.withColumn(
        "blocks", F.expr(f"filter(blocks, b -> b.cls != {CLS_BOILERPLATE})")
    )


def clean_mask(df: "DataFrame") -> "DataFrame":
    return df.withColumn(
        "blocks",
        F.expr(
            f"""transform(blocks, b -> named_struct(
              'block_idx', b.block_idx, 'tag', b.tag, 'depth', b.depth,
              'text', CASE WHEN b.cls = {CLS_BOILERPLATE} THEN '' ELSE b.text END,
              'n_chars', b.n_chars, 'n_links', b.n_links,
              'n_link_chars', b.n_link_chars, 'hint', b.hint,
              'img_payload', b.img_payload, 'cls', b.cls, 'score', b.score))"""
        ),
    )


def clean_noop(df: "DataFrame") -> "DataFrame":
    return df


# name -> strategy; the plugin-registry analogue (cleaning/get.py:6-11).
CLEANERS: dict[str, Callable[["DataFrame"], "DataFrame"]] = {
    "strip": clean_strip,
    "mask": clean_mask,
    "noop": clean_noop,
}
