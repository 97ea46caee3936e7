"""Metadata stage slot — the ColorDetector analogue (T21).

The reference wires a ColorDetector plugin that returns a constant black
color per frame and is never called in the main path (core/plugin.py:
215-229, wired at pipelines/image_to_image.py:39) — an extension point
more than a stage.  Ours keeps the slot but makes it useful: cheap per-page
metadata columns computed without touching the block pipeline.

``with_charset`` is the non-stub member: the sniffed charset of the raw
bytes (the color-space discipline analogue).  ``with_constant`` is the
faithful constant stub.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# mirrors normalize.decode_html's sniff, as a pure column expression so the
# scan stays pruned and codegen'd (no Python); (?i) matches the kernel
# regex's re.IGNORECASE so '<META CHARSET=...>' sniffs identically here.
_CHARSET_PATTERN = "(?i)<meta[^>]+charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_\\-]+)"


def with_charset(pages: "DataFrame") -> "DataFrame":
    """Declared-charset metadata column from the first KiB of html."""
    head = F.decode(F.substring(F.col("html"), 1, 1024), "ISO-8859-1")
    sniffed = F.lower(F.regexp_extract(head, _CHARSET_PATTERN, 1))
    return pages.withColumn(
        "charset",
        F.when(F.col("html").isNull(), F.lit(None).cast("string")).otherwise(
            F.when(sniffed == "", F.lit("utf-8")).otherwise(sniffed)
        ),
    )


def with_constant(pages: "DataFrame", name: str = "meta", value: str = "") -> "DataFrame":
    """Faithful ColorDetector stub: a lit() constant column (plugin.py:228
    returns constant [0,0,0])."""
    return pages.withColumn(name, F.lit(value))
