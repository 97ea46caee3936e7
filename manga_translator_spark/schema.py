"""Engine schemas (SURVEY.md §1, FIXTURES.md §1-§4).

The reference fixes its record shapes with Python classes
(DetectionResult core/plugin.py:231-235, FrameSection
pipelines/image_to_image.py:11-21, OcrResult plugin.py:145-148); we fix ours
with explicit StructTypes — never schema inference — so every stage boundary
is a typed contract Catalyst can prune through.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table — matches BASELINE.json input_hint exactly.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# One detected block: feature fields only — cls/score are added by the
# classify stage as column expressions (SURVEY §2.2 T4: decision rule in
# pure pyspark.sql.functions once features exist).
BLOCK_FEATURES = T.StructType(
    [
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
        T.StructField("n_links", T.IntegerType(), False),
        T.StructField("n_link_chars", T.IntegerType(), False),
        T.StructField("hint", T.BooleanType(), False),
        T.StructField("img_payload", T.BinaryType(), True),
    ]
)

# After classify: features + decision (DetectionResult analogue).
BLOCK_CLASSIFIED = T.StructType(
    BLOCK_FEATURES.fields
    + [
        T.StructField("cls", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# detect-stage output rows: input key columns + the block array.
def detected_schema(carry: list[T.StructField] | None = None) -> T.StructType:
    fields = [T.StructField("url", T.StringType(), False)]
    if carry:
        fields += carry
    fields.append(T.StructField("blocks", T.ArrayType(BLOCK_FEATURES), False))
    return T.StructType(fields)


SPAN_TYPE = T.StructType(
    [
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)

RECOGNIZED_TYPE = T.StructType(
    [
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

# Final output table (FIXTURES.md §2 golden_extracted shape).
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("recognized", T.ArrayType(RECOGNIZED_TYPE), False),
    ]
)

# Checkpoint/lineage table (north_rule resumability; FIXTURES.md §4).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        # Spark accumulators can double-count on task retries/speculation;
        # rows_in_exact=False flags an unreconciled accumulator-derived
        # count so integrity audits (rows_in vs rows_out, resume decisions)
        # never silently trust it (ADVICE r02).
        T.StructField("rows_in_exact", T.BooleanType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("stage_ms", T.MapType(T.StringType(), T.LongType()), True),
    ]
)
