"""Multimodal column operators: opaque binary media + typed metadata.

A 100 TB training-data pipeline treats image/audio/video as opaque
``binary`` columns with typed metadata alongside, and runs decode /
feature-extract / resize / frame-sample as vectorized Pandas stages over
``mapInPandas``.  The engine's media source is the embedded-image blocks
the detector already fans out (reference analogue: cropped patches,
pipelines/image_to_image.py:61-71), so these operators compose directly
after ``detect``/``classify``.

What is REAL here: the Spark-side plumbing — schemas, explode shape,
Arrow batch handling, per-worker kernel reuse — plus an actual PNG
container decode (IHDR header fields from the real byte layout).  What is
STUBBED (this sandbox ships no imaging/audio/video libraries): pixel
decode, resampling, and frame extraction — ``resize_images`` and
``sample_frames`` raise ``NotImplementedError`` documenting the exact
drop-in (Pillow/opencv/pyav call per Arrow batch), and the feature
extractor is a clearly-marked deterministic fake (md5-seeded vector) whose
replacement is one ``session.run`` per batch.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import functions as F

from manga_translator_spark.functions.blocks import CLS_EMBEDDED_IMG

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

META_SCHEMA = (
    "url string, block_idx int, n_bytes bigint, is_png boolean, "
    "width int, height int, bit_depth int, color_type int"
)

EMBED_DIM = 16
EMBED_SCHEMA = "url string, block_idx int, embedding array<float>"


def media_blocks(classified: "DataFrame") -> "DataFrame":
    """Fan out the embedded-media blocks: (url, block_idx, payload).

    Narrow explode + filter — only media rows cross into the Python stages
    below (patch-based processing, lama.py:45 analogue)."""
    return (
        classified.select("url", F.explode("blocks").alias("b"))
        .filter(F.col("b.cls") == CLS_EMBEDDED_IMG)
        .select(
            "url",
            F.col("b.block_idx").alias("block_idx"),
            F.col("b.img_payload").alias("payload"),
        )
    )


def png_meta(payload: bytes | None) -> dict:
    """REAL container decode: PNG IHDR fields from the actual byte layout
    (width/height/bit depth/color type), defensively for non-PNG bytes.
    Shared by the Spark stage and tests (byte-identity discipline)."""
    out = {
        "n_bytes": 0 if payload is None else len(payload),
        "is_png": False,
        "width": None,
        "height": None,
        "bit_depth": None,
        "color_type": None,
    }
    if not payload:
        return out
    data = bytes(payload)
    if not data.startswith(_PNG_SIG) or len(data) < len(_PNG_SIG) + 8 + 13:
        return out
    if data[len(_PNG_SIG) + 4 : len(_PNG_SIG) + 8] != b"IHDR":
        return out
    w, h, bit_depth, color_type = struct.unpack(
        ">IIBB", data[len(_PNG_SIG) + 8 : len(_PNG_SIG) + 18]
    )
    out.update(is_png=True, width=w, height=h, bit_depth=bit_depth, color_type=color_type)
    return out


def with_media_meta(media: "DataFrame") -> "DataFrame":
    """(url, block_idx, payload) -> typed per-media metadata row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [png_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "block_idx": pdf["block_idx"],
                    **{k: [m[k] for m in metas] for k in
                       ("n_bytes", "is_png", "width", "height", "bit_depth", "color_type")},
                }
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def fake_embed_kernel(payload: bytes | None, dim: int = EMBED_DIM) -> list[float]:
    """DETERMINISTIC FAKE feature extractor (no imaging libs in sandbox):
    md5 of the bytes expanded to ``dim`` floats in [-1, 1).  A real model
    replaces this with one batched forward pass per Arrow chunk (singleton
    session per worker, recognize.py pattern) — the schema, batch shape and
    downstream similarity operators (operators/similarity.py) are unchanged.
    """
    if not payload:
        return [0.0] * dim
    vals: list[float] = []
    counter = 0
    data = bytes(payload)
    while len(vals) < dim:
        h = hashlib.md5(data + counter.to_bytes(4, "big")).digest()
        vals.extend(int.from_bytes(h[i : i + 4], "big") / 2**31 - 1.0 for i in (0, 4, 8, 12))
        counter += 1
    return vals[:dim]


def with_media_embedding(media: "DataFrame", dim: int = EMBED_DIM) -> "DataFrame":
    """(url, block_idx, payload) -> fixed-dim media embedding column,
    feeding the ANN/near-dup operators directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "block_idx": pdf["block_idx"],
                    "embedding": [fake_embed_kernel(p, dim) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=EMBED_SCHEMA)


def resize_images(media: "DataFrame", width: int, height: int) -> "DataFrame":
    """STUB — pixel resampling needs an imaging library absent from this
    sandbox.  Drop-in: a mapInPandas stage of the exact shape of
    :func:`with_media_meta` whose kernel is
    ``Image.open(io.BytesIO(p)).resize((width, height)).tobytes()`` (or the
    cv2 equivalent) per payload, one batch per Arrow chunk, output schema
    ``url string, block_idx int, payload binary``."""
    raise NotImplementedError("no imaging library in this environment; see docstring for the drop-in")


def sample_frames(media: "DataFrame", every_n: int = 24) -> "DataFrame":
    """STUB — video frame sampling needs a decoder (pyav/ffmpeg) absent
    from this sandbox.  Drop-in: mapInPandas kernel decoding each payload,
    emitting one row per sampled frame with output schema
    ``url string, block_idx int, frame_idx int, payload binary`` (a fan-OUT
    stage: yield multiple rows per input row, still one decode per
    payload)."""
    raise NotImplementedError("no video decoder in this environment; see docstring for the drop-in")
