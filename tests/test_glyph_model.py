"""Numpy glyph model: real batched tensor inference through the OCR path.

Proves the three properties the reference's model stages rely on
(VERDICT r02 ask #2): (1) recognition is real tensor math (matmul+argmax
over committed .npz weights) and exact over the whole alphabet; (2) batches
are grouped BY SHAPE with one model call per group (the reference's own
TODO, cleaning/lama.py:120); (3) the model loads once per worker
(per-worker singleton, detection/yolo.py:11 / ocr/manga_ocr.py:24-27).
"""

import numpy as np
import pytest

from manga_translator_spark.corpus import generate_corpus, make_png
from manga_translator_spark.functions import glyph_model
from manga_translator_spark.functions.blocks import CLS_EMBEDDED_IMG, extract_blocks
from manga_translator_spark.functions.glyph_model import (
    GlyphRecognizer,
    build_alphabet,
    decode_png_gray,
    glyph_bitmap,
    render_text,
)
from manga_translator_spark.functions.recognize_kernel import (
    decode_png_text,
    post_process_ocr,
    recognize_batch,
)


def test_alphabet_glyphs_distinct_and_roundtrip_exact():
    alphabet = build_alphabet()
    assert len(alphabet) == len(set(alphabet)) >= 95
    bitmaps = {glyph_bitmap(c).tobytes() for c in alphabet}
    assert len(bitmaps) == len(alphabet)  # distinctness => provable argmax
    model = GlyphRecognizer()
    out = model.infer_arrays([render_text(c) for c in alphabet])
    assert out == list(alphabet)


def test_multichar_strings_roundtrip_through_png_pixels():
    model = GlyphRecognizer()
    texts = [
        "imgtext 42 7 0 ember dune iris",
        "Straße am Fluss",
        "海 山 川 空",
        "mixed 123 ÄSCII? no: ügly",
    ]
    expected = [
        "".join(c if c in set(build_alphabet()) else "?" for c in t) for t in texts
    ]
    imgs = [decode_png_gray(make_png(t)) for t in texts]
    assert all(img is not None for img in imgs)
    assert model.infer_arrays(imgs) == expected


def test_same_shape_batch_grouping_one_matmul_per_group():
    model = GlyphRecognizer()
    # widths: 3,3,5,5,5,1 chars -> 3 distinct shapes
    texts = ["abc", "xyz", "hello", "world", "abcde", "k"]
    out = model.infer_arrays([render_text(t) for t in texts])
    assert out == texts  # positional alignment across groups
    assert model.matmul_calls == 3  # lama.py:120 TODO: size-based grouping
    # None and undecodable shapes pass through as None, no extra calls
    out2 = model.infer_arrays([None, render_text("ab"), np.zeros((3, 3), np.uint8)])
    assert out2 == [None, "ab", None]
    assert model.matmul_calls == 4


def test_per_worker_singleton_loads_once():
    glyph_model._MODEL = None
    glyph_model.LOAD_COUNT = 0
    recognize_batch([make_png("one")])
    recognize_batch([make_png("two"), make_png("three")])
    assert glyph_model.LOAD_COUNT == 1
    assert glyph_model.get_glyph_model() is glyph_model.get_glyph_model()


def test_pixel_inference_matches_text_chunk_over_corpus():
    """Cross-check: the numpy model's pixel-decoded text equals the tEXt
    chunk for every embedded image in the corpus — so the recognize stage
    produces identical output through the model path and the stub path."""
    model = GlyphRecognizer()
    payloads = [
        b.img_payload
        for row in generate_corpus(300)
        for b in extract_blocks(row["html"])
        if b.cls == CLS_EMBEDDED_IMG
    ]
    assert len(payloads) > 50
    pixel_texts = model.infer_arrays([decode_png_gray(p) for p in payloads])
    for p, t in zip(payloads, pixel_texts):
        assert t is not None and t == decode_png_text(p)


def test_recognize_batch_falls_back_for_unknown_layout():
    # RGB PNG (not our grayscale layout): pixel decode returns None and the
    # tEXt stub answers; non-PNG bytes give ""
    import struct as _s
    import zlib as _z

    from manga_translator_spark.corpus import _png_chunk

    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = b"\x00" + b"\x01" * 6 + b"\x00" + b"\x02" * 6
    rgb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", b"Description\x00legacy rgb")
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_gray(rgb) is None
    assert recognize_batch([rgb]) == [post_process_ocr("legacy rgb")]
    assert recognize_batch([None, b"junk"]) == ["", ""]


def test_committed_weights_match_generator():
    """The committed .npz IS the closed-form template weights for the
    current alphabet — catches stale artifacts after alphabet changes."""
    from manga_translator_spark.functions.glyph_model import build_weights

    fresh = build_weights(build_alphabet())
    model = GlyphRecognizer()
    assert model.chars == list(fresh["chars"])
    np.testing.assert_array_equal(model.weights, fresh["weights"])
    np.testing.assert_array_equal(model.bias, fresh["bias"])


def test_recognize_spark_stage_runs_numpy_model(spark, pages_df, golden):
    """End-to-end: the Spark recognize stage's output equals the oracle's
    (which shares recognize_batch) — the numpy model is what both ran."""
    from pyspark.sql import functions as F

    from manga_translator_spark.plans.pipeline import PipelineConfig, extract

    out = extract(pages_df, PipelineConfig()).select("url", "recognized").collect()
    n_rec = 0
    for r in out:
        exp = golden[r["url"]].recognized
        got = [(x["block_idx"], x["text"]) for x in r["recognized"]]
        assert got == list(exp)
        n_rec += len(got)
    assert n_rec > 0


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
