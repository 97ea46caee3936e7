"""Multimodal column operators: real container decode + typed plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from manga_translator_spark.functions.blocks import CLS_EMBEDDED_IMG, extract_blocks
from manga_translator_spark.operators.multimodal import (
    EMBED_DIM,
    fake_embed_kernel,
    media_blocks,
    media_embed_batch,
    png_meta,
    resize_images,
    sample_frames,
    with_media_embedding,
    with_media_meta,
)
from manga_translator_spark.plans.pipeline import extract


def test_png_meta_decodes_real_header():
    from manga_translator_spark.corpus import make_png

    m = png_meta(make_png("abc"))
    assert m["is_png"] and (m["width"], m["height"]) == (24, 8)  # 8px/glyph
    assert m["bit_depth"] == 8 and m["color_type"] == 0  # 8-bit grayscale
    assert png_meta(b"not a png")["is_png"] is False
    assert png_meta(None) == {
        "n_bytes": 0, "is_png": False, "width": None, "height": None,
        "bit_depth": None, "color_type": None,
    }


def test_media_meta_matches_oracle_blocks(pages_df, corpus_rows):
    classified = extract(pages_df, until="classify")
    got = {
        (r["url"], r["block_idx"]): r
        for r in with_media_meta(media_blocks(classified)).collect()
    }
    expected = {
        (row["url"], b.block_idx): b
        for row in corpus_rows
        for b in extract_blocks(row["html"])
        if b.cls == CLS_EMBEDDED_IMG
    }
    assert set(got) == set(expected) and len(got) > 0
    for key, r in got.items():
        assert r["is_png"] and r["height"] == 8 and r["width"] % 8 == 0
        assert r["n_bytes"] == len(expected[key].img_payload)


def test_media_embedding_deterministic_and_feeds_similarity(pages_df, spark):
    classified = extract(pages_df, until="classify")
    emb = with_media_embedding(media_blocks(classified))
    rows = emb.collect()
    assert rows and all(len(r["embedding"]) == EMBED_DIM for r in rows)
    # kernel parity: Spark row == local kernel on the same payload
    sample = media_blocks(classified).limit(3).collect()
    got = {(r["url"], r["block_idx"]): r["embedding"] for r in rows}
    for s in sample:
        local = media_embed_batch([s["payload"]])[0]
        spark_vec = got[(s["url"], s["block_idx"])]
        assert [round(float(v), 5) for v in spark_vec] == [round(v, 5) for v in local]
    # the embedding column slots into the similarity operators unchanged —
    # zero-pad 16 -> 64 dims (zip_with null-pads mismatched lengths, which
    # would collapse every bucket to 0; padding keeps the dot products real)
    from manga_translator_spark.operators.similarity import EMB_DIM as SIM_DIM
    from manga_translator_spark.operators.similarity import lsh_buckets

    as_vecs = emb.select(
        F.xxhash64("url", "block_idx").alias("vec_id"),
        F.expr(
            f"concat(embedding, array_repeat(cast(0.0 as float), {SIM_DIM - EMBED_DIM}))"
        ).alias("embedding"),
    )
    buckets = lsh_buckets(as_vecs).select("bucket").distinct()
    n_buckets = buckets.count()
    assert 1 < n_buckets <= 2 ** 16  # real spread, not a degenerate single bucket


def test_resize_images_real_pixel_path(pages_df):
    """resize_images is REAL for the grayscale layout: decode -> numpy
    nearest-neighbor gather -> re-encode; output PNGs decode to the exact
    index-mapped pixels of the source."""
    import numpy as np

    from manga_translator_spark.functions.glyph_model import decode_png_gray, resize_gray

    classified = extract(pages_df, until="classify")
    media = media_blocks(classified)
    src = {(r["url"], r["block_idx"]): bytes(r["payload"]) for r in media.collect()}
    out = resize_images(media, 16, 16).collect()
    assert len(out) == len(src) > 0
    for r in out:
        assert (r["width"], r["height"]) == (16, 16)
        got = decode_png_gray(bytes(r["payload"]))
        assert got is not None and got.shape == (16, 16)
        exp = resize_gray(decode_png_gray(src[(r["url"], r["block_idx"])]), 16, 16)
        np.testing.assert_array_equal(got, exp)


def test_resize_unknown_format_yields_null(spark):
    import pandas as pd

    from manga_translator_spark.operators.multimodal import resize_kernel

    assert resize_kernel(b"not a png", 8, 8) is None
    media = spark.createDataFrame(
        pd.DataFrame({"url": ["u"], "block_idx": [0], "payload": [b"junk"]})
    )
    rows = resize_images(media, 8, 8).collect()
    assert len(rows) == 1 and rows[0]["payload"] is None


def test_sample_frames_is_guarded_real_impl(pages_df):
    # sandbox has no pyav: the guard raises; the import-try activates the
    # real fan-out kernel without edits when the library appears
    from manga_translator_spark.operators import multimodal

    classified = extract(pages_df, until="classify")
    media = media_blocks(classified)
    assert not multimodal.HAVE_AV
    with pytest.raises(NotImplementedError):
        sample_frames(media)


def test_media_embed_real_pixel_semantics():
    """Decodable PNGs take the REAL path: decode -> canonical resample ->
    one projection matmul per batch.  Pixel-identical payloads embed
    identically; different pixels embed differently; vectors are
    L2-normalized; non-decodable bytes fall back to the hash featurizer;
    empty payloads embed to zeros."""
    import numpy as np

    from manga_translator_spark.corpus import make_png
    from manga_translator_spark.functions import media_embed as me

    a, b = make_png("same text"), make_png("other words")
    vecs = media_embed_batch([a, a, b, b"\x01\x02junk", None])
    assert all(len(v) == EMBED_DIM for v in vecs)
    assert vecs[0] == vecs[1]  # pixel-identical -> identical embedding
    assert vecs[0] != vecs[2]
    for v in vecs[:3]:
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5  # unit norm
    assert vecs[3] == fake_embed_kernel(b"\x01\x02junk")  # fallback path
    assert vecs[4] == [0.0] * EMBED_DIM

    # batching: the whole decodable set goes through ONE matmul
    net = me.MediaEmbedder()
    from manga_translator_spark.functions.glyph_model import decode_png_gray

    imgs = [decode_png_gray(p) for p in (a, b, make_png("third"))]
    net.embed_arrays(imgs)
    assert net.matmul_calls == 1

    # heterogeneous shapes canonicalize into the same batch (wide strip
    # resamples to the 8x32 grid rather than forming its own group)
    wide = decode_png_gray(make_png("a much longer string of text here"))
    net2 = me.MediaEmbedder()
    out = net2.embed_arrays([imgs[0], wide])
    assert net2.matmul_calls == 1 and all(v is not None for v in out)


def test_media_embedder_singleton_loads_once():
    from manga_translator_spark.functions import media_embed as me

    me._MODEL = None
    me.LOAD_COUNT = 0
    a = me.get_media_embedder()
    b = me.get_media_embedder()
    assert a is b and me.LOAD_COUNT == 1
    built = __import__("numpy").array_equal(a.proj, me.build_weights()["proj"])
    assert built  # committed artifact == closed-form derivation
