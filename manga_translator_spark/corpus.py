"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

The reference repo's correctness fixtures are committed golden image pairs
(reference README.md:45-122, assets/examples/*). Ours is a seeded synthetic
corpus with *known* main content: the analogue is exact, a fixed input whose
correct output is established once by the single-process oracle.

Every page is generated from ``random.Random(f"{seed}:{page_id}")`` — fully
determined by ``(seed, page_id)`` and independent of generation order, so the
driver-side pyarrow writer and the distributed Spark generator (bench scale)
produce byte-identical rows.

No external data; no image libraries.  Embedded "images" are minimal valid
PNGs whose payload text travels in a tEXt chunk (see :func:`make_png`) —
real pixel rendering is STUBBED because the sandbox has no imaging libs; the
Spark-side plumbing (binary column, batching, recognizer UDF) is real.
"""

from __future__ import annotations

import base64
import datetime as dt
import random
import re
import struct
import zlib
from bisect import bisect_right

SEED = 42
N_HOSTS = 50
ZIPF_S = 1.3

EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

WORDS_EN = (
    "archive beacon cadence drift ember fathom gleam harbor inlet jasper "
    "keel lumen marrow nectar onyx parcel quill ribbon sable tidal umber "
    "vessel wander yonder zephyr basalt cinder dune elm fern grove heath "
    "iris juniper kestrel larch moss nimbus orchard pine quarry reed slate "
    "thicket vale willow alder birch cedar delta ester flint"
).split()
WORDS_JA = (
    "海 山 川 空 雲 風 雨 雪 花 鳥 月 星 森 道 町 駅 本 水 火 土 "
    "光 影 音 声 夢 旅 橋 船 窓 扉"
).split()
WORDS_DE = (
    "Fluss Wald Stein Himmel Wolke Nebel Hügel Tal Ufer Hafen Straße "
    "Brücke Fenster Garten Wiese Vogel Möwe Küste Insel Leuchtturm "
    "Dämmerung Frühling Herbst Spiegel Schatten"
).split()

NAV_WORDS = "home about products archive contact blog news help login search docs team".split()
AD_TEXTS = (
    "Buy now limited offer",
    "Subscribe today and save",
    "Click here for deals",
    "Sponsored content inside",
)

_LANGS = ("en", "ja", "de")
_WORDLISTS = {"en": WORDS_EN, "ja": WORDS_JA, "de": WORDS_DE}

# Zipf CDF over hosts (s=1.3): deterministic skew for the salting tests.
_zipf_w = [1.0 / (k ** ZIPF_S) for k in range(1, N_HOSTS + 1)]
_zipf_tot = sum(_zipf_w)
_ZIPF_CDF = []
_acc = 0.0
for _w in _zipf_w:
    _acc += _w / _zipf_tot
    _ZIPF_CDF.append(_acc)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_png(text: str) -> bytes:
    """Valid grayscale PNG whose PIXELS are ``text`` rendered as 8x8 glyph
    strips (functions/glyph_model.render_text) — real image content the
    numpy OCR model (GlyphRecognizer, matmul+argmax) recognizes from the
    IDAT bytes, the way the reference's model reads crops
    (ocr/manga_ocr.py:46-53).  The text also travels in a tEXt chunk: the
    no-numpy fallback stub reads it, and tests cross-check pixel-decoded
    text against it.
    """
    from manga_translator_spark.functions.glyph_model import render_text

    pixels = render_text(text)  # (8, 8*max(len,1)) uint8
    height, width = pixels.shape
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + row.tobytes() for row in pixels)  # filter 0 rows
    text_payload = b"Description\x00" + text.encode("utf-8").replace(b"\x00", b" ")
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"tEXt", text_payload)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _sentence(rng: random.Random, words: list[str]) -> str:
    n = rng.randint(4, 12)
    toks = [rng.choice(words) for _ in range(n)]
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list[str]) -> str:
    return " ".join(_sentence(rng, words) for _ in range(rng.randint(2, 6)))


def _links(rng: random.Random, n: int) -> str:
    return " ".join(
        f'<a href="/{w}">{w} {rng.choice(NAV_WORDS)}</a>'
        for w in (rng.choice(NAV_WORDS) for _ in range(n))
    )


def host_of(page_id: int, seed: int = SEED) -> int:
    rng = random.Random(f"{seed}:host:{page_id}")
    return bisect_right(_ZIPF_CDF, rng.random())


def generate_page(page_id: int, seed: int = SEED) -> dict:
    """One (url, warc_ts, html, text, lang) row, fully determined by inputs."""
    rng = random.Random(f"{seed}:{page_id}")
    h = host_of(page_id, seed)
    url = f"https://host{h:03d}.example.com/page{page_id:06d}"
    warc_ts = EPOCH + dt.timedelta(seconds=page_id * 37)
    lang = _LANGS[page_id % 3]
    words = list(_WORDLISTS[lang])

    # --- edge cases at fixed ids (FIXTURES.md §1), first match wins -------
    empty_body = page_id % 97 == 0
    all_boiler = not empty_body and page_id % 89 == 0
    malformed = not empty_body and not all_boiler and page_id % 83 == 0
    bad_charset = page_id % 79 == 0
    # skew probe: FIXTURES puts one giant page at id 424242 (bench scale);
    # we also fire every 42424 so 100k-row runs contain the probe.
    giant = page_id != 0 and (page_id == 424242 or page_id % 42424 == 0)

    paras = (
        []
        if (empty_body or all_boiler)
        else [_paragraph(rng, words) for _ in range(1000 if giant else rng.randint(2, 9))]
    )
    title = " ".join((paras[0].split() if paras else ["untitled", "page"])[:8])

    nav = f'<nav class="topnav">{_links(rng, rng.randint(5, 12))}</nav>'
    sidebar = "<aside><ul>" + "".join(
        f"<li>{_links(rng, 1)} {rng.choice(NAV_WORDS)}</li>" for _ in range(rng.randint(3, 8))
    ) + "</ul></aside>"
    footer = (
        f'<footer><p>© 2025 host{h:03d} {_links(rng, 4)}</p></footer>'
    )
    ads = "".join(
        f'<div class="ad banner">{rng.choice(AD_TEXTS)} {_links(rng, 2)}</div>'
        for _ in range(rng.randint(0, 3))
    )

    n_imgs = 0 if (empty_body or giant) else rng.randint(0, 2)
    img_texts = [
        f"imgtext {seed} {page_id} {i} " + " ".join(rng.choice(words) for _ in range(3))
        for i in range(n_imgs)
    ]
    imgs = "".join(
        f'<img src="data:image/png;base64,{base64.b64encode(make_png(t)).decode()}" />'
        for t in img_texts
    )

    main = "".join(f"<p>{p}</p>" for p in paras)
    if malformed and paras:
        # unclosed tags + stray close (FIXTURES id%83): parser must tolerate
        main = "<p>" + paras[0] + "</div>" + "".join(f"<p>{p}</p>" for p in paras[1:])

    body = "" if empty_body else f"{nav}{sidebar}<article>{main}{imgs}</article>{ads}{footer}"
    charset = "shift_jis" if bad_charset else "utf-8"
    html = (
        f'<html><head><meta charset="{charset}"><title>{title}</title>'
        f"<script>var x=1;</script><style>.ad{{}}</style></head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")

    # naive full-page text (what Common Crawl's `text` field ships): every
    # visible fragment, whitespace-normalized — recomputed from the template
    # parts rather than re-parsed, so generation stays parser-independent.
    frags: list[str] = []
    if not empty_body:
        frags.append(nav)
        frags.append(sidebar)
        frags.extend(paras)
        frags.append(ads)
        frags.append(footer)
    naive = re.sub(r"<[^>]+>", " ", " ".join(frags))
    naive = re.sub(r"\s+", " ", naive).strip()

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": naive,
        "lang": lang,
    }


def generate_corpus(n_pages: int, seed: int = SEED) -> list[dict]:
    return [generate_page(i, seed) for i in range(n_pages)]


def write_corpus_parquet(path: str, n_pages: int, seed: int = SEED) -> None:
    """Driver-side writer for test scales (1k/10k). Bench scale uses the
    distributed generator in sources/pages.py."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_corpus(n_pages, seed)
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
    )
    pq.write_table(table, path)
