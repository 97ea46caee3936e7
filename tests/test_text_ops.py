"""Text-analysis operator checks that go beyond the driver contract."""

import duckdb
import pandas as pd
import pytest


def test_bpe_pretokenizer_engine_parity(spark):
    """Java regex (Spark) and RE2 (DuckDB) must produce identical token
    SEQUENCES (md5 fingerprint, not just counts) for the BPE pretokenizer
    over adversarial inputs — leftmost-first alternation + the explicit
    ASCII whitespace class are what keep the engines aligned."""
    from manga_translator_spark.operators import text_analysis as ta

    texts = [
        "Hello world, it's 2024! foo_bar",
        "  spaced   out\ttabs\nnewlines\x0bvt",
        "",
        "no-punct",
        "日本語 テスト 123",
        "can't won't I'll we're you've I'm he'd",
        "a" * 500 + "!!!" + "9" * 30,
        "mixed'quote 'lead 'd 's trail'",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_fp"])
        for r in ta.bpe_token_stats(docs).collect()
    }
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    pat = ta.BPE_PRETOKEN_RE.replace("'", "''")
    exp = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"SELECT doc_id, len(toks), md5(coalesce(array_to_string(toks, chr(31)), '')) "
            f"FROM (SELECT doc_id, regexp_extract_all(text, '{pat}') AS toks FROM d)"
        ).fetchall()
    }
    assert got == exp
    # sanity: contraction split + space-prefixed words (GPT-2 family shape)
    row5 = texts[5]
    import re as _re  # stdlib re lacks \p{..}; spot-check via duckdb tokens

    toks = con.sql(
        f"SELECT regexp_extract_all(?, '{pat}')", params=[row5]
    ).fetchone()[0]
    assert toks[:4] == ["can", "'t", " won", "'t"]


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
