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


# Separator/escape pair for the join-call-split round trip.  The reference
# splits the LLM response on a bare '<s>' and corrupts any text containing
# it (openai.py:71-73); we escape instead: ESC -> ESC+'E', SEP -> ESC+'S'
# before joining, inverted after splitting — lossless for ALL inputs
# (probe-tested in tests/test_pipeline.py).
_SEP, _ESC = "␞", "␛"


def _batched_model_call(joined: str) -> str:
    """ONE external call per batch — the drop-in point for a real LLM/API
    client (reference translation/openai.py:59-66 sends the <s>-joined
    batch as a single prompt).  Identity keeps the engine deterministic
    and offline; the test asserts output == input, which proves the
    round-trip bookkeeping."""
    return joined


def make_enrich_batched(
    batch_rows: int = 512,
    model_call: Callable[[str], str] | None = None,
) -> Callable[["DataFrame"], "DataFrame"]:
    """The external-model batching pattern (OpenAI translator analogue),
    bounded by construction.

    The reference joins a batch of strings with ``<s>``, makes ONE model
    call, and splits the response back (translation/openai.py:59-73).  The
    batch unit here is a slice of an Arrow chunk (<= ``batch_rows`` rows),
    processed inside ``mapInPandas`` — zero shuffle, zero driver state, and
    no group can ever exceed ``batch_rows`` documents regardless of corpus
    size (the r01 version collect_list'ed corpus/64 docs into single rows —
    an executor-OOM at 100x).  Physical shape == operators/recognize.py.
    """
    if int(batch_rows) <= 0:
        # range(0, n, batch_rows<=0) yields nothing — the job would write
        # an EMPTY table with exit 0 (r5 review); fail at compose time
        raise ValueError(f"batch_rows must be positive, got {batch_rows}")
    call = model_call or _batched_model_call

    def enrich(df: "DataFrame") -> "DataFrame":
        schema = df.schema

        def run(batches):
            for pdf in batches:
                for lo in range(0, len(pdf), batch_rows):
                    chunk = pdf.iloc[lo : lo + batch_rows]
                    if not len(chunk):
                        continue
                    texts = list(chunk["extracted_text"])
                    enc = [
                        t.replace(_ESC, _ESC + "E").replace(_SEP, _ESC + "S")
                        for t in texts
                    ]
                    parts = call(_SEP.join(enc)).split(_SEP)
                    # positional alignment is the contract (openai.py:67-73)
                    assert len(parts) == len(texts), "batch round-trip misaligned"
                    out = chunk.copy()
                    out["extracted_text"] = [
                        p.replace(_ESC + "S", _SEP).replace(_ESC + "E", _ESC)
                        for p in parts
                    ]
                    yield out

        return df.mapInPandas(run, schema=schema)

    return enrich


# Deterministic token-level translation lexicon (en -> de), deliberately
# small + frozen (the STOPWORDS discipline) and ascii-only.  This is the
# offline stand-in for the reference's model translators (DeepL/OpenAI/HF,
# translation/deepl.py etc.): the FAMILY contract — per-token transform,
# unknown tokens pass through unchanged — is what the engine implements;
# swapping a real model in is the make_enrich_batched model_call hook.
TRANSLATE_LEXICON: tuple[tuple[str, str], ...] = (
    ("and", "und"),
    ("batch", "stapel"),
    ("fast", "schnell"),
    ("hash", "streuwert"),
    ("join", "verbund"),
    ("key", "schluessel"),
    ("merge", "mischung"),
    ("order", "reihenfolge"),
    ("part", "teil"),
    ("scan", "abtastung"),
    ("small", "klein"),
    ("sort", "sortierung"),
    ("stream", "strom"),
    ("table", "tabelle"),
    ("the", "der"),
    ("window", "fenster"),
)


def _sq(s: str) -> str:
    """SQL string-literal escape — the lexicon is a caller-supplied plugin
    argument, and a natural entry like ("dont", "don't") must not break
    (or worse, rewrite) the generated query (r4 review)."""
    return s.replace("'", "''")


def dict_translate_spark(col: str, lexicon=TRANSLATE_LEXICON) -> str:
    """Spark SQL fragment: per-token lexicon mapping over space-split
    ``col`` (extraction output is single-space normalized), unknown
    tokens unchanged.  try_element_at: ANSI map lookup throws on miss."""
    entries = ", ".join(f"'{_sq(k)}', '{_sq(v)}'" for k, v in lexicon)
    return (
        f"array_join(transform(split({col}, ' '), "
        f"w -> coalesce(try_element_at(map({entries}), lower(w)), w)), ' ')"
    )


def dict_translate_duck(col: str, lexicon=TRANSLATE_LEXICON) -> str:
    """DuckDB twin fragment — same lexicon, CASE-chain lookup."""
    case = (
        "CASE lower(w) "
        + " ".join(f"WHEN '{_sq(k)}' THEN '{_sq(v)}'" for k, v in lexicon)
        + " ELSE w END"
    )
    return (
        f"array_to_string(list_transform(string_split({col}, ' '), "
        f"w -> {case}), ' ')"
    )


def normalize_lexicon(raw) -> tuple[tuple[str, str], ...]:
    """Canonicalize a user-supplied lexicon (mapping OR iterable of
    (src, dst) pairs — YAML/JSON configs naturally produce either) to the
    tuple-of-pairs shape the factories document.

    A bare mapping must go through ``.items()``: iterating a dict yields
    KEYS, so ``for a, b in raw`` would unpack the string 'to' into
    ('t', 'o') — a silently garbage lexicon (r5 review).  Duplicate
    source tokens are rejected here so batch Spark (ANSI ``map()``
    throws DUPLICATE_MAP_KEY) and the serve job's Python dict (silent
    last-wins) cannot diverge on the same config."""
    from collections.abc import Mapping

    pairs = raw.items() if isinstance(raw, Mapping) else raw
    lex = []
    for pair in pairs:
        try:
            a, b = pair
        except (TypeError, ValueError):
            raise ValueError(
                f"lexicon entries must be (src, dst) pairs, got {pair!r}"
            ) from None
        lex.append((str(a), str(b)))
    seen = {a for a, _ in lex}
    if len(seen) != len(lex):
        dupes = sorted({a for i, (a, _) in enumerate(lex) if a in {x for x, _ in lex[:i]}})
        raise ValueError(f"duplicate lexicon source token(s): {dupes}")
    return tuple(lex)


def make_enrich_dict(
    lexicon: tuple[tuple[str, str], ...] = TRANSLATE_LEXICON,
) -> Callable[["DataFrame"], "DataFrame"]:
    """Dictionary-translator enricher: pure codegen token mapping on the
    assembled extraction — zero shuffle, zero Python."""
    lexicon = normalize_lexicon(lexicon)

    def enrich(df: "DataFrame") -> "DataFrame":
        return df.withColumn(
            "extracted_text",
            F.expr(dict_translate_spark("extracted_text", lexicon)),
        )

    return enrich


ENRICHERS: dict[str, Callable[["DataFrame"], "DataFrame"]] = {
    "pipe": enrich_pipe,
    "debug": make_enrich_debug(),
    "batched": make_enrich_batched(),
    "dict": make_enrich_dict(),
}
