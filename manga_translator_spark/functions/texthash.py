"""Shared deterministic text hashing/tokenization — Spark + DuckDB twins.

The dedup/similarity/fingerprint operators need hash values that the
driver's DuckDB oracle can recompute exactly.  Spark's ``xxhash64`` and
DuckDB's ``hash`` are different algorithms, so every cross-checked operator
hashes through **md5** (identical everywhere): take the first 15 hex digits
(60 bits — fits a signed BIGINT on both engines) as an integer.

Each helper returns a pair of SQL fragments (spark_sql, duckdb_sql) built
from the same constants, so the two sides can only agree or fail together —
the same single-source-of-truth discipline the extraction pipeline uses for
its Python kernels (SURVEY.md §5).
"""

from __future__ import annotations

HASH_HEX_DIGITS = 15  # 60 bits < 2^63

# MinHash universal-hash family over a Mersenne prime: sig_i = min over
# shingles of (A[i]*h + B[i]) mod P with h = md5-hash(shingle) mod P.
# One md5 per shingle (the expensive part) + k cheap integer transforms,
# instead of k md5 invocations per shingle.  Constants are fixed/seeded and
# embedded into BOTH engines' SQL.
import random as _random

MINHASH_P = 2147483647  # 2^31 - 1
_rng = _random.Random(13)
MINHASH_A = [(_rng.randrange(1, MINHASH_P - 1) | 1) for _ in range(64)]
MINHASH_B = [_rng.randrange(0, MINHASH_P - 1) for _ in range(64)]


def h60_spark(x: str) -> str:
    return f"cast(conv(substr(md5({x}), 1, {HASH_HEX_DIGITS}), 16, 10) as bigint)"


def h60_duck(x: str) -> str:
    return f"(('0x' || substr(md5({x}), 1, {HASH_HEX_DIGITS}))::UBIGINT)::BIGINT"


# Tokenization: lowercase, strip non-alphanumerics, split on whitespace.
def tokens_spark(col: str) -> str:
    # The replace class is '[^a-z0-9]' WITHOUT the space that the DuckDB
    # twin's '[^a-z0-9 ]' carries — deliberately, and output-identical:
    # the only chars treated differently are spaces, which the narrower
    # class matches and replaces WITH A SPACE (identity).  Why: java.util
    # .regex compiles 1-2-component classes to fast range/bit nodes but a
    # 3-component class ('a-z' + '0-9' + ' ') falls into a chained
    # CharPredicate union that is ~5x slower per char (measured at sf1,
    # 15 MB of text: 1.58 s -> 0.33 s for the replace alone, r6).  DuckDB
    # is RE2 and has no such cliff, so the twin keeps the readable form.
    return (
        f"filter(split(trim(regexp_replace(lower({col}), '[^a-z0-9]', ' ')), "
        f"'\\\\s+'), t -> t != '')"
    )


def tokens_duck(col: str) -> str:
    return (
        f"list_filter(string_split_regex(trim(regexp_replace(lower({col}), "
        f"'[^a-z0-9 ]', ' ', 'g')), '\\s+'), t -> t != '')"
    )


# Non-overlapping w-token segments (space-joined), 0-indexed by position.
# The unit of CCNet-style repeated-segment (boilerplate) dedup: unlike
# shingles these PARTITION the token stream, so dropping a segment and
# re-joining the survivors reconstructs the document minus the boilerplate.
# Zero-token docs yield an empty array (exploders drop the row); a short
# final window keeps its tail tokens (slice clamps on both engines).
def segments_spark(tokens: str, w: int) -> str:
    """Same let-binding discipline as shingles_spark: bind the token array
    once via a single-element ``transform`` so the tokenizer is not
    re-inlined into the per-segment lambda."""
    body = f"""CASE WHEN size(tks) = 0 THEN array()
      ELSE transform(sequence(0, cast(ceil(size(tks) / {w}.0) as int) - 1),
                     g -> array_join(slice(tks, g * {w} + 1, {w}), ' '))
      END"""
    return f"element_at(transform(array({tokens}), tks -> {body}), 1)"


def segments_duck(tokens: str, w: int) -> str:
    return f"""CASE WHEN len({tokens}) = 0 THEN []
      ELSE list_transform(range(CAST(ceil(len({tokens}) / {w}.0) AS BIGINT)),
                          g -> array_to_string({tokens}[(g * {w} + 1):((g + 1) * {w})], ' '))
      END"""


# Word shingles (w tokens, space-joined); short docs yield one whole-doc shingle.
def shingles_spark(tokens: str, w: int = 3) -> str:
    """SQL has no let-bindings, so bind the evaluated token array to a
    lambda variable via a single-element ``transform`` — otherwise the
    tokenizer expression is textually inlined into the per-element
    ``slice(...)`` lambda and re-tokenizes the document once per shingle
    (measured: 12s -> ~1s on 5000 docs for the shingle stage alone)."""
    body = f"""CASE WHEN size(tks) < {w}
      THEN array(array_join(tks, ' '))
      ELSE transform(sequence(1, size(tks) - {w - 1}),
                     i -> array_join(slice(tks, i, {w}), ' '))
      END"""
    return f"element_at(transform(array({tokens}), tks -> {body}), 1)"


def shingles_duck(tokens: str, w: int = 3) -> str:
    return f"""CASE WHEN len({tokens}) < {w}
      THEN [array_to_string({tokens}, ' ')]
      ELSE list_transform(generate_series(1, len({tokens}) - {w - 1}),
                          i -> array_to_string({tokens}[i:i + {w - 1}], ' '))
      END"""
