"""Text-analysis operators over a documents table — training-data pipeline ops.

Beyond the reference's own stages, a web-scale extraction engine feeds
training-data pipelines; these are the per-document scoring/statistics
operators (language-ID, quality scoring, token counting, fingerprinting)
expressed entirely in built-in ``pyspark.sql.functions`` so they run inside
whole-stage codegen — no Python in the hot path.

Every operator has a DuckDB SQL twin in ``__spark_entry__.py`` built from
the same fragments/constants, so the driver's oracle verifies values
exactly.  All are narrow (per-row) transforms: at 100 TB they pipeline over
the scan with zero shuffle; only explicit aggregations shuffle.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from manga_translator_spark.functions.texthash import h60_spark, tokens_spark
from manga_translator_spark.operators.common import spread

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

# Tiny per-language stopword sets for the n-gram/stopword language heuristic.
# Deliberately small + frozen: the SQL twin embeds the same lists.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "nicht", "ein"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "que", "une", "sur"],
}
LANGS = sorted(STOPWORDS)  # deterministic tie order: de < en < fr


def with_tokens(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    return spread(docs).withColumn("tokens", F.expr(tokens_spark(text_col))).withColumn(
        "n_tokens", F.size("tokens")
    )


def token_stats(docs: "DataFrame") -> "DataFrame":
    """Per-doc token counting (whitespace + alnum-fold tokenizer)."""
    return with_tokens(docs).select(
        "doc_id",
        "n_tokens",
        F.length("text").alias("n_chars_raw"),
        F.expr(
            "CASE WHEN size(tokens) = 0 THEN 0.0D ELSE "
            "CAST(aggregate(tokens, CAST(0 AS BIGINT), (a, t) -> a + length(t)) AS DOUBLE)"
            " / size(tokens) END"
        ).alias("avg_token_len"),
        F.size(F.array_distinct("tokens")).alias("n_distinct_tokens"),
    )


def _count_expr(pattern: str) -> str:
    # occurrences of a char class = chars removed by deleting it
    return f"length(text) - length(regexp_replace(text, '{pattern}', ''))"


def quality_features(docs: "DataFrame") -> "DataFrame":
    """Quality scoring: length/punctuation/digit/uppercase ratios.

    Ratios are double divisions by (length+1) — exact same expression in the
    SQL twin.  Emitted ratios are integer parts-per-million on BOTH sides
    (``CAST(round(raw * 1e6) AS BIGINT)``): rounded doubles were bit-equal
    locally but tripped the driver's float canonicalization twice (r01, r02),
    so per the repo invariant ("integer comparisons only in classifiers")
    the comparable schema carries no float column at all.  The is_quality
    thresholds compare the *raw* ratios, identically in the twin.
    """

    def _ppm(pattern: str) -> str:
        return (
            f"CAST(round((({_count_expr(pattern)}) / (length(text) + 1.0)) * 1000000.0) AS BIGINT)"
        )

    # spread: four regex passes per row over a possibly single-file scan
    # otherwise run on one task (r6 — the c4_rules finding)
    return spread(docs).select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.expr(_ppm("[.!?,;:]")).alias("punct_ppm"),
        F.expr(_ppm("[0-9]")).alias("digit_ppm"),
        F.expr(_ppm("[A-Z]")).alias("upper_ppm"),
        F.expr(
            "CASE WHEN length(text) >= 100 AND "
            f"({_count_expr('[.!?,;:]')}) / (length(text) + 1.0) < 0.1 AND "
            f"({_count_expr('[0-9]')}) / (length(text) + 1.0) < 0.2 "
            "THEN 1 ELSE 0 END"
        ).alias("is_quality"),
    )


def _stopword_hits_spark(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"size(filter(tokens, t -> array_contains(array({arr}), t)))"


def lang_id(docs: "DataFrame") -> "DataFrame":
    """Stopword-ratio language ID (n-gram heuristic analogue of the
    reference's OcrResult.language field, core/plugin.py:145-148).

    Emits per-language hit counts and the argmax guess ('und' if no hits);
    ties break by language code order via max_by on (hits, -lang) struct.
    """
    hit_cols = [
        F.expr(_stopword_hits_spark(lang)).alias(f"hits_{lang}") for lang in LANGS
    ]
    # argmax with deterministic ties: fold over langs in order, keep strictly-greater
    folded = "named_struct('h', -1, 'l', 'und')"
    for lang in LANGS:
        folded = (
            f"CASE WHEN hits_{lang} > ({folded}).h "
            f"THEN named_struct('h', hits_{lang}, 'l', '{lang}') ELSE {folded} END"
        )
    return (
        with_tokens(docs)
        .select("doc_id", "lang", *hit_cols)
        .withColumn(
            "lang_guess",
            F.expr(
                "CASE WHEN " + " + ".join(f"hits_{l}" for l in LANGS) + " = 0 "
                f"THEN 'und' ELSE ({folded}).l END"
            ),
        )
    )


# Gopher-style document-quality rule bounds (public heuristics family:
# Rae et al. 2021 "Scaling Language Models" Appendix A — word-count range,
# mean word length range, symbol-to-word ratio, stopword evidence).
# Integer/ratio thresholds chosen for the synthetic corpus scale; the SQL
# twin embeds the same constants.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100000
GOPHER_MIN_MEAN_WORD_LEN = 2
GOPHER_MAX_MEAN_WORD_LEN = 12
GOPHER_MAX_SYMBOL_RATIO_PCT = 10  # '#' or '…' per word, percent
GOPHER_MIN_STOPWORD_HITS = 1


def gopher_quality(docs: "DataFrame") -> "DataFrame":
    """Gopher-rule quality verdict per document, with per-rule flags.

    All integer comparisons (counts, percent-scaled ratios) so the DuckDB
    twin agrees exactly; one pass of codegen column ops, zero shuffle.
    The stopword rule uses the union of the language stopword lists.
    """
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    arr = ", ".join(f"'{w}'" for w in all_stops)
    hits = f"size(filter(tokens, t -> array_contains(array({arr}), t)))"
    sym = "length(text) - length(regexp_replace(text, '[#…]', ''))"
    d = with_tokens(docs)
    return d.select(
        "doc_id",
        "n_tokens",
        F.expr(
            f"CAST(n_tokens BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS INT)"
        ).alias("ok_n_words"),
        F.expr(
            "CAST(CASE WHEN n_tokens = 0 THEN FALSE ELSE "
            "aggregate(tokens, CAST(0 AS BIGINT), (a, t) -> a + length(t)) "
            f"BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} * n_tokens AND {GOPHER_MAX_MEAN_WORD_LEN} * n_tokens "
            "END AS INT)"
        ).alias("ok_word_len"),
        F.expr(
            f"CAST(100 * ({sym}) <= {GOPHER_MAX_SYMBOL_RATIO_PCT} * greatest(n_tokens, 1) AS INT)"
        ).alias("ok_symbols"),
        F.expr(f"CAST({hits} >= {GOPHER_MIN_STOPWORD_HITS} AS INT)").alias("ok_stopwords"),
    ).withColumn(
        "keep",
        F.expr("CAST(ok_n_words + ok_word_len + ok_symbols + ok_stopwords = 4 AS INT)"),
    )


C4_MIN_WORDS = 5  # C4 drops pages with < 5 words (line rule, doc-level here)
C4_POLICY_PHRASES = (  # RefinedWeb/FineWeb boilerplate-policy substrings
    "cookie policy",
    "privacy policy",
    "terms of use",
    "uses cookies",
)
C4_BLOCK_PHRASES = ("lorem ipsum",)  # placeholder-text page drop


def _c4_rule_exprs(
    tks: str, low: str, blocklist: tuple[str, ...]
) -> dict[str, str]:
    """Each C4 rule as one boolean SQL fragment over a BOUND token-array
    variable ``tks`` and a BOUND lowercased-text variable ``low`` —
    shared by :func:`c4_rules` (flag columns) and
    :func:`c4_keep_condition` (one pushdown predicate), so the two forms
    cannot drift (the _gopher_body discipline).  ``low`` is a lambda
    variable, not an inline ``lower(...)`` fragment: five substring rules
    referencing an inline lower() evaluated it five times per row (the
    flag Project is interpreted because of the blocklist HOF, so no
    codegen subexpression elimination — r6).  ``has_brace`` matching on
    the lowered text is identical to matching the raw text: no character
    case-folds to '{'."""
    for wd in blocklist:
        if "'" in wd or " " in wd:
            raise ValueError(f"blocklist entries are single tokens, got {wd!r}")
    policy = " OR ".join(f"contains({low}, '{p}')" for p in C4_POLICY_PHRASES)
    lorem = " OR ".join(f"contains({low}, '{p}')" for p in C4_BLOCK_PHRASES)
    if blocklist:
        arr = ", ".join(f"'{w.lower()}'" for w in sorted(blocklist))
        blocked = f"size(filter({tks}, t -> array_contains(array({arr}), t))) > 0"
    else:
        blocked = "FALSE"
    return {
        "has_brace": f"contains({low}, '{{')",
        "has_lorem": f"({lorem})",
        "has_js": f"array_contains({tks}, 'javascript')",
        "has_policy": f"({policy})",
        "has_blocked": f"({blocked})",
        "too_short": f"size({tks}) < {C4_MIN_WORDS}",
    }


def c4_rules(
    docs: "DataFrame",
    text_col: str = "text",
    blocklist: tuple[str, ...] = (),
) -> "DataFrame":
    """C4-family heuristic page filters (Raffel et al. 2020 §2.2 + the
    RefinedWeb/FineWeb variants), doc-level: flag pages containing a curly
    brace (code), "lorem ipsum" placeholder text, the token "javascript"
    (C4's script-garbage line rule), cookie/terms policy boilerplate, a
    blocklisted word, or fewer than ``C4_MIN_WORDS`` words — ``keep=1``
    iff no rule fires.  The complement of the Gopher STATISTICAL gate:
    these are exact-substring rules, so together they cover both filter
    families a curation pipeline layers.

    All flags are 0/1 integers from case-folded substring/token tests —
    pure codegen column ops, zero shuffle at any scale, and twin-exact by
    construction.  ``blocklist`` entries are matched as whole TOKENS (the
    C4 bad-word rule is word-level; substring matching would flag
    innocents — the classic 'scunthorpe' failure).
    """
    rules = _c4_rule_exprs("tokens", "low_s", blocklist)
    # NULL text = zero tokens (the tokenizer yields NULL, which would turn
    # every token-rule flag and the keep sum NULL — and the DuckDB twin's
    # CASE would disagree); the span-dedup/DSIR operators share this contract.
    # One nested let (texthash.py idiom) binds the lowered text AND the
    # token array once; spread() so a narrow scan doesn't run the whole
    # pass on one task (r6 — c4_rules was the one text operator without it).
    toks = f"coalesce({tokens_spark(text_col)}, CAST(array() AS ARRAY<STRING>))"
    low = f"lower(coalesce({text_col}, ''))"
    body = (
        "named_struct('n_tokens', CAST(size(tokens) AS BIGINT), "
        + ", ".join(f"'{k}', CAST({e} AS INT)" for k, e in rules.items())
        + ")"
    )
    nested = (
        f"element_at(transform(array({low}), low_s -> "
        f"element_at(transform(array({toks}), tokens -> {body}), 1)), 1)"
    )
    return (
        spread(docs)
        .select("doc_id", F.expr(nested).alias("s"))
        .select("doc_id", "s.n_tokens", *[F.col(f"s.{k}").alias(k) for k in rules])
        .withColumn(
            "keep",
            F.expr(f"CAST({' + '.join(rules)} = 0 AS INT)"),
        )
    )


def c4_keep_condition(
    text_col: str = "text", blocklist: tuple[str, ...] = ()
) -> "F.Column":
    """The C4 keep verdict as ONE boolean column over ``text_col`` — the
    filter-pushdown form of :func:`c4_rules` (same fragments via
    ``_c4_rule_exprs``; equality is tested).  Tokenization is let-bound
    via the single-element ``transform`` idiom (texthash.py rule)."""
    rules = _c4_rule_exprs("tokens", "low_s", blocklist)
    body = "NOT (" + " OR ".join(rules.values()) + ")"
    toks = f"coalesce({tokens_spark(text_col)}, CAST(array() AS ARRAY<STRING>))"
    low = f"lower(coalesce({text_col}, ''))"
    return F.expr(
        f"element_at(transform(array({low}), low_s -> "
        f"element_at(transform(array({toks}), tokens -> {body}), 1)), 1)"
    )


def fingerprint(docs: "DataFrame") -> "DataFrame":
    """Document fingerprinting: full-text md5 + min-token-hash (a 1-perm
    minhash — the rolling-hash fingerprint of SURVEY-era pipelines)."""
    return with_tokens(docs).select(
        "doc_id",
        F.md5(F.col("text")).alias("md5_fp"),
        F.expr(
            "CASE WHEN size(tokens) = 0 THEN CAST(-1 AS BIGINT) ELSE "
            f"array_min(transform(tokens, t -> {h60_spark('t')})) END"
        ).alias("min_token_hash"),
    )


WRAP_WIDTH = 40  # driver-pinned default; per-corpus knob


def wrap_lines(
    docs: "DataFrame", width: int = WRAP_WIDTH, hyphenate: bool = False
) -> "DataFrame":
    """Per-document greedy text wrap (the drawer-stage text-flow analogue,
    reference utils.py:135-169 via functions/wrap.py).

    Emits (doc_id, n_lines, wrapped, fits): wrapped is the chr(10)-joined
    line text (NULL when a word exceeds ``width`` — the kernel's None/
    retry contract), fits the integer flag of that.  Pure codegen fold,
    zero shuffle; the DuckDB twin runs the same fold via a recursive CTE.

    ``hyphenate=True`` runs the Liang-hyphenated variant instead
    (reference wrap_text_with_hyphenator, utils.py:185-267 via
    functions/hyphen.py): same output schema, words may split as
    ``left-`` / ``right`` at pattern points, and ``fits=0`` only when a
    word has NO fitting version even after hyphenation.  This path is a
    Python kernel over mapInPandas (Liang scoring is not SQL-expressible
    at reasonable cost): one Hyphenator per task whose word caches are
    shared across the batch, exactly as the reference shares one
    HyphenationCache per draw call — still a narrow per-row map, zero
    shuffle."""
    if hyphenate:
        return _wrap_lines_hyphenated(docs, width)
    from manga_translator_spark.functions.wrap import wrap_fold_spark, words_expr_spark

    fold = wrap_fold_spark(words_expr_spark("text"), width)
    return spread(docs).select(
        "doc_id", F.expr(f"({fold})").alias("w")
    ).select(
        "doc_id",
        F.col("w.n_lines").alias("n_lines"),
        F.col("w.wrapped").alias("wrapped"),
        F.expr("CAST(w.wrapped IS NOT NULL AS INT)").alias("fits"),
    )


def _wrap_lines_hyphenated(docs: "DataFrame", width: int) -> "DataFrame":
    import pandas as pd

    def gen(batches):
        from manga_translator_spark.functions.hyphen import (
            Hyphenator,
            wrap_lines_hyphenated,
        )

        for pdf in batches:
            # ONE cache per Arrow batch, not per task: the word caches
            # are unbounded by design (HyphenationCache lives one draw
            # call in the reference, utils.py:92) and a per-task cache
            # would grow with the partition's distinct-word count for
            # the task's lifetime (r4 review)
            hyph = Hyphenator()
            # NULL text shares the non-hyphenated fold's contract
            # (n_lines/wrapped NULL, fits 0) instead of a worker
            # TypeError from re.split(None) (ADVICE r4 #2)
            lines = [
                wrap_lines_hyphenated(t, width, hyphenator=hyph)
                if isinstance(t, str)
                else None
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_lines": [len(ls) if ls is not None else None for ls in lines],
                    "wrapped": ["\n".join(ls) if ls is not None else None for ls in lines],
                    "fits": [1 if ls is not None else 0 for ls in lines],
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(
        gen, schema="doc_id BIGINT, n_lines INT, wrapped STRING, fits INT"
    )


# BPE-style pretokenizer (GPT-2-family shape: contraction suffixes, then
# space-prefixed letter runs / digit runs / punctuation runs, then
# whitespace runs).  Explicit ASCII whitespace class so Java regex (Spark)
# and RE2 (DuckDB) match identically; both engines use leftmost-first
# alternation.  "BPE-ish": the merge table is not modeled — this is the
# pretokenization that bounds BPE token counts.
BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"
    "|[ \\t\\n\\x0B\\f\\r]+"
)


def bpe_token_stats(docs: "DataFrame") -> "DataFrame":
    """BPE-pretokenizer token counting per document.

    Emits the match count and an md5 fingerprint of the full token
    sequence (unit-separator-joined) — the fingerprint makes the DuckDB
    twin prove the *sequences* are identical, not just the counts.  Pure
    codegen, zero shuffle.
    """
    toks = F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), F.lit(0))
    return spread(docs).select(
        "doc_id",
        toks.alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("n_bpe_tokens"),
        F.md5(F.array_join("toks", "\x1f")).alias("bpe_fp"),
    )


def _gopher_body(tks: str, text_col: str = "text") -> str:
    """The Gopher keep verdict as one boolean SQL expression over a BOUND
    token-array variable ``tks`` (same constants / integer comparisons as
    :func:`gopher_quality`; equality is tested against it)."""
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    arr = ", ".join(f"'{w}'" for w in all_stops)
    sym = f"length({text_col}) - length(regexp_replace({text_col}, '[#…]', ''))"
    return (
        f"size({tks}) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND (CASE WHEN size({tks}) = 0 THEN FALSE ELSE"
        f" aggregate({tks}, CAST(0 AS BIGINT), (a, t) -> a + length(t))"
        f" BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} * size({tks})"
        f" AND {GOPHER_MAX_MEAN_WORD_LEN} * size({tks}) END)"
        f" AND 100 * ({sym}) <= {GOPHER_MAX_SYMBOL_RATIO_PCT} * greatest(size({tks}), 1)"
        f" AND size(filter({tks}, t -> array_contains(array({arr}), t)))"
        f" >= {GOPHER_MIN_STOPWORD_HITS}"
    )


def gopher_keep_condition(text_col: str = "text") -> "F.Column":
    """The Gopher keep verdict as ONE boolean column over ``text_col`` —
    the filter-pushdown form of :func:`gopher_quality` (same constants,
    same integer comparisons; equality is tested against it).  Being a
    single narrow expression it is legal in streaming append mode and
    composes as extract -> filter with zero state.

    The token array is let-bound via the single-element ``transform``
    idiom (texthash.py rule) so tokenization runs once, not per rule.
    """
    body = _gopher_body("tokens", text_col)
    return F.expr(
        f"element_at(transform(array({tokens_spark(text_col)}), tokens -> {body}), 1)"
    )


# Gopher repetition rules (Rae et al. 2021 §A1.1): heavily repetitious
# documents are low-quality training data.  Signals here are token-n-gram
# based (the corpus documents are flat word streams — no line structure):
# duplicate-bigram / duplicate-trigram fraction and the fraction of
# bigrams claimed by the single most frequent bigram.  All outputs are
# integer ppm via pure integer arithmetic (count * 1_000_000 DIV total) —
# no float column anywhere, so the DuckDB twin agrees bit-for-bit (the
# doc_quality lesson, CLAUDE.md invariants).
REP_MAX_DUP_BIGRAM_PPM = 900_000
REP_MAX_TOP_BIGRAM_PPM = 80_000


def _ngrams_spark(tks: str, n: int) -> str:
    """Adjacent word n-grams of the bound token array ``tks`` (space-
    joined); empty array when the doc is shorter than ``n`` tokens."""
    joined = ", ' ', ".join(f"element_at({tks}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({tks}) < {n} THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, size({tks}) - {n - 1}), "
        f"i -> concat({joined})) END"
    )


# Longest equal-run over a sorted array == max occurrence count of any
# element: one interpreted linear fold per row (bounded by doc length),
# ZERO shuffle — the 100 TB alternative to explode -> groupBy -> max,
# which would shuffle every bigram of every document.
_TOP_RUN_FOLD = """aggregate(sort_array({arr}),
  named_struct('prev', '', 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)),
  (a, x) -> named_struct(
    'prev', x,
    'run', CASE WHEN x = a.prev THEN a.run + 1 ELSE CAST(1 AS BIGINT) END,
    'best', greatest(a.best,
            CASE WHEN x = a.prev THEN a.run + 1 ELSE CAST(1 AS BIGINT) END)),
  a -> a.best)"""


# {a}-templated integer-ppm repetition signals over a bound n-gram array
# (shared by repetition_stats and the fused training-gate projection).
_DUP_PPM = (
    "CASE WHEN size({a}) = 0 THEN CAST(0 AS BIGINT) ELSE "
    "CAST((size({a}) - size(array_distinct({a}))) AS BIGINT) * 1000000 DIV size({a}) END"
)
_TOP_PPM = (
    "CASE WHEN size({a}) = 0 THEN CAST(0 AS BIGINT) ELSE "
    + _TOP_RUN_FOLD.format(arr="{a}")
    + " * 1000000 DIV size({a}) END"
)


def repetition_stats(
    docs: "DataFrame",
    max_dup_bigram_ppm: int = REP_MAX_DUP_BIGRAM_PPM,
    max_top_bigram_ppm: int = REP_MAX_TOP_BIGRAM_PPM,
) -> "DataFrame":
    """Per-doc repetition signals + keep verdict, integer ppm throughout.

    Columns: n_tokens, n_bigrams, dup_bigram_ppm (repeated-bigram
    fraction), top_bigram_ppm (share of the most frequent bigram),
    dup_trigram_ppm, rep_keep (1 iff both thresholds hold).  Thresholds
    are per-corpus knobs (driver queries pin the defaults).  Single
    projection, nested let-bindings (texthash.py idiom) so tokens /
    bigrams / trigrams each evaluate once per row.
    """
    dup = _DUP_PPM
    top = _TOP_PPM
    body = (
        "element_at(transform(array(" + _ngrams_spark("tks", 2) + "), bg -> "
        "element_at(transform(array(" + _ngrams_spark("tks", 3) + "), tg -> "
        "named_struct("
        "'n_tokens', size(tks), "
        "'n_bigrams', size(bg), "
        f"'dup_bigram_ppm', {dup.format(a='bg')}, "
        f"'top_bigram_ppm', {top.format(a='bg')}, "
        f"'dup_trigram_ppm', {dup.format(a='tg')}"
        ")), 1)), 1)"
    )
    stats = f"element_at(transform(array({tokens_spark('text')}), tks -> {body}), 1)"
    return (
        spread(docs)
        .select("doc_id", F.expr(stats).alias("s"))
        .select(
            "doc_id",
            F.col("s.n_tokens").alias("n_tokens"),
            F.col("s.n_bigrams").alias("n_bigrams"),
            F.col("s.dup_bigram_ppm").alias("dup_bigram_ppm"),
            F.col("s.top_bigram_ppm").alias("top_bigram_ppm"),
            F.col("s.dup_trigram_ppm").alias("dup_trigram_ppm"),
        )
        .withColumn(
            "rep_keep",
            F.expr(
                f"CAST(dup_bigram_ppm <= {int(max_dup_bigram_ppm)} "
                f"AND top_bigram_ppm <= {int(max_top_bigram_ppm)} AS INT)"
            ),
        )
    )


def quality_repetition_signals(
    docs: "DataFrame",
    max_dup_bigram_ppm: int = REP_MAX_DUP_BIGRAM_PPM,
    max_top_bigram_ppm: int = REP_MAX_TOP_BIGRAM_PPM,
) -> "DataFrame":
    """BOTH training-corpus gate verdicts + n_tokens from ONE let-bound
    tokenization (VERDICT r03 #3): (doc_id, n_tokens, gq_keep, rep_keep).

    ``training_corpus`` previously ran :func:`gopher_quality`,
    :func:`repetition_stats` AND a final ``n_tokens`` projection as three
    separate passes — at 100 TB the interpreted tokenizer fold is the
    dominant per-doc cost and it ran once per gate instead of once total.
    Here one projection binds the token array once (``transform(array(
    tokens), tks -> ...)``, texthash.py idiom), binds the bigram array
    once inside it, and emits the Gopher verdict (:func:`_gopher_body` —
    the tested-equal single-expression form of :func:`gopher_quality`),
    the repetition verdict (same ``_DUP_PPM``/``_TOP_PPM`` templates as
    :func:`repetition_stats`; the keep rule uses bigrams only), and
    ``size(tks)``.  Equality with the composed operators is tested.
    Zero shuffle, plan-asserted single tokenization."""
    gq = _gopher_body("tks", "text")
    rep = (
        f"({_DUP_PPM.format(a='bg')}) <= {int(max_dup_bigram_ppm)}"
        f" AND ({_TOP_PPM.format(a='bg')}) <= {int(max_top_bigram_ppm)}"
    )
    body = (
        "element_at(transform(array(" + _ngrams_spark("tks", 2) + "), bg -> "
        "named_struct("
        "'n_tokens', size(tks), "
        f"'gq_keep', CAST({gq} AS INT), "
        f"'rep_keep', CAST({rep} AS INT)"
        ")), 1)"
    )
    sig = f"element_at(transform(array({tokens_spark('text')}), tks -> {body}), 1)"
    return (
        spread(docs)
        .select("doc_id", F.expr(sig).alias("s"))
        .select(
            "doc_id",
            F.col("s.n_tokens").alias("n_tokens"),
            F.col("s.gq_keep").alias("gq_keep"),
            F.col("s.rep_keep").alias("rep_keep"),
        )
    )


# PII scrubbing (the redaction pass every public-web training pipeline
# runs): conservative, uniform-token replacement.  Patterns are written in
# the common subset of Java regex (Spark) and RE2 (DuckDB) — no lookarounds,
# \b supported by both — and applied in a fixed order (emails first: an
# address would otherwise leave its host behind after IP scrubbing).
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def scrub_pii(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Per-doc PII redaction + hit counts, pure codegen, zero shuffle.

    Output: doc_id, n_email/n_ip/n_phone (BIGINT hit counts on the
    PRE-redaction text), scrubbed_fp (md5 of the redacted text — the twin
    verifies the exact redacted bytes without shipping them).
    """
    # Spark SQL string literals process backslash escapes: '\d' in the SQL
    # text reaches the regex engine as 'd'.  Double them here; the DuckDB
    # twin embeds the raw patterns (standard SQL strings keep backslashes).
    def _sq(pat: str) -> str:
        return pat.replace("\\", "\\\\")

    counts = [
        F.expr(
            f"CAST(size(regexp_extract_all({text_col}, '{_sq(pat)}', 0)) AS BIGINT)"
        ).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    scrubbed = text_col
    for _, pat, token in PII_RULES:
        scrubbed = f"regexp_replace({scrubbed}, '{_sq(pat)}', '{token}')"
    return spread(docs).select(
        "doc_id",
        *counts,
        F.expr(f"md5({scrubbed})").alias("scrubbed_fp"),
    )


def token_surprise(
    docs: "DataFrame",
    text_col: str = "text",
    vocab_limit: int | None = None,
    tail_cnt: int = 1,
) -> "DataFrame":
    """Corpus-relative rarity scoring — the integer-exact stand-in for
    CCNet-style LM-perplexity bucketing (no LM in this sandbox; 1/freq
    self-information keeps the ordering signal and the twin exact).

    Two stages, the canonical scalable shape:
      1. corpus token frequencies — explode + groupBy(token): partial
         (map-side) aggregation does the heavy lifting, the shuffle
         carries one row per distinct token per partition;
      2. score — join each doc's tokens back against the frequency table
         and average the per-token surprise ``1_000_000 DIV cnt``.

    The join-back strategy is the 100x design point (VERDICT r03 #1): the
    distinct vocabulary of a web corpus is NOT Zipf-small — typos, URLs
    and hashes push it to 1e8–1e9 rows at 100 TB, so an unconditional
    ``broadcast(freq)`` hint would override AQE's size check and OOM the
    driver.  Two bounded modes instead:

    * ``vocab_limit=None`` (default, driver-twinned): no hint — AQE picks
      broadcast when the measured table is small and a shuffle join when
      it is not.  Correct at every scale, plan-asserted hint-free in
      tests/test_plans.py.
    * ``vocab_limit=N``: keep only the top-N tokens by count (ties by
      token — an ordered global limit, i.e. a scalable
      TakeOrderedAndProject, not a single-partition window); every tail
      token scores with ``tail_cnt`` (default 1 = max surprise).  This is
      the CCNet-faithful fixed-vocab form, and the capped table is
      explicitly broadcast because the cap makes that safe by
      construction.

    Output: doc_id, n_tokens, surprise_ppm (integer) — high = rare
    vocabulary (gibberish-ish), low = corpus-dominant boilerplate.
    """
    # NOTE: the exploded token table feeds both the frequency aggregate
    # and the score join, so the tokenizer fold nominally runs twice —
    # but checkpointing the exploded rows to share it was MEASURED slower
    # (1.39 -> 2.00 s at sf0.1): the explode multiplies rows and the
    # materialization dwarfs the recompute (the fused.py
    # don't-ship-big-intermediates rule).  Recompute wins; leave it.
    toks = with_tokens(docs, text_col).select(
        "doc_id", "n_tokens", F.explode("tokens").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    if vocab_limit is None:
        joined = toks.join(freq, "tok")
    else:
        capped = freq.orderBy(F.desc("cnt"), F.asc("tok")).limit(int(vocab_limit))
        joined = toks.join(F.broadcast(capped), "tok", "left").withColumn(
            "cnt", F.coalesce("cnt", F.lit(int(tail_cnt)).cast("long"))
        )
    return (
        joined
        .groupBy("doc_id", "n_tokens")
        .agg(F.sum(F.expr("CAST(1000000 AS BIGINT) DIV cnt")).alias("surprise_sum"))
        .select(
            "doc_id",
            "n_tokens",
            # no zero guard: a zero-token doc produces no exploded rows,
            # so no group exists and the doc has NO output row at all
            # (the twin documents the drop as the contract — a guard
            # here would falsely suggest such docs score 0)
            F.expr("surprise_sum DIV n_tokens").alias("surprise_ppm"),
        )
    )


SURPRISE_CALIB_MOD = 5  # calibration sample = doc_id % mod == 0 (~20%)


def surprise_buckets(
    docs: "DataFrame",
    text_col: str = "text",
    cutoffs: "tuple[int, int] | None" = None,
    calib_mod: int = SURPRISE_CALIB_MOD,
    vocab_limit: int | None = None,
    tail_cnt: int = 1,
) -> "DataFrame":
    """CCNet-style head/middle/tail corpus partitioning over the
    ``token_surprise`` score (CCNet §4.3 buckets by LM perplexity
    terciles and trains on the head; the integer surprise score plays
    the perplexity role here, so the whole operator stays twin-exact).

    Two cutoff modes, both ending in the same pure map-side CASE:

    * ``cutoffs=(c1, c2)`` — fixed integer ppm thresholds, the 100 TB
      production path: zero work beyond ``token_surprise`` itself.
      CCNet ships exactly this shape (per-language cutoffs computed once
      on a sample, then frozen).
    * ``cutoffs=None`` (default, driver-twinned) — calibrate on the
      deterministic ``doc_id % calib_mod == 0`` sample: rank the sample
      by (surprise_ppm, doc_id) — the full-struct tie order, not score
      alone — NTILE(3) it, and take each tercile's max score as its
      cutoff.  All-integer, so the DuckDB twin agrees exactly (no
      interpolated percentile float to disagree about in the last ulp).
      The NTILE is a single-partition global window — safe ONLY because
      it runs on the bounded calibration sample, never the corpus; at
      100 TB raise ``calib_mod`` so the sample stays ~1e6 rows, or
      precompute and pass fixed ``cutoffs``.  The one-row cutoff frame
      joins back via an explicit tiny broadcast.

    Bucket rule: ``surprise_ppm <= c1 -> 'head'`` (corpus-dominant
    vocabulary), ``<= c2 -> 'middle'``, else ``'tail'`` (rare/gibberish).
    An EMPTY calibration sample leaves both cutoffs NULL and every doc
    in 'tail' (NULL comparisons fail both CASE arms) — the twin encodes
    the same contract.  Zero-token docs have no score row and are absent
    here too (the token_surprise drop contract).

    Output: doc_id, n_tokens, surprise_ppm, bucket.
    """
    scored = token_surprise(docs, text_col, vocab_limit=vocab_limit, tail_cnt=tail_cnt)
    if cutoffs is None:
        # calibration consumes scored a second time (the sample branch);
        # checkpoint the 24-byte score rows so the two-shuffle
        # token_surprise chain runs once (r6)
        scored = scored.localCheckpoint(eager=False)
    if cutoffs is not None:
        c1, c2 = (int(c) for c in cutoffs)
        cuts = scored.sparkSession.range(1).select(
            F.lit(c1).cast("long").alias("c1"), F.lit(c2).cast("long").alias("c2")
        )
    else:
        from pyspark.sql import Window

        w = Window.orderBy(F.asc("surprise_ppm"), F.asc("doc_id"))
        cuts = (
            scored.filter(F.expr(f"doc_id % {int(calib_mod)} = 0"))
            .withColumn("tile", F.ntile(3).over(w))
            .groupBy()
            .agg(
                F.max(F.when(F.col("tile") == 1, F.col("surprise_ppm"))).alias("c1"),
                F.max(F.when(F.col("tile") <= 2, F.col("surprise_ppm"))).alias("c2"),
            )
        )
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "surprise_ppm",
        F.expr(
            "CASE WHEN surprise_ppm <= c1 THEN 'head' "
            "WHEN surprise_ppm <= c2 THEN 'middle' ELSE 'tail' END"
        ).alias("bucket"),
    )
