"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/quality: benchmark decontamination, sequence packing, and
stratified sampling.

* **decontaminate** — remove/flag training documents that share any word
  n-gram with a benchmark (eval) set: the GPT-3 appendix-C / PaLM overlap
  rule.  100 TB shape: both sides reduce to 60-bit n-gram hashes before
  the join (8 bytes on the shuffle, not the n-gram text); the benchmark
  side is distinct-collapsed and is tiny in practice (eval suites are
  MBs against a TB corpus), so AQE broadcasts it; the per-doc hit count
  comes from one partial-aggregated groupBy on doc_id.
* **pack_sequences** — greedy token-budget bin packing: documents, in
  deterministic (shard, doc_id) order, accumulate into packs of at most
  ``capacity`` tokens; a doc that would overflow starts the next pack
  (training-sequence packing for a fixed context window).  Packing is a
  sequential scan, so it runs per *shard*: tokenize JVM-side, shuffle
  only 24-byte (doc_id, shard, n_tokens) rows, then a LINEAR
  ``applyInPandas`` walk per shard — measured 2.6× faster at sf1 than
  the all-JVM ``aggregate`` fold, whose O(m^2) accumulator copies went
  superlinear (see the function docstring for the numbers).
* **sample_stratified** — deterministic per-stratum rate sampling: keep a
  document iff md5-hash(salt || doc_id) mod 1000 falls under the
  stratum's per-mille rate (the corpus-rebalancing move: downsample the
  dominant language, keep the tail).  Pure map-side filter, zero shuffle,
  reproducible by anyone with the salt — no RNG state.

All hashes use the shared md5 60-bit scheme (functions/texthash.py) so
the driver's DuckDB oracle reproduces values exactly.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping

from pyspark.sql import functions as F

from manga_translator_spark.functions.texthash import (
    h60_spark,
    shingles_spark,
    tokens_spark,
)
from manga_translator_spark.operators.common import spread

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

DECONTAM_W = 13     # the published 13-gram standard (GPT-3 appendix C)
PACK_CAPACITY = 512
PACK_SHARDS = 64
SAMPLE_MOD = 1000   # rates are per-mille
SAMPLE_SALT = "sample:"


def _ngram_hash_rows(docs: "DataFrame", text_col: str, w: int) -> "DataFrame":
    """(doc_id, n_ngrams, h): one row per DISTINCT word w-gram per doc,
    h = 60-bit md5 hash of the space-joined gram.  Docs shorter than w
    tokens contribute their whole token sequence as one gram (the
    shingles fallback), so a short benchmark doc still decontaminates
    verbatim copies; zero-token docs contribute nothing (the fallback
    gram is '' and is filtered)."""
    toks = tokens_spark(text_col)
    sh = f"array_remove(array_distinct({shingles_spark(toks, w)}), '')"
    return (
        spread(docs)
        .select("doc_id", F.expr(sh).alias("ngrams"))
        .select(
            "doc_id",
            F.expr("cast(size(ngrams) as bigint)").alias("n_ngrams"),
            F.explode("ngrams").alias("s"),
        )
        .select("doc_id", "n_ngrams", F.expr(h60_spark("s")).alias("h"))
    )


def decontaminate(
    train: "DataFrame",
    bench: "DataFrame",
    *,
    w: int = DECONTAM_W,
    text_col: str = "text",
) -> "DataFrame":
    """(doc_id, n_hits, n_ngrams) for every *contaminated* training doc:
    ``n_hits`` = how many of its ``n_ngrams`` distinct word w-grams occur
    anywhere in the benchmark set.  Anti-join the result against the
    corpus to drop contaminated docs; the fraction n_hits/n_ngrams
    supports threshold policies (PaLM drops at >= 70% overlap).

    Both inputs need (doc_id, text_col).  The join runs on the 60-bit
    gram hash — a collision can at worst over-flag one doc, the safe
    direction for decontamination.
    """
    t = _ngram_hash_rows(train, text_col, w)
    b = _ngram_hash_rows(bench, text_col, w).select("h").distinct()
    return (
        t.join(b, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.max("n_ngrams").alias("n_ngrams"),
        )
    )


def pack_sequences(
    docs: "DataFrame",
    *,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    text_col: str = "text",
) -> "DataFrame":
    """(shard, doc_id, pack_id, n_tokens): greedy sequence packing.

    Within each shard (``pmod(doc_id, n_shards)``), docs in (doc_id,
    n_tokens) order fill packs of at most ``capacity`` tokens; a doc that
    would overflow a non-empty pack starts the next one.  A single doc
    longer than ``capacity`` occupies a pack alone (never split).
    pack_id is dense per shard starting at 0 — (shard, pack_id) is the
    global pack key.

    Physical shape: tokenize JVM-side (only 24-byte (doc_id, shard,
    n_tokens) rows reach Python), one shuffle (groupBy shard), then a
    LINEAR ``applyInPandas`` scan per shard.  Measured rationale (sf1,
    50k docs, local[32], min-of-3): the all-JVM alternative — a
    ``sort_array`` + ``aggregate`` fold appending to an accumulator
    array — is O(m^2) in shard size and lost 6.60 s vs 2.57 s at 6,250
    docs/shard; the pandas scan is linear, so it is also robust to shard
    skew a fixed ``n_shards`` cannot prevent at 100 TB.
    """
    import pandas as pd

    toks = tokens_spark(text_col)
    base = spread(docs).select(
        "doc_id",
        F.expr(f"cast(pmod(doc_id, {n_shards}) as int)").alias("shard"),
        F.expr(f"coalesce(cast(size({toks}) as bigint), 0)").alias("n_tokens"),
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # stable mergesort on the full (doc_id, n_tokens) key — matches
        # the twin's ORDER BY doc_id, n exactly, ties included
        pdf = pdf.sort_values(["doc_id", "n_tokens"], kind="mergesort")
        pid, fill, ids = 0, 0, []
        for n in pdf["n_tokens"].to_numpy():
            if fill > 0 and fill + n > capacity:
                pid, fill = pid + 1, 0
            ids.append(pid)
            fill += n
        return pdf.assign(pack_id=ids)[["shard", "doc_id", "pack_id", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        fn, "shard int, doc_id bigint, pack_id bigint, n_tokens bigint"
    )


DSIR_BUCKETS = 4096     # hashed feature space (paper uses 10k; bounded either way)
DSIR_SCALE = 1_000_000  # integer ppm scale — twin-exact arithmetic


def dsir_scores(
    train: "DataFrame",
    target: "DataFrame",
    *,
    n_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> "DataFrame":
    """DSIR-style data selection scores (Xie et al. 2023, arXiv:2302.03169
    "Data Selection for Language Models via Importance Resampling"), as an
    integer-exact stand-in (the token_surprise discipline: no float column
    anywhere, so the DuckDB twin reproduces values bit-for-bit).

    The paper scores each raw document by the log-likelihood ratio of a
    TARGET hashed-n-gram bag model over a RAW one and resamples by that
    weight.  Here: features are unigrams + bigrams hashed into
    ``n_buckets`` buckets; each bucket's weight is the add-1-smoothed
    integer frequency ratio

        weight_ppm(b) = (SCALE * (cnt_target(b) + 1)) DIV (cnt_raw(b) + 1)

    and a document's score is the integer mean weight of its feature
    occurrences — high = target-like, low = raw-boilerplate-like.  The
    ordering signal is the paper's; the log and the resampling draw are
    the parts a float-free twin cannot carry (rank by score_ppm and take
    the top slice to select).

    100 TB shape: both count aggregates are map-side-combined explodes
    whose shuffle carries (bucket, partial count) — and the bucket space
    is FIXED at ``n_buckets``, so unlike token_surprise's unbounded vocab
    the weight table is bounded by construction and explicitly
    broadcast; the score join is therefore shuffle-free on the corpus
    side, and the per-doc mean is one more partial agg keyed doc_id.
    Target sets are small by definition (a quality corpus sample), so the
    extra scan over ``target`` is noise.

    Output: (doc_id, n_feats, score_ppm) for every train doc —
    ``n_feats`` = feature occurrences (n_tokens + n_bigrams),
    ``score_ppm`` NULL iff the doc has no tokens.
    """
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    # 12-byte (doc_id, b) rows consumed by BOTH the raw-count aggregate
    # and the score join: checkpoint so the tokenize/bigram/hash pass
    # over the corpus runs once (r6; the hashed-feature table is the
    # boundary a 100 TB DSIR run materializes anyway)
    feats_train = _dsir_feature_rows(train, text_col, n_buckets).localCheckpoint(
        eager=False
    )
    feats_target = _dsir_feature_rows(target, text_col, n_buckets)
    raw_cnt = feats_train.groupBy("b").agg(F.count(F.lit(1)).alias("raw_cnt"))
    tgt_cnt = feats_target.groupBy("b").agg(F.count(F.lit(1)).alias("tgt_cnt"))
    weights = (
        raw_cnt.join(tgt_cnt, "b", "full_outer")
        .select(
            "b",
            F.expr(
                f"cast({DSIR_SCALE} * (coalesce(tgt_cnt, 0) + 1) as bigint)"
                " DIV (coalesce(raw_cnt, 0) + 1)"
            ).alias("w_ppm"),
        )
    )
    scored = (
        feats_train.join(F.broadcast(weights), "b")  # bounded: <= n_buckets rows
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.expr("sum(w_ppm) DIV count(1)").alias("score_ppm"),
        )
    )
    return (
        train.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.col("score_ppm").cast("long").alias("score_ppm"),
        )
    )


def _dsir_feature_rows(docs: "DataFrame", text_col: str, n_buckets: int) -> "DataFrame":
    """(doc_id, b): one row per feature OCCURRENCE (unigrams + bigrams,
    with multiplicity — a bag model, not a set), b = 60-bit md5 hash of
    the feature mod n_buckets.  Docs with one token contribute just that
    unigram (the bigram shingle fallback would duplicate it); zero-token
    docs contribute nothing."""
    toks = tokens_spark(text_col)
    feats = f"""element_at(transform(array({toks}), tks ->
      CASE WHEN size(tks) < 2 THEN tks
      ELSE concat(tks, transform(sequence(1, size(tks) - 1),
                                 i -> concat(element_at(tks, i), ' ', element_at(tks, i + 1))))
      END), 1)"""
    return (
        spread(docs)
        .select("doc_id", F.explode(F.expr(feats)).alias("s"))
        .select(
            "doc_id",
            F.expr(f"pmod({h60_spark('s')}, {int(n_buckets)})").alias("b"),
        )
    )


CHUNK_SIZE = 256
CHUNK_STRIDE = 192


def chunk_tokens(
    docs: "DataFrame",
    *,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
) -> "DataFrame":
    """(doc_id, chunk_idx, n_tokens, chunk_text): overlapping token
    windows per document — the context-window chunking an embedding /
    retrieval / training pipeline runs before vectorizing long text.

    Window starts step by ``stride``; the final window is kept only if it
    reaches past the previous window's end (no chunk that is a suffix of
    its predecessor), so every token appears in >= 1 chunk and the tail
    is never emitted twice.  Zero-token docs yield no rows.  Pure
    map-side: tokenize once (let-bound — texthash.py discipline),
    explode; no shuffle at any scale.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    toks = tokens_spark(text_col)
    rows = f"""element_at(transform(array({toks}), tks ->
      CASE WHEN size(tks) = 0 THEN
        CAST(array() AS ARRAY<STRUCT<n: BIGINT, txt: STRING>>)
      ELSE
        transform(
          filter(sequence(1, size(tks), {stride}),
                 s -> s = 1 OR s - {stride} + {size} <= size(tks)),
          s -> named_struct(
            'n', CAST(size(slice(tks, s, {size})) AS BIGINT),
            'txt', array_join(slice(tks, s, {size}), ' ')))
      END), 1)"""
    return (
        spread(docs)
        .select("doc_id", F.posexplode(F.expr(rows)).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.n").alias("n_tokens"),
            F.col("c.txt").alias("chunk_text"),
        )
    )


def sample_rate_case_sql(
    rates: Mapping[str, int], default_ppt: int, stratum_col: str
) -> str:
    """CASE expression mapping stratum -> per-mille keep rate.  The
    syntax is shared Spark/DuckDB, so both engines embed the SAME string
    — they can only agree or fail together (texthash.py discipline)."""
    for s, r in rates.items():
        if "'" in s:
            raise ValueError(f"stratum value {s!r} would break the SQL literal")
        if not 0 <= int(r) <= SAMPLE_MOD:
            raise ValueError(f"rate for {s!r} must be 0..{SAMPLE_MOD}, got {r}")
    if not rates:  # a WHEN-less CASE is a parse error on both engines
        return str(int(default_ppt))
    arms = " ".join(
        f"WHEN '{s}' THEN {int(r)}" for s, r in sorted(rates.items())
    )
    return f"CASE {stratum_col} {arms} ELSE {int(default_ppt)} END"


def sample_stratified(
    docs: "DataFrame",
    rates: Mapping[str, int],
    *,
    default_ppt: int = 0,
    key_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = SAMPLE_SALT,
) -> "DataFrame":
    """(doc_id, stratum, bucket) for every kept document: keep iff
    ``md5-hash(salt || key) mod 1000 < rates[stratum]`` (``default_ppt``
    for strata not in ``rates``).  Deterministic, map-side only, and
    stable under corpus growth — a doc's keep/drop never changes when
    other docs arrive, which is what makes the sample re-computable
    incrementally at 100 TB."""
    keyed = f"concat('{salt}', cast({key_col} as string))"
    bucket = f"{h60_spark(keyed)} % {SAMPLE_MOD}"
    rate = sample_rate_case_sql(rates, default_ppt, stratum_col)
    return (
        spread(docs)
        .withColumn("bucket", F.expr(bucket))
        .filter(F.expr(f"bucket < ({rate})"))
        .select(key_col, F.col(stratum_col).alias("stratum"), "bucket")
    )
