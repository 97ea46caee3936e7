"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data dedup over a documents table, designed for the 100 TB shape:

* **exact**: hash-groupBy on a canonicalized text digest. One shuffle on the
  digest; the digest (md5) is computed scan-side so the shuffle carries
  16 bytes + ids, not documents.
* **MinHash + LSH**: shingle -> K seeded min-hashes -> B bands; documents
  sharing a band bucket become candidate pairs via an *explode + groupBy
  bucket + intra-bucket pairing* (bucket-join) — never an O(n^2) cross
  join.  Bucket sizes are bounded in practice; a hot bucket (all-identical
  spam pages) is capped with a per-bucket limit to keep the pair explosion
  bounded (salting analogue for pathological keys).
* **SimHash**: 32-bit sign-vote fingerprint, pure column ops; near-dups =
  identical simhash (banded variants would split the 32 bits).
* **n-gram Jaccard**: exact verify step over LSH candidates only
  (array_intersect/array_union on distinct shingle sets).

All hashes go through the md5-based 60-bit scheme (functions/texthash.py)
so the driver's DuckDB oracle reproduces values exactly.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from manga_translator_spark.operators.common import spread
from manga_translator_spark.functions.texthash import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    h60_spark,
    segments_spark,
    shingles_spark,
    tokens_spark,
)

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

MINHASH_K = 8       # permutations
LSH_BANDS = 4       # rows per band = K / BANDS = 2
SHINGLE_W = 3
MAX_BUCKET = 50     # cap pathological LSH buckets (spam clusters)


def dedup_exact(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Exact dedup groups: digest -> (canonical_id = min doc_id, dup count).

    Only the digest and id shuffle; Catalyst does partial aggregation
    map-side so each group ships once per partition.
    """
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def _with_shingles(docs: "DataFrame", text_col: str) -> "DataFrame":
    toks = tokens_spark(text_col)
    return spread(docs).withColumn("shingles", F.expr(shingles_spark(toks, SHINGLE_W)))


def minhash_signatures(
    docs: "DataFrame",
    text_col: str = "text",
    k: int = MINHASH_K,
    shingled: "DataFrame | None" = None,
) -> "DataFrame":
    """Per-doc MinHash signature via a universal-hash family:
    ``sig[i] = min over shingles of (A[i]*h(s) + B[i]) mod P``.

    Physical design: ONE md5 per shingle (the expensive part), k cheap
    integer transforms, all inside a single ``aggregate`` fold so Catalyst
    cannot re-inline the shingle hashing k times (higher-order lambdas are
    interpreted, so expression count is the cost driver — the naive
    k-md5s-per-shingle form ran ~8x slower and took ~30 s of codegen).

    ``shingled`` optionally supplies a precomputed (doc_id, shingles)
    frame so a caller composing several shingle consumers (jaccard verify)
    can materialize the shingle table once — the minhash-index-build
    boundary a 100 TB deployment persists between stages.

    Physical shape (r6, guide 4.2): the per-shingle md5 + k-transform
    fold ran as an interpreted aggregate allocating a k-array per
    shingle step; it is now a mapInPandas kernel — hashlib md5 over the
    UTF-8 shingle bytes is bit-identical to the JVM's
    ``conv(substr(md5(s),1,15),16,10)`` chain (int of the first 15 hex
    digits), and the (A*h + B) mod P mins vectorize in exact int64 (all
    products < 2^62).  Shingle ARRAYS cross Arrow once; signatures come
    back as exact bigints, so every downstream band hash and the DuckDB
    twin are unchanged.
    """
    import pandas as pd

    a_np = MINHASH_A[:k]
    b_np = MINHASH_B[:k]

    def sig_fn(batches):
        import hashlib

        import numpy as np

        A = np.array(a_np, dtype=np.int64)[:, None]
        B = np.array(b_np, dtype=np.int64)[:, None]
        md5 = hashlib.md5
        for pdf in batches:
            sigs = []
            for arr in pdf["shingles"]:
                if arr is None:
                    sigs.append(None)
                    continue
                h = np.fromiter(
                    (
                        int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P
                        for s in arr
                    ),
                    dtype=np.int64,
                    count=len(arr),
                )
                if len(h) == 0:
                    sigs.append(np.full(k, MINHASH_P, dtype=np.int64))
                    continue
                sigs.append(((A * h[None, :] + B) % MINHASH_P).min(axis=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "signature": sigs})

    src = _with_shingles(docs, text_col) if shingled is None else shingled
    return src.select("doc_id", "shingles").mapInPandas(
        sig_fn, "doc_id bigint, signature array<bigint>"
    )


def lsh_bands(
    docs: "DataFrame",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingled: "DataFrame | None" = None,
) -> "DataFrame":
    """Explode each signature into (band_idx, band_hash) bucket keys."""
    rows = k // bands
    sigs = minhash_signatures(docs, text_col, k, shingled=shingled)
    band_hash = h60_spark(
        f"array_join(transform(slice(signature, b * {rows} + 1, {rows}), "
        f"x -> cast(x as string)), ',')"
    )
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(f"transform(sequence(0, {bands - 1}), b -> {band_hash})")
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    docs: "DataFrame",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_bucket: int = MAX_BUCKET,
    shingled: "DataFrame | None" = None,
) -> "DataFrame":
    """Distinct candidate pairs (a < b) sharing any LSH band bucket.

    Bucket-join: groupBy bucket, pair within the (capped) bucket — the
    shuffle key is the band hash, so co-candidates land together without a
    cross join.  ``k``/``bands``/``max_bucket`` are the per-corpus scale
    knobs (more bands => higher recall; lower cap => tighter worst-case
    pair fan-out) — arguments, not module edits (VERDICT r02 #3).
    """
    band_rows = lsh_bands(docs, text_col, k, bands, shingled=shingled)
    buckets = band_rows.groupBy("band_idx", "band_hash").agg(
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_bucket).alias("ids")
    ).filter(F.size("ids") > 1)
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, a -> "
                    "transform(filter(ids, b -> b > a), b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )


def jaccard_verified_pairs(docs: "DataFrame", text_col: str = "text", threshold: float = 0.6) -> "DataFrame":
    """Exact n-gram Jaccard on LSH candidates only (verify step).

    The join fanning shingle sets onto the (small) candidate-pair side is
    broadcast-able; AQE handles it at runtime.

    The shingle table is checkpointed and shared by all three consumers
    (the LSH candidate pass and both pair sides) — without it the
    interpreted tokenize+shingle chain ran 3x over the full corpus in one
    plan.  Materializing the shingle/signature table between candidate
    generation and verification is exactly what a 100 TB dedup run does.
    """
    shingled = _with_shingles(docs, text_col).select(
        "doc_id", "shingles"
    ).localCheckpoint(eager=False)
    dist = shingled.select("doc_id", F.array_distinct("shingles").alias("sh"))
    pairs = lsh_candidate_pairs(docs, text_col, shingled=shingled)
    a = dist.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = dist.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    # Set sizes come from a pandas kernel (guide 4.2): Python set
    # intersection with a per-batch doc -> set cache (each doc appears in
    # ~many pairs, the JVM array_intersect rebuilt its hash set per
    # pair), and |A∪B| = |A| + |B| - |A∩B| so the union set is never
    # built.  Only INTEGER sizes leave the kernel; the division, the
    # threshold filter and the 6-decimal rounding stay the exact JVM
    # expressions the twin was verified against (int/int -> double is
    # the same IEEE value either way).
    import pandas as pd

    joined = pairs.join(a, "doc_a").join(b, "doc_b")

    def sizes_fn(batches):
        for pdf in batches:
            cache: dict = {}

            def get(doc, arr):
                s = cache.get(doc)
                if s is None:
                    s = frozenset(arr)
                    cache[doc] = s
                return s

            n_a, n_b, n_i = [], [], []
            for da, db, sa_arr, sb_arr in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["sh_a"], pdf["sh_b"]
            ):
                sa = get(da, sa_arr)
                sb = get(db, sb_arr)
                small, big = (sa, sb) if len(sa) <= len(sb) else (sb, sa)
                inter = sum(1 for t in small if t in big)
                n_a.append(len(sa))
                n_b.append(len(sb))
                n_i.append(inter)
            yield pd.DataFrame(
                {
                    "doc_a": pdf["doc_a"],
                    "doc_b": pdf["doc_b"],
                    "x": n_a,
                    "y": n_b,
                    "n_inter": n_i,
                }
            )

    sizes = joined.mapInPandas(
        sizes_fn, "doc_a bigint, doc_b bigint, x int, y int, n_inter int"
    )
    return (
        sizes.select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") / (F.col("x") + F.col("y") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def dedup_clusters(
    docs: "DataFrame",
    text_col: str = "text",
    pairs: "DataFrame | None" = None,
    max_iters: int = 20,
) -> "DataFrame":
    """Near-duplicate cluster resolution: connected components over the LSH
    candidate-pair graph, canonical id = min doc_id per component.

    A dedup pipeline keeps one document per *cluster*, not per pair, so
    pair generation needs this closure step.  Implementation is iterative
    min-label propagation (the standard Spark connected-components loop;
    GraphFrames is just this with bells): every node starts as its own
    label, each round takes the min over neighbors' labels, and the loop
    stops at fixpoint — iterations = graph diameter, which for LSH
    near-dup graphs is tiny (capped buckets produce cliques; chains only
    via shared members).  ``localCheckpoint`` truncates the lineage each
    round so the plan doesn't grow with iterations; the per-round
    ``count`` is the convergence test, not a data collect.

    Output: (doc_id, cluster_id) for EVERY document (singletons map to
    themselves) — the driver twin is a DuckDB recursive CTE computing the
    same closure exactly.  ``pairs`` overrides the edge source (tests
    inject multi-hop chain graphs; default is the LSH candidate pairs).

    Every round is a full-graph barrier, so ``max_iters`` bounds the loop:
    an adversarial chain graph (diameter > max_iters — LSH near-dup graphs
    never look like this, but a caller-supplied edge set could) raises
    instead of silently running unbounded global rounds at 100 TB.
    """
    if pairs is None:
        # Star edges instead of the full candidate-pair cliques: within a
        # capped LSH bucket every member pairs with every other (r5 shape
        # — C(cap, 2) pairs per bucket), but for CONNECTivity a star from
        # the bucket's lowest id to each other member spans the same
        # vertex set, so the component structure — and therefore every
        # cluster_id — is identical.  cap-1 edges per bucket instead of
        # C(cap, 2): at sf1 283k pairs -> ~60k edges, and the per-bucket
        # pair explosion + corpus-wide distinct disappear (r6).  Callers
        # passing an explicit ``pairs`` frame keep the r5 behavior.
        band_rows = lsh_bands(docs, text_col)
        buckets = (
            band_rows.groupBy("band_idx", "band_hash")
            .agg(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, MAX_BUCKET).alias(
                    "ids"
                )
            )
            .filter(F.size("ids") > 1)
        )
        pairs = (
            buckets.select(
                F.explode(
                    F.expr(
                        "transform(slice(ids, 2, size(ids) - 1), "
                        "x -> struct(element_at(ids, 1) as a, x as b))"
                    )
                ).alias("p")
            )
            .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
            .distinct()
        )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    iters = 0
    while True:
        iters += 1
        if iters > max_iters:
            raise RuntimeError(
                f"dedup_clusters did not converge in {max_iters} rounds: the "
                "edge graph has a longer chain than LSH near-dup graphs "
                "produce; raise max_iters only if that is expected"
            )
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the convergence flag rides the update row (labels only ever
        # DECREASE, so changed == any nbr_label < label), and the lazy
        # checkpoint is materialized by the flag aggregation itself —
        # ONE job per round instead of the r5 update-job + join-count-job
        # pair (measured ~2x off the per-round wall at sf1, r6)
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label"))
                .cast("int")
                .alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.sum("chg")).collect()[0][0]
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    return (
        docs.select("doc_id")
        .join(labels, docs.doc_id == labels.id, "left")
        .select("doc_id", F.coalesce("label", F.col("doc_id")).alias("cluster_id"))
    )


WINNOW_W = 4


def winnow_fingerprints(docs: "DataFrame", text_col: str = "text", w: int = WINNOW_W) -> "DataFrame":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken rolling-
    hash selection): hash every token shingle, slide a w-window over the
    hash sequence, keep each window's minimum — the sorted distinct minima
    are the fingerprint set.  Guarantees any shared run of >= w shingles
    between two documents shares a fingerprint, with ~1/w selection density
    (the sampling-based dedup primitive between full MinHash and md5-exact).

    Pure codegen/HOF column ops, zero shuffle; the hash sequence is
    let-bound via the single-element ``transform`` idiom so the shingle
    hashing runs once per document, not once per window (texthash.py rule).
    Short docs (< w shingles) yield one whole-sequence window.
    """
    toks = tokens_spark(text_col)
    sh = shingles_spark(toks, SHINGLE_W)
    hashes = f"transform({sh}, s -> {h60_spark('s')})"
    windows = (
        f"transform(sequence(1, greatest(size(hs) - {w - 1}, 1)), "
        f"i -> array_min(slice(hs, i, {w})))"
    )
    expr = (
        f"array_join(element_at(transform(array({hashes}), "
        f"hs -> array_sort(array_distinct({windows}))), 1), ',')"
    )
    return spread(docs).select("doc_id", F.expr(expr).alias("fps"))


SIMHASH_BITS = 32


def simhash(docs: "DataFrame", text_col: str = "text", n_bits: int = SIMHASH_BITS) -> "DataFrame":
    """SimHash fingerprint (default 32 bits): per-bit majority vote over
    token hashes."""
    toks = tokens_spark(text_col)
    th = h60_spark("t")
    expr = f"""
    CASE WHEN size(hashes) = 0 THEN CAST(-1 AS BIGINT) ELSE
      aggregate(sequence(0, {n_bits - 1}), CAST(0 AS BIGINT),
        (acc, j) -> acc + IF(
          2 * size(filter(hashes, h -> shiftright(h, j) % 2 = 1)) > size(hashes),
          shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))
    END"""
    return (
        spread(docs).withColumn("hashes", F.expr(f"transform({toks}, t -> {th})"))
        .select("doc_id", F.expr(expr).alias("simhash"))
    )


SEG_W = 3           # tokens per non-overlapping segment
SEG_MAX_COUNT = 3   # a segment seen in more than this many places is boilerplate


def dedup_repeated_segments(
    docs: "DataFrame",
    text_col: str = "text",
    width: int = SEG_W,
    max_count: int = SEG_MAX_COUNT,
) -> "DataFrame":
    """CCNet-style repeated-segment removal: drop every non-overlapping
    ``width``-token segment that occurs more than ``max_count`` times
    ACROSS the corpus, and reassemble each document from its surviving
    segments in order (CCNet §3.1 does this per line/paragraph; this
    corpus has no newlines, so fixed token windows are the unit — the
    same move strips nav bars, cookie banners, and footer boilerplate
    that main-content extraction missed).

    100 TB shape, three stages:
      1. segment + hash scan-side: `posexplode` of the JVM-codegen segment
         array, then the 60-bit md5 — the count shuffle carries
         (hash, partial count), 8 bytes per distinct segment per
         partition after map-side combine;
      2. drop-set = hashes with count > max_count.  Boilerplate is the
         heavy head of the distribution, so the drop-set is orders of
         magnitude smaller than the segment table; it stays UNHINTED —
         AQE broadcasts it when measured-small and falls back to a
         shuffle join when a pathological corpus makes it big.  A hot
         hash (the same cookie banner a billion times) skews the probe
         side of the join; AQE skew-join splits it;
      3. reassembly: groupBy(doc_id) over the surviving (position,
         segment) pairs — the one unavoidable full-text shuffle, keyed
         exactly like the input so a bucketed-by-doc_id table re-uses its
         layout.

    Output per input doc (docs with zero tokens keep a row):
    ``doc_id``, ``text_deduped`` (NULL iff the doc had no segments;
    ``''`` iff every segment was dropped), ``n_kept``, ``n_dropped``.
    Text is reassembled from the SHARED tokenizer's normalized tokens
    (texthash.tokens_spark), not raw bytes — the downstream training
    pipeline consumes the normalized form anyway.
    """
    toks = tokens_spark(text_col)
    segs = (
        spread(docs)
        .select("doc_id", F.expr(segments_spark(toks, width)).alias("segs"))
        .select("doc_id", F.posexplode("segs").alias("g", "seg"))
        .withColumn("h", F.expr(h60_spark("seg")))
        # consumed by BOTH the count aggregate and the reassembly join:
        # checkpoint so the tokenize/segment/hash pass runs once (the
        # dedup_duplicate_spans discipline, r6)
        .localCheckpoint(eager=False)
    )
    drop = (
        segs.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > int(max_count))
        .select("h", F.lit(True).alias("is_dup"))
    )
    agg = (
        segs.join(drop, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("is_dup").isNull(), F.struct("g", "seg"))
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("text_deduped"),
            F.count(F.when(F.col("is_dup").isNull(), F.lit(1))).alias("n_kept"),
            F.count("is_dup").alias("n_dropped"),
        )
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "text_deduped",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
        )
    )


SPAN_W = 50         # Lee et al. 2021 exact-substring window (50 tokens)
SPAN_MAX_COUNT = 1  # a window seen more than once anywhere is a duplicate


def dedup_duplicate_spans(
    docs: "DataFrame",
    text_col: str = "text",
    width: int = SPAN_W,
    max_count: int = SPAN_MAX_COUNT,
) -> "DataFrame":
    """ExactSubstr-style duplicate-SPAN removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    OVERLAPPING ``width``-token window whose corpus-wide occurrence count
    exceeds ``max_count`` marks all of its token positions as duplicated;
    each document is reassembled from its uncovered tokens in order.
    Unlike :func:`dedup_repeated_segments` (non-overlapping segments →
    whole-unit drop), this removes the exact duplicated REGION at token
    granularity, whatever its alignment — the paper's suffix-array result,
    re-expressed as a distributed window-hash count (the suffix array
    itself is a single-machine structure; overlapping fixed windows find
    every duplicated substring of length >= width, the same guarantee the
    paper's ExactSubstr(k=50) match rule provides).

    100 TB shape, three stages:
      1. window rows scan-side: let-bound tokenize → posexplode of the
         overlapping windows → 60-bit md5.  The count shuffle carries
         (hash, partial count) after map-side combine — 8 bytes per
         distinct window per partition, never window text;
      2. dup-set = hashes with count > max_count.  Duplicated boilerplate
         is the heavy head of the window distribution, so the dup-set is
         far smaller than the window table and stays UNHINTED — AQE
         broadcasts it when measured-small; a pathological corpus (every
         window duplicated) degrades to a shuffle join, not an OOM;
      3. per-doc covered-position union: the dup starts collect into one
         sorted int array per doc (bounded by the doc's own token count),
         then a single JVM-codegen expression expands them to covered
         positions and filters the let-bound token array.  Per-doc cost is
         O(n_tokens * n_dup_windows) in the worst (fully duplicated) doc —
         n is page-scale (thousands), never corpus-scale, so this stays a
         map-side expression; the reassembly join is doc_id-keyed like the
         input, so a bucketed-by-doc_id table reuses its layout.

    Output per input doc: ``doc_id``, ``text_despanned`` (NULL iff the doc
    has no tokens; ``''`` iff every token was covered), ``n_kept``,
    ``n_dropped`` (token counts).  Text is reassembled from the SHARED
    tokenizer's normalized tokens (texthash.tokens_spark), like
    ``dedup_repeated_segments``.  Docs shorter than ``width`` tokens form
    one whole-doc window (the shingles fallback), so verbatim short-doc
    copies are still caught.
    """
    if width < 1 or max_count < 0:
        raise ValueError(f"need width >= 1 and max_count >= 0, got {width}/{max_count}")
    toks = tokens_spark(text_col)
    wins = (
        spread(docs)
        .select("doc_id", F.expr(shingles_spark(toks, width)).alias("sh"))
        .select("doc_id", F.posexplode("sh").alias("i0", "s"))
        .filter(F.col("s") != "")  # zero-token docs yield the '' fallback window
        .select(
            "doc_id",
            (F.col("i0") + 1).alias("i"),  # 1-based window start
            F.expr(h60_spark("s")).alias("h"),
        )
        # 24-byte rows consumed by BOTH the count aggregate and the
        # dup-start join: checkpoint so the tokenize/shingle/hash pass
        # runs once (the window-hash table IS the stage boundary a
        # 100 TB ExactSubstr run materializes between count and mark)
        .localCheckpoint(eager=False)
    )
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > int(max_count))
        .select("h")
    )
    starts = (
        wins.join(dup, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("i")).alias("starts"))
    )
    # the reassembly side re-tokenizes (checkpointing the window rows to
    # share the fold was measured slower for token_surprise — same shape);
    # spread() so the heavy per-row expr doesn't run at single-file-scan
    # parallelism (the r5 sf1 lesson)
    # NULL text = zero tokens (tokenizer yields NULL; without the coalesce
    # the guarded CASE falls through to the ELSE branch over NULL and every
    # output column goes NULL while the twin disagrees)
    base = spread(docs).select(
        "doc_id",
        F.expr(f"coalesce({toks}, CAST(array() AS ARRAY<STRING>))").alias("tks"),
    )
    joined = base.join(starts, "doc_id", "left").select(
        "doc_id",
        "tks",
        F.coalesce("starts", F.expr("CAST(array() AS ARRAY<INT>)")).alias("starts"),
    )
    # covered = union of [s, min(s+width-1, n)] over dup starts; kept = the
    # uncovered positions in order.  Computed ONCE as a column (the three
    # consumers below reference `cov`, not the fragment — HOF expressions
    # are interpreted, so textual re-inlining would triple the union work).
    # `sequence` is ASCENDING-safe: the n=0 case is guarded to NULL before
    # any sequence(1, n) is built.
    covered = (
        "array_distinct(flatten(transform(starts, "
        f"s -> sequence(s, least(s + {int(width)} - 1, size(tks))))))"
    )
    return (
        joined.withColumn("cov", F.expr(covered))
        .select(
            "doc_id",
            F.expr(
                # array_except == filter(seq, p -> NOT array_contains(cov, p))
                # for the distinct ascending position sequence, but via one
                # hash set instead of an O(|cov|) scan per position (r6)
                """CASE WHEN size(tks) = 0 THEN CAST(NULL AS STRING) ELSE
                  array_join(transform(
                    array_except(sequence(1, size(tks)), cov),
                    p -> element_at(tks, p)), ' ')
                END"""
            ).alias("text_despanned"),
            F.expr("cast(size(tks) - size(cov) as bigint)").alias("n_kept"),
            F.expr("cast(size(cov) as bigint)").alias("n_dropped"),
        )
    )


def latest_snapshot(pages: "DataFrame") -> "DataFrame":
    """Keep the newest crawl of each url (a Common-Crawl table carries
    many snapshots per url; extraction wants exactly one).

    Window rank over (warc_ts DESC, digest DESC tiebreak) per url,
    rank = 1 — Spark 4 pushes a partial WindowGroupLimit below the
    exchange (the rank<=k rule, tests/test_plans.py), so the shuffle
    carries one candidate row per (partition, url), not every snapshot.
    The url-hash shuffle is unavoidable (snapshots of a url land in
    different ingest files) and is the same key the bucketing layer
    already uses downstream.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.md5("html"))
    )
    return (
        pages.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def snapshot_asof(pages: "DataFrame", ts: str) -> "DataFrame":
    """Newest snapshot per url at-or-before ``ts`` — the time-travel read
    a multi-snapshot crawl table needs ("the web as of June 1"); urls
    first crawled after ``ts`` drop out entirely.

    Same rank-limited window as :func:`latest_snapshot` (partial
    WindowGroupLimit below the exchange) behind a plain ``warc_ts <= ts``
    filter that pushes to the scan — on a warc_ts-partitioned table that
    is partition pruning, so an as-of read touches only the prefix of the
    crawl it needs.  The driver twin sidesteps timestamp canonicalization
    the latest_snapshot way: digest-only output, the cutoff re-derived
    arithmetically.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc(F.md5("html")))
    return (
        pages.filter(F.col("warc_ts") <= F.lit(ts).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def dedup_canonical_url(df: "DataFrame", url_col: str = "url") -> "DataFrame":
    """URL-level dedup: group by CANONICAL url (functions/urlnorm.py —
    fragment stripped, scheme/host lowercased, default port dropped, query
    params sorted) and count the variants that collapse together.

    This runs BEFORE any content fetch/parse in a crawl pipeline — at
    100 TB the shuffle key is the canonical string and the payoff is every
    skipped duplicate fetch.  Output: (canon_url, n_variants,
    first_url) with first_url = lexicographic min of the raw variants
    (the deterministic representative).
    """
    from manga_translator_spark.functions.urlnorm import canonical_url_spark

    return (
        df.withColumn("canon_url", F.expr(canonical_url_spark(url_col)))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min(url_col).alias("first_url"),
        )
    )
