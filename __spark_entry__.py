"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one entry per implemented operator family
(SURVEY.md §2.5 relational coverage + the training-data operators:
dedup, similarity search, text analysis).  ``oracle_sql()`` carries the
DuckDB twin for every SQL-expressible query, built from the SAME constants
and hash fragments as the Spark side (manga_translator_spark/functions/
texthash.py) so values agree exactly.  Aggregates over doubles are rounded
on both sides to absorb summation-order ulps.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from manga_translator_spark.functions.texthash import (
    h60_duck,
    h60_spark,
    segments_duck,
    shingles_duck,
    tokens_duck,
)
from manga_translator_spark.operators import curation, dedup, similarity, text_analysis
from manga_translator_spark.operators.text_analysis import LANGS, STOPWORDS
from manga_translator_spark.plans.pipeline import PipelineConfig, extract


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SHIPPED: set[str] = set()
_PKG_ARCHIVE: str | None = None


def _pkg_archive() -> str:
    """Build the package zip ONCE per process.  Re-zipping per call is a
    latent crash: a second ``addPyFile`` of the same FILENAME with
    different bytes (e.g. the source tree was edited between two sessions
    of one long-running process) fails JVM-side with "exists and does not
    match contents" — one archive per process makes every re-add
    byte-identical, which Spark treats as a no-op."""
    global _PKG_ARCHIVE
    if _PKG_ARCHIVE is None:
        import atexit
        import shutil
        import tempfile

        pkg_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "manga_translator_spark"
        )
        staging = tempfile.mkdtemp(prefix="mts_pyfiles_")
        zip_base = os.path.join(staging, "manga_translator_spark_pkg")
        _PKG_ARCHIVE = shutil.make_archive(
            zip_base, "zip",
            root_dir=os.path.dirname(pkg_dir), base_dir="manga_translator_spark",
        )
        # cleanup at process exit, NOT immediately: executors fetch (and on
        # later stages re-verify) the dependency from THIS path — deleting
        # it eagerly made a second session's re-ship fail with "exists and
        # does not match contents" (empirically; the zip must outlive the
        # contexts)
        atexit.register(shutil.rmtree, staging, ignore_errors=True)
    return _PKG_ARCHIVE


def _ensure_shipped(spark: SparkSession) -> None:
    """Make manga_translator_spark importable on executor Python workers.

    The driver imports this module via sys.path, but Spark's Python workers
    inherit neither the driver's sys.path mutations nor its cwd — a session
    created outside /root/repo fails to unpickle the mapInPandas closures.
    Shipping a zip via addPyFile is the same mechanism scripts/submit.sh
    uses (--py-files) and is idempotent per session.  Keyed by
    ``applicationId`` (stable per JVM context), not ``id()`` of the Python
    wrapper — distinct wrapper objects for one context must not re-ship.
    """
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(_pkg_archive())
    _SHIPPED.add(key)


# --------------------------------------------------------------------------
# flagship: pages synthesized deterministically from the documents table,
# run through the full extraction pipeline (detect -> classify -> clean ->
# recognize -> assemble).
# --------------------------------------------------------------------------


# Synthesized-page template, shared verbatim by the Spark builder and the
# DuckDB twins (extract_pipeline, stream_dedup_digests) — single source of
# truth so the two sides can only agree or fail together.  Contains no
# single quotes, so it embeds into SQL literals directly.
_PAGE_PRE = (
    '<html><head><meta charset="utf-8"><title>d</title></head><body>'
    '<nav class="topnav"><a href="/x">home</a> nav menu links</nav>'
    "<article><p>"
)
_PAGE_POST = '</p></article><footer><p>© footer</p></footer></body></html>'


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit(_PAGE_PRE), F.col("text"), F.lit(_PAGE_POST)), "utf-8"
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    pages = _pages_from_documents(spark, "/root/testdata/sf0.001")
    out = extract(pages, PipelineConfig())
    return out.select("url", "extracted_text", "n_blocks", F.to_json("spans").alias("spans_json"))


def _q_extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full-pipeline check with a DuckDB twin: the synthesized page template
    # is fixed, so the expected extraction is SQL-expressible (see
    # oracle_sql()["extract_pipeline"]).  Byte-identity against the
    # single-process oracle on *arbitrary* HTML (incl. malformed/charset
    # edge pages) is covered separately by tests/test_pipeline.py.
    _ensure_shipped(spark)
    pages = _pages_from_documents(spark, sf_dir)
    return extract(pages, PipelineConfig()).select(
        "url", "extracted_text", "n_blocks", F.to_json("spans").alias("spans_json")
    )


# --------------------------------------------------------------------------
# relational operator coverage (SURVEY.md §2.5) over the TPC-H-ish tables
# --------------------------------------------------------------------------


def _q_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_revenue_by_nation(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    n = _t(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def _q_order_fill(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_orderkey").agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    return (
        o.join(agg, o.o_orderkey == agg.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("qty", F.lit(0.0)).alias("total_qty"),
        )
    )


def _q_cust_semi(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def _q_cust_anti(spark, sf):
    # customers with no large order — non-trivial anti-join on the filtered side
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def _q_running_supplier(spark, sf):
    from pyspark.sql import Window as W

    li = _t(spark, sf, "lineitem")
    # l_quantity is a REQUIRED final tiebreaker: the synthetic lineitem is
    # not TPC-H-unique — (suppkey, shipdate, orderkey, linenumber) ties
    # exist (1 at sf0.1, 10 at the scaled sf1), and a ROWS running sum
    # over an underdetermined order lets each engine pick its own tie
    # order (caught by the r5 sf1 gate: 3.0-off running sums).  With
    # quantity last, swapping rows tied on EVERYTHING leaves the emitted
    # multiset unchanged, so the result is deterministic.
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


def _q_top_order_per_cust(spark, sf):
    from pyspark.sql import Window as W

    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("top_price"))
    )


def _q_part_words(spark, sf):
    p = _t(spark, sf, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _q_orders_by_month(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def _q_order_lines_collected(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.col("l_linenumber").cast("string"))), ","
        ).alias("line_nums")
    )


def _q_returns_cube(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def _q_segment_set_ops(spark, sf):
    c = _t(spark, sf, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    d = c.filter(F.col("c_nationkey") < 5).select("c_custkey")
    return a.union(b).distinct().subtract(d)


def _q_events_json(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.max(F.get_json_object("props", "$.k").cast("bigint")).alias("max_k"),
    )


def _q_user_sessions(spark, sf):
    from pyspark.sql import Window as W

    # NTZ -> instant uses the session tz; pin UTC so a non-UTC driver
    # session can't shift gaps across DST transitions vs DuckDB's epoch_us.
    # The pin is scoped to plan *analysis* (timezone binds into the resolved
    # expressions eagerly) and restored after — no session-wide side effect.
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        e = _t(spark, sf, "events")
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        # integer microseconds: exact on both engines (unix_timestamp truncates)
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ -> UTC instant
        gap = ts_us - F.lag(ts_us).over(w)
        return (
            e.withColumn("new_session", F.when(gap.isNull() | (gap > 600 * 1_000_000), 1).otherwise(0))
            .groupBy("user_id")
            .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


# --------------------------------------------------------------------------
# training-data operators over documents / embeddings
# --------------------------------------------------------------------------


def _q_doc_tokens(spark, sf):
    return text_analysis.token_stats(_t(spark, sf, "documents"))


def _q_doc_quality(spark, sf):
    return text_analysis.quality_features(_t(spark, sf, "documents"))


def _q_doc_langid(spark, sf):
    return text_analysis.lang_id(_t(spark, sf, "documents"))


def _q_doc_fingerprint(spark, sf):
    return text_analysis.fingerprint(_t(spark, sf, "documents"))


def _q_dedup_exact(spark, sf):
    return dedup.dedup_exact(_t(spark, sf, "documents"))


def _q_minhash(spark, sf):
    sigs = dedup.minhash_signatures(_t(spark, sf, "documents"))
    return sigs.select(
        "doc_id",
        F.expr("array_join(transform(signature, x -> cast(x as string)), ',')").alias("sig"),
    )


def _q_lsh_pairs(spark, sf):
    return dedup.lsh_candidate_pairs(_t(spark, sf, "documents"))


def _q_jaccard_pairs(spark, sf):
    return dedup.jaccard_verified_pairs(_t(spark, sf, "documents"))


def _q_simhash(spark, sf):
    return dedup.simhash(_t(spark, sf, "documents"))


def _q_winnow(spark, sf):
    return dedup.winnow_fingerprints(_t(spark, sf, "documents"))


def _q_dedup_clusters(spark, sf):
    return dedup.dedup_clusters(_t(spark, sf, "documents"))


def _q_segment_dedup(spark, sf):
    # operator defaults (SEG_W=3, SEG_MAX_COUNT=3) — at w=3 the synthetic
    # corpus repeats ~3% of segments more than 3 times (w=2 is degenerate:
    # nearly every bigram repeats; w>=5 drops nothing), so the query is
    # non-vacuous without being destructive
    return dedup.dedup_repeated_segments(_t(spark, sf, "documents"))


def _q_gopher_quality(spark, sf):
    return text_analysis.gopher_quality(_t(spark, sf, "documents"))


def _q_doc_wrap_lines(spark, sf):
    return text_analysis.wrap_lines(_t(spark, sf, "documents"))


# Hyphenated-wrap driver payloads: the synthetic corpus is short-word text
# that never triggers a split, so the query injects one deterministic
# phrase per doc (doc_id % len) from a FIXED lexicon chosen to exercise
# every kernel behavior — split-fills, the pure-wrap-impossible rescue, a
# no-version failure (fits=0), the exception word, and no-split text.  The
# twin maps doc_id to the kernel-precomputed expected wrap of each phrase
# (the lexicon is a code constant, so oracle_sql() can run the Python
# kernel over it without touching data — the scrub_pii payload
# discipline), which makes the hash gate prove the distributed mapInPandas
# path reproduces the Liang kernel byte-exactly.
_HYPHEN_PHRASES = (
    "the unbelievable hyphenation committee",
    "transformation running wrestling",
    # 'xylophonically' (14 chars, no Liang points) has NO fitting version
    # at width 12 -> the whole wrap fails: this row exercises the
    # fits=0 / NULL branch of BOTH the operator and the twin (r4 review:
    # the previous 'xylophones impossible' phrase wrapped fine, leaving
    # the NULL branch dead in the gate)
    "xylophonically impossible",
    "plain short words stay the same",
    "present tense words",
    "scan merge join batch window",
    "hyphenation",
    "a misspelling of transformation",
)
_HYPHEN_WIDTH = 12


def _q_doc_wrap_hyphen(spark, sf):
    _ensure_shipped(spark)  # mapInPandas kernel imports the hyphen module
    arr = "array(" + ", ".join(f"'{p}'" for p in _HYPHEN_PHRASES) + ")"
    payload = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            f"element_at({arr}, cast(doc_id % {len(_HYPHEN_PHRASES)} as int) + 1)"
        ).alias("text"),
    )
    return text_analysis.wrap_lines(payload, width=_HYPHEN_WIDTH, hyphenate=True)


def _q_enrich_dict(spark, sf):
    """T15 enricher-family driver query: the dictionary translator (the
    deterministic model-translator stand-in) applied to the documents
    text through the REGISTERED enricher, with a full value twin —
    per-token mapping fidelity is the family contract being checked."""
    from manga_translator_spark.operators.enrich import (
        TRANSLATE_LEXICON,
        make_enrich_dict,
    )

    from manga_translator_spark.operators.common import spread

    keys = ", ".join(f"'{k}'" for k, _ in TRANSLATE_LEXICON)
    # spread: two per-token HOF passes over a single-file scan otherwise
    # run on one task (r6 — the plan had no exchange at all)
    docs = spread(_t(spark, sf, "documents")).select(
        "doc_id", "text", F.col("text").alias("extracted_text")
    )
    # let-bind the key array outside the per-element lambda (CLAUDE.md
    # HOF rule — a generated array literal inside the lambda body relies
    # on constant folding to avoid per-token re-evaluation)
    return make_enrich_dict()(docs).select(
        "doc_id",
        F.col("extracted_text").alias("translated"),
        F.expr(
            f"element_at(transform(array(array({keys})), ks -> "
            "CAST(size(filter(split(text, ' '), "
            "w -> array_contains(ks, lower(w)))) AS INT)), 1)"
        ).alias("n_mapped"),
    )


def _q_doc_bpe_tokens(spark, sf):
    return text_analysis.bpe_token_stats(_t(spark, sf, "documents"))


def _q_token_surprise(spark, sf):
    return text_analysis.token_surprise(_t(spark, sf, "documents"))


def _q_surprise_buckets(spark, sf):
    # default calibrated mode: NTILE(3) terciles over the deterministic
    # doc_id % SURPRISE_CALIB_MOD sample, then the map-side CASE
    return text_analysis.surprise_buckets(_t(spark, sf, "documents"))


def _q_doc_repetition(spark, sf):
    return text_analysis.repetition_stats(_t(spark, sf, "documents"))


def _pdfs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one PDF payload per document: body run emitted FIRST in
    the content stream at y=600, title second at y=700 — extraction must
    reorder to title-then-body, so the hash gate proves layout ordering,
    not just stream replay."""
    import pandas as pd

    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.common import spread

    # spread: make_pdf zlib-compresses every payload; over a single-file
    # documents scan the whole synthesis would run on one task
    docs = spread(_t(spark, sf_dir, "documents"))

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": ["pdf://" + str(i) for i in pdf["doc_id"]],
                    "html": [
                        make_pdf(
                            [(72, 600, 11, t), (72, 700, 16, "Doc %d" % i)]
                        )
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, schema="url string, html binary")


def _q_pdf_extract(spark, sf):
    """PDF/layout parse driver query (north rule): stdlib PDF kernel over
    synthesized Flate-compressed payloads; twin reconstructs the expected
    reading-ordered extraction in SQL from the fixed template."""
    from manga_translator_spark.operators.pdf_extract import extract_pdfs

    _ensure_shipped(spark)
    return extract_pdfs(_pdfs_from_documents(spark, sf)).select(
        "url", "extracted_text", "n_blocks", F.to_json("spans").alias("spans_json")
    )


def _q_extract_routed(spark, sf):
    """Mixed html/pdf table through the router (operators/pdf_extract.
    extract_any): html template pages + pdf template pages in ONE input,
    each row extracted by exactly one branch.  Twin = UNION ALL of the
    two template twins."""
    from manga_translator_spark.operators.pdf_extract import extract_any

    _ensure_shipped(spark)
    html_pages = _pages_from_documents(spark, sf)
    pdf_pages = _pdfs_from_documents(spark, sf).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    # materialize the synthesized union ONCE before routing: extract_any's
    # two branch filters each re-execute their input — correct for a real
    # crawl scan (two pushed-down scans over disjoint rows), but a COMPUTED
    # input would run the page+pdf synthesis twice and leave the html rows
    # in the union's single scan partition.  The round-robin repartition
    # sets the parse parallelism; the checkpoint pins the rows.
    mixed = (
        html_pages.unionByName(pdf_pages)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    return extract_any(mixed).select(
        "url", "extracted_text", "n_blocks", F.to_json("spans").alias("spans_json")
    )


# messy-URL template: every doc_id yields a differently-messy spelling of
# a canonical target; collisions across doc_ids are intentional (40 hosts
# x 25 paths).  Spark and DuckDB build the SAME bytes from the same
# constants, then canonicalize with their engine's urlnorm fragment.
_MESSY_URL_SPARK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END, "
    "'://WWW.Site', CAST(doc_id % 40 AS STRING), '.COM', "
    "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END, "
    "'/page/', CAST(doc_id % 25 AS STRING), "
    "CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' "
    "WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END, "
    "CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END)"
)
_MESSY_URL_DUCK = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END || "
    "'://WWW.Site' || (doc_id % 40)::VARCHAR || '.COM' || "
    "CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END || "
    "'/page/' || (doc_id % 25)::VARCHAR || "
    "CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' "
    "WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END)"
)


# deterministic PII injection: every doc gets a known payload class so the
# scrubber has real work; Spark and DuckDB build the same injected bytes.
_PII_INJECT_SPARK = (
    "concat(text, CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN ' contact bob@example.com now' "
    "WHEN 1 THEN ' server at 10.1.2.3 up' "
    "WHEN 2 THEN ' call 555-123-4567 today' ELSE '' END)"
)
_PII_INJECT_DUCK = (
    "(text || CASE (doc_id % 4) "
    "WHEN 0 THEN ' contact bob@example.com now' "
    "WHEN 1 THEN ' server at 10.1.2.3 up' "
    "WHEN 2 THEN ' call 555-123-4567 today' ELSE '' END)"
)


# deterministic C4-rule payloads: each doc_id % 8 class trips exactly one
# rule (class 6 REPLACES the text so the too-short rule can fire; class 7
# stays clean so keep=1 is exercised).  Spark and DuckDB build identical
# injected bytes — change in lockstep.
_C4_BLOCKWORD = "spamword"
_C4_INJECT_SPARK = (
    "CASE WHEN CAST(doc_id % 8 AS INT) = 6 THEN 'tiny doc here' "
    "ELSE concat(text, CASE CAST(doc_id % 8 AS INT) "
    "WHEN 0 THEN ' function() { return; }' "
    "WHEN 1 THEN ' Lorem Ipsum dolor sit' "
    "WHEN 2 THEN ' enable JavaScript to continue' "
    "WHEN 3 THEN ' this site uses cookies' "
    "WHEN 4 THEN ' read our Privacy Policy' "
    "WHEN 5 THEN ' spamword offer expires' "
    "ELSE '' END) END"
)
_C4_INJECT_DUCK = (
    "CASE WHEN (doc_id % 8) = 6 THEN 'tiny doc here' "
    "ELSE (text || CASE (doc_id % 8) "
    "WHEN 0 THEN ' function() { return; }' "
    "WHEN 1 THEN ' Lorem Ipsum dolor sit' "
    "WHEN 2 THEN ' enable JavaScript to continue' "
    "WHEN 3 THEN ' this site uses cookies' "
    "WHEN 4 THEN ' read our Privacy Policy' "
    "WHEN 5 THEN ' spamword offer expires' "
    "ELSE '' END) END"
)


def _q_c4_filters(spark, sf):
    """C4/FineWeb heuristic rule filters over documents with injected
    payloads (the scrub_pii discipline: the raw synthetic corpus trips no
    rule, so every class is injected deterministically)."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_C4_INJECT_SPARK).alias("text")
    )
    return text_analysis.c4_rules(docs, blocklist=(_C4_BLOCKWORD,))


def _q_scrub_pii(spark, sf):
    """PII redaction over documents with injected payloads: counts on the
    pre-redaction text plus the md5 of the redacted bytes (the twin
    verifies exact redaction without shipping text)."""
    docs = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_PII_INJECT_SPARK).alias("text")
    )
    return text_analysis.scrub_pii(docs)


def _q_url_canonical_dedup(spark, sf):
    """Crawl-tier URL canonicalization + dedup: messy spellings (case,
    default ports, fragments, param order) collapse onto their canonical
    target; output counts variants per canonical url."""
    from manga_translator_spark.operators.dedup import dedup_canonical_url

    messy = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_MESSY_URL_SPARK).alias("url")
    )
    return dedup_canonical_url(messy)


def _snapshots_from_documents(spark, sf, mutate_html=None):
    """Shared multi-snapshot crawl-table fixture (r4 review: this was
    copy-pasted into three queries): one base snapshot per doc
    (warc_ts = 2025-06-01 midnight + doc_id%3600 seconds) plus a
    one-day-later re-crawl of every third doc whose html is transformed
    by ``mutate_html`` (default: append ``<!--v2-->`` bytes).  The
    arithmetic twins re-derive these constants — change them in
    lockstep."""
    base = _pages_from_documents(spark, sf).withColumn(
        "warc_ts",
        F.expr(
            "timestamp'2025-06-01 00:00:00' + make_interval(0,0,0,0,0,0, "
            "cast(substring(url, 7) as int) % 3600)"
        ),
    )
    if mutate_html is None:
        mutate_html = F.concat(F.col("html"), F.encode(F.lit("<!--v2-->"), "utf-8"))
    recrawl = (
        base.filter(F.expr("cast(substring(url, 7) as int) % 3 = 0"))
        .withColumn("warc_ts", F.expr("warc_ts + interval 1 day"))
        .withColumn("html", mutate_html)
    )
    return base.unionByName(recrawl)


def _q_latest_snapshot(spark, sf):
    """Multi-snapshot crawl table -> one (newest) row per url.  Every
    third document gets a one-day-later re-crawl with changed bytes; the
    winner's digest must be the v2 bytes for those urls and v1 otherwise
    (timestamps never leave the query — digest-only output sidesteps
    timestamp canonicalization entirely)."""
    from manga_translator_spark.operators.dedup import latest_snapshot

    snaps = _snapshots_from_documents(spark, sf)
    return latest_snapshot(snaps).select("url", F.md5("html").alias("digest"))


def _q_snapshot_asof(spark, sf):
    """As-of (time-travel) read over the multi-snapshot crawl table:
    cutoff 250 s into the crawl keeps only urls whose first snapshot
    landed by then (warc_ts = midnight + doc_id%3600 seconds), and the
    one-day-later re-crawls are all excluded — digest-only output, the
    cutoff re-derived arithmetically in the twin."""
    from manga_translator_spark.operators.dedup import snapshot_asof

    snaps = _snapshots_from_documents(spark, sf)
    return snapshot_asof(snaps, "2025-06-01 00:04:10").select(
        "url", F.md5("html").alias("digest")
    )


def _q_crawl_refresh(spark, sf):
    """Composed crawl-refresh pipeline: multi-snapshot table -> newest
    snapshot per url -> full extraction.  The re-crawl CHANGES the article
    text (' v2' suffix inside the paragraph), so the hash gate proves the
    winner's content — not just its digest — flows through extraction."""
    from manga_translator_spark.operators.dedup import latest_snapshot

    snaps = _snapshots_from_documents(
        spark,
        sf,
        mutate_html=F.encode(
            F.replace(
                F.decode("html", "utf-8"),
                F.lit("</p></article>"),
                F.lit(" v2</p></article>"),
            ),
            "utf-8",
        ),
    )
    _ensure_shipped(spark)
    return extract(latest_snapshot(snaps), PipelineConfig()).select(
        "url", "extracted_text", "n_blocks", F.to_json("spans").alias("spans_json")
    )


def _q_extract_delta(spark, sf):
    """Content-level incremental extraction: pages whose (url, digest) a
    previous run already produced are anti-joined away; the twin is the
    flagship twin restricted to the not-yet-extracted residue."""
    from manga_translator_spark.sources.lineage import extract_delta

    _ensure_shipped(spark)
    pages = _pages_from_documents(spark, sf)
    prev = pages.filter(F.expr("cast(substring(url, 7) as int) % 4 = 0")).select(
        "url", F.md5("html").alias("digest")
    )
    return extract_delta(pages, prev, PipelineConfig()).select(
        "url", "extracted_text", "n_blocks", F.to_json("spans").alias("spans_json")
    )


def _stream_dedup_input(spark, sf):
    """Synthesized pages + deterministic re-fetches (every third doc
    duplicated 1 s later under a changed url) — the streaming dedup's
    bounded replay input, SHARED by the driver query below and bench.py's
    streaming leg (single-source template discipline: the twin's
    DISTINCT-digest oracle depends on exactly this duplication scheme)."""
    pages = _pages_from_documents(spark, sf).withColumn(
        "warc_ts",
        F.expr(
            "timestamp'2025-06-01 00:00:00' + make_interval(0,0,0,0,0,0, "
            "cast(substring(url, 7) as int) % 3600)"
        ),
    )
    refetch = (
        pages.filter(F.expr("cast(substring(url, 7) as int) % 3 = 0"))
        .withColumn("url", F.concat(F.col("url"), F.lit("?re")))
        .withColumn("warc_ts", F.expr("warc_ts + interval 1 second"))
    )
    return pages.unionByName(refetch)


def _q_stream_dedup_digests(spark, sf):
    """STREAMING driver query with a full hash-checked twin: watermarked
    exact dedup (dropDuplicatesWithinWatermark keyed on the html digest)
    over synthesized pages plus deterministic re-fetches (every third doc
    duplicated 1s later under a changed url).  The output projects the
    kept rows to their digests — which row of a duplicate group survives
    depends on arrival order, but the digest SET is deterministic and
    equals DISTINCT md5(template html) over documents, so the oracle is
    plain SQL.  Runs availableNow against a staged parquet snapshot (the
    bounded-input replay of the unbounded crawl stream)."""
    import shutil
    import tempfile
    import uuid

    from manga_translator_spark.streaming.extract_stream import (
        dedup_pages_stream,
        read_pages_stream,
    )

    staged = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        _stream_dedup_input(spark, sf).write.mode("overwrite").parquet(staged + "/pages")
        qn = "stream_dedup_" + uuid.uuid4().hex
        q = (
            dedup_pages_stream(read_pages_stream(spark, staged + "/pages"))
            .writeStream.format("memory")
            .queryName(qn)
            .option("checkpointLocation", staged + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("stream_dedup_digests: availableNow run timed out")
        # materialize off the memory sink before the temp dir goes away.
        # The DISTINCT matches the twin's SELECT DISTINCT: two docs with
        # identical text whose event times straddle the 30-min watermark
        # can BOTH survive dropDuplicatesWithinWatermark across
        # micro-batches — the digest SET is the deterministic contract,
        # kept-row multiplicity is not (r3 review).
        rows = spark.table(qn).select(F.md5("html").alias("digest")).distinct()
        return spark.createDataFrame(rows.toPandas())
    finally:
        shutil.rmtree(staged, ignore_errors=True)


def _q_training_corpus(spark, sf):
    from manga_translator_spark.operators.training import training_corpus

    return training_corpus(_t(spark, sf, "documents"))


# Curation-query constants, shared by the Spark side and the DuckDB twins.
# The benchmark split is doc_id % 41 == 0 (a deterministic ~2.4% "eval
# set"); w=4 because the synthetic corpus' near-dups share 3/4-grams but
# never 5-grams — the operator default stays the published 13.
DECONTAM_BENCH_MOD = 41
DECONTAM_QW = 4
PACK_Q_CAPACITY = 512
PACK_Q_SHARDS = 8
SAMPLE_RATES = {"en": 250, "zh": 500, "es": 500, "de": 500, "fr": 500}


def _q_decontam(spark, sf):
    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.expr(f"doc_id % {DECONTAM_BENCH_MOD} = 0"))
    train = docs.filter(F.expr(f"doc_id % {DECONTAM_BENCH_MOD} != 0"))
    return curation.decontaminate(train, bench, w=DECONTAM_QW)


def _q_pack_greedy(spark, sf):
    return curation.pack_sequences(
        _t(spark, sf, "documents"),
        capacity=PACK_Q_CAPACITY,
        n_shards=PACK_Q_SHARDS,
    )


def _q_sample_stratified(spark, sf):
    return curation.sample_stratified(_t(spark, sf, "documents"), SAMPLE_RATES)


# small windows so the 10-99-token synthetic docs produce real overlap
CHUNK_Q_SIZE = 32
CHUNK_Q_STRIDE = 24


def _q_doc_chunks(spark, sf):
    return curation.chunk_tokens(
        _t(spark, sf, "documents"), size=CHUNK_Q_SIZE, stride=CHUNK_Q_STRIDE
    )


# ExactSubstr driver knobs: the operator default (w=50) never fires on the
# 10-99-token synthetic docs; at w=5/max_count=1 the corpus covers 9.4% of
# token positions across 71/500 docs at sf0.01 (measured — w=4 is
# destructive at 18.5% coverage, max_count=2 near-vacuous at 0.9%).
SPAN_Q_W = 5
SPAN_Q_MAX_COUNT = 1


def _q_dedup_spans(spark, sf):
    return dedup.dedup_duplicate_spans(
        _t(spark, sf, "documents"), width=SPAN_Q_W, max_count=SPAN_Q_MAX_COUNT
    )


def _q_dsir_scores(spark, sf):
    # target = the deterministic doc_id % mod eval split (the decontam
    # discipline); raw = the FULL corpus — the target being a subset of
    # raw is the paper's setting (raw is "the distribution you have")
    docs = _t(spark, sf, "documents")
    target = docs.filter(F.expr(f"doc_id % {DECONTAM_BENCH_MOD} = 0"))
    return curation.dsir_scores(docs, target)


# the recipe's decontam width: the C4-clean survivor slice (doc_id%8==7)
# never shares a 4-gram with the bench split (measured 0/61 at sf0.01 —
# decontam would be vacuous at DECONTAM_QW=4), but 27/61 share a 3-gram:
# the stage fires without emptying the funnel.  decontam_overlap keeps
# w=4 over the full split where 4-grams do collide.
RECIPE_QW = 3


def _q_curation_recipe(spark, sf):
    """The composed C4 -> Gopher -> exact-dedup -> decontaminate ->
    stratified-sample audit table, over the C4-injected corpus (so the
    rule stage is non-vacuous) split on the decontam eval modulus."""
    from manga_translator_spark.operators.training import curate_corpus

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.expr(_C4_INJECT_SPARK).alias("text"), "lang"
    )
    univ = docs.filter(F.expr(f"doc_id % {DECONTAM_BENCH_MOD} != 0"))
    bench = docs.filter(F.expr(f"doc_id % {DECONTAM_BENCH_MOD} = 0"))
    return curate_corpus(
        univ, bench, SAMPLE_RATES, blocklist=(_C4_BLOCKWORD,), w=RECIPE_QW
    )


def _q_ann_cosine(spark, sf):
    return similarity.cosine_topk(_t(spark, sf, "embeddings"))


def _q_ann_lsh_stats(spark, sf):
    return similarity.lsh_bucket_stats(_t(spark, sf, "embeddings"))


def _q_embedding_near_dup(spark, sf):
    return similarity.embedding_near_dup(_t(spark, sf, "embeddings"), threshold=0.3)


# The synthetic embeddings are near-uniform on the sphere (real corpora
# cluster much tighter), so the paper-faithful 0.95 default would drop
# nothing at gate scale; 0.3 drops a measurable-but-minority slice.
SEMDEDUP_Q_THRESHOLD = 0.3


def _q_semantic_dedup(spark, sf):
    return similarity.semantic_dedup(
        _t(spark, sf, "embeddings"), threshold=SEMDEDUP_Q_THRESHOLD
    )


def _q_ann_in_bucket(spark, sf):
    return similarity.ann_topk_in_bucket(_t(spark, sf, "embeddings"))


def _q_ann_recall(spark, sf):
    return similarity.ann_recall(_t(spark, sf, "embeddings"))


def _q_ann_bucket_recall(spark, sf):
    return similarity.ann_bucket_recall(_t(spark, sf, "embeddings"))


def _q_ann_ivf(spark, sf):
    return similarity.ann_ivf_topk(_t(spark, sf, "embeddings"))


def _q_rollup_geo(spark, sf):
    # hierarchical rollup region -> nation (grouping-sets family, with cube
    # covered by returns_cube)
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    c = _t(spark, sf, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_cust",
            "acctbal",
        )
    )


def _q_value_percentiles(spark, sf):
    # exact percentiles (Spark percentile == linear interpolation ==
    # DuckDB quantile_cont); rounded to absorb float formatting
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


def _q_salted_event_counts(spark, sf):
    # skew pattern: two-phase salted aggregate; result identical to a plain
    # GROUP BY (the DuckDB twin) by construction
    from manga_translator_spark.operators.host_stats import salted_group_count

    return salted_group_count(_t(spark, sf, "events"), "event_type", "event_id")


def _q_lang_norm(spark, sf):
    from manga_translator_spark.functions.langcodes import normalize_lang

    docs = _t(spark, sf, "documents")
    return (
        normalize_lang(docs, spark)
        .groupBy("lang_norm")
        .agg(F.count("*").alias("n"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_pipeline": _q_extract_pipeline,
        "pricing_summary": _q_pricing_summary,
        "revenue_by_nation": _q_revenue_by_nation,
        "order_fill_left_join": _q_order_fill,
        "cust_with_orders_semi": _q_cust_semi,
        "cust_without_orders_anti": _q_cust_anti,
        "running_supplier_qty": _q_running_supplier,
        "top_order_per_cust": _q_top_order_per_cust,
        "part_words_explode": _q_part_words,
        "orders_by_month": _q_orders_by_month,
        "order_lines_collected": _q_order_lines_collected,
        "returns_cube": _q_returns_cube,
        "segment_set_ops": _q_segment_set_ops,
        "events_json": _q_events_json,
        "user_sessions": _q_user_sessions,
        "rollup_geo": _q_rollup_geo,
        "value_percentiles": _q_value_percentiles,
        "salted_event_counts": _q_salted_event_counts,
        "lang_normalize_dim_join": _q_lang_norm,
        "doc_token_stats": _q_doc_tokens,
        "doc_quality": _q_doc_quality,
        "doc_langid": _q_doc_langid,
        "doc_fingerprint": _q_doc_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash,
        "lsh_candidate_pairs": _q_lsh_pairs,
        "jaccard_pairs": _q_jaccard_pairs,
        "simhash": _q_simhash,
        "winnow_fingerprint": _q_winnow,
        "dedup_clusters": _q_dedup_clusters,
        "segment_dedup": _q_segment_dedup,
        "gopher_quality": _q_gopher_quality,
        "doc_wrap_lines": _q_doc_wrap_lines,
        "doc_wrap_hyphen": _q_doc_wrap_hyphen,
        "enrich_dict_translate": _q_enrich_dict,
        "doc_bpe_tokens": _q_doc_bpe_tokens,
        "doc_repetition": _q_doc_repetition,
        "token_surprise": _q_token_surprise,
        "surprise_buckets": _q_surprise_buckets,
        "stream_dedup_digests": _q_stream_dedup_digests,
        "pdf_extract": _q_pdf_extract,
        "extract_routed": _q_extract_routed,
        "extract_delta": _q_extract_delta,
        "latest_snapshot": _q_latest_snapshot,
        "snapshot_asof": _q_snapshot_asof,
        "crawl_refresh": _q_crawl_refresh,
        "url_canonical_dedup": _q_url_canonical_dedup,
        "scrub_pii": _q_scrub_pii,
        "training_corpus": _q_training_corpus,
        "decontam_overlap": _q_decontam,
        "pack_greedy": _q_pack_greedy,
        "sample_stratified": _q_sample_stratified,
        "doc_chunks": _q_doc_chunks,
        "dedup_spans": _q_dedup_spans,
        "dsir_scores": _q_dsir_scores,
        "c4_filters": _q_c4_filters,
        "curation_recipe": _q_curation_recipe,
        "ann_cosine_topk": _q_ann_cosine,
        "ann_lsh_bucket_stats": _q_ann_lsh_stats,
        "ann_in_bucket_topk": _q_ann_in_bucket,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_ivf_recall": _q_ann_recall,
        "ann_bucket_recall": _q_ann_bucket_recall,
        "embedding_near_dup": _q_embedding_near_dup,
        "semantic_dedup": _q_semantic_dedup,
    }


# --------------------------------------------------------------------------
# DuckDB oracle twins
# --------------------------------------------------------------------------

_TOKS = tokens_duck("text")
_SHINGLES = shingles_duck("tokens", dedup.SHINGLE_W)
_K = dedup.MINHASH_K
_BANDS = dedup.LSH_BANDS
_ROWS = _K // _BANDS


def _stop_duck(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(tokens, t -> list_contains([{arr}], t)))"


def _langid_fold() -> str:
    folded = "{'h': -1, 'l': 'und'}"
    for lang in LANGS:
        folded = (
            f"CASE WHEN hits_{lang} > ({folded}).h "
            f"THEN {{'h': hits_{lang}, 'l': '{lang}'}} ELSE {folded} END"
        )
    return folded


def _dot_duck(a: str, b: str, dim: int = similarity.EMB_DIM) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _lsh_sig_duck(emb: str, planes=None) -> str:
    terms = []
    for j, plane in enumerate(planes if planes is not None else similarity.PLANES):
        arr = "[" + ", ".join(f"{v}" for v in plane) + "]"
        terms.append(
            f"CASE WHEN {_dot_duck(arr, emb)} > 0 THEN (1::BIGINT << {j}) ELSE 0::BIGINT END"
        )
    return " + ".join(terms)


def _emb_bands_cte() -> str:
    """Banded, capped LSH candidate pairs over embeddings — the twin of
    similarity.lsh_band_buckets + lsh_candidate_pairs (same planes, same
    sorted-id MAX_EMB_BUCKET cap, pairs if ANY band bucket matches)."""
    ppb = similarity.PLANES_PER_BAND
    band_cols = ", ".join(
        f"{_lsh_sig_duck('embedding', similarity.PLANES[b * ppb:(b + 1) * ppb])} AS sb{b}"
        for b in range(similarity.LSH_EMB_BANDS)
    )
    bucket_case = (
        "CASE band_idx "
        + " ".join(f"WHEN {b} THEN sb{b}" for b in range(similarity.LSH_EMB_BANDS))
        + " END"
    )
    return f"""
WITH bsig AS (SELECT vec_id, {band_cols} FROM embeddings),
ebands AS (
  SELECT vec_id, band_idx, {bucket_case} AS bucket
  FROM bsig, (SELECT unnest(generate_series(0, {similarity.LSH_EMB_BANDS - 1})) AS band_idx) t
),
ebuckets AS (
  SELECT band_idx, bucket, (list_sort(list(vec_id)))[1:{similarity.MAX_EMB_BUCKET}] AS ids
  FROM ebands GROUP BY band_idx, bucket
),
epairs AS (
  SELECT DISTINCT a AS vec_a, b AS vec_b
  FROM (SELECT a, unnest(list_filter(ids, x -> x > a)) AS b
        FROM (SELECT unnest(ids) AS a, ids FROM ebuckets WHERE len(ids) > 1))
)
"""


from manga_translator_spark.functions.texthash import MINHASH_A, MINHASH_B, MINHASH_P

_A_LIST = "[" + ", ".join(str(v) for v in MINHASH_A[: dedup.MINHASH_K]) + "]"
_B_LIST = "[" + ", ".join(str(v) for v in MINHASH_B[: dedup.MINHASH_K]) + "]"

def _minhash_cte(src: str = "documents", lead: str = "WITH") -> str:
    return f"""
{lead} toks AS (SELECT doc_id, {_TOKS} AS tokens FROM {src}),
sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM toks),
hs AS (SELECT doc_id, list_transform(shingles, s -> {h60_duck('s')} % {MINHASH_P}) AS hvals FROM sh),
sig AS (SELECT doc_id, list_transform(generate_series(0, {_K - 1}),
          i -> list_min(list_transform(hvals,
            h -> (({_A_LIST})[i + 1] * h + ({_B_LIST})[i + 1]) % {MINHASH_P}))) AS signature
        FROM hs)
"""


def _bands_cte(src: str = "documents", lead: str = "WITH") -> str:
    return _minhash_cte(src, lead) + f""",
bands AS (
  SELECT doc_id, band_idx,
         {h60_duck(f"array_to_string(list_transform(signature[band_idx * {_ROWS} + 1 : band_idx * {_ROWS} + {_ROWS}], x -> x::VARCHAR), ',')")} AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {_BANDS - 1})) AS band_idx) b
),
buckets AS (
  SELECT band_idx, band_hash, (list_sort(list(doc_id)))[1:{dedup.MAX_BUCKET}] AS ids
  FROM bands GROUP BY band_idx, band_hash HAVING count(*) > 1
),
pairs AS (
  SELECT DISTINCT a AS doc_a, b AS doc_b
  FROM (SELECT a, unnest(list_filter(ids, x -> x > a)) AS b
        FROM (SELECT unnest(ids) AS a, ids FROM buckets))
)
"""


_MINHASH_CTE = _minhash_cte()
_BANDS_CTE = _bands_cte()


def _oracle_sf_dir() -> str:
    """The parquet dir the oracle SQL will run against.  The driver's
    correctness gate always compares at sf0.01, so that is the default;
    scripts/check_contract.py exports SPARK_GRAFT_ORACLE_SF when it runs
    the gate at another scale.  Only twins that pin DATA-DERIVED literals
    (the IVF kmeans centroid table) read this — everything else is
    sf-independent SQL."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


_IVF_CENTS_CACHE: dict[str, str] = {}


def _ivf_cents_values(sf_dir: str) -> str:
    """VALUES rows (cell, [centroid...]) for the IVF twin, computed by
    RUNNING the shared kmeans kernel over the oracle's own embeddings
    parquet (the doc_wrap_hyphen pinned-literal pattern): the Spark side
    collects the same sample (lowest vec_ids, same float32->float64
    widening) through the same ivf_kmeans_refine, so the literals match
    the Spark index bit-for-bit — repr() round-trips each float64
    exactly through DuckDB's strtod.

    Cached per sf dir (testdata is immutable): every oracle_sql() call
    pays the parquet read + Lloyd rounds otherwise, including callers
    that only want an sf-independent twin (r5 review)."""
    cached = _IVF_CENTS_CACHE.get(sf_dir)
    if cached is None:
        rows = similarity.ivf_kmeans_centroid_rows(f"{sf_dir}/embeddings.parquet")
        cached = ", ".join(
            "(%d, [%s])" % (c, ", ".join(repr(v) for v in emb)) for c, emb in rows
        )
        _IVF_CENTS_CACHE[sf_dir] = cached
    return cached


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    # Flagship twin.  The _pages_from_documents template yields exactly three
    # candidate blocks per page: nav (hint tag -> boilerplate), the article
    # <p> carrying documents.text, and the footer <p> (inherited hint ->
    # boilerplate).  The article block is MAIN iff its normalized text has
    # >= MIN_MAIN_CHARS chars (it has no links, so the link-density rule
    # can't fire), and it is always block_idx 1 (nav flushes as idx 0).
    # Normalization twin of functions/normalize.py normalize_text: NFC,
    # ellipsis -> '...', [・.]{2,} run rewrite (identity for the pure-dot
    # runs RE2 can express; ・ does not occur in the corpus), whitespace-run
    # collapse with the exact Python-\s char class, trim.
    from manga_translator_spark.functions.blocks import MIN_MAIN_CHARS

    _norm = (
        r"trim(regexp_replace(replace(nfc_normalize(text), '…', '...'),"
        r" '[\t-\r\x1c-\x1f\x85\p{Z}]+', ' ', 'g'))"
    )
    sql["extract_pipeline"] = f"""
      WITH norm AS (
        SELECT 'doc://' || doc_id::VARCHAR AS url, {_norm} AS t FROM documents
      )
      SELECT url,
             CASE WHEN length(t) >= {MIN_MAIN_CHARS} THEN t ELSE '' END AS extracted_text,
             CASE WHEN length(t) >= {MIN_MAIN_CHARS} THEN 1 ELSE 0 END AS n_blocks,
             CASE WHEN length(t) >= {MIN_MAIN_CHARS}
                  THEN '[{{"block_idx":1,"start":0,"end":' || length(t)::VARCHAR || '}}]'
                  ELSE '[]' END AS spans_json
      FROM norm
    """

    sql["pricing_summary"] = """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """

    sql["revenue_by_nation"] = """
      SELECT n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    """

    sql["order_fill_left_join"] = """
      SELECT o_orderkey, coalesce(agg.qty, 0.0) AS total_qty
      FROM orders LEFT JOIN (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY l_orderkey
      ) agg ON o_orderkey = agg.l_orderkey
    """

    sql["cust_with_orders_semi"] = """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """

    sql["cust_without_orders_anti"] = """
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """

    sql["running_supplier_qty"] = """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      FROM lineitem
    """

    sql["top_order_per_cust"] = """
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
      ) WHERE rn = 1
    """

    sql["part_words_explode"] = """
      SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(p_name, ' ')) AS word FROM part
      ) GROUP BY word
    """

    sql["orders_by_month"] = """
      SELECT date_trunc('month', o_orderdate)::DATE AS month,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders GROUP BY 1
    """

    sql["order_lines_collected"] = """
      SELECT l_orderkey,
             array_to_string(list_sort(list(l_linenumber::VARCHAR)), ',') AS line_nums
      FROM lineitem GROUP BY l_orderkey
    """

    sql["returns_cube"] = """
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """

    sql["segment_set_ops"] = """
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_nationkey < 5
    """

    sql["events_json"] = """
      SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
             max(cast(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type
    """

    # sum(new_session) must be cast: DuckDB types a bare integer sum as
    # HUGEINT (int128) whose canonical hash differs from Spark's BIGINT even
    # when every value is equal (confirmed root cause of the r01 mismatch).
    sql["user_sessions"] = """
      SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events FROM (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 600 * 1000000 THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events)
      ) GROUP BY user_id
    """

    from manga_translator_spark.functions.langcodes import values_sql

    sql["rollup_geo"] = """
      SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
             count(*) AS n_cust, round(sum(c_acctbal), 2) AS acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
    """

    sql["value_percentiles"] = """
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90
      FROM events GROUP BY event_type
    """

    sql["salted_event_counts"] = """
      SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """

    sql["lang_normalize_dim_join"] = f"""
      SELECT coalesce(alpha2, lower(lang)) AS lang_norm, count(*) AS n
      FROM documents LEFT JOIN {values_sql()} ON lower(lang) = alpha3
      GROUP BY 1
    """

    sql["doc_token_stats"] = f"""
      SELECT doc_id, len(tokens) AS n_tokens, length(text) AS n_chars_raw,
             CASE WHEN len(tokens) = 0 THEN 0.0
                  ELSE list_sum(list_transform(tokens, t -> length(t)))::DOUBLE / len(tokens)
             END AS avg_token_len,
             len(list_distinct(tokens)) AS n_distinct_tokens
      FROM (SELECT doc_id, text, {_TOKS} AS tokens FROM documents)
    """

    punct = "length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))"
    digit = "length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))"
    upper = "length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))"
    sql["doc_quality"] = f"""
      SELECT doc_id, length(text) AS n_chars_raw,
             CAST(round((({punct}) / (length(text) + 1.0)) * 1000000.0) AS BIGINT) AS punct_ppm,
             CAST(round((({digit}) / (length(text) + 1.0)) * 1000000.0) AS BIGINT) AS digit_ppm,
             CAST(round((({upper}) / (length(text) + 1.0)) * 1000000.0) AS BIGINT) AS upper_ppm,
             CASE WHEN length(text) >= 100
                   AND ({punct}) / (length(text) + 1.0) < 0.1
                   AND ({digit}) / (length(text) + 1.0) < 0.2
                  THEN 1 ELSE 0 END AS is_quality
      FROM documents
    """

    hits = ", ".join(f"{_stop_duck(l)} AS hits_{l}" for l in LANGS)
    total = " + ".join(f"hits_{l}" for l in LANGS)
    sql["doc_langid"] = f"""
      SELECT doc_id, lang, {', '.join('hits_' + l for l in LANGS)},
             CASE WHEN {total} = 0 THEN 'und' ELSE ({_langid_fold()}).l END AS lang_guess
      FROM (SELECT doc_id, lang, {hits}
            FROM (SELECT doc_id, lang, {_TOKS} AS tokens FROM documents))
    """

    sql["doc_fingerprint"] = f"""
      SELECT doc_id, md5(text) AS md5_fp,
             CASE WHEN len(tokens) = 0 THEN (-1)::BIGINT
                  ELSE list_min(list_transform(tokens, t -> {h60_duck('t')}))
             END AS min_token_hash
      FROM (SELECT doc_id, text, {_TOKS} AS tokens FROM documents)
    """

    sql["dedup_exact"] = """
      SELECT md5(text) AS digest, min(doc_id) AS canonical_id, count(*) AS n_docs
      FROM documents GROUP BY md5(text)
    """

    sql["minhash_signatures"] = (
        _MINHASH_CTE
        + """
      SELECT doc_id,
             array_to_string(list_transform(signature, x -> x::VARCHAR), ',') AS sig
      FROM sig
    """
    )

    sql["lsh_candidate_pairs"] = _BANDS_CTE + "SELECT doc_a, doc_b FROM pairs"

    sql["jaccard_pairs"] = (
        _BANDS_CTE
        + f""",
      sets AS (SELECT doc_id, list_distinct(shingles) AS sh FROM sh)
      SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
        FROM pairs
        JOIN sets a ON pairs.doc_a = a.doc_id
        JOIN sets b ON pairs.doc_b = b.doc_id
      ) WHERE jac >= 0.6
    """
    )

    sql["simhash"] = f"""
      SELECT doc_id,
             CASE WHEN len(hashes) = 0 THEN (-1)::BIGINT
                  ELSE list_sum(list_transform(generate_series(0, {dedup.SIMHASH_BITS - 1}),
                    j -> CASE WHEN 2 * len(list_filter(hashes, h -> (h >> j) % 2 = 1)) > len(hashes)
                              THEN (1::BIGINT << j) ELSE 0::BIGINT END))::BIGINT
             END AS simhash
      FROM (SELECT doc_id, list_transform(tokens, t -> {h60_duck('t')}) AS hashes
            FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents))
    """

    # Repeated-segment dedup twin: same shared fragments (tokens -> w-token
    # non-overlapping segments -> 60-bit md5), same drop rule (corpus count
    # > SEG_MAX_COUNT), same reassembly (surviving segments in position
    # order).  DuckDB's array_to_string is NULL for BOTH a NULL and an
    # empty list (probed: array_to_string([], ' ') IS NULL) where Spark's
    # array_join(collect_list(...)) of an empty list is '' — the string
    # coalesce inside sagg pins the all-dropped doc to '' on both sides;
    # it cannot mask a zero-segment doc because every sagg group has >= 1
    # segment by construction, and zero-segment docs fall out of sagg
    # entirely so the outer left join gives them NULL text with 0/0
    # counts, matching Spark.
    _SEGS = segments_duck("tokens", dedup.SEG_W)
    sql["segment_dedup"] = f"""
      WITH shashed AS (
        SELECT doc_id, g, seg, {h60_duck('seg')} AS h
        FROM (SELECT doc_id, unnest(segs) AS seg,
                     unnest(range(len(segs))) AS g
              FROM (SELECT doc_id, {_SEGS} AS segs
                    FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents)))
      ),
      sdrop AS (SELECT h FROM shashed GROUP BY h
                HAVING count(*) > {dedup.SEG_MAX_COUNT}),
      sagg AS (
        SELECT s.doc_id,
               coalesce(array_to_string(
                 list(s.seg ORDER BY s.g) FILTER (WHERE d.h IS NULL), ' '), '')
                 AS text_deduped,
               count(*) FILTER (WHERE d.h IS NULL) AS n_kept,
               count(*) FILTER (WHERE d.h IS NOT NULL) AS n_dropped
        FROM shashed s LEFT JOIN sdrop d USING (h)
        GROUP BY s.doc_id
      )
      SELECT doc_id, a.text_deduped,
             coalesce(a.n_kept, 0)::BIGINT AS n_kept,
             coalesce(a.n_dropped, 0)::BIGINT AS n_dropped
      FROM documents LEFT JOIN sagg a USING (doc_id)
    """

    # Gopher-rule quality twin (same integer constants/comparisons as
    # text_analysis.gopher_quality); reused as the filter stage of the
    # training_corpus composition below.
    ta = text_analysis
    g_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    g_arr = ", ".join(f"'{w}'" for w in g_stops)
    g_sym = "length(text) - length(regexp_replace(text, '[#…]', '', 'g'))"

    def _gopher_select(src: str) -> str:
        return f"""
      SELECT doc_id, n_tokens, ok_n_words, ok_word_len, ok_symbols, ok_stopwords,
             CASE WHEN ok_n_words + ok_word_len + ok_symbols + ok_stopwords = 4
                  THEN 1 ELSE 0 END AS keep
      FROM (
        SELECT doc_id, len(tokens) AS n_tokens,
               CASE WHEN len(tokens) BETWEEN {ta.GOPHER_MIN_WORDS} AND {ta.GOPHER_MAX_WORDS}
                    THEN 1 ELSE 0 END AS ok_n_words,
               CASE WHEN len(tokens) = 0 THEN 0
                    WHEN list_sum(list_transform(tokens, t -> length(t)))
                         BETWEEN {ta.GOPHER_MIN_MEAN_WORD_LEN} * len(tokens)
                             AND {ta.GOPHER_MAX_MEAN_WORD_LEN} * len(tokens)
                    THEN 1 ELSE 0 END AS ok_word_len,
               CASE WHEN 100 * ({g_sym}) <= {ta.GOPHER_MAX_SYMBOL_RATIO_PCT} * greatest(len(tokens), 1)
                    THEN 1 ELSE 0 END AS ok_symbols,
               CASE WHEN len(list_filter(tokens, t -> list_contains([{g_arr}], t))) >= {ta.GOPHER_MIN_STOPWORD_HITS}
                    THEN 1 ELSE 0 END AS ok_stopwords
        FROM (SELECT doc_id, text, {_TOKS} AS tokens FROM {src})
      )"""

    sql["gopher_quality"] = _gopher_select("documents")

    from manga_translator_spark.functions.wrap import wrap_sql_duck

    sql["doc_wrap_lines"] = wrap_sql_duck("documents", ta.WRAP_WIDTH)

    # Hyphenated wrap twin: the payload lexicon is a code constant, so the
    # expected per-phrase wrap comes from running the Liang KERNEL here at
    # SQL-generation time (no data access) and embedding the results as
    # doc_id-indexed list literals — the gate then proves the distributed
    # mapInPandas path == the kernel, byte-exact, including the fits=0 row.
    from manga_translator_spark.functions.hyphen import (
        Hyphenator as _Hyph,
        wrap_lines_hyphenated as _wlh,
    )

    _hy = _Hyph()
    _hy_exp = [_wlh(p, _HYPHEN_WIDTH, hyphenator=_hy) for p in _HYPHEN_PHRASES]

    def _lit(s: str) -> str:
        return "(" + " || chr(10) || ".join(
            "'" + ln.replace("'", "''") + "'" for ln in s.split("\n")
        ) + ")"

    _nl_list = ", ".join(
        "NULL" if ls is None else str(len(ls)) for ls in _hy_exp
    )
    _wr_list = ", ".join(
        "NULL" if ls is None else _lit("\n".join(ls)) for ls in _hy_exp
    )
    _fit_list = ", ".join("0" if ls is None else "1" for ls in _hy_exp)
    _n = len(_HYPHEN_PHRASES)
    sql["doc_wrap_hyphen"] = f"""
      SELECT doc_id,
             CAST(([{_nl_list}])[(doc_id % {_n})::INT + 1] AS INT) AS n_lines,
             ([{_wr_list}])[(doc_id % {_n})::INT + 1] AS wrapped,
             CAST(([{_fit_list}])[(doc_id % {_n})::INT + 1] AS INT) AS fits
      FROM documents
    """

    # T15 dictionary-translator twin: same lexicon constant, CASE-chain
    # per-token lookup (enrich.dict_translate_duck), plus the mapped-token
    # count over the ORIGINAL text.
    from manga_translator_spark.operators.enrich import (
        TRANSLATE_LEXICON as _LEX,
        dict_translate_duck as _dtd,
    )

    _lex_keys = ", ".join(f"'{k}'" for k, _ in _LEX)
    sql["enrich_dict_translate"] = f"""
      SELECT doc_id,
             {_dtd('text')} AS translated,
             CAST(len(list_filter(string_split(text, ' '),
                  w -> list_contains([{_lex_keys}], lower(w)))) AS INT) AS n_mapped
      FROM documents
    """

    # DuckDB string literals keep backslashes raw; only quotes need doubling
    bpe_pat = ta.BPE_PRETOKEN_RE.replace("'", "''")
    sql["doc_bpe_tokens"] = f"""
      SELECT doc_id, len(toks) AS n_bpe_tokens,
             md5(coalesce(array_to_string(toks, chr(31)), '')) AS bpe_fp
      FROM (SELECT doc_id, regexp_extract_all(text, '{bpe_pat}') AS toks
            FROM documents)
    """

    # Gopher repetition twin: same integer-ppm arithmetic (count * 1e6
    # integer-DIV total — no float column anywhere); the Spark side folds
    # the top-bigram run shuffle-free, the oracle counts it relationally
    # (unnest + group by) — same values, engine-idiomatic plans.  A
    # helper because training_corpus composes the same fragment as its
    # repetition-filter stage.
    def _repetition_select(src: str) -> str:
        return f"""
      WITH toks AS (SELECT doc_id, {_TOKS} AS tokens FROM {src}),
      grams AS (
        SELECT doc_id, len(tokens) AS n_tokens,
          CASE WHEN len(tokens) < 2 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len(tokens) - 1),
                                   i -> tokens[i] || ' ' || tokens[i+1]) END AS bg,
          CASE WHEN len(tokens) < 3 THEN []::VARCHAR[]
               ELSE list_transform(generate_series(1, len(tokens) - 2),
                    i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]) END AS tg
        FROM toks),
      top AS (
        SELECT doc_id, max(cnt) AS top_cnt FROM (
           SELECT doc_id, b, count(*) AS cnt
           FROM (SELECT doc_id, unnest(bg) AS b FROM grams) GROUP BY doc_id, b)
        GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_bigrams, dup_bigram_ppm, top_bigram_ppm,
             dup_trigram_ppm,
             CASE WHEN dup_bigram_ppm <= {ta.REP_MAX_DUP_BIGRAM_PPM}
                   AND top_bigram_ppm <= {ta.REP_MAX_TOP_BIGRAM_PPM}
                  THEN 1 ELSE 0 END AS rep_keep
      FROM (
        SELECT g.doc_id AS doc_id, CAST(n_tokens AS INT) AS n_tokens,
          CAST(len(bg) AS INT) AS n_bigrams,
          CAST(CASE WHEN len(bg) = 0 THEN 0
               ELSE ((len(bg) - len(list_distinct(bg))) * 1000000) // len(bg)
               END AS BIGINT) AS dup_bigram_ppm,
          CAST(CASE WHEN len(bg) = 0 THEN 0
               ELSE (coalesce(top_cnt, 0) * 1000000) // len(bg)
               END AS BIGINT) AS top_bigram_ppm,
          CAST(CASE WHEN len(tg) = 0 THEN 0
               ELSE ((len(tg) - len(list_distinct(tg))) * 1000000) // len(tg)
               END AS BIGINT) AS dup_trigram_ppm
        FROM grams g LEFT JOIN top ON g.doc_id = top.doc_id
      )
    """

    sql["doc_repetition"] = _repetition_select("documents")

    # corpus-relative rarity twin: same integer surprise (1e6 // freq),
    # same tokenizer; empty-token docs drop from BOTH sides (explode /
    # unnest both skip empty arrays).  sum() in DuckDB is HUGEINT — cast
    # before the integer division (the user_sessions lesson).
    sql["token_surprise"] = f"""
      WITH t AS (SELECT doc_id, {_TOKS} AS tokens FROM documents),
      ex AS (SELECT doc_id, len(tokens) AS n_tokens, unnest(tokens) AS tok FROM t),
      freq AS (SELECT tok, count(*) AS cnt FROM ex GROUP BY tok)
      SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
             CAST(sum(1000000 // cnt) AS BIGINT) // n_tokens AS surprise_ppm
      FROM ex JOIN freq USING (tok)
      GROUP BY doc_id, n_tokens
    """

    # CCNet head/middle/tail bucketing: built FROM the token_surprise twin
    # (single source — the scoring SQL cannot drift between the two), then
    # the same all-integer NTILE(3) calibration over the deterministic
    # doc_id % SURPRISE_CALIB_MOD sample with the (surprise_ppm, doc_id)
    # full-struct tie order, and the same <=-CASE assignment.
    sql["surprise_buckets"] = f"""
      WITH scored AS ({sql['token_surprise']}),
      scalib AS (SELECT surprise_ppm,
                        ntile(3) OVER (ORDER BY surprise_ppm, doc_id) AS tile
                 FROM scored
                 WHERE doc_id % {text_analysis.SURPRISE_CALIB_MOD} = 0),
      scuts AS (SELECT max(CASE WHEN tile = 1 THEN surprise_ppm END) AS c1,
                       max(CASE WHEN tile <= 2 THEN surprise_ppm END) AS c2
                FROM scalib)
      SELECT doc_id, n_tokens, surprise_ppm,
             CASE WHEN surprise_ppm <= c1 THEN 'head'
                  WHEN surprise_ppm <= c2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM scored CROSS JOIN scuts
    """

    # Streaming dedup twin: the kept-row digest set after watermarked
    # exact dedup == DISTINCT md5 of the synthesized page html (re-fetch
    # rows duplicate existing html bytes, adding no digests).  Shares
    # _PAGE_PRE/_PAGE_POST with the Spark-side page builder.
    sql["stream_dedup_digests"] = f"""
      SELECT DISTINCT md5('{_PAGE_PRE}' || text || '{_PAGE_POST}') AS digest
      FROM documents
    """

    # PDF/layout twin: the synthesized template is fixed (title at y=700,
    # body at y=600, body FIRST in the stream), so the expected reading-
    # ordered extraction is title-then-normalized-body, SQL-expressible
    # exactly like the extract_pipeline twin.  Blank-normalized bodies are
    # compacted away (T14), leaving the title-only single-span form.
    sql["pdf_extract"] = f"""
      WITH pnorm AS (
        SELECT doc_id, 'Doc ' || doc_id::VARCHAR AS title, {_norm} AS t
        FROM documents
      )
      SELECT 'pdf://' || doc_id::VARCHAR AS url,
             CASE WHEN t = '' THEN title ELSE title || ' ' || t END AS extracted_text,
             CASE WHEN t = '' THEN 1 ELSE 2 END AS n_blocks,
             CASE WHEN t = ''
                  THEN '[{{"block_idx":0,"start":0,"end":' || length(title)::VARCHAR || '}}]'
                  ELSE '[{{"block_idx":0,"start":0,"end":' || length(title)::VARCHAR
                       || '}},{{"block_idx":1,"start":' || (length(title) + 1)::VARCHAR
                       || ',"end":' || (length(title) + 1 + length(t))::VARCHAR || '}}]'
                  END AS spans_json
      FROM pnorm
    """

    sql["training_corpus"] = f"""
      WITH RECURSIVE gq AS ({_gopher_select('documents')}),
      rep AS ({_repetition_select('documents')}),
      kept AS (SELECT d.* FROM documents d
               JOIN gq ON d.doc_id = gq.doc_id AND gq.keep = 1
               JOIN rep ON d.doc_id = rep.doc_id AND rep.rep_keep = 1),
      keptc AS (SELECT k.* FROM kept k
                JOIN (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)) c
                ON k.doc_id = c.doc_id){_bands_cte('keptc', lead=',')},
      eedges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT a, b FROM eedges
        UNION
        SELECT r.a, e.b FROM reach r JOIN eedges e ON r.b = e.a
      ),
      clusters AS (
        SELECT k.doc_id, least(k.doc_id, coalesce(min(r.b), k.doc_id)) AS cluster_id
        FROM keptc k LEFT JOIN reach r ON k.doc_id = r.a GROUP BY k.doc_id
      )
      SELECT k.doc_id, md5(k.text) AS digest, len({tokens_duck('k.text')}) AS n_tokens
      FROM keptc k JOIN clusters c ON k.doc_id = c.doc_id
      WHERE c.cluster_id = k.doc_id
    """

    # --- curation twins (operators/curation.py) ---------------------------
    # decontamination: distinct w-gram 60-bit hashes on both sides of the
    # deterministic doc_id % MOD benchmark split, inner join, per-doc count.
    _ng = (
        f"list_filter(list_distinct({shingles_duck('tokens', DECONTAM_QW)}), "
        "s -> s != '')"
    )
    sql["decontam_overlap"] = f"""
      WITH ng AS (
        SELECT doc_id, {_ng} AS ngrams
        FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents)
      ),
      bench AS (SELECT DISTINCT {h60_duck('s')} AS h
                FROM (SELECT unnest(ngrams) AS s FROM ng
                      WHERE doc_id % {DECONTAM_BENCH_MOD} = 0)),
      train AS (SELECT doc_id, len(ngrams) AS n_ngrams, {h60_duck('s')} AS h
                FROM (SELECT doc_id, ngrams, unnest(ngrams) AS s FROM ng
                      WHERE doc_id % {DECONTAM_BENCH_MOD} != 0))
      SELECT doc_id, count(*) AS n_hits, max(n_ngrams) AS n_ngrams
      FROM train JOIN bench USING (h) GROUP BY doc_id
    """

    # greedy packing: the sequential fold walks a recursive CTE per shard
    # (wrap_sql_duck discipline — never list_reduce, see CLAUDE.md), state
    # (pid, fill) AFTER adding doc i; doc_ids are non-negative so DuckDB %
    # equals Spark pmod.  ORDER BY doc_id, n mirrors sort_array's full
    # struct ordering — doc_id alone leaves duplicate-id ties
    # underdetermined (the running_supplier_qty sf1 bug class).
    sql["pack_greedy"] = f"""
      WITH RECURSIVE psrc AS (
        SELECT shard, list(struct_pack(doc_id := doc_id, n := n)
                           ORDER BY doc_id, n) AS ds, count(*) AS m
        FROM (SELECT doc_id, (doc_id % {PACK_Q_SHARDS})::INT AS shard,
                     coalesce(len({_TOKS}), 0)::BIGINT AS n
              FROM documents)
        GROUP BY shard
      ),
      steps AS (
        SELECT shard, ds, m, 1 AS i, 0::BIGINT AS pid, ds[1].n AS fill
        FROM psrc WHERE m > 0
        UNION ALL
        SELECT shard, ds, m, i + 1,
          CASE WHEN fill > 0 AND fill + ds[i + 1].n > {PACK_Q_CAPACITY}
               THEN pid + 1 ELSE pid END,
          CASE WHEN fill > 0 AND fill + ds[i + 1].n > {PACK_Q_CAPACITY}
               THEN ds[i + 1].n ELSE fill + ds[i + 1].n END
        FROM steps WHERE i < m
      )
      SELECT shard, ds[i].doc_id AS doc_id, pid AS pack_id, ds[i].n AS n_tokens
      FROM steps
    """

    # token chunking: same start rule (keep a window iff it is the first
    # or reaches past its predecessor's end); DuckDB slices are
    # inclusive-end, Spark slice takes a length — both clamp at the end.
    _cs, _cstr = CHUNK_Q_SIZE, CHUNK_Q_STRIDE
    sql["doc_chunks"] = f"""
      SELECT doc_id, (i - 1)::INT AS chunk_idx,
             len(toks[starts[i] : starts[i] + {_cs - 1}])::BIGINT AS n_tokens,
             array_to_string(toks[starts[i] : starts[i] + {_cs - 1}], ' ') AS chunk_text
      FROM (
        SELECT doc_id, toks, starts, unnest(generate_series(1, len(starts))) AS i
        FROM (SELECT doc_id, toks,
                     list_filter(generate_series(1, len(toks), {_cstr}),
                                 s -> s = 1 OR s - {_cstr} + {_cs} <= len(toks)) AS starts
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
              WHERE len(toks) > 0)
      )
    """

    # stratified sampling: the rate CASE is the SAME string both engines
    # embed (curation.sample_rate_case_sql).
    _rate_case = curation.sample_rate_case_sql(SAMPLE_RATES, 0, "lang")
    _skey = f"concat('{curation.SAMPLE_SALT}', doc_id::VARCHAR)"
    sql["sample_stratified"] = f"""
      SELECT doc_id, lang AS stratum, bucket
      FROM (SELECT doc_id, lang,
                   {h60_duck(_skey)} % {curation.SAMPLE_MOD} AS bucket
            FROM documents)
      WHERE bucket < ({_rate_case})
    """

    # ExactSubstr span dedup (dedup.dedup_duplicate_spans): overlapping
    # w-token window hashes -> corpus dup-set -> per-doc covered-position
    # union -> reassembly from the uncovered tokens in order.  Same ''-vs-
    # NULL contract as segment_dedup (array_to_string([]) is NULL in
    # DuckDB; the coalesce restores Spark's '' for fully-covered docs).
    _sp_sh = shingles_duck("tokens", SPAN_Q_W)
    sql["dedup_spans"] = f"""
      WITH tok AS (SELECT doc_id,
                          coalesce({_TOKS}, []::VARCHAR[]) AS tokens
                   FROM documents),
      wins AS (
        SELECT doc_id, i, {h60_duck('s')} AS h
        FROM (SELECT doc_id, unnest(sh) AS s,
                     unnest(generate_series(1, len(sh))) AS i
              FROM (SELECT doc_id, {_sp_sh} AS sh FROM tok))
        WHERE s != ''
      ),
      dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > {SPAN_Q_MAX_COUNT}),
      starts AS (SELECT doc_id, list_sort(list(i)) AS starts
                 FROM wins JOIN dup USING (h) GROUP BY doc_id),
      asm AS (
        SELECT t.doc_id, t.tokens, len(t.tokens) AS n,
               list_distinct(flatten(list_transform(coalesce(s.starts, []),
                 st -> generate_series(st, least(st + {SPAN_Q_W} - 1, len(t.tokens)))))) AS cov
        FROM tok t LEFT JOIN starts s USING (doc_id)
      )
      SELECT doc_id,
        CASE WHEN n = 0 THEN NULL ELSE coalesce(
          array_to_string(list_transform(
            list_filter(generate_series(1, n), p -> NOT list_contains(cov, p)),
            p -> tokens[p]), ' '), '') END AS text_despanned,
        (n - len(cov))::BIGINT AS n_kept,
        len(cov)::BIGINT AS n_dropped
      FROM asm
    """

    # DSIR scores (curation.dsir_scores): unigram+bigram bag hashed into
    # the fixed bucket space, add-1 integer frequency-ratio weights,
    # per-doc integer mean.  All-integer arithmetic — // here == DIV there.
    _dsir_feats = f"""CASE WHEN len(tokens) < 2 THEN tokens
        ELSE list_concat(tokens, list_transform(range(1, len(tokens)),
                         i -> tokens[i] || ' ' || tokens[i + 1]))
        END"""
    sql["dsir_scores"] = f"""
      WITH feats AS (
        SELECT doc_id, {h60_duck('s')} % {curation.DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, unnest(fs) AS s
              FROM (SELECT doc_id, {_dsir_feats} AS fs
                    FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents)))
      ),
      raw AS (SELECT b, count(*) AS raw_cnt FROM feats GROUP BY b),
      tgt AS (SELECT b, count(*) AS tgt_cnt FROM feats
              WHERE doc_id % {DECONTAM_BENCH_MOD} = 0 GROUP BY b),
      w AS (SELECT coalesce(r.b, t.b) AS b,
                   ({curation.DSIR_SCALE}::BIGINT * (coalesce(t.tgt_cnt, 0) + 1))
                     // (coalesce(r.raw_cnt, 0) + 1) AS w_ppm
            FROM raw r FULL OUTER JOIN tgt t ON r.b = t.b),
      sc AS (SELECT f.doc_id, count(*) AS n_feats,
                    (sum(w.w_ppm) // count(*))::BIGINT AS score_ppm
             FROM feats f JOIN w USING (b) GROUP BY f.doc_id)
      SELECT d.doc_id, coalesce(sc.n_feats, 0)::BIGINT AS n_feats, sc.score_ppm
      FROM documents d LEFT JOIN sc USING (doc_id)
    """

    # C4 heuristic rules (text_analysis.c4_rules) over the injected
    # payloads; the phrase lists come from the operator's constants and the
    # per-rule fragments are shared with the curation_recipe twin below, so
    # the sides (and the two twins) cannot drift.
    def _c4_frags_duck(tokens: str, text: str) -> dict:
        low = f"lower(coalesce({text}, ''))"
        lor = " OR ".join(
            f"contains({low}, '{p}')" for p in text_analysis.C4_BLOCK_PHRASES
        )
        pol = " OR ".join(
            f"contains({low}, '{p}')" for p in text_analysis.C4_POLICY_PHRASES
        )
        return {
            "has_brace": f"contains(coalesce({text}, ''), '{{')",
            "has_lorem": f"({lor})",
            "has_js": f"list_contains({tokens}, 'javascript')",
            "has_policy": f"({pol})",
            "has_blocked": f"list_contains({tokens}, '{_C4_BLOCKWORD}')",
            "too_short": f"len({tokens}) < {text_analysis.C4_MIN_WORDS}",
        }

    _c4f = _c4_frags_duck("tokens", "text")
    _c4_flag_cols = ",\n          ".join(
        f"CASE WHEN {e} THEN 1 ELSE 0 END AS {k}" for k, e in _c4f.items()
    )
    sql["c4_filters"] = f"""
      WITH injected AS (SELECT doc_id, {_C4_INJECT_DUCK} AS text FROM documents),
      tok AS (SELECT doc_id, text,
                     coalesce({_TOKS}, []::VARCHAR[]) AS tokens
              FROM injected),
      flags AS (
        SELECT doc_id, len(tokens)::BIGINT AS n_tokens,
          {_c4_flag_cols}
        FROM tok
      )
      SELECT *, CASE WHEN {' + '.join(_c4f)} = 0
                     THEN 1 ELSE 0 END AS keep
      FROM flags
    """

    # Composed curation recipe (training.curate_corpus): the C4 keep bool
    # is NOT(any shared fragment); the Gopher stage reuses _gopher_select
    # verbatim; dedup/decontam/sampling stages re-derive the same hashes
    # over the same filtered subsets (training_corpus twin discipline).
    _c4_keep_bool = "NOT (" + " OR ".join(_c4f.values()) + ")"
    _rec_ng = (
        f"list_filter(list_distinct({shingles_duck('tokens', RECIPE_QW)}), "
        "s -> s != '')"
    )
    _rec_skey = f"concat('{curation.SAMPLE_SALT}', cast(doc_id AS VARCHAR))"
    sql["curation_recipe"] = f"""
      WITH injected AS (SELECT doc_id, {_C4_INJECT_DUCK} AS text, lang
                        FROM documents),
      univ AS (SELECT * FROM injected WHERE doc_id % {DECONTAM_BENCH_MOD} != 0),
      gq AS ({_gopher_select('univ')}),
      flags AS (
        SELECT u.doc_id, u.text, u.lang,
               CASE WHEN {_c4_keep_bool} THEN 1 ELSE 0 END AS c4_keep,
               g.keep AS gopher_keep
        FROM (SELECT doc_id, text, lang,
                     coalesce({_TOKS}, []::VARCHAR[]) AS tokens FROM univ) u
        JOIN gq g USING (doc_id)
      ),
      kept AS (SELECT doc_id, text, lang FROM flags
               WHERE c4_keep = 1 AND gopher_keep = 1),
      canon AS (SELECT doc_id,
                  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                       THEN 1 ELSE 0 END AS canonical
                FROM kept),
      canond AS (SELECT k.doc_id, k.text, k.lang
                 FROM kept k JOIN canon c USING (doc_id) WHERE c.canonical = 1),
      bng AS (SELECT DISTINCT {h60_duck('s')} AS h
              FROM (SELECT unnest(ng) AS s
                    FROM (SELECT {_rec_ng} AS ng
                          FROM (SELECT {_TOKS} AS tokens FROM injected
                                WHERE doc_id % {DECONTAM_BENCH_MOD} = 0)))),
      tng AS (SELECT DISTINCT doc_id, {h60_duck('s')} AS h
              FROM (SELECT doc_id, unnest(ng) AS s
                    FROM (SELECT doc_id, {_rec_ng} AS ng
                          FROM (SELECT doc_id, {_TOKS} AS tokens FROM canond)))),
      cont AS (SELECT DISTINCT t.doc_id FROM tng t JOIN bng USING (h)),
      samp AS (SELECT doc_id
               FROM (SELECT doc_id, lang,
                            {h60_duck(_rec_skey)} % {curation.SAMPLE_MOD} AS bucket
                     FROM canond
                     WHERE doc_id NOT IN (SELECT doc_id FROM cont))
               WHERE bucket < ({_rate_case}))
      SELECT f.doc_id, f.c4_keep, f.gopher_keep, c.canonical,
        (CASE WHEN c.canonical = 1
              THEN (CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END) END)::INT
          AS contaminated,
        (CASE WHEN c.canonical = 1 AND ct.doc_id IS NULL
              THEN (CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) END)::INT
          AS sampled,
        coalesce(CASE WHEN c.canonical = 1 AND ct.doc_id IS NULL
                      THEN (CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) END,
                 0)::INT AS keep
      FROM flags f
      LEFT JOIN canon c USING (doc_id)
      LEFT JOIN cont ct USING (doc_id)
      LEFT JOIN samp s USING (doc_id)
    """

    # connected components over the LSH pair graph as a recursive closure;
    # cluster = min(reachable set ∪ self).  Exact twin of the Spark
    # min-label-propagation fixpoint.
    sql["dedup_clusters"] = _BANDS_CTE.replace("WITH ", "WITH RECURSIVE ", 1) + """,
      eedges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT a, b FROM eedges
        UNION
        SELECT r.a, e.b FROM reach r JOIN eedges e ON r.b = e.a
      )
      SELECT d.doc_id,
             least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
      GROUP BY d.doc_id
    """

    w = dedup.WINNOW_W
    sql["winnow_fingerprint"] = f"""
      SELECT doc_id,
             array_to_string(list_sort(list_distinct(
               list_transform(generate_series(1, greatest(len(hs) - {w - 1}, 1)),
                              i -> list_min(hs[i:i + {w - 1}])))), ',') AS fps
      FROM (SELECT doc_id, list_transform(shingles, s -> {h60_duck('s')}) AS hs
            FROM (SELECT doc_id, {_SHINGLES} AS shingles
                  FROM (SELECT doc_id, {_TOKS} AS tokens FROM documents)))
    """

    cos = (
        f"{_dot_duck('q.embedding', 'n.embedding')} / "
        f"(sqrt({_dot_duck('q.embedding', 'q.embedding')}) * "
        f"sqrt({_dot_duck('n.embedding', 'n.embedding')}))"
    )
    sql["ann_cosine_topk"] = f"""
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 round({cos}, 4) AS cos_sim
          FROM (SELECT * FROM embeddings WHERE vec_id % 97 = 0
                ORDER BY vec_id LIMIT {similarity.MAX_QUERIES}) q,
               embeddings n
          WHERE n.vec_id != q.vec_id
        )
      ) WHERE rank <= 5
    """

    sql["ann_lsh_bucket_stats"] = f"""
      SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
      FROM (SELECT vec_id, {_lsh_sig_duck('embedding')} AS bucket FROM embeddings)
      GROUP BY bucket
    """

    cos_ab = (
        f"{_dot_duck('a.embedding', 'b.embedding')} / "
        f"(sqrt({_dot_duck('a.embedding', 'a.embedding')}) * "
        f"sqrt({_dot_duck('b.embedding', 'b.embedding')}))"
    )
    sql["embedding_near_dup"] = _emb_bands_cte() + f"""
      SELECT vec_a, vec_b, cos_sim FROM (
        SELECT vec_a, vec_b, round({cos_ab}, 4) AS cos_sim
        FROM epairs
        JOIN embeddings a ON vec_a = a.vec_id
        JOIN embeddings b ON vec_b = b.vec_id
      ) WHERE cos_sim >= 0.3
    """

    cos_qn = (
        f"{_dot_duck('q.embedding', 'n.embedding')} / "
        f"(sqrt({_dot_duck('q.embedding', 'q.embedding')}) * "
        f"sqrt({_dot_duck('n.embedding', 'n.embedding')}))"
    )
    sql["ann_in_bucket_topk"] = _emb_bands_cte() + f""",
      members AS (SELECT band_idx, bucket, unnest(ids) AS vec_id FROM ebuckets),
      eqids AS (SELECT vec_id FROM embeddings WHERE vec_id % 97 = 0
                ORDER BY vec_id LIMIT {similarity.MAX_QUERIES}),
      equeries AS (SELECT vec_id AS query_id, band_idx, bucket FROM ebands
                   WHERE vec_id IN (SELECT vec_id FROM eqids)),
      ecand AS (
        SELECT DISTINCT query_id, m.vec_id AS neighbor_id
        FROM equeries eq JOIN members m USING (band_idx, bucket)
        WHERE m.vec_id != eq.query_id
      )
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM (SELECT query_id, neighbor_id, round({cos_qn}, 4) AS cos_sim
              FROM ecand
              JOIN embeddings q ON query_id = q.vec_id
              JOIN embeddings n ON neighbor_id = n.vec_id)
      ) WHERE rank <= 5
    """

    cos_ec = (
        f"{_dot_duck('e.embedding', 'c.embedding')} / "
        f"(sqrt({_dot_duck('e.embedding', 'e.embedding')}) * "
        f"sqrt({_dot_duck('c.embedding', 'c.embedding')}))"
    )
    # IVF twin (r5): the coarse quantizer is the kmeans centroid table
    # PINNED as literals — computed by running the shared kernel over the
    # oracle's own parquet (see _ivf_cents_values) — and the probe set is
    # rn <= IVF_NPROBE per query, mirroring the raised shipped default
    # (VERDICT r4 #1).  `scored` holds every (vector, cell) cosine, so
    # the corpus assignment (rn = 1) and the query probe ranking
    # (rn <= nprobe over the query subset) are both re-filters of it —
    # exactly how the Spark side reuses ONE checkpointed ranked table.
    # A missing oracle dir must not abort building the WHOLE dict — an
    # sf-independent twin's caller never touches this entry (r5 review).
    # The substitute SQL raises a clear error only if actually executed.
    try:
        _ivf_cents = _ivf_cents_values(_oracle_sf_dir())
    except Exception as exc:  # noqa: BLE001 - missing/unreadable parquet
        _esc = str(exc).replace("'", "''")
        sql["ann_ivf_topk"] = (
            "SELECT error('IVF twin centroids unavailable "
            f"({_oracle_sf_dir()}/embeddings.parquet): {_esc}')"
        )
        sql["semantic_dedup"] = sql["ann_ivf_topk"]
        _ivf_cents = None
    if _ivf_cents is not None:
        sql["ann_ivf_topk"] = f"""
      WITH cents AS (SELECT * FROM (VALUES {_ivf_cents})
                     AS t(cell, embedding)),
      scored AS (
        SELECT e.vec_id, c.cell, round({cos_ec}, 4) AS cos_c
        FROM embeddings e CROSS JOIN cents c
      ),
      assigned AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell ASC) AS rn
          FROM scored
        ) WHERE rn = 1
      ),
      ivfq AS (
        SELECT vec_id AS query_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell ASC) AS rn
          FROM scored
          WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE vec_id % 97 = 0
                           ORDER BY vec_id LIMIT {similarity.MAX_QUERIES})
        ) WHERE rn <= {similarity.IVF_NPROBE}
      ),
      ivfc AS (
        SELECT query_id, a.vec_id AS neighbor_id
        FROM ivfq JOIN assigned a USING (cell) WHERE a.vec_id != ivfq.query_id
      )
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT query_id, neighbor_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM (SELECT query_id, neighbor_id, round({cos_qn}, 4) AS cos_sim
              FROM ivfc
              JOIN embeddings q ON query_id = q.vec_id
              JOIN embeddings n ON neighbor_id = n.vec_id)
      ) WHERE rank <= 5
    """

    # SemDeDup twin: same pinned kmeans centroid table, same rn=1 cell
    # assignment CTEs as the IVF twin, then the paper's greedy by-id rule
    # as a within-cell self-join — x drops iff a lower vec_id y in the
    # same cell has round(cos, 4) >= threshold (rounded BEFORE the
    # comparison on both engines, so the boundary cannot flip).
    if _ivf_cents is not None:
        cos_xy = (
            f"{_dot_duck('x.embedding', 'y.embedding')} / "
            f"(sqrt({_dot_duck('x.embedding', 'x.embedding')}) * "
            f"sqrt({_dot_duck('y.embedding', 'y.embedding')}))"
        )
        sql["semantic_dedup"] = f"""
      WITH cents AS (SELECT * FROM (VALUES {_ivf_cents})
                     AS t(cell, embedding)),
      scored AS (
        SELECT e.vec_id, c.cell, round({cos_ec}, 4) AS cos_c
        FROM embeddings e CROSS JOIN cents c
      ),
      assigned AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cell ASC) AS rn
          FROM scored
        ) WHERE rn = 1
      ),
      sdup AS (
        SELECT DISTINCT ax.vec_id
        FROM assigned ax JOIN assigned ay USING (cell)
        JOIN embeddings x ON ax.vec_id = x.vec_id
        JOIN embeddings y ON ay.vec_id = y.vec_id
        WHERE ax.vec_id > ay.vec_id
          AND round({cos_xy}, 4) >= {SEMDEDUP_Q_THRESHOLD}
      )
      SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
      FROM assigned a LEFT JOIN sdup d ON a.vec_id = d.vec_id
    """

    # ANN recall evaluation: composes the two twins above — exact top-k is
    # ground truth, IVF hits are counted per query, recall as integer ppm
    # (count * 1e6 integer-DIV count; no float column).
    sql["ann_ivf_recall"] = f"""
      WITH exact AS ({sql['ann_cosine_topk']}),
      approx AS ({sql['ann_ivf_topk']})
      SELECT query_id, n_exact, n_hit,
             (n_hit * 1000000) // n_exact AS recall_ppm
      FROM (
        SELECT e.query_id AS query_id,
               count(*) AS n_exact,
               count(a.neighbor_id) AS n_hit
        FROM exact e
        LEFT JOIN approx a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
      )
    """

    sql["ann_bucket_recall"] = f"""
      WITH exact AS ({sql['ann_cosine_topk']}),
      approx AS ({sql['ann_in_bucket_topk']})
      SELECT query_id, n_exact, n_hit,
             (n_hit * 1000000) // n_exact AS recall_ppm
      FROM (
        SELECT e.query_id AS query_id,
               count(*) AS n_exact,
               count(a.neighbor_id) AS n_hit
        FROM exact e
        LEFT JOIN approx a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
      )
    """

    sql["latest_snapshot"] = f"""
      SELECT 'doc://' || doc_id::VARCHAR AS url,
             CASE WHEN doc_id % 3 = 0
                  THEN md5('{_PAGE_PRE}' || text || '{_PAGE_POST}' || '<!--v2-->')
                  ELSE md5('{_PAGE_PRE}' || text || '{_PAGE_POST}')
             END AS digest
      FROM documents
    """

    from manga_translator_spark.functions.urlnorm import canonical_url_duck

    # as-of twin: cutoff 00:04:10 == 250 s after the crawl epoch; a url's
    # first snapshot exists iff doc_id % 3600 <= 250, and the +1 day
    # re-crawls are always past the cutoff — so the expected winner is
    # the v1 digest for exactly that id range (no timestamp column ever
    # crosses the compare).
    sql["snapshot_asof"] = f"""
      SELECT 'doc://' || doc_id::VARCHAR AS url,
             md5('{_PAGE_PRE}' || text || '{_PAGE_POST}') AS digest
      FROM documents WHERE doc_id % 3600 <= 250
    """

    sql["url_canonical_dedup"] = f"""
      SELECT {canonical_url_duck('url')} AS canon_url,
             count(*) AS n_variants,
             min(url) AS first_url
      FROM (SELECT {_MESSY_URL_DUCK} AS url FROM documents)
      GROUP BY 1
    """

    # DuckDB regexp_replace is single-occurrence by default: the 'g' flag
    # is REQUIRED to match Spark's global replace.
    _pii = text_analysis.PII_RULES
    _pii_scrub = _PII_INJECT_DUCK
    for _, _pat, _tok in _pii:
        _pii_scrub = f"regexp_replace({_pii_scrub}, '{_pat}', '{_tok}', 'g')"
    sql["scrub_pii"] = f"""
      SELECT doc_id,
             {", ".join(
                 f"CAST(len(regexp_extract_all({_PII_INJECT_DUCK}, '{pat}')) AS BIGINT) AS n_{name}"
                 for name, pat, _ in _pii
             )},
             md5({_pii_scrub}) AS scrubbed_fp
      FROM documents
    """

    # crawl-refresh twin: same flagship body over the re-crawl-winning
    # text (' v2' suffix for every third doc — the newest snapshot).
    sql["crawl_refresh"] = f"""
      WITH src AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents
      ),
      norm AS (
        SELECT 'doc://' || doc_id::VARCHAR AS url, {_norm} AS t FROM src
      )
      SELECT url,
             CASE WHEN length(t) >= {MIN_MAIN_CHARS} THEN t ELSE '' END AS extracted_text,
             CASE WHEN length(t) >= {MIN_MAIN_CHARS} THEN 1 ELSE 0 END AS n_blocks,
             CASE WHEN length(t) >= {MIN_MAIN_CHARS}
                  THEN '[{{"block_idx":1,"start":0,"end":' || length(t)::VARCHAR || '}}]'
                  ELSE '[]' END AS spans_json
      FROM norm
    """

    sql["extract_delta"] = f"""
      SELECT * FROM ({sql['extract_pipeline']})
      WHERE cast(substring(url, 7) AS INT) % 4 <> 0
    """

    sql["extract_routed"] = f"""
      SELECT * FROM ({sql['extract_pipeline']})
      UNION ALL
      SELECT * FROM ({sql['pdf_extract']})
    """

    return sql
