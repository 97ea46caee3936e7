"""Pipeline composer: config-driven stage graph (the plugin-registry analogue).

Mirrors the reference's orchestration surface: named plugins per stage slot
(registry get.py:10-19; construct_plugin core/plugin.py:297-304; YAML wiring
cli/main.py:72-86 + cli/example_config.yaml), and prefix-composability (the
UI's /clean endpoint runs detect->segment->clean and stops,
ui/main.py:104-108) via the ``until=`` argument.

The composed plan is a single lazy DataFrame; Catalyst sees one tree:

    scan(url, html)                      <- column-pruned parquet scan
      -> detect_blocks   [mapInPandas]   <- UDF barrier #1
      -> classify        [codegen]
      -> clean           [codegen]
      -> assemble        [codegen]          (zero-shuffle default)
      -> + recognized    [explode -> mapInPandas -> groupBy -> join]
      -> enrich          [codegen]

Manual physical placement (SURVEY §4: filters don't push through opaque
mapInPandas): the cheap column-level work sits AFTER the parse UDF and
BEFORE the recognize UDF, so the expensive model stage sees only the
embedded-image rows (patch-based processing, lama.py:45 analogue).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

from manga_translator_spark.operators.assemble import assemble_arrays, assemble_exploded
from manga_translator_spark.operators.classify import classify_blocks
from manga_translator_spark.operators.clean import CLEANERS
from manga_translator_spark.operators.common import spread
from manga_translator_spark.operators.detect import detect_blocks
from manga_translator_spark.operators.enrich import ENRICHERS
from manga_translator_spark.operators.model_clean import REPAIRERS
from manga_translator_spark.operators.recognize import recognize_embedded, with_recognized

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

ASSEMBLERS = {"arrays": assemble_arrays, "exploded": assemble_exploded}

STAGE_ORDER = ("detect", "classify", "repair", "clean", "assemble", "recognize", "enrich")


@dataclass
class PipelineConfig:
    """Stage-slot selection (cli/example_config.yaml analogue).

    Each value names an entry in the matching registry; unknown names fail
    fast at compose time (construct_plugin_by_name raises similarly,
    get.py:18-19).
    """

    cleaner: str = "strip"
    assembler: str = "arrays"
    enricher: str = "pipe"
    # model-based gray-zone repair between classify and clean (the LaMa/
    # DeepFillV2 cleaner slot, reference cleaning/get.py:6-11); "none" keeps
    # the pipeline byte-identical to the oracle.
    repair: str = "none"
    recognize: bool = True
    n_buckets: int | None = None  # optional url-hash repartition before UDFs
    # physical mode: "fused" (default; one Python pass per page, compact
    # Arrow output — see operators/fused.py for the measured rationale) or
    # "staged" (composable Catalyst stages; required for until=/cleaner
    # variants and selected automatically when those are used).
    mode: str = "fused"
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "PipelineConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        try:
            import yaml  # optional dep, mirrors cli/main.py:72-73
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("pyyaml not installed; use from_dict/JSON") from e
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})


# Per-plugin argument schemas — the GET /info payload's argument list
# (reference ui/main.py:223-305 serializes every plugin's PluginArgument
# name/type/default via core/plugin.py:29-126).  Our plugins are pure
# DataFrame strategies, so arguments are the factory/threshold knobs.
PLUGIN_ARGS: dict[str, dict[str, dict[str, dict]]] = {
    "cleaner": {
        "strip": {},
        "mask": {},
        "noop": {},
    },
    "assembler": {
        "arrays": {},
        "exploded": {},
    },
    "enricher": {
        "pipe": {},
        "debug": {"constant": {"type": "str", "default": "meow"}},
        "batched": {"batch_rows": {"type": "int", "default": 512}},
        "dict": {"lexicon": {"type": "tuple[tuple[str, str], ...]", "default": "TRANSLATE_LEXICON"}},
    },
    "repairer": {
        "none": {},
        "model": {"gray_lo": {"type": "float", "default": 0.5}},
    },
}


def _operator_arg_schemas() -> dict:
    """Arg schemas for the scale-knobbed analytics operators (VERDICT r02
    #3): every per-corpus tuning parameter is a function argument with a
    driver-pinned default — retuning for a different corpus never requires
    a module edit.  Defaults are read live from the modules so this listing
    cannot drift from the code."""
    from manga_translator_spark.operators import curation, dedup, similarity
    from manga_translator_spark.operators import text_analysis as _ta

    def a(type_, default, doc):
        return {"type": type_, "default": default, "doc": doc}

    minhash = {
        "k": a("int", dedup.MINHASH_K, "minhash permutations"),
        "bands": a("int", dedup.LSH_BANDS, "LSH bands (recall knob)"),
        "max_bucket": a("int", dedup.MAX_BUCKET, "per-bucket pair cap (spam guard)"),
    }
    emb_lsh = {
        "n_planes": a("int", similarity.N_PLANES, "hyperplane sign bits"),
        "n_bands": a("int", similarity.LSH_EMB_BANDS, "signature bands (recall knob)"),
        "max_bucket": a("int", similarity.MAX_EMB_BUCKET, "per-bucket candidate cap"),
    }
    return {
        "dedup.lsh_candidate_pairs": minhash,
        "dedup.simhash": {"n_bits": a("int", dedup.SIMHASH_BITS, "fingerprint bits")},
        "dedup.winnow_fingerprints": {"w": a("int", dedup.WINNOW_W, "winnowing window")},
        "dedup.dedup_clusters": {
            "max_iters": a("int", 20, "label-propagation round bound (raises past it)")
        },
        "text_analysis.wrap_lines": {
            "width": a("int", 40, "wrap width in unit cells (drawer text-flow)")
        },
        "text_analysis.repetition_stats": {
            "max_dup_bigram_ppm": a(
                "int", _ta.REP_MAX_DUP_BIGRAM_PPM, "duplicate-bigram keep ceiling (ppm)"
            ),
            "max_top_bigram_ppm": a(
                "int", _ta.REP_MAX_TOP_BIGRAM_PPM, "top-bigram-share keep ceiling (ppm)"
            ),
        },
        "streaming.dedup_pages_stream": {
            "watermark": a(
                "str", "30 minutes", "state-eviction horizon for the digest store"
            ),
        },
        "assemble.with_wrapped_lines": {
            "wrap_width": a("int", 40, "per-span wrap width in unit cells")
        },
        "similarity.cosine_topk": {
            "k": a("int", 5, "neighbors per query"),
            "max_queries": a("int", similarity.MAX_QUERIES, "broadcast query-side bound"),
        },
        "similarity.lsh_candidate_pairs": emb_lsh,
        "similarity.ann_topk_in_bucket": {
            **emb_lsh,
            "k": a("int", 5, "neighbors per query"),
            "max_queries": a("int", similarity.MAX_QUERIES, "query-side bound (ordered limit)"),
        },
        "similarity.embedding_near_dup": {
            **emb_lsh,
            "threshold": a("float", 0.98, "cosine near-dup threshold"),
        },
        "similarity.ann_ivf_topk": {
            "n_cells": a("int", similarity.IVF_N_CELLS, "IVF cells (scale ~sqrt(corpus))"),
            "nprobe": a("int", similarity.IVF_NPROBE, "cells probed per query (recall knob)"),
            "k": a("int", 5, "neighbors per query"),
            "max_queries": a("int", similarity.MAX_QUERIES, "query-side bound (ordered limit)"),
            "centroids": a(
                "str|DataFrame", similarity.IVF_CENTROIDS,
                "coarse quantizer: first | kmeans (sampled Lloyd) | prebuilt table",
            ),
        },
        "text_analysis.token_surprise": {
            "vocab_limit": a(
                "int|None", None, "top-N vocab cap (None = full vocab, AQE-decided join)"
            ),
            "tail_cnt": a("int", 1, "assumed count for out-of-vocab tail tokens"),
        },
        "curation.decontaminate": {
            "w": a("int", curation.DECONTAM_W, "overlap n-gram width (13 = published standard)"),
        },
        "curation.pack_sequences": {
            "capacity": a("int", curation.PACK_CAPACITY, "tokens per pack (context window)"),
            "n_shards": a(
                "int", curation.PACK_SHARDS,
                "independent packing shards — the scale knob (size to ~1e3-1e4 docs/shard)",
            ),
        },
        "curation.chunk_tokens": {
            "size": a("int", curation.CHUNK_SIZE, "tokens per chunk (context window)"),
            "stride": a("int", curation.CHUNK_STRIDE, "window step (size - overlap)"),
        },
        "curation.sample_stratified": {
            "default_ppt": a("int", 0, "per-mille keep rate for strata not in `rates`"),
            "salt": a("str", curation.SAMPLE_SALT, "hash salt (sample identity)"),
        },
        "dedup.dedup_repeated_segments": {
            "width": a("int", dedup.SEG_W, "tokens per non-overlapping segment"),
            "max_count": a(
                "int", dedup.SEG_MAX_COUNT,
                "corpus occurrence ceiling — segments above it are boilerplate",
            ),
        },
        "text_analysis.surprise_buckets": {
            "cutoffs": a(
                "(int,int)|None", None,
                "fixed (head, middle) ppm thresholds; None = NTILE(3) tercile "
                "calibration on the doc_id %% calib_mod sample",
            ),
            "calib_mod": a(
                "int", _ta.SURPRISE_CALIB_MOD,
                "calibration sampling modulus — raise at scale to bound the sample",
            ),
        },
        "similarity.semantic_dedup": {
            "threshold": a("float", similarity.SEMDEDUP_THRESHOLD, "within-cell cosine drop threshold"),
            "n_cells": a("int", similarity.IVF_N_CELLS, "clusters (scale ~sqrt(corpus))"),
            "centroids": a(
                "str|DataFrame", similarity.IVF_CENTROIDS,
                "coarse quantizer: first | kmeans (sampled Lloyd) | prebuilt table",
            ),
        },
        "dedup.dedup_duplicate_spans": {
            "width": a(
                "int", dedup.SPAN_W,
                "overlapping window width (50 = ExactSubstr published standard)",
            ),
            "max_count": a(
                "int", dedup.SPAN_MAX_COUNT,
                "corpus occurrence ceiling — windows above it are duplicated spans",
            ),
        },
        "curation.dsir_scores": {
            "n_buckets": a(
                "int", curation.DSIR_BUCKETS,
                "hashed feature space — bounds the weight table (broadcast-safe)",
            ),
        },
        "text_analysis.c4_rules": {
            "blocklist": a(
                "tuple[str,...]", (), "token-level bad-word list (whole-token match)"
            ),
        },
    }


def describe() -> dict:
    """Machine-readable registry of stage slots, their plugins AND each
    plugin's argument schema — the GET /info analogue (reference
    ui/main.py:223-305 enumerates every plugin with its argument schema
    for the UI; core/plugin.py:29-126 defines the argument model)."""
    fields = PipelineConfig.__dataclass_fields__
    defaults = PipelineConfig()
    return {
        "operators": _operator_arg_schemas(),
        "stages": list(STAGE_ORDER),
        "slots": {
            "cleaner": sorted(CLEANERS),
            "assembler": sorted(ASSEMBLERS),
            "enricher": sorted(ENRICHERS),
            "repairer": sorted(REPAIRERS),
        },
        "plugins": {
            slot: {
                name: {"args": PLUGIN_ARGS.get(slot, {}).get(name, {})}
                for name in sorted(registry)
            }
            for slot, registry in (
                ("cleaner", CLEANERS),
                ("assembler", ASSEMBLERS),
                ("enricher", ENRICHERS),
                ("repairer", REPAIRERS),
            )
        },
        "modes": ["fused", "staged"],
        "config_fields": {
            name: {
                "type": getattr(f.type, "__name__", str(f.type)),
                "default": getattr(defaults, name),
            }
            for name, f in fields.items()
        },
    }


def resolve_enricher(cfg: PipelineConfig):
    """The enricher plugin honoring its advertised PLUGIN_ARGS knobs
    riding ``cfg.extra`` (debug.constant, batched.batch_rows,
    dict.lexicon — the gray_lo pattern): describe()/GET /info advertise
    these, so validating the config and then serving defaults anyway is
    the silent-dishonor class the r4 review banned (r5 review)."""
    from manga_translator_spark.operators.enrich import (
        make_enrich_batched,
        make_enrich_debug,
        make_enrich_dict,
    )

    knobs = {
        k: cfg.extra[k]
        for k in PLUGIN_ARGS["enricher"].get(cfg.enricher, ())
        if k in cfg.extra
    }
    if not knobs:
        return ENRICHERS[cfg.enricher]
    if cfg.enricher == "debug":
        return make_enrich_debug(str(knobs["constant"]))
    if cfg.enricher == "batched":
        return make_enrich_batched(batch_rows=int(knobs["batch_rows"]))
    if cfg.enricher == "dict":
        # configs arrive as a mapping or list-of-pairs; the shared
        # normalizer canonicalizes and rejects duplicate source tokens
        # (batch ANSI map() and serve's Python dict would diverge)
        from manga_translator_spark.operators.enrich import normalize_lexicon

        return make_enrich_dict(normalize_lexicon(knobs["lexicon"]))
    return ENRICHERS[cfg.enricher]  # pragma: no cover - pipe has no knobs


def validate_extra(cfg: PipelineConfig) -> None:
    """Reject ``cfg.extra`` keys no SELECTED plugin advertises.  The
    fail-loud discipline (ADVICE r4 #3: unknown top-level fields 400)
    otherwise stops one level short: a typo'd knob like
    ``extra={'constat': 'woof'}`` would pass validation and silently
    serve the default (r5 review)."""
    known: set[str] = set()
    for slot, name in (
        ("cleaner", cfg.cleaner),
        ("assembler", cfg.assembler),
        ("enricher", cfg.enricher),
        ("repairer", cfg.repair),
    ):
        known |= set(PLUGIN_ARGS.get(slot, {}).get(name, {}))
    unknown = set(cfg.extra) - known
    if unknown:
        raise KeyError(
            f"unknown extra knob(s) {sorted(unknown)}; the selected plugins "
            f"advertise {sorted(known)}"
        )


def extract(
    pages: "DataFrame",
    config: PipelineConfig | None = None,
    *,
    until: str | None = None,
    metrics: dict | None = None,
) -> "DataFrame":
    """Compose the extraction plan over a pages DataFrame.

    ``until`` stops after the named stage and returns that intermediate
    (prefix-composability; feeds the per-stage checkpoint tables too).
    """
    cfg = config or PipelineConfig()
    if cfg.cleaner not in CLEANERS:
        raise KeyError(f"unknown cleaner {cfg.cleaner!r}; have {sorted(CLEANERS)}")
    if cfg.assembler not in ASSEMBLERS:
        raise KeyError(f"unknown assembler {cfg.assembler!r}; have {sorted(ASSEMBLERS)}")
    if cfg.enricher not in ENRICHERS:
        raise KeyError(f"unknown enricher {cfg.enricher!r}; have {sorted(ENRICHERS)}")
    if cfg.repair not in REPAIRERS:
        raise KeyError(f"unknown repairer {cfg.repair!r}; have {sorted(REPAIRERS)}")
    if until is not None and until not in STAGE_ORDER:
        # a typo'd stage would silently run the FULL pipeline and hand the
        # caller a final table labeled as an intermediate (r5 review)
        raise KeyError(f"unknown stage {until!r}; have {list(STAGE_ORDER)}")
    validate_extra(cfg)

    needs_staged = (
        until is not None
        or cfg.mode == "staged"
        or cfg.cleaner != "strip"
        or cfg.assembler != "arrays"
        or cfg.repair != "none"
        or not cfg.recognize
    )
    if not needs_staged:
        from manga_translator_spark.operators.fused import extract_fused

        df = pages
        if cfg.n_buckets:
            from pyspark.sql import functions as F

            df = df.repartition(cfg.n_buckets, F.xxhash64("url"))
        else:
            # no explicit bucketing: widen a narrow (single-file) scan so
            # the fused parse doesn't run the whole corpus on one task —
            # wide scans and in-memory frames pass through untouched
            df = spread(df)
        return resolve_enricher(cfg)(extract_fused(df, metrics=metrics))

    df = pages
    if cfg.n_buckets:
        # explicit hash bucketing on the record key before the UDF chain
        # (north_rule; SURVEY §4) — spreads skewed hosts across tasks.
        from pyspark.sql import functions as F

        df = df.repartition(cfg.n_buckets, F.xxhash64("url"))
    else:
        df = spread(df)  # same narrow-scan guard as the fused branch

    df = detect_blocks(df)
    if until == "detect":
        return df
    df = classify_blocks(df)
    if until == "classify":
        return df
    # repair knobs ride config.extra (describe() advertises gray_lo for
    # the model repairer; r4 review — advertised knobs must be settable)
    repair_args = {k: cfg.extra[k] for k in ("gray_lo",) if k in cfg.extra}
    df = REPAIRERS[cfg.repair](df, **repair_args)
    if until == "repair":
        return df
    cleaned = CLEANERS[cfg.cleaner](df)
    if until == "clean":
        return cleaned
    out = ASSEMBLERS[cfg.assembler](cleaned)
    if until == "assemble":
        return out
    if cfg.recognize:
        # recognition reads the *classified* blocks (cleaner must not have
        # dropped img blocks — strip removes only cls=1, so df is safe)
        out = with_recognized(out, recognize_embedded(df))
    else:
        from pyspark.sql import functions as F

        out = out.withColumn(
            "recognized",
            F.expr("CAST(array() AS ARRAY<STRUCT<block_idx: INT, text: STRING>>)"),
        )
    if until == "recognize":
        return out
    return resolve_enricher(cfg)(out)
