"""Per-request extraction server (S7 + P5) — the ui/main.py analogue.

The reference serves its pipeline over HTTP: ``GET /info`` enumerates
every plugin with its argument schema (ui/main.py:223-305) and each
``POST`` builds a FRESH pipeline from the request's own plugin config
(ui/main.py:104-107,164-172 — ``construct_plugin_by_name`` per slot,
then run, then write the result bytes straight back).  This job is that
serving layer for the web-text engine:

* ``GET /info``  -> ``plans.pipeline.describe()`` as JSON (same
  introspection contract: stages, slots, per-plugin arg schemas);
* ``POST /clean`` and ``POST /translate`` mirror the reference's two
  pipeline routes (ui/main.py:326-337): /clean forces the cleaner-only
  pipeline (recognition off — its detect+segment+clean analogue),
  /translate is the full pipeline (alias of /extract);
* ``POST /extract[?url=...&config=<json>]`` -> request body is ONE
  payload (HTML bytes, or a ``%PDF-`` document — routed exactly like
  ``operators/pdf_extract.extract_any``); a fresh ``PipelineConfig`` is
  built from the request's ``config`` JSON (P5: per-request pipeline
  instantiation) with unknown plugin names rejected 400 — the
  ``construct_plugin_by_name`` raising contract (get.py:18-19); the
  response body is the extraction result as JSON (the engine's "result
  bytes": text spans, not pixels);
* errors -> 500 with the traceback as the body (ui/main.py:114-119
  verbatim behavior).

Per-request work runs the SHARED Python kernels (oracle.extract_page /
pdf_extract_kernel) — the same code the Spark stages execute per row, so
a served answer is byte-identical to the batch engine's row for the same
payload (tested).  Spark is deliberately NOT in the request path: a
single page is one kernel call, and the reference's per-request pipeline
is single-image too.

Which config knobs the request path honors (and how dishonoring fails
LOUDLY — r4 review: a validated-but-ignored slot silently served wrong
answers):
* ``recognize`` — honored (drops the recognized list);
* ``enricher`` — honored: pipe/batched are identity on a single page
  (batched is a transport batching of MANY pages; one request IS a
  batch of one), debug/dict apply their kernel transforms;
* ``assembler`` — any registered name accepted: arrays/exploded are
  physical strategies with identical output (tests assert equality);
* ``cleaner`` != "strip" and ``repair`` != "none" — REJECTED 501: those
  slots only exist as Spark stage compositions; serving a default-
  pipeline answer while claiming the requested plugin would be wrong.
* batch-only physical fields (mode, n_buckets) — ignored by design.

Usage:  python jobs/serve.py [--port 8765] [--host 127.0.0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from manga_translator_spark.functions.pdf import PDF_MAGIC
from manga_translator_spark.plans.pipeline import (
    ASSEMBLERS,
    CLEANERS,
    ENRICHERS,
    REPAIRERS,
    PipelineConfig,
    describe,
)


class BatchOnlyPlugin(Exception):
    """A known plugin that has no per-request (single-kernel) analogue."""


def validate_config(d: dict) -> PipelineConfig:
    """Per-request construct_plugin analogue: unknown slot names AND
    unknown top-level fields raise KeyError (get.py:18-19 -> our 400);
    known-but-batch-only selections raise BatchOnlyPlugin (-> 501)
    instead of being silently ignored."""
    if not isinstance(d, dict):
        raise ValueError(f"config must be a JSON object, got {type(d).__name__}")
    # fail-loudly means typo'd FIELDS too, not just plugin names:
    # PipelineConfig.from_dict silently drops unknown keys (lenient for
    # YAML forward-compat), so a request with {"recogniz": false} would
    # otherwise serve defaults with a 200 (ADVICE r4 #3)
    unknown = set(d) - set(PipelineConfig.__dataclass_fields__)
    if unknown:
        raise KeyError(f"unknown config key(s): {', '.join(sorted(unknown))}")
    cfg = PipelineConfig.from_dict(d)
    for slot, registry in (
        ("cleaner", CLEANERS),
        ("assembler", ASSEMBLERS),
        ("enricher", ENRICHERS),
        ("repair", REPAIRERS),
    ):
        name = getattr(cfg, slot)
        if name not in registry:
            raise KeyError(f"unknown {slot} plugin: {name!r}")
    if cfg.cleaner != "strip":
        raise BatchOnlyPlugin(f"cleaner {cfg.cleaner!r} is batch-only")
    if cfg.repair != "none":
        raise BatchOnlyPlugin(f"repair {cfg.repair!r} is batch-only")
    # typo'd KNOBS inside extra are the same silent-dishonor class as
    # typo'd fields: {"extra": {"constat": "woof"}} must 400, not serve
    # the default with a 200 (r5 review)
    from manga_translator_spark.plans.pipeline import validate_extra

    validate_extra(cfg)
    if cfg.enricher == "dict" and "lexicon" in cfg.extra:
        # bad VALUES 400 too: a malformed or duplicate-key lexicon must
        # reject at config time, not 500 mid-request (the batch side
        # raises the same ValueError at compose time)
        from manga_translator_spark.operators.enrich import normalize_lexicon

        normalize_lexicon(cfg.extra["lexicon"])
    return cfg


def _enrich_text(cfg: PipelineConfig, text: str) -> str:
    """The enricher slot's per-request kernel (operators/enrich.py
    semantics on one document): pipe/batched identity, debug constant,
    dict token-lexicon mapping.  Honors the advertised PLUGIN_ARGS knobs
    riding cfg.extra exactly like plans.pipeline.resolve_enricher — the
    served answer must stay byte-identical to the batch row (r5
    review)."""
    if cfg.enricher == "debug":
        constant = str(cfg.extra.get("constant", "meow"))
        return constant if text else text
    if cfg.enricher == "dict":
        from manga_translator_spark.operators.enrich import (
            TRANSLATE_LEXICON,
            normalize_lexicon,
        )

        # the SHARED normalizer: mapping-shaped lexicons go through
        # .items() (bare dict iteration would unpack keys char-by-char)
        # and duplicate source tokens raise — exactly like the batch
        # side, so served == batch cannot diverge on the same config
        raw = cfg.extra.get("lexicon", TRANSLATE_LEXICON)
        lex = dict(normalize_lexicon(raw))
        return " ".join(lex.get(w.lower(), w) for w in text.split(" "))
    return text


def handle_extract(payload: bytes, cfg: PipelineConfig, url: str) -> dict:
    """One payload -> result dict, via the shared kernels (html/pdf
    routed like extract_any).  Testable without sockets."""
    if payload[: len(PDF_MAGIC)] == PDF_MAGIC:
        from manga_translator_spark.operators.pdf_extract import pdf_extract_kernel

        text, spans, n_blocks = pdf_extract_kernel(payload)
        return {
            "url": url,
            "extracted_text": _enrich_text(cfg, text),
            "n_blocks": n_blocks,
            "spans": [dict(s) for s in spans],
            "recognized": [],
        }
    from manga_translator_spark.oracle import extract_page

    res = extract_page(url, payload, recognize=cfg.recognize)
    return {
        "url": res.url,
        "extracted_text": _enrich_text(cfg, res.extracted_text),
        "n_blocks": res.n_blocks,
        "spans": [
            {"block_idx": b, "start": s, "end": e} for (b, s, e) in res.spans
        ],
        "recognized": (
            [[i, t] for (i, t) in res.recognized] if cfg.recognize else []
        ),
    }


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet by default; --verbose re-enables
        if getattr(self.server, "verbose", False):
            super().log_message(*args)

    def _json(self, status: int, obj: dict) -> None:
        body = json.dumps(obj).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, status: int, text: str) -> None:
        body = text.encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "text/html")  # ui/main.py:115
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 - stdlib naming
        if urlparse(self.path).path == "/info":
            self._json(200, describe())
        else:
            self._error(404, "routes: GET /info, POST /extract")

    def do_POST(self):  # noqa: N802
        parsed = urlparse(self.path)
        if parsed.path not in ("/extract", "/clean", "/translate"):
            self._error(404, "routes: GET /info, POST /extract|/clean|/translate")
            return
        try:
            qs = parse_qs(parsed.query)
            try:
                cfg = validate_config(
                    json.loads(qs["config"][0]) if "config" in qs else {}
                )
            except BatchOnlyPlugin as exc:
                self._error(501, f"batch-only plugin: {exc}")
                return
            except (KeyError, ValueError) as exc:
                self._error(400, f"bad config: {exc}")
                return
            if parsed.path == "/clean":
                # the reference's /clean route runs the cleaner-only
                # pipeline (detect+segment+clean, no OCR/translate,
                # ui/main.py:74-119) — here: extraction without the
                # recognition stage, whatever the config said
                cfg.recognize = False
            url = qs.get("url", ["request://post"])[0]
            n = int(self.headers.get("Content-Length", 0))
            payload = self.rfile.read(n)
            if not payload:
                raise ValueError("No payload sent")  # "No Image Sent"
            self._json(200, handle_extract(payload, cfg, url))
        except Exception:  # noqa: BLE001 - ui/main.py:114-119 contract
            traceback.print_exc()
            self._error(500, traceback.format_exc())


def make_server(host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Bound-but-not-serving server (tests drive serve_forever in a
    thread; port=0 picks a free port, server.server_address has it)."""
    return ThreadingHTTPServer((host, port), _Handler)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    srv = make_server(args.host, args.port)
    srv.verbose = args.verbose
    print(json.dumps({"serving": f"http://{args.host}:{srv.server_address[1]}"}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
