"""S4 fetch source + S7/P5 per-request serving layer.

The fetch tests use local transports only (file:// URLs, bare paths, an
injected fake http fetcher) — the sandbox has no external network, and
the injectable-transport design is exactly what makes that testable.
The serve tests drive the real HTTP server over localhost and assert the
served answer is byte-identical to the shared kernel's.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import pandas as pd
import pytest
from pyspark.sql import functions as F

from manga_translator_spark.corpus import generate_corpus
from manga_translator_spark.oracle import extract_page


def test_fetch_pages_local_transports(spark, tmp_path):
    """file:// URLs and bare paths read locally (the reference's
    else-branch, ui/main.py:36-41 incl. the '?' strip); http(s) goes
    through the injected fetcher; failures land in the error column."""
    from manga_translator_spark.sources.http import as_pages, fetch_pages

    p1 = tmp_path / "a.html"
    p1.write_bytes(b"<html><p>alpha doc</p></html>")
    p2 = tmp_path / "b.html"
    p2.write_bytes(b"<html><p>beta doc</p></html>")

    def fake_http(url: str) -> bytes:
        if url.startswith(("http://", "https://")):
            return b"<html><p>remote " + url.encode() + b"</p></html>"
        from manga_translator_spark.sources.http import default_fetcher

        return default_fetcher(url)

    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    f"file://{p1}",
                    f"{p2}?ignored=1",
                    "http://example.test/x",
                    str(tmp_path / "missing.html"),
                ]
            }
        )
    )
    got = {r["url"]: r for r in fetch_pages(urls, fetcher=fake_http).collect()}
    assert bytes(got[f"file://{p1}"]["html"]) == p1.read_bytes()
    assert bytes(got[f"{p2}?ignored=1"]["html"]) == p2.read_bytes()
    assert bytes(got["http://example.test/x"]["html"]).startswith(b"<html><p>remote")
    bad = got[str(tmp_path / "missing.html")]
    assert bad["html"] is None and "FileNotFoundError" in bad["error"]
    # as_pages keeps only successes, standard schema
    pages = as_pages(fetch_pages(urls, fetcher=fake_http), lang="en")
    assert pages.count() == 3
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    # on_error="raise" restores the reference's raising contract
    with pytest.raises(Exception):  # Spark wraps the worker's exception
        fetch_pages(urls, fetcher=fake_http, on_error="raise").collect()
    with pytest.raises(ValueError):
        fetch_pages(urls, on_error="nope")


def test_fetch_pages_host_partitioning(spark):
    """partition_by_host shuffles on the JVM-side parse_url host — the
    politeness layout (one host, one task)."""
    from manga_translator_spark.sources.http import fetch_pages

    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"http://h{i % 3}.test/p{i}" for i in range(30)]
                # a malformed url must NOT abort the shuffle (ANSI
                # parse_url throws; try_parse_url keys it NULL — r4
                # review) — the per-row capture still records its error
                + ["http://bad url with spaces/x"]
            }
        )
    )
    df = fetch_pages(urls, fetcher=lambda u: b"x", partition_by_host=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    assert "try_parse_url" in plan and "RepartitionByExpression" in plan, plan

    def fetch_or_raise(u: str) -> bytes:
        if " " in u:
            raise ValueError("malformed")
        return u.split("/")[2].encode()

    rows = fetch_pages(urls, fetcher=fetch_or_raise, partition_by_host=True).collect()
    assert len(rows) == 31
    by_url = {r["url"]: r for r in rows}
    bad = by_url.pop("http://bad url with spaces/x")
    assert bad["html"] is None and "ValueError" in bad["error"]
    assert all(bytes(r["html"]).decode() == u.split("/")[2] for u, r in by_url.items())


def _post(base: str, payload: bytes, query: str = "") -> tuple[int, bytes]:
    req = urllib.request.Request(
        base + "/extract" + query, data=payload, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture(scope="module")
def server():
    import jobs.serve as serve

    srv = serve.make_server("127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_serve_info_and_extract_parity(server):
    """GET /info mirrors describe(); POST /extract answers byte-identical
    to the shared kernel for both html and PDF payloads (P5: fresh config
    per request, unknown plugins 400, empty body 500)."""
    from manga_translator_spark.functions.pdf import make_pdf
    from manga_translator_spark.operators.pdf_extract import pdf_extract_kernel
    from manga_translator_spark.plans.pipeline import describe

    with urllib.request.urlopen(server + "/info", timeout=10) as resp:
        info = json.loads(resp.read())
    assert info["slots"] == describe()["slots"]
    assert "operators" in info and "plugins" in info

    row = generate_corpus(3)[2]
    status, body = _post(server, bytes(row["html"]), f"?url={row['url']}")
    assert status == 200
    got = json.loads(body)
    exp = extract_page(row["url"], bytes(row["html"]))
    assert got["extracted_text"] == exp.extracted_text
    assert got["n_blocks"] == exp.n_blocks
    assert [(s["block_idx"], s["start"], s["end"]) for s in got["spans"]] == [
        (b, s, e) for (b, s, e) in exp.spans
    ]
    assert got["recognized"] == [[i, t] for (i, t) in exp.recognized]

    # recognize=false honored per-request (P5 config)
    status, body = _post(
        server, bytes(row["html"]), '?config={"recognize":false}'
    )
    assert status == 200 and json.loads(body)["recognized"] == []

    # PDF payloads route through the PDF kernel
    pdf = make_pdf([(72, 600, 11, "pdf body text"), (72, 700, 16, "Title")])
    status, body = _post(server, pdf)
    text, spans, n = pdf_extract_kernel(pdf)
    got = json.loads(body)
    assert status == 200 and got["extracted_text"] == text and got["n_blocks"] == n

    # enricher slot HONORED per-request (r4 review: validated-but-ignored
    # slots silently served default answers)
    status, body = _post(
        server, bytes(row["html"]), '?config={"enricher":"debug"}'
    )
    assert status == 200
    assert json.loads(body)["extracted_text"] == ("meow" if exp.extracted_text else "")
    status, body = _post(
        server, bytes(row["html"]), '?config={"enricher":"dict"}'
    )
    from manga_translator_spark.operators.enrich import TRANSLATE_LEXICON

    lex = dict(TRANSLATE_LEXICON)
    exp_dict = " ".join(
        lex.get(w.lower(), w) for w in exp.extracted_text.split(" ")
    )
    assert status == 200 and json.loads(body)["extracted_text"] == exp_dict

    # unknown plugin -> 400 (construct_plugin_by_name raising contract)
    status, body = _post(
        server, bytes(row["html"]), '?config={"cleaner":"nope"}'
    )
    assert status == 400 and b"unknown cleaner" in body

    # known-but-batch-only plugin -> 501, never a silently-default answer
    status, body = _post(
        server, bytes(row["html"]), '?config={"cleaner":"mask"}'
    )
    assert status == 501 and b"batch-only" in body

    # config that is JSON but not an object -> 400, not a 500 traceback
    status, body = _post(server, bytes(row["html"]), "?config=[1]")
    assert status == 400 and b"bad config" in body

    # /clean forces the cleaner-only pipeline (no recognition) and
    # /translate aliases the full pipeline (reference routes ui/main.py)
    req = urllib.request.Request(
        server + "/clean", data=bytes(row["html"]), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        cleaned = json.loads(resp.read())
    assert cleaned["recognized"] == []
    assert cleaned["extracted_text"] == exp.extracted_text
    req = urllib.request.Request(
        server + "/translate", data=bytes(row["html"]), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        translated = json.loads(resp.read())
    assert translated["recognized"] == [[i, t] for (i, t) in exp.recognized]

    # empty body -> 500 with traceback text (ui/main.py error contract)
    status, body = _post(server, b"")
    assert status == 500 and b"No payload" in body


def test_fetch_pages_scheme_allowlist(spark, tmp_path):
    """The DEFAULT transport refuses executor-local reads unless the job
    opts in (ADVICE r4 #5): a crawl table is untrusted, and the
    reference-faithful else-branch would otherwise read file:///etc/...
    rows into the corpus.  Injected fetchers own their own policy."""
    from manga_translator_spark.sources.http import fetch_pages

    p = tmp_path / "a.html"
    p.write_bytes(b"<html><p>local</p></html>")
    urls = spark.createDataFrame(
        pd.DataFrame({"url": [f"file://{p}", str(p)]})
    )
    # default: file/local are NOT allowed -> per-row PermissionError
    rows = {r["url"]: r for r in fetch_pages(urls).collect()}
    assert all(r["html"] is None for r in rows.values())
    assert all("PermissionError" in r["error"] for r in rows.values())
    # opted in: both transports read the local file
    rows = {
        r["url"]: r
        for r in fetch_pages(
            urls, allowed_schemes=("http", "https", "file", "local")
        ).collect()
    }
    assert all(bytes(r["html"]) == p.read_bytes() for r in rows.values())
    # injected fetcher is not gated
    got = fetch_pages(urls, fetcher=lambda u: b"x").collect()
    assert all(bytes(r["html"]) == b"x" for r in got)


def test_fetch_pages_mega_host_salt(spark):
    """max_per_task fans a mega-host out over >1 salted task with a
    bounded per-task row count (VERDICT r4 ask #3) — bare
    partition_by_host would send all 10^4 rows to ONE task."""
    from manga_translator_spark.sources.http import fetch_pages

    n, cap = 10_000, 2_000
    urls = spark.range(n).selectExpr(
        "concat('http://mega.test/p', lpad(cast(id as string), 6, '0')) AS url"
    )
    df = fetch_pages(
        urls, fetcher=lambda u: b"x", partition_by_host=True, max_per_task=cap
    )
    sizes = [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert sum(sizes) == n
    assert len(sizes) > 1, "mega-host must fan out over >1 task"
    # ceil(n/cap)=5 salt keys of <= cap rows each; which keys co-locate is
    # a partitioner-hash accident, so the only layout-independent bound is
    # "at least one full salt group landed on another task" — a tighter
    # multiple-of-cap bound broke whenever >=3 keys hash together (r5
    # review)
    assert max(sizes) <= n - cap, sizes


def test_fetch_pages_max_per_task_requires_partitioning(spark):
    """max_per_task outside partition_by_host=True is a config error, not
    a silent no-op — ignoring it would void the documented aggregate
    politeness bound while the caller believes it holds (r5 review)."""
    from manga_translator_spark.sources.http import fetch_pages

    urls = spark.createDataFrame(pd.DataFrame({"url": ["http://a.test/"]}))
    with pytest.raises(ValueError, match="partition_by_host"):
        fetch_pages(urls, fetcher=lambda u: b"x", max_per_task=10)


def test_fetch_pages_gate_and_local_reads_skip_limiter(spark, tmp_path):
    """Scheme-gated rows are rejected BEFORE reserving a limiter slot, and
    opted-in local reads need no politeness gap: 30 bare-path rows at
    min_interval_sec=5 would cost ~145 s per pass if each slept against
    the shared netloc='' bucket (r5 review)."""
    import time

    from manga_translator_spark.sources.http import fetch_pages

    paths = []
    for i in range(30):
        p = tmp_path / f"f{i}.html"
        p.write_bytes(b"<p>x</p>")
        paths.append(str(p))
    urls = spark.createDataFrame(pd.DataFrame({"url": paths})).coalesce(1)
    t0 = time.monotonic()
    rows = fetch_pages(urls, min_interval_sec=5.0).collect()
    assert all("PermissionError" in r["error"] for r in rows)
    rows = fetch_pages(
        urls,
        min_interval_sec=5.0,
        allowed_schemes=("http", "https", "file", "local"),
    ).collect()
    assert all(r["error"] is None for r in rows)
    # two 30-row passes: ~290 s if the limiter throttled them, seconds if
    # not; the generous bound absorbs VM steal without masking the bug
    assert time.monotonic() - t0 < 60.0


def test_fetch_pages_rate_limiter(spark):
    """min_interval_sec enforces the per-task per-host token-bucket gap:
    k same-host requests in one task take >= (k-1)*interval; distinct
    hosts are not serialized against each other."""
    import time

    from manga_translator_spark.sources.http import fetch_pages

    urls = spark.createDataFrame(
        pd.DataFrame({"url": [f"http://one.test/p{i}" for i in range(4)]})
    ).coalesce(1)
    t0 = time.monotonic()
    assert fetch_pages(urls, fetcher=lambda u: b"x", min_interval_sec=0.15).count() == 4
    assert time.monotonic() - t0 >= 3 * 0.15
    # per-host buckets: 4 different hosts, same interval, no 3x wait
    mixed = spark.createDataFrame(
        pd.DataFrame({"url": [f"http://h{i}.test/p" for i in range(4)]})
    ).coalesce(1)
    t0 = time.monotonic()
    assert fetch_pages(mixed, fetcher=lambda u: b"x", min_interval_sec=5.0).count() == 4
    # cross-host serialization would force >= 3*5.0 s of sleep; anything
    # under that is scheduling/worker-startup noise, which on this VM can
    # exceed a tight absolute bound (BENCH/BASELINE.md steal notes)
    assert time.monotonic() - t0 < 3 * 5.0


def test_serve_unknown_config_key_400(server):
    """A typo'd config FIELD is rejected 400 like an unknown plugin name
    (ADVICE r4 #3) — PipelineConfig.from_dict silently drops unknown
    keys, so without the explicit check {"recogniz": false} would serve
    the default pipeline with a 200."""
    row = generate_corpus(1)[0]
    status, body = _post(
        server, bytes(row["html"]), '?config={"recogniz":false}'
    )
    assert status == 400 and b"unknown config key" in body
    # the correctly-spelled field still works
    status, body = _post(
        server, bytes(row["html"]), '?config={"recognize":false}'
    )
    assert status == 200


def test_serve_concurrent_requests_no_bleed(server):
    """P5 isolation under concurrency (VERDICT r4 ask #5): N parallel
    POSTs with DIFFERENT per-request configs against the threading
    server; every response must be byte-identical to its own config's
    kernel answer — a shared-config bleed would leak one request's
    enricher/recognize setting into another's answer."""
    from concurrent.futures import ThreadPoolExecutor

    rows = generate_corpus(6)
    cases = []  # (payload, query, expected_extracted, expect_recognized)
    for i, row in enumerate(rows):
        exp = extract_page(row["url"], bytes(row["html"]))
        if i % 3 == 0:
            cases.append((bytes(row["html"]), "", exp.extracted_text, True))
        elif i % 3 == 1:
            cases.append(
                (
                    bytes(row["html"]),
                    '?config={"enricher":"debug"}',
                    "meow" if exp.extracted_text else "",
                    True,
                )
            )
        else:
            cases.append(
                (
                    bytes(row["html"]),
                    '?config={"recognize":false}',
                    exp.extracted_text,
                    False,
                )
            )

    def hit(case):
        payload, query, _, _ = case
        return _post(server, payload, query)

    with ThreadPoolExecutor(max_workers=8) as pool:
        for _round in range(3):  # repeat to widen the interleaving window
            for (status, body), (_, _, want_text, want_rec) in zip(
                pool.map(hit, cases), cases
            ):
                assert status == 200, body
                got = json.loads(body)
                assert got["extracted_text"] == want_text
                if not want_rec:
                    assert got["recognized"] == []


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_serve_unknown_extra_knob_400(server):
    """A typo'd KNOB inside extra is rejected 400 like a typo'd field —
    validate_extra stops the silent-dishonor one level deeper (r5
    review); a knob advertised by the selected enricher still works and
    is honored."""
    from manga_translator_spark.oracle import extract_page

    row = next(
        r for r in generate_corpus(30)
        if extract_page(r["url"], r["html"]).extracted_text
    )
    status, body = _post(
        server,
        bytes(row["html"]),
        '?config={"enricher":"debug","extra":{"constat":"woof"}}',
    )
    assert status == 400 and b"unknown extra knob" in body
    status, body = _post(
        server,
        bytes(row["html"]),
        '?config={"enricher":"debug","extra":{"constant":"woof"}}',
    )
    assert status == 200 and b"woof" in body


def test_serve_duplicate_lexicon_400_and_mapping_shape(server):
    """A mapping-shaped lexicon is honored via the shared normalizer (a
    bare dict iteration would unpack keys char-by-char); duplicate source
    tokens are rejected on the serve path exactly like batch ANSI map()
    rejects them (r5 review)."""
    import json as _json
    import urllib.parse

    row = generate_corpus(1)[0]
    cfg = {"enricher": "dict", "extra": {"lexicon": [["the", "der"], ["the", "das"]]}}
    status, body = _post(
        server, bytes(row["html"]), "?config=" + urllib.parse.quote(_json.dumps(cfg))
    )
    assert status == 400 and b"duplicate lexicon" in body
    cfg = {"enricher": "dict", "extra": {"lexicon": {"to": "zu"}}}
    status, body = _post(
        server, bytes(row["html"]), "?config=" + urllib.parse.quote(_json.dumps(cfg))
    )
    assert status == 200
