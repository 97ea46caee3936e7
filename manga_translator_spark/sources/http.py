"""HTTP/local fetch source (S4) — URL table -> payload bytes, distributed.

Reference analogue: ``cv2_image_from_url`` (ui/main.py:32-41) — ``http``
URLs go through a network client, anything else is read as a local path,
and a failed load raises.  Re-expressed for a crawl-scale engine:

* the unit of work is a TABLE of URLs, not one URL — fetching is a
  narrow ``mapInPandas`` over the url column, so 1000 executors fetch
  in parallel with zero shuffle;
* the transport is INJECTABLE (``fetcher``): the default uses stdlib
  ``urllib`` for ``http(s)://`` (import-try gated — this sandbox has no
  external network, so CI exercises ``file://``/path fetches and a fake
  transport; the real one activates unmodified where network exists),
  and plain local reads for ``file://`` URLs and bare paths (the
  reference's else-branch);
* failures DON'T raise per-row at scale (one dead link must not kill a
  10^9-row fetch): each row carries an ``error`` column instead, and
  ``on_error="raise"`` restores the reference's raising contract for
  small interactive jobs;
* ``partition_by_host=True`` repartitions by url host first — the
  politeness/connection-reuse layout (all requests to one host land on
  one task, where the per-worker transport can keep a session alive and
  rate-limit); uses the JVM-side ``parse_url`` so the shuffle key is
  codegen'd.

Output schema: (url, html BINARY, error STRING) — ``html`` feeds the
standard pages schema (schema.PAGES_SCHEMA) via ``as_pages``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable

from pyspark.sql import Window as W
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

FETCH_TIMEOUT_SEC = 10


def _url_scheme(url: str) -> str:
    """Coarse scheme class for the allowlist: http/https/file, or
    "local" for the reference's bare-path else-branch."""
    if url.startswith("http://"):
        return "http"
    if url.startswith("https://"):
        return "https"
    if url.startswith("file://"):
        return "file"
    return "local"


def default_fetcher(url: str, timeout: float = FETCH_TIMEOUT_SEC) -> bytes:
    """http(s):// via urllib (gated), file:// and bare paths locally —
    the cv2_image_from_url routing (ui/main.py:33-41) with bytes out."""
    if url.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            return resp.read()
    if url.startswith("file://"):
        import urllib.parse
        import urllib.request

        path = urllib.parse.unquote(
            urllib.parse.urlparse(url.split("?", 1)[0]).path
        )
        with open(path, "rb") as f:
            return f.read()
    # bare local path (reference else-branch; '?' suffix stripped the same)
    import urllib.parse

    with open(urllib.parse.unquote(url.split("?", 1)[0]), "rb") as f:
        return f.read()


def fetch_pages(
    urls: "DataFrame",
    fetcher: Callable[[str], bytes] | None = None,
    on_error: str = "null",
    partition_by_host: bool = False,
    max_per_task: int | None = None,
    min_interval_sec: float = 0.0,
    allowed_schemes: tuple[str, ...] = ("http", "https"),
) -> "DataFrame":
    """(url) -> (url, html, error): distributed fetch with per-row error
    capture.  ``fetcher`` is shipped by value (cloudpickle) so tests and
    deployments inject transports without touching executors' module
    state (the enrich.make_enrich_batched discipline).

    ``allowed_schemes`` gates the DEFAULT transport only (ADVICE r4 #5):
    a crawl table is untrusted input, and the reference-faithful
    else-branch reads any non-http value as an executor-LOCAL path — so
    ``file``/``local`` rows error out ("scheme not allowed") unless the
    job opts in with ``allowed_schemes=("http", "https", "file",
    "local")``.  An injected ``fetcher`` owns its own policy and is not
    gated.

    Mega-host skew (VERDICT r4 ask #3): bare ``partition_by_host=True``
    maps one host -> one task — correct politeness, but a host with 10^8
    URLs becomes a single straggler.  ``max_per_task=N`` fans each host
    out over ceil(host_count / N) salted tasks (salt = per-host
    row_number div N, so every task holds <= N URLs of a host modulo
    hash-partition collisions); the numbering window shuffles only the
    url strings, which is noise next to the fetch itself.  Politeness is
    then kept by the per-task limiter: ``min_interval_sec`` enforces a
    token-bucket-style minimum gap between successive requests to the
    same host WITHIN a task, so the aggregate request rate to a host is
    bounded by ceil(host_count / max_per_task) / min_interval_sec
    requests per second — pick the pair so that bound honors the
    crawl-delay contract (e.g. N=10^6, 0.1 s -> <= 10 * n_salts rps).
    """
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")
    if max_per_task is not None and not partition_by_host:
        # silently ignoring the cap would void the documented aggregate
        # politeness bound while the caller believes it holds (r5 review)
        raise ValueError("max_per_task requires partition_by_host=True")
    if fetcher is None:
        schemes = tuple(allowed_schemes)

        def gate(u: str, _schemes=schemes) -> None:
            s = _url_scheme(u)
            if s not in _schemes:
                raise PermissionError(
                    f"scheme {s!r} not in allowed_schemes {_schemes!r}"
                )

        # politeness is a NETWORK contract: opted-in file/local reads need
        # no inter-request gap, and (with the gate above running FIRST)
        # junk rows never reserve a limiter slot — previously every
        # bare-path row slept against a shared netloc='' bucket before
        # being rejected (r5 review)
        def throttled(u: str) -> bool:
            return u.startswith(("http://", "https://"))

        fn = default_fetcher
    else:
        gate = None
        throttled = None
        fn = fetcher
    strict = on_error == "raise"
    interval = float(min_interval_sec)

    def gen(batches):
        import time
        from urllib.parse import urlsplit

        next_ok: dict[str, float] = {}
        for pdf in batches:
            payloads: list[bytes | None] = []
            errors: list[str | None] = []
            for u in pdf["url"]:
                if gate is not None:
                    try:
                        gate(u)
                    except Exception as exc:  # noqa: BLE001 - per-row capture
                        if strict:
                            raise
                        payloads.append(None)
                        errors.append(f"{type(exc).__name__}: {exc}")
                        continue
                if interval > 0 and (throttled is None or throttled(u)):
                    host = urlsplit(u).netloc
                    wait = next_ok.get(host, 0.0) - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    next_ok[host] = time.monotonic() + interval
                try:
                    payloads.append(fn(u))
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001 - per-row capture
                    if strict:
                        raise
                    payloads.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {"url": pdf["url"], "html": payloads, "error": errors}
            )

    src = urls.select("url")
    if partition_by_host:
        # try_parse_url: under ANSI mode parse_url THROWS on a malformed
        # url, killing the whole job before the per-row error capture
        # ever runs (r4 review) — NULL keys just co-locate the junk rows.
        host = F.expr("try_parse_url(url, 'HOST')")
        if max_per_task:
            w = W.partitionBy(host).orderBy("url")
            # pinned partition count: AQE's coalescing is BYTE-based, and
            # a url list is tiny in bytes but huge in fetch cost — an
            # adaptive exchange would merge the salted tasks right back
            # into one.  User-specified counts are exempt from coalescing.
            n_parts = urls.sparkSession.sparkContext.defaultParallelism
            src = (
                src.withColumn(
                    "__salt",
                    F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(int(max_per_task))),
                )
                .repartition(n_parts, host, F.col("__salt"))
                .drop("__salt")
            )
        else:
            src = src.repartition(host)
    return src.mapInPandas(gen, schema="url STRING, html BINARY, error STRING")


def as_pages(fetched: "DataFrame", lang: str | None = None) -> "DataFrame":
    """Adapt fetch output to the standard pages schema (successful rows
    only — the error rows are the caller's dead-letter table)."""
    return fetched.filter(F.col("error").isNull()).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit(lang).cast("string").alias("lang"),
    )
