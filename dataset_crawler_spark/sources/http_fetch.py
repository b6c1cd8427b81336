"""Live HTTP fetch + probe stage — the production FetchFn over real sockets.

This fills the one promise the earlier rounds left open: ``simulated_fetcher``
(streaming/rounds.py) documents "the production fetcher has the same signature
with a mapInPandas HTTP stage emitting success/error/exception/time_out per
request" — this module IS that stage. Reference parity:

- per-request fetch with timeout and per-operation status rows:
  data_crawler/DataCrawler.java:235-249 (connect/read timeouts),
  crawl_utils/CrawlerLogs.java:30-48 (status vocabulary
  success|error|exception|time_out — reused verbatim);
- endpoint availability probe before crawling:
  data_crawler/DataCrawler.java:36-57 (LIMIT-1 probe, outcome logged either
  way) — ``http_prober`` plugs into sources/probe.py's injectable slot;
- body → interleaved-document parsing mirrors the batch sources: N-Triples
  bodies follow sources/ntriples.py's span mapping (predicate → kind,
  literal → text, IRI object → media_ref, line order → offset,
  DatasetDumpCrawler.java:66-127), JSON bodies follow the engine's native
  interchange ({"spans": [...]}, the CKAN/metadata path of
  metadata_crawler/Metadata.java:41-106).

Execution shape (100-TB regime): the scheduled frontier arrives already
politeness-capped per host (operators/scheduler.py top-k), so the fetch stage
is embarrassingly parallel — one ``mapInPandas`` pass, each Arrow batch fetched
with a bounded thread pool (network-latency hiding; threads block on sockets,
not the GIL). No per-row Python UDF: one Python invocation per BATCH, and the
result rides back to the JVM as one Arrow batch. Rows keep their input order
(``Executor.map``), so the stage is deterministic given deterministic servers.

Tests drive this against an in-process loopback ``http.server`` — real
sockets, zero external network (tests/test_http_fetch.py).
"""

from __future__ import annotations

import json
import re
import socket
import urllib.error
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

OP_SUCCESS, OP_ERROR, OP_EXCEPTION, OP_TIMEOUT = (
    "success",
    "error",
    "exception",
    "time_out",
)

#: conditional-GET outcome beyond the reference's CrawlerLogs vocabulary: the
#: server answered 304 Not Modified to our validators, so the stored state is
#: current and NO body crossed the wire. Not a failure (never retried, never
#: counts against a host's budget) and not a plain success (there is nothing
#: to diff) — its own status so the ops log records the bandwidth saved.
OP_NOT_MODIFIED = "not_modified"

#: 3xx surfaced instead of silently followed (``follow_redirects=False``):
#: the fetch stage reports the hop and the ENGINE decides — the target is
#: queued through the discovery path (canonicalized, seen-filtered,
#: robots-gated, politeness-budgeted like any outlink) instead of being
#: fetched off-budget inside the opener, and chains cap at the closure
#: loop's round limit rather than urllib's hidden limit. Not a failure
#: (never retried, never counts against a host's budget): the redirecting
#: URL is fully handled the moment its target is queued.
OP_REDIRECT = "redirect"

#: status codes that carry a Location worth following (RFC 9110 §15.4;
#: 304 is handled by the conditional path, 300/305/306 carry no target)
_REDIRECT_CODES = frozenset((301, 302, 303, 307, 308))


class _NoRedirectHandler(urllib.request.HTTPRedirectHandler):
    """Turn every 3xx into an HTTPError so the fetch path SEES the hop."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


_NOREDIRECT_OPENER = urllib.request.build_opener(_NoRedirectHandler)

USER_AGENT = "dataset-crawler-spark/0.3"

#: mapInPandas output schema — matches simulated_fetcher's columns so
#: CrawlEngine.crawl_round treats both fetchers identically (status-aware).
FETCH_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind string, text string, media_ref string, offset int>>, "
    "status string, message string"
)

#: conditional fetcher adds the response validators (HTTP ETag +
#: Last-Modified) so the engine can persist them and revalidate next round.
FETCH_COND_SCHEMA = FETCH_SCHEMA + ", etag string, last_modified string"

# Same triple grammar as sources/ntriples.py (kept in sync — parity-tested).
_TRIPLE_RE = re.compile(r"^\s*<([^>]+)>\s+<([^>]+)>\s+(.*?)\s*\.\s*$")
_LIT_RE = re.compile(r'^"(.*)"(?:\^\^<[^>]+>|@[A-Za-z-]+)?$')
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def span_dict(s: dict, i: int) -> dict:
    """Normalize one JSON span object to the interleaved span shape
    (shared by parse_spans and sources/endpoint_scan._page_docs so the
    defaulting rules can never diverge). Raises on non-dict input — callers
    decide their malformation policy."""
    return {
        "kind": s.get("kind", "text"),
        "text": s.get("text"),
        "media_ref": s.get("media_ref"),
        "offset": i if s.get("offset") is None else int(s["offset"]),
    }


def parse_spans(content_type: str, body: bytes) -> list[dict]:
    """Decode one fetched body into the interleaved span list.

    - ``application/json``: the engine interchange — ``{"spans": [...]}`` with
      each span ``{kind, text, media_ref, offset}`` (offset defaults to list
      position); a bare list is treated as the span list itself.
    - ``application/n-triples``: per-line triples, sources/ntriples.py span
      mapping, offsets = line order (DatasetDumpCrawler.java:66-127 twin).
    - anything else: the whole body as a single ``kind='text'`` span.
    """
    ctype = (content_type or "").split(";")[0].strip().lower()
    if ctype == "application/json":
        payload = json.loads(body.decode("utf-8"))
        raw = payload["spans"] if isinstance(payload, dict) else payload
        return [span_dict(s, i) for i, s in enumerate(raw)]
    if ctype in ("application/n-triples", "text/plain+ntriples", "application/n-quads"):
        spans: list[dict] = []
        for line in body.decode("utf-8").splitlines():
            m = _TRIPLE_RE.match(line)
            if not m:
                continue
            _, pred, obj = m.groups()
            is_iri = obj.startswith("<") and obj.endswith(">")
            lit_m = None if is_iri else _LIT_RE.match(obj)
            lit = lit_m.group(1) if lit_m else None
            if pred == RDF_TYPE:
                kind, text, media = "rdf:type", (obj[1:-1] if is_iri else lit), None
            else:
                kind, text, media = pred, lit, (obj[1:-1] if is_iri else None)
            spans.append(
                {"kind": kind, "text": text, "media_ref": media, "offset": len(spans)}
            )
        return spans
    return [
        {
            "kind": "text",
            "text": body.decode("utf-8", errors="replace"),
            "media_ref": None,
            "offset": 0,
        }
    ]


def _classify(exc: BaseException) -> tuple[str, str]:
    """Map a fetch failure onto the CrawlerLogs status vocabulary."""
    if isinstance(exc, urllib.error.HTTPError):
        return OP_ERROR, f"{exc.code}: {exc.reason}"
    if isinstance(exc, (socket.timeout, TimeoutError)):
        return OP_TIMEOUT, f"timed out: {exc}"
    if isinstance(exc, urllib.error.URLError):
        if isinstance(exc.reason, (socket.timeout, TimeoutError)):
            return OP_TIMEOUT, f"timed out: {exc.reason}"
        return OP_EXCEPTION, f"{type(exc.reason).__name__}: {exc.reason}"
    return OP_EXCEPTION, f"{type(exc).__name__}: {exc}"


def fetch_one(
    url: str, timeout_s: float, parser=parse_spans, follow_redirects: bool = True
) -> tuple:
    """GET one URL → (status, message, spans|None). Never raises.

    The 3-column projection of :func:`fetch_one_cond` (ONE implementation
    of the GET/classify/parse path — an unsolicited 304 from a buggy
    server classifies as ``not_modified`` here too, which is the sane
    reading either way)."""
    return fetch_one_cond(
        url, timeout_s, parser=parser, follow_redirects=follow_redirects
    )[:3]


def fetch_one_cond(
    url: str,
    timeout_s: float,
    etag: str | None = None,
    last_modified: str | None = None,
    parser=parse_spans,
    follow_redirects: bool = True,
) -> tuple:
    """Conditional GET (RFC 9110 §13): sends ``If-None-Match`` /
    ``If-Modified-Since`` when the caller holds validators from a prior
    fetch. Returns (status, message, spans|None, etag|None, last_modified|
    None). A 304 reply keeps the presented validators (the stored document
    is current — zero body bytes moved); a 200 reply carries the server's
    fresh validators for the next revalidation. Never raises.

    ``follow_redirects=False`` surfaces 3xx as an ``OP_REDIRECT`` row
    instead of letting urllib chase the chain off-budget: message is
    ``"<code>: <absolute-location>"`` (the error-row format, machine-split
    on ": ") and spans carry one ``kind='redirect'`` span whose
    ``media_ref`` is the absolute target — the interleaved-document form
    of "this URL's content is a pointer", which the engine's discovery
    path turns into a frontier row like any outlink. A 3xx with no
    Location header is a plain error."""
    headers = {"User-Agent": USER_AGENT}
    if etag:
        headers["If-None-Match"] = etag
    if last_modified:
        headers["If-Modified-Since"] = last_modified
    req = urllib.request.Request(url, headers=headers)
    opener = urllib.request.urlopen if follow_redirects else _NOREDIRECT_OPENER.open
    try:
        with opener(req, timeout=timeout_s) as resp:
            body = resp.read()
            ctype = resp.headers.get("Content-Type", "")
            new_etag = resp.headers.get("ETag")
            new_lm = resp.headers.get("Last-Modified")
        try:
            return (
                OP_SUCCESS, f"fetched {len(body)} bytes", parser(ctype, body),
                new_etag, new_lm,
            )
        except Exception as exc:  # parse failure ≠ transport failure
            return (
                OP_EXCEPTION, f"parse: {type(exc).__name__}: {exc}", None,
                new_etag, new_lm,
            )
    except urllib.error.HTTPError as exc:
        if exc.code == 304:
            return (
                OP_NOT_MODIFIED, "304: not modified", None, etag, last_modified
            )
        if not follow_redirects and exc.code in _REDIRECT_CODES:
            loc = exc.headers.get("Location") if exc.headers else None
            if loc:
                target = urllib.parse.urljoin(url, loc)
                span = {
                    "kind": "redirect", "text": None,
                    "media_ref": target, "offset": 0,
                }
                return OP_REDIRECT, f"{exc.code}: {target}", [span], None, None
        return OP_ERROR, f"{exc.code}: {exc.reason}", None, None, None
    except Exception as exc:  # NOT BaseException: Ctrl-C/SystemExit propagate
        status, message = _classify(exc)
        return status, message, None, None, None


def http_fetcher(
    timeout_s: float = 5.0,
    max_workers: int = 8,
    parser=parse_spans,
    follow_redirects: bool = True,
):
    """Build the production FetchFn: ``fetch(spark, scheduled) -> live_raw``.

    ``scheduled`` is schedule_round's output (carries ``url_c``); the result
    has simulated_fetcher's exact shape (doc_id, spans, status, message), so
    CrawlEngine.crawl_round's status-aware branch, ops_log rows, and
    retry_frontier requeue work unchanged over real sockets.

    ``max_workers`` bounds the per-task thread pool — with the politeness
    top-k already enforced upstream, total concurrency against any one host
    is (tasks holding that host) × max_workers; hosts are hash-spread across
    tasks by the scheduler's salting, so per-host pressure stays bounded.

    ONE fetch-stage implementation: this is the validator-free projection
    of :func:`http_fetcher_conditional` (url_c only in, validator columns
    dropped out), so error classification, batching, and pool sizing can
    never drift between the two."""
    cond = http_fetcher_conditional(
        timeout_s=timeout_s,
        max_workers=max_workers,
        parser=parser,
        follow_redirects=follow_redirects,
    )

    def fetch(spark: SparkSession, scheduled: DataFrame) -> DataFrame:
        return cond(spark, scheduled.select("url_c")).drop(
            "etag", "last_modified"
        )

    return fetch


def http_fetcher_conditional(
    timeout_s: float = 5.0,
    max_workers: int = 8,
    parser=parse_spans,
    follow_redirects: bool = True,
):
    """Conditional-GET FetchFn: like :func:`http_fetcher` but revalidates
    instead of refetching. If the ``scheduled`` frame carries ``etag`` /
    ``last_modified`` columns (the engine joins its validator table on —
    CrawlEngine.crawl_round(conditional=True)), each request presents them
    and an unchanged document comes back as ONE status row
    (``not_modified``) instead of a body — at refresh-crawl scale the
    dominant bandwidth cost (re-downloading the unchanged majority) drops
    to a header exchange. Output schema = FETCH_COND_SCHEMA: success rows
    carry the server's fresh validators for the next round.

    Same execution shape as the plain fetcher: one mapInPandas stage, one
    Python invocation per Arrow batch, bounded thread pool per task."""

    def fetch(spark: SparkSession, scheduled: DataFrame) -> DataFrame:
        cols = ["url_c"]
        has_validators = "etag" in scheduled.columns
        if has_validators:
            cols += ["etag", "last_modified"]

        def run(batches):
            for pdf in batches:
                urls = pdf["url_c"].tolist()
                if not urls:
                    continue
                if has_validators:
                    etags = [e if isinstance(e, str) else None for e in pdf["etag"]]
                    lms = [
                        m if isinstance(m, str) else None
                        for m in pdf["last_modified"]
                    ]
                else:
                    etags = [None] * len(urls)
                    lms = [None] * len(urls)
                with ThreadPoolExecutor(max_workers=max_workers) as pool:
                    results = list(
                        pool.map(
                            lambda ue: fetch_one_cond(
                                ue[0], timeout_s, ue[1], ue[2], parser,
                                follow_redirects=follow_redirects,
                            ),
                            zip(urls, etags, lms),
                        )
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": urls,
                        "spans": [r[2] for r in results],
                        "status": [r[0] for r in results],
                        "message": [r[1] for r in results],
                        "etag": [r[3] for r in results],
                        "last_modified": [r[4] for r in results],
                    }
                )

        return scheduled.select(*cols).mapInPandas(run, FETCH_COND_SCHEMA)

    return fetch


def fetch_texts(
    df: DataFrame, url_col: str, timeout_s: float = 5.0, max_workers: int = 8
) -> DataFrame:
    """Dimension-scale raw-text GET: every input row keeps its columns and
    gains (status, message, body). The fetch stage for per-host control
    documents — robots.txt, sitemap XML — where the caller parses the body
    itself (sources/robots.py); cardinality = hosts, never the frontier.
    Same mapInPandas + bounded-thread-pool shape as :func:`http_fetcher`."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", status string, message string, body string"
    raw = lambda ctype, body: body.decode("utf-8", errors="replace")  # noqa: E731

    def run(batches):
        for pdf in batches:
            urls = pdf[url_col].tolist()
            if not urls:
                continue
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                results = list(
                    pool.map(lambda u: fetch_one(u, timeout_s, parser=raw), urls)
                )
            res = pdf.copy()
            res["status"] = [r[0] for r in results]
            res["message"] = [r[1] for r in results]
            res["body"] = [r[2] for r in results]
            yield res

    return df.mapInPandas(run, out_schema)


def http_prober(timeout_s: float = 5.0):
    """Real-socket Prober for sources/probe.py (DataCrawler.java:36-57 twin):
    GET each endpoint with a LIMIT-1-ish byte-range; classify with the same
    vocabulary as the fetch stage. Hosts without a scheme probe as http://."""

    def probe(urls: pd.Series) -> tuple[pd.Series, pd.Series]:
        statuses, messages = [], []
        for u in urls:
            target = u if "://" in u else f"http://{u}/"
            req = urllib.request.Request(
                target, headers={"User-Agent": USER_AGENT, "Range": "bytes=0-0"}
            )
            try:
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    resp.read(1)
                statuses.append(OP_SUCCESS)
                messages.append("probe ok")
            except Exception as exc:
                status, message = _classify(exc)
                statuses.append(status)
                messages.append(f"probe {message}")
        return (
            pd.Series(statuses, index=urls.index),
            pd.Series(messages, index=urls.index),
        )

    return probe
