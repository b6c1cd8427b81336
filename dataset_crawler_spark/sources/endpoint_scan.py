"""Paged live-endpoint scan — the production S5 over real sockets.

The reference crawls a remote SPARQL endpoint with a single-threaded
LIMIT/OFFSET loop (data_crawler/DataCrawler.java:235-258, the ``while``
at 242-249, capped by ``max_res_instances``; same shape again at 307-336
for the bulk DESCRIBE scan). For a FILE source the survey correctly calls
pagination obsolete — a partitioned scan replaces it — but a live remote
endpoint cannot be partition-scanned: the distributed analog is the OFFSET
windows themselves becoming the partitions. This module does exactly that:

- ``paged_endpoint_scan``: one Spark job fetches ``n_pages`` offset windows
  in parallel — ``spark.range(n_pages)`` → per-row page URL →
  ``http_fetch.fetch_one`` inside ``mapInPandas`` (Arrow batches, bounded
  thread pool, same status vocabulary) → JSON page payload → interleaved
  documents. The reference's serial ``offset += limit`` loop becomes an
  embarrassingly parallel fetch of the same URL set.
- ``scan_until_exhausted``: the reference's open-ended "loop until an empty
  page" semantics, distributed: fetch page windows in geometrically growing
  CHUNKS (each chunk one parallel job), stop after the first chunk that
  yields fewer docs than its capacity — per-chunk driver control flow, never
  per-page. Worst case fetches < 2× the pages of the serial loop while
  running each chunk at full parallelism.

Page payloads are the engine's JSON interchange: a list (or ``{"docs":
[...]}``) of ``{"doc_id": ..., "spans": [{kind,text,media_ref,offset}, ...]}``
— the CKAN/metadata JSON path (metadata_crawler/Metadata.java:41-106) with
the interleaved-document schema. Non-success pages yield zero docs and one
status row; callers needing the ops-log rows use ``return_status=True``.

Tested against an in-process loopback HTTP server (tests/test_endpoint_scan.py).
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_crawler_spark.sources.http_fetch import OP_SUCCESS, fetch_one, span_dict

#: documents + per-page fetch status (page_url keys the ops row); ``pos`` is
#: the document's global position in endpoint order (page offset + in-page
#: index) — the deterministic cap key for max_res_instances semantics
PAGE_SCHEMA = (
    "page_url string, page_offset long, status string, message string, "
    "doc_id string, "
    "spans array<struct<kind string, text string, media_ref string, offset int>>, "
    "pos long"
)


def page_url(endpoint: str, limit: int, offset: int) -> str:
    """OFFSET-window URL, reference query-string convention
    (DataCrawler.java builds ``... LIMIT n OFFSET k`` — over HTTP that is
    the standard ``limit``/``offset`` query pair)."""
    sep = "&" if "?" in endpoint else "?"
    return f"{endpoint}{sep}limit={limit}&offset={offset}"


def paged_endpoint_scan(
    spark: SparkSession,
    endpoint: str,
    page_size: int,
    n_pages: int,
    first_offset: int = 0,
    timeout_s: float = 5.0,
    max_workers: int = 8,
    return_status: bool = False,
) -> DataFrame:
    """Fetch ``n_pages`` OFFSET windows of ``endpoint`` in parallel and return
    the interleaved documents (``pos, doc_id, spans`` — ``pos`` = global
    endpoint position); with ``return_status=True`` returns the full page-row
    frame (one row per doc plus one ``doc_id IS NULL`` row per empty/failed
    page, carrying the fetch status)."""
    offsets = spark.range(n_pages).select(
        (first_offset + F.col("id") * page_size).alias("page_offset")
    )

    def run(batches):
        # pages carry a DOCUMENT LIST, not a span list, so bypass
        # parse_spans: fetch the raw body and json-decode it here
        raw = lambda ctype, body: body.decode("utf-8")  # noqa: E731
        for pdf in batches:
            offs = pdf["page_offset"].tolist()
            if not offs:
                continue
            urls = [page_url(endpoint, page_size, o) for o in offs]
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                results = list(
                    pool.map(lambda u: fetch_one(u, timeout_s, parser=raw), urls)
                )
            rows = []
            for off, url, (status, message, body) in zip(offs, urls, results):
                docs = []
                if status == OP_SUCCESS and body:
                    docs = _page_docs(body)
                if docs:
                    for j, d in enumerate(docs):
                        rows.append(
                            {
                                "page_url": url,
                                "page_offset": off,
                                "status": status,
                                "message": message,
                                "doc_id": d["doc_id"],
                                "spans": d["spans"],
                                "pos": off + j,
                            }
                        )
                else:
                    rows.append(
                        {
                            "page_url": url,
                            "page_offset": off,
                            "status": status,
                            "message": message,
                            "doc_id": None,
                            "spans": None,
                            "pos": None,
                        }
                    )
            yield pd.DataFrame(rows)

    pages = offsets.mapInPandas(run, PAGE_SCHEMA)
    if return_status:
        return pages
    return pages.where(F.col("doc_id").isNotNull()).select("pos", "doc_id", "spans")


def _page_docs(body: str) -> list[dict]:
    """JSON page body → list of {doc_id, spans} dicts. Accepts a bare list
    of documents or ``{"docs": [...]}``; rows without a doc_id and docs with
    malformed span objects are skipped (the reference tolerates malformed
    endpoint rows the same way — DataCrawler.java result-set null guards).
    Span normalization is http_fetch.span_dict — one shared rule set."""
    try:
        payload = json.loads(body)
    except ValueError:
        return []
    if isinstance(payload, dict):
        payload = payload.get("docs", [])
    if not isinstance(payload, list):
        return []
    docs = []
    for d in payload:
        if not isinstance(d, dict) or "doc_id" not in d:
            continue
        try:
            spans = [span_dict(s, i) for i, s in enumerate(d.get("spans", []))]
        except Exception:  # malformed span object ⇒ skip the doc, not the job
            continue
        docs.append({"doc_id": d["doc_id"], "spans": spans})
    return docs


def scan_until_exhausted(
    spark: SparkSession,
    endpoint: str,
    page_size: int,
    max_docs: int | None = None,
    first_chunk_pages: int = 4,
    timeout_s: float = 5.0,
    on_error: str = "raise",
) -> DataFrame:
    """The reference's "loop until the page comes back empty" semantics
    (DataCrawler.java:242-249), distributed: fetch OFFSET windows in
    geometrically growing chunks (4, 8, 16, … pages — each chunk ONE
    parallel Spark job), stop when a chunk returns fewer documents than its
    capacity (some page was short ⇒ the endpoint is exhausted) or when
    ``max_docs`` (the reference's ``max_res_instances`` cap,
    DataCrawler.java:75) is reached. Driver control flow is per-CHUNK
    (O(log pages) rounds), never per-page.

    A short chunk caused by a FAILED window (non-success fetch status) is
    not exhaustion — with ``on_error="raise"`` (default) it raises listing
    the failed page offsets so the caller can retry; ``on_error="skip"``
    keeps scanning past failed windows and stops only on a genuinely short
    successful chunk (failed windows' docs are simply missing — the caller
    opted into partial results)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"unknown on_error {on_error!r}")
    chunks: list[DataFrame] = []
    try:
        out: DataFrame | None = None
        fetched = 0
        offset = 0
        pages = first_chunk_pages
        while True:
            page_rows = paged_endpoint_scan(
                spark, endpoint, page_size, pages, first_offset=offset,
                timeout_s=timeout_s, return_status=True,
            ).cache()
            chunks.append(page_rows)
            failed = (
                page_rows.where(F.col("status") != OP_SUCCESS)
                .select("page_offset", "status", "message")
                .collect()
            )
            if failed and on_error == "raise":
                offs = sorted(r.page_offset for r in failed)
                raise RuntimeError(
                    f"{len(failed)} page window(s) failed at offsets {offs[:10]}"
                    f"{'…' if len(offs) > 10 else ''}: "
                    f"{failed[0].status}: {failed[0].message}"
                )
            chunk = page_rows.where(F.col("doc_id").isNotNull()).select(
                "pos", "doc_id", "spans"
            )
            n = chunk.count()
            out = chunk if out is None else out.unionByName(chunk)
            fetched += n
            offset += pages * page_size
            # a short chunk ⇒ exhausted, unless the shortfall came from
            # failed windows we were told to skip. An ALL-failed chunk is
            # also terminal: under "skip" it is indistinguishable from
            # scanning past the end of an endpoint that errors beyond its
            # last page, and doubling into it would otherwise request an
            # exponentially growing window against a dead endpoint forever.
            if len(failed) >= pages:
                break
            if n + len(failed) * page_size < pages * page_size:
                break
            if max_docs is not None and fetched >= max_docs:
                break
            pages *= 2
        if max_docs is not None:
            # deterministic cap: the FIRST max_docs in endpoint order —
            # exactly the reference's max_res_instances cut, not an
            # arbitrary LIMIT
            out = out.orderBy("pos").limit(max_docs)
        # pin the result to local blocks so the caches can be released (the
        # chunks are already materialized — this re-fetches nothing)
        return out.localCheckpoint()
    finally:
        # without this, every fetched page body stays in executor storage
        # for the application lifetime
        for c in chunks:
            c.unpersist()
