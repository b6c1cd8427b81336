"""Paged live-endpoint scan (production S5): parallel OFFSET windows over a
loopback HTTP server — the reference's serial LIMIT/OFFSET crawl loop
(DataCrawler.java:242-249) re-expressed as a partitioned fetch."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F

from dataset_crawler_spark.sources.endpoint_scan import (
    paged_endpoint_scan,
    scan_until_exhausted,
)

N_DOCS = 95


def _doc(i: int) -> dict:
    return {
        "doc_id": f"http://ex.org/r/{i}",
        "spans": [
            {"kind": "title", "text": f"doc {i}", "media_ref": None, "offset": 0},
            {"kind": "link", "text": None, "media_ref": f"http://ex.org/r/{(i + 1) % N_DOCS}",
             "offset": 1},
        ],
    }


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        u = urlparse(self.path)
        q = parse_qs(u.query)
        limit = int(q.get("limit", ["10"])[0])
        offset = int(q.get("offset", ["0"])[0])
        if u.path == "/docs":
            docs = [_doc(i) for i in range(offset, min(offset + limit, N_DOCS))]
            body = json.dumps(docs).encode()
            self.send_response(200)
        elif u.path == "/dead":
            self.send_error(503, "endpoint down")
            return
        elif u.path == "/flaky":
            # offset 20 permanently 503s; other windows serve normally
            if offset == 20:
                self.send_error(503, "window down")
                return
            docs = [_doc(i) for i in range(offset, min(offset + limit, N_DOCS))]
            body = json.dumps(docs).encode()
            self.send_response(200)
        else:
            body = json.dumps([]).encode()
            self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_parallel_pages_equal_full_corpus(spark, server):
    got = paged_endpoint_scan(spark, f"{server}/docs", page_size=10, n_pages=10)
    rows = got.collect()
    assert len(rows) == N_DOCS
    by_id = {r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
             for r in rows}
    for i in (0, 37, 94):
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in _doc(i)["spans"]]
        assert by_id[f"http://ex.org/r/{i}"] == want


def test_status_rows_for_empty_and_failed_pages(spark, server):
    # 11 pages of 10 over 95 docs: page 10 (offset 100) is empty but still
    # reports a success status row with no doc
    pages = paged_endpoint_scan(
        spark, f"{server}/docs", page_size=10, n_pages=11, return_status=True
    )
    empty = pages.where(F.col("page_offset") == 100).collect()
    assert len(empty) == 1
    assert empty[0].status == "success" and empty[0].doc_id is None

    # a 503 window yields an error status row; other windows are unaffected
    flaky = paged_endpoint_scan(
        spark, f"{server}/flaky", page_size=10, n_pages=10, return_status=True
    )
    bad = flaky.where(F.col("page_offset") == 20).collect()
    assert len(bad) == 1 and bad[0].status == "error" and "503" in bad[0].message
    ok_docs = flaky.where(F.col("doc_id").isNotNull()).count()
    assert ok_docs == N_DOCS - 10  # the failed window's 10 docs are missing


def test_scan_until_exhausted_finds_everything(spark, server):
    got = scan_until_exhausted(spark, f"{server}/docs", page_size=10,
                               first_chunk_pages=4)
    ids = {r.doc_id for r in got.collect()}
    assert ids == {f"http://ex.org/r/{i}" for i in range(N_DOCS)}

    # max_res_instances semantics: the FIRST max_docs in endpoint order
    capped = scan_until_exhausted(spark, f"{server}/docs", page_size=10,
                                  max_docs=30)
    assert {r.doc_id for r in capped.collect()} == {
        f"http://ex.org/r/{i}" for i in range(30)
    }

    nothing = scan_until_exhausted(spark, f"{server}/nothing", page_size=10)
    assert nothing.count() == 0


def test_scan_until_exhausted_failed_window_is_not_exhaustion(spark, server):
    """A failed (503) window must not masquerade as end-of-endpoint: the
    default raises naming the offset; on_error='skip' scans PAST the failed
    window to the true end instead of truncating at the first short chunk."""
    with pytest.raises(RuntimeError, match="offsets \\[20\\]"):
        scan_until_exhausted(spark, f"{server}/flaky", page_size=10,
                             first_chunk_pages=4)

    skipped = scan_until_exhausted(spark, f"{server}/flaky", page_size=10,
                                   first_chunk_pages=4, on_error="skip")
    ids = {r.doc_id for r in skipped.collect()}
    want = {f"http://ex.org/r/{i}" for i in range(N_DOCS) if not 20 <= i < 30}
    assert ids == want  # everything except the dead window — no truncation


def test_scan_until_exhausted_dead_endpoint_terminates(spark, server):
    """An endpoint whose every window fails must TERMINATE under
    on_error='skip' (an all-failed chunk is treated as exhaustion) instead
    of doubling the request window forever; the default still raises."""
    with pytest.raises(RuntimeError, match="failed at offsets"):
        scan_until_exhausted(spark, f"{server}/dead", page_size=10,
                             first_chunk_pages=2)

    dead = scan_until_exhausted(spark, f"{server}/dead", page_size=10,
                                first_chunk_pages=2, on_error="skip")
    assert dead.count() == 0
