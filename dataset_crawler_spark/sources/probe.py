"""Endpoint availability probe — S3 as an OPERATION, not a column.

The reference issues a real ``SELECT * ... LIMIT 1`` against every endpoint
and records the outcome before crawling it (data_crawler/DataCrawler.java:
36-57; the crawler_logs row is written either way). Round 1 consumed a
pre-populated ``is_available`` column; this stage performs the probe itself:
a ``mapInPandas`` pass over the hosts dimension (dimension-scale — thousands
of rows, one Arrow batch per partition) invoking an injectable prober, and
emits (a) the refreshed hosts dimension and (b) one per-operation status row
per endpoint for the ops log (streaming/rounds.py K4 vocabulary).

The default prober is a deterministic stub (hash-derived outcomes, clearly
labeled) so tests never need a network; the PRODUCTION prober exists too —
``sources/http_fetch.http_prober`` issues real GET probes with the same
(urls: pd.Series) -> (status, message) signature and CrawlerLogs status
vocabulary, and is exercised over an in-process loopback HTTP server in
tests/test_http_fetch.py::test_probe_hosts_over_http.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: prober(urls) -> (status, message); status ∈ success|error|exception|time_out
Prober = Callable[[pd.Series], tuple[pd.Series, pd.Series]]


def stub_prober(urls: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Deterministic sandbox stand-in for the LIMIT-1 HTTP probe (no network
    in this container): ~1-in-16 hosts by name-digest probe as time_out, the
    rest succeed. md5, not ``hash()`` — the builtin is seeded per process, so
    outcomes would differ between executors."""
    import hashlib

    h = urls.map(lambda u: int(hashlib.md5(u.encode()).hexdigest()[:8], 16))
    timeout = (h % 16) == 0
    status = pd.Series(["time_out" if t else "success" for t in timeout], index=urls.index)
    message = pd.Series(
        ["probe timed out after 5000 ms" if t else "LIMIT-1 probe ok" for t in timeout],
        index=urls.index,
    )
    return status, message


def probe_hosts(hosts: DataFrame, prober: Prober = stub_prober) -> DataFrame:
    """Probe every host once; returns the hosts dimension plus
    (probe_status, probe_message, is_available) — ``is_available`` is now the
    probe RESULT (success ⇒ available), replacing whatever the dimension
    carried. One Arrow batch per partition; the prober sees a url Series."""
    cols = hosts.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in hosts.schema.fields
        if f.name != "is_available"
    ) + ", is_available boolean, probe_status string, probe_message string"

    def run(it):
        for pdf in it:
            status, message = prober(pdf["host"])
            res = pdf.drop(columns=["is_available"], errors="ignore")
            res["is_available"] = (status == "success").to_numpy()
            res["probe_status"] = status.to_numpy()
            res["probe_message"] = message.to_numpy()
            yield res

    probed = hosts.mapInPandas(run, out_schema)
    # keep caller column order, probe columns appended
    keep = [c for c in cols if c != "is_available"] + [
        "is_available", "probe_status", "probe_message"
    ]
    return probed.select(*keep)


def probe_ops_rows(probed: DataFrame, crawl_id: int) -> DataFrame:
    """Ops-log rows for one probe pass (stage='probe', one row per host —
    the DataCrawler.java:36-57 crawler_logs twin)."""
    return probed.select(
        F.lit(crawl_id).cast("int").alias("crawl_id"),
        F.lit("probe").alias("stage"),
        F.col("host").alias("url_c"),
        F.col("host"),
        F.col("probe_status").alias("status"),
        F.col("probe_message").alias("message"),
        F.lit(None).cast("int").alias("seed_rank"),
        F.lit(None).cast("double").alias("priority"),
        F.lit(None).cast("int").alias("discovered_crawl_id"),
    )
