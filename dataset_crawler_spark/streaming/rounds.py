"""Checkpoint-resumable crawl rounds — the engine's driver loop.

Twin of the reference's ``multiple_run`` polling loop (App.java:31-58: claim a
crawl_setups row → run → mark complete → sleep) restated as round-based
micro-batches over the snapshot store: each round is one atomic commit of
(lineage, versions, metrics) partitions tagged with ``crawl_id``
(≈ the crawl_log row, CrawlDBOperations.java:258-285).

State is purely log-structured: the diff input for round r is reconstructed
from committed logs ≤ r-1 (operators/state.py) — exactly how the reference
rebuilds in-memory state from MySQL on every run (SURVEY.md §2.10 T6). Resume
therefore needs no extra machinery: a crashed round left no manifest entry,
so ``next_round()`` re-runs it and the partition overwrite makes the replay
idempotent.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataset_crawler_spark.operators import diff as D
from dataset_crawler_spark.operators import state as S
from dataset_crawler_spark.schemas import SPAN
from dataset_crawler_spark.sources.snapshots import SnapshotStore

STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("last_op", T.StringType()),
        T.StructField("last_crawl_id", T.IntegerType()),
    ]
)

#: fetch_fn(spark, scheduled_urls: DataFrame[url_c,...]) -> DataFrame[doc_id, spans]
FetchFn = Callable[[SparkSession, DataFrame], DataFrame]


class CrawlEngine:
    def __init__(self, spark: SparkSession, store_root: str, resurrect: bool = False):
        self.spark = spark
        self.store = SnapshotStore(store_root, spark)
        self.resurrect = resurrect

    # -- state --------------------------------------------------------------

    def _empty_state(self) -> DataFrame:
        return self.spark.createDataFrame([], STATE_SCHEMA)

    def state_as_of(self, as_of: int | None) -> DataFrame:
        if as_of is None or not self.store.committed_rounds():
            return self._empty_state()
        lineage = self.store.read("lineage", as_of=as_of)
        versions = self.store.read("versions", as_of=as_of)
        return S.state_table_as_of(lineage, versions, as_of)

    def visible_docs(self, as_of: int | None = None) -> DataFrame:
        as_of = self.store.last_round() if as_of is None else as_of
        lineage = self.store.read("lineage", as_of=as_of)
        versions = self.store.read("versions", as_of=as_of)
        return S.reconstruct_as_of(lineage, versions, as_of)

    def next_round(self) -> int:
        last = self.store.last_round()
        return 0 if last is None else last + 1

    # -- one round ----------------------------------------------------------

    def run_round(self, live: DataFrame, crawl_id: int, description: str = "") -> dict:
        """Ingest one fetched snapshot: diff vs state, write lineage +
        versions + metrics, commit. Returns the round stats dict."""
        t0 = time.time()
        prev_round = crawl_id - 1 if crawl_id > 0 else None
        state = self.state_as_of(prev_round)
        lineage = D.snapshot_diff(state, live, crawl_id, resurrect=self.resurrect).cache()
        versions = S.versions_from_round(live, lineage, crawl_id)

        op_counts = {
            r["op"]: r["n"]
            for r in lineage.groupBy("op").agg(F.count("*").alias("n")).collect()
        }
        self.store.append("lineage", lineage, crawl_id)
        self.store.append("versions", versions, crawl_id)
        stats = {
            "added": int(op_counts.get("added", 0)),
            "updated": int(op_counts.get("updated", 0)),
            "deleted": int(op_counts.get("deleted", 0)),
            "wall_s": round(time.time() - t0, 3),
        }
        metrics = self.spark.createDataFrame(
            [(crawl_id, "diff", k, float(v)) for k, v in stats.items()],
            "crawl_id int, stage string, metric string, value double",
        )
        self.store.append("metrics", metrics, crawl_id)
        self.store.commit_round(crawl_id, description, stats)
        lineage.unpersist()
        return stats


def simulated_fetcher(corpus: DataFrame) -> FetchFn:
    """A deterministic stand-in for the HTTP fetch stage: scheduled URLs are
    joined against a given corpus (doc_id == canonical url). The production
    fetcher has the same signature with a ``mapInPandas`` HTTP stage."""

    def fetch(spark: SparkSession, scheduled: DataFrame) -> DataFrame:
        return corpus.join(
            scheduled.select(F.col("url_c").alias("doc_id")), "doc_id", "left_semi"
        )

    return fetch
