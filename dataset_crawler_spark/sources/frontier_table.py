"""Bucketed frontier table — the write-side layout that deletes the schedule
round's biggest exchange.

The scheduler's one remaining full-frontier shuffle is the dedup aggregate
over ``url_c`` (measured ~1/3 of the round at sf0.1). The engine owns its
frontier drops, so it can pay that cost ONCE at write time instead of every
schedule: canonicalize at write (idempotent — canon(canon(u)) == canon(u)),
bucket by ``url_c`` with the same bucket count as the seen table / session
shuffle partitioning. A bucketed scan reports hash(url_c) partitioning, so
``schedule_round`` over it runs the dedup aggregate AND the exact-confirm
anti-join exchange-free — and the bloom pre-probe becomes optional, because
its only remaining job (cutting rows entering the confirm join) no longer
saves an exchange. Measured at sf0.1/local[32] (4M URLs, 1.33M seen):
9.4 s bloom+plain → 3.3 s bucketed-no-bloom, byte-identical schedule output
(tests/test_scheduler.py pins equality; the 2.8× is in BENCH_r*/queries as
``schedule_round_bucketed_sec``).

Where the bloom filter still earns its place: frontiers NOT owned by the
engine (arbitrary parquet input), cuckoo-deletion resurrect mode, and the
streaming path where drops arrive from a foreign writer — the default
``schedule_round`` path keeps probe-then-confirm for those. On a real
cluster this table is the Iceberg ``bucket(url_c)`` partition transform,
same as sources/seen_table.py.

Write amortization at 10^10: the per-round drop (new discoveries + retries)
is orders of magnitude smaller than the standing frontier, so the write-time
exchange moves ~|new| rows per round instead of re-shuffling ~|frontier|
rows per schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_crawler_spark.functions.urls import canonicalize_url

#: frontier-drop columns stored (url replaced by canonical url_c at write)
COLUMNS = "url_c STRING, seed_rank INT, priority DOUBLE, discovered_crawl_id INT, state STRING"


class BucketedFrontierTable:
    def __init__(self, spark: SparkSession, name: str, location: str, n_buckets: int = 64):
        self.spark = spark
        self.name = name
        self.location = location
        self.n_buckets = n_buckets

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def ensure_registered(self) -> None:
        """Re-attach an existing on-disk table to a fresh session's catalog
        (bucket metadata lives in the catalog; same mechanism as
        sources/seen_table.py)."""
        if not self.exists():
            self.spark.sql(
                f"CREATE TABLE {self.name} ({COLUMNS}) USING PARQUET "
                f"CLUSTERED BY (url_c) SORTED BY (url_c) INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{self.location}'"
            )

    def append(self, frontier: DataFrame) -> None:
        """Append FRONTIER-schema rows (url is canonicalized here — the
        write-time exchange that replaces the per-schedule one). Rows already
        carrying ``url_c`` are passed through untouched."""
        if "url_c" not in frontier.columns:
            frontier = frontier.withColumn("url_c", canonicalize_url(F.col("url")))
        (
            frontier.select(
                "url_c", "seed_rank", "priority", "discovered_crawl_id", "state"
            )
            .write.format("parquet")
            .bucketBy(self.n_buckets, "url_c")
            .sortBy("url_c")
            .option("path", self.location)
            .mode("append")
            .saveAsTable(self.name)
        )

    def read(self) -> DataFrame:
        """The frontier as a bucketed scan — feed straight to schedule_round
        (which trusts the pre-canonicalized url_c column)."""
        return self.spark.table(self.name)
