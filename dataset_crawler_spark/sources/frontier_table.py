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

import os
import shutil

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

    def _recover(self) -> None:
        """Heal a compact() interrupted mid-swap. The swap renames the live
        directory ASIDE (``__old``) before renaming the rewrite IN, so at
        every instant one complete copy exists under a deterministic name:
        ``__old`` present + live dir missing → crashed between the renames,
        restore the original; both present → crashed after the swap, the
        rewrite is live and ``__old`` is the superseded copy to drop."""
        old_loc = self.location.rstrip("/") + "__old"
        if os.path.exists(old_loc):
            if os.path.exists(self.location):
                shutil.rmtree(old_loc)
            else:
                os.rename(old_loc, self.location)

    def ensure_registered(self) -> None:
        """Re-attach an existing on-disk table to a fresh session's catalog
        (bucket metadata lives in the catalog; same mechanism as
        sources/seen_table.py). Runs crash recovery first so a swap
        interrupted in a previous process can never surface as an empty
        table."""
        self._recover()
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

    def data_files(self) -> list[str]:
        """Parquet data files currently backing the table (small-files
        observability for the maintenance cadence)."""
        import os

        return sorted(
            os.path.join(r, f)
            for r, _dirs, files in os.walk(self.location)
            for f in files
            if f.endswith(".parquet")
        )

    def compact(self) -> dict:
        """Rewrite the table into ONE file set (≤1 file per bucket) — the
        small-files maintenance op for per-round appends (Iceberg's
        ``rewrite_data_files`` analog; SnapshotStore.compact is the
        partition-table sibling). A bucketed append writes up to
        ``n_buckets`` files per writer task, so after R rounds the scan
        lists O(R·n_buckets) files and file listing, not bytes, starts to
        dominate. Rows are repartitioned by ``url_c`` into exactly
        ``n_buckets`` tasks (same Murmur3 hash as the bucketing, so each
        task holds exactly one bucket) and rewritten; the catalog entry is
        swapped to the rewritten directory. Reads are byte-identical before
        and after (test-pinned, including the exchange-free schedule plan).

        Crash behavior: the rewrite lands in a side directory first (a crash
        before the swap leaves the original untouched, plus an orphan side
        dir the next compact overwrites); the swap itself renames the live
        directory aside before renaming the rewrite in, so a crash at ANY
        point leaves one complete copy under a deterministic name and
        ``_recover()`` (run by every ``ensure_registered``) heals it."""
        self.ensure_registered()
        files_before = len(self.data_files())
        tmp_name = f"{self.name}__compacting"
        tmp_loc = self.location.rstrip("/") + "__compacting"
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        if os.path.exists(tmp_loc):
            shutil.rmtree(tmp_loc)
        # read PLAIN for the rewrite: over a bucketed scan the explicit
        # repartition is elided (the scan already reports hash(url_c)
        # partitioning) but its tasks are not one-bucket-each, so each task
        # writes a file per bucket it sees — exactly the fan-out compaction
        # exists to undo. With bucketed reading off the repartition stands
        # and each task holds exactly one bucket (same Murmur3 hash).
        key = "spark.sql.sources.bucketing.enabled"
        prev = self.spark.conf.get(key)
        self.spark.conf.set(key, "false")
        try:
            (
                self.read()
                .repartition(self.n_buckets, "url_c")
                .write.format("parquet")
                .bucketBy(self.n_buckets, "url_c")
                .sortBy("url_c")
                .option("path", tmp_loc)
                .saveAsTable(tmp_name)
            )
        finally:
            self.spark.conf.set(key, prev)
        # swap: both tables are EXTERNAL (dropping touches metadata only).
        # rename-aside → rename-in → delete: never rmtree the only copy.
        old_loc = self.location.rstrip("/") + "__old"
        self.spark.sql(f"DROP TABLE {self.name}")
        self.spark.sql(f"DROP TABLE {tmp_name}")
        if os.path.exists(old_loc):
            shutil.rmtree(old_loc)
        os.rename(self.location, old_loc)
        os.rename(tmp_loc, self.location)
        shutil.rmtree(old_loc)
        self.ensure_registered()
        return {
            "table": self.name,
            "files_before": files_before,
            "files_after": len(self.data_files()),
        }
