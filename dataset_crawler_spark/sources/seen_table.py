"""Bucketed exact seen-URL table — the confirm-join storage-layout contract.

The scheduler's one unavoidable big shuffle is the dedup aggregate over the
candidate frontier; the exact-confirm anti-join reuses that partitioning on
the candidate side (operators/scheduler.py schedule_round). What remains is
the SEEN side: re-read and re-shuffled every round from plain parquet. This
module stores it as a Spark datasource table bucketed by ``url_c`` — the
bucketed scan reports hash(url_c) partitioning, so the shuffled-hash
anti-join needs NO exchange and NO sort on either side when
``n_buckets == spark.sql.shuffle.partitions`` (both sides use Murmur3 over
the same key). On a real cluster this is the Iceberg
``write.distribution-mode + bucket(url_c)`` partition transform; the
datasource bucketed table is the sandbox-runnable equivalent with identical
plan shape.

Contract and caveats:

- ``n_buckets`` must equal the scheduler session's shuffle partitioning for
  the exchange-free plan; any mismatch degrades gracefully to one seen-side
  exchange (never wrong results).
- Rows carry ``crawl_id`` so as-of reads filter ``crawl_id <= r`` (row-group
  pruned; filters do not disturb bucketing).
- Appends are NOT deduplicated across rounds and a replayed crash round may
  re-append its URLs: duplicates are harmless for anti-join semantics (the
  engine's committed ``fetched`` store partitions stay the byte-equal source
  of truth for resume; this table is a performance index over them —
  reference twin: the ``analysed_resources`` HashSet the reference rebuilds
  from MySQL each run, DataCrawler.java:359-361).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BucketedSeenTable:
    def __init__(self, spark: SparkSession, name: str, location: str, n_buckets: int = 64):
        self.spark = spark
        self.name = name
        self.location = location
        self.n_buckets = n_buckets

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def ensure_registered(self) -> None:
        """Re-attach an existing on-disk table to a fresh session's catalog
        (bucketing metadata lives in the catalog; bucket ids are recovered
        from the datasource file names, so a matching CREATE over the same
        location restores the exchange-free scan without rewriting data)."""
        if not self.exists():
            self.spark.sql(
                f"CREATE TABLE {self.name} (url_c STRING, crawl_id INT) USING PARQUET "
                f"CLUSTERED BY (url_c) INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{self.location}'"
            )

    def append(self, urls: DataFrame, crawl_id: int) -> None:
        """Append one round's canonical URLs (creates the table on first use —
        external at ``location``, so a fresh session re-attaches to the same
        files by re-appending nothing and re-creating metadata)."""
        (
            urls.select(
                F.col("url_c"), F.lit(crawl_id).cast("int").alias("crawl_id")
            )
            .write.format("parquet")
            .bucketBy(self.n_buckets, "url_c")
            .option("path", self.location)
            .mode("append")
            .saveAsTable(self.name)
        )

    def read(self, as_of: int | None = None) -> DataFrame:
        """Seen URLs as a bucketed scan: (url_c). No distinct — duplicates are
        benign for the anti-join and a distinct would re-shuffle, defeating
        the layout."""
        t = self.spark.table(self.name)
        if as_of is not None:
            t = t.where(F.col("crawl_id") <= as_of)
        return t.select("url_c")
