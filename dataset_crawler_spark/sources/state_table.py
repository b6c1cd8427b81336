"""Bucketed-by-doc_id materialized state index — O(delta) state reads.

``CrawlEngine.state_as_of`` reconstructs "the state table as of round r" by
folding the FULL lineage + version logs (operators/state.py) — the same
rebuild-from-MySQL the reference does every run
(database_operations/CrawlLoadData.java:16-229). That is O(history) per
round: at a 10^10-doc frontier every round re-shuffles every log row ever
written, which is the scale bottleneck of the whole incremental path.

This module is the storage-layout fix, the doc_id twin of
``sources/seen_table.py``: periodically materialize the folded state as a
Spark datasource table bucketed by ``doc_id`` (on a real cluster: the
Iceberg ``bucket(doc_id)`` partition transform — north_rule
"hash-partition by doc_id"). A state read then becomes

    bucketed snapshot scan (as_of = c, NO exchange — the scan itself
    reports hash(doc_id) partitioning)
      full-outer-merge
    delta fold over rounds (c, r] only (two O(delta) exchanges)

so per-round cost is O(new rows this round), not O(all rows ever).

Contract and caveats:

- ``n_buckets`` must equal the engine session's shuffle partitions for the
  exchange-free merge; a mismatch degrades to one extra exchange on the
  snapshot side (never wrong results).
- Snapshots are identified by ``as_of`` (a committed round id) and listed in
  a manifest written strictly AFTER the table append. A crash between the
  two leaves a stale-but-valid manifest: the next read just folds a larger
  delta. The SnapshotStore logs remain the only source of truth — this
  table is a performance index and can be dropped/rebuilt at any time.
- Old snapshots are retained (they make the index itself as-of-queryable);
  ``prune`` drops manifest entries so reads stop considering them — the
  files-behind cleanup belongs to the same rewrite cadence as
  ``SnapshotStore.compact``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DDL_COLS = (
    "doc_id STRING, "
    "spans ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, offset: INT>>, "
    "last_op STRING, last_crawl_id INT, as_of INT"
)


class BucketedStateTable:
    def __init__(self, spark: SparkSession, name: str, location: str, n_buckets: int = 64):
        self.spark = spark
        self.name = name
        self.location = location
        self.n_buckets = n_buckets

    # -- manifest (same write-after-data discipline as SnapshotStore) -------

    def _manifest_path(self) -> str:
        return os.path.join(self.location, "_index_manifest.json")

    def snapshots(self) -> list[int]:
        try:
            with open(self._manifest_path()) as f:
                return sorted(json.load(f)["snapshots"])
        except FileNotFoundError:
            return []

    def _write_manifest(self, snapshots: list[int]) -> None:
        os.makedirs(self.location, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshots": sorted(set(snapshots))}, f)
        os.replace(tmp, self._manifest_path())

    def latest_snapshot(self, le: int | None = None) -> int | None:
        """Largest materialized ``as_of`` ≤ ``le`` (or overall)."""
        snaps = [s for s in self.snapshots() if le is None or s <= le]
        return max(snaps) if snaps else None

    def prune(self, keep_latest: int = 1) -> list[int]:
        """Drop all but the newest ``keep_latest`` snapshots from the
        manifest (reads stop considering them immediately)."""
        snaps = self.snapshots()
        dropped = snaps[:-keep_latest] if keep_latest > 0 else snaps
        self._write_manifest(snaps[len(dropped):])
        return dropped

    # -- table --------------------------------------------------------------

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def ensure_registered(self) -> None:
        """Re-attach the on-disk table to a fresh session's catalog (bucket
        metadata lives in the catalog, bucket ids in the file names — a
        matching CREATE over the same location restores the exchange-free
        scan without rewriting data)."""
        if not self.exists():
            self.spark.sql(
                f"CREATE TABLE {self.name} ({_DDL_COLS}) USING PARQUET "
                f"CLUSTERED BY (doc_id) INTO {self.n_buckets} BUCKETS "
                f"LOCATION '{self.location}'"
            )

    def write_snapshot(self, state: DataFrame, as_of: int) -> None:
        """Materialize one folded state table (STATE_SCHEMA) at ``as_of``.

        Data lands first, the manifest second — the crash window in between
        is invisible to readers (manifest still lists the previous snapshot).
        """
        (
            state.select("doc_id", "spans", "last_op", "last_crawl_id")
            .withColumn("as_of", F.lit(as_of).cast("int"))
            .write.format("parquet")
            .bucketBy(self.n_buckets, "doc_id")
            .option("path", self.location)
            .mode("append")
            .saveAsTable(self.name)
        )
        self._write_manifest(self.snapshots() + [as_of])

    def read_snapshot(self, as_of: int) -> DataFrame:
        """One materialized state as a bucketed scan (filter on the
        per-file-constant ``as_of`` prunes row groups without disturbing
        bucketing)."""
        return (
            self.spark.table(self.name)
            .where(F.col("as_of") == as_of)
            .select("doc_id", "spans", "last_op", "last_crawl_id")
        )
