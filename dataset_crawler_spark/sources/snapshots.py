"""Snapshot table store — Iceberg-semantics adapter (SURVEY.md §7.0).

The engine targets Iceberg semantics: append-only snapshots, snapshot-id time
travel, atomic commit of a round. This sandbox has no Iceberg runtime jar, so
the adapter implements the same contract over partitioned Parquet + a JSON
manifest; flipping ``format="iceberg"`` on a real cluster swaps in
``spark.read.format("iceberg")`` + ``VERSION AS OF`` with no caller changes.

Layout (one store root per engine instance):

    <root>/manifest.json                  — committed rounds, table paths
    <root>/<table>/crawl_id=<r>/*.parquet — round-partitioned appends

Commit protocol: data is written to the partition directory first, the
manifest is rewritten last via atomic rename — a crashed round leaves data
files but no manifest entry, and a re-run overwrites the partition
(idempotent replay, north_rule "resumable from checkpoint"). This mirrors the
reference's property that every mutation is tagged with its crawl_id and the
crawl_log row is the round's commit record (CrawlDBOperations.java:258-285).

Partitioning by ``crawl_id`` gives partition pruning for the as-of read path
(CrawlLoadData.java's ``crawl_id BETWEEN ?`` range loads, :36-229).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # -- manifest -----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"rounds": [], "tables": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic commit

    def committed_rounds(self) -> list[int]:
        return sorted(r["crawl_id"] for r in self.manifest()["rounds"])

    def last_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    # -- writes -------------------------------------------------------------

    def append(self, table: str, df: DataFrame, crawl_id: int) -> None:
        """Append one round's rows to a table partition (idempotent: a replay
        of the same round overwrites its own partition only)."""
        path = os.path.join(self.root, table, f"crawl_id={crawl_id}")
        df.drop("crawl_id").write.mode("overwrite").parquet(path)

    def commit_round(self, crawl_id: int, description: str = "", stats: dict | None = None) -> None:
        m = self.manifest()
        m["rounds"] = [r for r in m["rounds"] if r["crawl_id"] != crawl_id]
        m["rounds"].append(
            {"crawl_id": crawl_id, "description": description, "stats": stats or {}}
        )
        m["rounds"].sort(key=lambda r: r["crawl_id"])
        self._write_manifest(m)

    # -- maintenance --------------------------------------------------------

    def tables(self) -> list[str]:
        """Table names present on disk (committed or not)."""
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def compacted_upto(self, table: str) -> int | None:
        return self.manifest().get("tables", {}).get(table, {}).get("compacted_upto")

    def compact(self, table: str, upto: int | None = None) -> dict:
        """Rewrite the committed partitions with ``crawl_id ≤ upto`` into one
        consolidated directory — the small-files maintenance op (Iceberg's
        ``rewrite_data_files`` analog). After R rounds an append-per-round
        table is R directories of small files; at 10^4 rounds the scan's file
        listing, not the bytes, dominates. Compaction keeps every row's
        ``crawl_id`` as a DATA column, so as-of reads are EXACTLY preserved
        (``as_of < upto`` becomes a row filter instead of partition pruning —
        the standard granularity trade; rounds after ``upto`` still prune).

        Commit protocol mirrors ``append``: the compacted directory is
        written first, the manifest switch is the atomic rename — a crash in
        between leaves an orphan dir that readers never consult. Superseded
        partition dirs stay on disk (byte-identical reads either way) until
        :meth:`vacuum` — the expire-snapshots step — removes them.
        """
        rounds = self.committed_rounds()
        if not rounds:
            raise ValueError("compact: nothing committed")
        upto = rounds[-1] if upto is None else upto
        base = os.path.join(self.root, table)
        has_rows = self.compacted_upto(table) is not None or any(
            r <= upto and os.path.exists(os.path.join(base, f"crawl_id={r}"))
            for r in rounds
        )
        if not has_rows:
            # an empty compacted dir would be schema-less parquet; nothing to do
            raise ValueError(f"compact: no committed rows ≤ {upto} in {table!r}")
        part = self.read(table).where(F.col("crawl_id") <= upto)
        out = os.path.join(self.root, table, f"_compacted_{upto}")
        part.write.mode("overwrite").parquet(out)
        m = self.manifest()
        m.setdefault("tables", {}).setdefault(table, {})["compacted_upto"] = upto
        self._write_manifest(m)
        return {"table": table, "compacted_upto": upto, "path": out}

    def vacuum(self, table: str) -> list[str]:
        """Delete partition dirs superseded by compaction and stale compacted
        dirs from earlier compactions. Safe at any time after the manifest
        switch: readers only consult the current manifest."""
        import shutil

        c = self.compacted_upto(table)
        if c is None:
            return []
        base = os.path.join(self.root, table)
        removed = []
        for r in self.committed_rounds():
            p = os.path.join(base, f"crawl_id={r}")
            if r <= c and os.path.exists(p):
                shutil.rmtree(p)
                removed.append(p)
        for d in os.listdir(base):
            if d.startswith("_compacted_") and int(d.rsplit("_", 1)[1]) != c:
                p = os.path.join(base, d)
                shutil.rmtree(p)
                removed.append(p)
        return removed

    # -- reads --------------------------------------------------------------

    def read(self, table: str, as_of: int | None = None) -> DataFrame:
        """Read all committed rows of a table (optionally ≤ as_of).

        Only committed rounds are visible — uncommitted partition dirs from a
        crashed run are ignored, which is what makes replay safe. If the
        table has a compaction point C, rows ≤ C come from the compacted
        file (crawl_id is a data column there) and rows > C from the
        per-round partitions; the two views are byte-identical.
        """
        rounds = self.committed_rounds()
        if as_of is not None:
            rounds = [r for r in rounds if r <= as_of]
        base = os.path.join(self.root, table)
        comp = self.compacted_upto(table)
        dfs = []
        if comp is not None:
            cdf = self.spark.read.parquet(os.path.join(base, f"_compacted_{comp}"))
            if as_of is not None:
                cdf = cdf.where(F.col("crawl_id") <= as_of)
            dfs.append(cdf)
            rounds = [r for r in rounds if r > comp]
        pairs = [
            (r, os.path.join(base, f"crawl_id={r}"))
            for r in rounds
            if os.path.exists(os.path.join(base, f"crawl_id={r}"))
        ]
        if pairs:
            # One partition-discovered scan over the committed partition dirs
            # (NOT a per-round union — after R rounds that is an R-way union
            # plan Catalyst re-optimizes on every action). ``basePath`` makes
            # Spark parse crawl_id back out of the directory names as a
            # partition column, so crawl_id range predicates prune at the
            # file level — the Iceberg-snapshot read path shape
            # (CrawlLoadData.java:36-229).
            dfs.append(
                self.spark.read.option("basePath", base)
                .parquet(*[p for _, p in pairs])
                .withColumn("crawl_id", F.col("crawl_id").cast("int"))
            )
        if not dfs:
            raise FileNotFoundError(f"no committed data for table {table!r} (as_of={as_of})")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
