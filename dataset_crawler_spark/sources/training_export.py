"""Training-shard export sink — the artifact end of the corpus pipeline.

`pack_token_bins` (plans/queries.py) decides WHERE every document goes
(shard, bin); this sink materializes that layout as the on-disk artifact a
trainer's data loader consumes: one directory per shard, rows sorted by
(bin_id, doc_id) so each token-budget bin is contiguous in file order, plus
a tiny manifest recording per-shard doc/token totals for loader-side
integrity checks.

Scale shape (100 TB): document text moves exactly twice and only ever by
hash — the doc_id equi-join that attaches text to its assignment, and the
shard exchange that lands it in its output task. One task per shard writes
one sorted file (shard count is the packing fan-out, thousands at corpus
scale — each a bounded token budget sum, so no task is hot). The manifest
is a per-shard aggregate of longs. Everything is deterministic: same corpus
+ same assignments → byte-identical shard contents (no RNG, no wall-clock),
so re-exports are cache-stable for the trainer.

Reference: this generalizes the reference's CSV dump sink
(CrawlLoadData.java writes flat per-table dumps) to the partitioned,
budget-packed layout an LLM trainer actually reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    docs: DataFrame, assignments: DataFrame, path: str
) -> dict:
    """Export packed training shards.

    ``docs``: (doc_id, text, …) corpus; ``assignments``: (shard, doc_id,
    n_tokens, bin_id) from `pack_token_bins`. Writes
    ``<path>/shards/shard=<s>/`` parquet (rows sorted by bin_id, doc_id)
    and ``<path>/manifest/`` with per-shard totals. Returns the corpus-level
    summary the caller logs."""
    joined = (
        assignments.join(docs.select("doc_id", "text"), "doc_id")
        .repartition("shard")
        .sortWithinPartitions("shard", "bin_id", "doc_id")
    )
    (
        joined.write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, "shards"))
    )
    manifest = assignments.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("bin_id") + 1).alias("n_bins"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "manifest")
    )
    row = assignments.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count_distinct("shard").alias("n_shards"),
    ).collect()[0]
    return {
        "n_docs": row.n_docs,
        "n_tokens": row.n_tokens,
        "n_shards": row.n_shards,
    }


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """The exported corpus as (shard, bin_id, doc_id, n_tokens, text)."""
    return spark.read.parquet(os.path.join(path, "shards"))


def verify_manifest(spark: SparkSession, path: str) -> None:
    """Loader-side integrity check: per-shard doc/token totals of the data
    files must equal the manifest exactly. Raises ValueError on mismatch
    (a partial/corrupted copy of the artifact)."""
    got = (
        read_training_shards(spark, path)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )
    man = spark.read.parquet(os.path.join(path, "manifest")).select(
        "shard", "n_docs", "n_tokens"
    )
    diff = got.exceptAll(man).unionByName(man.exceptAll(got))
    bad = diff.limit(1).collect()
    if bad:
        raise ValueError(f"manifest mismatch, e.g. shard row {bad[0]}")
