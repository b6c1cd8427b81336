"""Incremental-CC volume probe: batch recluster vs per-round quotient fold.

The claim incremental_components makes (operators/clustering.py) is a COST
claim: folding one round's new edges into standing labels must cost
per-round work, not a recluster of the accumulated edge set. This probe
measures both sides at volume — a 1M-node/3M-edge standing dup graph, then
one round of 30k new edges (1% — touching new nodes, old nodes, and
old-old bridges) — and checks output equality against the batch answer.

Usage: python tools/cc_scale_probe.py [cores]   (default 32)
Results are recorded in BENCH/GRAPH_SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.operators.clustering import (  # noqa: E402
    connected_components,
    incremental_components,
)
from dataset_crawler_spark.session import get_spark  # noqa: E402

ROOT = "/tmp/spark_graft_bench"
N_NODES = 1_000_000
N_OLD_EDGES = 3_000_000
N_NEW_EDGES = 30_000
NEW_NODE_START = 1_000_000  # new round mints ids above the old universe


def ensure_inputs(spark):
    old_e = os.path.join(ROOT, "cc1m_old_edges")
    new_e = os.path.join(ROOT, "cc1m_new_edges")
    if not os.path.exists(os.path.join(old_e, "_SUCCESS")):
        e = spark.range(N_OLD_EDGES, numPartitions=64)
        # near-clique dup clusters: endpoints drawn from the same ~5-node
        # neighborhood most of the time, long bridges occasionally
        a = F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
        b = F.when(
            F.col("id") % 20 == 0,
            F.pmod(F.xxhash64(F.col("id") * 31 + 7), F.lit(N_NODES)),
        ).otherwise(F.pmod(a + F.pmod(F.xxhash64(F.col("id") * 13 + 3), F.lit(5)) + 1, F.lit(N_NODES)))
        e.select(a.alias("doc_a"), b.alias("doc_b")).where(
            F.col("doc_a") != F.col("doc_b")
        ).write.mode("overwrite").parquet(old_e)
    if not os.path.exists(os.path.join(new_e, "_SUCCESS")):
        e = spark.range(N_NEW_EDGES, numPartitions=8)
        # thirds: new-new, new-old, old-old late bridges
        kind = F.pmod(F.col("id"), F.lit(3))
        new_a = F.lit(NEW_NODE_START) + F.pmod(F.xxhash64(F.col("id")), F.lit(N_NEW_EDGES))
        new_b = F.lit(NEW_NODE_START) + F.pmod(F.xxhash64(F.col("id") * 7 + 1), F.lit(N_NEW_EDGES))
        old_a = F.pmod(F.xxhash64(F.col("id") * 11 + 5), F.lit(N_NODES))
        old_b = F.pmod(F.xxhash64(F.col("id") * 17 + 9), F.lit(N_NODES))
        e.select(
            F.when(kind == 0, new_a).otherwise(F.when(kind == 1, new_a).otherwise(old_a)).alias("doc_a"),
            F.when(kind == 0, new_b).otherwise(F.when(kind == 1, old_b).otherwise(old_b)).alias("doc_b"),
        ).where(F.col("doc_a") != F.col("doc_b")).write.mode("overwrite").parquet(new_e)
    return spark.read.parquet(old_e), spark.read.parquet(new_e)


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark("cc_probe", cores=cores, shuffle_partitions=2 * int(cores))
    old_edges, new_edges = ensure_inputs(spark)
    new_nodes = (
        new_edges.select(F.col("doc_a").alias("node"))
        .unionByName(new_edges.select(F.col("doc_b").alias("node")))
        .where(F.col("node") >= NEW_NODE_START)
        .distinct()
    )

    # warm
    connected_components(old_edges.limit(10_000)).count()

    t0 = time.time()
    labels0 = connected_components(old_edges).localCheckpoint()
    n0 = labels0.count()
    t_batch0 = round(time.time() - t0, 1)
    print(f"local[{cores}] batch CC {N_OLD_EDGES} edges: {t_batch0} s ({n0:,} labels)", flush=True)

    t0 = time.time()
    inc = incremental_components(labels0, new_edges, new_nodes=new_nodes)
    z_inc = inc.select(F.count_distinct("node", "comp").alias("z")).collect()[0][0]
    t_inc = round(time.time() - t0, 1)
    print(f"local[{cores}] incremental fold {N_NEW_EDGES} new edges: {t_inc} s ({z_inc:,} labels)", flush=True)

    t0 = time.time()
    all_nodes = labels0.select("node").unionByName(new_nodes)
    batch = connected_components(
        old_edges.unionByName(new_edges), nodes=all_nodes
    )
    z_b = batch.select(F.count_distinct("node", "comp").alias("z")).collect()[0][0]
    t_batch1 = round(time.time() - t0, 1)
    print(f"local[{cores}] batch recluster {N_OLD_EDGES + N_NEW_EDGES} edges: {t_batch1} s ({z_b:,} labels)", flush=True)

    # FULL OUTER: a dropped or extra label row must count as a mismatch —
    # an inner join would silently ignore node-set differences
    mismatch = (
        inc.withColumnRenamed("comp", "ci")
        .join(batch.withColumnRenamed("comp", "cb"), "node", "full_outer")
        .where(
            F.col("ci").isNull()
            | F.col("cb").isNull()
            | (F.col("ci") != F.col("cb"))
        )
        .count()
    )
    print(f"incremental ≡ batch: {'YES' if mismatch == 0 else f'NO ({mismatch} mismatches)'}; speedup {t_batch1 / max(t_inc, 0.1):.1f}x", flush=True)


if __name__ == "__main__":
    main()
