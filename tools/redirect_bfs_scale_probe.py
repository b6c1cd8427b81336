"""Volume probe for the two frontier-ingest graph ops added after the
centrality family: redirect-chain resolution (pointer doubling over a 10M-URL
functional graph) and multi-source BFS crawl depth (frontier-delta rounds
over the shared 1M-node/5M-edge skewed link graph).

Same discipline as tools/graph_scale_probe.py: deterministic synthetic input,
warm run first, output VALUES forced (count_distinct / sums over the computed
columns — a bare .count() lets Catalyst prune the work away). Run at two
widths for the scaling pair: python tools/redirect_bfs_scale_probe.py 8
then 32 (defaults to 32). Results recorded in BENCH/GRAPH_SCALE.md.

Redirect map: 10M URLs, ~40% redirecting, targets hash-uniform — chain-length
distribution is geometric(0.6), so 6 doublings (cap 64) clear the tail by a
wide margin; the probe prints the resolved/cycle split so a synthesis change
that quietly broke chain shape would show in the numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402
from tools.graph_scale_probe import EDGES, ensure_graph  # noqa: E402

N_URLS = 10_000_000


def redirect_map(spark, n: int):
    r = spark.range(n, numPartitions=64)
    tgt = F.pmod(F.xxhash64(F.col("id") * 13 + 3), F.lit(n))
    return r.where(F.pmod(F.xxhash64(F.col("id")), F.lit(5)) < 2).select(
        F.col("id").alias("node"),
        F.when(tgt == F.col("id"), F.pmod(tgt + 1, F.lit(n)))
        .otherwise(tgt)
        .alias("next"),
    )


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark("rb_probe", cores=cores, shuffle_partitions=2 * int(cores))
    ensure_graph(spark)

    from dataset_crawler_spark.operators.graph import bfs_depths, resolve_redirects

    # warm: codegen + shuffle machinery on small slices
    resolve_redirects(redirect_map(spark, 10_000)).count()

    rmap = redirect_map(spark, N_URLS).localCheckpoint()
    n_red = rmap.count()
    t0 = time.time()
    res = resolve_redirects(rmap, n_doublings=6)
    agg = res.agg(
        F.count_distinct("node", "terminal", "chain_len").alias("z"),
        F.sum(F.when(F.col("terminal") >= 0, 1).otherwise(0)).alias("resolved"),
        F.max("chain_len").alias("max_chain"),
    ).collect()[0]
    t_rr = round(time.time() - t0, 1)
    print(
        f"local[{cores}] resolve_redirects {n_red:,} redirecting of "
        f"{N_URLS:,} urls, 6 doublings: {t_rr} s "
        f"({agg['resolved']:,} resolved, max chain {agg['max_chain']}, "
        f"{n_red - agg['resolved']:,} cycle/over-cap)",
        flush=True,
    )

    edges = spark.read.parquet(EDGES)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .where(F.pmod(F.xxhash64("node"), F.lit(50)) == 0)
        .distinct()
    )
    bfs_depths(edges.limit(10_000), seeds.limit(100), n_iter=2).count()

    t0 = time.time()
    d = bfs_depths(edges, seeds, n_iter=8)
    agg = d.agg(
        F.count_distinct("node", "depth").alias("z"),
        F.max("depth").alias("max_depth"),
    ).collect()[0]
    t_bfs = round(time.time() - t0, 1)
    print(
        f"local[{cores}] bfs_depths 1M-node/5M-edge 8 rounds (2% seeds): "
        f"{t_bfs} s ({agg['z']:,} reached, max depth {agg['max_depth']})",
        flush=True,
    )


if __name__ == "__main__":
    main()
