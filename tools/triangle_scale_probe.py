"""Triangle-counting volume probe: 1M nodes / 5M skewed edges.

Reuses graph_scale_probe's deterministic graph (10% of edges funnel into a
1k-node hub set) — exactly the degree profile that blows up a naive
adjacency self-join: a 500-in-degree hub would root C(500,2) ≈ 125k wedges.
Degree orientation (operators/graph.py triangle_counts) points every edge
at the (degree, id)-LARGER endpoint, so hubs root almost no wedges and the
candidate count stays O(m^1.5)-bounded; this probe is the measurement
behind that claim at real volume, plus the 2→N scaling pair.

Run: python tools/triangle_scale_probe.py [cores]   (default 32; run at 2
and 8/32 for the pre-saturation scaling pair recorded in
BENCH/GRAPH_SCALE.md). Values are forced with count_distinct over the
computed columns — a bare .count() lets Catalyst prune the joins away.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402
from tools.graph_scale_probe import EDGES, ensure_graph  # noqa: E402


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark("triangle_probe", cores=cores, shuffle_partitions=2 * int(cores))
    ensure_graph(spark)

    from dataset_crawler_spark.operators.graph import triangle_counts

    edges = spark.read.parquet(EDGES)

    # warm: codegen + shuffle machinery on a small slice
    triangle_counts(edges.limit(10_000)).count()

    t0 = time.time()
    tc = triangle_counts(edges)
    row = tc.agg(
        F.count_distinct("node", "degree", "triangles").alias("z"),
        (F.sum("triangles") / 3).alias("n_tri"),
        F.max("triangles").alias("max_tri"),
    ).collect()[0]
    dt = round(time.time() - t0, 1)
    print(
        f"local[{cores}] triangles 1M-node/5M-edge: {dt} s "
        f"({row.z:,} nodes, {int(row.n_tri):,} triangles, max/node {row.max_tri})",
        flush=True,
    )


if __name__ == "__main__":
    main()
