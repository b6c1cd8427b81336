"""Community-family volume probe: synchronous label propagation at 1M
nodes / 5M skewed edges (the shared graph_scale_probe corpus — 10% of
edges funnel into a 1k-node hub set, the in-degree shape that punishes a
vote aggregate without map-side combine).

Same discipline as the other probes: deterministic input materialized
once, warm run first, output VALUES forced (count_distinct over the
computed columns — a bare .count() lets Catalyst prune the vote away).
Run at two widths for the scaling pair:

    python tools/lpa_scale_probe.py 2
    python tools/lpa_scale_probe.py 8
    python tools/lpa_scale_probe.py 32

Results recorded in BENCH/GRAPH_SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402
from graph_scale_probe import EDGES, ensure_graph  # noqa: E402


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark("lpa_probe", cores=cores, shuffle_partitions=2 * int(cores))
    ensure_graph(spark)
    edges = spark.read.parquet(EDGES)

    from dataset_crawler_spark.operators.graph import label_propagation

    # warm: python workers + codegen on a small slice
    label_propagation(edges.limit(10_000), n_iter=2).count()

    t0 = time.time()
    lp = label_propagation(edges, n_iter=4)
    z = lp.select(F.count_distinct("node", "community").alias("z")).collect()[0][0]
    dt = round(time.time() - t0, 1)
    ncomm = lp.select(F.count_distinct("community").alias("c")).collect()[0][0]
    print(
        f"local[{cores}] label_propagation 1M-node/5M-edge 4 rounds: {dt} s "
        f"({z:,} labels, {ncomm:,} communities)",
        flush=True,
    )


if __name__ == "__main__":
    main()
