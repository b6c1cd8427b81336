"""Graph-family volume probe: PageRank + frontier expansion at 1M scale.

Round-2 verdict item #6: CC already has 1M-edge evidence via the dedup
measurements, but outlink PageRank and frontier expansion were only
fixture-scale. This probe times both at real volume with the same
discipline as tools/scale_probe.py — deterministic synthetic input
materialized once, warm run first, output VALUES forced (count_distinct of
the computed columns; a bare .count() lets Catalyst prune the work away).

Graph: 1M nodes, 5M directed edges with a power-law-ish in-degree skew
(~10% of edges funnel into a 1k-node hub set — the shape that punishes a
plan that shuffles by dst without map-side combine). Frontier-expansion
corpus: 1M fetched docs × 5 link spans each = 5M outlink occurrences.

Run at two widths for the scaling pair: python tools/graph_scale_probe.py 8
then 32 (defaults to 32). Results get recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402

EDGES = "/tmp/spark_graft_bench/graph1m_edges"
DOCS = "/tmp/spark_graft_bench/graph1m_docs"
N_NODES = 1_000_000
N_EDGES = 5_000_000


def ensure_graph(spark) -> None:
    if not os.path.exists(os.path.join(EDGES, "_SUCCESS")):
        e = spark.range(N_EDGES, numPartitions=64)
        src = F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
        # 10% of edges land in a 1k-node hub set → heavy in-degree skew
        hub = F.pmod(F.xxhash64(F.col("id") * 31 + 7), F.lit(1_000))
        spread = F.pmod(F.xxhash64(F.col("id") * 13 + 3), F.lit(N_NODES))
        dst = F.when(F.col("id") % 10 == 0, hub).otherwise(spread)
        e.select(
            F.concat(F.lit("h"), src.cast("string")).alias("src"),
            F.concat(F.lit("h"), dst.cast("string")).alias("dst"),
        ).where(F.col("src") != F.col("dst")).write.mode("overwrite").parquet(EDGES)
    if not os.path.exists(os.path.join(DOCS, "_SUCCESS")):
        # 1M fetched docs, 5 link spans each (kind='link' → media_ref URL),
        # targets skewed the same way so the degree agg sees real hot keys
        spans = F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda j: F.struct(
                F.lit("link").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(
                    F.lit("https://host"),
                    F.pmod(F.xxhash64(F.col("id") * 5 + j), F.lit(2_000)).cast("string"),
                    F.lit(".example.org/d/"),
                    F.when(
                        F.pmod(F.xxhash64(F.col("id") * 11 + j), F.lit(10)) == 0,
                        F.pmod(F.xxhash64(F.col("id") * 17 + j), F.lit(10_000)),
                    )
                    .otherwise(F.pmod(F.xxhash64(F.col("id") * 23 + j), F.lit(N_NODES)))
                    .cast("string"),
                ).alias("media_ref"),
                j.cast("int").alias("offset"),
            ),
        )
        spark.range(N_NODES, numPartitions=64).select(
            F.concat(F.lit("https://src.example.org/d/"), F.col("id").cast("string")).alias(
                "doc_id"
            ),
            spans.alias("spans"),
        ).write.mode("overwrite").parquet(DOCS)


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark("graph_probe", cores=cores, shuffle_partitions=2 * int(cores))
    ensure_graph(spark)

    from dataset_crawler_spark.operators.discovery import expand_frontier
    from dataset_crawler_spark.operators.graph import hits, opic, pagerank, trustrank

    edges = spark.read.parquet(EDGES)
    docs = spark.read.parquet(DOCS)

    # warm: python workers + codegen on small slices
    pagerank(edges.limit(10_000), n_iter=2).count()
    expand_frontier(docs.limit(10_000), 0).count()

    t0 = time.time()
    pr = pagerank(edges, n_iter=8)
    z = pr.select(F.count_distinct("node", "rank").alias("z")).collect()[0][0]
    t_pr = round(time.time() - t0, 1)
    print(f"local[{cores}] pagerank 1M-node/5M-edge 8 iter: {t_pr} s ({z:,} ranks)", flush=True)

    # the other centrality signals share pagerank's static-side prep and
    # per-iteration join+agg shape — measured here so the 1M-node claim in
    # their docstrings is evidence, not analogy. Trusted seeds: the 1k hub
    # set's ids (deterministic, ~0.1% of nodes — the paper's regime).
    trusted = spark.range(1_000).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("node")
    )
    t0 = time.time()
    tr = trustrank(edges, trusted, n_iter=8)
    z = tr.select(F.count_distinct("node", "trust").alias("z")).collect()[0][0]
    t_tr = round(time.time() - t0, 1)
    print(f"local[{cores}] trustrank 1M-node/5M-edge 8 iter: {t_tr} s ({z:,} trusts)", flush=True)

    t0 = time.time()
    ht = hits(edges, n_iter=8)
    z = ht.select(F.count_distinct("node", "authority", "hub").alias("z")).collect()[0][0]
    t_ht = round(time.time() - t0, 1)
    print(f"local[{cores}] hits 1M-node/5M-edge 8 iter: {t_ht} s ({z:,} scores)", flush=True)

    t0 = time.time()
    op = opic(edges, n_rounds=8)
    z = op.select(F.count_distinct("node", "importance").alias("z")).collect()[0][0]
    t_op = round(time.time() - t0, 1)
    print(f"local[{cores}] opic 1M-node/5M-edge 8 rounds: {t_op} s ({z:,} scores)", flush=True)

    # adaptive (per-crawl-round) step at a 1% visit rate — the engine's
    # standing-state path (CrawlEngine.opic_update): ONE masked update per
    # crawl round instead of a full k-round batch refresh
    from dataset_crawler_spark.operators.graph import opic_step

    nodes1m = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n1m = nodes1m.count()
    state = nodes1m.select(
        "node", (F.lit(1.0) / n1m).alias("cash"), F.lit(0.0).alias("hist")
    ).localCheckpoint()
    fetched = nodes1m.where(F.pmod(F.xxhash64("node"), F.lit(100)) == 0)
    t0 = time.time()
    st = opic_step(state, edges, fetched)
    z = st.select(F.count_distinct("node", "cash", "hist").alias("z")).collect()[0][0]
    t_st = round(time.time() - t0, 1)
    print(
        f"local[{cores}] opic_step 1M-node/5M-edge 1% fetched: {t_st} s ({z:,} states)",
        flush=True,
    )

    t0 = time.time()
    fr = expand_frontier(docs, 0)
    z = fr.select(F.count_distinct("url", "priority").alias("z")).collect()[0][0]
    t_fr = round(time.time() - t0, 1)
    print(f"local[{cores}] expand_frontier 1M docs/5M outlinks: {t_fr} s ({z:,} urls)", flush=True)

    # round-4 additions: peeling and neighborhood sketches at the same volume
    from dataset_crawler_spark.operators.graph import hyperball, kcore

    t0 = time.time()
    kc = kcore(edges, k=3, n_iter=4)
    z = kc.select(F.count_distinct("node", "core_degree").alias("z")).collect()[0][0]
    t_kc = round(time.time() - t0, 1)
    print(f"local[{cores}] kcore k=3 1M-node/5M-edge 4 rounds: {t_kc} s ({z:,} members)", flush=True)

    # HyperBall at p=6 (64 registers — the volume knob: per-round join output
    # is bounded by |E| x 2^p rows, so p trades estimate stderr for traffic;
    # p=8 quadruples the bound, same plan). 3 rounds covers the interesting
    # growth regime on a 5-out-degree graph (balls ~1 -> ~6 -> ~30 -> ~150).
    t0 = time.time()
    hb = hyperball(edges, n_iter=3, p=6)
    z = hb.select(F.count_distinct("node", "t", "nf_estimate").alias("z")).collect()[0][0]
    t_hb = round(time.time() - t0, 1)
    print(
        f"local[{cores}] hyperball p=6 1M-node/5M-edge 3 rounds: {t_hb} s ({z:,} (node,t) estimates)",
        flush=True,
    )


if __name__ == "__main__":
    main()
