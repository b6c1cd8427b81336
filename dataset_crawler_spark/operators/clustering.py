"""Duplicate clustering: connected components over near-dup pair edges.

Pair generators (MinHash-LSH ``dedup_minhash_lsh``, sign-LSH
``signband_near_dup_pairs``, exact-hash groups) emit *edges*; a training-data
dedup pipeline then needs the transitive closure — "A~B and B~C ⇒ keep one of
{A,B,C}" — i.e. connected components with a canonical representative per
component. The reference has no such operator (its dedup is the URL-seen set,
DataCrawler.java:359-361); this is part of the LLM-pipeline extension surface.

Algorithm: **hash-to-min with pointer doubling** — the standard
shuffle-efficient CC for Pregel-less DataFrame engines:

- every node starts labeled with itself;
- each round a node's label drops to the min over {its label, its neighbors'
  labels} (one shuffle: edges ⋈ labels, groupBy min), then labels shortcut
  through themselves (``label ← label(label)``, a second self-join) — the
  pointer-doubling step that turns O(diameter) convergence into
  O(log diameter);
- labels only ever decrease, so ``sum(label)`` is strictly monotone until the
  fixpoint: convergence is detected by comparing one tiny scalar aggregate
  per round (a control-plane action, not data movement).

Scale: each round is two hash-partitioned equi-join shuffles over the edge
list — no all-pairs product, no driver-side graph. Lineage is cut every round
with ``localCheckpoint`` so the loop's plan does not grow (on a cluster, a
checkpoint dir + ``checkpoint()`` is the durable equivalent). At 10^9 edges
each round is a plain shuffle join; log2(diameter) rounds ≈ 5-6 for web-dup
graphs whose components are near-cliques.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Undirected edge list (src, dst): both directions, no self-loops."""
    fwd = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    ``edges``: (doc_a, doc_b) pairs, treated undirected. ``nodes``: optional
    (node) universe — isolated nodes become their own singleton component;
    defaults to the nodes appearing in ``edges``.

    Deterministic at any parallelism: min-aggregates only, no RNG, no
    wall-clock. Raises if ``max_iter`` rounds don't converge (duplicate
    graphs converge in a handful; a pathological 2^25-hop path does not
    belong in a dedup pipeline).
    """
    # materialize the edge list ONCE: every round joins against it, and
    # edges usually arrive as the tail of an expensive pair-generation plan
    # (shingle → minhash → band join) that must not re-run per round
    e = symmetrize(edges).localCheckpoint()
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()

    # non-eager checkpoints: the convergence aggregate right below is the
    # action that materializes them — one job per round instead of two
    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0] or 0

    for _ in range(max_iter):
        # min over self + neighborhood (one shuffle join + hash agg)
        nbr = (
            e.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "comp")
        )
        merged = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer doubling: comp ← comp(comp)  (labels are total over node
        # ids that appear as comps — comps are always node ids — so the
        # left join below never misses; coalesce is belt-and-braces)
        jump = merged.select(F.col("node").alias("_c"), F.col("comp").alias("_cc"))
        labels = (
            merged.join(jump, merged.comp == jump._c, "left")
            .select("node", F.coalesce("_cc", "comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    all_docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full dedup-clustering result over a corpus: every document labeled with
    its duplicate-cluster id (= min doc_id in the component; singletons label
    themselves) plus the cluster size. ``keep = (doc_id == cluster_id)`` is
    the canonical-representative policy — deterministic, join-free to apply.

    Returns (doc_id, cluster_id, cluster_size).
    """
    nodes = all_docs.select(F.col(id_col).alias("node"))
    cc = connected_components(pairs, nodes=nodes)
    sizes = cc.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "comp")
        .select(
            F.col("node").alias(id_col),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
        )
    )
