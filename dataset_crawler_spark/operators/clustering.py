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


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Incremental CC: fold one round's NEW edges (and nodes) into standing
    component labels at per-round |new| cost — the clustering member of the
    engine's incremental-index family (minhash: dedup_index.py, sign-LSH and
    ExactSubstr: plans/queries.py engine_incremental_*). A growing corpus
    re-clusters every round; recomputing CC over 10^10 accumulated edges per
    round is the O(everything) trap this avoids.

    ``labels``: (node, comp) for the already-clustered universe (comp = min
    reachable node id — connected_components' invariant). ``new_edges``:
    (doc_a, doc_b) pairs from this round's pair generators — may touch new
    nodes, old nodes, or bridge two OLD clusters (a re-crawl discovering a
    late duplicate pair). ``new_nodes``: optional (node) universe for this
    round's unlabeled docs (isolated new docs become singletons).

    Algorithm — CC on the QUOTIENT graph: project every new edge endpoint
    through the standing labels (old node → its component representative;
    unlabeled node → itself), run the batch fixpoint on that contracted
    graph (nodes = touched reps + new nodes — per-round-sized, never the
    corpus), then broadcast the rep→new-comp mapping back over the standing
    labels. Because comps are min node ids, contracting a cluster to its
    rep preserves the global min, so the result is EQUAL to batch CC over
    (old edges ∪ new edges) — pinned by test and by the driver twin.

    Cost: |new edges| projection (two standing-label joins — on a cluster
    these are broadcast or bucketed-index lookups), a fixpoint over the
    contracted graph, and ONE broadcast join over the labels table for the
    relabel (the mapping is dimension-sized: ≤ touched reps + new nodes).
    """
    e = symmetrize(new_edges)
    lab_s = labels.select(F.col("node").alias("src"), F.col("comp").alias("_cs"))
    lab_d = labels.select(F.col("node").alias("dst"), F.col("comp").alias("_cd"))
    proj = (
        e.join(lab_s, "src", "left")
        .join(lab_d, "dst", "left")
        .select(
            F.coalesce("_cs", F.col("src")).alias("doc_a"),
            F.coalesce("_cd", F.col("dst")).alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
    )
    qnodes = (
        proj.select(F.col("doc_a").alias("node"))
        .unionByName(proj.select(F.col("doc_b").alias("node")))
    )
    if new_nodes is not None:
        qnodes = qnodes.unionByName(
            new_nodes.select(F.col(new_nodes.columns[0]).alias("node"))
        )
    qcc = connected_components(proj, nodes=qnodes.distinct(), max_iter=max_iter)

    repmap = qcc.select(F.col("node").alias("_rep"), F.col("comp").alias("_newc"))
    updated = (
        labels.join(
            F.broadcast(repmap), labels["comp"] == repmap["_rep"], "left"
        )
        .select("node", F.coalesce("_newc", "comp").alias("comp"))
    )
    # every not-yet-labeled node the round surfaced gets a row: the declared
    # new_nodes universe PLUS any quotient node outside it — an edge
    # generator can legitimately mention a doc the caller's new-doc list
    # missed, and dropping it would leave other nodes' comps pointing at a
    # node absent from the labels table (batch CC labels it, so must we)
    fresh_nodes = qcc.select("node")
    if new_nodes is not None:
        fresh_nodes = fresh_nodes.unionByName(
            new_nodes.select(F.col(new_nodes.columns[0]).alias("node"))
        )
    fresh = (
        fresh_nodes.distinct()
        .join(labels.select("node"), "node", "left_anti")
        .join(F.broadcast(repmap.withColumnRenamed("_rep", "node")), "node", "left")
        .select("node", F.coalesce("_newc", "node").alias("comp"))
    )
    return updated.unionByName(fresh)
