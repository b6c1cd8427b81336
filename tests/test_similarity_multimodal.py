"""ANN similarity search + multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_crawler_spark import datagen
from dataset_crawler_spark.operators.multimodal import extract_media_meta, synth_media_table
from dataset_crawler_spark.operators.similarity import brute_force_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")


def test_brute_force_topk_exact(spark):
    e = _emb(spark)
    q = e.where(F.col("vec_id") < 3)
    got = brute_force_topk(q, e, k=5)
    assert got.groupBy("query_id").count().where("count != 5").count() == 0
    # rank 1 has the max cosine per query
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos))
    for q_id, rs in by_q.items():
        rs.sort()
        assert all(rs[i][1] >= rs[i + 1][1] - 1e-12 for i in range(len(rs) - 1))


def test_lsh_topk_recall(spark):
    e = _emb(spark).cache()
    dim = len(e.first().embedding)
    q = e.where(F.col("vec_id") < 10)
    exact = brute_force_topk(q, e, k=3)
    # synthetic corpus has weak neighbors (max cos ≈ 0.44): short signatures +
    # many tables keep per-table collision probability workable
    approx = lsh_topk(q, e, k=3, dim=dim, n_bits=4, n_tables=16)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_rademacher_lsh_topk_recall_and_determinism(spark):
    """The SQL-twinnable ±1-hyperplane LSH (what engine_sim_lsh_topk ships)
    must hold real recall vs brute force — the DuckDB oracle implements the
    SAME candidate generation, so a recall collapse would keep every gate
    green; only this pin catches it."""
    from dataset_crawler_spark.operators.similarity import rademacher_lsh_topk

    e = _emb(spark).cache()
    dim = len(e.first().embedding)
    q = e.where(F.col("vec_id") < 10)
    exact = brute_force_topk(q, e, k=3)
    approx = rademacher_lsh_topk(q, e, k=3, dim=dim, n_bits=4, n_tables=16)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"rademacher LSH recall too low: {recall}"

    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in approx.collect())
    b = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in rademacher_lsh_topk(q, e, k=3, dim=dim, n_bits=4, n_tables=16).collect()
    )
    assert a == b


def test_lsh_deterministic(spark):
    e = _emb(spark)
    q = e.where(F.col("vec_id") < 5)
    dim = len(e.first().embedding)
    a = sorted(map(tuple, lsh_topk(q, e, 3, dim).collect()))
    b = sorted(map(tuple, lsh_topk(q, e, 3, dim).collect()))
    assert a == b


def test_ivf_topk_recall_and_determinism(spark):
    from dataset_crawler_spark.operators.similarity import ivf_topk

    e = _emb(spark).cache()
    q = e.where(F.col("vec_id") < 10)
    exact = brute_force_topk(q, e, k=3)
    # probe half the cells: recall must be high even on this weak-neighbor corpus
    approx = ivf_topk(q, e, k=3, n_centroids=8, n_probe=4)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # probing ALL cells must equal brute force exactly
    full = ivf_topk(q, e, k=3, n_centroids=8, n_probe=8)
    fu = {(r.query_id, r.neighbor_id, r.rank) for r in full.collect()}
    exr = {(r.query_id, r.neighbor_id, r.rank) for r in exact.collect()}
    assert fu == exr
    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in approx.collect())
    b = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(q, e, k=3, n_centroids=8, n_probe=4).collect()
    )
    assert a == b


def test_signband_near_dup_vs_brute_force(spark):
    """The banded sign-LSH embedding dedup (the scale path) against the
    brute-force all-pairs twin: exact precision (every emitted pair IS a
    ≥-threshold pair with the identical cosine), candidate count well below
    all-pairs, and recall pinned at its deterministic fixture value."""
    from dataset_crawler_spark.operators.similarity import (
        cosine_col,
        signband_near_dup_pairs,
        signband_signatures,
    )

    e = _emb(spark).cache()
    n = e.count()
    got = signband_near_dup_pairs(e, threshold=0.35, n_bands=8, bits_per_band=8)
    rows = {(r.vec_a, r.vec_b): r.cos for r in got.collect()}

    a, b = e.alias("a"), e.alias("b")
    bf = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine_col(F.col("a.embedding"), F.col("b.embedding")), 4).alias("cos"),
        )
        .where(F.col("cos") >= 0.35)
    )
    bf_rows = {(r.vec_a, r.vec_b): r.cos for r in bf.collect()}

    assert set(rows) <= set(bf_rows)  # exact precision
    assert all(bf_rows[k] == v for k, v in rows.items())  # identical cosines
    recall = len(rows) / len(bf_rows)
    assert recall > 0.05  # weak-similarity fixture; see operator docstring

    # candidate generation is genuinely sub-quadratic on the fixture
    sig = signband_signatures(e, 8, 8)
    sa, sb = sig.alias("a"), sig.alias("b")
    n_cand = (
        sa.join(
            sb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    assert n_cand < n * (n - 1) / 2 * 0.2, f"candidates not sub-quadratic: {n_cand}"

    # determinism
    again = {(r.vec_a, r.vec_b): r.cos for r in
             signband_near_dup_pairs(e, threshold=0.35, n_bands=8, bits_per_band=8).collect()}
    assert rows == again


def test_multimodal_plumbing(spark):
    docs = datagen.documents_for_round(spark, 200, 0, n_hosts=10)
    media = synth_media_table(docs)
    n_media = media.count()
    assert n_media > 0
    meta = extract_media_meta(media)
    rows = meta.collect()
    assert len(rows) == n_media
    assert all(r.width >= 64 and r.height >= 64 and r.feature_hash is not None for r in rows)
    # deterministic across runs
    again = {r.media_ref: (r.width, r.height, r.duration_ms) for r in extract_media_meta(media).collect()}
    assert {r.media_ref: (r.width, r.height, r.duration_ms) for r in rows} == again


def test_multimodal_resize_and_frame_sample(spark):
    """Resize geometry (aspect-preserving clamp, never upscale) and frame
    sampling (count/timestamps from duration) are real math over stubbed
    codecs; both stages deterministic with exact batch shapes."""
    from dataset_crawler_spark.operators.multimodal import resize_media, sample_frames

    docs = datagen.documents_for_round(spark, 200, 0, n_hosts=10)
    media = synth_media_table(docs)
    meta = extract_media_meta(media).join(media.select("media_ref", "payload"), "media_ref")

    max_dim = 96
    rz = resize_media(meta, max_dim).collect()
    assert len(rz) == meta.count()
    for r in rz:
        assert max(r.width, r.height) <= max_dim
        assert r.width <= r.src_width and r.height <= r.src_height
        if max(r.src_width, r.src_height) <= max_dim:  # never upscaled
            assert (r.width, r.height) == (r.src_width, r.src_height)
        else:  # aspect preserved under rounding
            scale = max_dim / max(r.src_width, r.src_height)
            assert abs(r.width - r.src_width * scale) <= 0.51
            assert abs(r.height - r.src_height * scale) <= 0.51

    every = 5000
    frames = sample_frames(meta, every)
    per_ref = {r.media_ref: r.n for r in
               frames.groupBy("media_ref").agg(F.count("*").alias("n")).collect()}
    durations = {r.media_ref: r.duration_ms for r in meta.collect()}
    assert per_ref == {ref: dur // every + 1 for ref, dur in durations.items()}
    one = sorted((r.frame_idx, r.ts_ms) for r in frames.collect()
                 if r.media_ref == next(iter(per_ref)))
    assert one == [(i, i * every) for i in range(len(one))]
    # deterministic payload stub
    a = {(r.media_ref, r.frame_idx): bytes(r.frame_payload) for r in frames.collect()}
    b = {(r.media_ref, r.frame_idx): bytes(r.frame_payload)
         for r in sample_frames(meta, every).collect()}
    assert a == b


def test_semantic_dedup_survivors_invariants(spark):
    """SemDeDup composition (dedup_semantic_survivors): survivor clusters
    partition the corpus (sizes sum to N, exactly one survivor per cluster),
    the keep policy is min-vec_id, and every pruned vector reaches its
    survivor through a chain of confirmed near-dup edges (transitivity is
    real, not an artifact of the fixture)."""
    from dataset_crawler_spark.operators.clustering import dedup_clusters
    from dataset_crawler_spark.operators.similarity import signband_near_dup_pairs
    from dataset_crawler_spark.plans.queries import dedup_semantic_survivors

    surv = {(r.vec_id, r.cluster_size, r.n_pruned)
            for r in dedup_semantic_survivors(spark, SF_DIR).collect()}
    n = _emb(spark).count()
    assert sum(s for _, s, _ in surv) == n            # clusters partition corpus
    assert all(p == s - 1 for _, s, p in surv)        # pruned = rest of cluster

    e = _emb(spark)
    pairs = signband_near_dup_pairs(e, threshold=0.35, n_bands=8, bits_per_band=8) \
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    labeled = dedup_clusters(pairs, e.select("vec_id"), id_col="vec_id")
    by_cluster = {}
    for r in labeled.collect():
        by_cluster.setdefault(r.cluster_id, []).append(r.vec_id)
    # min-vec_id keep policy: the survivor set is exactly the cluster minima
    assert {v for v, _, _ in surv} == {min(ms) for ms in by_cluster.values()}
    # pruned vectors are connected to their survivor via the edge set
    adj = {}
    for r in pairs.collect():
        adj.setdefault(r.doc_a, set()).add(r.doc_b)
        adj.setdefault(r.doc_b, set()).add(r.doc_a)
    for cid, members in by_cluster.items():
        seen, stack = {cid}, [cid]
        while stack:
            for nb in adj.get(stack.pop(), ()):
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        assert set(members) <= seen


def test_kmeans_refine_improves_objective_and_is_invariant(spark):
    """Lloyd refinement must not degrade the spherical objective (mean
    cosine of each vector to its assigned centroid) vs the hash-picked
    init, and the refined centroids must be identical at any input
    partitioning (the 4-dp quantization contract)."""
    from dataset_crawler_spark.operators.similarity import (
        cosine_col,
        ivf_assign,
        ivf_centroids,
        kmeans_refine,
    )

    e = _emb(spark)

    def objective(cent):
        a = ivf_assign(e, cent)
        j = a.join(cent, "centroid_id").select(
            cosine_col(F.col("embedding"), F.col("c_emb")).alias("cos")
        )
        return j.agg(F.avg("cos")).collect()[0][0]

    init = ivf_centroids(e, 8)
    refined = kmeans_refine(e, n_centroids=8, n_iter=3)
    assert objective(refined) >= objective(init) - 1e-9

    def snap(df):
        return {
            r.centroid_id: tuple(round(float(x), 4) for x in r.c_emb)
            for r in df.collect()
        }

    one = snap(kmeans_refine(e.coalesce(1), n_centroids=8, n_iter=3))
    many = snap(kmeans_refine(e.repartition(7), n_centroids=8, n_iter=3))
    assert one == many
    # every cluster is non-degenerate on this corpus (k=8 over 50+ vectors)
    sizes = (
        ivf_assign(e, kmeans_refine(e, n_centroids=8, n_iter=3))
        .groupBy("centroid_id")
        .count()
    )
    assert sizes.count() == 8
