"""Similarity search over embedding columns (engine extension).

Two physical strategies over ``(vec_id:long, embedding:array<float>)``:

- ``brute_force_topk`` — exact: query×corpus join with a JVM-side cosine
  (``zip_with``/``aggregate``); right for small query sets or as the recall
  oracle.
- ``lsh_topk`` — the scale path: random-hyperplane LSH. Each vector gets a
  ``n_bits``-bit signature (sign of dot with deterministic hyperplanes,
  computed in a vectorized pandas UDF over Arrow batches); candidates are
  vectors sharing a signature band with the query; exact cosine re-ranks the
  candidates. At 10^9 vectors the band join is a hash join on the band key —
  no all-pairs product ever materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_col(a, b):
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
    """Exact top-k neighbors: (query_id, neighbor_id, cos, rank)."""
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = cosine_col(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)  # deterministic: fixed seed, no wall clock
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def with_lsh_signature(df: DataFrame, dim: int, n_bits: int = 16, seed: int = 42) -> DataFrame:
    """Add a ``sig`` column: random-hyperplane signature (vectorized Arrow UDF)."""
    planes = _hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf("long")
    def sig(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (batch, dim) float
        bits = (m @ planes.T) > 0  # (batch, n_bits)
        return pd.Series((bits @ weights).astype(np.int64))

    return df.withColumn("sig", sig(F.col("embedding")))


def ivf_assign(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties → lowest
    centroid id). ``centroids``: (centroid_id, c_emb) — small, broadcast."""
    cos = cosine_col(F.col("embedding"), F.col("c_emb"))
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("centroid_id"))
    return (
        corpus.join(F.broadcast(centroids), how="cross")
        .select("vec_id", "embedding", "centroid_id", cos.alias("_cos"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )


def ivf_centroids(corpus: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` corpus vectors with
    the lowest ``h60(vec_id)`` — a seedless uniform sample (no RNG, no wall
    clock; identical at any parallelism). h60 (md5-based) rather than
    xxhash64 so the DuckDB oracle can reproduce the selection and therefore
    the ENTIRE ivf query (plans/queries.py engine_sim_ivf_topk). A k-means
    refinement can drop in without changing the probe path.

    Selection is ``orderBy(...).limit(n)`` — Catalyst compiles that to a
    distributed ``TakeOrderedAndProject`` (per-partition top-n, tiny driver
    merge), so the full corpus never funnels through one task. Only the
    ≤ ``n_centroids`` surviving rows pass through the single-partition
    re-index window."""
    from dataset_crawler_spark.functions.hashing import h60

    hk = h60(F.col("vec_id").cast("string"))
    picked = (
        corpus.select("vec_id", "embedding", hk.alias("_hk"))
        .orderBy("_hk", "vec_id")
        .limit(n_centroids)
    )
    w = Window.orderBy("_hk", "vec_id")  # ≤ n_centroids rows: cheap by design
    return (
        picked.withColumn("_rn", F.row_number().over(w))
        .select((F.col("_rn") - 1).alias("centroid_id"), F.col("embedding").alias("c_emb"))
    )


def kmeans_refine(
    corpus: DataFrame, n_centroids: int = 8, n_iter: int = 3
) -> DataFrame:
    """Fixed-iteration Lloyd refinement of :func:`ivf_centroids`' hash-picked
    init (spherical k-means: assign by max cosine with centroid-id
    tie-break, update = element-wise mean of the members). Returns
    (centroid_id, c_emb) — drop-in for the coarse table in :func:`ivf_topk`
    (its docstring's promised upgrade), cutting cell imbalance that makes
    probe cost skew at 10^9 vectors.

    Determinism: fixed iterations, no RNG; the ONLY order-sensitive step is
    the distributed mean, so every refreshed centroid component is quantized
    to 4 decimals before the next assignment — accumulation-order ulp can
    never leak into an argmax. An emptied cluster keeps its previous
    centroid (quantized the same way), the standard deterministic Lloyd
    fallback. Scale shape per iteration: one broadcast cross join
    (corpus × k) + one (k · dim)-row hash aggregate — the corpus never
    shuffles; lineage cut per iteration with non-eager localCheckpoint.
    """
    cent = ivf_centroids(corpus, n_centroids)
    q4 = lambda col: F.round(col.cast("double"), 4)  # noqa: E731
    for _ in range(n_iter):
        a = ivf_assign(corpus, cent)
        upd = (
            a.select("centroid_id", F.posexplode("embedding").alias("i", "x"))
            .groupBy("centroid_id", "i")
            .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("x"))
        )
        newc = (
            upd.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("i", "x"))).alias("_p"))
            .select(
                "centroid_id", F.transform("_p", lambda s: s["x"]).alias("c_emb")
            )
        )
        cent = (
            cent.select(
                "centroid_id",
                F.transform("c_emb", q4).alias("_prev"),
            )
            .join(newc, "centroid_id", "left")
            .select("centroid_id", F.coalesce("c_emb", "_prev").alias("c_emb"))
            .localCheckpoint(eager=False)
        )
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k via an inverted-file index: assign corpus vectors to
    coarse centroids (one pass, centroid table broadcast), probe only the
    ``n_probe`` centroids nearest each query, exact cosine re-rank inside the
    probed cells. At 10^9 vectors the candidate join is a hash join on
    ``centroid_id`` over ~n_probe/n_centroids of the corpus — no all-pairs
    product, and the partition-by-centroid layout makes cells co-located."""
    cents = ivf_centroids(corpus, n_centroids)
    assigned = ivf_assign(corpus, cents).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb_v"), "centroid_id"
    )
    qcos = cosine_col(F.col("q_emb"), F.col("c_emb"))
    wq = Window.partitionBy("query_id").orderBy(F.col("_qc").desc(), F.col("centroid_id"))
    probes = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
        .join(F.broadcast(cents), how="cross")
        .select("query_id", "q_emb", "centroid_id", qcos.alias("_qc"))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "q_emb", "centroid_id")
    )
    cos = cosine_col(F.col("q_emb"), F.col("c_emb_v"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        probes.join(assigned, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def signband_signatures(corpus: DataFrame, n_bands: int, bits_per_band: int) -> DataFrame:
    """(vec_id, band, sig): axis-aligned sign-bit LSH signatures.

    Band ``b`` reads coordinates ``[b·bits, (b+1)·bits)`` and emits the bit
    string of their signs — SimHash with unit-vector hyperplanes. Chosen over
    random hyperplanes for the *dedup* path because it is exactly expressible
    in ANSI SQL, so the DuckDB oracle replicates candidate generation
    bit-for-bit (plans/queries.py dedup_embedding_signlsh) instead of a
    weaker rows-only check. Pure built-in expressions — no Python stage.

    Scale: the pair join is a hash join on (band, sig); ``bits_per_band``
    must grow ~log2(corpus) to keep per-bucket counts bounded (16-24 bits at
    10^9 vectors; 8 here for the small fixture)."""
    bands = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(bits_per_band)),
        lambda i: F.when(
            F.element_at(
                F.col("embedding"), (F.col("band") * bits_per_band + i).cast("int")
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return corpus.select("vec_id", "embedding", bands).select(
        "vec_id", "band", F.concat_ws("", bits).alias("sig")
    )


def signband_near_dup_pairs(
    corpus: DataFrame, threshold: float, n_bands: int = 8, bits_per_band: int = 8
) -> DataFrame:
    """Embedding near-dup pairs, the 10^9-vector scale path: banded sign-LSH
    candidates (hash join per band, no all-pairs product) + exact cosine
    confirm ≥ ``threshold``. Precision is exact (every emitted pair is
    confirmed); recall is the LSH catch rate — ≥99% for true near-dups
    (cos ≥ 0.9: per-band hit ≈ (1-acos(0.9)/π)^8 ≈ 0.43, 8 bands → 0.99),
    lower for weakly-similar pairs, pinned vs the brute-force twin in tests.
    Returns (vec_a, vec_b, cos) with cos rounded to 4 places."""
    sig = signband_signatures(corpus, n_bands, bits_per_band)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = corpus.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_ea"))
    eb = corpus.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_eb"))
    cos = F.round(cosine_col(F.col("_ea"), F.col("_eb")), 4)
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def signband_topk(
    queries: DataFrame, corpus: DataFrame, k: int, n_bands: int = 8, bits_per_band: int = 8
) -> DataFrame:
    """ANN top-k over sign-band candidates: hash-join per band, exact cosine
    re-rank, top-k by (rounded cos desc, neighbor_id). Like
    :func:`signband_near_dup_pairs` this is fully SQL-expressible, so the
    DuckDB oracle checks the whole path (plans/queries.py sim_signlsh_topk);
    queries with fewer than k band-mates return fewer rows — recall-bounded
    like any LSH, never wrong. Ranking uses the ROUNDED cosine so the order
    is bit-identical cross-engine."""
    qs = signband_signatures(queries, n_bands, bits_per_band).select(
        F.col("vec_id").alias("query_id"), "band", "sig"
    )
    cs = signband_signatures(corpus, n_bands, bits_per_band).select(
        F.col("vec_id").alias("neighbor_id"), "band", "sig"
    )
    cand = (
        qs.join(cs, ["band", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    eq = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_eq"))
    ec = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_ec"))
    scored = (
        cand.join(eq, "query_id")
        .join(ec, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("_eq"), F.col("_ec")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _rademacher_planes(dim: int, n_bits: int, table: int) -> np.ndarray:
    """±1 hyperplanes from h60 md5 parity — no RNG, reproducible bit-for-bit
    in ANSI SQL (the database-friendly random-projection family of Achlioptas
    2003: ±1 entries preserve the random-hyperplane LSH guarantees)."""
    from dataset_crawler_spark.functions.hashing import h60_py

    w = np.empty((n_bits, dim), dtype=np.int64)
    for b in range(n_bits):
        for i in range(dim):
            w[b, i] = 1 if h60_py(f"lsh:{table}:{b}:{i}") % 2 == 0 else -1
    return w


def with_rademacher_signature(
    df: DataFrame, dim: int, n_bits: int = 12, table: int = 0, quant: int = 1000
) -> DataFrame:
    """Add a ``sig`` column: ±1-hyperplane signature over FLOOR-quantized
    coordinates. All arithmetic is int64 (quantize → integer dot → sign), so
    the signature is EXACT — no float-summation-order ambiguity — and a SQL
    engine replicates it bit-for-bit (plans/queries.py engine_sim_lsh_topk
    twin). Vectorized Arrow UDF: one numpy integer matmul per batch."""
    planes = _rademacher_planes(dim, n_bits, table)
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    @pandas_udf("long")
    def sig(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        q = np.floor(m * quant).astype(np.int64)
        bits = (q @ planes.T) > 0
        return pd.Series((bits @ weights).astype(np.int64))

    return df.withColumn("sig", sig(F.col("embedding")))


def rademacher_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_bits: int = 12,
    n_tables: int = 4,
    quant: int = 1000,
) -> DataFrame:
    """:func:`lsh_topk` with the SQL-twinnable ±1 signature: union of
    ``n_tables`` signature hash-joins, exact cosine re-rank, top-k by
    (ROUNDED cos desc, neighbor_id) so ranking is bit-identical cross-engine.
    Same 10^9-vector shape as lsh_topk — band hash joins, no all-pairs."""
    cands = None
    for t in range(n_tables):
        qs = with_rademacher_signature(queries, dim, n_bits, table=t, quant=quant).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "sig"
        )
        cs = with_rademacher_signature(corpus, dim, n_bits, table=t, quant=quant).select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "sig"
        )
        j = qs.join(cs, "sig").where(F.col("query_id") != F.col("neighbor_id")).drop("sig")
        cands = j if cands is None else cands.unionByName(j)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"])
    cos = F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 4)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_bits: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent signature joins,
    exact cosine re-rank of the candidate set."""
    cands = None
    for t in range(n_tables):
        qs = with_lsh_signature(queries, dim, n_bits, seed=42 + t).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "sig"
        )
        cs = with_lsh_signature(corpus, dim, n_bits, seed=42 + t).select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "sig"
        )
        j = qs.join(cs, "sig").where(F.col("query_id") != F.col("neighbor_id")).drop("sig")
        cands = j if cands is None else cands.unionByName(j)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"])
    cos = cosine_col(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cands.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
