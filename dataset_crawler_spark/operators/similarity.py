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
    the lowest ``xxhash64(vec_id)`` — a seedless uniform sample (no RNG, no
    wall clock; identical at any parallelism). A k-means refinement can drop
    in without changing the probe path."""
    w = Window.orderBy(F.xxhash64(F.col("vec_id").cast("string")), F.col("vec_id"))
    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_centroids)
        .select(
            (F.col("_rn") - 1).alias("centroid_id"), F.col("embedding").alias("c_emb")
        )
    )


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
