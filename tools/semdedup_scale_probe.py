"""Semantic-dedup volume probe: signlsh edges → CC → survivors at 1M vectors.

The fixture-scale query (plans/queries.py dedup_semantic_survivors) runs the
sign-band LSH with 8 bands × 8 bits because 500 vectors need wide buckets to
produce any candidates at all. At volume the geometry inverts: bucket count
is 2^bits_per_band per band, so per-bucket occupancy is N / 2^bits and the
candidate-pair count grows as N²/2^bits — bits_per_band must track log2(N)
(operators/similarity.py signband_signatures docstring). This probe makes
that rule MEASURED instead of asserted:

1. 1M synthetic 64-dim embeddings with 200k planted exact-duplicate pairs
   (vec i ≥ 800k duplicates vec (i-800k)·4), materialized once under /tmp.
2. For each band config, count candidate pairs Σ C(bucket, 2) analytically
   from bucket sizes (no pair materialization — the 8-bit config's pair list
   would be ~10^10 rows, which is exactly the point).
3. Time the full survivors pipeline (edges + connected components + keep-min)
   at the feasible config, outputs forced (count_distinct + sum; a bare
   .count() lets Catalyst prune the cosine confirm away).

Correctness self-check: survivors must be exactly 800,000 (200k clusters of
size 2 + 600k singletons) — a random 64-dim pair at cos ≥ 0.9 is a ~7σ event,
so any deviation means the probe (not the machine) is wrong.

Run at two widths for the scaling pair: python tools/semdedup_scale_probe.py 8
then 32 (defaults to 32). Results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402

EMB = "/tmp/spark_graft_bench/emb1m"
N = 1_000_000
N_BASE = 800_000
DIM = 64


def ensure_embeddings(spark) -> None:
    if os.path.exists(os.path.join(EMB, "_SUCCESS")):
        return
    # vec i < 800k: its own vector; vec i >= 800k: exact dup of (i-800k)*4
    g = F.when(F.col("id") < N_BASE, F.col("id")).otherwise(
        (F.col("id") - N_BASE) * 4
    )
    vals = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            (F.pmod(F.xxhash64(g * 131 + j), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    spark.range(N, numPartitions=64).select(
        F.col("id").alias("vec_id"), vals.alias("embedding")
    ).write.mode("overwrite").parquet(EMB)


def candidate_count(spark, e, n_bands: int, bits: int) -> int:
    """Σ C(bucket_size, 2) over (band, sig) buckets — the pair-join input
    size, computed from bucket sizes without materializing any pair."""
    from dataset_crawler_spark.operators.similarity import signband_signatures

    sizes = signband_signatures(e, n_bands, bits).groupBy("band", "sig").count()
    row = sizes.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).collect()[0]
    return int(row.pairs)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("semdedup_probe", cores=cores, shuffle_partitions=cores)
    ensure_embeddings(spark)
    e = spark.read.parquet(EMB)

    # --- band-width sweep: candidate volume vs bits_per_band ---------------
    for n_bands, bits in ((8, 8), (4, 16), (3, 20)):
        n_cand = candidate_count(spark, e, n_bands, bits)
        print(f"bands={n_bands} bits={bits:2d}: {n_cand:>14,d} candidate pairs")

    # --- timed end-to-end survivors at the feasible config -----------------
    from dataset_crawler_spark.operators.clustering import dedup_clusters
    from dataset_crawler_spark.operators.similarity import signband_near_dup_pairs

    def run() -> tuple[float, int, int]:
        t0 = time.time()
        pairs = signband_near_dup_pairs(
            e, threshold=0.9, n_bands=3, bits_per_band=20
        ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
        labeled = dedup_clusters(pairs, e.select("vec_id"), id_col="vec_id")
        surv = labeled.where(F.col("vec_id") == F.col("cluster_id"))
        row = surv.select(
            F.count_distinct("vec_id").alias("n_surv"),
            F.sum("cluster_size").alias("covered"),
        ).collect()[0]
        return round(time.time() - t0, 1), row.n_surv, row.covered

    warm = run()  # JIT/codegen warm-up — a long-lived pipeline pays this once
    best = min(run()[0] for _ in range(3))
    _, n_surv, covered = warm
    assert n_surv == N_BASE, f"expected {N_BASE} survivors, got {n_surv}"
    assert covered == N, f"clusters must cover the corpus, got {covered}"
    print(
        f"semdedup_1m @ {cores} cores: best {best:.1f} s "
        f"(warm {warm[0]:.1f} s); survivors={n_surv:,d} covering {covered:,d}"
    )


if __name__ == "__main__":
    main()
