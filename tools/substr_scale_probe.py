"""Exact-substring dedup at 1M documents (the stride-1 blowup, measured).

`dedup_substring_exact` pays k× more hashed rows than the stride-k chunk
ops for its alignment-free guarantee. This probe puts a number on that at
volume: the shared 1M-doc corpus (40 tokens/doc → 33 windows/doc at k=8,
~33M shuffled (h, doc_id, i) rows) through the registered query itself,
values forced. Compare with dedup_chunk_passages timings from
tools/scale_probe.py on the same corpus to see the stride-1 premium.

Run at two widths for the scaling pair: python tools/substr_scale_probe.py 8
then 32 (defaults to 32). Results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402

SUBSTR_DIR = "/tmp/spark_graft_bench/substr1m"
N_DOCS = 1_000_000


def ensure_docs(spark) -> None:
    """1M docs × 40 tokens (same generator shape as tools/scale_probe.py),
    with every 10th document an EXACT COPY of its block leader — 100k docs
    must come back marked with one full-width duplicated span, so the
    marked/island stages do real work and the probe self-checks."""
    docs = os.path.join(SUBSTR_DIR, "documents.parquet")
    if os.path.exists(os.path.join(docs, "_SUCCESS")):
        return
    g = F.when(F.col("id") % 10 == 9, F.col("id") - 9).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(g * 47 + j), F.lit(5000)).cast("string")
        ),
    )
    spark.range(N_DOCS, numPartitions=64).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    ).write.mode("overwrite").parquet(docs)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("substr_probe", cores=cores, shuffle_partitions=cores)
    ensure_docs(spark)

    from dataset_crawler_spark.plans.queries import dedup_substring_exact

    def run() -> tuple[float, int]:
        t0 = time.time()
        row = (
            dedup_substring_exact(spark, SUBSTR_DIR)
            .agg(
                F.count_distinct("doc_id", "n_dup_tokens", "dup_token_frac").alias("z"),
                F.sum((F.col("n_dup_tokens") > 0).cast("long")).alias("n_dup_docs"),
            )
            .collect()[0]
        )
        return round(time.time() - t0, 1), row.n_dup_docs

    warm, n_dup_docs = run()
    assert n_dup_docs == N_DOCS // 10, f"expected 100k planted dups, got {n_dup_docs}"
    best = min(run()[0] for _ in range(3))
    print(
        f"substr_dedup_1m @ {cores} cores: best {best:.1f} s (warm {warm:.1f} s); "
        f"{n_dup_docs:,d} docs carry duplicated spans (planted copies all found)"
    )


if __name__ == "__main__":
    main()
