"""Round-4 tail-II operators at real volume: 1M docs (40M tokens) and 10M
events, timed with output values forced (count_distinct over the result
columns — a bare .count() lets Catalyst prune the work away).

The corpus plants a skewed token head (5 of 40 positions draw from an
8-word hot vocabulary ≈ 1.56% each) so sketch_heavy_hitters has true
heavy hitters above the n/100 threshold and the Misra-Gries prune runs
against a 5000-word cold tail. Events spread uniformly over 256 users x
365 days so the z-order audit sees every block.

Usage: python tools/newops_scale_probe.py [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.session import get_spark  # noqa: E402

DIR = "/tmp/spark_graft_bench/newops1m"


def ensure_tables(spark) -> None:
    docs = os.path.join(DIR, "documents.parquet")
    events = os.path.join(DIR, "events.parquet")
    if not os.path.exists(os.path.join(docs, "_SUCCESS")):
        words = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.when(
                j <= 5,
                F.concat(
                    F.lit("hot"),
                    F.translate(
                        F.pmod(F.xxhash64(F.col("id") * 31 + j), F.lit(8)).cast("string"),
                        "0123456789", "abcdefghij",
                    ),
                ),
            ).otherwise(
                F.concat(
                    F.lit("w"),
                    F.translate(
                        F.pmod(F.xxhash64(F.col("id") * 47 + j), F.lit(5000)).cast("string"),
                        "0123456789", "abcdefghij",
                    ),
                )
            ),
        )
        spark.range(1_000_000, numPartitions=64).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), F.pmod("id", F.lit(5)).cast("string")).alias("source"),
        ).withColumn("n_chars", F.length("text").cast("long")).write.mode(
            "overwrite"
        ).parquet(docs)
    if not os.path.exists(os.path.join(events, "_SUCCESS")):
        spark.range(10_000_000, numPartitions=64).select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=F.pmod(F.col("id") * 7919, F.lit(31_536_000)))
            ).alias("ts"),
            F.pmod(F.col("id") * 104729, F.lit(100_000)).alias("user_id"),
            F.concat(F.lit("t"), F.pmod("id", F.lit(5)).cast("string")).alias(
                "event_type"
            ),
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 100.0).alias("value"),
            F.lit("{}").alias("props"),
        ).write.mode("overwrite").parquet(events)


def force(make_df) -> float:
    """Time CONSTRUCTION + evaluation with output values forced. The
    callable runs inside the timed region: several queries do eager work at
    construction (localCheckpoint materialization, per-iteration argmax
    collects), and timing only the returned frame would exclude it — that
    bug once published a 0.3 s number for a query whose corpus aggregate
    alone costs 1 s."""
    t0 = time.time()
    df = make_df()
    df.select(F.count_distinct(*[F.col(c) for c in df.columns]).alias("z")).collect()
    return round(time.time() - t0, 2)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark("newops_probe", cores=cores, shuffle_partitions=cores)
    ensure_tables(spark)

    from dataset_crawler_spark.plans import queries as QL

    probes = [
        "tokenizer_bpe_pairs",
        "tokenizer_bpe_vocab",
        "sketch_heavy_hitters",
        "text_lm_kn_ppl",
        "engine_incremental_bm25",
        "sketch_quantile_hist",
        "layout_zorder_stats",
    ]
    qmap = QL.queries()
    print(f"cores={cores} loadavg={os.getloadavg()[0]:.2f}")
    for name in probes:
        fn = qmap[name]
        force(lambda: fn(spark, DIR))  # warm (JIT + shuffle file reuse)
        t = min(force(lambda: fn(spark, DIR)) for _ in range(2))
        n = fn(spark, DIR).count()
        print(f"{name:28s} {t:8.2f}s  rows={n}")


if __name__ == "__main__":
    main()
