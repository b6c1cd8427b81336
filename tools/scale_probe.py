"""Operator-shape A/B probe at real volume (the "measure, don't guess" tool).

Generates a 1M-document synthetic corpus (38M shingles) once under /tmp and
times competing physical formulations of the text/dedup operators at a given
parallelism, forcing ACTUAL value computation (``count_distinct`` over the
output columns — a bare ``.count()`` lets Catalyst column-prune the work
away and times nothing, which is exactly the trap that produced a retracted
measurement in BENCH/BASELINE.md).

Findings encoded in the shipped operators (see BENCH/BASELINE.md):
higher-order array folds are interpreted expressions, explode+aggregate is
codegen with map-side combine, and which wins is operator-specific — so the
choice is re-measurable here whenever Spark's expression engine changes.

Usage: python tools/scale_probe.py [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataset_crawler_spark.functions.hashing import h60  # noqa: E402
from dataset_crawler_spark.session import get_spark  # noqa: E402

CORPUS = "/tmp/spark_graft_bench/docs1m"


def ensure_corpus(spark) -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 47 + j), F.lit(5000)).cast("string")
        ),
    )
    spark.range(1_000_000, numPartitions=64).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    ).write.mode("overwrite").parquet(CORPUS)


def force(q, cols):
    """Time one evaluation with the output VALUES forced (not prunable)."""
    agg = q.select(F.count_distinct(*[F.col(c) for c in cols]).alias("z"))
    t0 = time.time()
    agg.collect()
    return round(time.time() - t0, 1)


def variants(d):
    """(label, dataframe, forced-cols) triples — both formulations per op."""
    toks = F.col("t")
    cnt = F.greatest(F.size("t") - 2, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    dist = F.array_distinct(grams)
    hashes = F.transform(dist, lambda s: h60(s))
    sh = d.select("doc_id", F.explode(dist).alias("s"))

    fp_narrow = d.select(
        "doc_id",
        F.array_min(hashes).alias("mn"),
        F.aggregate(hashes, F.lit(0).cast("long"), lambda a, h: a.bitwiseXOR(h)).alias("xr"),
    )
    fp_explode = sh.groupBy("doc_id").agg(
        F.min(h60(F.col("s"))).alias("mn"),
        F.expr("bit_xor(cast(conv(substr(md5(s),1,15),16,10) as bigint))").alias("xr"),
    )

    run_acc = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best, F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    rep_narrow = d.select(
        "doc_id",
        ((F.lit(1.0) - F.size(dist) / F.size(grams)) + run_acc / F.size("t")).alias("v"),
    )
    tg = d.select("doc_id", F.explode(grams).alias("s")).groupBy("doc_id").agg(
        F.count("*").alias("total"), F.countDistinct("s").alias("dst")
    )
    tt = (
        d.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("shr"))
    )
    rep_explode = tg.join(tt, "doc_id").select(
        "doc_id",
        ((F.lit(1.0) - F.col("dst") / F.col("total")) + F.col("shr")).alias("v"),
    )

    return [
        ("fingerprint/narrow-fold", fp_narrow, ["mn", "xr"]),
        ("fingerprint/explode-agg", fp_explode, ["mn", "xr"]),
        ("repetition/narrow-fold", rep_narrow, ["v"]),
        ("repetition/explode-agg", rep_explode, ["v"]),
    ]


def main() -> None:
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    spark = get_spark("scale_probe", cores=cores, shuffle_partitions=2 * int(cores))
    ensure_corpus(spark)
    d = spark.read.parquet(CORPUS).select("doc_id", F.split("text", " ").alias("t"))
    for label, q, cols in variants(d):
        force(q.limit(1000), cols)  # warm
        print(f"local[{cores}] {label}: {force(q, cols)} s", flush=True)


if __name__ == "__main__":
    main()
