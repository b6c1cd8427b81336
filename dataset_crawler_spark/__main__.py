"""CLI entry point — the spark-submit deployment story (north_rule).

Runs end-to-end crawl rounds (schedule → fetch → diff → commit) over the
deterministic synthetic corpus, printing one JSON stats line per round.

Local smoke run::

    python -m dataset_crawler_spark --rounds 2 --n-urls 20000 --n-hosts 50

Cluster run (the engine is a plain package — zip it and submit; the
SparkSession then comes from spark-submit's master, not local[N])::

    zip -r dataset_crawler_spark.zip dataset_crawler_spark
    spark-submit --py-files dataset_crawler_spark.zip \
        --master yarn --num-executors 400 \
        crawl_main.py --rounds 10 --store hdfs://.../crawl_store

The simulated fetcher stands in for the HTTP stage (this sandbox has no
network); swap ``fetch_fn`` for a ``mapInPandas`` HTTP fetcher with the same
(doc_id, spans, status, message) contract in production.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dataset_crawler_spark")
    p.add_argument("--store", default=None, help="snapshot store root (default: temp dir)")
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--n-urls", type=int, default=20_000)
    p.add_argument("--n-hosts", type=int, default=50)
    p.add_argument("--mode", choices=["discover", "full"], default="discover")
    p.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom")
    p.add_argument("--cores", default=None, help="local[N] cores (ignored under spark-submit)")
    p.add_argument("--probe-endpoints", action="store_true",
                   help="run the availability probe stage before each round")
    args = p.parse_args(argv)

    from dataset_crawler_spark import datagen
    from dataset_crawler_spark.operators import seen as SN
    from dataset_crawler_spark.session import get_spark
    from dataset_crawler_spark.sources import probe as PR
    from dataset_crawler_spark.streaming.rounds import CrawlEngine, simulated_fetcher

    spark = get_spark("crawl_cli", cores=args.cores)
    store = args.store or tempfile.mkdtemp(prefix="crawl_store_")
    eng = CrawlEngine(spark, store)
    n_docs = max(args.n_urls // 4, 100)
    frontier = datagen.frontier(spark, args.n_urls, n_hosts=args.n_hosts)
    hosts = datagen.hosts(spark, args.n_hosts)
    params = SN.BloomParams.for_capacity(args.n_urls, fp_rate=0.01, n_shards=32)

    for rnd in range(args.rounds):
        extra_ops = None
        round_hosts = hosts
        if args.probe_endpoints:
            round_hosts = PR.probe_hosts(hosts)
            extra_ops = PR.probe_ops_rows(round_hosts, rnd)
        stats = eng.crawl_round(
            frontier,
            round_hosts,
            simulated_fetcher(datagen.documents_for_round(spark, n_docs, rnd,
                                                          n_hosts=args.n_hosts)),
            rnd,
            bloom_params=params,
            mode=args.mode,
            seen_filter=args.seen_filter,
            extra_ops=extra_ops,
        )
        print(json.dumps({"round": rnd, "store": store, **stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
