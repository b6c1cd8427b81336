"""Physical-plan audit: evidence that the headline plans are the plans we
want — filters reach the parquet scan, projections prune columns, hot
expressions stay inside WholeStageCodegen, shuffle counts are the design's
(not an accident's). Writes BENCH/PLANS.md.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataset_crawler_spark.plans import queries as QL  # noqa: E402
from dataset_crawler_spark.session import get_spark  # noqa: E402

AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j2_history_6way",
    "k2_upsert_merge",
    "w1_last_state_fold",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_signlsh",
    "sim_cosine_topk",
    "engine_sim_ivf_topk",
    "crawl_politeness_topk",
    # scale contracts: sample_stratified must be a zero-exchange scan+filter;
    # pack_token_bins exactly one exchange (the shard window)
    "sample_stratified",
    "pack_token_bins",
    # composite: the tail plan after the CC fixpoint (gates/sample/minhash run
    # inside the loop's checkpointed lineage) — final join + window must stay
    # relational with no Python stages
    "pipeline_training_corpus",
    # scale contracts: decontamination must BROADCAST the eval shingle set
    # (never shuffles train text); the as-of join is the union+window merge —
    # exactly one shuffle exchange, zero joins; incremental minhash joins new
    # bands against the index without any Python stage
    "decontaminate_ngram",
    "temporal_asof_join",
    "text_repetition_filter",
    "engine_incremental_minhash",
    # late round-2 ops: chunk dedup shuffles only (doc_id, hash, width) longs;
    # DSIR broadcasts the ≤256-row bucket table; PII scrub is a zero-exchange
    # regex chain; trap detection is one per-host aggregate; outlink degree is
    # narrow explode + one per-URL aggregate
    "dedup_chunk_passages",
    "dsir_importance_weights",
    "text_pii_scrub",
    "crawl_trap_hosts",
    "crawl_outlink_degree",
    "crawl_adaptive_budget",
    # round-2 tail: C4 span dedup shuffles only (h, doc_id, i) longs (text
    # stays with its scan-side row); BM25 scoring is zero-shuffle (scalar
    # stats broadcast + TakeOrdered top-k); mirror detection joins on
    # fingerprint with the doc-frequency cap bounding per-key pair blowup
    "dedup_span_c4",
    "search_bm25_topk",
    "crawl_mirror_hosts",
    # LM filter: both model tables bounded by bucket constants → broadcast
    # joins over the bigram stream; text never shuffles
    "text_lm_bigram_ppl",
    # weighted sample: narrow scoring + TakeOrdered; CMS: bounded map-side
    # sketch aggregate + broadcast probe
    "sample_weighted_take",
    "sketch_countmin_topk",
    # round-3: pagerank's FINAL iteration join must show the cached
    # pre-partitioned static sides (no exchange on the edge table — only the
    # ranks side and the contribution aggregate move); the rademacher LSH
    # runs its signatures as vectorized Arrow stages (2 per table) with the
    # candidate join relational
    "graph_host_pagerank",
    "crawl_outlink_pagerank",
    "engine_sim_lsh_topk",
    # semantic dedup: the audited signlsh band join + the CC fixpoint's
    # final labeling join — no new shuffle shape beyond those two families
    "dedup_semantic_survivors",
    # incremental embedding index: band hash-joins only (new×index, new×new)
    # — per-round cost ∝ |new|, no corpus-sized side beyond the index scan
    "engine_incremental_signlsh",
    # exact-substring dedup: text must never shuffle — only (h, doc_id, i)
    # longs through the winner agg, join-back, and per-doc island window
    "dedup_substring_exact",
    # removal artifact: same marking pipeline; text moves only through the
    # one doc_id equi-join that attaches the collapsed span arrays
    "dedup_substring_removal",
    # incremental window index: new×index semi-join + new×new winner agg —
    # per-round cost ∝ |new windows|
    "engine_incremental_substr",
    # round-4: change-rate estimation is ONE doc_id hash aggregate (explode
    # → agg → scalar math, no join); DUST mining joins on fingerprint with
    # the group-size cap bounding per-key pairs, LCP/LCS stays in codegen
    "crawl_change_rate",
    "crawl_dust_rules",
    # round-4 tail: the other three centrality signals share pagerank's
    # audited shape (tiny host graph → single-partition loop; 1M-node path
    # covered by tools/graph_scale_probe.py); the budget composition is the
    # pagerank plan + one broadcast-scalar crossJoin + one broadcast dim join
    "graph_host_trustrank",
    "graph_host_hits",
    "crawl_opic_importance",
    "crawl_centrality_budget",
    "graph_spam_mass",
    # corpus must not shuffle: per iteration one broadcast cross join vs k
    # centroids + a (k·dim)-row mean aggregate
    "engine_kmeans_refine",
    # masked per-round update: one fetched-side contribution agg + one left
    # join per step; no full-graph iteration anywhere
    "engine_online_opic",
    # round-4 late tail: LPA rounds are equi-join + two hash aggregates
    # (no Window — a global window would single-partition the vote);
    # modularity adds two integer aggregates + one edge-keyed pair join;
    # containment rides the capped shingle self-join the jaccard gate
    # already pays; CDC chunking is a narrow filter/slice/transform chain
    # (no token shuffle, no window) into ONE hash aggregate
    "graph_doc_communities",
    "engine_incremental_lpa",
    "graph_doc_modularity",
    "dedup_containment",
    "dedup_cdc_chunks",
    # round-4 tail II: BPE pair census explodes char pairs over the
    # DISTINCT-word table only (TakeOrdered top-N, no global sort); heavy
    # hitters' sole Python stage is the Arrow MG prune, recount joins
    # BROADCAST candidates; z-order audit is one bounded hash aggregate
    # (collect_set, no Expand); KN scoring broadcasts both bucket-bounded
    # model sides; histogram quantiles are two bounded aggregates + a
    # ≤4096-row per-group window; incremental BM25 scoring is the same
    # zero-shuffle narrow projection as search_bm25_topk.
    # (tokenizer_bpe_vocab is audited implicitly: its per-iteration pair
    # census IS tokenizer_bpe_pairs' plan over the rewritten word table,
    # and its returned frame is a LocalTableScan of the merge list.)
    "tokenizer_bpe_pairs",
    "sketch_heavy_hitters",
    "layout_zorder_stats",
    "text_lm_kn_ppl",
    "sketch_quantile_hist",
    "engine_incremental_bm25",
    # round-4 tail III: focused priority inherits integer mass over one
    # equi-join; posting lists cap inside term partitions (no global sort);
    # simhash hamming candidates come from the 4 block equi-joins (never
    # cartesian); bowtie is two frontier-delta BFS chains + semi-join
    # flags; incremental quantile merges bounded integer bin counts.
    "crawl_focused_priority",
    "search_posting_lists",
    "dedup_simhash_hamming",
    "graph_doc_bowtie",
    "engine_incremental_quantile",
]

INTERESTING = (
    "PushedFilters",
    "ReadSchema",
)


def _codegen_subtrees(df) -> int:
    """Count WholeStageCodegen subtrees. Must run on a no-AQE plan: with AQE
    the codegen wrapping happens stage-by-stage at runtime and the explain
    reports 0 even though production stages ARE codegen'd."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    return int(m.group(1)) if m else 0


def audit_one(spark, spark_noaqe, name, fn, sf_dir) -> str:
    df = fn(spark, sf_dir)
    df.count()  # force so AQE finalizes
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    counts = {
        "exchanges": len(re.findall(r"Exchange ", plan)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        # single-partition funnels: only acceptable over provably-tiny inputs
        # (e.g. the ≤n_centroids re-index window after a distributed
        # TakeOrdered in ivf_centroids) — never over a corpus-sized stream
        "single_partition_exchanges": len(re.findall(r"Exchange SinglePartition", plan)),
        "wholestage_codegen_spans": _codegen_subtrees(fn(spark_noaqe, sf_dir)),
        "python_arrow_stages": len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", plan)),
    }
    lines = [f"### {name}", "", "| property | value |", "|---|---|"]
    for k, v in counts.items():
        lines.append(f"| {k} | {v} |")
    pushed = sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))
    schemas = sorted(set(re.findall(r"ReadSchema: (struct<[^\n]{0,120})", plan)))
    for p in pushed:
        if p.strip():
            lines.append(f"| pushed filters | `{p.strip()[:110]}` |")
    for s in schemas:
        lines.append(f"| read schema | `{s[:110]}` |")
    lines.append("")
    return "\n".join(lines)


def audit_schedule_pipeline(spark) -> str:
    """The north-path plan: schedule_round over a synthetic frontier with the
    bloom filter AND the bucketed seen table — the layout contract must show
    up as a bucketed scan and the confirm join must add no exchange beyond
    the dedup aggregate's."""
    import tempfile

    from dataset_crawler_spark import datagen
    from dataset_crawler_spark.operators import scheduler as SCH
    from dataset_crawler_spark.operators import seen as SN
    from dataset_crawler_spark.sources.seen_table import BucketedSeenTable
    from pyspark.sql import functions as F

    n_urls, n_hosts = 40_000, 50
    frontier = datagen.frontier(spark, n_urls, n_hosts=n_hosts, partitions=8)
    hosts = datagen.hosts(spark, n_hosts)
    seen = (
        frontier.where(F.xxhash64("url") % 3 == 0)
        .select(SCH.canonicalize_url(F.col("url")).alias("url_c"))
        .distinct()
    )
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loc = tempfile.mkdtemp(prefix="plan_audit_seen_")
    st = BucketedSeenTable(spark, "plan_audit_seen", loc, n_buckets)
    st.append(seen, 0)
    params = SN.BloomParams.for_capacity(n_urls // 3 + 1, fp_rate=0.01, n_shards=8)
    bloom = SN.bloom_build(st.read(), "url_c", params)
    df = SCH.schedule_round(
        frontier, hosts, bloom_state=bloom, bloom_params=params, seen_urls=st.read()
    )
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.sql("DROP TABLE IF EXISTS plan_audit_seen")
    counts = {
        "exchanges": len(re.findall(r"Exchange ", plan)),
        "single_partition_exchanges": len(re.findall(r"Exchange SinglePartition", plan)),
        "sorts": len(re.findall(r"\bSort ", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "bucketed_seen_scan": "Bucketed: true" in plan and "SelectedBucketsCount" in plan,
    }
    lines = [
        "### schedule_round (north path, bloom + bucketed seen)",
        "",
        "Expected shape: exchanges = dedup aggregate + two politeness windows",
        "+ hosts broadcast ONLY; confirm anti-join = ShuffledHashJoin with the",
        "seen side read as a bucketed scan (no exchange, no sort either side).",
        "",
        "| property | value |",
        "|---|---|",
    ]
    for k, v in counts.items():
        lines.append(f"| {k} | {v} |")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit", cores=8, shuffle_partitions=8)
    spark_noaqe = spark.newSession()
    spark_noaqe.conf.set("spark.sql.adaptive.enabled", "false")
    qmap = QL.queries()
    parts = [
        "# Physical-plan audit\n",
        f"Per-query AQE-final plan properties at `{sf_dir}` — what to look for:",
        "filters/pruning at the scan (`pushed filters`, narrow `read schema`),",
        "wide WholeStageCodegen coverage, broadcast joins on dimension tables,",
        "and Python/Arrow stages only where the operator is genuinely",
        "non-relational (bloom/cuckoo/LSH/span-diff).\n",
    ]
    parts.append(audit_schedule_pipeline(spark))
    print("audited schedule_round pipeline", flush=True)
    for name in AUDIT:
        parts.append(audit_one(spark, spark_noaqe, name, qmap[name], sf_dir))
        print(f"audited {name}", flush=True)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as f:
        f.write("\n".join(parts))
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
