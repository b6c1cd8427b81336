"""Physical-plan contracts as tests.

BENCH/PLANS.md *records* the plan shapes; these tests *enforce* the
load-bearing ones, so a refactor that silently de-optimizes a 100-TB plan
(a broadcast that becomes a sort-merge join, a Python stage sneaking into a
relational pipeline, a single-partition funnel) fails CI instead of only
showing up in the next bench read. Checked on the AQE-final executed plan
at sf0.001 — plan shape, not timing, so fixture scale is enough.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

PY_STAGES = r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"


def _plan(df) -> str:
    df.count()  # force, so AQE finalizes
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_dims_broadcast_no_smj(spark):
    from dataset_crawler_spark.plans.queries import q5_local_supplier_volume

    plan = _plan(q5_local_supplier_volume(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert re.search(PY_STAGES, plan) is None


def test_sample_stratified_is_narrow(spark):
    from dataset_crawler_spark.plans.queries import sample_stratified

    plan = _plan(sample_stratified(spark, SF_DIR))
    assert "Exchange" not in plan  # pure scan+filter+project
    assert re.search(PY_STAGES, plan) is None


def test_langid_is_narrow(spark):
    from dataset_crawler_spark.plans.queries import text_langid

    plan = _plan(text_langid(spark, SF_DIR))
    assert "Exchange" not in plan  # higher-order array filter, no explode
    assert re.search(PY_STAGES, plan) is None


def test_per_doc_text_analytics_plan_shapes(spark):
    """Measured per-operator physical choices (BENCH/BASELINE.md, 1M-doc
    comparison): repetition/langid/quality/token-counts are narrow array
    computations (zero exchanges); fingerprint and simhash keep the
    codegen'd explode + partial aggregate (exactly ONE exchange — the
    interpreted array-fold rewrite measured 2-8× slower). Python stages:
    none anywhere."""
    from dataset_crawler_spark.plans.queries import (
        dedup_simhash16,
        text_fingerprint,
        text_quality_score,
        text_repetition_filter,
        text_token_count,
    )

    for q in (text_repetition_filter, text_quality_score, text_token_count):
        plan = _plan(q(spark, SF_DIR))
        assert "Exchange" not in plan, q.__name__
        assert re.search(PY_STAGES, plan) is None, q.__name__
    for q in (text_fingerprint, dedup_simhash16):
        plan = _plan(q(spark, SF_DIR))
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, q.__name__
        assert re.search(PY_STAGES, plan) is None, q.__name__


def test_relational_pipelines_have_no_python_stages(spark):
    from dataset_crawler_spark.plans.queries import (
        decontaminate_ngram,
        dedup_minhash_lsh,
        pipeline_training_corpus,
        text_repetition_filter,
    )

    for q in (dedup_minhash_lsh, decontaminate_ngram, text_repetition_filter,
              pipeline_training_corpus):
        plan = _plan(q(spark, SF_DIR))
        assert re.search(PY_STAGES, plan) is None, q.__name__
        assert "Exchange SinglePartition" not in plan, q.__name__


def test_decontaminate_broadcasts_eval_shingles(spark):
    from dataset_crawler_spark.plans.queries import decontaminate_ngram

    plan = _plan(decontaminate_ngram(spark, SF_DIR))
    # train-side shingles must hit a broadcast join, never a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_asof_join_is_single_exchange_no_join(spark):
    from dataset_crawler_spark.operators.temporal import asof_join

    left = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("ts"), F.col("id").alias("p")
    )
    right = spark.range(100).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 9).alias("ts"), F.col("id").alias("v")
    )
    plan = _plan(asof_join(left, right, by=["k"]))
    # merge-by-key shape: ONE shuffle (the window), ZERO join operators
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ivf_centroids_no_global_window(spark):
    from dataset_crawler_spark.operators.similarity import ivf_centroids

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    plan = _plan(ivf_centroids(e, 4))
    # distributed TakeOrdered, then only the ≤n_centroids re-index may funnel
    assert "TakeOrderedAndProject" in plan


def test_pii_scrub_is_narrow(spark):
    from dataset_crawler_spark.plans.queries import text_pii_scrub

    plan = _plan(text_pii_scrub(spark, SF_DIR))
    assert "Exchange" not in plan  # regex chain fuses into the scan
    assert re.search(PY_STAGES, plan) is None


def test_dsir_bucket_stats_broadcast(spark):
    from dataset_crawler_spark.plans.queries import dsir_importance_weights

    plan = _plan(dsir_importance_weights(spark, SF_DIR))
    # ≤256-row bucket table must broadcast; the token stream never sort-merges
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_chunk_dedup_and_trap_detector_stay_distributed(spark):
    from dataset_crawler_spark.plans.queries import (
        crawl_trap_hosts,
        dedup_chunk_passages,
    )

    for q in (dedup_chunk_passages, crawl_trap_hosts):
        plan = _plan(q(spark, SF_DIR))
        assert re.search(PY_STAGES, plan) is None, q.__name__
        assert "Exchange SinglePartition" not in plan, q.__name__


def test_round2_tail_ops_plan_shapes(spark):
    """Round-2 tail operators keep their designed physical shapes: BM25 and
    weighted sampling select top-k via TakeOrderedAndProject (per-partition
    heaps — never a global sort of the corpus) with at most the one scalar
    stats funnel; the LM filter and CMS probe their bounded model tables via
    broadcast joins; span dedup and mirror detection stay equi-join-only
    (no nested-loop pair blowup). Python stages: none anywhere."""
    from dataset_crawler_spark.plans.queries import (
        crawl_mirror_hosts,
        dedup_span_c4,
        sample_weighted_take,
        search_bm25_topk,
        sketch_countmin_topk,
        text_lm_bigram_ppl,
    )

    p = _plan(search_bm25_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert p.count("Exchange SinglePartition") <= 1  # the 1-row stats agg only
    assert re.search(PY_STAGES, p) is None

    p = _plan(sample_weighted_take(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "Exchange SinglePartition" not in p  # scoring is fully narrow
    assert re.search(PY_STAGES, p) is None

    p = _plan(text_lm_bigram_ppl(spark, SF_DIR))
    assert p.count("BroadcastHashJoin") >= 2  # both model tables broadcast
    assert "SortMergeJoin" not in p
    assert re.search(PY_STAGES, p) is None

    p = _plan(sketch_countmin_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert p.count("BroadcastHashJoin") >= 1  # CMS probe against broadcast sketch
    assert re.search(PY_STAGES, p) is None

    for fn in (dedup_span_c4, crawl_mirror_hosts):
        p = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in p
        assert re.search(PY_STAGES, p) is None


def test_quality_classifier_weights_broadcast(spark):
    from dataset_crawler_spark.plans.queries import text_classifier_quality

    plan = _plan(text_classifier_quality(spark, SF_DIR))
    # ≤512-row weight table + 1-row prior must broadcast; the gram stream
    # never sort-merges and nothing drops into a Python stage
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_change_rate_single_aggregate_no_join(spark):
    from dataset_crawler_spark.plans.queries import crawl_change_rate

    plan = _plan(crawl_change_rate(spark, SF_DIR))
    # explode → ONE doc_id hash aggregate → scalar math: exactly one
    # exchange, no join, nothing Python
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_dust_rules_fp_keyed_never_cartesian(spark):
    from dataset_crawler_spark.plans.queries import crawl_dust_rules

    plan = _plan(crawl_dust_rules(spark, SF_DIR))
    # pair generation joins on fingerprint only (group-size-capped) — a
    # cartesian/nested-loop pair blowup must never appear, and the LCP/LCS
    # scan stays in codegen (no Python stage)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_html_extract_is_narrow(spark):
    from dataset_crawler_spark.plans.queries import text_html_extract

    plan = _plan(text_html_extract(spark, SF_DIR))
    # the regexp_replace chain must fuse into the scan: zero exchanges,
    # nothing Python
    assert "Exchange" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_hll_sketch_plan_is_bounded_aggregates(spark):
    """The HLL distinct sketch must stay a pair of hash aggregates over the
    scan (registers, then per-group fold) joined to the exact twin — no
    sort-merge join, no Python stage, and the register aggregate must
    partial-aggregate map-side (HashAggregate appears above AND below its
    exchange) so at most 2^p rows per group ever shuffle."""
    from dataset_crawler_spark.plans.queries import sketch_hll_distinct

    p = _plan(sketch_hll_distinct(spark, SF_DIR))
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None
    assert p.count("HashAggregate") >= 4  # partial+final for registers & fold


def test_triangle_wedge_join_is_equi_join_only(spark):
    """The wedge step must be an EQUI-join on the shared root `lo` (with the
    orientation order as a residual predicate), never a cartesian pair
    blowup — if `lo` falls out of the join keys the plan goes quadratic at
    scale. The only nested-loop joins allowed are the suite's sanctioned
    crossJoin(broadcast(<1-row aggregate>)) scalar attachments. No Python
    stages; all-integer pipeline."""
    from dataset_crawler_spark.plans.queries import graph_doc_triangles

    p = _plan(graph_doc_triangles(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(r"(BroadcastHash|ShuffledHash|SortMerge)Join \[lo#", p)
    assert re.search(PY_STAGES, p) is None


def test_registered_domain_is_joinless_narrow(spark):
    """PSL longest-match must stay a narrow higher-order expression — no
    join against a suffix table, no explode of label-suffix candidates, no
    Python stage; the only exchanges belong to the final per-domain
    distinct-count aggregate."""
    from dataset_crawler_spark.plans.queries import crawl_registered_domain

    p = _plan(crawl_registered_domain(spark, SF_DIR))
    assert "Join" not in p
    assert "Generate" not in p  # no explode
    assert re.search(PY_STAGES, p) is None


def test_hyperball_rounds_are_equi_joins_no_python(spark):
    """Each HyperBall round must be an EQUI-join (edges ⋈ registers on the
    node key) + hash aggregate — never a cartesian register blowup — and the
    whole pipeline stays JVM-side (pure integer/hash expressions). The only
    nested-loop join allowed is the sanctioned crossJoin(broadcast(<1-row
    aggregate>)) that attaches n_docs to the link generator."""
    from dataset_crawler_spark.plans.queries import graph_doc_harmonic

    p = _plan(graph_doc_harmonic(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None
    # the per-round register MAX-merges sit behind the loop's lineage cuts
    # (non-eager localCheckpoint), so the FINAL plan shows the per-round
    # estimate aggregates keyed on node — one per snapshot — plus the pivot
    assert len(re.findall(r"HashAggregate\(keys=\[node#", p)) >= 6


def test_kcore_peel_is_aggregate_plus_semi_joins(spark):
    """Every k-core peel round = degree aggregate + two LeftSemi joins;
    integer-only, no Python, no cartesian."""
    from dataset_crawler_spark.plans.queries import graph_doc_kcore

    p = _plan(graph_doc_kcore(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None
    # the peel rounds sit behind per-round lineage cuts; the final plan is
    # the core-degree aggregate over the checkpointed survivor edges
    assert re.search(r"HashAggregate\(keys=\[src#", p)

    # the per-round shape (degree agg + HAVING + two LeftSemi membership
    # joins) IS visible on an uncheckpointed single round built from the
    # same algebra the operator runs
    from pyspark.sql import functions as F2

    e = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a != b],
        "src long, dst long",
    )
    keep = e.groupBy("src").agg(F2.count("*").alias("deg")).where(
        F2.col("deg") >= 3
    ).select("src")
    one_round = e.join(keep, "src", "left_semi").join(
        keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
    )
    rp = _plan(one_round)
    assert rp.count("LeftSemi") == 2
    assert "CartesianProduct" not in rp


def test_cocitation_pair_join_keyed_on_citer(spark):
    """The co-citation self-join must be keyed on the shared citing page
    (equi-join on s) with the a<b orientation as a residual — if the key
    falls out the pair step goes quadratic in the corpus, not in the
    per-page out-degree."""
    from dataset_crawler_spark.plans.queries import graph_doc_cocitation

    p = _plan(graph_doc_cocitation(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(r"(BroadcastHash|ShuffledHash|SortMerge)Join \[s#", p)
    assert re.search(PY_STAGES, p) is None


def test_cdx_index_is_one_hash_aggregate_no_join(spark):
    """The CDX rollup: bounded capture generator (explode) + SURT narrow
    projection + ONE surt-keyed aggregate chain — no join anywhere, no
    Python stage. (COUNT(DISTINCT digest) legitimately expands to the
    two-level aggregate.)"""
    from dataset_crawler_spark.plans.queries import crawl_cdx_index

    p = _plan(crawl_cdx_index(spark, SF_DIR))
    assert "Join" not in p
    assert re.search(PY_STAGES, p) is None
    assert re.search(r"HashAggregate.*keys=\[surt#", p)


def test_redirect_resolution_rounds_are_equi_joins(spark):
    """Each pointer-doubling round must be ONE equi-join on the pointer key
    (a.next = b.node) with the done-flag as a residual — never a cartesian
    — and the whole resolution stays JVM-side integer algebra. The final
    plan sits behind per-round lineage cuts; the round shape is checked on
    an uncheckpointed single round built from the same algebra."""
    from dataset_crawler_spark.plans.queries import crawl_redirect_resolve

    p = _plan(crawl_redirect_resolve(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None

    state = spark.createDataFrame(
        [(0, 1, 1, False), (1, 2, 1, False), (2, 9, 1, True)],
        "node long, next long, dist long, done boolean",
    )
    a, b = state.alias("a"), state.alias("b")
    one = a.join(
        b, (~F.col("a.done")) & (F.col("a.next") == F.col("b.node")), "left"
    ).select(F.col("a.node"))
    rp = _plan(one)
    assert "CartesianProduct" not in rp
    assert re.search(r"(BroadcastHash|ShuffledHash|SortMerge)Join \[next#", rp)


def test_bfs_round_is_join_distinct_anti_join(spark):
    """Each BFS frontier round = frontier⋈edges equi-join + distinct +
    LeftAnti against the settled set — all keyed on the node id, no
    cartesian, no Python; the registered query's final plan is the settled
    union behind per-round lineage cuts."""
    from dataset_crawler_spark.plans.queries import graph_doc_bfs_depth

    p = _plan(graph_doc_bfs_depth(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    f0 = spark.createDataFrame([(0,)], "node long")
    s0 = spark.createDataFrame([(0, 0)], "node long, depth long")
    one = (
        f0.join(e, f0["node"] == e["src"])
        .select(F.col("dst").alias("node"))
        .distinct()
        .join(s0.select("node"), "node", "left_anti")
    )
    rp = _plan(one)
    assert "CartesianProduct" not in rp
    assert rp.count("LeftAnti") == 1


def test_lpa_round_is_equi_join_plus_two_aggregates(spark):
    """Every label-propagation round = one equi-join of edges with labels +
    one (node, community) count aggregate + one struct-min arg-max — no
    window function (a global window would single-partition the vote), no
    Python stage, no cartesian. The final plan sits behind per-round
    lineage cuts, so the round shape is checked on an uncheckpointed
    single round built from the operator's own algebra."""
    from dataset_crawler_spark.plans.queries import graph_doc_communities

    p = _plan(graph_doc_communities(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None
    assert "Window" not in p

    e = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a != b],
        "src long, dst long",
    )
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    votes = (
        e.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"), "community")
        .agg(F.count("*").alias("cnt"))
    )
    best = votes.groupBy("node").agg(
        F.min(F.struct((-F.col("cnt")).alias("_nc"), F.col("community").alias("_l")))
    )
    rp = _plan(best)
    assert "Window" not in rp
    assert "CartesianProduct" not in rp
    assert re.search(PY_STAGES, rp) is None


def test_containment_rides_the_capped_shingle_join(spark):
    """dedup_containment must keep dedup_ngram_jaccard's scale guards: the
    hot-shingle cap applied as a broadcast anti-join BEFORE the pair
    self-join, the pair join keyed on the shingle (never cartesian), and
    no Python stage anywhere."""
    from dataset_crawler_spark.plans.queries import dedup_containment

    p = _plan(dedup_containment(spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert re.search(PY_STAGES, p) is None
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_bpe_pairs_topk_no_global_sort(spark):
    """tokenizer_bpe_pairs: the corpus-sized stage is the word-count
    aggregate; the pair explode runs over the DISTINCT-word table and the
    top-N is a TakeOrderedAndProject heap merge, never a global Sort.
    Python stages: none."""
    import re

    from dataset_crawler_spark.plans.queries import tokenizer_bpe_pairs

    plan = _plan(tokenizer_bpe_pairs(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert re.search(PY_STAGES, plan) is None


def test_heavy_hitters_recount_joins_broadcast_candidates(spark):
    """sketch_heavy_hitters: the Misra-Gries prune (the only Python stage)
    runs ONCE inside the materialized summary — the FINAL plan contains no
    Python stage and scans the corpus exactly once (the recount), joining
    it against BROADCAST candidates — the full vocabulary never shuffles."""
    import re

    from dataset_crawler_spark.plans.queries import sketch_heavy_hitters

    plan = _plan(sketch_heavy_hitters(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(PY_STAGES, plan) is None  # MG pass already materialized
    assert plan.count("FileScan parquet") == 1  # only the recount scan


def test_zorder_stats_single_bounded_aggregate(spark):
    """layout_zorder_stats: zkey is a narrow bit-arithmetic projection; the
    audit is one hash aggregate over a ≤1024-key block space — exactly one
    exchange (partial → final), no join, no Python."""
    import re

    from dataset_crawler_spark.plans.queries import layout_zorder_stats

    plan = _plan(layout_zorder_stats(spark, SF_DIR))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_kn_ppl_model_sides_broadcast(spark):
    """text_lm_kn_ppl: the context/word model tables are bucket-bounded and
    must BROADCAST onto the bigram stream (≥ 2 broadcast joins + the scalar
    type count); only the (p, c)-keyed bigram-count join may shuffle, and
    document text appears in no exchange. Python stages: none."""
    import re

    from dataset_crawler_spark.plans.queries import text_lm_kn_ppl

    plan = _plan(text_lm_kn_ppl(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert re.search(PY_STAGES, plan) is None
    # the bounded (p, c) count table is materialized once; the final plan
    # must scan the corpus exactly ONCE (the scoring stream) — a regression
    # here means a model-table consumer is re-running the corpus explode
    assert plan.count("FileScan parquet") == 1


def test_quantile_hist_no_global_sort_no_python(spark):
    """sketch_quantile_hist: bin counting is bounded hash aggregation and
    the only sorts are per-group scans over the ≤4096-row bin table — the
    full value stream is never globally sorted; model/range sides ride
    broadcast joins."""
    import re

    from dataset_crawler_spark.plans.queries import sketch_quantile_hist

    plan = _plan(sketch_quantile_hist(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_incremental_bm25_scoring_is_narrow_broadcast(spark):
    """engine_incremental_bm25: index maintenance collapses to scalar
    aggregates; scoring is the zero-shuffle narrow projection with the
    standing stats broadcast and a TakeOrdered top-k — no token explode,
    no SMJ, no Python."""
    import re

    from dataset_crawler_spark.plans.queries import engine_incremental_bm25

    plan = _plan(engine_incremental_bm25(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" not in plan  # no explode of the token stream
    assert re.search(PY_STAGES, plan) is None


def test_focused_priority_no_collect_no_python(spark):
    """crawl_focused_priority: relevance is a higher-order array filter (no
    token explode/Generate beyond the 3-link expansion), the inheritance
    join is equi-keyed, and nothing runs in Python."""
    import re

    from dataset_crawler_spark.plans.queries import crawl_focused_priority

    plan = _plan(crawl_focused_priority(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_posting_lists_window_inside_term_partition(spark):
    """search_posting_lists: the posting-head cap is a row_number window
    partitioned BY TERM (one Sort per term partition after the pair
    shuffle) — never a global single-partition sort; no Python stages."""
    import re

    from dataset_crawler_spark.plans.queries import search_posting_lists

    plan = _plan(search_posting_lists(spark, SF_DIR))
    assert "Window" in plan
    # a window without partition keys funnels everything into ONE partition
    assert "SinglePartition" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_simhash_hamming_block_join_no_cartesian(spark):
    """dedup_simhash_hamming: candidates come from the (block_id, value)
    equi-join — no cartesian/nested-loop pair stage may exist, and the
    whole pipeline stays JVM-side."""
    import re

    from dataset_crawler_spark.plans.queries import dedup_simhash_hamming

    plan = _plan(dedup_simhash_hamming(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_bowtie_bfs_rounds_no_python_no_cartesian(spark):
    """graph_doc_bowtie: both reachability directions are frontier-delta
    equi-join rounds and the classification is left-join flags — no
    cartesian stage, no Python, and the region-size side rides broadcast."""
    import re

    from dataset_crawler_spark.plans.queries import graph_doc_bowtie

    plan = _plan(graph_doc_bowtie(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_incremental_quantile_bounded_aggregates(spark):
    """engine_incremental_quantile: the per-round updates are bounded hash
    aggregates merged by union (no Expand, no global sort); range/total
    sides broadcast; no Python."""
    import re

    from dataset_crawler_spark.plans.queries import engine_incremental_quantile

    plan = _plan(engine_incremental_quantile(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Expand" not in plan
    assert re.search(PY_STAGES, plan) is None


def test_eager_construction_contract_documented(spark):
    """Registry contract (ADVICE r4 #2): entries construct lazily — except
    the five documented eager ones, whose docstrings must carry the
    "EAGER AT CONSTRUCTION" banner so callers/benchmarks don't mistime or
    double-run them. Lazy alternatives for the checkpoint trio were tried
    and rejected: persist() lets concurrent broadcast futures double-run
    the corpus pass, and localCheckpoint(eager=False) still materializes
    the shuffle-map stage at construction under AQE's toRdd."""
    from dataset_crawler_spark.plans import queries as QL

    eager = (
        "tokenizer_bpe_vocab",
        "crawl_seed_maxcover",
        "sketch_heavy_hitters",
        "text_lm_bigram_ppl",
        "text_lm_kn_ppl",
    )
    for name in eager:
        fn = QL.queries()[name].__wrapped__ if hasattr(
            QL.queries()[name], "__wrapped__") else QL.queries()[name]
        assert "EAGER AT CONSTRUCTION" in (fn.__doc__ or ""), name
    # and nothing else claims the banner without being on the list
    for name, fn in QL.queries().items():
        if name not in eager:
            assert "EAGER AT CONSTRUCTION" not in (fn.__doc__ or ""), name
