"""Full crawl lifecycle: schedule → fetch → diff → commit (CrawlEngine.crawl_round).

Discover mode = 10^10-frontier growth regime (seen-filtered, partial diff);
full mode = the reference's per-round re-crawl semantics (§3.1), checked
against the pure-Python crawler oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_crawler_spark import datagen
from dataset_crawler_spark.operators import seen as SN
from dataset_crawler_spark.oracle.crawler_oracle import CrawlerOracle
from dataset_crawler_spark.streaming.rounds import CrawlEngine, simulated_fetcher

N_DOCS = 300
N_HOSTS = 15

FRONTIER_SCHEMA = (
    "url string, host string, priority double, discovered_crawl_id int, "
    "seed_rank int, state string"
)


def _frontier(spark):
    rows = datagen.frontier_py(N_DOCS, n_hosts=N_HOSTS)
    return spark.createDataFrame(
        [
            (r["url"], r["host"], r["priority"], r["discovered_crawl_id"], r["seed_rank"], r["state"])
            for r in rows
        ],
        FRONTIER_SCHEMA,
    )


def _open_hosts(spark):
    """All hosts available, no robots blocks, budget far above N_DOCS."""
    rows = [(f"host{i:04d}.example.org", 100, 10_000, [], True) for i in range(N_HOSTS)]
    return spark.createDataFrame(
        rows,
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean",
    )


def _corpus(spark, rnd):
    return datagen.documents_for_round_local(spark, N_DOCS, rnd, n_hosts=N_HOSTS)


def test_discover_mode_never_refetches(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    frontier = _frontier(spark)
    hosts = _open_hosts(spark)
    params = SN.BloomParams.for_capacity(N_DOCS, fp_rate=0.01, n_shards=8)

    s0 = eng.crawl_round(frontier, hosts, simulated_fetcher(_corpus(spark, 0)), 0,
                         bloom_params=params, mode="discover")
    assert s0["fetched"] > 0
    assert s0["added"] == s0["fetched"]  # discovery only ever adds
    assert s0["updated"] == 0 and s0["deleted"] == 0

    fetched0 = {r.url_c for r in eng.store.read("fetched", as_of=0).collect()}
    assert len(fetched0) == s0["fetched"]

    s1 = eng.crawl_round(frontier, hosts, simulated_fetcher(_corpus(spark, 1)), 1,
                         bloom_params=params, mode="discover")
    fetched1 = {r.url_c for r in eng.store.read("fetched", as_of=1).collect()} - fetched0
    # the seen filter (incremental bloom + exact table) must block refetches
    assert not (fetched0 & fetched1)
    assert s1["added"] == s1["fetched"]
    assert s1["deleted"] == 0

    # visible state = every fetched doc, with the content of the round that
    # fetched it (doc fetched in r0 keeps its r0 spans — never refetched)
    want = {}
    for rnd, fetched in ((0, fetched0), (1, fetched1)):
        content = dict(datagen.documents_for_round_py(N_DOCS, rnd, n_hosts=N_HOSTS))
        for u in fetched:
            want[u] = [tuple(s) for s in content[u]]
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in eng.visible_docs().collect()
    }
    assert got == want


def _live_frontier(spark, rnd):
    """Full re-crawl frontier = the round's live URI list (the reference
    fetches every URI the endpoint reports live, DataCrawler.java:235-258);
    doc_id IS the canonical URL in the fixtures."""
    rows = datagen.documents_for_round_py(N_DOCS, rnd, n_hosts=N_HOSTS)
    return spark.createDataFrame(
        [(u, u.split("/")[2], 0.5, rnd, 0, "pending") for u, _ in rows],
        FRONTIER_SCHEMA,
    )


def test_full_mode_matches_reference_oracle(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    hosts = _open_hosts(spark)
    oracle = CrawlerOracle()

    for rnd in (0, 1, 2):
        stats = eng.crawl_round(
            _live_frontier(spark, rnd), hosts, simulated_fetcher(_corpus(spark, rnd)),
            rnd, mode="full"
        )
        want = oracle.run_round(
            dict(datagen.documents_for_round_py(N_DOCS, rnd, n_hosts=N_HOSTS)), rnd
        )
        by_op = {"added": 0, "updated": 0, "deleted": 0}
        for _, (op, _ops) in want.items():
            by_op[op] += 1
        assert {k: stats[k] for k in by_op} == by_op, f"round {rnd}"

    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in eng.visible_docs().collect()
    }
    assert got == oracle.visible_docs()


def test_cuckoo_resurrection_refetches_tombstoned(spark, tmp_path):
    """North_star resurrect mode: deleted docs are cuckoo_delete'd from the
    seen state, so when they reappear in the frontier they get re-fetched and
    re-added — while alive already-fetched docs stay blocked."""
    eng = CrawlEngine(spark, str(tmp_path / "store"), resurrect=True)
    hosts = _open_hosts(spark)
    params = SN.BloomParams.for_capacity(N_DOCS, fp_rate=0.01, n_shards=4)

    # rounds 0 and 1 in FULL mode (reference re-crawl): round 1 deletes the
    # m∈[8,16) docs and the m∈[16,18) tombstone-resurrect docs
    for rnd in (0, 1):
        eng.crawl_round(
            _live_frontier(spark, rnd), hosts, simulated_fetcher(_corpus(spark, rnd)),
            rnd, bloom_params=params, mode="full", seen_filter="cuckoo",
        )
    deleted_r1 = {
        r.doc_id
        for r in eng.store.read("lineage", as_of=1)
        .where("crawl_id = 1 AND op = 'deleted'")
        .collect()
    }
    assert deleted_r1, "fixture must delete docs in round 1"

    # round 2 DISCOVER over the full URL universe: everything alive is seen;
    # only the resurrected docs (present again in corpus r2) must re-fetch
    corpus2 = _corpus(spark, 2)
    s2 = eng.crawl_round(
        _frontier(spark), hosts, simulated_fetcher(corpus2), 2,
        bloom_params=params, mode="discover", seen_filter="cuckoo",
    )
    fetched2 = {
        r.url_c
        for r in eng.store.read("fetched", as_of=2).where("crawl_id = 2").collect()
    }
    corpus2_ids = {r.doc_id for r in corpus2.select("doc_id").collect()}
    resurrected = deleted_r1 & corpus2_ids
    assert resurrected, "fixture must resurrect tombstoned docs in round 2"
    # every resurrected doc whose frontier row canonicalizes to the clean URL
    # gets refetched (the d==5 dirty variant keeps its sorted query string and
    # is a different canonical URL, so it can't hit the corpus doc_id)
    from dataset_crawler_spark.functions.hashing import h60_py

    reachable = {
        u for u in resurrected if h60_py(f"d|{int(u.rsplit('/', 1)[1])}") % 6 != 5
    }
    assert reachable and reachable <= fetched2
    # nothing alive-and-already-fetched is refetched
    alive_fetched = {
        r.url_c for r in eng.store.read("fetched", as_of=1).collect()
    } - deleted_r1
    assert not (fetched2 & alive_fetched)
    assert s2["added"] == s2["fetched"]  # resurrections come back as added


def test_politeness_budget_enforced_in_lifecycle(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    frontier = _frontier(spark)
    # tight budget: 3 fetches per host per round
    rows = [(f"host{i:04d}.example.org", 100, 3, [], True) for i in range(N_HOSTS)]
    hosts = spark.createDataFrame(
        rows,
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean",
    )
    s0 = eng.crawl_round(frontier, hosts, simulated_fetcher(_corpus(spark, 0)), 0,
                         mode="discover")
    assert s0["scheduled"] <= 3 * N_HOSTS
    per_host = (
        eng.store.read("fetched", as_of=0)
        .groupBy(F.regexp_extract("url_c", r"https://([^/]+)/", 1).alias("h"))
        .count()
    )
    assert per_host.where(F.col("count") > 3).count() == 0
