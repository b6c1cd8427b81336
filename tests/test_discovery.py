"""Outlink extraction + frontier expansion (operators/discovery.py) and the
engine's crawl-to-closure loop: the discover regime where fetched documents
mint the next round's frontier and the crawl terminates when the reachable
link graph is exhausted."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_crawler_spark.operators import seen as SN
from dataset_crawler_spark.operators.discovery import (
    DISCOVERED_SEED_RANK,
    expand_frontier,
    extract_outlinks,
)
from dataset_crawler_spark.streaming.rounds import CrawlEngine, simulated_fetcher

DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _u(name: str) -> str:
    return f"https://h.example.org/d/{name}"


def _doc(name: str, links: list[str], text: str | None = None):
    spans = [("link", None, _u(t), i) for i, t in enumerate(links)]
    spans.append(("text", text or f"body of {name}", None, len(spans)))
    return (_u(name), spans)


def test_extract_outlinks_link_and_text_paths(spark):
    docs = spark.createDataFrame(
        [
            _doc("a", ["b", "c"]),
            _doc("d", [], text="visit https://x.example.org/p/1 or https://y.example.org/ soon"),
        ],
        DOCS_SCHEMA,
    )
    got = {(r.parent_doc_id, r.url) for r in extract_outlinks(docs).collect()}
    assert got == {
        (_u("a"), _u("b")),
        (_u("a"), _u("c")),
        (_u("d"), "https://x.example.org/p/1"),
        (_u("d"), "https://y.example.org/"),
    }


def test_expand_frontier_indegree_priority_and_self_exclusion(spark):
    # b is cited by a and c (indegree 2); c by a only; a's self-link dropped
    docs = spark.createDataFrame(
        [_doc("a", ["a", "b", "c"]), _doc("c", ["b"])], DOCS_SCHEMA
    )
    rows = {r.url: r for r in expand_frontier(docs, crawl_id=7).collect()}
    assert set(rows) == {_u("b"), _u("c")}
    assert rows[_u("b")].priority == 1.0 - 1.0 / 3.0
    assert rows[_u("c")].priority == 0.5
    for r in rows.values():
        assert r.seed_rank == DISCOVERED_SEED_RANK
        assert r.discovered_crawl_id == 7
        assert r.state == "pending"
        assert r.host == "h.example.org"


def test_crawl_closure_reaches_link_closure_and_stops(spark, tmp_path):
    # graph: a -> {b, c}, b -> {c, d}, c -> {a} (cycle), d -> {}; e unreachable
    corpus = spark.createDataFrame(
        [
            _doc("a", ["b", "c"]),
            _doc("b", ["c", "d"]),
            _doc("c", ["a"]),
            _doc("d", []),
            _doc("e", ["a"]),
        ],
        DOCS_SCHEMA,
    )
    hosts = spark.createDataFrame(
        [("h.example.org", 10, 100, [], True)],
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean",
    )
    seeds = spark.createDataFrame(
        [(_u("a"), "h.example.org", 1.0, 0, 0, "pending")],
        "url string, host string, priority double, discovered_crawl_id int, "
        "seed_rank int, state string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    params = SN.BloomParams.for_capacity(64, fp_rate=0.01, n_shards=4)
    stats = eng.crawl_closure(seeds, hosts, simulated_fetcher(corpus), bloom_params=params)

    # BFS depths: r0 {a}, r1 {b,c}, r2 {d} (c->a is seen-filtered), r3 closure
    assert [s["fetched"] for s in stats] == [1, 2, 1, 0]
    assert stats[-1]["scheduled"] == 0
    fetched = [r.url_c for r in eng.store.read("fetched").collect()]
    assert sorted(fetched) == sorted({_u("a"), _u("b"), _u("c"), _u("d")})  # once each
    assert _u("e") not in fetched

    # closure is stable: re-running schedules nothing and commits one
    # verification round
    again = eng.crawl_closure(seeds, hosts, simulated_fetcher(corpus), bloom_params=params)
    assert len(again) == 1 and again[0]["scheduled"] == 0


def test_discovered_frontier_rows_are_replayable(spark, tmp_path):
    corpus = spark.createDataFrame([_doc("a", ["b"]), _doc("b", [])], DOCS_SCHEMA)
    hosts = spark.createDataFrame(
        [("h.example.org", 10, 100, [], True)],
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean",
    )
    seeds = spark.createDataFrame(
        [(_u("a"), "h.example.org", 1.0, 0, 0, "pending")],
        "url string, host string, priority double, discovered_crawl_id int, "
        "seed_rank int, state string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    eng.crawl_round(seeds, hosts, simulated_fetcher(corpus), 0, mode="discover",
                    discover_links=True)
    d0 = [(r.url, r.seed_rank) for r in eng.discovered_frontier(0).collect()]
    assert d0 == [(_u("b"), DISCOVERED_SEED_RANK)]
    # a second engine over the same store reads the identical discovery set
    eng2 = CrawlEngine(spark, str(tmp_path / "store"))
    assert [(r.url, r.seed_rank) for r in eng2.discovered_frontier(0).collect()] == d0


def test_expand_frontier_matches_python_twin_on_random_graphs(spark):
    """Property: for arbitrary link graphs, expand_frontier ≡ a from-first-
    principles Python twin (canonical-dedup, self-link exclusion, indegree
    priority). Seeded generation — deterministic across runs."""
    import random

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.randint(2, 12)
        names = [f"n{i}" for i in range(n)]
        links = {
            a: [rng.choice(names) for _ in range(rng.randint(0, 4))] for a in names
        }
        docs = spark.createDataFrame(
            [_doc(a, ts) for a, ts in links.items()], DOCS_SCHEMA
        )
        got = {
            r.url: (r.priority, r.host)
            for r in expand_frontier(docs, crawl_id=trial).collect()
        }
        deg: dict[str, int] = {}
        for a, ts in links.items():
            for t in ts:
                if t != a:
                    deg[_u(t)] = deg.get(_u(t), 0) + 1
        want = {
            u: (1.0 - 1.0 / (1.0 + c), "h.example.org") for u, c in deg.items()
        }
        assert got == want, f"trial {trial}"


def test_crawl_closure_discovers_new_hosts_via_host_dim_fn(spark, tmp_path):
    """Cross-host outlinks: the scheduler's inner host join drops URLs on
    hosts absent from the dim, so a closure given only seed-host dim rows is
    same-host-scoped; with ``host_dim_fn`` the loop derives each round's
    missing hosts and extends the dim (the CLI wires a live robots fetch
    here), so the crawl follows discovery onto new hosts under their own
    politeness rows."""

    def xu(name):
        return f"https://x.example.org/d/{name}"

    corpus = spark.createDataFrame(
        [
            (_u("a"), [("link", None, xu("b"), 0), ("text", "seed doc", None, 1)]),
            (xu("b"), [("link", None, _u("c"), 0), ("text", "x doc", None, 1)]),
            (_u("c"), [("text", "leaf", None, 0)]),
        ],
        DOCS_SCHEMA,
    )
    dim_schema = (
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean"
    )
    hosts = spark.createDataFrame([("h.example.org", 10, 100, [], True)], dim_schema)
    seeds = spark.createDataFrame(
        [(_u("a"), "h.example.org", 1.0, 0, 0, "pending")],
        "url string, host string, priority double, discovered_crawl_id int, "
        "seed_rank int, state string",
    )
    params = SN.BloomParams.for_capacity(64, fp_rate=0.01, n_shards=4)

    # without host_dim_fn: scoped to the seed host — b (on x.example.org)
    # is dropped and c is never discovered
    eng = CrawlEngine(spark, str(tmp_path / "scoped"))
    eng.crawl_closure(seeds, hosts, simulated_fetcher(corpus), bloom_params=params)
    assert [r.url_c for r in eng.store.read("fetched").collect()] == [_u("a")]

    # with host_dim_fn: the loop requests dim rows for x.example.org
    # (with its full-origin robots_url) and the crawl crosses hosts
    asked: list[tuple[str, str]] = []

    def dim_fn(new_hosts):
        rows = [(r.host, r.robots_url) for r in new_hosts.collect()]
        asked.extend(rows)
        return spark.createDataFrame(
            [(h, 10, 100, [], True) for h, _ in rows], dim_schema
        )

    eng2 = CrawlEngine(spark, str(tmp_path / "open"))
    stats = eng2.crawl_closure(
        seeds, hosts, simulated_fetcher(corpus), bloom_params=params,
        host_dim_fn=dim_fn,
    )
    fetched = sorted(r.url_c for r in eng2.store.read("fetched").collect())
    assert fetched == sorted([_u("a"), xu("b"), _u("c")])
    assert stats[-1]["scheduled"] == 0
    assert asked == [("x.example.org", "https://x.example.org/robots.txt")]


def test_crawl_closure_reprobes_transiently_failed_host(spark, tmp_path):
    """A transient robots-fetch failure marks the host unavailable for THAT
    round only: when a later round's frontier still wants the host, the
    closure loop re-probes it (anti-join on settled = available dim rows,
    fresh row replacing the stale one) instead of treating one timeout as a
    permanent blacklist."""

    def xu(name):
        return f"https://x.example.org/d/{name}"

    corpus = spark.createDataFrame(
        [
            (_u("a"), [("link", None, xu("b"), 0), ("link", None, _u("a2"), 1)]),
            (_u("a2"), [("link", None, _u("c"), 0), ("text", "mid", None, 1)]),
            (_u("c"), [("link", None, xu("b"), 0), ("text", "re-link", None, 1)]),
            (xu("b"), [("text", "x doc", None, 0)]),
        ],
        DOCS_SCHEMA,
    )
    dim_schema = (
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean"
    )
    hosts = spark.createDataFrame([("h.example.org", 10, 100, [], True)], dim_schema)
    seeds = spark.createDataFrame(
        [(_u("a"), "h.example.org", 1.0, 0, 0, "pending")],
        "url string, host string, priority double, discovered_crawl_id int, "
        "seed_rank int, state string",
    )
    params = SN.BloomParams.for_capacity(64, fp_rate=0.01, n_shards=4)

    probes: list[str] = []

    def dim_fn(new_hosts):
        rows = [r.host for r in new_hosts.collect()]
        probes.extend(rows)
        # first probe of x.example.org fails (timeout → unavailable this
        # round); any later probe succeeds
        return spark.createDataFrame(
            [(h, 10, 100, [], probes.count(h) >= 2) for h in rows], dim_schema
        )

    eng = CrawlEngine(spark, str(tmp_path / "reprobe"))
    eng.crawl_closure(
        seeds, hosts, simulated_fetcher(corpus), bloom_params=params,
        host_dim_fn=dim_fn,
    )
    fetched = sorted(r.url_c for r in eng.store.read("fetched").collect())
    # xu("b") is dropped in the round where x probes unavailable, then
    # re-discovered via c and fetched after the successful re-probe
    assert fetched == sorted([_u("a"), _u("a2"), _u("c"), xu("b")])
    assert probes == ["x.example.org", "x.example.org"]


def test_crawl_closure_resumes_after_crash(spark, tmp_path):
    """A fetcher crash mid-closure leaves the store resumable: re-running
    crawl_closure continues from the committed rounds and reaches the same
    closure as an uninterrupted run (idempotent replay, no double-fetch)."""
    corpus_rows = [
        _doc("a", ["b", "c"]),
        _doc("b", ["c", "d"]),
        _doc("c", ["a"]),
        _doc("d", []),
    ]
    corpus = spark.createDataFrame(corpus_rows, DOCS_SCHEMA)
    hosts = spark.createDataFrame(
        [("h.example.org", 10, 100, [], True)],
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean",
    )
    seeds = spark.createDataFrame(
        [(_u("a"), "h.example.org", 1.0, 0, 0, "pending")],
        "url string, host string, priority double, discovered_crawl_id int, "
        "seed_rank int, state string",
    )
    params = SN.BloomParams.for_capacity(64, fp_rate=0.01, n_shards=4)

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}
    inner = simulated_fetcher(corpus)

    def crashy_fetch(sp, scheduled):
        calls["n"] += 1
        if calls["n"] == 2:  # die mid-round-1, after round 0 committed
            raise Boom()
        return inner(sp, scheduled)

    eng = CrawlEngine(spark, str(tmp_path / "store"))
    try:
        eng.crawl_closure(seeds, hosts, crashy_fetch, bloom_params=params)
        raise AssertionError("expected crash")
    except Boom:
        pass
    assert eng.store.last_round() == 0  # round 1 left no manifest entry

    # resume with a fresh engine over the same store: closure completes
    eng2 = CrawlEngine(spark, str(tmp_path / "store"))
    stats = eng2.crawl_closure(seeds, hosts, simulated_fetcher(corpus),
                               bloom_params=params)
    fetched = [r.url_c for r in eng2.store.read("fetched").collect()]
    assert sorted(fetched) == sorted({_u("a"), _u("b"), _u("c"), _u("d")})
    assert len(fetched) == len(set(fetched))  # no double-fetch across the crash
    assert stats[-1]["scheduled"] == 0


def _mu(host: str, name: str) -> str:
    return f"https://{host}.example.org/d/{name}"


def test_crawl_closure_with_online_centrality_budgets(spark, tmp_path):
    """Closure with centrality='online': round 0 runs unshaped, every later
    round's host budgets come off the standing adaptive-OPIC state (which
    advances once per committed round), and the crawl still reaches the
    exact link closure. The hub host ends with the top online-importance
    score."""
    # seed on hub: hub/a -> spoke1/b, spoke2/c; both spokes link back to
    # hub/a and on to hub/d; spoke2/c also links to spoke3/e (leaf)
    corpus = spark.createDataFrame(
        [
            (_mu("hub", "a"), [("link", None, _mu("spoke1", "b"), 0),
                               ("link", None, _mu("spoke2", "c"), 1),
                               ("text", "hub body", None, 2)]),
            (_mu("spoke1", "b"), [("link", None, _mu("hub", "a"), 0),
                                  ("link", None, _mu("hub", "d"), 1),
                                  ("text", "s1", None, 2)]),
            (_mu("spoke2", "c"), [("link", None, _mu("hub", "a"), 0),
                                  ("link", None, _mu("hub", "d"), 1),
                                  ("link", None, _mu("spoke3", "e"), 2),
                                  ("text", "s2", None, 3)]),
            (_mu("hub", "d"), [("text", "sink", None, 0)]),
            (_mu("spoke3", "e"), [("text", "leaf", None, 0)]),
        ],
        DOCS_SCHEMA,
    )
    hosts = spark.createDataFrame(
        [(f"{h}.example.org", 10, 100, [], True)
         for h in ("hub", "spoke1", "spoke2", "spoke3")],
        "host string, crawl_delay_ms int, max_fetch_per_round int, "
        "robots_disallow array<string>, is_available boolean",
    )
    seeds = spark.createDataFrame(
        [(_mu("hub", "a"), "hub.example.org", 1.0, 0, 0, "pending")],
        "url string, host string, priority double, discovered_crawl_id int, "
        "seed_rank int, state string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    params = SN.BloomParams.for_capacity(64, fp_rate=0.01, n_shards=4)
    stats = eng.crawl_closure(
        seeds, hosts, simulated_fetcher(corpus), bloom_params=params,
        centrality="online",
    )
    # closure reached: all 5 docs fetched exactly once, terminating round 0
    fetched = sorted(r.url_c for r in eng.store.read("fetched").collect())
    assert fetched == sorted(r.doc_id for r in corpus.collect())
    assert stats[-1]["scheduled"] == 0
    # one opic_state partition per committed round (the update runs even on
    # the empty terminating round — its fetched set is just empty)
    state_rounds = {
        r.crawl_id for r in eng.store.read("opic_state").select("crawl_id").distinct().collect()
    }
    assert state_rounds == {s for s in range(len(stats))}
    scores = {r.host: r.score for r in eng.opic_scores().collect()}
    # the hub receives cash from both spokes every time they're visited
    assert scores["hub.example.org"] == max(scores.values())
    # and the shaped dim for the NEXT round would boost the hub
    dim = eng.centrality_hosts(hosts, signal="online")
    got = {r.host: r.centrality_mult for r in dim.collect()}
    assert got["hub.example.org"] == max(got.values())
