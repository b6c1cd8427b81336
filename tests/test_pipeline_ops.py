"""Tests for the training-pipeline extension operators added in round 2:
duplicate clustering (connected components), stratified sampling, and
token-budget sequence packing. Each is pinned against a pure-Python twin;
the DuckDB twins are checked by the driver's oracle gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataset_crawler_spark.functions.hashing import h60_py
from dataset_crawler_spark.operators import clustering as CL

# --------------------------------------------------------------------------
# connected components
# --------------------------------------------------------------------------

# chain 0-..-8 (diameter 8 forces >1 pointer-doubling round), triangle
# 20-21-22 with a pendant 23, pair 30-31; 40/41 isolated via the node list
EDGES = (
    [(i, i + 1) for i in range(8)]
    + [(20, 21), (21, 22), (22, 20), (22, 23)]
    + [(30, 31)]
)
NODES = sorted({n for e in EDGES for n in e} | {40, 41})


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_connected_components_match_union_find(spark):
    edges = spark.createDataFrame(EDGES, "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(n,) for n in NODES], "doc_id long")
    got = {
        (r["node"], r["comp"])
        for r in CL.connected_components(edges, nodes=nodes).collect()
    }
    want = set(_uf_components(EDGES, NODES).items())
    assert got == want


def test_connected_components_partitioning_invariance(spark):
    edges = spark.createDataFrame(EDGES, "doc_a long, doc_b long")
    one = CL.connected_components(edges.coalesce(1)).collect()
    many = CL.connected_components(edges.repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_connected_components_hub_skew(spark):
    """A hub node connected to 2000 spokes — the hot-key regime where the
    per-round edges⋈labels join sees one giant key. Must converge (hash
    joins + min-agg handle the skew; no driver graph) to a single component
    labeled by the minimum id, in the expected few rounds."""
    hub = 0
    edges = spark.createDataFrame(
        [(hub, i) for i in range(1, 2001)], "doc_a long, doc_b long"
    ).repartition(16)
    got = {r.node: r.comp for r in CL.connected_components(edges).collect()}
    assert set(got) == set(range(2001))
    assert set(got.values()) == {hub}


def test_dedup_clusters_sizes_and_keep_policy(spark):
    edges = spark.createDataFrame(EDGES, "doc_a long, doc_b long")
    docs = spark.createDataFrame([(n,) for n in NODES], "doc_id long")
    out = CL.dedup_clusters(edges, docs).collect()
    comp = _uf_components(EDGES, NODES)
    sizes = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert {(r.doc_id, r.cluster_id, r.cluster_size) for r in out} == {
        (n, comp[n], sizes[comp[n]]) for n in NODES
    }
    # exactly one canonical doc (doc_id == cluster_id) per component
    canon = [r.doc_id for r in out if r.doc_id == r.cluster_id]
    assert sorted(canon) == sorted(set(comp.values()))


# --------------------------------------------------------------------------
# stratified sampling + packing (query-level twins at sf0.001)
# --------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def _docs_py(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()


def test_sample_stratified_matches_python_twin(spark):
    from dataset_crawler_spark.plans.queries import sample_stratified

    rates = {0: 1.0, 1: 0.5, 2: 0.25, 3: 0.1}
    want = set()
    for r in _docs_py(spark):
        rate = rates[int(r.source[3:]) % 4]
        if h60_py(str(r.doc_id)) % 10000 < int(rate * 10000):
            want.add((r.doc_id, r.source, rate, round(1.0 / rate, 4)))
    got = {
        (r.doc_id, r.source, r.rate, r.weight)
        for r in sample_stratified(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_pack_token_bins_matches_python_twin(spark):
    from dataset_crawler_spark.plans.queries import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        pack_token_bins,
    )

    shards: dict[int, list] = {}
    for r in _docs_py(spark):
        shards.setdefault(h60_py(str(r.doc_id)) % _PACK_SHARDS, []).append(
            (r.doc_id, len(r.text.split(" ")))
        )
    want = set()
    for shard, docs in shards.items():
        cum = 0
        for doc_id, n_tok in sorted(docs):
            want.add((shard, doc_id, n_tok, cum // _PACK_BUDGET))
            cum += n_tok
    got = {
        (r.shard, r.doc_id, r.n_tokens, r.bin_id)
        for r in pack_token_bins(spark, SF_DIR).collect()
    }
    assert got == want
    # packing invariant: bin ids within a shard are contiguous from 0
    by_shard: dict[int, set] = {}
    for s, _, _, b in got:
        by_shard.setdefault(s, set()).add(b)
    for bins in by_shard.values():
        assert bins == set(range(max(bins) + 1))


def test_pipeline_training_corpus_matches_python_twin(spark):
    """End-to-end composite (gate → sample → dedup-cluster → pack) pinned
    against a from-first-principles Python twin: shingling, minhashing,
    banding, union-find clustering, and packing all recomputed independently
    of both Spark and the DuckDB twin."""
    from dataset_crawler_spark.plans.queries import (
        _GATE_MIN_TOKENS,
        _GATE_STOP_DENSITY,
        _MINHASH_BAND,
        _MINHASH_K,
        _PACK_BUDGET,
        _PACK_SHARDS,
        pipeline_training_corpus,
    )

    stop = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "value"}
    rates = {0: 1.0, 1: 0.5, 2: 0.25, 3: 0.1}
    samp = []  # (doc_id, source, n_tokens, rate, shingle-set)
    for r in _docs_py(spark):
        toks = r.text.split(" ")
        n_stop = sum(1 for w in toks if w in stop)
        if not (n_stop / len(toks) > _GATE_STOP_DENSITY and len(toks) >= _GATE_MIN_TOKENS):
            continue
        rate = rates[int(r.source[3:]) % 4]
        if h60_py(str(r.doc_id)) % 10000 >= int(rate * 10000):
            continue
        n_sh = max(len(toks) - 2, 1)
        shingles = {" ".join(toks[i : i + 3]) for i in range(n_sh)}
        samp.append((r.doc_id, r.source, len(toks), rate, shingles))

    # minhash → bands → pair edges
    def bands_of(shingles):
        sigs = [
            min(h60_py(f"{seed}|{s}") for s in shingles) for seed in range(_MINHASH_K)
        ]
        return [
            ",".join(str(v) for v in sigs[b * _MINHASH_BAND : (b + 1) * _MINHASH_BAND])
            for b in range(_MINHASH_K // _MINHASH_BAND)
        ]

    band_map = {doc_id: bands_of(sh) for doc_id, _, _, _, sh in samp}
    ids = sorted(band_map)
    edges = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if any(x == y for x, y in zip(band_map[a], band_map[b]))
    ]
    comp = _uf_components(edges, ids)
    keep = {d for d in ids if comp[d] == d}

    shards: dict[int, list] = {}
    meta = {}
    for doc_id, source, n_tok, rate, _ in samp:
        if doc_id not in keep:
            continue
        meta[doc_id] = (source, n_tok, round(1.0 / rate, 4))
        shards.setdefault(h60_py(str(doc_id)) % _PACK_SHARDS, []).append(doc_id)
    want = set()
    for shard, docs in shards.items():
        cum = 0
        for doc_id in sorted(docs):
            source, n_tok, weight = meta[doc_id]
            want.add((shard, doc_id, source, n_tok, weight, cum // _PACK_BUDGET))
            cum += n_tok
    got = {
        (r.shard, r.doc_id, r.source, r.n_tokens, r.weight, r.bin_id)
        for r in pipeline_training_corpus(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0


def test_decontaminate_ngram_matches_python_twin(spark):
    from dataset_crawler_spark.plans.queries import _DECONTAM_MOD, decontaminate_ngram

    def shingles(text):
        toks = text.split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    ev_sh, train = set(), {}
    for r in _docs_py(spark):
        if h60_py(str(r.doc_id)) % _DECONTAM_MOD == 0:
            ev_sh |= shingles(r.text)
        else:
            train[r.doc_id] = shingles(r.text)
    want = {
        (d, len(sh & ev_sh)) for d, sh in train.items() if sh & ev_sh
    }
    got = {
        (r.doc_id, r.n_shared) for r in decontaminate_ngram(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0
    # the twin's train dict excludes eval docs by construction, so equality
    # also pins that no eval doc leaks into the contamination report


def test_text_repetition_filter_matches_python_twin(spark):
    from dataset_crawler_spark.plans.queries import (
        _REP_MAX_DUP_TRIGRAM,
        _REP_MAX_TOP_TOKEN,
        text_repetition_filter,
    )

    want = {}
    for r in _docs_py(spark):
        toks = r.text.split(" ")
        n = max(len(toks) - 2, 1)
        grams = [" ".join(toks[i : i + 3]) for i in range(n)]
        dup = 1.0 - len(set(grams)) / len(grams)
        freq: dict[str, int] = {}
        for w in toks:
            freq[w] = freq.get(w, 0) + 1
        shr = max(freq.values()) / len(toks)
        want[r.doc_id] = (
            round(dup, 4),
            round(shr, 4),
            dup <= _REP_MAX_DUP_TRIGRAM and shr <= _REP_MAX_TOP_TOKEN,
        )
    got = {
        r.doc_id: (r.dup_trigram_frac, r.top_token_share, r.keep)
        for r in text_repetition_filter(spark, SF_DIR).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# pagerank
# --------------------------------------------------------------------------

# 1↔2 core, 3→1 feeder, 4 dangling (out-degree 0: mass must redistribute),
# 5 isolated (teleport-only rank via the node universe)
PR_EDGES = [(1, 2), (2, 1), (3, 1), (1, 4)]
PR_NODES = [1, 2, 3, 4, 5]


def _pagerank_py(edges, nodes, n_iter=8, damping=0.85):
    out: dict[int, list] = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        m = sum(rank[v] for v in nodes if v not in out)
        contrib: dict[int, float] = {v: 0.0 for v in nodes}
        for s, dsts in out.items():
            for d in dsts:
                contrib[d] += rank[s] / len(dsts)
        # operator contract: each iterate is quantized to 9 dp (resets
        # accumulation-order drift below the grid — round-5 determinism)
        rank = {
            v: round((1.0 - damping) / n + damping * (contrib[v] + m / n), 9)
            for v in nodes
        }
    return rank


def test_pagerank_matches_power_iteration_twin(spark):
    from dataset_crawler_spark.operators.graph import pagerank

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in PR_NODES], "node long")
    got = {r.node: r.rank for r in pagerank(edges, nodes=nodes).collect()}
    want = _pagerank_py(PR_EDGES, PR_NODES)
    assert set(got) == set(want)
    for v in PR_NODES:
        assert abs(got[v] - want[v]) < 1e-12
    # total mass is conserved (dangling redistribution leaks nothing) up to
    # the per-iterate 9-dp quantization residue (≤ n·0.5e-9 per iteration)
    assert abs(sum(got.values()) - 1.0) < len(PR_NODES) * 1e-9
    # structure: 1 (two in-links incl. the core loop) outranks the feeder 3
    # and the isolated 5
    assert got[1] > got[3] > 0
    assert got[1] > got[5]


def test_pagerank_partitioning_invariance(spark):
    from dataset_crawler_spark.operators.graph import pagerank

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    one = {r.node: r.rank for r in pagerank(edges.coalesce(1)).collect()}
    many = {r.node: r.rank for r in pagerank(edges.repartition(5)).collect()}
    assert set(one) == set(many)
    for v in one:
        assert abs(one[v] - many[v]) < 1e-12


def _trustrank_py(edges, nodes, trusted, n_iter=8, damping=0.85):
    out: dict[int, list] = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    tel = {v: (1.0 / len(trusted) if v in trusted else 0.0) for v in nodes}
    rank = dict(tel)
    for _ in range(n_iter):
        m = sum(rank[v] for v in nodes if v not in out)
        contrib: dict[int, float] = {v: 0.0 for v in nodes}
        for s, dsts in out.items():
            for d in dsts:
                contrib[d] += rank[s] / len(dsts)
        rank = {
            v: (1.0 - damping) * tel[v] + damping * (contrib[v] + m * tel[v])
            for v in nodes
        }
    return rank


def test_trustrank_matches_python_twin(spark):
    from dataset_crawler_spark.operators.graph import trustrank

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in PR_NODES], "node long")
    trusted = spark.createDataFrame([(3,)], "node long")
    got = {
        r.node: r.trust
        for r in trustrank(edges, trusted, nodes=nodes).collect()
    }
    want = _trustrank_py(PR_EDGES, PR_NODES, {3})
    assert set(got) == set(want)
    for v in PR_NODES:
        assert abs(got[v] - want[v]) < 1e-12
    # total trust is conserved (dangling mass redistributes along teleport)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # spam-demotion property: the isolated node 5 is reachable from no
    # trusted seed → trust EXACTLY 0 (pagerank gives it teleport mass)
    assert got[5] == 0.0
    # trust flows 3→1→{2,4}: everything downstream of the seed is positive
    assert got[1] > 0 and got[2] > 0 and got[4] > 0


def test_trustrank_empty_seed_raises(spark):
    from dataset_crawler_spark.operators.graph import trustrank

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    # seed 99 is outside the node universe → effective seed set is empty
    trusted = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="no trusted seed"):
        trustrank(edges, trusted)


def test_trustrank_strategy_invariance(spark):
    from dataset_crawler_spark.operators.graph import trustrank

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    trusted = spark.createDataFrame([(1,), (3,)], "node long")
    small = {r.node: r.trust for r in trustrank(edges, trusted).collect()}
    big = {
        r.node: r.trust
        for r in trustrank(edges, trusted, broadcast_threshold=0).collect()
    }
    assert small.keys() == big.keys()
    for v in small:
        assert abs(small[v] - big[v]) < 1e-12


def _hits_py(edges, nodes, n_iter=8):
    """Pure-Python HITS twin: L1-normalized synchronous half-steps in the
    operator's exact update order (authority from PREVIOUS hubs, then hub
    from the FRESH authorities)."""
    es = set(edges)
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = dict(hub)
    for _ in range(n_iter):
        auth = {v: sum(hub[s] for s, d in es if d == v) for v in nodes}
        t = sum(auth.values()) or 1.0
        auth = {v: x / t for v, x in auth.items()}
        hub = {v: sum(auth[d] for s, d in es if s == v) for v in nodes}
        t = sum(hub.values()) or 1.0
        hub = {v: x / t for v, x in hub.items()}
    return auth, hub


def test_hits_matches_python_twin(spark):
    from dataset_crawler_spark.operators.graph import hits

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in PR_NODES], "node long")
    rows = hits(edges, nodes=nodes).collect()
    got_a = {r.node: r.authority for r in rows}
    got_h = {r.node: r.hub for r in rows}
    want_a, want_h = _hits_py(PR_EDGES, PR_NODES)
    assert set(got_a) == set(want_a)
    for v in PR_NODES:
        assert abs(got_a[v] - want_a[v]) < 1e-12
        assert abs(got_h[v] - want_h[v]) < 1e-12
    # L1 normalization: each score vector is a distribution
    assert abs(sum(got_a.values()) - 1.0) < 1e-9
    assert abs(sum(got_h.values()) - 1.0) < 1e-9
    # structure: 1 has in-links {2,3} so it is the top authority; the
    # dangling 4 has no out-edges → hub exactly 0; isolated 5 → both 0
    assert got_a[1] == max(got_a.values())
    assert got_h[4] == 0.0
    assert got_a[5] == 0.0 and got_h[5] == 0.0


def _opic_py(edges, nodes, n_rounds=8):
    out: dict[int, list] = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    n = len(nodes)
    cash = {v: 1.0 / n for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(n_rounds):
        m = sum(cash[v] for v in nodes if v not in out)
        recv = {v: 0.0 for v in nodes}
        for s, dsts in out.items():
            for d in dsts:
                recv[d] += cash[s] / len(dsts)
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = {v: recv[v] + m / n for v in nodes}
    return {v: (hist[v] + cash[v]) / (n_rounds + 1) for v in nodes}


def test_opic_matches_python_twin(spark):
    from dataset_crawler_spark.operators.graph import opic

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in PR_NODES], "node long")
    got = {r.node: r.importance for r in opic(edges, nodes=nodes).collect()}
    want = _opic_py(PR_EDGES, PR_NODES)
    assert set(got) == set(want)
    for v in PR_NODES:
        assert abs(got[v] - want[v]) < 1e-12
    # cash conservation: total importance is exactly the invariant 1
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the 1↔2 core accumulates the most cash history
    assert got[1] == max(got.values())


def test_hits_opic_strategy_invariance(spark):
    """broadcast_threshold=0 forces the repartition(key).cache() path; the
    default rides broadcast joins — values must be identical either way
    (same contract pagerank pins via test_pagerank_partitioning_invariance)."""
    from dataset_crawler_spark.operators.graph import hits, opic

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    small = {(r.node): (r.authority, r.hub) for r in hits(edges).collect()}
    big = {
        (r.node): (r.authority, r.hub)
        for r in hits(edges, broadcast_threshold=0).collect()
    }
    assert small.keys() == big.keys()
    for v in small:
        assert abs(small[v][0] - big[v][0]) < 1e-12
        assert abs(small[v][1] - big[v][1]) < 1e-12
    o_small = {r.node: r.importance for r in opic(edges).collect()}
    o_big = {
        r.node: r.importance
        for r in opic(edges, broadcast_threshold=0).collect()
    }
    assert o_small.keys() == o_big.keys()
    for v in o_small:
        assert abs(o_small[v] - o_big[v]) < 1e-12


def _opic_online_py(edges, nodes, fetch_sets):
    """Pure-Python adaptive-OPIC twin: per round only the fetched subset
    banks cash and distributes it; fetched dangling mass spreads uniformly."""
    out: dict[int, list] = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    n = len(nodes)
    cash = {v: 1.0 / n for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for fetched in fetch_sets:
        m = sum(cash[v] for v in fetched if v not in out)
        recv = {v: 0.0 for v in nodes}
        for u in fetched:
            for d in out.get(u, []):
                recv[d] += cash[u] / len(out[u])
        hist = {v: hist[v] + (cash[v] if v in fetched else 0.0) for v in nodes}
        cash = {
            v: (0.0 if v in fetched else cash[v]) + recv[v] + m / n for v in nodes
        }
    return cash, hist


def test_opic_step_full_fetch_equals_synchronous(spark):
    """Stepping with fetched = EVERY node must reproduce the synchronous
    variant exactly — the adaptive update degenerates to opic()."""
    from dataset_crawler_spark.operators.graph import opic, opic_step

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in PR_NODES], "node long")
    n = len(PR_NODES)
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    k = 4
    for _ in range(k):
        state = opic_step(state, edges, nodes).localCheckpoint(eager=False)
    got = {
        r.node: (r.hist + r.cash) / (k + 1)
        for r in state.collect()
    }
    want = {r.node: r.importance for r in opic(edges, nodes=nodes, n_rounds=k).collect()}
    assert set(got) == set(want)
    for v in PR_NODES:
        assert abs(got[v] - want[v]) < 1e-12


def test_opic_step_partial_fetch_matches_python_twin(spark):
    from dataset_crawler_spark.operators.graph import opic_step

    edges = spark.createDataFrame(PR_EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in PR_NODES], "node long")
    n = len(PR_NODES)
    fetch_sets = [{1, 4}, {2, 5}, {3}, {1, 2, 3}]
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    for fs in fetch_sets:
        fetched = spark.createDataFrame([(v,) for v in sorted(fs)], "node long")
        state = opic_step(state, edges, fetched).localCheckpoint(eager=False)
    rows = state.collect()
    got_c = {r.node: r.cash for r in rows}
    got_h = {r.node: r.hist for r in rows}
    want_c, want_h = _opic_online_py(PR_EDGES, PR_NODES, fetch_sets)
    for v in PR_NODES:
        assert abs(got_c[v] - want_c[v]) < 1e-12
        assert abs(got_h[v] - want_h[v]) < 1e-12
    # cash conservation: the invariant that makes the estimate consistent
    assert abs(sum(got_c.values()) - 1.0) < 1e-9


def test_incremental_minhash_index_through_store(spark, tmp_path):
    """Three-round ingestion through a SnapshotStore-persisted band index:
    the union of per-round pair outputs must equal the from-scratch batch
    pair set over all docs, and a crashed (uncommitted) round's signatures
    must stay invisible to the next round's join."""
    from dataset_crawler_spark.operators import dedup_index as DI
    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    store = SnapshotStore(str(tmp_path / "store"), spark)

    got = set()
    for rnd in range(3):
        new = docs.where(F.col("doc_id") % 3 == rnd)
        idx = store.read("band_sigs") if rnd else None
        if idx is not None and not idx.columns:
            idx = None
        bands = DI.minhash_bands(new)
        pairs = DI.incremental_band_pairs(idx, bands)
        got |= {(r.doc_a, r.doc_b) for r in pairs.collect()}
        store.append("band_sigs", bands, rnd)
        store.commit_round(rnd)

    want = {
        (r.doc_a, r.doc_b)
        for r in DI.band_pairs(DI.minhash_bands(docs)).collect()
    }
    assert got == want
    assert len(want) > 0

    # crash-safety: an appended-but-uncommitted round is invisible
    extra = docs.limit(0)
    store.append("band_sigs", DI.minhash_bands(extra), 99)
    visible = store.read("band_sigs")
    assert {r.crawl_id for r in visible.select("crawl_id").distinct().collect()} == {
        0,
        1,
        2,
    }


def test_incremental_index_recrawl_replaces_stale_bands(spark, tmp_path):
    """A re-crawled doc's OLD signatures must stop generating pairs: after
    doc A's text changes to match doc C (and no longer match doc B), the
    last-writer-wins index view pairs A with C, not with B."""
    from dataset_crawler_spark.operators import dedup_index as DI
    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different words nothing shared with anything else here at all"
    store = SnapshotStore(str(tmp_path / "store"), spark)

    r0 = spark.createDataFrame(
        [("A", base), ("B", base), ("C", other)], "doc_id string, text string"
    )
    store.append("band_sigs", DI.minhash_bands(r0), 0)
    store.commit_round(0)
    idx0 = DI.latest_bands(store.read("band_sigs"))
    pairs0 = {(r.doc_a, r.doc_b) for r in DI.band_pairs(idx0).collect()}
    assert ("A", "B") in pairs0 and ("A", "C") not in pairs0

    # round 1: A is re-crawled and now matches C instead of B
    r1 = spark.createDataFrame([("A", other)], "doc_id string, text string")
    store.append("band_sigs", DI.minhash_bands(r1), 1)
    store.commit_round(1)
    idx1 = DI.latest_bands(store.read("band_sigs"))
    pairs1 = {(r.doc_a, r.doc_b) for r in DI.band_pairs(idx1).collect()}
    assert ("A", "C") in pairs1 and ("A", "B") not in pairs1


def test_incremental_signlsh_index_through_store(spark, tmp_path):
    """Embedding twin of the minhash lifecycle: three-round ingestion of the
    embeddings table through a SnapshotStore-persisted sign-LSH band index —
    the union of per-round candidate pairs must equal the from-scratch batch
    signband pair set over all vectors (the plan-level equivalence that
    `engine_incremental_signlsh` value-hash-checks, here driven through the
    actual persistence layer round by round)."""
    from dataset_crawler_spark.operators import dedup_index as DI
    from dataset_crawler_spark.operators.similarity import signband_signatures
    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def sigs(part):
        return signband_signatures(part, n_bands=8, bits_per_band=8).select(
            F.col("vec_id").alias("doc_id"), "band", F.col("sig").alias("band_sig")
        )

    store = SnapshotStore(str(tmp_path / "store"), spark)
    got = set()
    for rnd in range(3):
        new = sigs(emb.where(F.col("vec_id") % 3 == rnd))
        idx = store.read("band_sigs") if rnd else None
        if idx is not None and not idx.columns:
            idx = None
        pairs = DI.incremental_band_pairs(idx, new)
        got |= {(r.doc_a, r.doc_b) for r in pairs.collect()}
        store.append("band_sigs", new, rnd)
        store.commit_round(rnd)

    want = {(r.doc_a, r.doc_b) for r in DI.band_pairs(sigs(emb)).collect()}
    assert got == want
    assert len(want) > 0


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------


def test_asof_join_semantics(spark):
    """At-or-before inclusive match, per-key isolation, null when no earlier
    right row, and partitioning invariance."""
    from dataset_crawler_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [
            ("u1", 5, "a"),   # matches right ts=5 (tie → inclusive)
            ("u1", 7, "b"),   # matches right ts=5 (latest ≤ 7)
            ("u1", 12, "c"),  # matches right ts=10
            ("u2", 3, "d"),   # u2 has no right row ≤ 3 → null
            ("u2", 9, "e"),   # matches u2's ts=8 (not u1's ts=10)
            ("u3", 1, "f"),   # key absent from right → null
        ],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 5, 50.0), ("u1", 10, 100.0), ("u2", 8, 80.0)],
        "k string, ts long, v double",
    )
    want = {
        ("u1", 5, "a", 5, 50.0),
        ("u1", 7, "b", 5, 50.0),
        ("u1", 12, "c", 10, 100.0),
        ("u2", 3, "d", None, None),
        ("u2", 9, "e", 8, 80.0),
        ("u3", 1, "f", None, None),
    }
    for l in (left.coalesce(1), left.repartition(7)):
        got = {
            (r.k, r.ts, r.tag, r.ts_asof, r.v_asof)
            for r in asof_join(l, right, by=["k"]).collect()
        }
        assert got == want


def test_asof_join_adversarial_seeded(spark):
    """200 random left rows / 120 random right rows over 8 keys with heavy
    timestamp collisions (ts drawn from just 0..24, forcing plenty of exact
    ties and empty prefixes) against a brute-force Python twin — one Spark
    job for the whole case set."""
    import random

    rng = random.Random(20240817)
    keys = [f"k{i}" for i in range(8)]
    left = [
        (rng.choice(keys), rng.randrange(25), i) for i in range(200)
    ]
    right_set = set()
    while len(right_set) < 120:
        right_set.add((rng.choice(keys), rng.randrange(25)))
    right = [(k, ts, float(rng.randrange(1000))) for k, ts in sorted(right_set)]

    by_key: dict[str, list] = {}
    for k, ts, v in right:
        by_key.setdefault(k, []).append((ts, v))
    for rows in by_key.values():
        rows.sort()

    def expect(k, ts):
        best = None
        for rts, v in by_key.get(k, []):
            if rts <= ts:
                best = (rts, v)
        return best or (None, None)

    want = {(k, ts, i, *expect(k, ts)) for k, ts, i in left}

    from dataset_crawler_spark.operators.temporal import asof_join

    l = spark.createDataFrame(left, "k string, ts long, row_id long").repartition(13)
    r = spark.createDataFrame(right, "k string, ts long, v double").repartition(3)
    got = {
        (x.k, x.ts, x.row_id, x.ts_asof, x.v_asof)
        for x in asof_join(l, r, by=["k"]).collect()
    }
    assert got == want


def test_cluster_query_consistent_with_pair_query(spark):
    """Every LSH pair must land in one cluster; cluster_id is a member."""
    from dataset_crawler_spark.plans.queries import (
        dedup_cluster_components,
        dedup_minhash_lsh,
    )

    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup_cluster_components(spark, SF_DIR).collect()
    }
    pairs = dedup_minhash_lsh(spark, SF_DIR).collect()
    for p in pairs:
        assert clusters[p.doc_a] == clusters[p.doc_b]
    member_sets: dict[int, set] = {}
    for d, c in clusters.items():
        member_sets.setdefault(c, set()).add(d)
    for c, members in member_sets.items():
        assert c == min(members)


# --------------------------------------------------------------------------
# passage-level dedup / DSIR / PII scrub / crawl-trap detection (late round 2)
# --------------------------------------------------------------------------


def _docs_fixture(spark, tmp_path, rows):
    """Write an inline documents.parquet so the registered queries (which
    read `<sf_dir>/documents.parquet`) run on a hand-built corpus."""
    df = spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_chunk_passage_dedup_matches_hand_twin(spark, tmp_path):
    from dataset_crawler_spark.plans.queries import dedup_chunk_passages

    rows = [
        "a b c d e f g h",      # shares chunk "a b c d" with doc 1 → frac 0.5
        "a b c d x y z w",      # same                                → frac 0.5
        "q r s t u v",          # unique chunks ("q r s t", "u v")    → frac 0.0
        "a b c d",              # single fully-shared chunk           → frac 1.0
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup_chunk_passages(spark, _docs_fixture(spark, tmp_path, rows)).collect()
    }
    assert got[0] == dict(doc_id=0, n_chunks=2, n_dup_chunks=1,
                          dup_chunk_frac=0.5, kept_tokens=4, keep=True)
    assert got[1]["n_dup_chunks"] == 1 and got[1]["kept_tokens"] == 4
    assert got[2] == dict(doc_id=2, n_chunks=2, n_dup_chunks=0,
                          dup_chunk_frac=0.0, kept_tokens=6, keep=True)
    assert got[3] == dict(doc_id=3, n_chunks=1, n_dup_chunks=1,
                          dup_chunk_frac=1.0, kept_tokens=0, keep=False)


def test_span_c4_dedup_matches_hand_twin(spark, tmp_path):
    """C4 global span dedup: one winner per span hash under (doc_id, pos)
    order; every other occurrence is dropped and the document text is
    rebuilt from the surviving spans in order (partial tail span included)."""
    from dataset_crawler_spark.plans.queries import dedup_span_c4

    rows = [
        "a b c d e f g h",   # both spans are the global winners
        "a b c d x y z w",   # loses "a b c d" → keeps only "x y z w"
        "e f g h a b c d",   # loses both spans → empty clean_text
        "q r s t",           # unique single span
        "a b c d e f",       # loses full span, keeps partial tail "e f"
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup_span_c4(spark, _docs_fixture(spark, tmp_path, rows)).collect()
    }
    assert got[0] == dict(doc_id=0, n_chunks=2, n_dropped=0,
                          clean_text="a b c d e f g h")
    assert got[1] == dict(doc_id=1, n_chunks=2, n_dropped=1,
                          clean_text="x y z w")
    assert got[2] == dict(doc_id=2, n_chunks=2, n_dropped=2, clean_text="")
    assert got[3] == dict(doc_id=3, n_chunks=1, n_dropped=0,
                          clean_text="q r s t")
    assert got[4] == dict(doc_id=4, n_chunks=2, n_dropped=1, clean_text="e f")


def test_substring_exact_dedup_alignment_free(spark, tmp_path):
    """ExactSubstr vs chunking, the discriminating case: a 12-token shared
    run sitting at DIFFERENT phases mod chunk-width in the two documents.
    Stride-4 chunk hashing (`dedup_chunk_passages`) sees zero duplicated
    chunks; the stride-1 substring op marks the full run, merged into one
    maximal span. Plus: full-copy doc (frac 1.0), two separated runs (two
    spans), and a doc shorter than the window (no windows, frac 0.0)."""
    from dataset_crawler_spark.plans.queries import (
        dedup_chunk_passages,
        dedup_substring_exact,
    )

    t = [f"t{i}" for i in range(20)]
    rows = [
        " ".join(t),                                       # 0: unique base
        " ".join(["x0", "x1"] + t[3:15] + ["y0", "y1"]),   # 1: run at phase 2 vs 3
        " ".join(t),                                       # 2: exact copy of 0
        " ".join(t[0:9] + [f"u{i}" for i in range(5)] + t[10:19]),  # 3: two runs
        "s0 s1 s2",                                        # 4: shorter than k
    ]
    sf = _docs_fixture(spark, tmp_path, rows)
    got = {r["doc_id"]: r.asDict() for r in dedup_substring_exact(spark, sf).collect()}

    assert got[0] == dict(doc_id=0, n_tokens=20, n_dup_spans=0,
                          n_dup_tokens=0, dup_token_frac=0.0)
    # doc 1: windows at starts 2..6 all duplicated → one merged span [2, 14)
    assert got[1] == dict(doc_id=1, n_tokens=16, n_dup_spans=1,
                          n_dup_tokens=12, dup_token_frac=0.75)
    assert got[2] == dict(doc_id=2, n_tokens=20, n_dup_spans=1,
                          n_dup_tokens=20, dup_token_frac=1.0)
    # doc 3: spans [0, 9) and [14, 23) — 9 tokens each
    assert got[3] == dict(doc_id=3, n_tokens=23, n_dup_spans=2,
                          n_dup_tokens=18, dup_token_frac=round(18 / 23, 4))
    assert got[4] == dict(doc_id=4, n_tokens=3, n_dup_spans=0,
                          n_dup_tokens=0, dup_token_frac=0.0)

    # the same misaligned run is INVISIBLE to stride-4 chunk hashing
    chunks = {r["doc_id"]: r.asDict()
              for r in dedup_chunk_passages(spark, sf).collect()}
    assert chunks[1]["n_dup_chunks"] == 0


def test_training_shard_export_roundtrip(spark, tmp_path):
    """The export sink materializes pack_token_bins' layout faithfully:
    every doc lands exactly once with its text, per-(shard, bin) token sums
    equal the assignment plan, the manifest verifies, and a re-export is
    content-identical (deterministic artifact). A corrupted copy (one shard
    dir dropped) must fail verify_manifest."""
    import os
    import shutil as _sh

    from dataset_crawler_spark.plans.queries import pack_token_bins
    from dataset_crawler_spark.sources.training_export import (
        read_training_shards,
        verify_manifest,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = pack_token_bins(spark, SF_DIR)
    out = str(tmp_path / "export")
    summary = write_training_shards(docs, plan, out)
    assert summary["n_docs"] == docs.count()

    back = read_training_shards(spark, out)
    assert back.count() == summary["n_docs"]
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # per-(shard, bin) token sums match the assignment plan exactly
    key = lambda df: {  # noqa: E731
        (r.shard, r.bin_id): r.s
        for r in df.groupBy("shard", "bin_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    assert key(back) == key(plan)
    # text round-trips
    one = back.limit(1).collect()[0]
    src = docs.where(F.col("doc_id") == one.doc_id).collect()[0]
    assert one.text == src.text
    verify_manifest(spark, out)

    # determinism: second export has identical content
    out2 = str(tmp_path / "export2")
    write_training_shards(docs, plan, out2)
    b2 = read_training_shards(spark, out2)
    assert back.exceptAll(b2).unionByName(b2.exceptAll(back)).count() == 0

    # integrity: dropping a shard dir must be caught
    shard_dirs = [p for p in os.listdir(f"{out}/shards") if p.startswith("shard=")]
    _sh.rmtree(f"{out}/shards/{shard_dirs[0]}")
    try:
        verify_manifest(spark, out)
        raise AssertionError("verify_manifest accepted a corrupted artifact")
    except ValueError:
        pass


def test_incremental_substr_index_through_store(spark, tmp_path):
    """ExactSubstr twin of the minhash/signlsh lifecycle: three-round
    ingestion through a SnapshotStore-persisted window-hash index — the
    union of per-round dup-span outputs must equal the batch span set under
    the ingestion total order (round, doc_id, i), computed here by an
    independent winner election. Crash-safety: an appended-but-uncommitted
    round's windows stay invisible to the next round's probe."""
    from dataset_crawler_spark.operators import substr as SUB
    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    K = 8
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    store = SnapshotStore(str(tmp_path / "store"), spark)

    got = set()
    for rnd in range(3):
        new = docs.where(F.col("doc_id") % 3 == rnd)
        idx = store.read("substr_windows") if rnd else None
        if idx is not None and not idx.columns:
            idx = None
        win = SUB.window_hashes(new, K)
        spans = SUB.merge_spans(SUB.incremental_dup_starts(idx, win), K)
        got |= {(r.doc_id, r.s, r.e) for r in spans.collect()}
        store.append("substr_windows", win, rnd)
        store.commit_round(rnd)

    # independent batch twin: winner = min (round, doc_id, i) per hash
    wall = SUB.window_hashes(docs, K).withColumn("rnd", F.col("doc_id") % 3)
    g = wall.groupBy("h").agg(
        F.min(F.struct("rnd", "doc_id", "i")).alias("w"), F.count("*").alias("n")
    )
    marked = (
        wall.join(g, "h")
        .where(
            (F.col("n") > 1)
            & ~(
                (F.col("rnd") == F.col("w.rnd"))
                & (F.col("doc_id") == F.col("w.doc_id"))
                & (F.col("i") == F.col("w.i"))
            )
        )
        .select("doc_id", "i")
    )
    want = {
        (r.doc_id, r.s, r.e) for r in SUB.merge_spans(marked, K).collect()
    }
    assert got == want
    assert len(want) > 0

    # crash-safety: an appended-but-uncommitted round is invisible
    store.append("substr_windows", SUB.window_hashes(docs.limit(0), K), 99)
    visible = store.read("substr_windows")
    assert {
        r.crawl_id for r in visible.select("crawl_id").distinct().collect()
    } == {0, 1, 2}


def test_substring_removal_export_no_dup_window_survives(spark, tmp_path):
    """Lee et al. §4 end to end: plant exact duplicated runs across docs,
    run the removal gate, export the cleaned corpus through the shard sink,
    and re-scan the ARTIFACT — no k-token window may occur twice, the
    global first occurrence survives intact, every non-winner occurrence is
    cut, and the manifest verifies on the cleaned totals."""
    from dataset_crawler_spark.operators import substr as SUB
    from dataset_crawler_spark.sources.training_export import (
        pack_assignments,
        read_training_shards,
        verify_manifest,
        write_training_shards,
    )

    K = 8
    run = " ".join(f"d{i}" for i in range(12))  # the planted 12-token run
    docs = spark.createDataFrame(
        [
            (0, f"a0 a1 a2 {run} a3 a4 a5"),        # winner (first occurrence)
            (1, f"b0 b1 {run} b2 b3"),               # dup: run must be cut
            (2, f"c0 c1 c2 c3 c4 {run}"),            # dup at tail: cut
            (3, "e0 e1 e2 e3 e4 e5 e6 e7 e8 e9"),    # unique: untouched
        ],
        "doc_id long, text string",
    )
    cleaned = SUB.remove_duplicate_substrings(docs, k=K)
    out = str(tmp_path / "export")
    summary = write_training_shards(
        cleaned, pack_assignments(cleaned, n_shards=2, budget=16), out
    )
    assert summary["n_docs"] == 4
    verify_manifest(spark, out)

    back = read_training_shards(spark, out)
    texts = {r.doc_id: r.text for r in back.collect()}
    assert texts[0] == f"a0 a1 a2 {run} a3 a4 a5"  # winner keeps the run
    assert "d0" not in texts[1] and texts[1] == "b0 b1 b2 b3"
    assert texts[2] == "c0 c1 c2 c3 c4"
    assert texts[3] == "e0 e1 e2 e3 e4 e5 e6 e7 e8 e9"

    # the artifact-level guarantee: no duplicated k-token window survives
    rescan = SUB.window_hashes(back.select("doc_id", "text"), K)
    worst = (
        rescan.groupBy("h").count().agg(F.max("count").alias("m")).collect()[0].m
    )
    assert worst == 1


def test_substring_exact_dedup_hypothesis_vs_python_twin(spark, tmp_path):
    """Property: on arbitrary small-alphabet corpora (forcing heavy window
    collisions, nested/adjacent/overlapping duplicate runs), the operator
    matches a from-first-principles Python implementation of the spec:
    every k-window keyed by CONTENT, one global winner under (doc_id, i),
    other occurrences merged into maximal spans."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dataset_crawler_spark.plans.queries import _SUBSTR_K, dedup_substring_exact

    k = _SUBSTR_K
    doc = st.lists(st.sampled_from("ab"), min_size=1, max_size=3 * k)

    def python_twin(token_lists):
        windows = {}  # content -> list[(doc, i)] in (doc, i) order
        for d_id, t in enumerate(token_lists):
            for i in range(len(t) - k + 1):
                windows.setdefault(tuple(t[i : i + k]), []).append((d_id, i))
        marked = {}
        for occ in windows.values():
            if len(occ) > 1:
                for d_id, i in occ[1:]:  # occ is already in (doc, i) order
                    marked.setdefault(d_id, set()).add(i)
        out = {}
        for d_id, t in enumerate(token_lists):
            spans, cur = [], None
            for i in sorted(marked.get(d_id, ())):
                if cur and i < cur[1]:
                    cur[1] = max(cur[1], i + k)
                else:
                    cur = [i, i + k]
                    spans.append(cur)
            n_dup = sum(e - s for s, e in spans)
            out[d_id] = (len(t), len(spans), n_dup, round(n_dup / len(t), 4))
        return out

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(doc, min_size=1, max_size=8))
    def check(token_lists):
        sf = _docs_fixture(spark, tmp_path, [" ".join(t) for t in token_lists])
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_spans, r.n_dup_tokens, r.dup_token_frac)
            for r in dedup_substring_exact(spark, sf).collect()
        }
        assert got == python_twin(token_lists)

    check()


def test_dsir_weights_match_python_twin(spark, tmp_path):
    import math

    from dataset_crawler_spark.plans.queries import (
        _DSIR_B,
        _DSIR_TARGET,
        dsir_importance_weights,
    )

    rows = [
        "alpha beta gamma", "alpha alpha delta", "beta beta beta",
        "epsilon zeta", "alpha beta", "zeta zeta epsilon delta",
    ]
    sf_dir = _docs_fixture(spark, tmp_path, rows)
    # python twin from first principles
    docs = [(i, t, f"src{i % 3}") for i, t in enumerate(rows)]
    ct, cr = [0] * _DSIR_B, [0] * _DSIR_B
    for _i, t, src in docs:
        tgt = src in _DSIR_TARGET
        for w in t.split(" "):
            b = h60_py(w) % _DSIR_B
            if tgt:
                ct[b] += 1
            else:
                cr[b] += 1
    T, R = sum(ct), sum(cr)
    want = {}
    for i, t, src in docs:
        if src in _DSIR_TARGET:
            continue
        toks = t.split(" ")
        s = sum(
            math.log((ct[h60_py(w) % _DSIR_B] + 1.0) / (T + _DSIR_B))
            - math.log((cr[h60_py(w) % _DSIR_B] + 1.0) / (R + _DSIR_B))
            for w in toks
        )
        want[i] = (len(toks), round(s / len(toks), 4))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in dsir_importance_weights(spark, sf_dir).collect()
    }
    assert got == want


def test_pii_scrub_leaves_no_pattern_behind(spark):
    import re

    from dataset_crawler_spark.plans.queries import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
        text_pii_scrub,
    )

    rows = text_pii_scrub(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_emails"] >= 1 and r["n_ips"] >= 1 and r["n_phones"] >= 1
        for pat in (_PII_EMAIL, _PII_IP, _PII_PHONE):
            assert re.search(pat, r["scrubbed"]) is None, r["scrubbed"]
        assert "<EMAIL>" in r["scrubbed"] and "<IP>" in r["scrubbed"]


def test_crawl_trap_hosts_flags_planted_traps_exactly(spark):
    from dataset_crawler_spark.plans.queries import _TRAP_SOURCES, crawl_trap_hosts

    rows = crawl_trap_hosts(spark, "/root/testdata/sf0.001").collect()
    flagged = {r["host"] for r in rows if r["is_trap"]}
    assert flagged == {f"{s}.example.org" for s in _TRAP_SOURCES}
    by_host = {r["host"]: r for r in rows}
    # planted explosion: 3 param-distinct URLs per path on trap hosts
    assert by_host["src2.example.org"]["urls_per_path"] == 3.0
    assert by_host["src0.example.org"]["urls_per_path"] == 1.0


def test_split_leakage_safe_never_splits_a_cluster(spark):
    from collections import Counter

    from dataset_crawler_spark.plans.queries import (
        _minhash_pairs,
        split_leakage_safe,
    )

    sf = "/root/testdata/sf0.001"
    rows = split_leakage_safe(spark, sf).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # the invariant the operator exists for: one split per cluster
    assert all(len(s) == 1 for s in by_cluster.values())
    # near-duplicate pairs (the actual leakage risk) land in the same split
    split_of = {r.doc_id: r.split for r in rows}
    pairs = _minhash_pairs(spark, sf).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert split_of[p.doc_a] == split_of[p.doc_b]
    # hash split is roughly 80/10/10 over clusters
    c = Counter(next(iter(s)) for s in
                (set([r.split for r in rows if r.cluster_id == cid]) for cid in by_cluster))
    n = sum(c.values())
    assert 0.6 < c["train"] / n < 0.95


def test_countmin_sketch_is_merge_associative(spark):
    """The property that makes the CMS a 1000-executor primitive: sketches
    built independently over disjoint corpus halves, added elementwise,
    equal the sketch built over the whole corpus EXACTLY (counter-for-
    counter, not approximately) — so map-side partial aggregation and
    cross-executor merges are lossless by construction."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.functions.hashing import h60
    from dataset_crawler_spark.plans.queries import _CMS_D, _CMS_W, _t

    sf = "/root/testdata/sf0.001"
    tok = _t(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    js = spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))

    def cms(df):
        return (
            df.crossJoin(F.broadcast(js))
            .select(
                "j",
                F.pmod(
                    h60(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("w"))),
                    F.lit(_CMS_W),
                ).alias("idx"),
            )
            .groupBy("j", "idx")
            .agg(F.count("*").alias("cnt"))
        )

    half_a = tok.where(F.col("doc_id").cast("long") % 2 == 0)
    half_b = tok.where(F.col("doc_id").cast("long") % 2 == 1)
    merged = (
        cms(half_a)
        .unionByName(cms(half_b))
        .groupBy("j", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r.j, r.idx): r.cnt for r in cms(tok).collect()}
    got = {(r.j, r.idx): r.cnt for r in merged.collect()}
    assert got == full and len(full) > 0


def test_hll_sketch_is_merge_associative_and_bounded(spark):
    """HLL registers built over disjoint halves, merged by MAX, equal the
    whole-corpus registers EXACTLY — the lossless map-side-combine property
    that makes per-host distinct-URL cardinality a 1000-executor O(2^p)
    aggregate. The estimate itself must land within 3σ of the exact
    distinct count (σ = 1.04/√m), and the register frame can never exceed
    2^p rows per group."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.operators.sketches import (
        HLL_M,
        hll_estimate,
        hll_sketch,
    )
    from dataset_crawler_spark.plans.queries import _t

    li = _t(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_returnflag", F.col("l_orderkey").cast("string").alias("k")
    )

    def regs(df):
        return hll_sketch(df, ["l_returnflag"], F.col("k"))

    merged = (
        regs(li.where(F.crc32("k") % 2 == 0))
        .unionByName(regs(li.where(F.crc32("k") % 2 == 1)))
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    full = {(r.l_returnflag, r.bucket): r.max_rho for r in regs(li).collect()}
    got = {(r.l_returnflag, r.bucket): r.max_rho for r in merged.collect()}
    assert got == full and len(full) > 0
    # bounded summary: at most 2^p registers per group
    from collections import Counter

    per_group = Counter(k[0] for k in full)
    assert all(v <= HLL_M for v in per_group.values())
    # 3-sigma accuracy vs exact (sigma = 1.04/sqrt(m) ~ 6.5% at p=8)
    est = {
        r.l_returnflag: r.hll_estimate
        for r in hll_estimate(regs(li), ["l_returnflag"]).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("k").alias("n")).collect()
    }
    for flag, n in exact.items():
        assert abs(est[flag] - n) / n < 3 * 1.04 / (HLL_M ** 0.5), (flag, est[flag], n)


def test_new_topk_ops_partitioning_invariance(spark, tmp_path):
    """BM25 and the weighted sample pick their top-k via per-partition heaps
    over FP-scored keys — the result must be byte-identical at any input
    partitioning (the determinism the fixed-order score expressions and
    (score, doc_id) tie-breaks exist to guarantee)."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.plans.queries import (
        sample_weighted_take,
        search_bm25_topk,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for n_parts, sub in ((1, "one"), (13, "many")):
        src.repartition(n_parts).write.mode("overwrite").parquet(
            f"{tmp_path}/{sub}/documents.parquet"
        )
    for fn in (search_bm25_topk, sample_weighted_take):
        one = [tuple(r) for r in fn(spark, f"{tmp_path}/one").collect()]
        many = [tuple(r) for r in fn(spark, f"{tmp_path}/many").collect()]
        assert one == many and len(one) > 0  # ordered comparison: rank matters


def test_quality_classifier_matches_python_twin(spark, tmp_path):
    """fastText-shape classifier from first principles: hashed unigram+bigram
    NB-log-odds weights quantized to int fixed-point, exact-integer doc score
    and keep gate — the quantization is what makes the gate bitwise
    deterministic, so the twin must reproduce it exactly."""
    import math

    from dataset_crawler_spark.plans.queries import (
        _FTQ_B,
        _FTQ_Q,
        text_classifier_quality,
    )

    docs = [
        (0, "alpha beta gamma alpha", "en"),
        (1, "alpha beta", "en"),
        (2, "delta epsilon zeta", "de"),
        (3, "alpha delta delta", "fr"),
        (4, "zeta zeta epsilon", "en"),
        (5, "gamma", "de"),  # single token: no bigrams
    ]
    spark.createDataFrame(
        [(i, t, lang, f"src{i % 3}", len(t)) for i, t, lang in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    def rhalf(x):  # ROUND half-away-from-zero (Spark/DuckDB), not banker's
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def grams(text):
        t = text.split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    ct, cr = [0] * _FTQ_B, [0] * _FTQ_B
    for _i, t, lang in docs:
        for g in grams(t):
            (ct if lang == "en" else cr)[h60_py(g) % _FTQ_B] += 1
    tt, rt = sum(ct), sum(cr)
    wq = [
        rhalf(
            (math.log((ct[b] + 1.0) / (tt + _FTQ_B))
             - math.log((cr[b] + 1.0) / (rt + _FTQ_B))) * _FTQ_Q
        )
        for b in range(_FTQ_B)
    ]
    npos = sum(1 for _, _, lang in docs if lang == "en")
    bq = rhalf(math.log((npos + 1.0) / (len(docs) - npos + 1.0)) * _FTQ_Q)
    want = {}
    for i, t, lang in docs:
        gs = grams(t)
        s = sum(wq[h60_py(g) % _FTQ_B] for g in gs)
        score_q = s + bq * len(gs)
        want[i] = (
            len(gs),
            round(s / (len(gs) * _FTQ_Q) + bq / _FTQ_Q, 4),
            score_q,
            score_q > 0,
        )
    got = {
        r["doc_id"]: (r["n_grams"], r["quality_score"], r["score_q"], r["keep"])
        for r in text_classifier_quality(spark, str(tmp_path)).collect()
    }
    assert got == want
    # directional sanity on this tiny fit: the en doc whose grams all score
    # positive is kept; the fr doc dominated by de-only "delta" is rejected
    assert got[0][3] is True and got[3][3] is False


# -- round-4 additions: Poisson change-rate + DUST rule mining ---------------


def test_change_rate_estimator_matches_closed_form(spark):
    """λ̂ and p_stale match the Cho & Garcia-Molina closed forms exactly
    for every possible (n, X) counter pair at n=12, the X=0 case is
    IEEE +0.0 (the positive-log form — -ln(1.0) would be -0.0 and hash
    differently across engines), and λ̂ is strictly monotone in X."""
    import math
    import struct

    from dataset_crawler_spark.operators.scheduler import change_rate_estimate

    n = 12
    rows = [(x, r, r < x) for x in range(n + 1) for r in range(n)]
    obs = spark.createDataFrame(rows, "doc_id int, r int, changed boolean")
    got = {
        r.doc_id: r
        for r in change_rate_estimate(obs).collect()
    }
    prev = -1.0
    for x in range(n + 1):
        r = got[x]
        assert r.n_obs == n and r.n_changes == x
        assert r.lambda_hat == round(math.log((n + 0.5) / (n - x + 0.5)), 4)
        assert r.p_stale == round(x / (n + 0.5), 4)
        assert r.lambda_hat > prev
        prev = r.lambda_hat
    # +0.0, not -0.0: sign bit clear in the wire value
    assert struct.pack(">d", got[0].lambda_hat)[0] & 0x80 == 0


def test_dust_rules_recover_planted_laws(spark):
    """mine_dust_rules recovers exactly the planted alias laws from a
    content-fingerprint table: per-pair middles generalize across hosts,
    sub-threshold organic pairs are filtered, and over-cap fingerprint
    groups (template pages) never generate pairs."""
    from dataset_crawler_spark.operators.discovery import mine_dust_rules

    rows = []
    for i in range(12):
        base = f"https://h{i}.org/page{i}"
        rows += [(base, i), (base + "/index.html", i)]
    # organic noise: two URLs sharing content by coincidence (support 1)
    rows += [("https://h0.org/a", 100), ("https://h1.org/b", 100)]
    # a template fingerprint on 9 URLs: over the cap, must yield nothing
    rows += [(f"https://t{j}.org/parked", 200) for j in range(9)]
    df = spark.createDataFrame(rows, "url string, fp int")

    got = {
        (r.rule_from, r.rule_to): r
        for r in mine_dust_rules(df, min_support=5, fp_group_cap=6).collect()
    }
    assert set(got) == {("", "/index.html")}
    assert got[("", "/index.html")].support == 12
    assert got[("", "/index.html")].n_hosts == 12


def test_dust_rules_middle_extraction_is_lcp_lcs_exact(spark):
    """The substitution middle is exactly the string between the longest
    common prefix and the longest common suffix — including the overlap
    cap (lcp + lcs ≤ min length) that keeps e.g. prefix-pairs from
    double-counting shared characters."""
    from dataset_crawler_spark.operators.discovery import mine_dust_rules

    cases = [
        # (a, b, expected_from, expected_to)
        ("https://x.org/p?utm=1", "https://x.org/p?utm=2", "1", "2"),
        ("https://x.org/aa", "https://x.org/aaaa", "", "aa"),  # overlap cap
        ("https://s.org/d", "https://www.s.org/d", "", "www."),
    ]
    rows = [(a, i) for i, (a, _, _, _) in enumerate(cases)] + [
        (b, i) for i, (_, b, _, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "url string, fp int")
    got = mine_dust_rules(df, min_support=1, fp_group_cap=6).collect()
    want = {(f, t) for (_, _, f, t) in cases}
    assert {(r.rule_from, r.rule_to) for r in got} == want


def test_apply_dust_rules_collapses_aliases(spark):
    """Mined rules applied at frontier ingest collapse planted aliases onto
    their canonical forms; validation mode keeps a rewrite only when the
    rewritten URL is actually known, so an overreaching middle cannot
    invent URLs."""
    from dataset_crawler_spark.operators.discovery import (
        apply_dust_rules,
        mine_dust_rules,
    )

    rows = []
    for i in range(12):
        base = f"https://h{i}.org/page{i}"
        rows += [(base, i), (base + "/index.html", i)]
    fps = spark.createDataFrame(rows, "url string, fp int")
    rules = mine_dust_rules(fps, min_support=5, fp_group_cap=6)

    frontier = spark.createDataFrame(
        [
            ("https://h3.org/page3/index.html",),   # alias → collapses
            ("https://h3.org/page3",),              # canonical → unchanged
            ("https://new.org/fresh/index.html",),  # unseen but rule applies
        ],
        "url string",
    )
    got = {
        r.url: r.url_collapsed
        for r in apply_dust_rules(frontier, rules).collect()
    }
    assert got["https://h3.org/page3/index.html"] == "https://h3.org/page3"
    assert got["https://h3.org/page3"] == "https://h3.org/page3"
    assert got["https://new.org/fresh/index.html"] == "https://new.org/fresh"

    # validated mode: only rewrites landing on KNOWN urls survive
    known = spark.createDataFrame([("https://h3.org/page3",)], "url string")
    got_v = {
        r.url: r.url_collapsed
        for r in apply_dust_rules(frontier, rules, validate_against=known).collect()
    }
    assert got_v["https://h3.org/page3/index.html"] == "https://h3.org/page3"
    assert got_v["https://new.org/fresh/index.html"] == (
        "https://new.org/fresh/index.html"  # rewrite not known → kept original
    )


def test_incremental_components_equals_batch(spark):
    """Quotient-graph incremental CC ≡ batch CC over the union edge set, on
    the shapes that break naive approaches: a late old-old edge bridging
    two standing clusters, a new node that becomes its component's new min
    (forces relabeling old members), and an isolated new singleton."""
    from dataset_crawler_spark.operators.clustering import (
        connected_components,
        incremental_components,
    )

    # old world: {10,11,12} chained, {20,21} — two clusters + loners 30, 40
    old_edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], "doc_a int, doc_b int"
    )
    old_nodes = spark.createDataFrame([(n,) for n in (10, 11, 12, 20, 21, 30, 40)], "node int")
    labels0 = connected_components(old_edges, nodes=old_nodes)

    # new round: 5 joins cluster-10 and becomes its min; a late old-old edge
    # bridges 12↔20; 99 arrives isolated; 7 is surfaced ONLY by an edge (the
    # caller's new-node universe missed it — it must still get a label)
    new_edges = spark.createDataFrame(
        [(5, 11), (12, 20), (7, 21)], "doc_a int, doc_b int"
    )
    new_nodes = spark.createDataFrame([(5,), (99,)], "node int")
    got = {
        r.node: r.comp
        for r in incremental_components(labels0, new_edges, new_nodes=new_nodes).collect()
    }

    batch = {
        r.node: r.comp
        for r in connected_components(
            old_edges.unionByName(new_edges),
            nodes=old_nodes.unionByName(new_nodes),
        ).collect()
    }
    assert got == batch
    assert got[5] == got[10] == got[12] == got[20] == got[21] == got[7] == 5
    assert got[99] == 99 and got[30] == 30 and got[40] == 40


def test_incremental_cc_through_store(spark, tmp_path):
    """Clustering twin of the minhash/signlsh/substr store lifecycles:
    three-round ingestion where each round's new nodes + newly-observable
    edges fold into SnapshotStore-persisted labels via
    incremental_components; the final standing labels must equal batch CC
    over the full edge set, and labels survive the parquet roundtrip
    between rounds (the fold always reads the PREVIOUS round's committed
    table, never an in-session frame)."""
    from dataset_crawler_spark.operators.clustering import (
        connected_components,
        incremental_components,
    )
    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    did = F.col("doc_id").cast("string")
    h = F.conv(F.substring(F.md5(did), 1, 15), 16, 10).cast("long")
    chain = (
        docs.where(F.pmod(h, F.lit(3)) == 0)
        .select("doc_id", (F.col("doc_id") + 1).alias("b"))
        .join(docs.select(F.col("doc_id").alias("b")), "b")
        .select(F.col("doc_id").alias("doc_a"), F.col("b").alias("doc_b"))
    )
    skip = (
        docs.where(F.pmod(h, F.lit(5)) == 0)
        .select("doc_id", (F.col("doc_id") + 7).alias("b"))
        .join(docs.select(F.col("doc_id").alias("b")), "b")
        .select(F.col("doc_id").alias("doc_a"), F.col("b").alias("doc_b"))
    )
    edges = chain.unionByName(skip)
    # an edge becomes observable when its LAST endpoint's round arrives
    arrival = F.greatest(
        F.pmod(F.col("doc_a"), F.lit(3)), F.pmod(F.col("doc_b"), F.lit(3))
    )

    store = SnapshotStore(str(tmp_path / "store"), spark)
    for rnd in range(3):
        new_nodes = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == rnd).select(
            F.col("doc_id").alias("node")
        )
        new_edges = edges.where(arrival == rnd)
        if rnd == 0:
            labels = connected_components(new_edges, nodes=new_nodes)
        else:
            prev = store.read("cc_labels", as_of=rnd - 1)
            latest = prev.agg(F.max("crawl_id")).first()[0]
            prev = prev.where(F.col("crawl_id") == latest).select("node", "comp")
            labels = incremental_components(prev, new_edges, new_nodes=new_nodes)
        store.append(
            "cc_labels", labels.withColumn("crawl_id", F.lit(rnd).cast("int")), rnd
        )
        store.commit_round(rnd)

    final = store.read("cc_labels", as_of=2).where(F.col("crawl_id") == 2)
    got = {(r.node, r.comp) for r in final.collect()}
    batch = connected_components(
        edges, nodes=docs.select(F.col("doc_id").alias("node"))
    )
    want = {(r.node, r.comp) for r in batch.collect()}
    assert got == want
    assert len({c for _, c in want}) < len(want)  # non-trivial clusters exist


def test_triangle_counts_planted_clique_and_normalization(spark):
    """triangle_counts on a hand graph: a 4-clique (4 triangles, every
    member in exactly 3), a triangle-free path, and deliberately dirty
    input (reversed duplicates, a self-loop) that normalization must
    absorb. Every count is integer-exact by construction."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.operators.graph import triangle_counts

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(4, 5), (5, 6)]
    dirty = [(1, 0), (2, 1), (7, 7), (5, 4)]  # reversed dups + self-loop
    edges = spark.createDataFrame(clique + path + dirty, "src long, dst long")
    rows = {r.node: r for r in triangle_counts(edges).collect()}

    assert set(rows) == {0, 1, 2, 3, 4, 5, 6}  # self-loop node 7 dropped
    for n in range(4):
        assert rows[n].degree == 3 and rows[n].triangles == 3
    assert rows[4].triangles == 0 and rows[6].triangles == 0
    assert rows[5].degree == 2 and rows[5].triangles == 0
    total = sum(r.triangles for r in rows.values())
    assert total == 3 * 4  # 4 triangles, counted once per member

    # direction/duplication invariance: fully reversed edge list
    rev = spark.createDataFrame(
        [(b, a) for a, b in clique + path], "src long, dst long"
    )
    again = {r.node: (r.degree, r.triangles) for r in triangle_counts(rev).collect()}
    assert again == {n: (r.degree, r.triangles) for n, r in rows.items()}


def test_registered_domain_psl_semantics(spark):
    """Hand probes for the public-suffix extraction: same registrant across
    subdomains of a normal suffix, DIFFERENT registrants under a private
    suffix, longest-match beats the plain TLD, unknown TLD falls back to
    last-label. These are the exact cases that make per-host politeness
    either unfair or evadable when gotten wrong."""
    from dataset_crawler_spark.functions.urls import registered_domain

    suffixes = ["com", "io", "co.uk", "github.io"]
    probes = {
        "www.x.co.uk": ("x.co.uk", "co.uk"),
        "cdn.x.co.uk": ("x.co.uk", "co.uk"),       # same registrant
        "a.github.io": ("a.github.io", "github.io"),
        "b.github.io": ("b.github.io", "github.io"),  # different registrant
        "deep.sub.y.com": ("y.com", "com"),
        "plain.io": ("plain.io", "io"),
        "box.internal": ("box.internal", "internal"),  # unknown TLD fallback
    }
    df = spark.createDataFrame([(h,) for h in probes], "host string")
    reg, suf = registered_domain("host", suffixes)
    got = {
        r.host: (r.reg, r.suf)
        for r in df.select("host", reg.alias("reg"), suf.alias("suf")).collect()
    }
    assert got == probes


def test_incremental_hll_registers_through_store(spark, tmp_path):
    """Three-round cardinality ingestion through SnapshotStore-persisted HLL
    registers: the merged standing registers must equal the from-scratch
    batch registers EXACTLY (bitwise — MAX-merge is lossless), and an
    appended-but-uncommitted round's registers must stay invisible."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.operators.sketches import hll_merge, hll_sketch
    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", F.col("l_orderkey").cast("string").alias("k")
    )
    store = SnapshotStore(str(tmp_path / "store"), spark)

    for rnd in range(3):
        new = li.where(F.crc32("k") % 3 == rnd)
        regs = hll_sketch(new, ["l_returnflag"], F.col("k"))
        store.append("hll_regs", regs, rnd)
        store.commit_round(rnd)

    standing = hll_merge([store.read("hll_regs").drop("crawl_id")], ["l_returnflag"])
    batch = hll_sketch(li, ["l_returnflag"], F.col("k"))
    got = {(r.l_returnflag, r.bucket): r.max_rho for r in standing.collect()}
    want = {(r.l_returnflag, r.bucket): r.max_rho for r in batch.collect()}
    assert got == want and len(want) > 0

    # crash-safety: uncommitted append is invisible to the standing view
    store.append("hll_regs", hll_sketch(li.limit(0), ["l_returnflag"], F.col("k")), 99)
    seen_rounds = {
        r.crawl_id for r in store.read("hll_regs").select("crawl_id").distinct().collect()
    }
    assert seen_rounds == {0, 1, 2}


# --------------------------------------------------------------------------
# SURT / CDX index, token entropy, k-core, warm-start pagerank (round 4)
# --------------------------------------------------------------------------


def test_surt_key_normalization_hand_probes(spark):
    """surt_key on hand URLs: scheme/port/case/trailing-slash/query-order
    variants of one resource must collapse to ONE key; only a LEADING
    ``www.`` is stripped; fragments never reach the key; empty path ⇒ '/'."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.functions.urls import surt_key

    cases = [
        ("https://WWW.Example.ORG:443/a/b/?y=2&x=1", "org,example)/a/b?x=1&y=2"),
        ("http://example.org/a/b?x=1&y=2", "org,example)/a/b?x=1&y=2"),
        ("https://example.org", "org,example)/"),
        ("https://example.org/#frag", "org,example)/"),
        ("https://sub.www.example.org/p", "org,example,www,sub)/p"),
        ("https://example.org/p?a=1", "org,example)/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = dict(
        df.select("url", surt_key("url").alias("s")).collect()
    )
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_cdx_index_collapses_dirty_variants(spark):
    """crawl_cdx_index at sf0.001: every doc's 2-4 dirty-variant captures
    must collapse to exactly ONE surt key per doc (index row count == doc
    count), capture counts must match the planted 1 + 1 + doc_id % 3, and
    version counts must never exceed capture counts."""
    import re

    from dataset_crawler_spark.plans.queries import crawl_cdx_index

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = crawl_cdx_index(spark, SF_DIR).collect()
    assert len(rows) == n_docs
    pat = re.compile(r"^org,example,[a-z0-9_\-]+\)/p/[0-9]+\?a=1&b=2$")
    for r in rows:
        assert pat.match(r.surt), r.surt
        assert 2 <= r.n_captures <= 4
        assert 1 <= r.n_versions <= r.n_captures
        assert r.first_ts == 0 and r.last_ts == r.n_captures - 1
    assert {r.n_captures for r in rows} == {2, 3, 4}


def test_token_entropy_hand_values(spark, tmp_path):
    """text_token_entropy on hand corpora with closed-form entropies:
    all-same tokens ⇒ 0 bits (gated out), all-distinct ⇒ log2(n) bits and
    ratio 1.0, a 2+2 mix ⇒ exactly 1 bit; single-token doc hits the
    ratio guard instead of dividing by log2(1)=0."""
    from dataset_crawler_spark.plans.queries import text_token_entropy

    sf = _docs_fixture(
        spark,
        tmp_path,
        [
            "a a a a",          # H = 0
            "a b c d e f g h",  # H = 3, ratio 1.0 — exactly at the gate min
            "a a b b",          # H = 1
            "solo",             # 1 token — ratio guard
        ],
    )
    rows = {r.doc_id: r for r in text_token_entropy(spark, sf).collect()}
    assert rows[0].token_entropy == 0.0 and rows[0].keep is False
    assert rows[0].n_tokens == 4 and rows[0].n_types == 1
    assert rows[1].token_entropy == 3.0 and rows[1].entropy_ratio == 1.0
    assert rows[1].keep is True  # >= min bound inclusive
    assert rows[2].token_entropy == 1.0 and rows[2].entropy_ratio == 0.5
    assert rows[3].n_tokens == 1 and rows[3].entropy_ratio == 0.0
    assert rows[3].token_entropy == 0.0 and rows[3].keep is False


def test_kcore_planted_structure(spark):
    """kcore on a hand graph: a 4-clique survives k=3 peeling with every
    member at core degree 3; an attached pendant chain peels away in a
    CASCADE (removing the chain tip drops the next node under k); k=4
    peels the entire graph to empty. Dirty input (reversed duplicates,
    self-loop) must be absorbed by normalization."""
    from dataset_crawler_spark.operators.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 4), (4, 5)]  # 4- and 5- peel in cascade under k=3... no:
    # deg(4)=2, deg(5)=1 — both below 3, but 4 only falls AFTER 5 is gone
    # for the cascade ordering; either way both leave the 3-core.
    dirty = [(1, 0), (2, 1), (7, 7)]
    edges = spark.createDataFrame(clique + chain + dirty, "src long, dst long")

    core3 = {r.node: r.core_degree for r in kcore(edges, k=3).collect()}
    assert core3 == {0: 3, 1: 3, 2: 3, 3: 3}

    core4 = kcore(edges, k=4).collect()
    assert core4 == []

    # direction invariance: fully reversed edges give the same core
    rev = spark.createDataFrame(
        [(b, a) for a, b in clique + chain], "src long, dst long"
    )
    assert {r.node: r.core_degree for r in kcore(rev, k=3).collect()} == core3


def test_kcore_fixpoint_at_driver_scale(spark):
    """graph_doc_kcore's fixed peel count must BE the fixpoint at the
    driver's oracle scale: two extra rounds change nothing (otherwise the
    registered result would be an artifact of the iteration constant, not
    the k-core)."""
    from dataset_crawler_spark.operators import graph as G
    from dataset_crawler_spark.plans import queries as QL

    sf01 = "/root/testdata/sf0.01"
    base = {
        (r.node, r.core_degree)
        for r in QL.graph_doc_kcore(spark, sf01).collect()
    }
    assert base, "4-core unexpectedly empty — planted graph density changed"

    d = QL._t(spark, sf01, "documents").select("doc_id")
    from pyspark.sql import functions as F

    from dataset_crawler_spark.functions.hashing import h60

    n = d.agg(F.count("*").alias("n_docs"))
    i = F.col("doc_id")
    raw = d.crossJoin(F.broadcast(n)).select(
        i.alias("src"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(2)),
                lambda j: F.pmod(
                    h60(
                        F.concat(
                            F.lit("lk|"), i.cast("string"),
                            F.lit("|"), j.cast("string"),
                        )
                    ),
                    F.col("n_docs"),
                ),
            )
        ).alias("dst"),
    )
    more = {
        (r.node, r.core_degree)
        for r in G.kcore(raw, k=QL._KCORE_K, n_iter=QL._KCORE_ITER + 2).collect()
    }
    assert more == base


def test_pagerank_warm_start_semantics(spark):
    """Warm-start pagerank: (1) seeding with the fixpoint is STATIONARY —
    two more iterations move nothing beyond float noise; (2) at equal
    refresh budget, warm-starting from the half-graph ranks lands closer
    to the full-graph fixpoint than a cold start (the incremental-crawl
    payoff); (3) nodes absent from the init vector fall back to uniform."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.operators.graph import pagerank
    from dataset_crawler_spark.plans import queries as QL

    hosts, edges = QL._host_graph(spark, SF_DIR)
    fix = pagerank(edges, nodes=hosts, n_iter=40)
    again = pagerank(edges, nodes=hosts, n_iter=2, init=fix)
    drift = (
        fix.withColumnRenamed("rank", "a")
        .join(again.withColumnRenamed("rank", "b"), "node")
        .agg(F.max(F.abs(F.col("a") - F.col("b"))).alias("d"))
        .collect()[0]
        .d
    )
    assert drift < 1e-9

    from dataset_crawler_spark.functions.hashing import h60

    e1 = edges.where(
        F.pmod(
            h60(F.concat(F.lit("inc|"), F.col("src"), F.lit(">"), F.col("dst"))),
            F.lit(2),
        )
        == 0
    )
    warm0 = pagerank(e1, nodes=hosts, n_iter=QL._IPR_T1)

    def l1_to_fix(r):
        return (
            fix.withColumnRenamed("rank", "a")
            .join(r.withColumnRenamed("rank", "b"), "node")
            .agg(F.sum(F.abs(F.col("a") - F.col("b"))).alias("s"))
            .collect()[0]
            .s
        )

    warm = pagerank(edges, nodes=hosts, n_iter=QL._IPR_T2, init=warm0)
    cold = pagerank(edges, nodes=hosts, n_iter=QL._IPR_T2)
    assert l1_to_fix(warm) < l1_to_fix(cold)

    # partial init: nodes missing from the vector seed at uniform 1/n
    some = fix.limit(1)
    partial = pagerank(edges, nodes=hosts, n_iter=0, init=some)
    n = hosts.count()
    vals = {r.node: r.rank for r in partial.collect()}
    seeded = {r.node: r.rank for r in some.collect()}
    for node, rank in vals.items():
        want = seeded.get(node, 1.0 / n)
        assert abs(rank - want) < 1e-12


def test_hyperball_registers_equal_exact_ball_sketch(spark):
    """HyperBall's state after round t must EQUAL the plain HLL sketch of
    the exact t-ball (max-merge along edges commutes with set union), so
    (hll_s, v_empty, nf_estimate) per node/round must match the estimate of
    the BFS-exact reachable set bit for bit. Also pins: isolated nodes keep
    their self-only ball; saturation (t past the eccentricity) is a no-op."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.operators.graph import hyperball
    from dataset_crawler_spark.operators.sketches import hll_estimate, hll_sketch

    edge_list = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 0)]  # cycle 0↔1, chain to 3
    node_ids = [0, 1, 2, 3, 4]  # 4 is isolated
    n_iter = 4

    adj: dict[int, set[int]] = {v: set() for v in node_ids}
    for s, d in edge_list:
        adj[s].add(d)
    balls = {v: {v} for v in node_ids}
    exact: dict[tuple[int, int], frozenset] = {
        (v, 0): frozenset(balls[v]) for v in node_ids
    }
    for t in range(1, n_iter + 1):
        balls = {
            v: balls[v] | {w for u in balls[v] for w in adj[u]} for v in node_ids
        }
        for v in node_ids:
            exact[(v, t)] = frozenset(balls[v])

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in node_ids], "node long")
    got = {
        (r.node, r.t): (r.hll_s, r.v_empty, r.nf_estimate)
        for r in hyperball(edges, nodes=nodes, n_iter=n_iter).collect()
    }
    assert len(got) == len(node_ids) * (n_iter + 1)

    members = spark.createDataFrame(
        [(v, t, m) for (v, t), ball in exact.items() for m in ball],
        "node long, t long, member long",
    )
    sk = hll_sketch(
        members, ["node", "t"], F.concat(F.lit("nb|"), F.col("member").cast("string"))
    )
    want = {
        (r.node, r.t): (r.hll_s, r.v_empty, r.hll_estimate)
        for r in hll_estimate(sk, ["node", "t"]).collect()
    }
    assert got == want

    # saturation: node 3 is a sink — its ball never grows past itself
    assert got[(3, 0)] == got[(3, n_iter)]
    # isolation: node 4 has no edges at all
    assert got[(4, 0)] == got[(4, n_iter)]
    # reachability ordering is visible through the estimates: node 0 reaches
    # everything but 4 by t=2, and the t=2 state equals the t=4 state
    assert exact[(0, 2)] == frozenset({0, 1, 2, 3})
    assert got[(0, 2)] == got[(0, 4)]


def test_cocitation_pairs_hand_graph(spark):
    """Co-citation algebra on a hand graph: pairs, support counts, and the
    co-citation Jaccard are closed-form. Citers: 10,11,12 → {1,2}; 12 also
    → 3; 13 → {2,3}. So (1,2) cocite=3, (2,3) cocite=2, (1,3) cocite=1
    (below the floor). indeg: 1→3, 2→4, 3→2."""
    from pyspark.sql import functions as F

    edge_list = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 3),
        (13, 2), (13, 3),
    ]
    e = spark.createDataFrame(edge_list, "src long, dst long")
    x = e.select(F.col("src").alias("s"), F.col("dst").alias("a"))
    y = e.select(F.col("src").alias("s"), F.col("dst").alias("b"))
    co = (
        x.join(y, "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cocite"))
        .where(F.col("cocite") >= 2)
    )
    got = {(r.a, r.b): r.cocite for r in co.collect()}
    assert got == {(1, 2): 3, (2, 3): 2}
    # jaccard for (1,2): 3 / (3 + 4 - 3) = 0.75
    ind = e.groupBy("dst").agg(F.count("*").alias("indeg"))
    indeg = {r.dst: r.indeg for r in ind.collect()}
    assert indeg == {1: 3, 2: 4, 3: 2}
    assert got[(1, 2)] / (indeg[1] + indeg[2] - got[(1, 2)]) == 0.75


def test_cocitation_registered_query_supports_floor(spark):
    """graph_doc_cocitation at fixture scale: every emitted pair carries
    support ≥ the floor, jaccard ∈ (0, 1], and the pair key is ordered."""
    from dataset_crawler_spark.plans.queries import (
        _COCITE_MIN,
        graph_doc_cocitation,
    )

    rows = graph_doc_cocitation(spark, "/root/testdata/sf0.01").collect()
    assert rows, "support floor unexpectedly empties the fixture graph"
    for r in rows:
        assert r.a < r.b
        assert r.cocite >= _COCITE_MIN
        assert r.cocite <= min(r.indeg_a, r.indeg_b)
        assert 0.0 < r.jaccard <= 1.0


def test_diameter_interpolation_and_monotone_nf(spark):
    """graph_doc_diameter: the global neighborhood function must be
    monotone non-decreasing in t (balls only grow), the effective diameter
    must land inside [0, _HB_ITER], and the 90% target must actually be
    crossed at ceil(effective_diameter) (the CASE branch that fired)."""
    import math

    from dataset_crawler_spark.plans.queries import _HB_ITER, graph_doc_diameter

    r = graph_doc_diameter(spark, SF_DIR).collect()[0]
    nf = [getattr(r, f"nf_total_t{t}") for t in range(_HB_ITER + 1)]
    assert all(nf[t] <= nf[t + 1] for t in range(_HB_ITER)), nf
    d = r.effective_diameter
    assert 0.0 <= d <= _HB_ITER
    tgt = 0.9 * nf[_HB_ITER]
    k = math.ceil(d)
    assert nf[k] >= tgt
    if k > 0:
        assert nf[k - 1] < tgt


def test_resolve_redirects_hand_graph(spark):
    """resolve_redirects on a hand-built redirect map: a 3-hop chain
    resolves every member to the SAME terminal with the right hop counts,
    a branch-in (two redirects onto one chain) shares the terminal, a
    2-cycle and a self-loop get the (-1, -1) drop sentinel, and a redirect
    INTO a cycle is itself unresolvable."""
    from dataset_crawler_spark.operators.graph import resolve_redirects

    # 0→1→2→9 (9 terminal); 3→1 branches into the chain; 4⇄5 cycle;
    # 6→6 self-loop; 7→4 feeds the cycle
    rmap = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 9), (3, 1), (4, 5), (5, 4), (6, 6), (7, 4)],
        "node long, next long",
    )
    out = {r.node: (r.terminal, r.chain_len) for r in resolve_redirects(rmap).collect()}
    assert out == {
        0: (9, 3),
        1: (9, 2),
        2: (9, 1),
        3: (9, 3),
        4: (-1, -1),
        5: (-1, -1),
        6: (-1, -1),
        7: (-1, -1),
    }


def test_resolve_redirects_doubling_covers_long_chain(spark):
    """A chain of length exactly 2**n_doublings resolves; the fixed
    doubling count is a LENGTH CAP, not a correctness knob below it —
    and one extra doubling changes nothing on the registered query's
    synthetic map (fixpoint at driver scale)."""
    from dataset_crawler_spark.operators.graph import resolve_redirects
    from dataset_crawler_spark.plans import queries as QL

    n = 2**4
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "node long, next long"
    )
    out = {r.node: (r.terminal, r.chain_len) for r in
           resolve_redirects(chain, n_doublings=4).collect()}
    assert out[0] == (n, n)

    # truncating the doubling budget leaves the head unresolved
    short = {r.node: r.terminal for r in
             resolve_redirects(chain, n_doublings=3).collect()}
    assert short[0] == -1 and short[n - 8] == n

    sf01 = "/root/testdata/sf0.01"
    base = {(r.doc_id, r.terminal_id, r.chain_len)
            for r in QL.crawl_redirect_resolve(spark, sf01).collect()}
    assert base and any(cl > 1 for _, _, cl in base)
    old = QL._RR_DOUBLINGS
    QL._RR_DOUBLINGS = old + 1
    try:
        more = {(r.doc_id, r.terminal_id, r.chain_len)
                for r in QL.crawl_redirect_resolve(spark, sf01).collect()}
    finally:
        QL._RR_DOUBLINGS = old
    assert more == base


def test_bfs_depths_hand_graph(spark):
    """bfs_depths on a hand graph: two seeds, competing paths take the MIN
    depth, unreachable nodes are absent, directedness respected (an edge
    INTO a seed does not make its source reachable), and the n_iter cap
    truncates depth beyond it."""
    from dataset_crawler_spark.operators.graph import bfs_depths

    #   0→1→2→3→4 ;  9→3 (seed 9 shortcuts 3) ; 5→0 (into-seed only) ; 8 isolated
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (9, 3), (5, 0)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,), (9,)], "node long")
    out = {r.node: r.depth for r in bfs_depths(edges, seeds, n_iter=8).collect()}
    assert out == {0: 0, 9: 0, 1: 1, 2: 2, 3: 1, 4: 2}

    capped = {r.node: r.depth for r in bfs_depths(edges, seeds, n_iter=1).collect()}
    assert capped == {0: 0, 9: 0, 1: 1, 3: 1}


def test_bfs_fixpoint_at_driver_scale(spark):
    """graph_doc_bfs_depth's fixed round count must cover the reachable set
    at the driver's oracle scale: two extra rounds change nothing."""
    from dataset_crawler_spark.plans import queries as QL

    sf01 = "/root/testdata/sf0.01"
    base = {(r.doc_id, r.depth) for r in QL.graph_doc_bfs_depth(spark, sf01).collect()}
    reached = [d for _, d in base if d >= 0]
    assert reached and max(reached) >= 2, "graph too shallow to exercise rounds"
    old = QL._BFS_ITER
    QL._BFS_ITER = old + 2
    try:
        more = {(r.doc_id, r.depth)
                for r in QL.graph_doc_bfs_depth(spark, sf01).collect()}
    finally:
        QL._BFS_ITER = old
    assert more == base


def test_label_propagation_bridged_triangles(spark):
    """Synchronous LPA on two triangles joined by one bridge edge: the
    bridge must NOT merge the communities (the density contrast with
    connected_components, which would). Hand-traced with the min-label
    tie-break: after 4 sync rounds {0,1,2} all carry 0 and {10,11,12} all
    carry 2 (triangle B converges to its bridge endpoint's side-A-facing
    min, 2 — not to 10 — because round 1 labels 10 with its min neighbor
    2 and the vote then keeps it). Two extra rounds change nothing.
    Dirty input (reversed duplicate, self-loop) is absorbed; an isolated
    node passed via ``nodes`` labels itself."""
    from dataset_crawler_spark.operators.graph import label_propagation

    tri_a = [(0, 1), (0, 2), (1, 2)]
    tri_b = [(10, 11), (10, 12), (11, 12)]
    bridge = [(2, 10)]
    dirty = [(1, 0), (7, 7)]
    edges = spark.createDataFrame(
        tri_a + tri_b + bridge + dirty, "src long, dst long"
    )
    nodes = spark.createDataFrame([(n,) for n in [0, 1, 2, 10, 11, 12, 99]], "node long")

    got = {
        r.node: r.community
        for r in label_propagation(edges, nodes=nodes, n_iter=4).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 2, 11: 2, 12: 2, 99: 99}

    stable = {
        r.node: r.community
        for r in label_propagation(edges, nodes=nodes, n_iter=6).collect()
    }
    assert stable == got

    # direction invariance: fully reversed edges give the same partition
    rev = spark.createDataFrame(
        [(b, a) for a, b in tri_a + tri_b + bridge], "src long, dst long"
    )
    assert {
        r.node: r.community
        for r in label_propagation(rev, nodes=nodes, n_iter=4).collect()
    } == got


def test_communities_registered_query_properties(spark):
    """graph_doc_communities at fixture scale: every doc gets exactly one
    row, every community id is itself a doc id (LPA labels are node ids),
    and the partition is non-trivial — more than one community, none of
    them the whole corpus."""
    from dataset_crawler_spark.plans.queries import graph_doc_communities

    rows = graph_doc_communities(spark, "/root/testdata/sf0.01").collect()
    docs = {r.doc_id for r in rows}
    assert len(rows) == len(docs)
    comms = {r.community for r in rows}
    assert comms <= docs
    assert 1 < len(comms) < len(docs)


def test_containment_planted_subset(spark, tmp_path):
    """dedup_containment on a planted subset pair: doc 1's text appears
    verbatim inside doc 2's longer text, so every 3-shingle of doc 1 is a
    shingle of doc 2 — contain_a must be exactly 1.0 while contain_b < 1,
    i.e. the directed measure catches the quote-inflation case whose
    jaccard (|A|/|B|) sits under the symmetric gate. An unrelated doc 3
    must pair with nobody."""
    from dataset_crawler_spark.plans.queries import dedup_containment

    inner = " ".join(f"w{i}" for i in range(10))
    outer = inner + " " + " ".join(f"x{i}" for i in range(20))
    other = " ".join(f"z{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, other)], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    rows = dedup_containment(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.contain_a == 1.0
    # doc 1 has 8 shingles, doc 2 has 28: 8/28 rounded to 4 dp
    assert r.contain_b == round(8 / 28, 4)


def test_lpa_warm_start_contract(spark):
    """label_propagation(init=...): seeding with the converged partition
    makes any number of refresh rounds a no-op (the warm-start contract
    engine_incremental_lpa relies on); a universe node missing from the
    init falls back to its own label exactly like a cold start."""
    from dataset_crawler_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(n,) for n in [0, 1, 2, 10, 11, 12, 99]], "node long"
    )
    cold = label_propagation(edges, nodes=nodes, n_iter=4)
    got = {r.node: r.community for r in cold.collect()}

    warm = {
        r.node: r.community
        for r in label_propagation(edges, nodes=nodes, n_iter=2, init=cold).collect()
    }
    assert warm == got

    partial = cold.where(F.col("node") != 99)
    fb = {
        r.node: r.community
        for r in label_propagation(
            edges, nodes=nodes, n_iter=0, init=partial
        ).collect()
    }
    assert fb[99] == 99
    assert {k: v for k, v in fb.items() if k != 99} == {
        k: v for k, v in got.items() if k != 99
    }


def test_incremental_lpa_registered_properties(spark):
    """engine_incremental_lpa at fixture scale: exactly one row per doc,
    every community id is a doc id, and the warm-started refresh over the
    full edge set differs from the phase-1 (half-edge) partition — the
    refresh rounds actually fold the new links in."""
    from dataset_crawler_spark.plans.queries import engine_incremental_lpa

    rows = engine_incremental_lpa(spark, "/root/testdata/sf0.01").collect()
    docs = {r.doc_id for r in rows}
    assert len(rows) == len(docs) == 500
    assert {r.community for r in rows} <= docs


def test_modularity_integer_identities(spark):
    """graph_doc_modularity at fixture scale: the per-community integers
    must satisfy the exact Newman–Girvan identities — Σ n_nodes = corpus,
    Σ degree_sum = 2m, Σ intra ≤ m, and every modularity_part is EXACTLY
    ROUND((4·m·intra − deg²)/(4m²), 4) recomputed from the row's own
    integers (no hidden float accumulation anywhere). Community ids must
    be the graph_doc_communities partition."""
    from dataset_crawler_spark.plans.queries import (
        graph_doc_communities,
        graph_doc_modularity,
    )

    sf = "/root/testdata/sf0.01"
    rows = graph_doc_modularity(spark, sf).collect()
    assert sum(r.n_nodes for r in rows) == 500
    two_m = sum(r.degree_sum for r in rows)
    assert two_m % 2 == 0
    m = two_m // 2
    assert sum(r.intra_edges for r in rows) <= m
    for r in rows:
        expect = round((4 * m * r.intra_edges - r.degree_sum**2) / (4 * m * m), 4)
        assert r.modularity_part == expect

    comms = {r.community for r in graph_doc_communities(spark, sf).collect()}
    assert {r.community for r in rows} == comms


def test_cdc_chunks_resync_after_insertion(spark, tmp_path):
    """dedup_cdc_chunks on a planted pair: doc 2 is doc 1 with a prefix
    inserted, so every fixed-width passage downstream of the insertion
    shifts — but CDC boundaries re-synchronize at the first marker token,
    after which the chunk hashes match again. Asserts (a) at least one
    chunk is shared by both docs, (b) the full (chunk_hash → n_copies,
    n_docs) map equals an independent pure-Python CDC twin built with
    h60_py, and (c) an unrelated doc contributes nothing."""
    from collections import Counter

    from dataset_crawler_spark.functions.hashing import h60_py
    from dataset_crawler_spark.plans.queries import _CDC_P, dedup_cdc_chunks

    base = [f"tok{i}" for i in range(64)]
    docs = {
        1: base,
        2: ["pre0", "pre1", "pre2"] + base,
        3: [f"other{i}" for i in range(40)],
    }
    spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    def py_chunks(tokens):
        out, cur = [], []
        for tk in tokens:
            cur.append(tk)
            if h60_py(tk) % _CDC_P == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    copies, doc_sets = Counter(), {}
    for did, tokens in docs.items():
        for c in py_chunks(tokens):
            h = h60_py(c)
            copies[h] += 1
            doc_sets.setdefault(h, set()).add(did)
    expect = {
        h: (copies[h], len(doc_sets[h]), min(doc_sets[h]))
        for h in copies
        if copies[h] >= 2
    }
    assert expect, "planted pair produced no shared chunk — lower _CDC_P?"
    assert any(ds == {1, 2} for ds in doc_sets.values())

    rows = dedup_cdc_chunks(spark, str(tmp_path)).collect()
    got = {r.chunk_hash: (r.n_copies, r.n_docs, r.keep_id) for r in rows}
    assert got == expect
    assert all(3 not in doc_sets[h] for h in got)


# --------------------------------------------------------------------------
# round-4 tail II: BPE pair mining / heavy hitters / z-order / KN smoothing
# --------------------------------------------------------------------------


def test_bpe_pairs_hand_values(spark, tmp_path):
    """tokenizer_bpe_pairs on the classic BPE toy corpus: pair counts are
    word-frequency-weighted sums over the DISTINCT-word table, and the
    top-N order is total (count desc, then both symbols)."""
    from dataset_crawler_spark.plans.queries import tokenizer_bpe_pairs

    sf = _docs_fixture(spark, tmp_path, ["low lower", "low low", "aaa aaa"])
    rows = [tuple(r) for r in tokenizer_bpe_pairs(spark, sf).collect()]
    # words: low x3, lower x1, aaa x2 → (l,o)/(o,w) weigh 4 across 2 word
    # types; (a,a) occurs TWICE inside the single word type 'aaa' (weight
    # 2x2=4) but n_word_types must still count it as ONE type
    assert rows == [
        ("a", "a", 4, 1),
        ("l", "o", 4, 2),
        ("o", "w", 4, 2),
        ("e", "r", 1, 1),
        ("w", "e", 1, 1),
    ]


def test_heavy_hitters_exact_output_and_partition_invariance(spark, tmp_path):
    """sketch_heavy_hitters output is the EXACT heavy-hitter set however the
    tokens land in partitions: the corpus has 301 distinct tokens (> the
    100-candidate Misra-Gries capacity, so the prune path runs) and exactly
    one token above the n/100 threshold. A 1-file and a 5-file layout of the
    same corpus must agree row-for-row — the pigeonhole superset guarantee,
    not luck."""
    from dataset_crawler_spark.plans.queries import sketch_heavy_hitters

    # 100 docs x (5 "the" + 3 singleton fillers) → 500 "the", 300
    # singletons, n = 800, threshold n/100 = 8: only "the" qualifies, and
    # the 301 distinct tokens exceed the 100-candidate capacity
    texts = ["the " * 5 + f"f{i}a f{i}b f{i}c" for i in range(100)]
    got = {}
    for nfiles, layout in ((1, "one"), (5, "five")):
        path = tmp_path / layout
        df = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.repartition(nfiles).write.parquet(f"{path}/documents.parquet")
        got[layout] = [tuple(r) for r in sketch_heavy_hitters(spark, str(path)).collect()]
    assert got["one"] == got["five"]
    assert got["one"] == [("the", 500, round(500 / 800, 4))]


def test_zorder_block_locality_bound(spark):
    """layout_zorder_stats on the real events table: every 64-key z-block
    stays inside its key range and touches at most 2^3 = 8 distinct buckets
    per dimension — the Morton-curve locality bound that makes min/max
    pruning work on BOTH dimensions."""
    from dataset_crawler_spark.plans.queries import layout_zorder_stats

    rows = layout_zorder_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = 0
    for r in rows:
        total += r.n_events
        assert 1 <= r.n_user_buckets <= 8 and 1 <= r.n_day_buckets <= 8
        assert r.zblock * 64 <= r.z_min <= r.z_max < (r.zblock + 1) * 64
    n_events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert total == n_events


def test_kn_ppl_hand_values(spark, tmp_path):
    """text_lm_kn_ppl on a corpus with closed-form interpolated-KN values:
    with bigrams (a,b)x2 and (a,c)x1, c(a)=3, N1+(a,.)=2, Pcont(b)=
    Pcont(c)=1/2, D=0.75: P(b|a)=(1.25+0.75)/3=2/3 and P(c|a)=
    (0.25+0.75)/3=1/3 — the discounted mass moves to the continuation
    term. Single-token docs can't emit a bigram and are excluded."""
    import math

    from dataset_crawler_spark.plans.queries import text_lm_kn_ppl

    sf = _docs_fixture(spark, tmp_path, ["a b", "a b", "a c", "solo"])
    rows = {r.doc_id: r for r in text_lm_kn_ppl(spark, sf).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].nll_kn == rows[1].nll_kn == round(-math.log(2 / 3), 4)
    assert rows[2].nll_kn == round(-math.log(1 / 3), 4)
    assert rows[0].n_bigrams == 1 and rows[2].keep is True


def test_quantile_hist_error_bound_vs_exact(spark):
    """sketch_quantile_hist: every estimated quantile lies within ONE bin
    width of the true (lower interpolation) quantile — the histogram
    guarantee, checked against exact sorted quantiles on the real events
    table."""
    import math

    from dataset_crawler_spark.plans.queries import _QH_B, _QH_QS, sketch_quantile_hist

    got = {r.event_type: r for r in sketch_quantile_hist(spark, "/root/testdata/sf0.001").collect()}
    assert got
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    )
    for et, r in got.items():
        width = (r.vmax - r.vmin) / _QH_B
        for q in _QH_QS:
            exact = con.execute(
                "SELECT quantile_disc(value, ?) FROM events WHERE event_type = ?",
                [q, et],
            ).fetchone()[0]
            est = getattr(r, f"p{int(q * 100)}")
            assert abs(est - exact) <= width + 1e-9, (et, q, est, exact, width)


def test_incremental_bm25_standing_stats_equal_batch(spark):
    """engine_incremental_bm25: the merged (old-partial + new-partial)
    standing stats row and the resulting top-k are EXACTLY the batch
    computation over the full corpus — additive integer index maintenance
    can't drift."""
    from pyspark.sql import functions as F

    from dataset_crawler_spark.plans.queries import (
        _IBM_TERMS,
        _IBM_TOPK,
        engine_incremental_bm25,
    )

    sf = "/root/testdata/sf0.001"
    inc = [tuple(r) for r in engine_incremental_bm25(spark, sf).collect()]

    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    tf = d.select(
        "doc_id",
        F.size("t").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("t", (lambda w: lambda x: x == F.lit(w))(w))).alias(f"tf{i}")
            for i, w in enumerate(_IBM_TERMS)
        ],
    )
    st = tf.agg(
        F.count("*").alias("n"),
        (F.sum("dl") * 1.0 / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(_IBM_TERMS))
        ],
    )
    s = tf.crossJoin(F.broadcast(st))
    score = None
    for i in range(len(_IBM_TERMS)):
        c = ((F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)) * (
            (F.col(f"tf{i}") * 2.2)
            / (F.col(f"tf{i}") + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl"))))
        )
        score = c if score is None else score + c
    batch = [
        tuple(r)
        for r in s.select("doc_id", "dl", F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_IBM_TOPK)
        .collect()
    ]
    assert inc == batch


def test_bpe_vocab_matches_python_twin(spark, tmp_path):
    """tokenizer_bpe_vocab against a literal-minded pure-Python greedy BPE
    (Sennrich alg. 1) on a hand corpus with merge-cascade structure: early
    merges must feed later ones ('l o'→'lo', then 'lo w'→'low'), and ties
    resolve by the total (count desc, left, right) order."""
    from dataset_crawler_spark.plans.queries import _BPEV_MERGES, tokenizer_bpe_vocab

    texts = ["low low low lower lowest", "newer newer wider wider wider new3"]
    sf = _docs_fixture(spark, tmp_path, texts)

    # python twin
    from collections import Counter

    words = Counter(
        w for t in texts for w in t.split() if len(w) >= 2 and w.isalpha() and w.islower()
    )
    vocab = {tuple(w): c for w, c in words.items()}
    expect = []
    for step in range(_BPEV_MERGES):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((step, best[0], best[1], pairs[best]))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab

    got = [tuple(r) for r in tokenizer_bpe_vocab(spark, sf).collect()]
    assert got == expect


def test_bpe_vocab_stops_when_vocabulary_exhausts(spark, tmp_path):
    """tokenizer_bpe_vocab on a corpus whose every word fully merges before
    the merge budget runs out: the loop must STOP (not crash on an empty
    argmax), emitting exactly the merges that existed — the same shorter
    row set the unrolled twin produces from its empty-LIMIT-1 cross join."""
    from dataset_crawler_spark.plans.queries import tokenizer_bpe_vocab

    sf = _docs_fixture(spark, tmp_path, ["ab ab ab", "ab cd"])
    got = [tuple(r) for r in tokenizer_bpe_vocab(spark, sf).collect()]
    # step 0 merges (a,b) weight 4; step 1 merges (c,d) weight 1; then
    # every word is one symbol — steps 2..5 must not exist
    assert got == [(0, "a", "b", 4), (1, "c", "d", 1)]


def test_focused_priority_matches_python_inheritance(spark):
    """crawl_focused_priority against an independent pure-Python rebuild of
    the link graph (h60_py) and relevance inheritance on the real sf0.001
    corpus: inherited mass is the exact integer sum of distinct parents'
    topic-hit counts, priority is its closed-form map, and the fetch gate
    is the integer floor."""
    from dataset_crawler_spark.functions.hashing import h60_py
    from dataset_crawler_spark.plans.queries import (
        _FOC_MIN_MASS,
        _FOC_TERMS,
        crawl_focused_priority,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text").collect()
    n = len(docs)
    hits = {
        r.doc_id: sum(1 for w in r.text.split(" ") if w in _FOC_TERMS) for r in docs
    }
    edges = set()
    for r in docs:
        for j in range(3):
            dst = h60_py(f"lk|{r.doc_id}|{j}") % n
            if dst != r.doc_id:
                edges.add((r.doc_id, dst))
    mass, parents, rel_parents = {}, {}, {}
    for src, dst in edges:
        mass[dst] = mass.get(dst, 0) + hits[src]
        parents[dst] = parents.get(dst, 0) + 1
        rel_parents[dst] = rel_parents.get(dst, 0) + (1 if hits[src] > 0 else 0)

    rows = crawl_focused_priority(spark, sf).collect()
    assert len(rows) == len(mass)
    for r in rows:
        dst = int(r.url.rsplit("/", 1)[1])
        assert r.inherited_mass == mass[dst]
        assert r.n_parents == parents[dst]
        assert r.n_relevant_parents == rel_parents[dst]
        assert r.priority == round(1.0 - 1.0 / (1.0 + mass[dst]), 4)
        assert r.fetch is (mass[dst] >= _FOC_MIN_MASS)


def test_posting_lists_hand_corpus_and_truncation(spark, tmp_path):
    """search_posting_lists on a hand corpus: df counts distinct docs (not
    occurrences), posting heads are doc_id-sorted, and a term past the cap
    truncates to the first 8 ids with the flag set."""
    from dataset_crawler_spark.plans.queries import search_posting_lists

    texts = [f"z common{i % 2}" for i in range(10)] + ["solo z"]
    sf = _docs_fixture(spark, tmp_path, texts)
    got = {r.term: r for r in search_posting_lists(spark, sf).collect()}
    assert got["z"].df == 11 and got["z"].truncated is True
    assert got["z"].postings_head == ",".join(str(i) for i in range(8))
    assert got["common0"].df == 5 and got["common0"].truncated is False
    assert got["common0"].postings_head == "0,2,4,6,8"
    assert got["solo"].df == 1 and got["solo"].postings_head == "10"


def test_simhash_hamming_planted_pairs(spark, tmp_path):
    """dedup_simhash_hamming: exact copies collide at hamming 0 through the
    block join; an unrelated doc (disjoint vocabulary) pairs with nobody;
    a copy with one token swapped stays within the hamming radius of its
    source (weighted bit majority flips only margin-1 bits)."""
    from dataset_crawler_spark.plans.queries import dedup_simhash_hamming

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta theta",   # exact copy of 0
        "iota kappa lmbda mu nu xi omicron pi rho sigma",  # disjoint
    ]
    sf = _docs_fixture(spark, tmp_path, texts)
    got = {(r.doc_a, r.doc_b): r.hamming for r in dedup_simhash_hamming(spark, sf).collect()}
    assert got[(0, 1)] == 0
    assert not any(2 in p for p in got)


def test_bowtie_matches_python_fwbw(spark, tmp_path):
    """graph_doc_bowtie against a pure-Python FW-BW rebuild (h60_py edges,
    8 bounded rounds each direction, same pivot): region labels and sizes
    must match node-for-node, and SCC must equal fwd ∩ bwd exactly."""
    from dataset_crawler_spark.functions.hashing import h60_py
    from dataset_crawler_spark.plans.queries import (
        _BOW_ITER,
        _BOW_PIVOT,
        graph_doc_bowtie,
    )

    n = 23
    sf = _docs_fixture(spark, tmp_path, [f"doc {i} text" for i in range(n)])
    fwd_e, bwd_e = {}, {}
    for i in range(n):
        for j in range(3):
            t = h60_py(f"lk|{i}|{j}") % n
            if t != i:
                fwd_e.setdefault(i, set()).add(t)
                bwd_e.setdefault(t, set()).add(i)

    def bfs(adj):
        seen, frontier = {_BOW_PIVOT}, {_BOW_PIVOT}
        for _ in range(_BOW_ITER):
            frontier = {t for s in frontier for t in adj.get(s, ())} - seen
            seen |= frontier
        return seen

    f, b = bfs(fwd_e), bfs(bwd_e)
    expect = {
        i: ("SCC" if i in f and i in b else "IN" if i in b else
            "OUT" if i in f else "DISC")
        for i in range(n)
    }
    sizes = {}
    for r in expect.values():
        sizes[r] = sizes.get(r, 0) + 1

    rows = {r.doc_id: r for r in graph_doc_bowtie(spark, sf).collect()}
    assert len(rows) == n
    for i in range(n):
        assert rows[i].region == expect[i], i
        assert rows[i].region_size == sizes[expect[i]]


def test_incremental_quantile_state_equals_batch_histogram(spark):
    """engine_incremental_quantile: the merged (old + new-delta) bin counts
    read off the SAME quantiles as a batch histogram computed against the
    frozen round-0 edges — additive integer state cannot drift. Also pins
    the clamp: new values outside the bootstrap range land in the edge
    bins, so every estimate stays inside [vmin, vmax]."""
    from dataset_crawler_spark.plans.queries import (
        _QH_QS,
        engine_incremental_quantile,
        sketch_quantile_hist,
    )

    sf = "/root/testdata/sf0.001"
    inc = {r.event_type: r for r in engine_incremental_quantile(spark, sf).collect()}
    assert inc
    batch = {r.event_type: r for r in sketch_quantile_hist(spark, sf).collect()}
    for et, r in inc.items():
        assert r.vmin <= r.p50 <= r.p90 <= r.p99 <= r.vmax
        # the full-range batch sketch and the frozen-edge incremental state
        # agree on n (same rows) and closely on the interior quantiles
        # (edges differ only by the new 25%'s range extension)
        assert r.n == batch[et].n
        width = (batch[et].vmax - batch[et].vmin) / 4096
        assert abs(r.p50 - batch[et].p50) <= 2 * width + 1e-9


def test_maxcover_greedy_invariants(spark):
    """crawl_seed_maxcover on the real sf0.001 graph: marginal gains are
    non-increasing (greedy), seeds are distinct, covered_total is bounded
    by the gain sum (overlaps only shrink it) and equals it when every
    pick's neighborhood was disjoint; a pure-Python greedy rebuild must
    agree pick-for-pick."""
    from dataset_crawler_spark.functions.hashing import h60_py
    from dataset_crawler_spark.plans.queries import _MC_SEEDS, crawl_seed_maxcover

    sf = "/root/testdata/sf0.001"
    docs = [r.doc_id for r in spark.read.parquet(f"{sf}/documents.parquet").select("doc_id").collect()]
    n = len(docs)
    nbh = {i: {i} for i in docs}
    for i in docs:
        for j in range(3):
            nbh[i].add(h60_py(f"lk|{i}|{j}") % n)
    covered, expect = set(), []
    for r in range(_MC_SEEDS):
        best = min(((len(nbh[v] - covered), v) for v in docs),
                   key=lambda t: (-t[0], t[1]))
        expect.append((r, best[1], best[0]))
        covered |= nbh[best[1]]

    rows = sorted(crawl_seed_maxcover(spark, sf).collect(), key=lambda r: r.pick)
    assert [(r.pick, r.seed, r.gain) for r in rows] == expect
    assert all(a.gain >= b.gain for a, b in zip(rows, rows[1:]))
    assert rows[0].covered_total == len(covered)


def test_maxcover_stops_at_saturation(spark, tmp_path):
    """crawl_seed_maxcover on a corpus whose first pick covers everything:
    the loop must stop (not crash on an empty argmax), emitting exactly
    the picks that existed — the same shorter row set the unrolled twin
    produces from its empty g{r}/p{r} CTEs."""
    from dataset_crawler_spark.plans.queries import crawl_seed_maxcover

    sf = _docs_fixture(spark, tmp_path, ["a b", "c d"])
    rows = [tuple(r) for r in crawl_seed_maxcover(spark, sf).collect()]
    # 2 docs: the 'lk|' targets of both land in {0, 1}; one seed's closed
    # neighborhood covers both nodes, so exactly ONE pick exists
    assert rows == [(0, 0, 2, 2)]
