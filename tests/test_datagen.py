"""Spark datagen ≡ pure-Python twin — the foundation every oracle test rests on."""

from __future__ import annotations

from dataset_crawler_spark import datagen

N_DOCS = 300
N_HOSTS = 20


def _spark_rows(spark, rnd):
    df = datagen.documents_for_round(spark, N_DOCS, rnd, n_hosts=N_HOSTS)
    out = {}
    for r in df.collect():
        out[r.doc_id] = [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
    return out


def test_documents_parity_all_rounds(spark):
    for rnd in (0, 1, 2):
        got = _spark_rows(spark, rnd)
        want = dict(datagen.documents_for_round_py(N_DOCS, rnd, n_hosts=N_HOSTS))
        assert set(got) == set(want), f"round {rnd}: doc_id sets differ"
        for k in want:
            assert got[k] == want[k], f"round {rnd}: span mismatch for {k}"


def test_round_mutation_taxonomy(spark):
    r0 = dict(datagen.documents_for_round_py(N_DOCS, 0, n_hosts=N_HOSTS))
    r1 = dict(datagen.documents_for_round_py(N_DOCS, 1, n_hosts=N_HOSTS))
    r2 = dict(datagen.documents_for_round_py(N_DOCS, 2, n_hosts=N_HOSTS))
    added = set(r1) - set(r0)
    deleted = set(r0) - set(r1)
    assert added and deleted, "fixtures must exercise add + delete branches"
    # tombstone-resurrect: gone in r1, back in r2 with r0 content
    resurrected = (set(r0) - set(r1)) & set(r2)
    assert resurrected, "fixtures must exercise tombstone resurrection"
    for k in resurrected:
        assert r2[k] == r0[k]
    # updated docs exist: same doc_id, different spans
    updated = [k for k in set(r0) & set(r1) if r0[k] != r1[k]]
    assert updated, "fixtures must exercise updates"
    # and unchanged docs emit no diff
    unchanged = [k for k in set(r0) & set(r1) if r0[k] == r1[k]]
    assert len(unchanged) > len(updated)


def test_frontier_parity(spark):
    got = {r.url: r.asDict() for r in datagen.frontier(spark, 200, n_hosts=N_HOSTS).collect()}
    want = {r["url"]: r for r in datagen.frontier_py(200, n_hosts=N_HOSTS)}
    assert got == want


def test_hosts_parity(spark):
    got = sorted([r.asDict() for r in datagen.hosts(spark, N_HOSTS).collect()], key=lambda r: r["host"])
    want = datagen.hosts_py(N_HOSTS)
    assert got == want
