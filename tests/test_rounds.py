"""Round loop: checkpoint/resume + idempotent replay (SURVEY.md §5.5, T6)."""

from __future__ import annotations

from dataset_crawler_spark import datagen
from dataset_crawler_spark.oracle.crawler_oracle import CrawlerOracle
from dataset_crawler_spark.streaming.rounds import CrawlEngine

N_DOCS = 250
N_HOSTS = 15


def _docs(spark, rnd):
    return datagen.documents_for_round_local(spark, N_DOCS, rnd, n_hosts=N_HOSTS)


def _visible(engine, as_of=None):
    return {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in engine.visible_docs(as_of).collect()
    }


def test_rounds_commit_and_match_oracle(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    oracle = CrawlerOracle()
    for rnd in (0, 1, 2):
        assert eng.next_round() == rnd
        eng.run_round(_docs(spark, rnd), rnd)
        oracle.run_round(dict(datagen.documents_for_round_py(N_DOCS, rnd, n_hosts=N_HOSTS)), rnd)
    assert eng.store.committed_rounds() == [0, 1, 2]
    assert _visible(eng) == oracle.visible_docs()
    # time travel: as-of round 0 ≡ an oracle stopped at round 0
    o0 = CrawlerOracle()
    o0.run_round(dict(datagen.documents_for_round_py(N_DOCS, 0, n_hosts=N_HOSTS)), 0)
    assert _visible(eng, as_of=0) == o0.visible_docs()


def test_compaction_preserves_asof_reads(spark, tmp_path):
    """compact() + vacuum() must leave every as-of read byte-identical:
    rows ≤ the compaction point move from partition pruning to a row filter
    on the preserved crawl_id data column, later rounds stay partitioned;
    re-compaction after further appends keeps the invariant."""
    import os

    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"), spark)
    for rnd in range(3):
        df = spark.createDataFrame(
            [(f"u{rnd}_{i}", rnd * 10 + i) for i in range(5)], "url_c string, x int"
        )
        store.append("t", df, rnd)
        store.commit_round(rnd)

    def snap(as_ofs=(0, 1, 2, None)):
        return {
            a: sorted(tuple(r) for r in store.read("t", as_of=a).collect())
            for a in as_ofs
        }

    before = snap()
    assert len(before[None]) == 15

    store.compact("t", upto=1)
    assert snap() == before
    removed = store.vacuum("t")
    assert any(p.endswith("crawl_id=0") for p in removed)
    assert any(p.endswith("crawl_id=1") for p in removed)
    assert not any(p.endswith("crawl_id=2") for p in removed)
    assert snap() == before

    # keep appending after compaction, then compact everything
    store.append(
        "t", spark.createDataFrame([("z", 99)], "url_c string, x int"), 3
    )
    store.commit_round(3)
    with_r3 = snap()
    assert len(with_r3[None]) == 16
    assert {a: with_r3[a] for a in (0, 1, 2)} == {a: before[a] for a in (0, 1, 2)}

    store.compact("t")
    store.vacuum("t")
    assert snap() == with_r3
    # everything now lives in exactly one compacted dir
    base = str(tmp_path / "store" / "t")
    assert sorted(os.listdir(base)) == ["_compacted_3"]


def test_compaction_crash_leaves_orphan_invisible(spark, tmp_path):
    """Crash between writing the compacted directory and the manifest switch:
    the orphan dir must be ignored by reads (manifest is the commit point),
    and a later successful compaction's vacuum must clean it up."""
    import os

    from dataset_crawler_spark.sources.snapshots import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"), spark)
    for rnd in range(2):
        df = spark.createDataFrame([(f"u{rnd}", rnd)], "url_c string, x int")
        store.append("t", df, rnd)
        store.commit_round(rnd)
    before = sorted(tuple(r) for r in store.read("t").collect())

    # simulate the crash: compacted data lands, manifest never switches
    store.read("t").where("crawl_id <= 0").write.parquet(
        str(tmp_path / "store" / "t" / "_compacted_0")
    )
    assert store.compacted_upto("t") is None
    assert sorted(tuple(r) for r in store.read("t").collect()) == before

    # a later real compaction supersedes and vacuums the orphan
    store.compact("t", upto=1)
    removed = store.vacuum("t")
    assert any(p.endswith("_compacted_0") for p in removed)
    assert sorted(tuple(r) for r in store.read("t").collect()) == before
    assert sorted(os.listdir(str(tmp_path / "store" / "t"))) == ["_compacted_1"]


def test_resume_after_crash_is_byte_equal(spark, tmp_path):
    # uninterrupted run
    full = CrawlEngine(spark, str(tmp_path / "full"))
    for rnd in (0, 1, 2):
        full.run_round(_docs(spark, rnd), rnd)

    # crashed run: round 1's data written but never committed
    crash = CrawlEngine(spark, str(tmp_path / "crash"))
    crash.run_round(_docs(spark, 0), 0)
    live1 = _docs(spark, 1)
    from dataset_crawler_spark.operators import diff as D
    from dataset_crawler_spark.operators import state as S

    lineage1 = D.snapshot_diff(crash.state_as_of(0), live1, 1)
    crash.store.append("lineage", lineage1, 1)  # data on disk, no manifest commit
    assert crash.store.committed_rounds() == [0]

    # resume: engine re-runs round 1 (idempotent overwrite), then round 2
    resumed = CrawlEngine(spark, str(tmp_path / "crash"))
    assert resumed.next_round() == 1
    resumed.run_round(_docs(spark, 1), 1)
    resumed.run_round(_docs(spark, 2), 2)
    assert _visible(resumed) == _visible(full)


def test_replay_round_is_idempotent(spark, tmp_path):
    eng = CrawlEngine(spark, str(tmp_path / "store"))
    eng.run_round(_docs(spark, 0), 0)
    s1 = eng.run_round(_docs(spark, 1), 1)
    before = _visible(eng)
    s1_replay = eng.run_round(_docs(spark, 1), 1)  # replay same round
    assert {k: s1[k] for k in ("added", "updated", "deleted")} == {
        k: s1_replay[k] for k in ("added", "updated", "deleted")
    }
    assert _visible(eng) == before
