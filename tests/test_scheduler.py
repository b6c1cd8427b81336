"""Exact crawl-order + URL-seen-set match vs the scheduler oracle
(BASELINE.json metric; SURVEY.md §5.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_crawler_spark import datagen
from dataset_crawler_spark.functions.urls import canonicalize_url_py
from dataset_crawler_spark.operators import scheduler as SCH
from dataset_crawler_spark.operators import seen as SN
from dataset_crawler_spark.oracle.scheduler_oracle import schedule_round_py

N_URLS = 3000
N_HOSTS = 25


def _key(row):
    return (row["seed_rank"], row["host"], row["rank_in_host"])


def _collect_schedule(df):
    rows = [r.asDict() for r in df.collect()]
    rows.sort(key=_key)
    return [
        (r["url_c"], r["host"], r["seed_rank"], r["rank_in_host"], r["scheduled_offset_ms"])
        for r in rows
    ]


def _oracle_schedule(seen=None):
    rows = schedule_round_py(
        datagen.frontier_py(N_URLS, n_hosts=N_HOSTS), datagen.hosts_py(N_HOSTS), seen
    )
    return [
        (r["url_c"], r["host"], r["seed_rank"], r["rank_in_host"], r["scheduled_offset_ms"])
        for r in rows
    ]


def test_canonicalizer_parity(spark):
    """All three canonicalizer twins (native codegen / pandas UDF / pure
    Python) agree on the dirty-URL corpus."""
    from dataset_crawler_spark.functions.urls import canonicalize_url_pandas

    f = datagen.frontier(spark, 500, n_hosts=N_HOSTS)
    got = {
        (r.url): (r.url_c, r.url_p)
        for r in f.select(
            "url",
            SCH.canonicalize_url(F.col("url")).alias("url_c"),
            canonicalize_url_pandas(F.col("url")).alias("url_p"),
        ).collect()
    }
    for url, (url_c, url_p) in got.items():
        want = canonicalize_url_py(url)
        assert url_c == want == url_p, url
    # dirty variants collapse: canonical forms dedupe the synthetic variants
    assert any(u != c for u, (c, _) in got.items()), "fixtures must include dirty URLs"


def test_canonicalizer_properties_hypothesis(spark):
    """Property corpus (seeded generator — deterministic across runs): the
    native canonicalizer equals the pure-Python twin and is idempotent —
    canon(canon(u)) == canon(u) — over adversarial URL shapes. This corpus
    found a real spec bug: single-slash stripping wasn't a fixed point for
    paths ending in '//'."""
    import random

    rng = random.Random(7)
    schemes = ["http", "https", "HTTP", "ftp", "a+b-c"]
    ports = ["", ":80", ":443", ":8080", ":0"]
    frags = ["", "#frag", "#a#b"]

    def rand_text(chars, lo, hi):
        return "".join(rng.choice(chars) for _ in range(rng.randint(lo, hi)))

    corpus = set()
    for _ in range(150):
        path = rand_text("abc/._~%0", 0, 14)
        q = rand_text("ab=&1", 0, 10)
        corpus.add(
            f"{rng.choice(schemes)}://{rand_text('abXY09.-', 1, 12)}{rng.choice(ports)}"
            f"{'/' + path if path else ''}{'?' + q if q else ''}{rng.choice(frags)}"
        )
    corpus |= {"", "nota url", "http://", "https://h", "https://h/?", "https://h/??a=1",
               "https://h:443", "https://h:443/", "x://y/z//", "https://H/A//B///c/"}
    corpus = sorted(corpus)
    df = spark.createDataFrame([(u,) for u in corpus if u], "url string")
    rows = df.select(
        "url",
        SCH.canonicalize_url(F.col("url")).alias("c1"),
        SCH.canonicalize_url(SCH.canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == canonicalize_url_py(r.url), repr(r.url)
        assert r.c2 == canonicalize_url_py(canonicalize_url_py(r.url)), repr(r.url)
        assert r.c2 == r.c1, f"not idempotent: {r.url!r} -> {r.c1!r} -> {r.c2!r}"


def test_schedule_matches_oracle_no_seen(spark):
    f = datagen.frontier(spark, N_URLS, n_hosts=N_HOSTS)
    h = datagen.hosts(spark, N_HOSTS)
    got = _collect_schedule(SCH.schedule_round(f, h))
    want = _oracle_schedule()
    assert got == want


def test_schedule_matches_oracle_with_seen_set(spark):
    f = datagen.frontier(spark, N_URLS, n_hosts=N_HOSTS)
    h = datagen.hosts(spark, N_HOSTS)
    # mark a deterministic slice of canonical urls as already fetched
    seen_py = {
        canonicalize_url_py(r["url"])
        for r in datagen.frontier_py(N_URLS, n_hosts=N_HOSTS)
        if r["seed_rank"] % 3 == 0
    }
    seen_df = spark.createDataFrame([(u,) for u in sorted(seen_py)], "url_c string")
    params = SN.BloomParams.for_capacity(len(seen_py), fp_rate=0.01, n_shards=8)
    bloom = SN.bloom_build(seen_df, "url_c", params).cache()

    got = _collect_schedule(
        SCH.schedule_round(f, h, bloom_state=bloom, bloom_params=params, seen_urls=seen_df)
    )
    want = _oracle_schedule(seen=seen_py)
    assert got == want
    # URL-seen-set match: nothing scheduled is in the seen set
    assert not ({u for u, *_ in got} & seen_py)


def test_probe_strategy_equivalence(spark):
    """Every physical probe strategy (broadcast scalar UDF, cogrouped shard
    probing, exact-table-only) must produce the identical schedule — the
    choice is a physical-plan decision, never a semantic one."""
    f = datagen.frontier(spark, N_URLS, n_hosts=N_HOSTS)
    h = datagen.hosts(spark, N_HOSTS)
    seen_py = {
        canonicalize_url_py(r["url"])
        for r in datagen.frontier_py(N_URLS, n_hosts=N_HOSTS)
        if r["seed_rank"] % 3 == 0
    }
    seen_df = spark.createDataFrame([(u,) for u in sorted(seen_py)], "url_c string")
    params = SN.BloomParams.for_capacity(len(seen_py), fp_rate=0.01, n_shards=8)
    bloom = SN.bloom_build(seen_df, "url_c", params).cache()

    results = [
        _collect_schedule(
            SCH.schedule_round(
                f, h, bloom_state=bloom, bloom_params=params, seen_urls=seen_df,
                probe_strategy=strat,
            )
        )
        for strat in ("broadcast", "cogroup")
    ]
    results.append(_collect_schedule(SCH.schedule_round(f, h, seen_urls=seen_df)))
    assert results[0] == results[1] == results[2]


def test_salting_invariance(spark):
    """The salted two-phase top-k must give identical results at any salt width."""
    f = datagen.frontier(spark, N_URLS, n_hosts=N_HOSTS)
    h = datagen.hosts(spark, N_HOSTS)
    a = _collect_schedule(SCH.schedule_round(f, h, n_salt=1))
    b = _collect_schedule(SCH.schedule_round(f, h, n_salt=64))
    assert a == b


def test_partitioning_invariance(spark):
    """Determinism under parallelism (north_rule): the schedule is identical
    whatever the input partitioning — the single-JVM proxy for running on N
    vs 4N executors."""
    f = datagen.frontier(spark, N_URLS, n_hosts=N_HOSTS)
    h = datagen.hosts(spark, N_HOSTS)
    a = _collect_schedule(SCH.schedule_round(f.repartition(2), h))
    b = _collect_schedule(SCH.schedule_round(f.repartition(23), h))
    assert a == b


def test_budget_respected(spark):
    f = datagen.frontier(spark, N_URLS, n_hosts=N_HOSTS)
    h = datagen.hosts(spark, N_HOSTS)
    sched = SCH.schedule_round(f, h)
    over = (
        sched.groupBy("host")
        .agg(F.count("*").alias("n"), F.first("crawl_delay_ms").alias("d"))
        .join(h.select("host", "max_fetch_per_round"), "host")
        .where(F.col("n") > F.col("max_fetch_per_round"))
    )
    assert over.count() == 0


def test_centrality_host_budgets(spark):
    """Share-based budget scaling: average-centrality host keeps its budget,
    above-average scales up (capped 4x), a host absent from the scores drops
    to min_budget, and an all-zero score vector leaves every budget
    unchanged (multiplier 1)."""
    hosts = spark.createDataFrame(
        [(h, 100, 40) for h in ("a", "b", "c", "d")],
        "host string, crawl_delay_ms int, max_fetch_per_round int",
    )
    # the average is over SCORED hosts (n=3): mults 0.5*3=1.5, 0.25*3=0.75;
    # d missing from the scores -> mult 0 -> min_budget floor
    scores = spark.createDataFrame(
        [("a", 0.5), ("b", 0.25), ("c", 0.25)], "host string, score double"
    )
    got = {
        r.host: (r.max_fetch_per_round, r.centrality_mult, r.crawl_delay_ms)
        for r in SCH.centrality_host_budgets(scores, hosts).collect()
    }
    assert got["a"] == (60, 1.5, 100)
    assert got["b"] == (30, 0.75, 100)
    assert got["c"] == (30, 0.75, 100)
    assert got["d"] == (1, 0.0, 100)
    # cap: one host holding the whole mass would be 4x the average of 4
    # hosts -> exactly the max_multiplier ceiling
    solo = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0), ("c", 0.0), ("d", 0.0)],
        "host string, score double",
    )
    capped = {
        r.host: r.centrality_mult
        for r in SCH.centrality_host_budgets(solo, hosts).collect()
    }
    assert capped["a"] == 4.0 and capped["b"] == 0.0
    # all-zero signal: budgets must pass through untouched
    zero = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0)], "host string, score double"
    )
    kept = {
        r.host: (r.max_fetch_per_round, r.centrality_mult)
        for r in SCH.centrality_host_budgets(zero, hosts).collect()
    }
    assert all(v == (40, 1.0) for v in kept.values())


def test_bucketed_frontier_path_matches_plain_and_drops_exchanges(spark, tmp_path):
    """The bucketed-frontier layout (sources/frontier_table.py): writing the
    drop canonicalized + bucketed by url_c makes schedule_round's dedup
    aggregate and exact-confirm join exchange-free, with OUTPUT IDENTICAL to
    the bloom+plain path. Pins both the equality and the plan shape (no
    url_c-keyed exchange anywhere in the bucketed plan)."""
    from dataset_crawler_spark.sources.frontier_table import BucketedFrontierTable
    from dataset_crawler_spark.sources.seen_table import BucketedSeenTable

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    frontier = datagen.frontier(spark, 4000, n_hosts=20)
    hosts = datagen.hosts(spark, 20)
    seen_plain = (
        frontier.where(F.xxhash64("url") % 3 == 0)
        .select(SCH.canonicalize_url(F.col("url")).alias("url_c"))
        .distinct()
    )
    st = BucketedSeenTable(spark, "t_seen_bf", str(tmp_path / "seen"), n_buckets)
    st.append(seen_plain, 0)
    seen = st.read()
    ft = BucketedFrontierTable(spark, "t_frontier_bf", str(tmp_path / "frontier"), n_buckets)
    ft.append(frontier)

    params = SN.BloomParams.for_capacity(4000, fp_rate=0.01, n_shards=4)
    bloom = SN.bloom_build(seen, "url_c", params)
    cols = ["url_c", "host", "seed_rank", "priority", "rank_in_host", "scheduled_offset_ms"]
    plain = SCH.schedule_round(
        frontier, hosts, bloom_state=bloom, bloom_params=params, seen_urls=seen
    ).select(cols)
    bucketed = SCH.schedule_round(ft.read(), hosts, seen_urls=seen).select(cols)

    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0

    bucketed.collect()
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(url_c" not in plan
    assert "Exchange hashpartitioning(_seen_url" not in plan
    # cleanup catalog entries for other tests in this session
    spark.sql("DROP TABLE t_seen_bf")
    spark.sql("DROP TABLE t_frontier_bf")


def test_bucketed_frontier_compaction_keeps_output_and_plan(spark, tmp_path):
    """Small-files maintenance: per-round appends each add up to a full
    bucket file set; compact() rewrites to ≤1 file per bucket with the
    scheduled output byte-identical and the exchange-free plan preserved."""
    from dataset_crawler_spark.sources.frontier_table import BucketedFrontierTable

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hosts = datagen.hosts(spark, 20)
    ft = BucketedFrontierTable(
        spark, "t_frontier_cp", str(tmp_path / "frontier"), n_buckets
    )
    full = datagen.frontier(spark, 3000, n_hosts=20)
    for rnd in range(4):  # 4 per-round drops → 4 appended file sets
        ft.append(full.where(F.xxhash64("url") % 4 == rnd))

    cols = ["url_c", "host", "seed_rank", "priority", "rank_in_host",
            "scheduled_offset_ms"]
    before = SCH.schedule_round(ft.read(), hosts).select(cols)
    before_rows = before.collect()

    info = ft.compact()
    assert info["files_after"] <= n_buckets < info["files_before"]

    after = SCH.schedule_round(ft.read(), hosts).select(cols)
    after_rows = after.collect()
    assert sorted(map(tuple, before_rows)) == sorted(map(tuple, after_rows))
    assert len(after_rows) > 0

    after.collect()
    plan = after._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(url_c" not in plan
    spark.sql("DROP TABLE t_frontier_cp")


def test_frontier_compaction_crash_recovery(spark, tmp_path):
    """compact()'s swap renames the live dir ASIDE before renaming the
    rewrite IN, so a crash at either point leaves one complete copy that
    ensure_registered() heals — never an empty table (the failure mode of
    rmtree-then-rename: crash between them loses the only copy and the next
    ensure_registered CREATEs an empty frontier)."""
    import os
    import shutil

    from dataset_crawler_spark.sources.frontier_table import BucketedFrontierTable

    loc = str(tmp_path / "frontier")
    ft = BucketedFrontierTable(spark, "t_frontier_cr", loc, 8)
    ft.append(datagen.frontier(spark, 1000, n_hosts=10))
    want = sorted(r.url_c for r in ft.read().select("url_c").collect())

    # crash point 1: between rename-aside and rename-in — live dir is gone,
    # the only copy sits in __old (catalog entry already dropped by compact)
    spark.sql("DROP TABLE t_frontier_cr")
    os.rename(loc, loc + "__old")
    ft.ensure_registered()
    got = sorted(r.url_c for r in ft.read().select("url_c").collect())
    assert got == want and not os.path.exists(loc + "__old")

    # crash point 2: after rename-in, before deleting the superseded copy —
    # live dir is the rewrite, __old is stale and must be dropped untouched
    spark.sql("DROP TABLE t_frontier_cr")
    shutil.copytree(loc, loc + "__old")
    ft.ensure_registered()
    got = sorted(r.url_c for r in ft.read().select("url_c").collect())
    assert got == want and not os.path.exists(loc + "__old")

    spark.sql("DROP TABLE t_frontier_cr")
