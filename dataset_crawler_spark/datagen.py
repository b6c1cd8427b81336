"""Deterministic synthetic data generator for the interleaved-document crawl
engine (FIXTURES.md §1-§4).

Two twin implementations of ONE spec:

- ``documents_for_round(spark, ...)`` — distributed, columnar (md5-derived
  columns, ``transform``/``sequence``; no Python on executors) — scales to the
  bench frontier.
- ``documents_for_round_py(...)`` — pure Python, byte-identical rows — feeds
  the crawler oracle (SURVEY.md §5.1) at test scale.

Everything derives from ``h60(tag|i|j)`` (functions/hashing.py): no wall clock,
no RNG state, identical at any parallelism.

Round-mutation taxonomy (FIXTURES.md §2), driven by ``m = h60("m|i") % 100``:

====================  ==========  ========================================
bucket                 rounds      semantics (reference citation)
====================  ==========  ========================================
m < 8                  r≥1 only    added (CrawlOperations.java:774-777)
8 ≤ m < 16             r0 only     deleted (:785-792)
16 ≤ m < 18            r0, r2      tombstone-resurrect (:341-357)
18 ≤ m < 26            mutate r≥1  same-count content change (:444-456)
26 ≤ m < 30            append r≥1  value-count change (:436-442)
30 ≤ m < 34            append r≥1  type add — rdf:type span (:458-479)
else                   all         unchanged (no lineage)
====================  ==========  ========================================
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_crawler_spark.functions.hashing import h60_py

KINDS = ["text", "text", "text", "title", "link", "image", "rdf:type", "meta", "code", "quote"]
N_TYPE_VOCAB = 40
MAX_BASE_SPANS = 8


# --------------------------------------------------------------------------
# Spark (columnar) side
# --------------------------------------------------------------------------

def _h(expr):
    """h60 of a string Column expression (columnar twin of h60_py)."""
    return F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("long")


def _tag(tag: str, *cols):
    return F.concat_ws("|", F.lit(tag), *cols)


def _host_index(i, n_hosts: int):
    """Zipf-ish host skew: host 0 ≈ 10%, host 1 ≈ 8%, rest uniform."""
    b = _h(_tag("h", i)) % 100
    return (
        F.when(b < 10, F.lit(0))
        .when(b < 18, F.lit(1))
        .otherwise((_h(_tag("h2", i)) % F.lit(max(n_hosts - 2, 1))) + 2)
    )


def _url(i, n_hosts: int):
    return F.concat(
        F.lit("https://host"),
        F.lpad(_host_index(i, n_hosts).cast("string"), 4, "0"),
        F.lit(".example.org/doc/"),
        i.cast("string"),
    )


def _base_span(i, j, n_docs: int, n_hosts: int):
    """One span struct for doc i position j (columnar)."""
    kind_ix = _h(_tag("k", i, j)) % len(KINDS)
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (kind_ix + 1).cast("int"))
    t1 = _h(_tag("t", i, j)) % 5000
    t2 = _h(_tag("t2", i, j)) % 5000
    text_val = F.concat(F.lit("tok"), t1.cast("string"), F.lit(" tok"), t2.cast("string"))
    type_val = F.concat(F.lit("Type"), (_h(_tag("ty", i, j)) % N_TYPE_VOCAB).cast("string"))
    img_ref = F.concat(
        F.lit("https://media.example.org/img/"),
        (_h(_tag("me", i, j)) % 100000).cast("string"),
        F.lit(".jpg"),
    )
    link_target = _url(_h(_tag("lk", i, j)) % n_docs, n_hosts)
    text = (
        F.when(kind == "image", F.lit(None).cast("string"))
        .when(kind == "link", F.lit(None).cast("string"))
        .when(kind == "rdf:type", type_val)
        .otherwise(text_val)
    )
    media_ref = (
        F.when(kind == "image", img_ref)
        .when(kind == "link", link_target)
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        j.cast("int").alias("offset"),
    )


def documents_for_round(
    spark: SparkSession,
    n_docs: int,
    crawl_round: int,
    n_hosts: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """The interleaved ``documents`` snapshot as fetched in ``crawl_round``."""
    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    m = _h(_tag("m", i)) % 100

    # round membership
    present = (
        F.when(m < 8, F.lit(crawl_round >= 1))
        .when(m < 16, F.lit(crawl_round == 0))
        .when(m < 18, F.lit(crawl_round != 1))
        .otherwise(F.lit(True))
    )
    df = rng.where(present)

    n_spans = (_h(_tag("n", i)) % MAX_BASE_SPANS) + 1
    spans = F.transform(
        F.sequence(F.lit(0).cast("long"), n_spans - 1),
        lambda j: _base_span(i, j, n_docs, n_hosts),
    )

    if crawl_round >= 1:
        u_ix = _h(_tag("u", i)) % n_spans  # which span mutates (content-update bucket)
        mutated = F.transform(
            spans,
            lambda s: F.when(
                F.lit(True) & (m >= 18) & (m < 26) & (s["offset"].cast("long") == u_ix),
                F.struct(
                    s["kind"].alias("kind"),
                    F.when(s["text"].isNotNull(), F.concat(s["text"], F.lit("|u1")))
                    .otherwise(s["text"])
                    .alias("text"),
                    F.when(s["text"].isNull() & s["media_ref"].isNotNull(),
                           F.concat(s["media_ref"], F.lit("|u1")))
                    .otherwise(s["media_ref"])
                    .alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).otherwise(s),
        )
        extra_text = F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("extra"), i.cast("string")).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            n_spans.cast("int").alias("offset"),
        )
        extra_type = F.struct(
            F.lit("rdf:type").alias("kind"),
            F.concat(F.lit("Type"), ((_h(_tag("ty2", i)) % N_TYPE_VOCAB)).cast("string")).alias(
                "text"
            ),
            F.lit(None).cast("string").alias("media_ref"),
            n_spans.cast("int").alias("offset"),
        )
        spans = (
            F.when((m >= 26) & (m < 30), F.concat(mutated, F.array(extra_text)))
            .when((m >= 30) & (m < 34), F.concat(mutated, F.array(extra_type)))
            .otherwise(mutated)
        )
        # tombstone-resurrection docs come back in r2 with their r0 content:
        # membership handles presence; content for m∈[16,18) stays base (no
        # mutation buckets overlap: [16,18) ∩ [18,34) = ∅).

    return df.select(_url(i, n_hosts).alias("doc_id"), spans.alias("spans"))


# --------------------------------------------------------------------------
# Pure-Python twin (oracle side)
# --------------------------------------------------------------------------

def _host_index_py(i: int, n_hosts: int) -> int:
    b = h60_py(f"h|{i}") % 100
    if b < 10:
        return 0
    if b < 18:
        return 1
    return (h60_py(f"h2|{i}") % max(n_hosts - 2, 1)) + 2


def _url_py(i: int, n_hosts: int) -> str:
    return f"https://host{_host_index_py(i, n_hosts):04d}.example.org/doc/{i}"


def _base_span_py(i: int, j: int, n_docs: int, n_hosts: int) -> tuple:
    kind = KINDS[h60_py(f"k|{i}|{j}") % len(KINDS)]
    if kind == "image":
        return (kind, None, f"https://media.example.org/img/{h60_py(f'me|{i}|{j}') % 100000}.jpg", j)
    if kind == "link":
        return (kind, None, _url_py(h60_py(f"lk|{i}|{j}") % n_docs, n_hosts), j)
    if kind == "rdf:type":
        return (kind, f"Type{h60_py(f'ty|{i}|{j}') % N_TYPE_VOCAB}", None, j)
    t1 = h60_py(f"t|{i}|{j}") % 5000
    t2 = h60_py(f"t2|{i}|{j}") % 5000
    return (kind, f"tok{t1} tok{t2}", None, j)


def documents_for_round_py(
    n_docs: int, crawl_round: int, n_hosts: int = 50
) -> list[tuple[str, list[tuple]]]:
    """Byte-identical twin of :func:`documents_for_round` (rows sorted by id)."""
    rows = []
    for i in range(n_docs):
        m = h60_py(f"m|{i}") % 100
        if m < 8:
            present = crawl_round >= 1
        elif m < 16:
            present = crawl_round == 0
        elif m < 18:
            present = crawl_round != 1
        else:
            present = True
        if not present:
            continue
        n_spans = (h60_py(f"n|{i}") % MAX_BASE_SPANS) + 1
        spans = [_base_span_py(i, j, n_docs, n_hosts) for j in range(n_spans)]
        if crawl_round >= 1:
            if 18 <= m < 26:
                jx = h60_py(f"u|{i}") % n_spans
                k, t, mr, off = spans[jx]
                if t is not None:
                    spans[jx] = (k, t + "|u1", mr, off)
                elif mr is not None:
                    spans[jx] = (k, t, mr + "|u1", off)
            elif 26 <= m < 30:
                spans.append(("text", f"extra{i}", None, n_spans))
            elif 30 <= m < 34:
                spans.append(
                    ("rdf:type", f"Type{h60_py(f'ty2|{i}') % N_TYPE_VOCAB}", None, n_spans)
                )
        rows.append((_url_py(i, n_hosts), spans))
    return rows


def documents_for_round_local(
    spark: SparkSession, n_docs: int, crawl_round: int, n_hosts: int = 50
) -> DataFrame:
    """LocalRelation twin of :func:`documents_for_round` for small inputs.

    Same rows (pinned by tests/test_datagen.py parity), but built driver-side
    via the pure-Python generator: the columnar generator's md5 expression
    tree costs Catalyst+Janino a near-constant ~seconds per query regardless
    of row count — a LocalRelation keeps small-fixture plans tiny. Use the
    columnar twin for bench-scale data, this one below ~10^4 rows."""
    from pyspark.sql import types as T

    from dataset_crawler_spark.schemas import SPAN

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("spans", T.ArrayType(SPAN)),
        ]
    )
    return spark.createDataFrame(
        documents_for_round_py(n_docs, crawl_round, n_hosts=n_hosts), schema
    )


# --------------------------------------------------------------------------
# Frontier + hosts (FIXTURES.md §3-§4)
# --------------------------------------------------------------------------

_DIRTY_VARIANTS = 6  # 0 clean | 1 fragment | 2 upper host | 3 :443 | 4 trail / | 5 unsorted query


def frontier(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 50,
    n_seeds: int = 20,
    crawl_id: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Raw (pre-canonicalization) frontier with dirty URL variants."""
    rng = spark.range(0, n_urls, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    hix = _host_index(i, n_hosts)
    host_l = F.concat(F.lit("host"), F.lpad(hix.cast("string"), 4, "0"), F.lit(".example.org"))
    host_u = F.upper(host_l)
    path = F.concat(F.lit("/doc/"), i.cast("string"))
    d = _h(_tag("d", i)) % _DIRTY_VARIANTS
    url = (
        F.when(d == 1, F.concat(F.lit("https://"), host_l, path, F.lit("#section")))
        .when(d == 2, F.concat(F.lit("https://"), host_u, path))
        .when(d == 3, F.concat(F.lit("https://"), host_l, F.lit(":443"), path))
        .when(d == 4, F.concat(F.lit("https://"), host_l, path, F.lit("/")))
        .when(d == 5, F.concat(F.lit("https://"), host_l, path, F.lit("?b=2&a=1")))
        .otherwise(F.concat(F.lit("https://"), host_l, path))
    )
    return rng.select(
        url.alias("url"),
        host_l.alias("host"),
        ((_h(_tag("p", i)) % 10000) / 10000.0).alias("priority"),
        F.lit(crawl_id).cast("int").alias("discovered_crawl_id"),
        (_h(_tag("s", i)) % n_seeds).cast("int").alias("seed_rank"),
        F.lit("pending").alias("state"),
    )


def frontier_py(n_urls: int, n_hosts: int = 50, n_seeds: int = 20, crawl_id: int = 0) -> list[dict]:
    rows = []
    for i in range(n_urls):
        hix = _host_index_py(i, n_hosts)
        host = f"host{hix:04d}.example.org"
        path = f"/doc/{i}"
        d = h60_py(f"d|{i}") % _DIRTY_VARIANTS
        if d == 1:
            url = f"https://{host}{path}#section"
        elif d == 2:
            url = f"https://{host.upper()}{path}"
        elif d == 3:
            url = f"https://{host}:443{path}"
        elif d == 4:
            url = f"https://{host}{path}/"
        elif d == 5:
            url = f"https://{host}{path}?b=2&a=1"
        else:
            url = f"https://{host}{path}"
        rows.append(
            {
                "url": url,
                "host": host,
                "priority": (h60_py(f"p|{i}") % 10000) / 10000.0,
                "discovered_crawl_id": crawl_id,
                "seed_rank": h60_py(f"s|{i}") % n_seeds,
                "state": "pending",
            }
        )
    return rows


def hosts(spark: SparkSession, n_hosts: int = 50) -> DataFrame:
    rng = spark.range(0, n_hosts, 1, 1)
    i = F.col("id")
    host = F.concat(F.lit("host"), F.lpad(i.cast("string"), 4, "0"), F.lit(".example.org"))
    return rng.select(
        host.alias("host"),
        (100 + (_h(_tag("cd", i)) % 400)).cast("int").alias("crawl_delay_ms"),
        (10 + (_h(_tag("mf", i)) % 90)).cast("int").alias("max_fetch_per_round"),
        F.when(_h(_tag("rb", i)) % 4 == 0, F.array(F.lit("/private")))
        .otherwise(F.array().cast("array<string>"))
        .alias("robots_disallow"),
        (_h(_tag("av", i)) % 20 != 0).alias("is_available"),
    )


def hosts_py(n_hosts: int = 50) -> list[dict]:
    rows = []
    for i in range(n_hosts):
        rows.append(
            {
                "host": f"host{i:04d}.example.org",
                "crawl_delay_ms": 100 + (h60_py(f"cd|{i}") % 400),
                "max_fetch_per_round": 10 + (h60_py(f"mf|{i}") % 90),
                "robots_disallow": ["/private"] if h60_py(f"rb|{i}") % 4 == 0 else [],
                "is_available": h60_py(f"av|{i}") % 20 != 0,
            }
        )
    return rows
