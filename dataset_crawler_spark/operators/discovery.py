"""Outlink extraction + frontier expansion — the discover loop's second half.

The reference discovers new resources by re-querying endpoints for type
membership every round (CrawlOperations.java:715-827: the fresh instance list
IS the discovery step); a web-scale frontier instead GROWS from the documents
it fetches: every fetched page's outlinks are candidate frontier rows for the
next round (north_rule: 10^10-URL frontier — the frontier reaches that size
precisely because fetched docs keep minting URLs).

Two extraction paths, both narrow (no shuffle touches span text):

- **link spans**: interleaved documents carry hyperlinks as spans with
  ``kind='link'`` and the target URL in ``media_ref`` (input_hint schema) —
  a typed column read, zero parsing.
- **text spans**: production HTML/text bodies carry URLs inline; a
  ``regexp_extract_all`` over text spans catches those. On the synthetic
  corpus this path yields nothing (word-soup text), but the plumbing is
  identical and unit-tested with an inline fixture.

Expansion policy: discovered URLs are canonicalized, grouped, and
prioritized by **in-link degree** (``priority = 1 - 1/(1+n_refs)``: more
citing pages ⇒ earlier fetch — the standard indegree frontier heuristic,
deterministic and bounded in [0.5, 1)). ``seed_rank`` is the
:data:`DISCOVERED_SEED_RANK` sentinel so seed-file URLs always outrank
discovered ones in the pinned crawl order (scheduler orders seed_rank ASC
first — reference seed-file precedence, IncrementalDatasetCrawler.java:154).

Scale shape: extraction explodes spans but immediately projects to the URL
column only; the single exchange is the per-URL degree aggregate
(map-side-combined, ~30-byte rows). The seen filter is NOT applied here —
expansion feeds the next round's frontier and the scheduler's bloom+exact
filter already dedups against history at schedule time (doing it twice would
shuffle the same keys twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_crawler_spark.functions.urls import canonicalize_url, host_of

#: seed_rank assigned to discovered (non-seed) frontier rows: sorts after
#: every real seed (seed files are ≤ 10^6 lines by convention).
DISCOVERED_SEED_RANK = 1_000_000

#: conservative absolute-URL shape for inline-text extraction (Java regex and
#: RE2 compatible — same subset discipline as the PII patterns).
_TEXT_URL_RE = r"https?://[a-zA-Z0-9.-]+(:[0-9]+)?(/[^\s\"'<>]*)?"


def extract_outlinks(live: DataFrame) -> DataFrame:
    """(doc_id, spans, …) → (parent_doc_id, url): every outlink occurrence.

    Link-span targets (``kind='link'`` → ``media_ref``) plus inline URLs in
    text spans. Duplicates are preserved (one row per citation) so the
    downstream degree aggregate counts true in-link multiplicity.
    """
    links = F.filter(
        "spans", lambda s: (s["kind"] == "link") & s["media_ref"].isNotNull()
    )
    from_links = live.select(
        F.col("doc_id").alias("parent_doc_id"),
        F.explode(F.transform(links, lambda s: s["media_ref"])).alias("url"),
    )
    texts = F.filter("spans", lambda s: s["text"].isNotNull())
    from_text = (
        live.select(
            F.col("doc_id").alias("parent_doc_id"),
            F.explode(F.transform(texts, lambda s: s["text"])).alias("t"),
        )
        .select(
            "parent_doc_id",
            F.explode(F.regexp_extract_all("t", F.lit(_TEXT_URL_RE), F.lit(0))).alias(
                "url"
            ),
        )
    )
    return from_links.unionByName(from_text)


def expand_frontier(
    live: DataFrame, crawl_id: int, exclude_self: bool = True
) -> DataFrame:
    """Fetched docs → pending frontier rows for round ``crawl_id + 1``.

    Canonicalizes outlink occurrences, drops self-links (a page citing
    itself discovers nothing), aggregates per canonical URL, and emits
    FRONTIER-schema rows prioritized by in-link degree.
    """
    out = extract_outlinks(live).withColumn("url_c", canonicalize_url(F.col("url")))
    if exclude_self:
        # doc_id IS the canonical URL in the engine convention (simulated_fetcher)
        out = out.where(F.col("url_c") != F.col("parent_doc_id"))
    deg = out.groupBy("url_c").agg(F.count("*").alias("n_refs"))
    return deg.select(
        F.col("url_c").alias("url"),
        host_of("url_c").alias("host"),
        (F.lit(1.0) - 1.0 / (1.0 + F.col("n_refs"))).alias("priority"),
        F.lit(crawl_id).cast("int").alias("discovered_crawl_id"),
        F.lit(DISCOVERED_SEED_RANK).cast("int").alias("seed_rank"),
        F.lit("pending").alias("state"),
    )


def mine_dust_rules(
    url_fps: DataFrame,
    min_support: int = 5,
    fp_group_cap: int = 6,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """DUST rule mining — learn URL-alias rewrite rules from duplicate
    content (Bar-Yossef, Keidar & Schonfeld, "Do Not Crawl in the DUST:
    Different URLs with Similar Text", WWW 2007 / TWEB 2009, DustBuster's
    rule-generation step).

    ``url_fps``: (url, fp) — one row per crawled URL with its content
    fingerprint (functions/hashing doc_fingerprint, or h60 of the text).
    Two different URLs sharing a fingerprint are a DUST pair; each pair
    votes for the substring substitution that maps one onto the other:
    strip the longest common prefix and longest common suffix, and the
    differing middles (α → β, ordered by url string order so every pair
    votes consistently) form a candidate rule "replace α with β". Rules
    are ranked by support (distinct pairs) and by how many distinct hosts
    they generalize across — a rule seen on many hosts ("" → "/index.html",
    "" → "www.") is a site-structure law worth adding to the canonicalizer;
    a rule supported by one host's quirks is not. The crawler applies
    high-support rules at frontier-ingest time so aliases collapse BEFORE
    the fetch budget is spent (the reference has no alias handling at all —
    its keys are endpoint-returned URIs taken verbatim,
    CrawlOperations.java:715-827).

    Scale shape (10^10 URLs): the pair generator joins on FINGERPRINT only
    — never all URL pairs — and fingerprints shared by more than
    ``fp_group_cap`` URLs (parked-domain templates, empty pages) are
    dropped by the same doc-frequency cap that bounds every dedup join in
    this engine, so a key yields ≤ cap·(cap−1)/2 pairs. The LCP/LCS per
    pair is an O(len²) expression over ≤2 kB URL strings (bounded constant;
    a binary-search LCP would be O(len·log len) but is not worth leaving
    whole-stage codegen for). Rule aggregation is a map-side-combined hash
    agg on ~tens-of-bytes keys.

    Returns (rule_from, rule_to, support, n_hosts), support DESC-worthy.
    """
    u = F.col("_ua")
    v = F.col("_ub")
    a = url_fps.select(F.col(fp_col).alias("_fp"), F.col(url_col).alias("_ua"))
    b = url_fps.select(F.col(fp_col).alias("_fp"), F.col(url_col).alias("_ub"))
    ok = (
        url_fps.groupBy(F.col(fp_col).alias("_fp"))
        .agg(F.count_distinct(url_col).alias("_nh"))
        .where((F.col("_nh") >= 2) & (F.col("_nh") <= fp_group_cap))
        .select("_fp")
    )
    pairs = (
        a.join(ok, "_fp").join(b, "_fp").where(u < v).select("_ua", "_ub")
    ).distinct()
    # longest common prefix / suffix via a codegen-side bounded scan:
    # max k ∈ [0, min_len] with equal length-k prefixes (then suffixes of
    # the remainder, capped so lcp + lcs ≤ min_len)
    lcp = F.expr(
        "array_max(filter(sequence(0, least(length(_ua), length(_ub))), "
        "k -> substring(_ua, 1, k) = substring(_ub, 1, k)))"
    )
    lcs = F.expr(
        "array_max(filter(sequence(0, least(length(_ua), length(_ub)) - _lcp), "
        "k -> right(_ua, k) = right(_ub, k)))"
    )
    mids = (
        pairs.withColumn("_lcp", lcp)
        .withColumn("_lcs", lcs)
        .select(
            F.substring(u, F.col("_lcp") + 1, F.length(u) - F.col("_lcp") - F.col("_lcs"))
            .alias("rule_from"),
            F.substring(v, F.col("_lcp") + 1, F.length(v) - F.col("_lcp") - F.col("_lcs"))
            .alias("rule_to"),
            host_of(u).alias("_host"),
        )
    )
    return (
        mids.groupBy("rule_from", "rule_to")
        .agg(
            F.count("*").alias("support"),
            F.count_distinct("_host").alias("n_hosts"),
        )
        .where(F.col("support") >= min_support)
    )


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    validate_against: DataFrame | None = None,
) -> DataFrame:
    """Collapse URL aliases with mined DUST rules (the application half of
    :func:`mine_dust_rules` — DustBuster's "use the rules to canonicalize
    the URL list" step, Bar-Yossef et al. TWEB 2009 §6).

    Each rule rewrites its ``rule_to`` middle to ``rule_from`` — the
    direction that maps an alias onto the lexicographically smaller form
    the miner keyed pairs by — applied in support order (strongest law
    first), one substitution per rule per URL. The result rides in a new
    ``url_collapsed`` column; the caller dedups on it at frontier-ingest
    time so aliases merge BEFORE fetch budget is spent.

    ``validate_against``: optional (url) frame of known-good URLs (the seen
    table, or the frontier itself). When given, a rewrite is kept only if
    the rewritten URL actually exists there — the distributed stand-in for
    DustBuster's fetch-and-compare validation, so an overreaching rule
    (a middle that happens to appear in an unrelated URL) cannot invent
    URLs that were never observed. Without it the rewrite is
    unconditional (trusted-rules mode).

    Scale shape: rules are a mined, support-thresholded DIMENSION (tens of
    rows) — collected once and folded into a single codegen replace chain;
    the URL column never shuffles. Validation adds one broadcast-friendly
    left join keyed on the rewritten URL.
    """
    rs = [
        (r["rule_from"], r["rule_to"])
        for r in rules.select("rule_from", "rule_to", "support")
        .orderBy(F.desc("support"), "rule_from", "rule_to")
        .collect()
        if r["rule_to"]  # a rule must have a non-empty middle to replace
    ]
    col = F.col(url_col)
    for frm, to in rs:
        col = F.replace(col, F.lit(to), F.lit(frm))
    out = urls.withColumn("url_collapsed", col)
    if validate_against is not None:
        known = validate_against.select(
            F.col(validate_against.columns[0]).alias("url_collapsed"),
            F.lit(True).alias("_known"),
        ).distinct()
        out = (
            out.join(known, "url_collapsed", "left")
            .withColumn(
                "url_collapsed",
                F.when(
                    F.col("_known") | (F.col("url_collapsed") == F.col(url_col)),
                    F.col("url_collapsed"),
                ).otherwise(F.col(url_col)),
            )
            .drop("_known")
        )
    return out
