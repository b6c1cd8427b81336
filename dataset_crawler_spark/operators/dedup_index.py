"""Incremental MinHash-LSH dedup index.

At 100 TB a corpus is not re-deduped from scratch every crawl round — the
round's NEW documents are checked against (and then added to) a persisted
band-signature index. Cost per round is proportional to |new| + the touched
band buckets, not |corpus|:

  new docs → shingle → minhash → band signatures   (|new| rows × n_bands)
  pairs    = new ⋈ index on (band, band_sig)       (bucket hash-join)
           ∪ new ⋈ new                              (same join, new side)
  index   += new band signatures                    (append-only; the
             SnapshotStore/Iceberg table `band_sigs`, partitioned by band)

The union of per-round pair outputs over all rounds is EXACTLY the batch
MinHash-LSH pair set over the union of all rounds' documents (every pair has
a round in which its later member was new) — `engine_incremental_minhash`
in plans/queries.py value-hash-checks that equivalence against the batch
DuckDB twin, and the lifecycle pytest drives it through a SnapshotStore.

The band-signature builder here is the ONE implementation shared by the
batch queries (plans/queries.py passes the cross-engine h60 hasher so the
DuckDB twins replicate signatures bit-for-bit) and the engine (default
xxhash64, the faster JVM-side hash, when no oracle is in the loop).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_hash(c: Column) -> Column:
    return F.xxhash64(c)


def shingles(docs: DataFrame, n: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, s): word n-gram shingles per document.

    ``distinct=True`` gives set semantics (what Jaccard cardinalities and
    xor fingerprints need) — implemented as a per-row ``array_distinct``
    BEFORE the explode, which is identical to a global
    ``(doc_id, s) DISTINCT`` (shingles never cross documents) but purely
    NARROW: no exchange at any corpus size. ``distinct=False`` skips even
    that for duplicate-insensitive consumers (MIN for minhash). Measured at
    1M docs / 38M shingles, local[32]: the old shuffle-based distinct alone
    cost more than the entire dedup-pair plan without it."""
    d = docs.select("doc_id", F.split("text", " ").alias("t"))
    cnt = F.greatest(F.size("t") - (n - 1), F.lit(1))
    arr = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)),
    )
    return d.select(
        "doc_id",
        F.explode(F.array_distinct(arr) if distinct else arr).alias("s"),
    )


def minhash_bands(
    docs: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    hash_fn: Callable[[Column], Column] = _default_hash,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band, band_sig): banded MinHash signatures.

    The k hash streams are k parallel MIN aggregates over ONE pass of the
    shingle rows — not an explode(seeds) k× row blowup: same hash work, 1/k
    the shuffle into the signature aggregate. The shingle stream is NOT
    deduplicated: MIN is duplicate-insensitive, so signatures are identical
    with or without the distinct, and skipping it removes a full
    corpus-sized exchange — the map-side partial MIN absorbs duplicates
    before the shuffle, which therefore carries only ~|docs|·k longs.

    Deliberately explode+groupBy, NOT a per-row ``array_min`` fold over a
    shingle array: higher-order array functions are interpreted
    expressions, and measured at 1M docs / 38M shingles the "zero-shuffle"
    fold ran 4× SLOWER at every width than this codegen'd explode+partial
    aggregate (229 s vs 54 s at local[2]) — the narrow plan is not the
    faster plan when it trades a cheap post-combine exchange for
    interpreted per-element evaluation of k seed streams.
    """
    sh = shingles(docs, n=shingle_n, distinct=False)
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(hash_fn(F.concat(F.lit(f"{seed}|"), F.col("s")))).alias(f"_s{seed}")
            for seed in range(k)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).cast("long").alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"_s{seed}").cast("string")
                        for seed in range(band * rows_per_band, (band + 1) * rows_per_band)
                    ],
                ).alias("band_sig"),
            )
            for band in range(k // rows_per_band)
        ]
    )
    return mh.select("doc_id", F.explode(band_structs).alias("_b")).select(
        "doc_id", F.col("_b.band").alias("band"), F.col("_b.band_sig").alias("band_sig")
    )


def band_pairs(bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: same (band, band_sig), doc_a < doc_b."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def latest_bands(index: DataFrame) -> DataFrame:
    """Last-writer-wins view of a persisted band index whose rows carry a
    ``crawl_id`` column: a re-crawled (updated) document's newest signatures
    replace its stale ones — the read-side dedup that append-only storage
    (SnapshotStore / Iceberg appends) needs before the pair join, same
    last-state-wins fold the engine uses everywhere else. One hash aggregate
    keyed by (doc_id, band)."""
    return (
        index.groupBy("doc_id", "band")
        .agg(F.max_by("band_sig", "crawl_id").alias("band_sig"))
    )


def incremental_band_pairs(
    index_bands: DataFrame | None, new_bands: DataFrame
) -> DataFrame:
    """Candidate pairs involving at least one NEW document: new×index plus
    new×new, as (doc_a, doc_b) with doc_a < doc_b. ``index_bands`` is the
    persisted band table (None on the first round). The caller appends
    ``new_bands`` to the index afterwards; pairs already emitted in earlier
    rounds (both docs old) are never recomputed."""
    within = band_pairs(new_bands)
    if index_bands is None:
        return within
    n, i = new_bands.alias("n"), index_bands.alias("i")
    cross = (
        n.join(
            i,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.band_sig") == F.col("i.band_sig"))
            & (F.col("n.doc_id") != F.col("i.doc_id")),
        )
        .select(
            F.least("n.doc_id", "i.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "i.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return within.unionByName(cross).distinct()
