"""Temporal joins Spark lacks as built-ins: as-of join and sessionization
helpers.

An as-of join ("for each left event, the most recent right row at or before
it, per key") is the workhorse of state-at-event-time analytics — e.g. the
crawl engine's "which snapshot was live when this fetch happened" (the batch
store answers that with `reconstruct_as_of`; this operator answers it row-
by-row inside one relational plan).

The naive Spark formulation — inequality join then per-key top-1 — is
quadratic on hot keys (every left row pairs with ALL earlier right rows
before the rank filter). This implementation is the scale-correct
merge-by-key shape:

  union(left tagged 1, right tagged 0)
    → ONE shuffle, partitioned by key, sorted by (ts, tag)
    → running `last(right_payload, ignorenulls=True)` window
    → keep left rows

Cost is a single exchange + sort over |L|+|R| rows regardless of key skew —
the same shape Flink/kdb use for as-of semantics. Ties at equal timestamps
resolve right-before-left (tag order), i.e. "at or before" is inclusive.

Right rows must be unique per (key, ts) for cross-engine determinism
(callers pre-aggregate; DuckDB's native ASOF JOIN — the oracle twin — has
the same requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the latest
    ``right`` row with ``right_ts <= left_ts`` for the same ``by`` key
    (nulls when no such row). Right payload columns (everything except
    ``by`` + ``right_ts``) are appended with ``suffix``; the matched right
    timestamp arrives as ``ts{suffix}``.
    """
    # Null-key caveat: window partitioning groups NULL keys together, so a
    # null-keyed left row would as-of-match null-keyed right rows — unlike
    # SQL join equality (and DuckDB ASOF JOIN), where NULL matches nothing.
    # Pre-filter null keys if SQL semantics are required; the registered
    # query's key (user_id) is non-null by construction.
    payload = [c for c in right.columns if c not in by and c != right_ts]
    r_struct = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c) for c in payload]
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
    )
    u = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType)).unionByName(l)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in l_cols]
    out_cols.append(F.col("_m.ts").alias(f"ts{suffix}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload)
    return matched.select(*out_cols)
