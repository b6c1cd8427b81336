"""robots.txt → politeness dimension rows.

The reference has no robots handling (its politeness is a per-request timeout,
README.md:50-53); the new engine's scheduler gates on a hosts dimension with
``robots_disallow`` prefixes + ``crawl_delay_ms`` (operators/scheduler.py).
This source materializes that dimension from fetched robots.txt bodies:
``(host, robots_txt)`` → ``(host, robots_disallow, crawl_delay_ms)``.

Parsing is per-document and inherently sectioned/stateful, so it runs as a
vectorized pandas UDF over Arrow batches — a dimension-table operation
(cardinality = hosts, not URLs), never on the frontier hot path.

Simplified standard semantics: honor the ``User-agent: *`` group (or a named
agent when ``agent`` is passed), collect its ``Disallow:`` path prefixes
(empty Disallow = allow-all and contributes nothing) and ``Crawl-delay:``
seconds (→ ms). ``#`` comments stripped; keys case-insensitive; a group ends
at the next User-agent line that starts a new section.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = "robots_disallow array<string>, crawl_delay_ms int"


def parse_robots_py(text: str, agent: str = "*") -> tuple[list[str], int | None]:
    """Pure-Python robots.txt parser (the spec; the UDF is its batch twin).

    Standard group-selection semantics: collect all groups, then apply the
    most specific match — groups naming ``agent`` exactly if any exist,
    otherwise the ``*`` groups. Consecutive User-agent lines share one group.
    """
    groups: list[tuple[list[str], list[str], int | None]] = []  # (agents, disallow, delay)
    agents: list[str] = []
    rules: list[str] = []
    delay: int | None = None
    collecting_agents = False

    def flush():
        nonlocal agents, rules, delay
        if agents:
            groups.append((agents, rules, delay))
        agents, rules, delay = [], [], None

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                flush()
                collecting_agents = True
            agents.append(val)
            continue
        collecting_agents = False
        if key == "disallow" and val:
            rules.append(val)
        elif key == "crawl-delay":
            try:
                delay = int(float(val) * 1000)
            except ValueError:
                pass
    flush()

    exact = [g for g in groups if agent in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    disallow = [p for g in chosen for p in g[1]]
    delays = [g[2] for g in chosen if g[2] is not None]
    return disallow, (delays[0] if delays else None)


def parse_robots(df: DataFrame, text_col: str = "robots_txt", agent: str = "*") -> DataFrame:
    """Add (robots_disallow, crawl_delay_ms) parsed from ``text_col``."""

    def run(batches):
        for pdf in batches:
            parsed = [parse_robots_py(t, agent) for t in pdf[text_col].fillna("")]
            out = pdf.drop(columns=[text_col]).copy()
            out["robots_disallow"] = [p[0] for p in parsed]
            out["crawl_delay_ms"] = pd.array(
                [p[1] for p in parsed], dtype="Int32"
            )
            yield out

    passthrough = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != text_col
    )
    return df.mapInPandas(run, f"{passthrough}, {ROBOTS_RULES_SCHEMA}")


def hosts_dim_from_robots(
    robots: DataFrame,
    default_delay_ms: int = 500,
    default_budget: int = 100,
) -> DataFrame:
    """(host, robots_txt) → scheduler hosts dimension (schema the robots_gate
    + politeness_topk expect); missing crawl-delay falls back to the default."""
    parsed = parse_robots(robots.select("host", "robots_txt"))
    return parsed.select(
        "host",
        F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms)).alias("crawl_delay_ms"),
        F.lit(default_budget).alias("max_fetch_per_round"),
        F.coalesce(F.col("robots_disallow"), F.array().cast("array<string>")).alias(
            "robots_disallow"
        ),
        F.lit(True).alias("is_available"),
    )
