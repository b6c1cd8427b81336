"""Pure-Python twin of operators/scheduler.py — exact crawl-order oracle.

Same pinned total order, exact seen-set semantics (the engine's
bloom+anti-join combination is exact by construction, so both sides agree).
"""

from __future__ import annotations

from dataset_crawler_spark.functions.urls import canonicalize_url_py


def schedule_round_py(
    frontier_rows: list[dict],
    host_rows: list[dict],
    seen_urls: set[str] | None = None,
) -> list[dict]:
    """Returns scheduled rows sorted by the global order
    (seed_rank, host, rank_in_host)."""
    hosts = {h["host"]: h for h in host_rows}
    seen = seen_urls or set()

    # canonicalize + dedup (min seed_rank, max priority, min discovered)
    cand: dict[str, dict] = {}
    for r in frontier_rows:
        if r["state"] != "pending":
            continue
        u = canonicalize_url_py(r["url"])
        c = cand.get(u)
        if c is None:
            host = u.split("://", 1)[1].split("/", 1)[0].split(":")[0].lower()
            cand[u] = {
                "url_c": u,
                "host": host,
                "seed_rank": r["seed_rank"],
                "priority": r["priority"],
                "discovered_crawl_id": r["discovered_crawl_id"],
            }
        else:
            c["seed_rank"] = min(c["seed_rank"], r["seed_rank"])
            c["priority"] = max(c["priority"], r["priority"])
            c["discovered_crawl_id"] = min(c["discovered_crawl_id"], r["discovered_crawl_id"])

    # seen filter + robots gate
    kept: dict[str, list[dict]] = {}
    for u, c in cand.items():
        if u in seen:
            continue
        h = hosts.get(c["host"])
        if h is None or not h["is_available"]:
            continue
        rest = u.split("://", 1)[1]
        path = "/" + rest.split("/", 1)[1] if "/" in rest else ""
        if any(path.startswith(p) for p in h["robots_disallow"]):
            continue
        c["crawl_delay_ms"] = h["crawl_delay_ms"]
        kept.setdefault(c["host"], []).append(c)

    # per-host top-k by (priority desc, seed_rank asc, url asc)
    out = []
    for host, rows in kept.items():
        rows.sort(key=lambda c: (-c["priority"], c["seed_rank"], c["url_c"]))
        budget = hosts[host]["max_fetch_per_round"]
        for i, c in enumerate(rows[:budget]):
            c["rank_in_host"] = i + 1
            c["scheduled_offset_ms"] = i * c["crawl_delay_ms"]
            out.append(c)
    out.sort(key=lambda c: (c["seed_rank"], c["host"], c["rank_in_host"]))
    return out
