"""Pure-Python, dependency-free re-implementation of the reference crawler's
diff + fold semantics (SURVEY.md §5.1) — the keystone correctness oracle.

Mirrors, with no Spark involved:

- the three-way diff added/deleted/updated with tombstone exclusion
  (CrawlOperations.java:715-827; see operators/diff.py for the pinned rules)
- the change gate (value-count or fingerprint mismatch, :436-456)
- the per-kind occurrence value diff (:507-593), deterministic variant:
  span identity (kind, text, media_ref), occurrences matched in ascending
  offset order
- last-state-wins folds (W1-W3; CrawlOperations.java:347-357)
- the pinned canonical crawl order (seed_rank asc, kind asc, url asc) — the
  reference's HashSet order is unspecified (SURVEY.md §2.10 T2), so both the
  engine and this oracle use the same canonical total order.

Spans are (kind, text, media_ref, offset) tuples; docs are
{doc_id: [span, ...]}.
"""

from __future__ import annotations

from collections import defaultdict

LOG_ADDED, LOG_UPDATED, LOG_DELETED = "added", "updated", "deleted"


def span_ops_for_doc(prev_spans: list[tuple], live_spans: list[tuple]) -> list[tuple]:
    """Per-kind occurrence diff → sorted [(kind, offset, op), ...]."""

    def occ_index(spans):
        seen: dict[tuple, int] = defaultdict(int)
        out = {}
        for kind, text, media_ref, offset in sorted(spans, key=lambda s: s[3]):
            key = (kind, text, media_ref)
            seen[key] += 1
            out[(key, seen[key])] = offset
        return out

    prev = occ_index(prev_spans)
    live = occ_index(live_spans)
    ops = []
    for k, off in prev.items():
        if k not in live:
            ops.append((off, LOG_DELETED, k[0][0]))
    for k, off in live.items():
        if k not in prev:
            ops.append((off, LOG_ADDED, k[0][0]))
    ops.sort()  # (offset, op, kind) — same canonical order as the engine
    return [(kind, off, op) for off, op, kind in ops]


class CrawlerOracle:
    """Stateful round-by-round oracle: feed live snapshots, get lineage."""

    def __init__(self, resurrect: bool = False):
        self.resurrect = resurrect
        self.spans: dict[str, list[tuple]] = {}
        self.last_op: dict[str, str] = {}

    def run_round(self, live: dict[str, list[tuple]], crawl_id: int) -> dict[str, tuple]:
        """Returns {doc_id: (op, span_ops)} lineage for this round."""
        lineage: dict[str, tuple] = {}
        known = set(self.last_op)
        tomb = {d for d, op in self.last_op.items() if op == LOG_DELETED}

        for d in live.keys() - known:
            lineage[d] = (LOG_ADDED, [])
        if self.resurrect:
            for d in live.keys() & tomb:
                lineage[d] = (LOG_ADDED, [])
        for d in known - live.keys() - tomb:
            lineage[d] = (LOG_DELETED, [])
        for d in (known & live.keys()) - tomb:
            if self.spans[d] != live[d]:  # fingerprint gate ≡ exact sequence compare
                lineage[d] = (LOG_UPDATED, span_ops_for_doc(self.spans[d], live[d]))

        # fold state
        for d, (op, _) in lineage.items():
            self.last_op[d] = op
            if op in (LOG_ADDED, LOG_UPDATED):
                self.spans[d] = live[d]
        return lineage

    def visible_docs(self) -> dict[str, list[tuple]]:
        """Snapshot reconstruction: docs whose last state ≠ deleted (W3)."""
        return {d: self.spans[d] for d, op in self.last_op.items() if op != LOG_DELETED}
