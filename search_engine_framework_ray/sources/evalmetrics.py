"""TREC effectiveness metrics: P@k and (M)AP per query + ``all``.

The reference computes these by POSTing its run file to a remote
``trec_eval`` service and parsing ``P10/P20/P30/map`` back
(``test.pl:10-29``, ``hw4test.py:46-84``); no service exists here, so this
is the standard trec_eval computation done locally:

* P@k  = |relevant ∩ top-k| / k (ranks beyond the run count as misses);
* AP   = (Σ_{r : doc_r relevant} P@r) / |relevant(qid)| over the full run,
  0 when the query has no judged-relevant docs;
* ``all`` row = arithmetic mean over queries (trec_eval's convention).

Relevance = qrels grade > 0 (graded judgments binarized, as trec_eval's
default condensed mapping does).
"""

from __future__ import annotations


def precision_at_k(run: list[str], relevant: set[str], k: int) -> float:
    """``run`` = ranked external ids; ranks past len(run) are misses."""
    if k <= 0:
        return 0.0
    hits = sum(1 for d in run[:k] if d in relevant)
    return hits / k


def average_precision(run: list[str], relevant: set[str]) -> float:
    if not relevant:
        return 0.0
    hits = 0
    ap = 0.0
    for r, d in enumerate(run, start=1):
        if d in relevant:
            hits += 1
            ap += hits / r
    return ap / len(relevant)


def evaluate_run(
    run: dict[str, list[tuple[str, float]]],
    qrels: dict[str, dict[str, int]],
    ks: tuple[int, ...] = (10, 20, 30),
) -> dict[str, dict[str, float]]:
    """→ qid → {"P10": …, "P20": …, "P30": …, "map": …} plus an ``all``
    row of per-metric means over the evaluated queries.

    ``run``: qid → [(extid, score)] in rank order (``read_trec_run`` shape).
    ``qrels``: qid → extid → grade. Queries absent from qrels are skipped
    (trec_eval evaluates judged queries only).
    """
    out: dict[str, dict[str, float]] = {}
    for qid, rows in run.items():
        judged = qrels.get(qid)
        if judged is None:
            continue
        relevant = {d for d, g in judged.items() if g > 0}
        ranked = [d for d, _ in rows]
        m = {f"P{k}": precision_at_k(ranked, relevant, k) for k in ks}
        m["map"] = average_precision(ranked, relevant)
        out[qid] = m
    if out:
        keys = [f"P{k}" for k in ks] + ["map"]
        out["all"] = {
            key: sum(m[key] for q, m in out.items() if q != "all") / len(out)
            for key in keys
        }
    return out


def read_qrels_grouped(path: str) -> dict[str, dict[str, int]]:
    """``qid 0 extid rel`` lines → qid → extid → grade
    (LearnToRank.java:113-127 format)."""
    out: dict[str, dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            out.setdefault(parts[0], {})[parts[2]] = int(parts[3])
    return out
