"""TREC effectiveness metrics: P@k and (M)AP per query + ``all``.

The reference computes these by POSTing its run file to a remote
``trec_eval`` service and parsing ``P10/P20/P30/map`` back
(``test.pl:10-29``, ``hw4test.py:46-84``); no service exists here, so this
is the standard trec_eval computation done locally:

* P@k  = |relevant ∩ top-k| / k (ranks beyond the run count as misses);
* AP   = (Σ_{r : doc_r relevant} P@r) / |relevant(qid)| over the full run,
  0 when the query has no judged-relevant docs;
* NDCG@k = DCG@k / ideal-DCG@k with LINEAR gain (trec_eval's ``ndcg``)
  and a natural-log discount (the log base cancels in the ratio);
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


def dcg_at_k(gains: list[int], k: int) -> float:
    """Discounted cumulative gain over the first k ranks, LINEAR gain and
    natural-log discount: ``Σ_{r≤k} g_r / ln(r+1)``. trec_eval's ndcg uses
    log2; the base is a constant factor that cancels in the NDCG ratio, and
    ln() is the transcendental both this engine and its DuckDB oracles
    already share (see lm/tfidf parity notes)."""
    import math

    return sum(g / math.log(r + 1) for r, g in enumerate(gains[:k], start=1) if g)


def ndcg_at_k(gains: list[int], all_grades: list[int], k: int) -> float:
    """NDCG@k = DCG@k(run) / DCG@k(ideal). ``gains`` are the run's grades
    in rank order (misses = 0); ``all_grades`` are the grades of EVERY
    judged-relevant doc for the query (the ideal ranking sorts them
    descending). 0 when the query has no relevant docs."""
    ideal = dcg_at_k(sorted(all_grades, reverse=True), k)
    if ideal <= 0:
        return 0.0
    return dcg_at_k(gains, k) / ideal


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
        all_grades = [g for g in judged.values() if g > 0]
        gains = [judged.get(d, 0) for d in ranked]
        gains = [g if g > 0 else 0 for g in gains]
        for k in (10, 20):
            m[f"ndcg{k}"] = ndcg_at_k(gains, all_grades, k)
        out[qid] = m
    if out:
        keys = [f"P{k}" for k in ks] + ["map", "ndcg10", "ndcg20"]
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


def reciprocal_rank(run: list[str], relevant: set[str]) -> float:
    """1 / rank of the first relevant document in the run; 0.0 when the
    run contains none (trec_eval's recip_rank)."""
    for i, d in enumerate(run, start=1):
        if d in relevant:
            return 1.0 / i
    return 0.0
