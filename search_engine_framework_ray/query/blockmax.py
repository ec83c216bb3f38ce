"""Block-max top-k BM25 for flat bag-of-words ``#SUM`` queries (north-star
requirement; the reference evaluates exhaustively, ``QryopSlSum.java:42-112``
— this pruned path must return RANK-IDENTICAL results to that semantics).

Algorithm: term-at-a-time MaxScore with skip-block pruning over the on-disk
block headers (``functions/codec.py`` stores per-block ``max_tf``):

1. per-term score upper bound: BM25 ``tf_w = tf/(tf + k1((1-b) + b·dl/avg))``
   is increasing in tf and decreasing in dl, and every doc has ``dl ≥ tf``,
   so ``ub = idf · g(max_tf)`` with ``g(t) = t/(t + k1((1-b) + b·t/avg))``
   (g increasing). Same bound per block with the block's ``max_tf``.
2. process terms in descending ub with a dense per-shard accumulator; after
   enough mass is accumulated that no UNSEEN doc can reach the top-k
   (remaining positive-ub suffix < current kth score θ), later terms decode
   only the skip blocks whose docid range intersects surviving candidates.
3. pruning is strict (`< θ`), so score-ties are never dropped, and winners
   received every update (a candidate's blocks are always decoded) — the
   final top-k doc set equals the exhaustive one.
4. winners' scores are then RECOMPUTED by accumulating per-term scores in
   original query order, reproducing ``_eval_sum``'s float-addition order
   bit-for-bit (ub-descending accumulation would differ in the last ulp).

Falls back (returns None) for: non-BM25, non-flat trees, any non-positive
idf (negative contributions break the monotone-θ argument), or unranked
models. The caller then runs the exhaustive evaluator.
"""

from __future__ import annotations

import math

import numpy as np

from .ast import ScoreNode, SumOp, Term

MIN_DOCS_FOR_PRUNING = 0  # pruned path is exact, so always eligible


def _g(tf: float, k1: float, b: float, avg_doclen: float) -> float:
    return tf / (tf + k1 * ((1 - b) + b * (tf / avg_doclen)))


def try_blockmax_bm25(view, qtree, params, score_stats: dict, k: int):
    """→ (docids, scores) top-k for this shard, or None if not applicable."""
    if params.model != "BM25" or not isinstance(qtree, SumOp):
        return None
    leaves: list[Term] = []
    sids: list[int] = []
    for c in qtree.args:
        if not (isinstance(c, ScoreNode) and isinstance(c.child, Term)):
            return None
        leaves.append(c.child)
        sids.append(c.score_id)

    N = view.n_docs
    k1, b = params.k1, params.b
    reader = view.reader
    base = reader.docid_base
    n_local = reader.n_docs

    terms = []
    for leaf, sid in zip(leaves, sids):
        df_g, _ = score_stats.get(sid, (0, 0))
        if df_g <= 0:
            continue  # no postings anywhere
        idf = math.log((N - df_g + 0.5) / (df_g + 0.5))
        if idf <= 0.0:
            return None  # negative contribution → exhaustive path
        headers = reader.get_headers(leaf.fieldname, leaf.term)
        if headers is None or headers.size == 0:
            continue  # term absent in this shard
        avg_doclen = view.sum_doclen(leaf.fieldname) / view.doccount(leaf.fieldname)
        ub = idf * _g(float(headers["max_tf"].max()), k1, b, avg_doclen)
        terms.append(
            {
                "field": leaf.fieldname,
                "term": leaf.term,
                "idf": idf,
                "avg": avg_doclen,
                "headers": headers,
                "ub": ub,
            }
        )
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    order = sorted(range(len(terms)), key=lambda i: -terms[i]["ub"])
    suffix = np.zeros(len(order) + 1)
    for j in range(len(order) - 1, -1, -1):
        suffix[j] = suffix[j + 1] + terms[order[j]]["ub"]

    acc = np.zeros(n_local, dtype=np.float64)
    seen = np.zeros(n_local, dtype=bool)
    theta = -np.inf
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # i → (docids, scores)

    for rank_j, i in enumerate(order):
        t = terms[i]
        allow_new = suffix[rank_j] >= theta or not math.isfinite(theta)
        if allow_new:
            mask = None
        else:
            # only candidate docs matter now: decode blocks whose docid
            # range intersects surviving candidates
            cand = np.flatnonzero(seen & (acc + suffix[rank_j] >= theta)) + base
            if cand.size == 0:
                decoded[i] = (np.empty(0, np.int64), np.empty(0, np.float64))
                continue
            last = t["headers"]["last_docid"].astype(np.int64)
            lo = np.empty_like(last)
            lo[0] = 0
            lo[1:] = last[:-1] + 1
            mask = np.searchsorted(cand, lo) < np.searchsorted(cand, last + 1)
            if not mask.any():
                decoded[i] = (np.empty(0, np.int64), np.empty(0, np.float64))
                continue
        docids, tfs = reader.get_postings_masked(t["field"], t["term"], mask)
        if docids.size == 0:
            decoded[i] = (docids, np.empty(0, np.float64))
            continue
        doclen = reader.doclen(t["field"], docids).astype(np.float64)
        tf = tfs.astype(np.float64)
        tf_w = tf / (tf + k1 * ((1 - b) + b * (doclen / t["avg"])))
        scores = t["idf"] * tf_w
        decoded[i] = (docids, scores)
        local = docids - base
        acc[local] += scores
        seen[local] = True
        n_seen = int(seen.sum())
        if n_seen >= k:
            vals = acc[seen]
            theta = np.partition(vals, vals.size - k)[vals.size - k]

    cand = np.flatnonzero(seen)
    if cand.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    scores = acc[cand]
    top = np.lexsort((cand, -scores))[:k]
    win_local = cand[top]
    win_docids = win_local + base

    # exact recompute in ORIGINAL query order for bit-identity with
    # the exhaustive _eval_sum accumulation
    final = np.zeros(win_docids.size, dtype=np.float64)
    for leaf, sid in zip(leaves, sids):
        for i, t in enumerate(terms):
            if t["field"] == leaf.fieldname and t["term"] == leaf.term:
                docids, scores_i = decoded.get(i, (None, None))
                if docids is None or docids.size == 0:
                    break
                idx = np.searchsorted(docids, win_docids)
                idx_c = np.clip(idx, 0, docids.size - 1)
                m = docids[idx_c] == win_docids
                final += np.where(m, scores_i[idx_c], 0.0)
                break
    order_f = np.lexsort((win_docids, -final))[:k]
    return win_docids[order_f], final[order_f]
