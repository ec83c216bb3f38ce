"""Vectorized DAAT evaluation kernels for the structured query algebra.

Semantics are replicated operator-by-operator from the reference (citations
inline); the implementation is numpy sorted-array algebra instead of Java
cursor loops — identical outputs, batch-friendly.

The evaluator runs against any object implementing the *index view* duck
type::

    view.get_postings(field, term) -> (docids:int64[], tfs:int32[],
                                       pos_offsets:int64[], pos_flat:int32[])
    view.doclen(field, docids)     -> int32[]       # per-doc field length
    view.n_docs                    -> int           # GLOBAL N (QryopSlScore.java:132)
    view.sum_doclen(field)         -> int           # sumTotalTermFreq(field)
    view.doccount(field)           -> int           # docCount(field)

``score_stats`` maps a ScoreNode's ``score_id`` → global ``(df, ctf)`` of its
evaluated inverted list. The reference reads df/ctf off the evaluated list
itself (QryopSlScore.java:95,136) — single-process that IS the global value;
a shard evaluating locally must be handed the cross-shard total for scores to
be globally comparable (SURVEY.md §3.1). With ``score_stats=None`` the local
list stats are used (oracle / single-shard mode — exact reference behavior).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

from .ast import (
    AndNotOp,
    AndOp,
    Near,
    Node,
    OrOp,
    ScoreNode,
    SumOp,
    Syn,
    Term,
    WandOp,
    Window,
    WsumOp,
)
from ..functions.numerics import LOG2_E, log2_64, log2_64_scalar, pow64
from .models import ModelParams


@dataclass
class InvResult:
    """Docid-ascending inverted list (reference InvList.java:17-52)."""

    field: str
    docids: np.ndarray  # int64
    tfs: np.ndarray  # int32
    pos_offsets: np.ndarray  # int64, len df+1
    pos_flat: np.ndarray  # int32

    @property
    def df(self) -> int:
        return len(self.docids)

    @property
    def ctf(self) -> int:
        return int(self.tfs.sum())

    def positions(self, i: int) -> np.ndarray:
        return self.pos_flat[self.pos_offsets[i] : self.pos_offsets[i + 1]]


@dataclass
class ScoreResult:
    """Docid-ascending score list + Indri default-score closure
    (QryopSl.getDefaultScore, QryopSl.java:50)."""

    docids: np.ndarray
    scores: np.ndarray
    default_fn: Callable[[np.ndarray], np.ndarray] | None = None

    def defaults(self, docids: np.ndarray) -> np.ndarray:
        if self.default_fn is None:
            return np.zeros(len(docids), dtype=np.float64)
        return self.default_fn(docids)


def _empty_inv(field: str) -> InvResult:
    return InvResult(
        field,
        np.empty(0, np.int64),
        np.empty(0, np.int32),
        np.zeros(1, np.int64),
        np.empty(0, np.int32),
    )


def _member_mask(docids: np.ndarray, candidates: np.ndarray) -> np.ndarray:
    """Membership mask of sorted ``candidates`` in sorted ``docids`` via one
    searchsorted probe — O(|candidates|·log|docids|), the small-vs-large
    intersection regime (vs np.isin's sort of the probe set every call)."""
    if len(docids) == 0:
        return np.zeros(len(candidates), dtype=bool)
    idx = np.searchsorted(docids, candidates)
    idxc = np.minimum(idx, len(docids) - 1)
    return docids[idxc] == candidates


def _lookup(
    docids: np.ndarray, values: np.ndarray, candidates: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(matched mask, values at candidates [0 where unmatched]) — vectorized
    membership probe of a sorted docid list."""
    if len(docids) == 0:
        z = np.zeros(len(candidates), dtype=bool)
        return z, np.zeros(len(candidates), dtype=np.float64)
    idx = np.searchsorted(docids, candidates)
    idxc = np.minimum(idx, len(docids) - 1)
    matched = docids[idxc] == candidates
    vals = np.where(matched, values[idxc].astype(np.float64), 0.0)
    return matched, vals


class Evaluator:
    def __init__(
        self,
        view,
        params: ModelParams,
        score_stats: dict | None = None,
        il_cache: "dict | None" = None,
        il_cache_key: object = None,
    ):
        self.view = view
        self.p = params
        self.model = params.model
        self.score_stats = score_stats
        # Optional worker-held cache of evaluated COMPOSITE inverted lists
        # (#NEAR/#WINDOW/#SYN under #SCORE), keyed (il_cache_key, repr(tree))
        # — dataclass reprs are content-complete, so the key is stable across
        # the stats prepass and the scoring pass, which otherwise evaluate
        # the same positional subtree twice per (query, shard). Tail-latency
        # fix: composite queries' p90 was ~2x the double-evaluation cost.
        self.il_cache = il_cache
        self.il_cache_key = il_cache_key

    # ---------- inverted-list algebra (QryopIl) ----------

    def eval_il_cached(self, node: Node) -> InvResult:
        """:meth:`eval_il` through the composite-list cache. Term lists are
        cheap mmap slices and are never cached; composite positional
        subtrees (the expensive decode+match) are."""
        if self.il_cache is None or isinstance(node, Term):
            return self.eval_il(node)
        key = (self.il_cache_key, repr(node))
        inv = self.il_cache.get(key)
        if inv is None:
            inv = self.eval_il(node)
            self.il_cache[key] = inv
            while len(self.il_cache) > 128:  # bound worker heap (FIFO evict)
                self.il_cache.pop(next(iter(self.il_cache)))
        return inv

    def eval_il(self, node: Node) -> InvResult:
        if isinstance(node, Term):
            d, t, po, pf = self.view.get_postings(node.fieldname, node.term)
            return InvResult(node.fieldname, d, t, po, pf)
        if isinstance(node, Syn):
            return self._eval_syn(node)
        if isinstance(node, Near):
            return self._eval_positional(node, mode="near", n=node.dist)
        if isinstance(node, Window):
            return self._eval_positional(node, mode="window", n=node.width)
        raise TypeError(f"not an Il node: {node}")

    def _child_invs(self, node: Node) -> list[InvResult]:
        invs = [self.eval_il(a) for a in node.args]
        fields = {iv.field for iv in invs}
        if len(fields) > 1:  # same-field requirement (QryopIlNear.java:156-169)
            raise ValueError(f"arguments must be in the same field: {fields}")
        return invs

    def _eval_syn(self, node: Syn) -> InvResult:
        """#SYN: per-doc union of positions, duplicates kept
        (QryopIlSyn.java:46-120)."""
        invs = self._child_invs(node)
        if not invs:
            return _empty_inv("body")
        doc_runs, pos_runs = [], []
        for iv in invs:
            doc_runs.append(np.repeat(iv.docids, iv.tfs))
            pos_runs.append(iv.pos_flat)
        docs = np.concatenate(doc_runs)
        poss = np.concatenate(pos_runs)
        order = np.lexsort((poss, docs))
        docs, poss = docs[order], poss[order]
        uniq, counts = np.unique(docs, return_counts=True)
        po = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(counts, out=po[1:])
        return InvResult(invs[0].field, uniq, counts.astype(np.int32), po, poss.astype(np.int32))

    def _eval_positional(self, node: Node, mode: str, n: int) -> InvResult:
        """#NEAR/n (QryopIlNear.java:54-148) and #WINDOW/n
        (QryopIlWindow.java:46-149): docid intersection, then the reference's
        exact position-cursor semantics per matching doc."""
        invs = self._child_invs(node)
        if not invs:
            return _empty_inv("body")
        if len(invs) == 1:
            return invs[0]
        # shortest-list-first intersection (argument ORDER still governs
        # the positional cursor semantics below — only the membership
        # probes are reordered, which set semantics allows)
        order = sorted(range(len(invs)), key=lambda j: len(invs[j].docids))
        common = invs[order[0]].docids
        for j in order[1:]:
            common = common[_member_mask(invs[j].docids, common)]
            if common.size == 0:
                return _empty_inv(invs[0].field)
        idx_per = [np.searchsorted(iv.docids, common) for iv in invs]
        out_docs, out_tfs, out_pos = [], [], []
        match_fn = _near_match if mode == "near" else _window_match
        for c in range(len(common)):
            plists = [invs[j].positions(int(idx_per[j][c])) for j in range(len(invs))]
            res = match_fn(plists, n)
            if res:
                res.sort()
                out_docs.append(int(common[c]))
                out_tfs.append(len(res))
                out_pos.extend(res)
        if not out_docs:
            return _empty_inv(invs[0].field)
        tfs = np.array(out_tfs, dtype=np.int32)
        po = np.zeros(len(tfs) + 1, dtype=np.int64)
        np.cumsum(tfs, out=po[1:])
        return InvResult(
            invs[0].field,
            np.array(out_docs, dtype=np.int64),
            tfs,
            po,
            np.array(out_pos, dtype=np.int32),
        )

    # ---------- score-list algebra (QryopSl) ----------

    def evaluate(self, node: Node) -> ScoreResult:
        if isinstance(node, ScoreNode):
            return self._eval_score(node)
        if isinstance(node, AndOp):
            return self._eval_and(node)
        if isinstance(node, AndNotOp):
            return self._eval_andnot(node)
        if isinstance(node, OrOp):
            return self._eval_or(node)
        if isinstance(node, SumOp):
            return self._eval_sum(node)
        if isinstance(node, (WandOp, WsumOp)):
            return self._eval_weighted(node)
        raise TypeError(f"not an Sl node (did you wrap_scores?): {node}")

    def _node_stats(self, node: ScoreNode, inv: InvResult) -> tuple[int, int]:
        """Global (df, ctf) for this scored list (see module docstring)."""
        if self.score_stats is not None and node.score_id in self.score_stats:
            return self.score_stats[node.score_id]
        return inv.df, inv.ctf

    def _eval_score(self, node: ScoreNode) -> ScoreResult:
        """#SCORE — the four model formulas (QryopSlScore.java:57-257)."""
        inv = self.eval_il_cached(node.child)
        df_g, ctf_g = self._node_stats(node, inv)
        v = self.view
        m = self.model
        if m == "BM25":
            N = v.n_docs
            idf = math.log((N - df_g + 0.5) / (df_g + 0.5))  # may be negative
            # IEEE division: a field with doccount 0 gives NaN avg_doclen
            # (as Java's double 0.0/0.0 does) instead of raising; the inv
            # list is empty for such fields so no scores materialize
            with np.errstate(divide="ignore", invalid="ignore"):
                avg_doclen = float(
                    np.float64(v.sum_doclen(inv.field)) / np.float64(v.doccount(inv.field))
                )
            doclen = v.doclen(inv.field, inv.docids).astype(np.float64)
            tf = inv.tfs.astype(np.float64)
            tf_w = tf / (tf + self.p.k1 * ((1 - self.p.b) + self.p.b * (doclen / avg_doclen)))
            return ScoreResult(inv.docids, idf * tf_w, None)
        if m == "Indri":
            mu, lam = self.p.mu, self.p.lambda_
            sd = v.sum_doclen(inv.field)
            p_mle = ctf_g / sd if sd > 0 else 0.0
            doclen = v.doclen(inv.field, inv.docids).astype(np.float64)
            tf = inv.tfs.astype(np.float64)
            scores = lam * (tf + mu * p_mle) / (doclen + mu) + (1 - lam) * p_mle
            field = inv.field

            def default_fn(docids: np.ndarray) -> np.ndarray:
                dl = v.doclen(field, docids).astype(np.float64)
                return lam * mu * p_mle / (dl + mu) + (1 - lam) * p_mle

            return ScoreResult(inv.docids, scores, default_fn)
        if m == "PL2":
            # Divergence-from-randomness PL2 (Amati & van Rijsbergen TOIS
            # 2002; Terrier's PL2 weighting model): Poisson randomness model
            # (P), Laplace after-effect (L), tf-normalization 2.
            #   tfn   = tf * log2(1 + c * avg_doclen / doclen)
            #   lam   = ctf / N                    (Poisson mean per doc)
            #   score = 1/(tfn+1) * ( tfn*log2(1/lam) + lam*log2(e)
            #                         + 0.5*log2(2*pi*tfn)
            #                         + tfn*(log2(tfn) - log2(e)) )
            # This branch is the §2.9 extension-surface demonstration: a new
            # model = one MODEL_NAMES entry + this branch (the reference's
            # RetrievalModel subclass + QryopSlScore.java:57-72 branch seam).
            N = v.n_docs
            lam = ctf_g / N
            if len(inv.docids) == 0:
                # absent term: lam = 0 and no postings — nothing to score
                # (the oracle's per-doc loop is simply empty here)
                return ScoreResult(inv.docids, np.empty(0, np.float64), None)
            with np.errstate(divide="ignore", invalid="ignore"):
                avg_doclen = float(
                    np.float64(v.sum_doclen(inv.field)) / np.float64(v.doccount(inv.field))
                )
            doclen = v.doclen(inv.field, inv.docids).astype(np.float64)
            tf = inv.tfs.astype(np.float64)
            tfn = tf * log2_64(1.0 + self.p.c * avg_doclen / doclen)
            scores = (1.0 / (tfn + 1.0)) * (
                tfn * log2_64_scalar(1.0 / lam)
                + lam * LOG2_E
                + 0.5 * log2_64(2.0 * math.pi * tfn)
                + tfn * (log2_64(tfn) - LOG2_E)
            )
            return ScoreResult(inv.docids, scores, None)
        if m == "UnrankedBoolean":
            return ScoreResult(inv.docids, np.ones(inv.df, dtype=np.float64), None)
        if m == "RankedBoolean":
            return ScoreResult(inv.docids, inv.tfs.astype(np.float64), None)
        raise ValueError(f"unknown model {m}")

    def _children(self, node: Node) -> list[ScoreResult]:
        return [self.evaluate(a) for a in node.args]

    def _eval_and(self, node: AndOp) -> ScoreResult:
        if self.model == "Indri":
            return self._indri_combine(node, weights=None, product=True)
        children = self._children(node)
        if not children:
            return ScoreResult(np.empty(0, np.int64), np.empty(0, np.float64))
        # boolean intersection (QryopSlAnd.java:145-284) with the
        # reference's shortest-list-first reorder (:156-165): the running
        # candidate set starts minimal and each probe is a searchsorted
        # SvS pass, O(|common|·log|list|) — the small-vs-large regime the
        # list-intersection cost models (VLDB'18) pick for skewed ratios.
        # Order of intersection can't change the result (set semantics);
        # scoring below iterates the ORIGINAL child order.
        by_len = sorted(children, key=lambda c: len(c.docids))
        common = by_len[0].docids
        for c in by_len[1:]:
            if len(common) == 0:
                break
            common = common[_member_mask(c.docids, common)]
        if self.model == "UnrankedBoolean":
            return ScoreResult(common, np.ones(len(common), dtype=np.float64))
        # RankedBoolean: min of scores
        mins = np.full(len(common), np.inf)
        for c in children:
            _, vals = _lookup(c.docids, c.scores, common)
            mins = np.minimum(mins, vals)
        return ScoreResult(common, mins)

    def _eval_andnot(self, node: "AndNotOp") -> ScoreResult:
        """#ANDNOT — boolean exclusion (registry extension; the reference
        ships no NOT — see ast.AndNotOp): docs of the FIRST child with
        every later child's docs removed; survivors keep the first child's
        score (RankedBoolean) or 1.0 (UnrankedBoolean). Indri has no
        exclusion semantics — loud error, not a silent guess."""
        if self.model == "Indri":
            raise ValueError("#ANDNOT is boolean-only (no Indri semantics)")
        children = self._children(node)
        if not children:
            return ScoreResult(np.empty(0, np.int64), np.empty(0, np.float64))
        pos = children[0]
        keep = np.ones(len(pos.docids), dtype=bool)
        for c in children[1:]:
            if len(c.docids) and keep.any():
                keep &= ~_member_mask(c.docids, pos.docids)
        docids = pos.docids[keep]
        if self.model == "UnrankedBoolean":
            return ScoreResult(docids, np.ones(len(docids), dtype=np.float64))
        return ScoreResult(docids, pos.scores[keep])

    def _eval_or(self, node: OrOp) -> ScoreResult:
        """#OR — boolean models only (QryopSlOr.java:39-183)."""
        children = self._children(node)
        if not children:
            return ScoreResult(np.empty(0, np.int64), np.empty(0, np.float64))
        union = np.unique(np.concatenate([c.docids for c in children]))
        if self.model == "UnrankedBoolean":
            return ScoreResult(union, np.ones(len(union), dtype=np.float64))
        best = np.full(len(union), -np.inf)
        for c in children:
            matched, vals = _lookup(c.docids, c.scores, union)
            best = np.where(matched & (vals > best), vals, best)
        return ScoreResult(union, best)

    def _eval_sum(self, node: SumOp) -> ScoreResult:
        """#SUM — BM25 only: union sweep, Σ user_w·sᵢ over matches
        (QryopSlSum.java:42-112); user_w = (k3+1)·qtf/(k3+qtf), qtf=1."""
        children = self._children(node)
        if not children:
            return ScoreResult(np.empty(0, np.int64), np.empty(0, np.float64))
        user_w = (self.p.k3 + 1) * 1.0 / (self.p.k3 + 1.0)
        union = np.unique(np.concatenate([c.docids for c in children]))
        total = np.zeros(len(union), dtype=np.float64)
        for c in children:
            matched, vals = _lookup(c.docids, c.scores, union)
            total += np.where(matched, user_w * vals, 0.0)
        return ScoreResult(union, total)

    def _eval_weighted(self, node: Node) -> ScoreResult:
        if len(node.args) != len(node.weights):
            raise ValueError("WAND/WSUM: weight count != arg count")
        return self._indri_combine(
            node, weights=node.weights, product=isinstance(node, WandOp)
        )

    def _indri_combine(
        self, node: Node, weights: list[float] | None, product: bool
    ) -> ScoreResult:
        """Indri union sweep shared by #AND (QryopSlAnd.java:69-134),
        #WAND (QryopSlWand.java:55-126) and #WSUM (QryopSlWsum.java:55-128):
        candidates = union of child lists; per child use matched score else
        getDefaultScore; s == 0.0 contributes nothing (`continue`)."""
        children = self._children(node)
        k = len(children)
        if k == 0:
            return ScoreResult(np.empty(0, np.int64), np.empty(0, np.float64))
        if weights is None:
            exps = [1.0 / k] * k
        else:
            wsum = sum(weights)
            exps = [w / wsum for w in weights]
        union = np.unique(np.concatenate([c.docids for c in children]))
        acc = (
            np.ones(len(union), dtype=np.float64)
            if product
            else np.zeros(len(union), dtype=np.float64)
        )
        for j, c in enumerate(children):
            matched, vals = _lookup(c.docids, c.scores, union)
            s = np.where(matched, vals, c.defaults(union))
            skip = s == 0.0
            if product:
                factor = np.where(skip, 1.0, pow64(np.where(skip, 1.0, s), exps[j]))
                acc *= factor
            else:
                acc += np.where(skip, 0.0, exps[j] * s)

        if self.model != "Indri":
            return ScoreResult(union, acc)

        kids = children
        expc = exps

        def default_fn(docids: np.ndarray) -> np.ndarray:
            # #AND/#WAND/#WSUM default (QryopSlAnd.java:297-319 etc.)
            d = (
                np.ones(len(docids), dtype=np.float64)
                if product
                else np.zeros(len(docids), dtype=np.float64)
            )
            for j, c in enumerate(kids):
                s = c.defaults(docids)
                skip = s == 0.0
                if product:
                    d *= np.where(skip, 1.0, pow64(np.where(skip, 1.0, s), expc[j]))
                else:
                    d += np.where(skip, 0.0, expc[j] * s)
            return d

        return ScoreResult(union, acc, default_fn)


# ---------- positional match kernels (exact reference cursor semantics) ----------


def _near_match(plists: list[np.ndarray], dist: int) -> list[int]:
    """#NEAR/n position scan (QryopIlNear.java:101-141): left-to-right,
    each arg's matched position within [lastPos, lastPos+dist]; on a match
    record the LAST arg's position and advance every cursor."""
    k = len(plists)
    idx = [0] * k
    out: list[int] = []
    len0 = len(plists[0])
    while idx[0] < len0:
        last = int(plists[0][idx[0]])
        ok = True
        for j in range(1, k):
            pj = plists[j]
            while True:
                if idx[j] >= len(pj):
                    return out  # no more matches in this doc
                this = int(pj[idx[j]])
                if this < last:
                    idx[j] += 1
                    continue
                if this - last <= dist:
                    last = this
                    break
                ok = False
                break
            if not ok:
                break
        if ok:
            out.append(int(plists[k - 1][idx[k - 1]]))
            for j in range(1, k):
                idx[j] += 1
        idx[0] += 1
    return out


def _window_match(plists: list[np.ndarray], width: int) -> list[int]:
    """#WINDOW/n scan (QryopIlWindow.java:96-143): repeatedly take min/max of
    current positions; if span > width advance the min cursor, else emit the
    max position and advance all cursors."""
    k = len(plists)
    idx = [0] * k
    out: list[int] = []
    min_pos, max_pos = None, None
    min_j = max_j = -1
    while True:
        min_pos = None
        for j in range(k):
            if idx[j] >= len(plists[j]):
                return out
            p = int(plists[j][idx[j]])
            if min_pos is None or p < min_pos:
                min_pos, min_j = p, j
            if max_pos is None or p > max_pos:
                max_pos, max_j = p, j
        if max_pos - min_pos + 1 > width:
            idx[min_j] += 1
        else:
            out.append(int(plists[max_j][idx[max_j]]))
            for j in range(k):
                idx[j] += 1
            max_pos = None
