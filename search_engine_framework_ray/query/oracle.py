"""Single-process oracle evaluator (SURVEY.md §5.2): an independent,
row-at-a-time pure-Python implementation of the reference's query semantics,
used to verify that the distributed engine (codec + shards + vectorized
kernels + merge) is **rank- and score-identical**. Deliberately shares no
evaluation code with :mod:`.kernels` — only the AST, the analyzer and the
model parameters.

Mirrors the Java evaluation loops directly: #SCORE (QryopSlScore.java:57-257),
Indri union sweep with defaults (QryopSlAnd.java:69-134, Wand/Wsum), boolean
intersection/union (QryopSlAnd.java:145-284, QryopSlOr.java:59-183), #SUM
(QryopSlSum.java:42-112), #SYN/#NEAR/#WINDOW cursor loops
(QryopIlSyn/Near/Window.java).
"""

from __future__ import annotations

import math

from ..functions.analysis import AnalyzerConfig, DEFAULT_ANALYZER, analyze_positions
from ..functions.extract import extract_fields
from .ast import (
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
from ..functions.numerics import LOG2_E, log2_64_scalar, pow64_scalar
from .models import ModelParams


class OracleIndex:
    """In-memory whole-corpus index: dict postings, doclens, stats."""

    def __init__(self, rows: list[dict], analyzer: AnalyzerConfig = DEFAULT_ANALYZER):
        rows = sorted(rows, key=lambda r: r["url"])
        inlink: dict[str, list[tuple[str, str]]] = {}
        extracted = []
        for r in rows:
            f = extract_fields(r["html"])
            extracted.append(f)
            for href, atext in f["links"]:
                if atext:
                    inlink.setdefault(href, []).append((r["url"], atext))
        self.urls = [r["url"] for r in rows]
        self.n_docs = len(rows)
        # postings[(field, term)] = list of (docid, [positions]); docid-ascending
        self.postings: dict[tuple[str, str], list[tuple[int, list[int]]]] = {}
        self.doclens: dict[tuple[str, int], int] = {}
        self._sum_doclen: dict[str, int] = {}
        self._doccount: dict[str, int] = {}
        for docid, (r, f) in enumerate(zip(rows, extracted)):
            anchors = [a for _, a in sorted(inlink.get(r["url"], []))]
            fields = {
                "body": f["body"],
                "title": f["title"],
                "keywords": f["keywords"],
                "url": r["url"],
                "inlink": " ".join(anchors),
            }
            for field, text in fields.items():
                terms, positions = analyze_positions(text, analyzer)
                self.doclens[(field, docid)] = len(terms)
                self._sum_doclen[field] = self._sum_doclen.get(field, 0) + len(terms)
                if terms:
                    self._doccount[field] = self._doccount.get(field, 0) + 1
                per: dict[str, list[int]] = {}
                for t, p in zip(terms, positions):
                    per.setdefault(t, []).append(p)
                for t, pl in per.items():
                    self.postings.setdefault((field, t), []).append((docid, pl))

    def inv(self, field: str, term: str) -> list[tuple[int, list[int]]]:
        return self.postings.get((field, term), [])

    def doclen(self, field: str, docid: int) -> int:
        return self.doclens.get((field, docid), 0)

    def sum_doclen(self, field: str) -> int:
        return self._sum_doclen.get(field, 0)

    def doccount(self, field: str) -> int:
        return self._doccount.get(field, 0)


class _Sl:
    """Score list + default-score closure."""

    def __init__(self, entries, default):
        self.entries = entries  # list[(docid, score)] docid-ascending
        self.bydoc = dict(entries)
        self.default = default  # callable docid -> float


def _eval_il(node: Node, ix: OracleIndex):
    """→ (field, list[(docid, positions)])"""
    if isinstance(node, Term):
        return node.fieldname, ix.inv(node.fieldname, node.term)
    children = [_eval_il(a, ix) for a in node.args]
    if not children:
        return "body", []
    fields = {f for f, _ in children}
    if len(fields) > 1:
        raise ValueError("same-field requirement violated")
    field = children[0][0]
    lists = [c for _, c in children]
    if isinstance(node, Syn):
        merged: dict[int, list[int]] = {}
        for lst in lists:
            for docid, pos in lst:
                merged.setdefault(docid, []).extend(pos)
        return field, [(d, sorted(ps)) for d, ps in sorted(merged.items())]
    # NEAR / WINDOW: docid intersection then position scan
    if len(lists) == 1:
        return field, lists[0]
    maps = [dict(lst) for lst in lists]
    common = [d for d, _ in lists[0] if all(d in m for m in maps[1:])]
    out = []
    for d in common:
        plists = [m[d] for m in maps]
        if isinstance(node, Near):
            got = _near_scan(plists, node.dist)
        else:
            got = _window_scan(plists, node.width)
        if got:
            out.append((d, sorted(got)))
    return field, out


def _near_scan(plists, dist):
    k = len(plists)
    idx = [0] * k
    out = []
    i0 = 0
    while i0 < len(plists[0]):
        last = plists[0][i0]
        matched = True
        for j in range(1, k):
            pj = plists[j]
            while True:
                if idx[j] >= len(pj):
                    return out
                if pj[idx[j]] < last:
                    idx[j] += 1
                elif pj[idx[j]] - last <= dist:
                    last = pj[idx[j]]
                    break
                else:
                    matched = False
                    break
            if not matched:
                break
        if matched:
            out.append(plists[k - 1][idx[k - 1]])
            for j in range(1, k):
                idx[j] += 1
        i0 += 1
    return out


def _window_scan(plists, width):
    k = len(plists)
    idx = [0] * k
    out = []
    max_pos = None
    max_j = -1
    while True:
        min_pos = None
        min_j = -1
        for j in range(k):
            if idx[j] >= len(plists[j]):
                return out
            p = plists[j][idx[j]]
            if min_pos is None or p < min_pos:
                min_pos, min_j = p, j
            if max_pos is None or p > max_pos:
                max_pos, max_j = p, j
        if max_pos - min_pos + 1 > width:
            idx[min_j] += 1
        else:
            out.append(plists[max_j][idx[max_j]])
            for j in range(k):
                idx[j] += 1
            max_pos = None


def _eval_sl(node: Node, ix: OracleIndex, p: ModelParams) -> _Sl:
    m = p.model
    if isinstance(node, ScoreNode):
        field, inv = _eval_il(node.child, ix)
        df = len(inv)
        ctf = sum(len(pos) for _, pos in inv)
        if m == "BM25":
            idf = math.log((ix.n_docs - df + 0.5) / (df + 0.5))
            # mirror the engine/Java 0.0/0.0 → NaN on an empty field (the
            # inverted list is empty too, so no scores materialize)
            dc = ix.doccount(field)
            avg = ix.sum_doclen(field) / dc if dc else float("nan")
            entries = []
            for d, pos in inv:
                tf = len(pos)
                dl = ix.doclen(field, d)
                entries.append((d, idf * (tf / (tf + p.k1 * ((1 - p.b) + p.b * (dl / avg))))))
            return _Sl(entries, lambda d: 0.0)
        if m == "Indri":
            sd = ix.sum_doclen(field)
            p_mle = ctf / sd if sd > 0 else 0.0
            entries = []
            for d, pos in inv:
                tf = len(pos)
                dl = ix.doclen(field, d)
                entries.append(
                    (d, p.lambda_ * (tf + p.mu * p_mle) / (dl + p.mu) + (1 - p.lambda_) * p_mle)
                )

            def default(d, field=field, p_mle=p_mle):
                dl = ix.doclen(field, d)
                return p.lambda_ * p.mu * p_mle / (dl + p.mu) + (1 - p.lambda_) * p_mle

            return _Sl(entries, default)
        if m == "PL2":
            # PL2 DFR (Amati & van Rijsbergen TOIS 2002) — the §2.9
            # extension-surface model; log2 via the shared numpy primitive
            # so scalar-oracle == vectorized-engine bit-for-bit.
            dc = ix.doccount(field)
            avg = ix.sum_doclen(field) / dc if dc else float("nan")
            lam = ctf / ix.n_docs
            entries = []
            for d, pos in inv:
                tf = len(pos)
                dl = ix.doclen(field, d)
                tfn = tf * log2_64_scalar(1.0 + p.c * avg / dl)
                entries.append(
                    (
                        d,
                        (1.0 / (tfn + 1.0))
                        * (
                            tfn * log2_64_scalar(1.0 / lam)
                            + lam * LOG2_E
                            + 0.5 * log2_64_scalar(2.0 * math.pi * tfn)
                            + tfn * (log2_64_scalar(tfn) - LOG2_E)
                        ),
                    )
                )
            return _Sl(entries, lambda d: 0.0)
        if m == "UnrankedBoolean":
            return _Sl([(d, 1.0) for d, _ in inv], lambda d: 0.0)
        if m == "RankedBoolean":
            return _Sl([(d, float(len(pos))) for d, pos in inv], lambda d: 0.0)
        raise ValueError(m)

    children = [_eval_sl(a, ix, p) for a in node.args]
    if not children:
        return _Sl([], lambda d: 0.0)

    if isinstance(node, AndOp) and m != "Indri":
        common = [d for d, _ in children[0].entries if all(d in c.bydoc for c in children[1:])]
        if m == "UnrankedBoolean":
            return _Sl([(d, 1.0) for d in common], lambda d: 0.0)
        return _Sl([(d, min(c.bydoc[d] for c in children)) for d in common], lambda d: 0.0)

    if isinstance(node, OrOp):
        union = sorted({d for c in children for d, _ in c.entries})
        if m == "UnrankedBoolean":
            return _Sl([(d, 1.0) for d in union], lambda d: 0.0)
        return _Sl(
            [(d, max(c.bydoc[d] for c in children if d in c.bydoc)) for d in union],
            lambda d: 0.0,
        )

    if isinstance(node, SumOp):
        user_w = (p.k3 + 1) * 1.0 / (p.k3 + 1.0)
        union = sorted({d for c in children for d, _ in c.entries})
        return _Sl(
            [(d, sum(user_w * c.bydoc[d] for c in children if d in c.bydoc)) for d in union],
            lambda d: 0.0,
        )

    # Indri #AND / #WAND / #WSUM
    if isinstance(node, AndOp):
        exps = [1.0 / len(children)] * len(children)
        product = True
    else:
        wsum = sum(node.weights)
        exps = [w / wsum for w in node.weights]
        product = isinstance(node, WandOp)
    union = sorted({d for c in children for d, _ in c.entries})
    entries = []
    for d in union:
        acc = 1.0 if product else 0.0
        for j, c in enumerate(children):
            s = c.bydoc.get(d)
            if s is None:
                s = c.default(d)
            if s == 0.0:
                continue
            if product:
                acc *= pow64_scalar(s, exps[j])
            else:
                acc += exps[j] * s

        entries.append((d, acc))

    def default(d, children=children, exps=exps, product=product):
        acc = 1.0 if product else 0.0
        for j, c in enumerate(children):
            s = c.default(d)
            if s == 0.0:
                continue
            if product:
                acc *= pow64_scalar(s, exps[j])
            else:
                acc += exps[j] * s
        return acc

    return _Sl(entries, default)


def oracle_run_query(
    qtree: Node, ix: OracleIndex, params: ModelParams, k: int = 100
) -> list[tuple[str, float]]:
    """Evaluate + reference result sort (QryEval.java:323-412): ranked →
    (score desc, url asc); unranked → url asc, score reported as 1.0.

    A weight/arg-count mismatch (e.g. a stopword-only sub-op dropped inside
    #WAND, leaving its weight dangling) returns [] — matching the engine's
    plan-time rejection; the reference fatalErrors the process on this input
    (QryopSlWand.java:57-58)."""
    from .ast import WEIGHTED_TYPES

    def _weights_valid(node) -> bool:
        if isinstance(node, WEIGHTED_TYPES):
            if len(node.args) != len(node.weights):
                return False
            if sum(node.weights) == 0:  # aligned with the engine's rejection
                return False
        return all(_weights_valid(a) for a in getattr(node, "args", []))

    if not _weights_valid(qtree):
        return []
    sl = _eval_sl(qtree, ix, params)
    rows = [(ix.urls[d], s) for d, s in sl.entries]
    if params.is_ranked:
        rows.sort(key=lambda r: (-r[1], r[0]))
    else:
        rows.sort(key=lambda r: r[0])
        rows = [(u, 1.0) for u, _ in rows]
    return rows[:k]
