"""Post-retrieval query performance prediction: the clarity score
(Cronen-Townsend, Zhou & Croft, SIGIR 2002) — KL divergence between the
language model of the retrieved set and the collection language model.
High clarity = the top documents speak a focused vocabulary (an easy,
well-specified query); low clarity = the result set looks like background
noise (the query is ambiguous or hard). Complements the PRE-retrieval
predictors (idf/SCQ, ``q_qpp``) which never open a posting list: clarity
spends one ordinary retrieval + k term-vector fetches per query, the
standard triage cost for deciding whether to run expansion or a deeper
cascade stage.

Model (pinned spec; the uniform-weights variant over the pseudo-relevant
set):

    P_c(w)   = ctf(w) / C                      (collection MLE; C = total tokens)
    P(w|d)   = (tf(w,d) + mu * P_c(w)) / (dl_d + mu)   (Dirichlet smoothing)
    P(w|q)   = (1/k) * sum_{d in top-k} P(w|d)
    clarity  = sum_{w in V(top-k)} P(w|q) * log2(P(w|q) / P_c(w))

with V(top-k) the union vocabulary of the k retrieved documents (terms
outside it carry negligible mass; restricting to V is the standard
implementation). Per-term contributions are micros-quantized then summed in
EXACT integer arithmetic, so the result is independent of summation order
across a ~|V|-term float reduction (the dsir_weights lesson).

Distribution shape: one ordinary distributed retrieval per query batch, one
term-vector task per shard holding a retrieved doc (filtered ``fwd.parquet``
reads, the Rocchio/expansion path), ctf from the bucketed termstats store.
Driver work is O(k * |V|) on the bounded retrieved set — clarity cost is
independent of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .executor import load_term_stats, read_stats
from .expansion import _fetch_term_vectors, _shard_of


def _round_away_micros(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.float64) * 1_000_000
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def clarity_scores(
    index_dir: str,
    top_docs: dict[str, list[int]],
    *,
    mu: float = 2500.0,
    field: str = "body",
) -> pd.DataFrame:
    """Clarity per query for already-retrieved ``top_docs`` (qid → docids,
    the micros-ranked top-k). Returns (qid, n_vocab, clarity_micros)."""
    stats = read_stats(index_dir)
    c_total = float(stats["fields"][field]["sum_doclen"])

    ranges = _shard_of(index_dir)
    by_shard: dict[int, set[int]] = {}
    for docs in top_docs.values():
        for d in docs:
            for s, lo, hi in ranges:
                if lo <= d < hi:
                    by_shard.setdefault(s, set()).add(int(d))
                    break
    tv = (
        pd.concat(
            ray.get(
                [
                    _fetch_term_vectors.remote(index_dir, s, sorted(ds), field)
                    for s, ds in sorted(by_shard.items())
                ]
            ),
            ignore_index=True,
        )
        if by_shard
        else pd.DataFrame(
            {"docid": [], "stem": pd.Series(dtype="object"), "tf": [], "doclen": []}
        )
    )

    stems = sorted(set(tv["stem"]))
    ts = load_term_stats(index_dir, {(field, t) for t in stems})
    ctf_map = {t: c for (f, t), (_, c) in ts.items() if f == field}

    rows = []
    for qid in sorted(top_docs):
        docs = [int(d) for d in top_docs[qid]]
        k = len(docs)
        sub = tv[tv["docid"].isin(docs)]
        if not k or not len(sub):
            rows.append({"qid": qid, "n_vocab": 0, "clarity_micros": 0})
            continue
        vocab = sorted(set(sub["stem"]))
        widx = {w: i for i, w in enumerate(vocab)}
        didx = {d: i for i, d in enumerate(docs)}
        tfm = np.zeros((k, len(vocab)), dtype=np.float64)
        tfm[
            sub["docid"].map(didx).to_numpy(),
            sub["stem"].map(widx).to_numpy(),
        ] = sub["tf"].to_numpy(dtype=np.float64)
        dl = np.zeros(k, dtype=np.float64)
        per_doc_dl = sub.drop_duplicates("docid").set_index("docid")["doclen"]
        for d, i in didx.items():
            dl[i] = float(per_doc_dl.get(d, 0))
        pc = np.array([ctf_map[w] for w in vocab], dtype=np.float64) / c_total
        pwd = (tfm + mu * pc[None, :]) / (dl[:, None] + mu)
        pq = pwd.sum(axis=0) / float(k)
        contrib = pq * np.log2(pq / pc)
        rows.append(
            {
                "qid": qid,
                "n_vocab": len(vocab),
                "clarity_micros": int(_round_away_micros(contrib).sum()),
            }
        )
    out = pd.DataFrame(rows)
    out["n_vocab"] = out["n_vocab"].astype("int64")
    out["clarity_micros"] = out["clarity_micros"].astype("int64")
    return out.sort_values("qid").reset_index(drop=True)
