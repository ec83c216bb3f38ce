"""Reciprocal-rank fusion (RRF) — the standard hybrid-search combiner
(Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion outperforms
Condorcet and individual Rank Learning Methods", SIGIR): fuse N ranked
lists by ``score(d) = Σ_lists 1 / (k0 + rank_list(d))``, which rewards
documents that rank well in ANY list without needing the lists' raw
scores to be comparable (BM25 log-odds vs cosine similarity).

This is the glue between the repo's two retrieval stacks — the inverted-
index BM25 path and the embedding ANN path — into one hybrid ranking.

Scale shape: inputs are already-reduced top-k lists (k·n_lists rows
total, driver-sized by construction); fusion itself is a tiny vectorized
merge. The heavy lifting stays in the upstream retrieval operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def comb_mnz(
    rankings: list[pd.DataFrame],
    *,
    score_col: str = "score_micros",
    id_col: str = "doc_id",
    k: int | None = None,
    mnz: bool = True,
) -> pd.DataFrame:
    """CombSUM / CombMNZ fusion (Fox & Shaw, TREC-2 1994) — the
    score-normalized combiner next to :func:`rrf_fuse`'s rank-based one:

        s'_L(d) = (s - min_L) / (max_L - min_L)   per list L (0 if constant)
        CombSUM(d) = Σ_L s'_L(d)        (absent-from-L contributes 0)
        CombMNZ(d) = |{L : d ∈ L}| · CombSUM(d)

    Each input frame must be one retrieval system's retained top-k and
    carry ``score_col`` as the MICROS-QUANTIZED integer score, so engine
    and SQL twin min-max-normalize identical integers (raw BM25 log-odds
    and cosine floats are not comparable — that incomparability is the
    reason this family normalizes per list). Fused key micros-rounded,
    ties by ascending id. Returns (rank, id_col, mnz_micros, n_lists)."""
    acc: dict[int, float] = {}
    cnt: dict[int, int] = {}
    for df in rankings:
        s = df[score_col].to_numpy(dtype=np.float64)
        if len(s) == 0:
            continue
        mn, mx = s.min(), s.max()
        norm = (s - mn) / (mx - mn) if mx > mn else np.zeros(len(s))
        for i, v in zip(df[id_col], norm):
            i = int(i)
            acc[i] = acc.get(i, 0.0) + float(v)
            cnt[i] = cnt.get(i, 0) + 1
    ids = list(acc.keys())
    sc = np.array([cnt[i] * acc[i] if mnz else acc[i] for i in ids], dtype=np.float64)
    out = pd.DataFrame(
        {
            id_col: ids,
            "mnz_micros": (np.sign(sc) * np.floor(np.abs(sc) * 1e6 + 0.5)).astype(
                np.int64
            ),
            "n_lists": np.array([cnt[i] for i in ids], dtype=np.int64),
        }
    )
    out = out.sort_values(
        ["mnz_micros", id_col], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    if k is not None:
        out = out.head(k)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", id_col, "mnz_micros", "n_lists"]]


def rrf_fuse(
    rankings: list[pd.DataFrame],
    *,
    k0: int = 60,
    id_col: str = "doc_id",
    k: int | None = None,
) -> pd.DataFrame:
    """Fuse ranked lists → (rank, id_col, rrf_micros).

    Each input frame must be in rank order (row 0 = rank 1) and carry
    ``id_col``. The fused key is the MICROS-ROUNDED (half-away) RRF score —
    a sum of ≤ n_lists IEEE doubles, reproducible by a SQL twin — with ties
    broken by ascending id.
    """
    acc: dict[int, float] = {}
    for df in rankings:
        ids = df[id_col].to_numpy()
        for r, i in enumerate(ids, 1):
            acc[int(i)] = acc.get(int(i), 0.0) + 1.0 / (k0 + r)
    out = pd.DataFrame(
        {id_col: list(acc.keys()), "_sc": list(acc.values())}
    )
    out["rrf_micros"] = (
        np.sign(out["_sc"]) * np.floor(np.abs(out["_sc"]) * 1e6 + 0.5)
    ).astype(np.int64)
    out = out.sort_values(
        ["rrf_micros", id_col], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    if k is not None:
        out = out.head(k)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", id_col, "rrf_micros"]]
