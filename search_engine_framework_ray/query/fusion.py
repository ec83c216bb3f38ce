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
