"""MMR result diversification (Carbonell & Goldstein 1998) over a ranked
candidate set — greedy rerank trading relevance against redundancy.

The reference engine returns raw ranked lists; production search adds a
diversification pass so near-duplicate results don't crowd the page. The
λ=0.5 maximal-marginal-relevance step in exact integer micros:

    pick argmax over remaining candidates of
        snorm(d) − max_sim(d, selected)

where ``snorm`` = relevance min-max-normalized to [0, 1e6] micros
(``(s − min)·1e6 // (max − min)`` — plain ``s/max`` INVERTS relevance
when BM25 idf goes negative on high-df terms; constant scores → 1e6,
the LeToR normalizer's convention) and ``sim`` = token-set
Jaccard in micros (``|∩|·1e6 // |∪|``); ties break docid-ascending. All
integers, so a SQL twin (unrolled greedy steps, the PageRank-oracle
precedent) reproduces every pick bit-for-bit.

Scale shape: candidates are a top-k (bounded) set — the greedy loop is
O(k²) driver work on k rows; the only cluster work is the term-vector
fetch (one task per shard holding candidates)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def mmr_rerank(
    candidates: list[tuple[int, int]],
    token_sets: dict[int, frozenset],
    k: int = 10,
) -> pd.DataFrame:
    """``candidates``: [(docid, score_micros)]; ``token_sets``: docid →
    distinct-token set → (rank, doc_id, snorm_micros, maxsim_micros)."""
    if not candidates:
        return pd.DataFrame(
            {
                "rank": pd.Series(dtype="int64"),
                "doc_id": pd.Series(dtype="int64"),
                "snorm_micros": pd.Series(dtype="int64"),
                "maxsim_micros": pd.Series(dtype="int64"),
            }
        )
    lo = min(s for _, s in candidates)
    hi = max(s for _, s in candidates)
    span = hi - lo
    snorm = {
        d: ((s - lo) * 1_000_000 // span) if span else 1_000_000
        for d, s in candidates
    }

    def sim(a: int, b: int) -> int:
        sa, sb = token_sets.get(a, frozenset()), token_sets.get(b, frozenset())
        uni = len(sa | sb)
        return (len(sa & sb) * 1_000_000 // uni) if uni else 0

    remaining = sorted(snorm)
    selected: list[tuple[int, int, int]] = []  # (doc, snorm, maxsim-at-pick)
    while remaining and len(selected) < k:
        best = None
        for d in remaining:  # docid-ascending → ties keep the lowest docid
            ms = max((sim(d, p) for p, _, _ in selected), default=0)
            key = snorm[d] - ms
            if best is None or key > best[0]:
                best = (key, d, ms)
        _, pick, ms = best
        selected.append((pick, snorm[pick], ms))
        remaining.remove(pick)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(1, len(selected) + 1), dtype="int64"),
            "doc_id": pd.Series([d for d, _, _ in selected], dtype="int64"),
            "snorm_micros": pd.Series([s for _, s, _ in selected], dtype="int64"),
            "maxsim_micros": pd.Series([m for _, _, m in selected], dtype="int64"),
        }
    )


def collapse_top_k(
    ranked: pd.DataFrame, key_col: str, *, max_per_key: int, k: int
) -> pd.DataFrame:
    """Host-crowding collapse (classic web-search "site collapse"): walk the
    already-final ranking and keep at most ``max_per_key`` rows per
    ``key_col`` value, then cut to ``k`` and assign dense 1-based ranks.

    ``ranked`` must arrive in final rank order (the caller's tie-broken
    sort); rows beyond a key's quota are skipped, NOT re-scored — exactly
    the row_number-per-partition filter a SQL twin writes. Driver-cheap by
    construction: input is a bounded top-k list."""
    kept = ranked[ranked.groupby(key_col, sort=False).cumcount() < max_per_key]
    kept = kept.head(k).copy()
    kept.insert(0, "rank", np.arange(1, len(kept) + 1, dtype=np.int64))
    return kept.reset_index(drop=True)
