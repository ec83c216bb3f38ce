"""Benchmark decontamination: flag corpus documents that share any k-word
shingle with a held-out evaluation set (the standard train/test-overlap
check for LLM training corpora — n-gram collision against the benchmark,
as popularized by the GPT-3 appendix and the C4/Pile cleanups).

Scale shape
-----------
The eval side is benchmark-sized (thousands of documents, MBs) while the
corpus side is the 100-TB stream, so this is the canonical broadcast
pattern: hash every eval shingle ONCE into a sorted uint64 array,
``ray.put`` it, and probe per corpus batch with ``np.isin`` (a vectorized
sorted-array membership test) inside ``map_batches`` — zero shuffles, one
streaming pass over the corpus. The broadcast array is 8 bytes per
distinct eval shingle (~10 MB per ~1M shingles); if an "eval set" ever
approaches corpus size, this operator is the wrong tool and a shuffle
join on shingle hash (the `bigram-model join` shape in stages/lm.py)
replaces it.

Shingles reuse :func:`..stages.dedup._shingles_strict` — the RE2-aligned
tokenizer plus rolling polynomial hash — so a DuckDB trigram oracle
reproduces the decision exactly (hash collisions between distinct word
k-grams are the only divergence risk, at ~2^-64 per pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _shingles_strict


def eval_shingle_set(texts, k: int = 8) -> np.ndarray:
    """Sorted unique uint64 shingle hashes over the eval texts. Driver-side
    by design: the eval set is small (see module docstring)."""
    parts = [_shingles_strict(t or "", k) for t in texts]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class DecontamStage:
    """``map_batches`` actor: mark each doc with the number of distinct
    eval shingles it contains (``contam_ngrams``) and the boolean flag
    (``contaminated``). The eval set arrives as an object-store ref so the
    sorted array is shipped once per node, not once per batch."""

    def __init__(self, eval_ref, k: int = 8, text_col: str = "text"):
        import ray

        self.eval_sorted = (
            ray.get(eval_ref) if not isinstance(eval_ref, np.ndarray) else eval_ref
        )
        self.k = k
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        hits = np.zeros(len(batch), dtype=np.int64)
        ev = self.eval_sorted
        if ev.size:
            for i, t in enumerate(batch[self.text_col].fillna("")):
                sh = _shingles_strict(t, self.k)
                if sh.size:
                    # sh is unique already → isin count == distinct shared
                    hits[i] = int(np.isin(sh, ev, assume_unique=True).sum())
        out["contam_ngrams"] = hits
        out["contaminated"] = hits > 0
        return out


def decontaminate(ds, eval_texts, k: int = 8, text_col: str = "text"):
    """Annotate ``ds`` (a documents-like Dataset) against ``eval_texts``
    (an iterable of benchmark strings). Returns the Dataset with
    ``contam_ngrams`` / ``contaminated`` columns added; callers typically
    ``.filter(expr="not contaminated")`` next."""
    import ray

    ev = eval_shingle_set(eval_texts, k)
    ev_ref = ray.put(ev)
    return ds.map_batches(
        DecontamStage,
        fn_constructor_kwargs={"eval_ref": ev_ref, "k": k, "text_col": text_col},
        batch_format="pandas",
        concurrency=(1, 8),
    )
