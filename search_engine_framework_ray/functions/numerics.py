"""Shared numeric primitives pinned for bit-reproducibility.

``pow`` is the one operation where float64 results differ between libm,
numpy's SIMD kernels and Java's ``Math.pow`` (≤1 ulp). The engine's Indri
geometric means (``docScore *= Math.pow(s, w)``, QryopSlWand.java:118) use
this single primitive from BOTH the vectorized kernels and the scalar oracle,
so engine-vs-oracle comparisons are bit-identical; vs the original Java the
divergence is bounded by 1 ulp of pow (rank flips only on exact ties of
composed products, which the tie-break on url then resolves identically in
almost all cases). BM25 uses no pow and is exactly reproducible.
"""

from __future__ import annotations

import numpy as np


def pow64(base: np.ndarray, exp: float) -> np.ndarray:
    """Elementwise float64 power (numpy kernel — verified bit-identical
    between scalar and vectorized calls on this platform)."""
    return np.power(base, exp)


def pow64_scalar(base: float, exp: float) -> float:
    return float(np.power(np.array([base], dtype=np.float64), exp)[0])
