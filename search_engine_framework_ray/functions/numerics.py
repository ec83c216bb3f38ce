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


def log2_64(x: np.ndarray) -> np.ndarray:
    """Elementwise float64 log2. Like ``pow``, log2 differs by ≤1 ulp
    between numpy's SIMD kernel and libm's ``math.log2`` (measured on this
    platform); the PL2 model routes BOTH the vectorized engine kernel and
    the scalar oracle through numpy so engine-vs-oracle stays bit-identical
    (vectorized and 1-element numpy calls verified equal)."""
    return np.log2(x)


def log2_64_scalar(x: float) -> float:
    return float(np.log2(np.array([x], dtype=np.float64))[0])


#: log2(e) as the shared double both PL2 implementations multiply by.
LOG2_E = log2_64_scalar(2.718281828459045235360287)
