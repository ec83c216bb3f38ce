"""Retrieval-model registry + parameters (reference model factory,
``QryEval.java:129-147``; ``RetrievalModel*.java``). New models plug in by
extending ``MODEL_NAMES`` and adding a branch in ``Evaluator._eval_score`` —
the same extension seam as the reference (SURVEY.md §2.9)."""

from __future__ import annotations

from dataclasses import dataclass

MODEL_NAMES = ("UnrankedBoolean", "RankedBoolean", "BM25", "Indri", "PL2")


@dataclass(frozen=True)
class ModelParams:
    model: str = "BM25"
    # BM25 (Sample.param:4-6 defaults)
    k1: float = 1.2
    b: float = 0.75
    k3: float = 0.0
    # Indri (Sample.param:8-9 defaults)
    mu: float = 2500.0
    lambda_: float = 0.4
    # PL2 divergence-from-randomness (Amati & van Rijsbergen TOIS 2002)
    # tf-normalization constant (Terrier's default c=1.0). PL2 is the
    # demonstration that a NEW retrieval model plugs in through the same
    # seam the reference exposes (RetrievalModel.java:11-28 subclass + the
    # QryopSlScore.java:57-72 branch): one MODEL_NAMES entry, one
    # Evaluator._eval_score branch, one _default_wrap line.
    c: float = 1.0

    @property
    def is_ranked(self) -> bool:
        """Unranked-boolean output ignores scores entirely
        (QryEval.java:389-412)."""
        return self.model != "UnrankedBoolean"


def params_from_dict(params: dict) -> ModelParams:
    """Build ModelParams from a reference-style key=value param map
    (``retrievalAlgorithm``, ``BM25:k_1`` …, QryEval.java:85-147)."""
    model = params.get("retrievalAlgorithm", "BM25")
    if model not in MODEL_NAMES:
        raise ValueError(f"unknown retrievalAlgorithm {model!r}")
    return ModelParams(
        model=model,
        k1=float(params.get("BM25:k_1", 1.2)),
        b=float(params.get("BM25:b", 0.75)),
        k3=float(params.get("BM25:k_3", 0.0)),
        mu=float(params.get("Indri:mu", 2500.0)),
        lambda_=float(params.get("Indri:lambda", 0.4)),
        c=float(params.get("PL2:c", 1.0)),
    )


def read_param_file(path: str) -> dict:
    """``key=value`` lines (QryEval.java:85-93)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip()
    return out
