"""Position-based click model (PBM) fitted with EM over impression logs.

The implicit-feedback half of a training-data pipeline: search/click logs
are the cheapest relevance signal a web corpus carries, but clicks are
position-biased — rank 1 gets examined far more than rank 10 (Craswell,
Zoeter, Taylor & Ramsey WSDM 2008). The PBM factorizes
``P(click) = θ_rank · α_{query,doc}`` (examination × attractiveness;
Chuklin, Markov & de Rijke, "Click Models for Web Search", 2015, ch. 3)
and EM recovers both factors, yielding debiased per-(query, doc) relevance
labels usable as LeToR targets (the reference's qrels are editorial;
clicks are what a production engine actually has at scale). The reference
ships no click pipeline — this extends the training-data surface.

Numerics: EXACT integer micro-units end to end. With ``M = 10⁶``, the
E-step for a non-clicked impression is::

    denom = max(M - θ·α // M, 1)
    eE = (θ·(M - α) // M) · M // denom      # P(examined | no click)
    eA = (α·(M - θ) // M) · M // denom      # P(attractive | no click)

and the M-step is an integer mean (``Σ // n``). Every product stays below
2⁶³ and every division is written once, so the fit is bit-reproducible at
any partitioning AND by a DuckDB twin unrolling the iterations.

Scale shape: the impression log streams once per EM iteration through
``map_batches`` emitting BOUNDED partial sums — (rank → Σ, n) and
((query, doc) → Σ, n) per batch — so the driver reduce is
O(ranks + distinct (query, doc) pairs), independent of log size; the
parameter dicts broadcast back into the next pass's closure (tiny).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from ray.data import Dataset

M = 1_000_000


def md5_low64(s: str) -> int:
    """== DuckDB ``md5_number_lower`` (the repo-wide PRF convention)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


def synth_impressions(
    n_docs: int,
    *,
    sessions: int = 500,
    ranks: int = 10,
    n_queries: int = 3,
) -> "Dataset":
    """Deterministic synthetic click log (session, qid, rank, doc_id,
    click): session ``s`` issues query ``s % n_queries`` and sees one of
    two interleaved rankings (docs shift by one rank on odd sessions — the
    de-confounding PBM needs: the same doc observed at two positions);
    clicks are hash-threshold Bernoulli draws whose propensity decays with
    rank and varies by doc, exactly reproducible by a SQL twin via
    ``md5_number_lower``."""
    import ray.data

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        s = b["id"].to_numpy(np.int64)
        s_rep = np.repeat(s, ranks)
        r = np.tile(np.arange(ranks, dtype=np.int64), len(s))
        q = s_rep % n_queries
        d = (31 * q + 7 * ((r + s_rep % 2) % ranks) + 1) % n_docs
        thr = (900_000 // (r + 1)) * (1 + (d + q) % 5) // 5
        h = np.array(
            [md5_low64(f"ck|{si}|{ri}") % M for si, ri in zip(s_rep, r)],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {
                "session": s_rep,
                "qid": q,
                "rank": r,
                "doc_id": d,
                "click": (h < thr).astype(np.int64),
            }
        )

    return ray.data.range(sessions).map_batches(gen, batch_format="pandas")


def ips_ctr(
    imps: "Dataset",
    theta: dict[int, int],
    *,
    clip_weight: int = 10 * M,
) -> pd.DataFrame:
    """Counterfactual CTR estimation per (qid, doc_id): naive click rate,
    inverse-propensity-scored estimate (Joachims, Swaminathan & Schnabel
    WSDM 2017 — weight = 1/θ_rank debiases position bias so the estimate
    targets attractiveness, not displayed CTR), and the standard clipped
    variant (weight capped, here at 10×, trading bias for variance). All
    integer micros: weight = M² // θ; estimates are integer means. One
    streaming pass of bounded per-(qid, doc) partial sums — driver reduce
    is O(distinct (qid, doc)), independent of log size."""
    th = dict(theta)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        r = b["rank"].to_numpy(np.int64)
        c = b["click"].to_numpy(np.int64)
        w = np.array([M * M // max(th.get(int(x), M), 1) for x in r], dtype=np.int64)
        return (
            pd.DataFrame(
                {
                    "qid": b["qid"].to_numpy(np.int64),
                    "doc_id": b["doc_id"].to_numpy(np.int64),
                    "c": c,
                    "cw": c * w,
                    "cwc": c * np.minimum(w, clip_weight),
                }
            )
            .groupby(["qid", "doc_id"], as_index=False)
            .agg(
                sc=("c", "sum"), scw=("cw", "sum"), scwc=("cwc", "sum"),
                cnt=("c", "size"),
            )
        )

    part = imps.map_batches(partials, batch_format="pandas").to_pandas()
    agg = part.groupby(["qid", "doc_id"], as_index=False)[
        ["sc", "scw", "scwc", "cnt"]
    ].sum()
    out = pd.DataFrame(
        {
            "qid": agg["qid"].astype("int64"),
            "doc_id": agg["doc_id"].astype("int64"),
            "naive_micros": (agg["sc"] * M // agg["cnt"]).astype("int64"),
            "ips_micros": (agg["scw"] // agg["cnt"]).astype("int64"),
            "ips_clip_micros": (agg["scwc"] // agg["cnt"]).astype("int64"),
        }
    )
    return out.sort_values(["qid", "doc_id"]).reset_index(drop=True)


def pbm_fit(
    imps: "Dataset",
    *,
    iters: int = 2,
    theta0: int = 500_000,
    alpha0: int = 500_000,
) -> tuple[dict[int, int], dict[tuple[int, int], int]]:
    """EM-fit the PBM over an impression Dataset with columns
    ``(qid, rank, doc_id, click)`` → ``(θ: {rank: micros},
    α: {(qid, doc_id): micros})``. Integer-exact; see module docstring."""
    imps = imps.materialize()
    theta: dict[int, int] = {}
    alpha: dict[tuple[int, int], int] = {}

    for _ in range(iters):
        th, al = dict(theta), dict(alpha)

        def partials(b: pd.DataFrame) -> pd.DataFrame:
            r = b["rank"].to_numpy(np.int64)
            q = b["qid"].to_numpy(np.int64)
            d = b["doc_id"].to_numpy(np.int64)
            c = b["click"].to_numpy(np.int64)
            t = np.array([th.get(int(x), theta0) for x in r], dtype=np.int64)
            a = np.array(
                [al.get((int(x), int(y)), alpha0) for x, y in zip(q, d)],
                dtype=np.int64,
            )
            denom = np.maximum(M - t * a // M, 1)
            e_exam = np.where(c == 1, M, (t * (M - a) // M) * M // denom)
            e_attr = np.where(c == 1, M, (a * (M - t) // M) * M // denom)
            pt = (
                pd.DataFrame({"k1": r, "k2": np.int64(-1), "v": e_exam})
                .groupby(["k1", "k2"], as_index=False)
                .agg(ssum=("v", "sum"), cnt=("v", "size"))
                .assign(kind="t")
            )
            pa_ = (
                pd.DataFrame({"k1": q, "k2": d, "v": e_attr})
                .groupby(["k1", "k2"], as_index=False)
                .agg(ssum=("v", "sum"), cnt=("v", "size"))
                .assign(kind="a")
            )
            return pd.concat([pt, pa_], ignore_index=True)

        # bounded driver pull: (ranks + distinct (q, d)) rows per batch
        part = imps.map_batches(partials, batch_format="pandas").to_pandas()
        agg = part.groupby(["kind", "k1", "k2"], as_index=False)[["ssum", "cnt"]].sum()
        theta = {
            int(r.k1): int(r.ssum) // int(r.cnt)
            for r in agg[agg["kind"] == "t"].itertuples()
        }
        alpha = {
            (int(r.k1), int(r.k2)): int(r.ssum) // int(r.cnt)
            for r in agg[agg["kind"] == "a"].itertuples()
        }
    return theta, alpha
