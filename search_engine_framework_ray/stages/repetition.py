"""Repetition-based quality signals for LLM training data — the
Gopher/MassiveText-style filters: documents dominated by a repeated
n-gram, and documents whose content is largely duplicated elsewhere in
the corpus (boilerplate, mirrors, templated spam).

Two operators:

* :func:`repetition_stats` — WITHIN-doc signals, one streaming
  ``map_batches`` pass, zero shuffles:
  - ``top_2gram_frac``: fraction of the doc's bigram positions occupied
    by its single most frequent bigram (ties resolve to the same max);
  - ``dup_5gram_frac``: fraction of the doc's 5-gram positions whose
    5-gram occurs more than once in the SAME doc.

* :func:`cross_dup_fraction` — CORPUS-wide signal: per doc, the fraction
  of its L-gram positions whose L-gram also appears in at least one
  OTHER document. Same fused shape as stages/lm.py: per-batch partial
  counts, ONE ``hash(gram) % num_buckets`` shuffle (a bucket owns every
  row for its grams, so "how many distinct docs carry this gram" is
  answered locally), per-doc partials pre-aggregated in the bucket, then
  a narrow ``groupby(doc_id)`` sum.

Gram identity is the rolling polynomial over RE2-aligned word hashes
(stages/dedup._shingles), so a DuckDB oracle over exact word n-grams
reproduces every count (hash-collision risk ~2^-64 per gram pair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _POLY
from .textstats import RE2_TOKEN_RE


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """All k-gram position hashes (NOT deduped — one entry per position;
    same rolling polynomial as dedup shingles). Empty when < k words."""
    words = RE2_TOKEN_RE.findall(text)
    if len(words) < k:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(words, dtype=object))
    m = len(words) - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _POLY + h[j : j + m]
    return acc


def repetition_stats(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Within-doc repetition signals (see module docstring). Docs with no
    bigram (5-gram) positions report 0 for the respective fraction."""
    out = batch.copy()
    top2 = np.zeros(len(batch))
    dup5 = np.zeros(len(batch))
    for i, t in enumerate(batch[text_col].fillna("")):
        g2 = _gram_hashes(t, 2)
        if g2.size:
            _, counts = np.unique(g2, return_counts=True)
            top2[i] = counts.max() / g2.size
        g5 = _gram_hashes(t, 5)
        if g5.size:
            _, counts = np.unique(g5, return_counts=True)
            dup5[i] = counts[counts > 1].sum() / g5.size
    out["top_2gram_frac"] = top2
    out["dup_5gram_frac"] = dup5
    return out


def cross_dup_fraction(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Per-doc fraction of k-gram positions whose gram appears in ≥ 2
    distinct documents. Returns a Dataset ``(doc_id, n_grams, dup_frac)``
    covering every doc with at least one k-gram position."""

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        ids, grams, ns = [], [], []
        for did, t in zip(b[id_col], b[text_col].fillna("")):
            g = _gram_hashes(t, k)
            if not g.size:
                continue
            u, c = np.unique(g, return_counts=True)
            ids.append(np.full(u.size, did, dtype=np.int64))
            grams.append(u)
            ns.append(c.astype(np.int64))
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "g": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        g = np.concatenate(grams)
        out = pd.DataFrame(
            {
                "doc_id": np.concatenate(ids),
                # signed view for Arrow transport; hash distribution unchanged
                "g": g.view(np.int64),
                "n": np.concatenate(ns),
            }
        )
        out["jb"] = (
            (g % np.uint64(num_buckets)).astype(np.int64)
        )
        return out

    def bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        # a gram is "duplicated" when ≥2 distinct docs carry it — count
        # distinct docs per gram (rows are already per (doc, gram))
        ndocs = gdf.groupby("g", sort=False)["doc_id"].transform("size")
        dup = (ndocs > 1).to_numpy()
        part = pd.DataFrame(
            {
                "doc_id": gdf["doc_id"].to_numpy(np.int64),
                "n": gdf["n"].to_numpy(np.int64),
                "dup_n": np.where(dup, gdf["n"].to_numpy(np.int64), 0),
            }
        )
        out = part.groupby("doc_id", sort=False)[["n", "dup_n"]].sum().reset_index()
        return out.astype({"doc_id": "int64", "n": "int64", "dup_n": "int64"})

    per_doc = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("jb")
        .map_groups(bucket, batch_format="pandas")
        .groupby("doc_id")
        .sum(["n", "dup_n"])
    )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_grams": b["sum(n)"].astype("int64"),
                "dup_frac": b["sum(dup_n)"].to_numpy(np.float64)
                / b["sum(n)"].to_numpy(np.float64),
            }
        )

    return per_doc.map_batches(final, batch_format="pandas")


def source_boilerplate(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    num_buckets: int = 64,
):
    """Per-source (host) boilerplate fraction: the share of a source's
    k-gram POSITIONS whose gram appears in ≥ 2 distinct documents of the
    SAME source — the site-templating signal web-cleaning pipelines use
    to decide which hosts need boilerplate removal (cf. the per-doc
    corpus-wide variant :func:`cross_dup_fraction`). Same shape at
    scale: per-doc unique-gram partials (one row per (doc, gram)), ONE
    gram-bucket shuffle where each bucket owns its grams fully, per-
    bucket (source, gram) distinct-doc counts collapsed to ≤ |sources|
    rows per bucket, then a tiny per-source sum. Returns a Dataset
    ``(source, n_grams, dup_frac)``."""

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        dids, srcs, grams, ns = [], [], [], []
        for did, src, t in zip(
            b[id_col], b[source_col], b[text_col].fillna("")
        ):
            g = _gram_hashes(t, k)
            if not g.size:
                continue
            u, c = np.unique(g, return_counts=True)
            dids.append(np.full(u.size, did, dtype=np.int64))
            srcs.append(np.full(u.size, src, dtype=object))
            grams.append(u)
            ns.append(c.astype(np.int64))
        if not dids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "source": pd.Series(dtype="object"),
                    "g": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                    "jb": pd.Series(dtype="int64"),
                }
            )
        g = np.concatenate(grams)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(dids),
                "source": np.concatenate(srcs),
                "g": g.view(np.int64),
                "n": np.concatenate(ns),
                "jb": (g % np.uint64(num_buckets)).astype(np.int64),
            }
        )

    def bucket(gdf: pd.DataFrame) -> pd.DataFrame:
        # rows are unique per (doc, gram) ⇒ group size = distinct docs
        # carrying the gram within this source
        ndocs = gdf.groupby(["source", "g"], sort=False)["doc_id"].transform(
            "size"
        )
        dup = (ndocs > 1).to_numpy()
        part = pd.DataFrame(
            {
                "source": gdf["source"].to_numpy(object),
                "n": gdf["n"].to_numpy(np.int64),
                "dup_n": np.where(dup, gdf["n"].to_numpy(np.int64), 0),
            }
        )
        out = part.groupby("source", sort=False)[["n", "dup_n"]].sum().reset_index()
        return out.astype({"n": "int64", "dup_n": "int64"})

    per_src = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("jb")
        .map_groups(bucket, batch_format="pandas")
        .groupby("source")
        .sum(["n", "dup_n"])
    )

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": b["source"],
                "n_grams": b["sum(n)"].astype("int64"),
                "dup_frac": b["sum(dup_n)"].to_numpy(np.float64)
                / b["sum(n)"].to_numpy(np.float64),
            }
        )

    return per_src.map_batches(final, batch_format="pandas")
