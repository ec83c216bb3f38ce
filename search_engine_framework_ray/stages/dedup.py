"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale shapes (ray_guide / SURVEY north-star additions):

* **exact**: vectorized content hash per batch → ``groupby(hash)`` keep the
  minimum id — one shuffle of (hash, id) pairs only.
* **MinHash-LSH**: shingle → ``n_perm`` minhashes (universal hashing,
  vectorized) per doc → explode to ``(band, band_hash)`` rows →
  ``groupby(band, band_hash)`` emits candidate pairs with their signatures →
  estimated-Jaccard verify → connected components (union-find over the small
  candidate-pair set; at larger scale swap in iterative min-label
  propagation — the pair emission is already distributed).
* **SimHash**: 64-bit weighted token-hash sketch; candidates share one of
  four 16-bit bands; verify by Hamming distance.

Duplicate-cluster output convention: ``cluster_id`` = min doc id of the
cluster; ``is_dup`` = doc is a non-representative member.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from ray.data import Dataset

_MERSENNE = (1 << 61) - 1


def _text_hash64(texts) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        d = hashlib.sha1(t.encode("utf-8", "surrogatepass")).digest()
        out[i] = int.from_bytes(d[:8], "little", signed=True)
    return out


def exact_dedup(ds: Dataset, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """→ (id, content_hash, cluster_id, is_dup); cluster = identical text."""

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, text_col]].copy()
        b["content_hash"] = _text_hash64(b[text_col].fillna("").tolist())
        return b[[id_col, "content_hash"]]

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        g["cluster_id"] = g[id_col].iloc[0]
        g["is_dup"] = g[id_col] != g["cluster_id"]
        return g

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("content_hash")
        .map_groups(pick, batch_format="pandas")
    )


_POLY = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for rolling combines


def _shingles(text: str, k: int) -> np.ndarray:
    """k-word shingle hash set (uint64, unique, sorted). Vectorized: one
    deterministic hash per word (pandas siphash, fixed key), then a rolling
    degree-k polynomial over word hashes — no per-shingle Python hashing."""
    words = text.split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(words, dtype=object))
    if len(words) < k:
        k = len(words)
    m = len(words) - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _POLY + h[j : j + m]
    return np.unique(acc)


def _perm_params(n_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """n_perm minima of the multiplicative hash (a·x + b) mod 2^64 —
    fully vectorized (n_perm × n_shingles) with uint64 wraparound."""
    if shingle_hashes.size == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * shingle_hashes[None, :] + b[:, None]
    return vals.min(axis=1)


class MinHashStage:
    """map_batches actor: text → minhash signature (+ shingle count)."""

    def __init__(self, n_perm: int = 64, k_shingle: int = 5, text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _perm_params(n_perm)
        self.k = k_shingle
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(_shingles(t, self.k), self.a, self.b)
            for t in batch[self.text_col].fillna("")
        ]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "sig": [s.astype(np.int64) for s in sigs],
            }
        )


_GB_BUCKETS = 4096  # coarse groupby key: bounds map_groups group count
_MAX_BUCKET = 64  # degenerate hot bucket → star pairs (to min id), not clique


def minhash_lsh_dedup(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    k_shingle: int = 5,
    bands: int = 16,
    threshold: float = 0.7,
    concurrency: int = 4,
) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering → pandas (id, cluster_id, is_dup).

    Scale shape: signatures once (actor pool, materialized for reuse) →
    **narrow** band rows ``(id, band_key)`` — the 512-byte signature never
    crosses the shuffle — → groupby on ``band_key % 4096`` (bounds the
    per-group Python overhead; exact keys grouped vectorized inside) →
    candidate pairs → signature-agreement verify against the materialized
    signatures → driver union-find over verified pairs only (tiny by
    construction). Buckets larger than ``_MAX_BUCKET`` emit star pairs to
    the min id instead of the O(n²) clique; because verification filters
    per-pair afterwards, a star edge that fails the threshold can drop a
    link a full clique would have kept — a bounded-recall trade-off that is
    standard for LSH dedup at scale (degenerate buckets are boilerplate
    near-identical content, where star edges pass anyway).
    """
    bands = min(bands, n_perm)  # more bands than permutations is degenerate
    rows_per_band = max(1, n_perm // bands)
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "n_perm": n_perm,
            "k_shingle": k_shingle,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pandas",
        # autoscaling pool: a fixed-size pool can deadlock a small cluster
        # (actors reserve every CPU, downstream shuffle tasks starve)
        concurrency=(1, concurrency),
    ).materialize()  # reused by banding AND verification; at larger scale
    # write_parquet here instead and read back (resumable sketch store)

    def explode_bands(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        sig = np.stack(b["sig"].to_numpy()).astype(np.uint64)  # (n, n_perm)
        keys = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bd in range(bands):
                acc = np.full(n, np.uint64(bd + 1), dtype=np.uint64)
                for c in range(bd * rows_per_band, (bd + 1) * rows_per_band):
                    acc = acc * _POLY + sig[:, c]
                keys[:, bd] = acc
        flat = keys.reshape(-1).view(np.int64)
        return pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(), bands),
                "band_key": flat,
                "gb": flat % _GB_BUCKETS,
            }
        )

    banded = sigs.map_batches(explode_bands, batch_format="pandas")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, grp in g.groupby("band_key", sort=False):
            ids = np.unique(grp[id_col].to_numpy())
            m = len(ids)
            if m < 2:
                continue
            if m > _MAX_BUCKET:
                a_out.extend([int(ids[0])] * (m - 1))
                b_out.extend(int(i) for i in ids[1:])
            else:
                iu = np.triu_indices(m, k=1)
                a_out.extend(int(i) for i in ids[iu[0]])
                b_out.extend(int(i) for i in ids[iu[1]])
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype="int64"), "b": pd.Series(b_out, dtype="int64")}
        )

    pairs = (
        banded.groupby("gb")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs):
        pairs = pairs.drop_duplicates(ignore_index=True)

    # verify candidates by signature agreement (est. Jaccard ≥ threshold)
    if len(pairs):
        need = set(pairs["a"]) | set(pairs["b"])
        import ray as _ray

        need_ref = _ray.put(need)

        def pick(b: pd.DataFrame) -> pd.DataFrame:
            nd = _ray.get(need_ref)
            return b[b[id_col].isin(nd)]

        sub = sigs.map_batches(pick, batch_format="pandas").to_pandas()
        sig_map = {int(i): np.asarray(s) for i, s in zip(sub[id_col], sub["sig"])}
        amat = np.stack([sig_map[int(i)] for i in pairs["a"]])
        bmat = np.stack([sig_map[int(i)] for i in pairs["b"]])
        est = (amat == bmat).mean(axis=1)
        pairs = pairs.assign(est_jaccard=est)[est >= threshold]

    all_ids = np.sort(ds.select_columns([id_col]).to_pandas()[id_col].to_numpy())
    return _cluster_from_pairs(all_ids, pairs, id_col)


def _cluster_from_pairs(all_ids: np.ndarray, pairs: pd.DataFrame, id_col: str) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    if len(pairs):
        for a, b in zip(pairs["a"], pairs["b"]):
            union(int(a), int(b))
    cluster = np.array([find(int(i)) for i in all_ids], dtype=np.int64)
    return pd.DataFrame(
        {id_col: all_ids, "cluster_id": cluster, "is_dup": cluster != all_ids}
    ).sort_values(id_col, kind="mergesort").reset_index(drop=True)


def simhash64(text: str) -> int:
    """Weighted 64-bit SimHash over whitespace tokens."""
    acc = np.zeros(64, dtype=np.int64)
    for tok, cnt in pd.Series(text.split()).value_counts().items():
        h = int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, cnt, -cnt)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_dedup(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> pd.DataFrame:
    """SimHash near-dup: 4×16-bit band blocking + Hamming verify →
    (id, simhash, cluster_id, is_dup)."""

    def add_sim(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "simhash": [simhash64(t) for t in b[text_col].fillna("")],
            }
        )

    sims = ds.map_batches(add_sim, batch_format="pandas")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = {id_col: [], "band": [], "key": [], "simhash": []}
        for i, s in zip(b[id_col], b["simhash"]):
            u = int(s) & ((1 << 64) - 1)
            for bd in range(4):
                rows[id_col].append(i)
                rows["band"].append(bd)
                rows["key"].append((u >> (16 * bd)) & 0xFFFF)
                rows["simhash"].append(s)
        return pd.DataFrame(rows)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").drop_duplicates(id_col)
        out = {"a": [], "b": []}
        ids = g[id_col].tolist()
        hs = [int(s) & ((1 << 64) - 1) for s in g["simhash"]]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if bin(hs[i] ^ hs[j]).count("1") <= max_hamming:
                    out["a"].append(int(ids[i]))
                    out["b"].append(int(ids[j]))
        return pd.DataFrame(out)

    pairs = (
        sims.map_batches(explode, batch_format="pandas")
        .groupby(["band", "key"])
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    simdf = sims.to_pandas()
    clusters = _cluster_from_pairs(simdf[id_col].to_numpy(), pairs, id_col)
    return simdf.merge(clusters, on=id_col).sort_values(id_col).reset_index(drop=True)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-word-shingle Jaccard between two texts (verification kernel)."""
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0
