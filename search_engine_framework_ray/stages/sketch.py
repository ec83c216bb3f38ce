"""Mergeable KMV (k-minimum-values) distinct-count sketches.

A 100-TB curation run wants cardinality answers — "how many distinct
tokens does each crawl source contribute?", "how much vocabulary do two
dumps share?" — without a full-vocabulary shuffle. The KMV sketch
(Bar-Yossef et al. 2002, the bottom-k estimator) answers both with k
hash values per key:

* keep the k smallest *distinct* hash values of the set;
* if fewer than k survive, the set was small and the sketch IS the set
  (exact count); otherwise estimate ``|S| ≈ (k-1) · 2⁶⁴ / h₍ₖ₎`` where
  ``h₍ₖ₎`` is the k-th smallest hash (uniform on [0, 2⁶⁴));
* sketches merge by "union then re-take the k smallest" — the global k
  smallest of a union are each among their own partition's k smallest,
  so per-batch partials compose associatively (the same argument that
  makes the partial/groupby combiner pattern exact for min/max).

Scale shape: one streaming pass computes per-batch partials (≤ k rows
per key per batch, two narrow columns — token text never leaves the
batch), then ONE tiny groupby over ``(key, hash)`` partials merges them.
A Zipf-hot key contributes ≤ k·n_batches partial rows, never its tokens.
Pairwise-Jaccard post-processing touches only the finished sketches
(k rows per key), so it is driver-side by design — the "big" side of the
computation is entirely inside the streaming pass.

Determinism / oracle parity: hashes are md5-low64 (DuckDB
``md5_number_lower``), the estimator is evaluated in exact integer
arithmetic (``((k-1) << 64) // h_k``, HUGEINT floor-division in SQL), and
tokenization is the RE2-aligned ASCII class shared with the textstats
oracles — so a DuckDB SQL twin reproduces every sketch AND every estimate
bit-for-bit. No float enters the result.

Reference parity: the reference engine has no sketch layer (SURVEY.md
§2.10 extension surface); this is an LLM-pipeline addition in the same
family as `stages/corpus.py`'s census operators.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from .dedup import _md5_hash64
from .textstats import RE2_TOKEN_RE as _WS_RE

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_TWO64 = 1 << 64


def _batch_kmv_partial(
    b: pd.DataFrame, key_col: str, text_col: str, k: int
) -> pd.DataFrame:
    """One batch → ≤ k (key, hash) rows per key: explode tokens, hash each
    *unique* token once (md5-low64, cached across keys within the batch),
    dedupe per key, keep the k smallest."""
    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype="object"),
            "h": pd.Series(dtype="uint64"),
        }
    )
    ex = b[text_col].fillna("").str.findall(_WS_RE).explode().dropna()
    if ex.empty:
        return empty
    keys = b[key_col].reindex(ex.index)
    pairs = pd.DataFrame(
        {key_col: keys.to_numpy(object), "tok": ex.to_numpy(object)}
    ).drop_duplicates()
    # md5 once per distinct token in the batch (tokens repeat across keys)
    uniq = pd.unique(pairs["tok"].to_numpy(object))
    hmap = {t: _md5_hash64(t) for t in uniq}
    pairs["h"] = pd.array(
        [hmap[t] for t in pairs["tok"].to_numpy(object)], dtype="uint64"
    )
    out = (
        pairs.drop(columns=["tok"])
        .drop_duplicates()  # distinct hashes per key (md5 collisions fold)
        .sort_values([key_col, "h"], kind="mergesort")
        .groupby(key_col, sort=False)
        .head(k)
    )
    return out.reset_index(drop=True)


def _merge_bucket(g: pd.DataFrame, key_col: str, k: int) -> pd.DataFrame:
    """Merge ALL keys of one coarse bucket vectorized: distinct (key, h),
    k smallest per key. Grouping Ray-level on the key itself would pay
    per-group dispatch for every key (the many-group trap — see
    stages/graph.py triangle_counts degrees note)."""
    out = (
        g[[key_col, "h"]]
        .drop_duplicates()
        .sort_values([key_col, "h"], kind="mergesort")
        .groupby(key_col, sort=False)
        .head(k)
    )
    return out.reset_index(drop=True)


def kmv_sketches(
    ds: "ray.data.Dataset",
    key_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> "ray.data.Dataset":
    """Per-key KMV token-vocabulary sketches: ≤ k ``(key, h)`` rows per
    key, h = md5-low64 of the raw whitespace token, the k smallest
    distinct values surviving. One streaming partial pass + one narrow
    groupby merge."""

    n_buckets = 64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = _batch_kmv_partial(b, key_col, text_col, k)
        if not len(out):  # hash_array raises on empty object arrays
            out["_bkt"] = pd.Series(dtype="int64")
            return out
        out["_bkt"] = (
            pd.util.hash_array(out[key_col].to_numpy(object))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return _merge_bucket(g, key_col, k)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(merge, batch_format="pandas")
    )


def kmv_estimate(hashes: np.ndarray, k: int) -> int:
    """Bottom-k estimator in exact integer arithmetic. ``hashes`` is a
    finished sketch (sorted or not): < k values ⇒ the set was that small
    ⇒ exact count; else ``((k-1) << 64) // h_k`` (floor)."""
    hs = np.sort(np.asarray(hashes, dtype=np.uint64))
    if len(hs) < k:
        return int(len(hs))
    h_k = int(hs[k - 1])
    return ((k - 1) << 64) // max(h_k, 1)


def _signed64(v: int) -> int:
    return v - _TWO64 if v >= (1 << 63) else v


def kmv_distinct(
    ds: "ray.data.Dataset",
    key_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> pd.DataFrame:
    """Per-key distinct-token estimates from KMV sketches. Returns one row
    per key: ``(key, k_used, kth_hash, est_distinct)`` — ``kth_hash`` is
    the largest retained hash as signed int64 (the DuckDB BIGINT view),
    ``est_distinct`` the integer bottom-k estimate. Only the k·n_keys
    sketch rows ever reach the driver."""
    sk = kmv_sketches(ds, key_col=key_col, text_col=text_col, k=k).to_pandas()
    if sk.empty:
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype="object"),
                "k_used": pd.Series(dtype="int64"),
                "kth_hash": pd.Series(dtype="int64"),
                "est_distinct": pd.Series(dtype="int64"),
            }
        )
    rows = []
    for key, g in sk.groupby(key_col, sort=True):
        hs = np.sort(g["h"].to_numpy(np.uint64))
        rows.append(
            {
                key_col: key,
                "k_used": int(len(hs)),
                "kth_hash": _signed64(int(hs[-1])),
                "est_distinct": kmv_estimate(hs, k),
            }
        )
    out = pd.DataFrame(rows)
    for c in ("k_used", "kth_hash", "est_distinct"):
        out[c] = out[c].astype("int64")
    return out


def kmv_jaccard_pairs(
    ds: "ray.data.Dataset",
    key_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    scale: int = 1_000_000,
) -> pd.DataFrame:
    """Pairwise vocabulary-Jaccard estimates between keys, from the same
    sketches: merge the two sketches, keep the k smallest of the union
    (k' = min(k, |union sketch|)), and count how many of those k' hashes
    appear in BOTH input sketches — ``J ≈ |both| / k'`` (the bottom-k
    Jaccard estimator; Broder's MinHash argument applied to one shared
    hash function). Reported as an exact integer ratio
    ``j_micros = (|both| · scale) // k'`` so the SQL twin matches
    bit-for-bit.

    The pairwise pass runs over finished sketches only (k rows per key) —
    at k=64 and 10⁴ keys that is 640k tiny rows, driver-side by design;
    the corpus-sized work all happened in the streaming sketch pass."""
    sk = kmv_sketches(ds, key_col=key_col, text_col=text_col, k=k).to_pandas()
    empty = pd.DataFrame(
        {
            "key_a": pd.Series(dtype="object"),
            "key_b": pd.Series(dtype="object"),
            "k_eff": pd.Series(dtype="int64"),
            "n_both": pd.Series(dtype="int64"),
            "j_micros": pd.Series(dtype="int64"),
        }
    )
    if sk.empty:
        return empty
    by_key = {
        key: np.sort(g["h"].to_numpy(np.uint64))
        for key, g in sk.groupby(key_col, sort=True)
    }
    keys = sorted(by_key)
    rows = []
    for i, a in enumerate(keys):
        ha = by_key[a]
        for b_ in keys[i + 1 :]:
            hb = by_key[b_]
            union = np.union1d(ha, hb)[:k]
            k_eff = len(union)
            both = int(
                np.isin(union, ha).astype(np.int64)
                @ np.isin(union, hb).astype(np.int64)
            )
            rows.append(
                {
                    "key_a": a,
                    "key_b": b_,
                    "k_eff": k_eff,
                    "n_both": both,
                    "j_micros": (both * scale) // max(k_eff, 1),
                }
            )
    if not rows:  # fewer than two keys → no pairs
        return empty
    out = pd.DataFrame(rows)
    for c in ("k_eff", "n_both", "j_micros"):
        out[c] = out[c].astype("int64")
    return out


# ----------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable frequency summaries + exact verify)
# ----------------------------------------------------------------------------


def _mg_summary(counts: pd.Series, m: int) -> tuple[pd.Series, int]:
    """Reduce exact per-term counts to a Misra-Gries summary of ≤ m
    counters: subtract the (m+1)-th largest count from every counter and
    keep the positives. Every surviving counter undercounts its term by
    exactly the decrement; every dropped term's count was ≤ the decrement
    (Misra & Gries 1982; merge bound per Agarwal et al. 2013, "Mergeable
    Summaries"). Returns ``(lower_bounds, decrement)``."""
    if len(counts) <= m:
        return counts, 0
    counts = counts.sort_values(ascending=False, kind="mergesort")
    dec = int(counts.iloc[m])
    kept = counts.iloc[:m] - dec
    return kept[kept > 0], dec


def heavy_hitters(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    m: int = 8,
    k: int = 5,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """EXACT global top-k most frequent tokens via bounded-memory
    Misra-Gries summaries + a candidate-only exact-count verify pass —
    the scale path for when the vocabulary is too large to shuffle even
    hash-bucketed (:func:`~..corpus.ngram_topk` is the full-shuffle
    sibling; this ships ≤ m+1 narrow rows per batch instead of the batch
    vocabulary).

    Math making the result EXACT, not approximate: per-batch summaries
    undercount any term by ≤ that batch's decrement; summing survivors
    per term gives a lower bound ``lb(t)`` with ``true(t) - lb(t) ≤ D``
    (D = Σ per-batch decrements — the mergeable-summaries bound). With
    ``lb_k`` = k-th largest lower bound, every true top-k term satisfies
    ``lb(t) ≥ lb_k - D``, so the candidate set ``{t : lb(t) ≥ lb_k - D}``
    is a guaranteed superset; an exact count of candidates only (the
    verify pass, broadcast set + per-batch combiner) then yields the
    exact top-k. If ``lb_k ≤ D`` the superset argument collapses (a term
    could hide below every summary) — that regime means m is too small
    for the skew and the operator FAILS LOUDLY with the remedy rather
    than silently returning a plausible-but-unverified list.

    Tokens are lowercased whitespace tokens (RE2-aligned class, oracle
    parity). Ties order ``(count DESC, term ASC)``. Returns a driver-side
    ``(term, cnt)`` DataFrame of k rows — the big sides (summary build,
    candidate counting) are streaming ``map_batches`` passes with one
    narrow bucket-groupby each.
    """
    import ray.data  # noqa: F401  (Dataset ops on ds)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].fillna("").str.lower().str.findall(_WS_RE).explode().dropna()
        empty = pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "lb": pd.Series([], dtype="int64"),
                "dec": pd.Series([], dtype="int64"),
                "bucket": pd.Series([], dtype="int64"),
            }
        )
        if not len(ex):
            return empty
        kept, dec = _mg_summary(ex.value_counts(), m)
        terms = kept.index.to_numpy(object)
        lb = kept.to_numpy(np.int64)
        if len(terms) == 0:  # all counts equal: summary empty, decrement real
            terms = np.asarray([""], dtype=object)
            lb = np.zeros(1, dtype=np.int64)
        decs = np.zeros(len(terms), dtype=np.int64)
        decs[0] = dec
        return pd.DataFrame(
            {
                "term": terms,
                "lb": lb,
                "dec": decs,
                "bucket": (
                    pd.util.hash_array(terms) % np.uint64(n_buckets)
                ).astype(np.int64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    d_total = int(partials.sum("dec") or 0)

    def sum_terms(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["term"] != ""]
        s = g.groupby("term", sort=False)["lb"].sum()
        return pd.DataFrame(
            {"term": s.index.to_numpy(object), "lb": s.to_numpy(np.int64)}
        )

    merged = (
        partials.groupby("bucket")
        .map_groups(sum_terms, batch_format="pandas")
        .materialize()
    )

    # k-th largest lower bound: per-block top-k is a superset of the
    # global top-k lbs, so the driver sees ≤ k rows per block, never the
    # surviving-vocabulary table.
    tops = merged.map_batches(
        lambda b: b.nlargest(k, "lb"), batch_format="pandas"
    ).to_pandas()
    lb_k = int(tops["lb"].nlargest(k).iloc[-1]) if len(tops) >= k else 0
    if lb_k <= d_total and d_total > 0:
        raise ValueError(
            f"heavy_hitters: k-th lower bound {lb_k} ≤ total decrement "
            f"{d_total}; the summary size m={m} is too small for this "
            f"corpus skew — raise m (counters per batch) until the heavy "
            f"terms clear the merge error."
        )
    thresh = lb_k - d_total
    cands = merged.map_batches(
        lambda b: b[b["lb"] >= thresh][["term"]], batch_format="pandas"
    ).to_pandas()
    cand_set = set(cands["term"])

    def exact_partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].fillna("").str.lower().str.findall(_WS_RE).explode().dropna()
        ex = ex[ex.isin(cand_set)]
        vc = ex.value_counts()
        terms = vc.index.to_numpy(object)
        if len(terms) == 0:
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype=object),
                    "cnt": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "term": terms,
                "cnt": vc.to_numpy(np.int64),
                "bucket": (
                    pd.util.hash_array(terms) % np.uint64(n_buckets)
                ).astype(np.int64),
            }
        )

    def sum_exact(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", sort=False)["cnt"].sum()
        return pd.DataFrame(
            {"term": s.index.to_numpy(object), "cnt": s.to_numpy(np.int64)}
        )

    exact = (
        ds.map_batches(exact_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(sum_exact, batch_format="pandas")
        .to_pandas()
    )
    exact = exact.sort_values(
        ["cnt", "term"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return exact.reset_index(drop=True)

# ----------------------------------------------------------------------------
# Count-min sketch (point-frequency estimates in d·w fixed memory)
# ----------------------------------------------------------------------------


def _md5_hash128(token: str) -> tuple[int, int]:
    """(lower-64, upper-64) of md5 — byte-for-byte DuckDB's
    ``md5_number_lower`` / ``md5_number_upper`` pair (both little-endian
    halves of the digest), so ONE hash call feeds all d sketch rows."""
    dig = hashlib.md5(token.encode("utf-8", "surrogatepass")).digest()
    return (
        int.from_bytes(dig[8:], "little"),
        int.from_bytes(dig[:8], "little"),
    )


def _cms_cols(terms: np.ndarray, d: int, w: int) -> np.ndarray:
    """(n, d) column indices via Kirsch-Mitzenmacher double hashing:
    ``col_j = (h1 + j·h2) mod 2⁶⁴ mod w`` with h1/h2 the two md5 halves
    (h2 forced odd) — d rows from ONE md5 per token (the Bloom filter's
    trick, stages/join.py), 4× less hashing than d independent digests,
    and still exactly reproducible in SQL."""
    n = len(terms)
    h1 = np.empty(n, np.uint64)
    h2 = np.empty(n, np.uint64)
    for i, t in enumerate(terms):
        lo, up = _md5_hash128(t)
        h1[i] = lo
        h2[i] = up | 1
    with np.errstate(over="ignore"):
        j = np.arange(d, dtype=np.uint64)[None, :]
        return ((h1[:, None] + j * h2[:, None]) % np.uint64(w)).astype(np.int64)


def cms_sketch(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    d: int = 4,
    w: int = 1024,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Count-min sketch (Cormode & Muthukrishnan 2005) over lowercased
    whitespace tokens: ``d`` hash rows × ``w`` columns of int64 counters.
    Per-batch partials count tokens locally (``value_counts``) and emit at
    most d·w narrow ``(row_j, col, cnt)`` rows — the batch's vocabulary
    never crosses the shuffle — then ONE coarse-bucket groupby sums cells.
    Fixed d·w memory regardless of corpus size is the whole point: at
    100 TB the sketch is still 4×1024 counters."""

    empty = pd.DataFrame(
        {
            "row_j": pd.Series(dtype="int64"),
            "col": pd.Series(dtype="int64"),
            "cnt": pd.Series(dtype="int64"),
            "_bkt": pd.Series(dtype="int64"),
        }
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = (
            b[text_col].fillna("").str.findall(_WS_RE).explode().dropna().str.lower()
        )
        if not len(ex):
            return empty
        vc = ex.value_counts()
        terms = vc.index.to_numpy(object)
        cnts = vc.to_numpy(np.int64)
        cols = _cms_cols(terms, d, w)  # (n, d), one md5 per term
        frames = [
            pd.DataFrame({"row_j": np.int64(j), "col": cols[:, j], "cnt": cnts})
            for j in range(d)
        ]
        out = (
            pd.concat(frames, ignore_index=True)
            .groupby(["row_j", "col"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        out["_bkt"] = (out["row_j"] * w + out["col"]) % n_buckets
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["row_j", "col"], sort=False)["cnt"].sum().reset_index()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(merge, batch_format="pandas")
    )


def cms_point_counts(
    ds: "ray.data.Dataset",
    terms: list[str],
    text_col: str = "text",
    d: int = 4,
    w: int = 1024,
) -> pd.DataFrame:
    """Point-frequency estimates for a probe-term list from a count-min
    sketch, paired with the exact counts (broadcast-probe-set filtered
    count — the candidate-verify pattern from :func:`heavy_hitters`) so the
    one-sided error ``est ≥ exact`` is visible in the result. Returns
    ``(term, est_cnt, exact_cnt)``, one row per probe term. Only the ≤ d·w
    sketch cells and ≤ |terms|·n_batches exact partials reach the driver."""
    cells = cms_sketch(ds, text_col=text_col, d=d, w=w).to_pandas()
    cell_map = {
        (int(r), int(c)): int(n)
        for r, c, n in zip(cells["row_j"], cells["col"], cells["cnt"])
    }
    probe = sorted(set(terms))
    probe_set = set(probe)

    def exact_partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = (
            b[text_col].fillna("").str.findall(_WS_RE).explode().dropna().str.lower()
        )
        ex = ex[ex.isin(probe_set)]
        vc = ex.value_counts()
        return pd.DataFrame(
            {
                "term": vc.index.to_numpy(object),
                "cnt": vc.to_numpy(np.int64),
            }
        )

    exact_parts = ds.map_batches(exact_partial, batch_format="pandas").to_pandas()
    exact = (
        exact_parts.groupby("term")["cnt"].sum()
        if len(exact_parts)
        else pd.Series(dtype="int64")
    )
    probe_cols = _cms_cols(np.asarray(probe, dtype=object), d, w)
    rows = []
    for i, t in enumerate(probe):
        est = min(
            cell_map.get((j, int(probe_cols[i, j])), 0) for j in range(d)
        )
        rows.append(
            {"term": t, "est_cnt": est, "exact_cnt": int(exact.get(t, 0))}
        )
    out = pd.DataFrame(rows)
    for c in ("est_cnt", "exact_cnt"):
        out[c] = out[c].astype("int64")
    return out


# ----------------------------------------------------------------------------
# HyperLogLog (fixed 256-register cardinality, integer-exact estimator)
# ----------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256 registers
_HLL_Q = 64 - _HLL_P  # 56 rho bits
# alpha_256 = 0.7213 / (1 + 1.079/256), fixed-point micros so the raw
# estimate is pure integer arithmetic on both the Ray and SQL sides.
_HLL_ALPHA_MICROS = 718272


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 (float log2 would round
    2⁵⁶−1 up to 2⁵⁶ and misreport the leading-zero count)."""
    cur = x.astype(np.uint64).copy()
    bl = np.zeros(len(cur), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(s))
        bl += s * big
        cur = np.where(big, cur >> np.uint64(s), cur)
    bl += (cur > 0).astype(np.int64)
    return bl


def hll_registers(
    ds: "ray.data.Dataset",
    key_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-key HyperLogLog registers (Flajolet et al. 2007) over raw
    whitespace tokens: bucket = top-8 bits of md5-low64, rho = leading-zero
    run of the remaining 56 bits + 1. Per-batch partials emit ≤ 256 narrow
    ``(key, bucket, m_j)`` rows per key (max is associative, same combiner
    argument as KMV); ONE coarse groupby takes the global max. Returns rows
    for occupied buckets only — absent buckets are register value 0."""

    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype="object"),
            "bucket": pd.Series(dtype="int64"),
            "m_j": pd.Series(dtype="int64"),
            "_bkt": pd.Series(dtype="int64"),
        }
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ex = b[text_col].fillna("").str.findall(_WS_RE).explode().dropna()
        if not len(ex):
            return empty
        keys = b[key_col].reindex(ex.index)
        pairs = pd.DataFrame(
            {key_col: keys.to_numpy(object), "tok": ex.to_numpy(object)}
        ).drop_duplicates()
        uniq = pd.unique(pairs["tok"].to_numpy(object))
        hmap = {t: _md5_hash64(t) for t in uniq}
        h = np.fromiter(
            (hmap[t] for t in pairs["tok"].to_numpy(object)),
            dtype=np.uint64,
            count=len(pairs),
        )
        bucket = (h >> np.uint64(_HLL_Q)).astype(np.int64)
        rest = h & np.uint64((1 << _HLL_Q) - 1)
        rho = np.where(
            rest == 0, _HLL_Q + 1, _HLL_Q - _bit_length_u64(rest) + 1
        ).astype(np.int64)
        out = (
            pd.DataFrame(
                {
                    key_col: pairs[key_col].to_numpy(object),
                    "bucket": bucket,
                    "m_j": rho,
                }
            )
            .groupby([key_col, "bucket"], sort=False)["m_j"]
            .max()
            .reset_index()
        )
        out["_bkt"] = (
            pd.util.hash_array(out[key_col].to_numpy(object))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby([key_col, "bucket"], sort=False)["m_j"].max().reset_index()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(merge, batch_format="pandas")
    )


def hll_distinct(
    ds: "ray.data.Dataset",
    key_col: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Per-key distinct-token estimates from the HLL registers. The raw
    estimator is evaluated EXACTLY in integers: the harmonic-mean
    denominator ``Σ 2^{-M[i]}`` is scaled by 2⁵⁶ so
    ``S = Σ 2^{56-M[i]}`` is an exact big-int, and
    ``est_raw = (α_micros · m² · 2⁵⁶) // S // 10⁶``. The standard
    small-range correction (linear counting, ``⌊m·ln(m/V)⌋`` when V > 0
    zero registers and est_raw ≤ 5m/2) uses one libm ``ln`` — identical
    bit pattern to DuckDB's ``ln`` on this platform, unit-verified for
    every possible V in 1..256. Returns ``(key, n_zero, est_raw,
    est_distinct)``; only ≤ 256 register rows per key reach the driver."""
    import math

    regs = hll_registers(ds, key_col=key_col, text_col=text_col).to_pandas()
    out_cols = {
        key_col: pd.Series(dtype="object"),
        "n_zero": pd.Series(dtype="int64"),
        "est_raw": pd.Series(dtype="int64"),
        "est_distinct": pd.Series(dtype="int64"),
    }
    if regs.empty:
        return pd.DataFrame(out_cols)
    rows = []
    m = _HLL_M
    for key, g in regs.groupby(key_col, sort=True):
        mj = g["m_j"].to_numpy(np.int64)
        n_zero = m - len(mj)
        s_tot = int(sum(1 << (_HLL_Q - int(v)) for v in mj)) + (
            n_zero << _HLL_Q
        )
        est_raw = (_HLL_ALPHA_MICROS * m * m * (1 << _HLL_Q)) // s_tot // 10**6
        if n_zero > 0 and est_raw <= (5 * m) // 2:
            est = math.floor(m * math.log(m / n_zero))
        else:
            est = est_raw
        rows.append(
            {
                key_col: key,
                "n_zero": n_zero,
                "est_raw": est_raw,
                "est_distinct": est,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_zero", "est_raw", "est_distinct"):
        out[c] = out[c].astype("int64")
    return out
