"""CORI-style selective search (resource selection) over partitioned indexes.

The 10^12-doc pattern the north rule targets cannot broadcast every query
to every index shard: production distributed IR partitions the corpus into
topical/source shards and sends each query to the FEW shards most likely
to hold its answers (Callan, Lu & Croft, SIGIR 1995 — CORI; Kulkarni &
Callan, CIKM 2010 — shard-partitioned selective search).  This module is
the query-routing half of that design on top of
``pipelines.partitioned.build_partitioned_indexes``:

* **Resource ranking** — per shard, CORI's document-frequency belief
  computed from METADATA ONLY: the per-term df comes from the shard's
  hash-bucketed termstats store (``load_term_stats`` reads just the
  buckets the query terms hash to) and the shard word count from its
  ``stats.json``.  No posting list is opened for shards that lose the
  ranking; at 100 TB this is a few KiB of stats reads per shard versus a
  full query fan-out.
* **Routed evaluation** — only the top-R shards run the query (their own
  collection stats, exactly as ``partitioned.py`` builds them), and the
  per-shard top-k lists raw-score-merge on the driver (k·R rows).  Raw
  BM25 scores across shards with different stats are approximately — not
  perfectly — comparable; that approximation IS selective search's
  documented trade (CORI's result-merging heuristic exists for when it
  bites).  The SQL twin replays the same per-shard stats and the same
  merge, so the driver hash verifies the semantics end to end.

CORI belief for term t in shard i (the SIGIR '95 constants):

    T = df / (df + 50 + 150 * cw_i / avg_cw)
    I = log((P + 0.5) / cf_t) / log(P + 1.0)
    p(t|shard_i) = b + (1 - b) * T * I        (b = 0.4)

where ``cw_i`` is shard i's body word count, ``avg_cw`` the mean over the
P shards, and ``cf_t`` the number of shards containing t.  A term absent
from a shard contributes the belief floor ``b``.

Reference scope note: the reference is a single-index engine
(``QryEval.java`` opens one Lucene index); resource selection is the
standard public extension for the multi-shard deployment this repo is
designed around.
"""

from __future__ import annotations

import math

import pandas as pd

__all__ = ["cori_shard_ranking", "selective_bm25", "cori_merge", "lpt_assign"]

_CORI_B = 0.4
_CORI_DF_BASE = 50.0
_CORI_CW_SCALE = 150.0


def cori_shard_ranking(
    idxs: dict[str, str],
    terms: list[str],
    *,
    field: str = "body",
    belief_floor: float = _CORI_B,
) -> pd.DataFrame:
    """→ one row per shard: ``(shard, belief, cw)`` sorted ranking-first
    (belief desc, shard asc).  Metadata-only: per-shard df via the bucketed
    termstats store, word counts via stats.json."""
    from ..query.executor import load_term_stats, read_stats

    names = sorted(idxs)
    pairs = {(field, t) for t in terms}
    dfs: dict[str, dict[str, int]] = {}
    cw: dict[str, float] = {}
    for name in names:
        stats = read_stats(idxs[name])
        cw[name] = float(stats["fields"].get(field, {}).get("sum_doclen", 0))
        got = load_term_stats(idxs[name], pairs)
        dfs[name] = {t: got.get((field, t), (0, 0))[0] for t in terms}

    n_shards = len(names)
    avg_cw = sum(cw.values()) / max(1, n_shards)
    cf = {t: sum(1 for n in names if dfs[n][t] > 0) for t in terms}
    beliefs: list[float] = []
    for name in names:
        s = 0.0
        for t in terms:
            df = dfs[name][t]
            if df > 0 and cf[t] > 0:
                T = df / (df + _CORI_DF_BASE + _CORI_CW_SCALE * cw[name] / avg_cw)
                I = math.log((n_shards + 0.5) / cf[t]) / math.log(n_shards + 1.0)
                s += belief_floor + (1.0 - belief_floor) * T * I
            else:
                s += belief_floor  # absent term: belief floor only
        beliefs.append(s)

    out = pd.DataFrame({"shard": names, "belief": beliefs, "cw": cw.values()})
    return out.sort_values(
        ["belief", "shard"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def _routed_lists(
    idxs: dict[str, str],
    terms: list[str],
    *,
    select: int,
    k: int,
    model_params=None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """CORI-rank every shard, run the query on the top-``select`` only, and
    return (ranking, the UNCUT k·R rows ``(extid, score, shard)``). The R
    routed queries are independent single-index jobs — a thread pool drives
    their streaming Datasets concurrently, so routed latency is max(shard)
    not sum(shard)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..query.models import ModelParams
    from ..query.executor import run_queries

    params = model_params or ModelParams(model="BM25")
    ranking = cori_shard_ranking(idxs, terms)
    chosen = list(ranking["shard"].head(select))

    def _one(name: str):
        return name, run_queries(idxs[name], [("q", " ".join(terms))], params, k=k)["q"]

    rows: list[tuple[str, float, str]] = []
    with ThreadPoolExecutor(max_workers=max(1, len(chosen))) as pool:
        for name, res in pool.map(_one, chosen):
            rows.extend((extid, score, name) for extid, score, _ in res)
    return ranking, pd.DataFrame(rows, columns=["extid", "score", "shard"])


def selective_bm25(
    idxs: dict[str, str],
    terms: list[str],
    *,
    select: int = 2,
    k: int = 10,
    model_params=None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Route a flat BM25 query to the top-``select`` CORI shards only.

    → ``(ranking, results)``: the full shard ranking (every shard, belief
    order) and the merged top-k ``(extid, score, shard)`` — per-shard top-k
    lists raw-score merged, ties broken by extid then shard id.
    """
    ranking, lists = _routed_lists(
        idxs, terms, select=select, k=k, model_params=model_params
    )
    results = (
        lists.sort_values(
            ["score", "extid", "shard"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(k)
        .reset_index(drop=True)
    )
    return ranking, results


def cori_merge(
    idxs: dict[str, str],
    terms: list[str],
    *,
    select: int = 2,
    k: int = 10,
    model_params=None,
) -> pd.DataFrame:
    """Selective search with CORI result MERGING (Callan SIGIR'95 §result
    merging; Larkey et al. 2000 form): raw scores from shards with
    different collection stats are not comparable, so each shard's top-k
    is min-max normalized WITHIN its own list (s'), the shard beliefs are
    min-max normalized over ALL shards (b'), and the merged score is

        s'' = (s' + 0.4 * s' * b') / 1.4

    — a document from a high-belief shard outranks an equal-normalized-score
    document from a low-belief one.  Degenerate lists (max == min) get
    s' = 0.  → merged top-k ``(extid, merged, shard)``.

    Normalization runs over each shard's FULL top-k list (the uncut k·R
    routed rows), not over the raw-merge cut — a shard's min/max must come
    from its own list or the normalization depends on the other shards."""
    ranking, results = _routed_lists(
        idxs, terms, select=select, k=k, model_params=model_params
    )
    bmin, bmax = ranking["belief"].min(), ranking["belief"].max()
    bnorm = {
        r.shard: ((r.belief - bmin) / (bmax - bmin) if bmax > bmin else 0.0)
        for r in ranking.itertuples()
    }
    out = results.copy()
    grp = out.groupby("shard")["score"]
    mn, mx = grp.transform("min"), grp.transform("max")
    rng = mx - mn
    sp = ((out["score"] - mn) / rng).where(rng > 0, 0.0)
    bp = out["shard"].map(bnorm)
    out["merged"] = (sp + 0.4 * sp * bp) / 1.4
    return (
        out.sort_values(
            ["merged", "extid", "shard"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(k)[["extid", "merged", "shard"]]
        .reset_index(drop=True)
    )


def lpt_assign(cw: dict[str, int], n_nodes: int) -> pd.DataFrame:
    """Longest-processing-time-first shard placement (Graham 1969 — the
    classic 4/3-approximation for makespan): shards in weight-descending
    order (ties: shard id ascending) each go to the currently-lightest node
    (ties: lowest node id).  Weights are exact integers (per-shard word
    counts from stats.json), so the whole plan is integer arithmetic a SQL
    twin replays bit-for-bit.  → ``(shard, node, node_load_after)`` in
    assignment order.  Metadata-only: this is the placement step a fleet
    runs when rebalancing shards across nodes after growth or skew."""
    order = sorted(cw.items(), key=lambda kv: (-int(kv[1]), kv[0]))
    loads = [0] * n_nodes
    rows = []
    for shard, w in order:
        node = min(range(n_nodes), key=lambda i: (loads[i], i))
        loads[node] += int(w)
        rows.append((shard, node, loads[node]))
    return pd.DataFrame(rows, columns=["shard", "node", "node_load_after"])


# ------------------------------------------------------------- Bloom routing
# Term-membership Bloom filters per shard: the O(1)-memory, zero-I/O
# complement to CORI's belief ranking. CORI answers "which shards are most
# USEFUL for these terms"; the Bloom filter answers "which shards can
# possibly contain them AT ALL" — for rare/navigational terms the broker
# skips true-negative shards without touching termstats on disk, and
# because a Bloom filter has NO false negatives the routed result is
# exactly the full fan-out's (a skipped shard holds no matching posting).
#
# Hashing is the repo's SQL-replayable PRF pair — h1 = md5_number_lower(t),
# h2 = md5_number_lower('2:'||t) forced odd — with power-of-two ``bits``,
# so even the FALSE-POSITIVE behavior is deterministic and a DuckDB twin
# replays the whole routing matrix bit-for-bit.

_BLOOM_BITS = 4096
_BLOOM_K = 3


def _md5_low64(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def term_bloom_positions(
    term: str, *, bits: int = _BLOOM_BITS, k: int = _BLOOM_K
) -> list[int]:
    """The k bit positions of a term (Kirsch-Mitzenmacher double hashing
    over the md5 PRF pair; exact unbounded-int arithmetic — with
    power-of-two ``bits`` this equals the mod-2^64 wrap a uint64 engine
    would apply, so any implementation agrees)."""
    h1 = _md5_low64(term)
    h2 = _md5_low64("2:" + term) | 1
    return [(h1 + i * h2) % bits for i in range(k)]


def build_term_bloom(
    index_dir: str,
    *,
    field: str = "body",
    bits: int = _BLOOM_BITS,
    k: int = _BLOOM_K,
) -> "np.ndarray":
    """One shard's term-membership Bloom filter from its termstats store —
    a METADATA pass (vocabulary rows only; no posting list opened), cached
    next to ``stats.json`` (atomic rename) so repeat calls are one mmap.
    Returns a uint8 0/1 array of length ``bits`` (512 B packed at the
    default size — thousands of shards fit in any broker's memory)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..state.index_layout import termstats_dir

    cache = os.path.join(index_dir, f"term_bloom_{field}_{bits}_{k}.npy")
    if os.path.exists(cache):
        return np.load(cache)
    bloom = np.zeros(bits, dtype=np.uint8)
    tdir = termstats_dir(index_dir)
    for fn in sorted(os.listdir(tdir)):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(tdir, fn), columns=["field", "term"])
        terms = t.filter(
            __import__("pyarrow").compute.equal(t["field"], field)
        )["term"].to_pylist()
        for term in terms:
            bloom[term_bloom_positions(term, bits=bits, k=k)] = 1
    tmp = cache + ".tmp"
    np.save(tmp, bloom)
    os.replace(tmp + ".npy" if os.path.exists(tmp + ".npy") else tmp, cache)
    return bloom


def bloom_probe(bloom: "np.ndarray", term: str, *, k: int = _BLOOM_K) -> bool:
    """True iff the shard MIGHT contain the term (no false negatives)."""
    return bool(bloom[term_bloom_positions(term, bits=len(bloom), k=k)].all())


def bloom_route(
    blooms: dict[str, "np.ndarray"],
    terms: list[str],
    *,
    mode: str = "any",
    k: int = _BLOOM_K,
) -> list[str]:
    """Shards worth querying: ``mode='any'`` (disjunctive queries — a shard
    matters if any term might be present) or ``'all'`` (conjunctive — every
    term must pass). Skipped shards are PROVEN true negatives, so routed
    results equal the full fan-out exactly."""
    pred = any if mode == "any" else all
    return [
        name
        for name in sorted(blooms)
        if pred(bloom_probe(blooms[name], t, k=k) for t in terms)
    ]
