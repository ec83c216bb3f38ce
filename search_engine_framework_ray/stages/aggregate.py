"""Aggregation helpers for wide (shuffling) steps.

Two scale patterns (SURVEY.md §4, north_rule skew requirement):

* :func:`pre_aggregate_sum` — combiner inside ``map_batches``: collapse each
  batch to one row per key *before* the shuffle, so the ``groupby`` moves
  partial sums instead of raw rows.
* :func:`salted_groupby_sum` — two-stage reduce for heavy-hitter keys: stage 1
  groups by ``(keys…, salt)`` so one hot key (a Zipf-head term like "http")
  spreads over ``num_salts`` reducers; stage 2 re-reduces the ≤ ``num_salts``
  partials per key. Associative sums only, so the re-combine is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset
from ray.data.aggregate import Sum


def pre_aggregate_sum(ds: Dataset, keys: list[str], sums: list[str]) -> Dataset:
    """Per-batch partial sums (one output row per key per batch)."""

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(keys, as_index=False, sort=False)[sums].sum()

    return ds.map_batches(combine, batch_format="pandas")


def salted_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sums: list[str],
    salt_col: str = "salt",
    pre_aggregate: bool = True,
) -> Dataset:
    """Exact grouped sum with heavy-hitter salting.

    ``ds`` must carry an integer ``salt_col`` (any value that differs across
    the rows of a hot key — e.g. source shard id % H). Result has ``keys`` +
    ``sums`` columns (salt removed).
    """
    if pre_aggregate:
        ds = pre_aggregate_sum(ds, keys + [salt_col], sums)
    aggs = [Sum(c, alias_name=c) for c in sums]
    stage1 = ds.groupby(keys + [salt_col]).aggregate(*aggs)
    stage2 = stage1.groupby(keys).aggregate(*aggs)
    return stage2


# ----------------------------------------------------------------------------
# exact global quantiles via histogram-refine selection (bounded memory)
# ----------------------------------------------------------------------------


def exact_quantiles(
    ds: Dataset,
    col: str,
    qs: list[float],
    *,
    n_bins: int = 4096,
    final_bound: int = 65_536,
    max_refine: int = 6,
) -> pd.DataFrame:
    """EXACT global quantiles of a numeric column WITHOUT any task ever
    holding the column: iterative histogram-refine selection (the
    distributed k-th-smallest classic). Quantile q = the 0-based rank
    ``floor(q·(n−1))`` order statistic — the engine-agnostic definition
    the repo's rank-quantile SQL oracles use (``ORDER BY … OFFSET k``).

    Per round, ONE streaming pass histograms every still-active rank's
    bracket into ``n_bins`` equi-width bins (per-batch ``searchsorted``,
    O(n_bins·|qs|) partial rows to the driver), tracking each bin's
    actual value min/max; the next bracket SNAPS to the chosen bin's
    value range (adaptive, ≥ n_bins× shrink per round), and a bin whose
    min == max IS the answer — so duplicate mass (90% of a column equal)
    resolves in one round instead of defeating equi-width refinement.
    When a bracket's population ≤ ``final_bound``, a last filtered pass
    pulls just those values for the exact pick. Rows with NaN are
    excluded (SQL NULL-comparison parity).

    Contrast: :func:`~.window.rank quantiles` / the events_quantiles
    entry sort ONE KEY GROUP in a task (fine while a key's rows fit a
    worker); this is the global/unbounded-key-free path — memory is
    O(n_bins·|qs|) per task regardless of corpus size.
    """
    import numpy as np

    def mm_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"lo": [], "hi": [], "n": []})
        return pd.DataFrame(
            {"lo": [v.min()], "hi": [v.max()], "n": [len(v)]}
        )

    def mm_combine(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return pd.DataFrame(
            {"lo": [b["lo"].min()], "hi": [b["hi"].max()], "n": [b["n"].sum()]}
        )

    # combine level: O(16) rows to the driver at any corpus block count
    # (min/max/int-count merge is exact — order-independent)
    mm = (
        ds.map_batches(mm_partial, batch_format="pandas")
        .repartition(16)  # split/merge move, not a shuffle
        .map_batches(mm_combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    if not len(mm) or mm["n"].sum() == 0:
        return pd.DataFrame({"q": qs, "value": np.nan, "n": 0})
    n_total = int(mm["n"].sum())
    glo, ghi = float(mm["lo"].min()), float(mm["hi"].max())

    # state per quantile: bracket [a, b], rank r within values in [a, b]
    # (values < a are already accounted). Bracket intervals are half-open
    # [a, b) except the global top, which is closed via a tiny epsilon on b.
    state = []
    for q in qs:
        k = int(np.floor(q * (n_total - 1)))
        state.append(
            {"q": q, "a": glo, "b": np.nextafter(ghi, np.inf), "r": k,
             "m": n_total, "value": None}
        )

    for _round in range(max_refine):
        active = [s for s in state if s["value"] is None and s["m"] > final_bound]
        if not active:
            break
        edge_list = []
        for s in active:
            if s["a"] == s["b"] or np.nextafter(s["a"], np.inf) >= s["b"]:
                s["value"] = s["a"]  # bracket collapsed to one float
                continue
            edge_list.append(np.linspace(s["a"], s["b"], n_bins + 1))
        active = [s for s in active if s["value"] is None]
        if not active:
            break
        # plain-value capture only: (bracket, edges) tuples by index — the
        # state dicts stay driver-side (worker copies would have new ids)
        plan = [
            (s["a"], s["b"], e) for s, e in zip(active, edge_list)
        ]

        def hist_partial(b: pd.DataFrame, plan=plan):
            v = b[col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            rows = {"qi": [], "bin": [], "cnt": [], "vmin": [], "vmax": []}
            for qi, (a, hi_b, e) in enumerate(plan):
                w = v[(v >= a) & (v < hi_b)]
                if not len(w):
                    continue
                idx = np.clip(np.searchsorted(e, w, side="right") - 1, 0, n_bins - 1)
                binc = np.bincount(idx, minlength=n_bins)
                bmin = np.full(n_bins, np.inf)
                bmax = np.full(n_bins, -np.inf)
                np.minimum.at(bmin, idx, w)
                np.maximum.at(bmax, idx, w)
                nz = np.nonzero(binc)[0]
                rows["qi"].extend([qi] * len(nz))
                rows["bin"].extend(nz.tolist())
                rows["cnt"].extend(binc[nz].tolist())
                rows["vmin"].extend(bmin[nz].tolist())
                rows["vmax"].extend(bmax[nz].tolist())
            return pd.DataFrame(rows)

        def hist_combine(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return b
            return b.groupby(["qi", "bin"], as_index=False, sort=False).agg(
                cnt=("cnt", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max")
            )

        # distributed combine level caps the driver pull at
        # O(reduce_width · n_bins · |qs|) rows at any corpus block count
        # (the per-batch partials alone grow with the batch count)
        hist = (
            ds.map_batches(hist_partial, batch_format="pandas")
            .repartition(16)  # split/merge move, not a shuffle
            .map_batches(hist_combine, batch_format="pandas", batch_size=None)
            .to_pandas()
        )
        for qi, s in enumerate(active):
            h = hist[hist["qi"] == qi].groupby("bin").agg(
                cnt=("cnt", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max")
            )
            counts = np.zeros(n_bins, dtype=np.int64)
            counts[h.index.to_numpy()] = h["cnt"].to_numpy()
            cum = np.cumsum(counts)
            b_idx = int(np.searchsorted(cum, s["r"] + 1, side="left"))
            below = int(cum[b_idx - 1]) if b_idx > 0 else 0
            s["r"] -= below
            s["m"] = int(counts[b_idx])
            vmin = float(h.loc[b_idx, "vmin"])
            vmax = float(h.loc[b_idx, "vmax"])
            if vmin == vmax:
                # the chosen bin holds ONE distinct value (duplicate mass)
                s["value"] = vmin
            else:
                # adaptive shrink: snap the bracket to the bin's actual
                # value range, not its equi-width edges
                s["a"], s["b"] = vmin, float(np.nextafter(vmax, np.inf))

    # final exact pick per unresolved quantile: pull only the bracket
    unresolved = [s for s in state if s["value"] is None]
    if unresolved:
        if any(s["m"] > final_bound for s in unresolved):
            worst = max(s["m"] for s in unresolved)
            raise ValueError(
                f"exact_quantiles: a bracket still holds {worst:,} rows after "
                f"{max_refine} refine rounds (bound {final_bound:,}) — raise "
                f"max_refine/n_bins, or the column is pathologically "
                f"adversarial to equi-width refinement."
            )

        def in_bracket(b: pd.DataFrame, unresolved=unresolved):
            v = b[col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            rows = {"qi": [], "v": []}
            for qi, s in enumerate(unresolved):
                w = v[(v >= s["a"]) & (v < s["b"])]
                rows["qi"].extend([qi] * len(w))
                rows["v"].extend(w.tolist())
            return pd.DataFrame(rows)

        vals = ds.map_batches(in_bracket, batch_format="pandas").to_pandas()
        for qi, s in enumerate(unresolved):
            w = np.sort(vals.loc[vals["qi"] == qi, "v"].to_numpy(np.float64))
            s["value"] = float(w[s["r"]])

    return pd.DataFrame(
        {
            "q": [s["q"] for s in state],
            "value": [s["value"] for s in state],
            "n": n_total,
        }
    )


# ----------------------------------------------------------------------------
# pivot (long -> wide conditional counts) and latest-by-key compaction
# ----------------------------------------------------------------------------


def pivot_counts(
    ds: Dataset,
    *,
    key: str,
    cat_col: str,
    categories: list[str],
    n_buckets: int = 64,
) -> Dataset:
    """Pivot a categorical column into per-key count columns
    (``n_<category>`` int64 each) — the conditional-aggregation pivot
    ``count(*) FILTER (WHERE cat = …)``.

    ``categories`` is the FIXED output column set (pivots need a schema
    known up front; values outside the list are dropped, and that is the
    documented contract — discover the set with ``Dataset.unique`` first
    when it isn't known). Per-batch crosstab combiners collapse each
    batch to ≤ |keys-in-batch| narrow rows before ONE coarse key-hash
    bucket shuffle; a Zipf-hot key contributes ≤ n_batches partial rows,
    never its events.
    """
    from .join import coarse_bucket as _coarse_bucket

    cols = [f"n_{c}" for c in categories]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {key: pd.Series(dtype=b[key].dtype if len(b.columns) else "object"),
             **{c: pd.Series(dtype="int64") for c in cols},
             "_bkt": pd.Series(dtype="int64")}
        )
        if not len(b):
            return empty
        ct = pd.crosstab(b[key], b[cat_col])
        ct = ct.reindex(columns=list(categories), fill_value=0)
        ct.columns = cols
        ct = ct.reset_index().rename(columns={ct.index.name or "index": key})
        for c in cols:
            ct[c] = ct[c].fillna(0).astype("int64")
        ct["_bkt"] = _coarse_bucket([ct[key]], n_buckets)
        return ct

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key, sort=False)[cols].sum().reset_index()
        for c in cols:
            s[c] = s[c].astype("int64")
        return s

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(merge, batch_format="pandas")
    )


def latest_by_key(
    ds: Dataset,
    *,
    key: str,
    order_cols: list[tuple[str, bool]],
    n_buckets: int = 64,
) -> Dataset:
    """Keep exactly one row per key: the FIRST row under ``order_cols``
    (``[(col, ascending), …]`` — pass descending timestamps for
    keep-latest). The CDC / snapshot-compaction upsert: "latest crawl of
    each url" is ``latest_by_key(key="url", order_cols=[("warc_ts",
    False)])``.

    The winner under a total order is associative (the winner of a union
    is the winner among partition winners), so each batch combines to
    ≤ |keys-in-batch| rows before ONE coarse key-hash bucket shuffle and
    the per-bucket finalize replays the same sort+first vectorized.
    ``order_cols`` must be a total order per key (include a unique id as
    the last column) or ties fall to an unspecified-but-deterministic
    mergesort order within one run.
    """
    from .join import coarse_bucket as _coarse_bucket

    by = [c for c, _ in order_cols]
    asc = [a for _, a in order_cols]

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            b = b.copy()
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        out = (
            b.sort_values([key] + by, ascending=[True] + asc, kind="mergesort")
            .drop_duplicates(key, keep="first")
            .copy()
        )
        out["_bkt"] = _coarse_bucket([out[key]], n_buckets)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns=["_bkt"])
            .sort_values([key] + by, ascending=[True] + asc, kind="mergesort")
            .drop_duplicates(key, keep="first")
            .reset_index(drop=True)
        )

    return (
        ds.map_batches(pick, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(finish, batch_format="pandas")
    )


def grouped_concat(
    ds: Dataset,
    *,
    key: str,
    order_cols: list[str],
    val_col: str,
    sep: str = ",",
    hot_key_bound: int | None = None,
) -> Dataset:
    """Ordered per-key string aggregation — ``string_agg(val, sep ORDER
    BY …)``: e.g. each user's event-type path in time order.

    Concatenation is ordered, so rows (not partials) cross ONE coarse
    key-hash bucket shuffle and the in-bucket finalize sorts once and
    joins per key with a C-level pandas groupby-agg (no Python per-key
    loop over singleton Ray groups). A key's rows must fit one task;
    ``check_sizes`` fails loudly with the time-slice remedy (segments
    concatenate associatively once each carries its first order key).
    """
    from .join import check_sizes as _check_sizes
    from .join import coarse_bucket as _coarse_bucket

    def route(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key, *order_cols, val_col]].copy()
        if not len(b):
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = _coarse_bucket([b[key]])
        return b

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        _check_sizes(g[key].value_counts(), key, hot_key_bound)
        g = g.sort_values([key, *order_cols], kind="mergesort")
        s = g.groupby(key, sort=False)[val_col].agg(sep.join)
        return pd.DataFrame({key: s.index.to_numpy(), "path": s.to_numpy(object)})

    return (
        ds.map_batches(route, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(finish, batch_format="pandas")
    )


def rollup_counts(
    ds: Dataset,
    *,
    keys: list[str],
    micros_col: str,
    total_label: str = "(all)",
) -> pd.DataFrame:
    """Hierarchical ROLLUP totals: one row per finest ``keys`` group plus
    subtotal rows per prefix level up to the grand total, with
    ``total_label`` standing in for the rolled-up key (exact-hashable —
    no NULL-ordering ambiguity between engines).

    Additive aggregates roll up exactly from the finest level, so the
    corpus is touched ONCE: per-batch combiners collapse each batch to
    one row per finest group, one narrow groupby merges them, and the
    subtotal levels are derived from that (small) finest table — at
    cluster scale each level is another tiny groupby over |groups| rows,
    never a second corpus pass. ``micros_col`` must be integer
    (quantize floats first; int sums are order-independent).
    """

    pre = pre_aggregate_sum(ds.map_batches(
        lambda b: b[keys + [micros_col]].assign(n=np.int64(1))
        if len(b) else b.assign(n=pd.Series(dtype="int64")),
        batch_format="pandas",
    ), keys, [micros_col, "n"])
    finest = (
        pre.groupby(keys[0])
        .map_groups(
            lambda g: g.groupby(keys, as_index=False, sort=False)[
                [micros_col, "n"]
            ].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    levels = [finest]
    for lvl in range(len(keys) - 1, -1, -1):
        sub = finest.groupby(keys[:lvl], as_index=False, sort=False)[
            [micros_col, "n"]
        ].sum() if lvl else pd.DataFrame(
            {micros_col: [finest[micros_col].sum()], "n": [finest["n"].sum()]}
        )
        for k in keys[lvl:]:
            sub[k] = total_label
        levels.append(sub[keys + [micros_col, "n"]])
    out = pd.concat(levels, ignore_index=True)
    out[micros_col] = out[micros_col].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(keys + ["n"]).reset_index(drop=True)


def skew_report(
    ds: Dataset,
    key: str,
    *,
    n_buckets: int = 256,
) -> pd.DataFrame:
    """Shuffle-key skew diagnostics → ONE row (n_keys, total, max_cnt,
    p50_cnt, p99_cnt, gini_micros) — the pre-flight check before choosing
    a groupby/join key (north_rule: "skewed keys hurt"): a Gini near 1 or
    p99/p50 ≫ 1 says salt the key or pre-combine before shuffling.

    Exact, never the key table on the driver: per-batch partial key counts
    → one bucketed key reduce (narrow (key, cnt) rows) → counts grouped BY
    COUNT VALUE into a (value, freq) histogram — Zipf-sized (distinct
    count values, not distinct keys) — from which driver arithmetic
    recovers the exact order statistics and the exact Gini: a run of f
    equal counts v occupying global ranks [r+1, r+f] contributes
    v·Σranks = v·(f·r + f(f+1)/2) to Σ rank·cnt, so
    ``G = (2·Σ rank·cnt − (n+1)·total) / (n·total)``.
    """
    import numpy as np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False).size().rename(columns={"size": "cnt"})
        g["_bkt"] = pd.util.hash_array(g[key].to_numpy()) % n_buckets
        return g

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        k = g.groupby(key, as_index=False)["cnt"].sum()
        # collapse to the per-bucket count histogram immediately — the
        # bucket's key list never leaves the task
        return (
            k.groupby("cnt", as_index=False).size().rename(columns={"size": "freq"})
        )

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(per_key, batch_format="pandas")
        .to_pandas()
        .groupby("cnt", as_index=False)["freq"]
        .sum()
        .sort_values("cnt")
        .reset_index(drop=True)
    )
    v = hist["cnt"].to_numpy(np.int64)
    f = hist["freq"].to_numpy(np.int64)
    n = int(f.sum())
    total = int((v * f).sum())
    # Σ rank·cnt over ascending ranks, runs of equal counts in closed form
    r0 = np.concatenate([[0], np.cumsum(f)[:-1]])
    s_rank = int((v * (f * r0 + f * (f + 1) // 2)).sum())
    gini = (2.0 * s_rank - (n + 1.0) * total) / (n * total) if n and total else 0.0
    cum = np.cumsum(f)

    def at(q: float) -> int:
        r = max(1, int(np.ceil(q * n)))
        return int(v[np.searchsorted(cum, r)])

    return pd.DataFrame(
        {
            "n_keys": [n],
            "total": [total],
            "max_cnt": [int(v[-1]) if n else 0],
            "p50_cnt": [at(0.5) if n else 0],
            "p99_cnt": [at(0.99) if n else 0],
            "gini_micros": [int(np.floor(abs(gini) * 1e6 + 0.5)) * (1 if gini >= 0 else -1)],
        }
    )


def profile_table(
    ds: Dataset,
    cols: list[str],
    *,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """ANALYZE-style table profile → one row per column:
    (col, n, n_null, ndv, min_v, max_v) with min/max rendered as strings
    (one output schema across column types). The footer-stats pass every
    engine runs before planning: null fractions, exact distinct counts,
    value bounds.

    Scale shape: ONE streaming pass computes per-batch (n, n_null, min,
    max) partials (|cols| rows per batch) AND per-batch DISTINCT (col,
    value) pairs; the pairs reduce through one bucketed groupby per-value
    dedup, then collapse to per-bucket ndv partial counts (≤ n_buckets·
    |cols| rows to the driver — the value sets never leave the cluster).
    Exact ndv costs a narrow shuffle of distinct values by construction;
    swap in the KMV sketch (`stages/sketch.py`) when an estimate is
    enough at 100 TB.
    """
    import numpy as np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # min/max stay TYPED through the cross-batch reduce (string-min of
        # int partials would order "10" < "9"): numeric columns ride a
        # nullable-Int64 lane (NOT float64 — ids ≥ 2^53 would corrupt),
        # string columns a string lane; rendered to one schema at the end
        rows = []
        for c in cols:
            s = b[c]
            nn = s.isna()
            sv = s[~nn]
            num = pd.api.types.is_integer_dtype(s)
            rows.append(
                {
                    "col": c,
                    "n": len(s),
                    "n_null": int(nn.sum()),
                    "min_i": int(sv.min()) if num and len(sv) else None,
                    "max_i": int(sv.max()) if num and len(sv) else None,
                    "min_s": None if num else (str(sv.min()) if len(sv) else None),
                    "max_s": None if num else (str(sv.max()) if len(sv) else None),
                }
            )
        out = pd.DataFrame(rows)
        out["min_i"] = out["min_i"].astype("Int64")
        out["max_i"] = out["max_i"].astype("Int64")
        return out

    def dpairs(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c in cols:
            u = b[c].dropna().unique()
            outs.append(pd.DataFrame({"col": c, "v": pd.Series(u).astype(str)}))
        out = pd.concat(outs, ignore_index=True)
        out["_bkt"] = pd.util.hash_array(out["v"].to_numpy(object)) % n_buckets
        return out

    def bucket_ndv(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop_duplicates(["col", "v"])
            .groupby("col", as_index=False)
            .size()
            .rename(columns={"size": "ndv"})
        )

    stats = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("col")
        .agg(
            n=("n", "sum"),
            n_null=("n_null", "sum"),
            min_i=("min_i", "min"),
            max_i=("max_i", "max"),
            # object-lane min/max must SKIP the numeric columns' None/NaN
            # rows (str vs nan comparison raises)
            min_s=("min_s", lambda s: s.dropna().min() if s.notna().any() else None),
            max_s=("max_s", lambda s: s.dropna().max() if s.notna().any() else None),
        )
    )
    stats["min_v"] = stats.apply(
        lambda r: str(r["min_i"]) if pd.notna(r["min_i"]) else r["min_s"], axis=1
    )
    stats["max_v"] = stats.apply(
        lambda r: str(r["max_i"]) if pd.notna(r["max_i"]) else r["max_s"], axis=1
    )
    ndv = (
        ds.map_batches(dpairs, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(bucket_ndv, batch_format="pandas")
        .to_pandas()
        .groupby("col")["ndv"]
        .sum()
    )
    out = stats.join(ndv).reset_index()
    out["ndv"] = out["ndv"].fillna(0).astype(np.int64)
    for c in ("n", "n_null"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["col", "n", "n_null", "ndv", "min_v", "max_v"]]
        .sort_values("col")
        .reset_index(drop=True)
    )


def merge_agg_state(
    base_agg: Dataset,
    delta: Dataset,
    keys: list[str],
    sums: list[str],
) -> Dataset:
    """Incremental aggregate maintenance for additive aggregates (SUM /
    COUNT carried as a sum column): refresh a materialized grouped
    aggregate with new rows WITHOUT rescanning the base data — union the
    existing per-key state with the delta's per-batch partials and
    re-reduce. Cost is O(|state| + |delta|), not O(|base data|): the
    streaming-view maintenance pattern (classic incremental view
    maintenance; additive aggs compose associatively so the merged state
    is exactly the from-scratch aggregate).

    ``base_agg`` must already be one row per key with ``sums`` columns
    (e.g. the previous run's output, read back from its sink); ``delta``
    is raw rows carrying ``keys`` + ``sums``."""
    from ray.data.aggregate import Sum

    parts = pre_aggregate_sum(delta, keys, sums).union(
        base_agg.select_columns(keys + sums)
    )
    aggs = [Sum(c, alias_name=c) for c in sums]
    return parts.groupby(keys).aggregate(*aggs)


def vocab_growth(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 50,
) -> pd.DataFrame:
    """Vocabulary-growth curve (Heaps'-law measurement for tokenizer /
    vocab sizing): cumulative count of DISTINCT whitespace tokens after
    each ``bucket_size``-doc checkpoint of the corpus, in ``id_col``
    order.

    Distributed shape: a token first contributes to the curve at the
    checkpoint of its FIRST document, so the whole computation is one
    min-reduce per token — per-batch combiner collapses each batch to one
    ``(tok, min_bucket)`` row per distinct token, the ``groupby(tok)``
    min-reduce moves at most |vocab| narrow int rows per batch, the
    per-first-bucket counts are ≤ n_buckets rows, and the cumulative sum
    happens on the driver over that tiny table. Tokens travel as
    md5-low64 hashes (count-preserving; the SQL oracle counts the string
    tokens directly). No corpus-sized shuffle anywhere."""
    from .dedup import _md5_hash64
    from .textstats import RE2_TOKEN_RE

    def first_bucket(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[np.ndarray] = []
        bkts: list[np.ndarray] = []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            ws = set(RE2_TOKEN_RE.findall(t))
            if not ws:
                continue
            h = np.fromiter(
                (_md5_hash64(w) for w in ws), dtype=np.uint64, count=len(ws)
            )
            toks.append(h.view(np.int64))
            bkts.append(np.full(len(ws), int(i) // bucket_size, dtype=np.int64))
        if not toks:
            return pd.DataFrame(
                {"tok": pd.Series(dtype="int64"),
                 "bkt": pd.Series(dtype="int64")}
            )
        out = pd.DataFrame(
            {"tok": np.concatenate(toks), "bkt": np.concatenate(bkts)}
        )
        # batch-level combiner: one (tok, min bkt) row per distinct token
        return out.groupby("tok", as_index=False)["bkt"].min()

    # bucketed-vectorized min-reduce: Ray's named Min aggregate pays
    # per-group overhead across |vocab| groups (measured: 1M docs / 200k
    # vocab never finished in 10 min); hashing tokens into 256 buckets and
    # reducing each bucket with ONE pandas groupby-min runs the same
    # reduce vectorized.
    from .join import int_bucket

    def add_gb(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(gb=int_bucket(b["tok"].to_numpy(np.int64)))

    def bucket_min_count(g: pd.DataFrame) -> pd.DataFrame:
        fb = g.groupby("tok")["bkt"].min()
        vc = fb.value_counts()
        return pd.DataFrame(
            {"bucket": vc.index.to_numpy(np.int64),
             "new_terms": vc.to_numpy(np.int64)}
        )

    per = (
        ds.map_batches(first_bucket, batch_format="pandas")
        .map_batches(add_gb, batch_format="pandas")
        .groupby("gb")
        .map_groups(bucket_min_count, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("new_terms", alias_name="new_terms"))
        .to_pandas()
    )
    per = per.sort_values("bucket").reset_index(drop=True)
    per["bucket"] = per["bucket"].astype("int64")
    per["new_terms"] = per["new_terms"].astype("int64")
    per["vocab_size"] = per["new_terms"].cumsum().astype("int64")
    return per
