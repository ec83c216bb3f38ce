"""Temporal joins Ray Data lacks natively — expressed as compositions of
``map_batches`` + one ``groupby(by).map_groups`` shuffle (the brief's
custom-operator recipe (a)).

:func:`asof_join` — for each left row, attach the LATEST right row whose
``on`` value is ≤ the left's (``direction="backward"``; ``"forward"`` =
earliest ≥), within the same ``by`` key.

Partitioning assumption (documented per the brief): both sides are
co-partitioned by ``by`` through ONE shuffle of the tagged union; per-key
row counts must fit a worker (true for per-user/per-symbol streams). A
pathologically hot key is DETECTED (:func:`check_hot_key`) and fails loudly
with the salting remedy rather than OOMing the worker silently. The
in-group kernel is ``pandas.merge_asof`` (vectorized
galloping merge), not a Python loop. Equal-``on`` ties resolve to the
highest-sorted right row (right sorted by ``(on, *value cols)``),
deterministic and matched by the SQL oracle's ``ORDER BY on DESC, id DESC
LIMIT 1`` lateral.

Dtype note: the tagged union needs one schema across both sides; integer
payload columns travel as NULLABLE ``Int64`` (not float64 — that would
silently corrupt ids ≥ 2^53), timestamps as ``datetime64[us]``; cast back
to plain int64 downstream if needed (the driver entry does).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

# Per-key group row bound for the temporal operators (as-of / range joins,
# session windows). These kernels hold ONE key's rows in a task heap; a
# pathologically hot key (one user with a billion events) would otherwise OOM
# the worker silently. 5M rows ≈ a few hundred MB for typical event schemas.
HOT_KEY_ROW_BOUND = 5_000_000


def check_hot_key(g: pd.DataFrame, by: str, bound: int | None) -> None:
    """Fail LOUDLY (with the remedy) when a key group exceeds the bound —
    the documented alternative to silent worker OOM. Remedy: these kernels
    compose associatively across time slices, so a hot key can be salted by
    shuffling on ``(key, ts_bucket)``, running the kernel per slice, and
    merging the two boundary groups per slice pair."""
    bound = HOT_KEY_ROW_BOUND if bound is None else bound
    if len(g) > bound:
        raise ValueError(
            f"hot key {g[by].iloc[0]!r}: {len(g):,} rows in one group exceed "
            f"the per-key bound {bound:,}. Salt the key — shuffle on "
            f"(key, time-slice), run the per-group kernel per slice, merge "
            f"slice-boundary results — or raise the bound (hot_key_bound=…/"
            f"join.HOT_KEY_ROW_BOUND) if one worker can hold the group."
        )


_COARSE_BUCKETS = 64


def coarse_bucket(cols: list[pd.Series], n: int = _COARSE_BUCKETS) -> np.ndarray:
    """Deterministic routing hash over one or more key columns — key groups
    stay whole (all rows of a key tuple share a bucket), but one Ray
    map_groups group holds MANY key tuples, so Ray's per-group dispatch
    cost is paid n-buckets times instead of n-keys times. Measured: per-key
    dispatch over ~1M mostly-singleton sparse-key groups was 8× the whole
    salted-session stage on 3M events; bucketed+vectorized it vanishes."""
    h = pd.util.hash_array(cols[0].to_numpy().astype(object))
    for c in cols[1:]:
        h = h ^ (
            pd.util.hash_array(c.to_numpy().astype(object))
            * np.uint64(0x9E3779B97F4A7C15)
        )
    return (h % np.uint64(n)).astype(np.int64)


def int_bucket(a: np.ndarray, n: int = 256) -> np.ndarray:
    """:func:`coarse_bucket` for a single int64 key, without the
    object-boxing cost (hash_array on astype(object) boxes every value —
    measurable on corpus-sized token streams): one Fibonacci multiply over
    the uint64 bit pattern. Used by the bucketed-vectorized reduces in
    stages/setsim.py and stages/aggregate.py."""
    with np.errstate(over="ignore"):
        h = (
            np.ascontiguousarray(a, dtype=np.int64).astype(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        ) >> np.uint64(32)
    return (h % np.uint64(n)).astype(np.int64)


def check_sizes(sizes: pd.Series, key: str, bound: int | None) -> None:
    """Vectorized per-key bound check for bucketed kernels (same contract
    as :func:`check_hot_key`, evaluated from a descending size Series)."""
    bound = HOT_KEY_ROW_BOUND if bound is None else bound
    if len(sizes) and int(sizes.iloc[0]) > bound:
        raise ValueError(
            f"hot key {sizes.index[0]!r}: {int(sizes.iloc[0]):,} rows in one "
            f"group exceed the per-key bound {bound:,}. Salt the key "
            f"(salt_slice_s=…) or raise the bound (hot_key_bound=…)."
        )


def _kind(t) -> str:
    """Transport kind from a schema type — pyarrow (parquet-backed
    datasets) OR numpy/pandas dtype (``Dataset.schema()`` of a
    pandas-block dataset, e.g. after a ``map_batches`` chain)."""
    if isinstance(t, pa.DataType):
        if pa.types.is_timestamp(t):
            return "ts"
        if pa.types.is_integer(t):
            return "int"  # nullable Int64 — float64 would corrupt ids ≥ 2^53
        if pa.types.is_floating(t) or pa.types.is_boolean(t):
            return "num"
        return "obj"
    if pd.api.types.is_datetime64_any_dtype(t):
        return "ts"
    if pd.api.types.is_integer_dtype(t):
        return "int"
    if pd.api.types.is_float_dtype(t) or pd.api.types.is_bool_dtype(t):
        return "num"
    return "obj"


def _null_series(n: int, kind: str) -> pd.Series:
    if kind == "ts":
        return pd.Series(pd.NaT, index=range(n), dtype="datetime64[us]")
    if kind == "int":
        return pd.Series(pd.NA, index=range(n), dtype="Int64")
    if kind == "num":
        return pd.Series(np.nan, index=range(n), dtype="float64")
    return pd.Series([None] * n, index=range(n), dtype="object")


def _cast(s: pd.Series, kind: str) -> pd.Series:
    if kind == "ts":
        return s.astype("datetime64[us]")
    if kind == "int":
        return s.astype("Int64")
    if kind == "num":
        return s.astype("float64")
    return s.astype("object")


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    by: str,
    on: str = "ts",
    direction: str = "backward",
    right_prefix: str = "r_",
    hot_key_bound: int | None = None,
    salt_slice_s: int | None = None,
) -> Dataset:
    """Inner as-of join → Dataset with all left columns + prefixed right
    columns (left rows with no eligible right row are dropped).

    ``salt_slice_s`` enables the HOT-KEY path (``on`` must be a timestamp):
    both sides shuffle on ``(key, time-slice)`` instead of ``key``, and each
    probe slice additionally receives ONE carry-in right row — the latest
    right row of the nearest earlier occupied slice (backward; symmetric
    for forward). Slices partition the ``on`` axis, so the in-slice
    ``merge_asof`` with that carry-in reproduces the single-group result
    BIT-IDENTICALLY: a probe either matches an in-slice right row or the
    carry-in, which is exactly the global predecessor. Carry-in selection
    per slice pair is the same ``(on, *value-cols)`` tie sort the kernel
    uses, so ties resolve identically."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    ls, rs = left.schema(), right.schema()
    lkind = {c: _kind(t) for c, t in zip(ls.names, ls.types)}
    rkind = {c: _kind(t) for c, t in zip(rs.names, rs.types)}
    lcols = list(ls.names)
    r_out = [c for c in rs.names if c not in (by, on)]
    pref = [right_prefix + c for c in r_out] + [right_prefix + on]
    prefkind = {right_prefix + c: rkind[c] for c in r_out}
    prefkind[right_prefix + on] = rkind[on]
    cols = [*lcols, "_side", *pref]

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=range(len(b)))
        for c in lcols:
            out[c] = _cast(b[c].reset_index(drop=True), lkind[c])
        out["_side"] = "L"
        for c in pref:
            out[c] = _null_series(len(b), prefkind[c])
        return out[cols]

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        out = pd.DataFrame(index=range(n))
        for c in lcols:
            if c == by:
                out[c] = _cast(b[by].reset_index(drop=True), lkind[by])
            elif c == on:
                out[c] = _cast(b[on].reset_index(drop=True), lkind[on])
            else:
                out[c] = _null_series(n, lkind[c])
        out["_side"] = "R"
        for c in r_out:
            out[right_prefix + c] = _cast(b[c].reset_index(drop=True), rkind[c])
        out[right_prefix + on] = _cast(b[on].reset_index(drop=True), rkind[on])
        return out[cols]

    both = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    out_cols = [*lcols, *pref]

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        """One COARSE bucket of many keys, matched in ONE vectorized
        ``merge_asof(by=…)`` call (per-key Ray map_groups dispatch was the
        stage at sparse-key scale — see :func:`coarse_bucket`). Globally
        on-sorted frames with the kernel tie-sort as the secondary right
        key preserve the per-key tie semantics exactly: merge_asof matches
        within ``by`` groups in frame order."""
        if not len(g) or "_side" not in g.columns:
            # Ray's sort shuffle can hand map_groups a schema-less empty
            # block; rebuild the output schema with proper dtypes
            return pd.DataFrame(
                {
                    **{c: _null_series(0, lkind[c]) for c in lcols},
                    **{c: _null_series(0, prefkind[c]) for c in pref},
                }
            )
        by_cols = [by] + (["_slice"] if "_slice" in g.columns else [])
        check_sizes(
            g.groupby(by_cols, sort=False).size().sort_values(ascending=False),
            by,
            hot_key_bound,
        )
        l = g[g["_side"] == "L"]
        r = g[g["_side"] == "R"]
        if not len(l) or not len(r):
            return g[out_cols].iloc[0:0]
        lsort = [on] + [c for c in lcols if c not in (by, on)]
        l = l.sort_values(lsort, kind="mergesort")
        r = r.sort_values([on, *pref], kind="mergesort")
        merged = pd.merge_asof(
            l[lcols + by_cols[1:]].reset_index(drop=True),
            r[[*by_cols, on, *pref]].reset_index(drop=True),
            on=on,
            by=by_cols,
            direction=direction,
        )
        merged = merged.dropna(subset=[right_prefix + on])
        return merged[out_cols]

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if by not in b.columns:
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = coarse_bucket([b[by]])
        return b

    if salt_slice_s is None:
        return (
            both.map_batches(add_bkt, batch_format="pandas")
            .groupby("_bkt")
            .map_groups(group_fn, batch_format="pandas")
        )

    # ---- salted hot-key path -------------------------------------------
    if lkind[on] != "ts":
        raise ValueError("salt_slice_s requires a timestamp 'on' column")
    slice_us = salt_slice_s * 1_000_000
    backward = direction == "backward"
    cols_s = [*cols, "_slice"]

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_slice"] = (
            b[on].astype("datetime64[us]").astype("int64") // slice_us
        )
        return b[cols_s]

    # materialized ONCE: consumed by both the carries branch and the final
    # union — left lazy, Ray would replay the whole read+tag lineage twice
    sliced = both.map_batches(add_slice, batch_format="pandas").materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        """Per-batch combiner → candidate boundary rows: the kernel-tie-sort
        extreme RIGHT row per (key, slice) ('R') and the distinct probe
        slices ('P'). Ships ≤ 2·|keys×occupied slices| rows per batch."""
        parts = []
        r = b.loc[b["_side"] == "R"]
        if len(r):
            r = r.sort_values([on, *pref], kind="mergesort")
            grp = r.groupby([by, "_slice"], sort=False)
            parts.append(grp.tail(1) if backward else grp.head(1))
        l = b.loc[b["_side"] == "L"]
        if len(l):
            p = l.drop_duplicates([by, "_slice"]).copy()
            p["_side"] = "P"
            parts.append(p)
        return (
            pd.concat(parts)[cols_s]
            if parts
            else b[cols_s].iloc[0:0]
        )

    def emit_carries(g: pd.DataFrame) -> pd.DataFrame:
        """One COARSE bucket of keys over boundary rows: for each (key,
        probe slice s), re-emit the extreme right row of that key's nearest
        occupied slice strictly before (backward) / after (forward) s,
        retagged into slice s. The inner loop runs only over keys that have
        BOTH right rows and probes — boundary rows, not events."""
        if not len(g) or "_side" not in g.columns:
            return pd.DataFrame(
                {
                    **{c: _null_series(0, lkind[c]) for c in lcols},
                    "_side": pd.Series(dtype="object"),
                    **{c: _null_series(0, prefkind[c]) for c in pref},
                    "_slice": pd.Series(dtype="int64"),
                }
            )
        r = g.loc[g["_side"] == "R"]
        p = g.loc[g["_side"] == "P"]
        if not len(r) or not len(p):
            return g[cols_s].iloc[0:0]
        pmap = {
            k: np.unique(v.to_numpy(dtype=np.int64))
            for k, v in p.groupby(by, sort=False)["_slice"]
        }
        # batches may each contribute a candidate per slice: re-reduce
        r = r.sort_values([on, *pref], kind="mergesort")
        out = []
        for k, rsub in r.groupby(by, sort=False):
            probes = pmap.get(k)
            if probes is None:
                continue
            grp = rsub.groupby("_slice", sort=False)
            rr = (grp.tail(1) if backward else grp.head(1)).sort_values(
                "_slice"
            )
            rslices = rr["_slice"].to_numpy(dtype=np.int64)
            if backward:
                idx = np.searchsorted(rslices, probes, side="left") - 1
                ok = idx >= 0
            else:
                idx = np.searchsorted(rslices, probes, side="right")
                ok = idx < len(rslices)
            if not ok.any():
                continue
            sel = rr.iloc[idx[ok]].copy()
            sel["_slice"] = probes[ok]
            out.append(sel)
        return pd.concat(out)[cols_s] if out else g[cols_s].iloc[0:0]

    def add_key_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if by not in b.columns:
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = coarse_bucket([b[by]])
        return b

    carries = (
        sliced.map_batches(summarize, batch_format="pandas")
        .map_batches(add_key_bkt, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(emit_carries, batch_format="pandas")
    )

    def add_slice_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if by not in b.columns:
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = coarse_bucket([b[by], b["_slice"]])
        return b

    return (
        sliced.union(carries)
        .map_batches(add_slice_bkt, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(group_fn, batch_format="pandas")
    )


def range_join(
    left: Dataset,
    right: Dataset,
    *,
    by: str,
    on: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    right_prefix: str = "r_",
    hot_key_bound: int | None = None,
    salt_slice_s: int | None = None,
) -> Dataset:
    """Interval-containment join: each left row matched to EVERY right
    interval of the same key with ``lo ≤ left.on ≤ hi`` (inner; a left row
    in k intervals yields k rows). Same co-partitioning shape as
    :func:`asof_join`; the in-group kernel sorts events once and uses two
    ``searchsorted`` probes per interval (O(E log E + I log E + matches)),
    no per-row Python loop. Same dtype note as asof_join.

    ``salt_slice_s`` enables the HOT-KEY path (``on``/``lo``/``hi`` must be
    timestamps): probes shuffle on ``(key, time-slice)`` and every interval
    replicates to each slice it overlaps. A probe lives in exactly one
    slice, so every (probe, interval) match surfaces exactly once — the
    salted output is BIT-IDENTICAL with no dedup step. Replication factor
    is ``interval_span / slice + 1``: size the slice to the typical
    interval (e.g. session-length) so the blowup stays ~2×."""
    ls, rs = left.schema(), right.schema()
    lkind = {c: _kind(t) for c, t in zip(ls.names, ls.types)}
    rkind = {c: _kind(t) for c, t in zip(rs.names, rs.types)}
    lcols = list(ls.names)
    r_out = [c for c in rs.names if c != by]
    pref = [right_prefix + c for c in r_out]
    prefkind = {right_prefix + c: rkind[c] for c in r_out}
    cols = [*lcols, "_side", *pref]

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=range(len(b)))
        for c in lcols:
            out[c] = _cast(b[c].reset_index(drop=True), lkind[c])
        out["_side"] = "L"
        for c in pref:
            out[c] = _null_series(len(b), prefkind[c])
        return out[cols]

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        out = pd.DataFrame(index=range(n))
        for c in lcols:
            if c == by:
                out[c] = _cast(b[by].reset_index(drop=True), lkind[by])
            else:
                out[c] = _null_series(n, lkind[c])
        out["_side"] = "R"
        for c in r_out:
            out[right_prefix + c] = _cast(b[c].reset_index(drop=True), rkind[c])
        return out[cols]

    both = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )
    out_cols = [*lcols, *pref]

    def _probe_one(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame | None:
        """Interval probes within ONE key (or key-slice) group: l is
        on-sorted; two searchsorted per interval, no per-row loop."""
        ts = l[on].to_numpy()
        los = r[right_prefix + lo].to_numpy()
        his = r[right_prefix + hi].to_numpy()
        starts = np.searchsorted(ts, los, side="left")
        ends = np.searchsorted(ts, his, side="right")
        counts = (ends - starts).clip(min=0)
        if counts.sum() == 0:
            return None
        l_idx = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, ends) if e > s]
        )
        r_idx = np.repeat(np.arange(len(r)), counts)
        lmat = l.iloc[l_idx][lcols].reset_index(drop=True)
        rmat = r.iloc[r_idx][pref].reset_index(drop=True)
        return pd.concat([lmat, rmat], axis=1)[out_cols]

    def group_fn(g: pd.DataFrame) -> pd.DataFrame:
        """One COARSE bucket of many keys (see :func:`coarse_bucket` — per-
        key Ray dispatch was the stage at sparse-key scale). The inner loop
        runs ONLY over keys that have intervals, probing the key's l
        segment via the groupby index — sparse probe-only keys cost one
        dict lookup, not an iteration."""
        if not len(g) or "_side" not in g.columns:
            # schema-less empty block from the sort shuffle (see asof_join)
            return pd.DataFrame(
                {
                    **{c: _null_series(0, lkind[c]) for c in lcols},
                    **{c: _null_series(0, prefkind[c]) for c in pref},
                }
            )
        by_cols = [by] + (["_slice"] if "_slice" in g.columns else [])
        check_sizes(
            g.groupby(by_cols, sort=False).size().sort_values(ascending=False),
            by,
            hot_key_bound,
        )
        l = g[g["_side"] == "L"]
        r = g[g["_side"] == "R"]
        if not len(l) or not len(r):
            return g[out_cols].iloc[0:0]
        l = l.sort_values(
            by_cols + [on] + [c for c in lcols if c not in (by, on)],
            kind="mergesort",
        )
        # positional index only — building a sub-frame per probe-only key
        # would re-introduce the per-sparse-key cost the bucket avoids.
        # Scalar grouper for a single key: pandas iterates a LIST grouper
        # with 1-tuple keys but builds .indices with scalar keys — mixing
        # them silently misses every lookup
        gb_key = by_cols if len(by_cols) > 1 else by_cols[0]
        lidx = l.groupby(gb_key, sort=False).indices
        out = []
        for k, rsub in r.groupby(gb_key, sort=False):
            pos = lidx.get(k)
            if pos is None:
                continue
            m = _probe_one(l.iloc[pos], rsub)
            if m is not None:
                out.append(m)
        return pd.concat(out)[out_cols] if out else g[out_cols].iloc[0:0]

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if by not in b.columns:
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = coarse_bucket([b[by]])
        return b

    if salt_slice_s is None:
        return (
            both.map_batches(add_bkt, batch_format="pandas")
            .groupby("_bkt")
            .map_groups(group_fn, batch_format="pandas")
        )

    # ---- salted hot-key path: probes sliced, intervals replicated ------
    if not (
        lkind[on] == "ts"
        and rkind[lo] == "ts"
        and rkind[hi] == "ts"
    ):
        raise ValueError("salt_slice_s requires timestamp on/lo/hi columns")
    slice_us = salt_slice_s * 1_000_000
    cols_s = [*cols, "_slice"]

    def _us(s: pd.Series) -> np.ndarray:
        return s.astype("datetime64[us]").astype("int64").to_numpy()

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        l = b.loc[b["_side"] == "L"].copy()
        r = b.loc[b["_side"] == "R"]
        parts = []
        if len(l):
            l["_slice"] = _us(l[on]) // slice_us
            parts.append(l)
        if len(r):
            s0 = _us(r[right_prefix + lo]) // slice_us
            s1 = _us(r[right_prefix + hi]) // slice_us
            counts = (s1 - s0 + 1).clip(min=0)
            if counts.sum() > 0:  # all-degenerate (hi < lo) batch → no rows
                rr = r.iloc[np.repeat(np.arange(len(r)), counts)].copy()
                rr["_slice"] = np.concatenate(
                    [np.arange(a, b_ + 1) for a, b_ in zip(s0, s1) if b_ >= a]
                )
                parts.append(rr)
        return (
            pd.concat(parts)[cols_s] if parts else b.assign(_slice=0)[cols_s].iloc[0:0]
        )

    def add_slice_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if by not in b.columns:
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = coarse_bucket([b[by], b["_slice"]])
        return b

    return (
        both.map_batches(add_slice, batch_format="pandas")
        .map_batches(add_slice_bkt, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(group_fn, batch_format="pandas")
    )


# ----------------------------------------------------------------------------
# Bloom-prefiltered semi / anti join (runtime-filter pattern)
# ----------------------------------------------------------------------------


_BLOOM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _bloom_positions(keys: np.ndarray, bits: int, k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: ``(h1 + i·h2) mod bits``
    (Kirsch & Mitzenmacher 2006 — two hashes simulate k). Keys are hashed
    as int64 (cast both sides identically — hash_array on mixed dtypes
    diverges silently)."""
    h1 = pd.util.hash_array(keys.astype(np.int64))
    with np.errstate(over="ignore"):
        h2 = (h1 * _BLOOM_MULT) | np.uint64(1)
        i = np.arange(k_hashes, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(bits)).astype(
            np.uint64
        )


def bloom_build(
    ds: "Dataset", key: str, *, bits: int = 1 << 20, k_hashes: int = 4
) -> np.ndarray:
    """Build a Bloom filter of the build side's keys: per-batch partial
    word arrays (``bits/8`` bytes per batch — the filter, never the keys,
    crosses the wire) OR-merged through a distributed reduce level before
    the driver, so the driver holds O(reduce_width) filters regardless of
    corpus block count (1M batches × 128 KiB would otherwise be a 128 GB
    driver pull). OR is associative/commutative — any grouping is exact.
    Returns the packed uint64 word array."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(bits // 64, dtype=np.uint64)
        keys = b[key].dropna().to_numpy()
        if len(keys):
            pos = _bloom_positions(keys, bits, k_hashes).ravel()
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pd.DataFrame({"words": [words.tobytes()]})

    def or_rows(b: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(bits // 64, dtype=np.uint64)
        for buf in b["words"]:
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pd.DataFrame({"words": [acc.tobytes()]})

    reduce_width = 16
    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(reduce_width)  # split/merge move, not a shuffle
        .map_batches(or_rows, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    out = np.zeros(bits // 64, dtype=np.uint64)
    for buf in parts["words"]:
        out |= np.frombuffer(buf, dtype=np.uint64)
    return out


def bloom_semi_join(
    probe: "Dataset",
    build: "Dataset",
    *,
    probe_key: str,
    build_key: str,
    anti: bool = False,
    bits: int = 1 << 20,
    k_hashes: int = 4,
    n_buckets: int = 64,
) -> "Dataset":
    """EXACT semi (or anti) join with a broadcast Bloom runtime filter:
    the probe side is pruned BEFORE the shuffle, so the all-to-all moves
    ~|matches| + false-positive rows instead of the whole probe table —
    the runtime-filter pattern production engines use for selective
    star-schema joins.

    * semi: bloom-passing probe rows are verified exactly against the
      build keys in ONE tagged-union key-hash co-partition (false
      positives die there).
    * anti: bloom-FAILING rows are definite non-matches and stream
      straight through with NO shuffle at all; only the passing sliver
      goes through the verify shuffle (kept when it fails the exact
      check). Result is exact either way.
    """
    words = bloom_build(build, build_key, bits=bits, k_hashes=k_hashes)
    import ray

    words_ref = ray.put(words)

    def bloom_test(b: pd.DataFrame, want_pass: bool) -> pd.DataFrame:
        w = ray.get(words_ref)
        keys = b[probe_key].to_numpy()
        pos = _bloom_positions(keys, bits, k_hashes)
        hits = (
            (w[(pos >> np.uint64(6)).astype(np.int64)]
             >> (pos & np.uint64(63))) & np.uint64(1)
        ).all(axis=1)
        return b[hits] if want_pass else b[~hits]

    candidates = probe.map_batches(
        lambda b: bloom_test(b, True), batch_format="pandas"
    )

    # tagged-union transport: integer payload columns travel as NULLABLE
    # Int64 so the build side's NA fill can't upcast them to float64 and
    # silently corrupt ids ≥ 2^53 (the asof-join transport rule); cast
    # back downstream if plain int64 is needed.
    import pyarrow as pa

    _schema = probe.schema()
    probe_names = list(_schema.names)
    _types = dict(zip(_schema.names, _schema.types))

    def _type_kind(t) -> str:
        # ds.schema() yields Arrow types for Arrow blocks but numpy/python
        # dtypes for pandas blocks (e.g. from_pandas) — handle both
        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t):
                return "int"
            if pa.types.is_floating(t):
                return "float"
            if pa.types.is_timestamp(t):
                return "ts"
            return "obj"
        try:
            k = np.dtype(t).kind
        except TypeError:
            return "obj"
        return {"i": "int", "u": "int", "f": "float", "M": "ts"}.get(k, "obj")

    def _placeholder_col(c: str, n: int) -> pd.Series:
        """Typed placeholder column matching the probe schema — avoids
        both the all-NA concat deprecation and object upcasts across the
        union. Build rows never survive verify(), values are irrelevant."""
        kind = _type_kind(_types[c])
        if kind == "int":
            return pd.Series(pd.array([pd.NA] * n, dtype="Int64"))
        if kind == "float":
            return pd.Series(np.full(n, np.nan))
        if kind == "ts":
            return pd.Series([pd.NaT] * n, dtype="datetime64[us]")
        return pd.Series([""] * n, dtype=object)

    def tag_probe(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        for c in out.columns:
            if str(out[c].dtype).startswith("int"):
                out[c] = out[c].astype("Int64")
        out["_side"] = np.int8(0)
        out["_jb"] = coarse_bucket([b[probe_key]], n_buckets)
        return out

    def tag_build(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[build_key].dropna().drop_duplicates()
        out = pd.DataFrame({probe_key: pd.array(keys.to_numpy(), dtype="Int64")})
        for c in probe_names:
            if c != probe_key:
                out[c] = _placeholder_col(c, len(out))
        out = out[probe_names]
        out["_side"] = np.int8(1)
        out["_jb"] = coarse_bucket([keys], n_buckets)
        return out

    tagged = candidates.map_batches(tag_probe, batch_format="pandas").union(
        build.map_batches(tag_build, batch_format="pandas")
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        probe_rows = g[g["_side"] == 0]
        build_keys = g.loc[g["_side"] == 1, probe_key]
        hit = probe_rows[probe_key].isin(set(build_keys))
        kept = probe_rows[~hit] if anti else probe_rows[hit]
        return kept.drop(columns=["_side", "_jb"])

    verified = tagged.groupby("_jb").map_groups(verify, batch_format="pandas")
    if not anti:
        return verified

    def definite_cast(b: pd.DataFrame) -> pd.DataFrame:
        out = bloom_test(b, False).copy()
        for c in out.columns:
            if str(out[c].dtype).startswith("int"):
                out[c] = out[c].astype("Int64")
        return out

    definite = probe.map_batches(definite_cast, batch_format="pandas")
    return definite.union(verified)
