"""Event-time windowed aggregation over a stream-shaped table
(``events: event_id, ts, user_id, event_type, value, …``).

Ray Data has no watermarks; the input is treated as an ordered, partitioned
log (ray_guide "streaming-shaped workloads"): windows are pure functions of
``ts``, so tumbling/sliding aggregates are a bucket column + pre-aggregated
``groupby``, and session windows are vectorized gap scans over COARSE key
buckets (many keys per map_groups group — per-key dispatch was 8× the
stage at sparse-key scale; ordering assumption: within the scan we sort by
(key, ts) — late rows are simply rows; no watermark needed for batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .join import check_sizes as _check_sizes
from .join import coarse_bucket as _coarse_bucket
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _bucket_start(ts: pd.Series, size_s: int, offset_s: int = 0) -> pd.Series:
    epoch = ts.astype("datetime64[us]").astype("int64") // 1_000_000
    start = ((epoch - offset_s) // size_s) * size_s + offset_s
    return pd.to_datetime(start, unit="s")


def tumbling_window(
    ds: Dataset,
    size_s: int,
    *,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> Dataset:
    """Tumbling window aggregate → (window_start, *keys, n, sum/min/max/mean
    of value). One pre-aggregated shuffle."""
    keys = keys or []

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["window_start"] = _bucket_start(b[ts_col], size_s)
        # per-batch combiner: collapse before the shuffle
        g = b.groupby(["window_start"] + keys, as_index=False)[value_col].agg(
            ["sum", "count", "min", "max"]
        )
        g.columns = ["window_start"] + keys + ["_sum", "_n", "_min", "_max"]
        return g

    partial = ds.map_batches(add_bucket, batch_format="pandas")
    out = partial.groupby(["window_start"] + keys).aggregate(
        Sum("_sum", alias_name="value_sum"),
        Sum("_n", alias_name="n"),
        Min("_min", alias_name="value_min"),
        Max("_max", alias_name="value_max"),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["value_mean"] = b["value_sum"] / b["n"]
        return b

    return out.map_batches(finish, batch_format="pandas")


def window_topk(
    ds: Dataset,
    size_s: int,
    k: int,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> Dataset:
    """Continuous top-k per tumbling window: the k highest-``value_col``
    rows of each window (ties → lowest id), ranked 1..k.

    The streaming-top-k shape (SAP, ICDE'18 family): each batch keeps only
    its LOCAL top-k per window before the exchange — the global top-k of a
    window is a subset of the union of per-batch top-ks, so ≤ k·n_batches
    narrow rows per window cross the one shuffle regardless of window
    population; the per-window finalizer re-ranks that bounded set."""

    n_buckets = 64

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, ts_col, value_col]].copy()
        b["window_start"] = _bucket_start(b[ts_col], size_s)
        b = b.sort_values(
            ["window_start", value_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = b.groupby("window_start", sort=False).head(k)[
            ["window_start", id_col, value_col]
        ]
        # COARSE window-hash bucket: a long range at a small window size
        # means ~|windows| Ray groups, and per-group dispatch dominates
        # (the many-group trap); the finalizer handles all of a bucket's
        # windows vectorized instead.
        out = out.copy()
        out["_bkt"] = (
            out["window_start"].astype("datetime64[us]").astype("int64")
            // np.int64(size_s * 1_000_000)
        ) % np.int64(n_buckets)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["window_start", value_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby("window_start", sort=False).head(k).copy()
        g["rank"] = g.groupby("window_start", sort=False).cumcount() + 1
        return g[["window_start", id_col, value_col, "rank"]]

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(finish, batch_format="pandas")
    )


def decayed_agg(
    ds: Dataset,
    ref_ts: "pd.Timestamp",
    half_life_s: float,
    *,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> Dataset:
    """Exponentially time-decayed aggregates at a fixed reference instant:
    per key, ``decayed_n = Σ w_i`` and ``decayed_sum = Σ w_i·value_i`` with
    ``w_i = exp(-ln2 · (ref − ts_i)/half_life)`` — the trending-counter
    every freshness-aware ranking keeps.

    Decay to a FIXED reference is associative (each row's weight is
    independent of every other row), so this is the cheapest wide shape
    there is: per-batch combiners collapse to ≤ |keys| rows per batch,
    then one tiny groupby sums the partials. A streaming deployment
    advances ``ref_ts`` by multiplying finished counters by a constant —
    nothing here needs re-scanning."""
    keys = list(keys or [])
    if not keys:
        raise ValueError("decayed_agg needs at least one grouping key")
    lam = np.log(2.0) / float(half_life_s)
    ref_us = pd.Timestamp(ref_ts).value // 1_000  # ns → µs

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        age_s = (
            ref_us - b[ts_col].astype("datetime64[us]").astype("int64")
        ) / 1_000_000.0
        w = np.exp(-lam * age_s.to_numpy())
        g = pd.DataFrame(
            {
                **{k: b[k].to_numpy() for k in keys},
                "_n": w,
                "_sum": w * b[value_col].to_numpy(),
            }
        )
        return g.groupby(keys, as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(keys).aggregate(
        Sum("_n", alias_name="decayed_n"),
        Sum("_sum", alias_name="decayed_sum"),
    )


def sliding_window(
    ds: Dataset,
    size_s: int,
    slide_s: int,
    *,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> Dataset:
    """Sliding windows: each event replicated to the size/slide covering
    windows, then the tumbling machinery on the window-start column."""
    keys = keys or []
    n_covers = -(-size_s // slide_s)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        epoch = b[ts_col].astype("datetime64[us]").astype("int64") // 1_000_000
        frames = []
        for i in range(n_covers):
            w = ((epoch - i * slide_s) // slide_s) * slide_s
            keep = (epoch >= w) & (epoch < w + size_s)
            f = b[keep].copy()
            f["window_start"] = pd.to_datetime(w[keep], unit="s")
            frames.append(f)
        out = pd.concat(frames) if frames else b.iloc[0:0].assign(window_start=pd.NaT)
        g = out.groupby(["window_start"] + keys, as_index=False)[value_col].agg(
            ["sum", "count"]
        )
        g.columns = ["window_start"] + keys + ["_sum", "_n"]
        return g

    partial = ds.map_batches(explode, batch_format="pandas")
    out = partial.groupby(["window_start"] + keys).aggregate(
        Sum("_sum", alias_name="value_sum"), Sum("_n", alias_name="n")
    )
    return out


def session_windows(
    ds: Dataset,
    gap_s: int,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    hot_key_bound: int | None = None,
    salt_slice_s: int | None = None,
) -> Dataset:
    """Per-key session windows (gap-based): ``groupby(key)`` then a sorted
    gap scan per group → (key, session_start, session_end, n, value_sum).

    ``salt_slice_s`` enables the HOT-KEY path: events are first sessionized
    per (key, time-slice) — bounding any one group to a slice's worth of
    events — then the per-slice sessions (intervals, usually ≪ events for
    the dense keys that ARE the hot keys) are merged per key with the SAME
    gap rule. Sessionization composes associatively across time slices, so
    the salted output is BIT-IDENTICAL to the single-group scan at any
    slice width (the cross-slice gap comparison is the same
    ``start − prev_end > gap`` rule the in-slice scan applies) — except
    that ``value_sum`` for a boundary-straddling session is a sum of
    per-slice partial float sums; float addition being non-associative,
    it can differ from the flat sum in the last ulp (counts and interval
    bounds are exact; the driver oracle hash verifies the fixture)."""
    if salt_slice_s is not None:
        return _session_windows_salted(
            ds,
            gap_s,
            key=key,
            ts_col=ts_col,
            value_col=value_col,
            hot_key_bound=hot_key_bound,
            salt_slice_s=salt_slice_s,
        )

    gap_us = gap_s * 1_000_000

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = _coarse_bucket([b[key]])
        return b

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        """One COARSE bucket holding many keys, scanned VECTORIZED: new
        session where the key changes or the gap exceeds gap_us. Per-key
        map_groups dispatch was the stage at sparse-key scale — measured
        8× slower than this on 3M events over 1M mostly-singleton
        (key, slice) groups in the salted path; the same dispatch cost
        applies here."""
        _check_sizes(g[key].value_counts(), key, hot_key_bound)
        g = g.sort_values([key, ts_col], kind="mergesort")
        # full-microsecond gap comparison (a 1800.8 s gap must split the
        # session exactly as the SQL INTERVAL oracle does — no flooring)
        epoch_us = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (kv[1:] != kv[:-1]) | (
                np.diff(epoch_us) > gap_us
            )
        sid = np.cumsum(new_session)
        return (
            g.assign(_sid=sid)
            .groupby("_sid")
            .agg(
                **{
                    key: (key, "first"),
                    "session_start": (ts_col, "min"),
                    "session_end": (ts_col, "max"),
                    "n": (ts_col, "size"),
                    "value_sum": (value_col, "sum"),
                }
            )
            .reset_index(drop=True)
        )

    return (
        ds.map_batches(add_bkt, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(bucket_sessions, batch_format="pandas")
    )


def session_funnel(
    ds: Dataset,
    gap_s: int,
    steps: list[str],
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Funnel analysis within gap-based sessions: how many sessions reach
    each ordered step, where step k+1 must occur STRICTLY LATER than the
    session's earliest completion of step k (the standard product-funnel
    semantics). → (step, step_name, n_sessions) — exact integer counts,
    no float anywhere.

    Same scale shape as :func:`session_windows`: ONE coarse key-bucket
    shuffle, each bucket's sessions scanned vectorized (gap scan + per-
    step masked groupby-min over session ids; step thresholds looked up
    positionally via ``get_indexer`` — an int→float ``reindex`` would
    round µs epochs above 2⁵³). Only ``len(steps)`` count rows leave each
    bucket."""
    gap_us = gap_s * 1_000_000
    _INF = np.iinfo(np.int64).max

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key, ts_col, type_col]].copy()
        b["_bkt"] = _coarse_bucket([b[key]])
        return b

    def bucket_funnel(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"step": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
        )
        if not len(g):
            return empty
        g = g.sort_values([key, ts_col], kind="mergesort")
        epoch = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (kv[1:] != kv[:-1]) | (np.diff(epoch) > gap_us)
        sid = np.cumsum(new_session)
        types = g[type_col].to_numpy(object)
        t_by_sid = None  # epoch of the previous step's first completion
        rows = []
        for j, step in enumerate(steps):
            m = types == step
            if t_by_sid is not None:
                pos = t_by_sid.index.get_indexer(sid)
                thr = np.where(pos >= 0, t_by_sid.to_numpy()[pos], _INF)
                m = m & (epoch > thr)
            masked = np.where(m, epoch, _INF)
            s = pd.Series(masked).groupby(sid).min()
            s = s[s < _INF]
            rows.append({"step": j + 1, "n": len(s)})
            if not len(s):
                rows.extend(
                    {"step": jj + 1, "n": 0} for jj in range(j + 1, len(steps))
                )
                break
            t_by_sid = s
        return pd.DataFrame(rows).astype("int64")

    partials = (
        ds.map_batches(add_bkt, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(bucket_funnel, batch_format="pandas")
        .to_pandas()  # ≤ len(steps)·n_buckets rows
    )
    out = partials.groupby("step", as_index=False)["n"].sum()
    out["step_name"] = [steps[i - 1] for i in out["step"]]
    out["n_sessions"] = out["n"].astype("int64")
    return (
        out[["step", "step_name", "n_sessions"]]
        .sort_values("step")
        .reset_index(drop=True)
    )


def _session_windows_salted(
    ds: Dataset,
    gap_s: int,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    hot_key_bound: int | None,
    salt_slice_s: int,
) -> Dataset:
    """Two-pass salted sessionization (see :func:`session_windows`). Both
    passes shuffle on a COARSE bucket and scan vectorized — the first
    version grouped on (key, slice) directly and paid Ray's per-group
    dispatch for every sparse key's singleton group (measured: 8× the
    stage on 3M events / 10k sparse keys)."""
    gap_us = gap_s * 1_000_000

    def add_slice(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        epoch_us = b[ts_col].astype("datetime64[us]").astype("int64")
        b["_slice"] = epoch_us // (salt_slice_s * 1_000_000)
        b["_bkt"] = _coarse_bucket([b[key], b["_slice"]])
        return b

    def slice_sessions(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse bucket of (key, slice) groups, scanned vectorized:
        new session where key OR slice changes, or the gap exceeds gap_us.
        The hot-key guard applies PER (key, slice): a burst overflowing a
        single slice fails loudly (narrow the slice), never OOMs."""
        _check_sizes(
            g.groupby([key, "_slice"], sort=False).size().sort_values(
                ascending=False
            ),
            key,
            hot_key_bound,
        )
        g = g.sort_values([key, "_slice", ts_col], kind="mergesort")
        epoch_us = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        kv = g[key].to_numpy()
        sv = g["_slice"].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (
                (kv[1:] != kv[:-1])
                | (sv[1:] != sv[:-1])
                | (np.diff(epoch_us) > gap_us)
            )
        sid = np.cumsum(new_session)
        return (
            g.assign(_sid=sid)
            .groupby("_sid")
            .agg(
                **{
                    key: (key, "first"),
                    "session_start": (ts_col, "min"),
                    "session_end": (ts_col, "max"),
                    "n": (ts_col, "size"),
                    "value_sum": (value_col, "sum"),
                }
            )
            .reset_index(drop=True)
        )

    partial = (
        ds.map_batches(add_slice, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(slice_sessions, batch_format="pandas")
    )

    def add_key_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_bkt"] = _coarse_bucket([b[key]])
        return b

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse bucket of keys over partial SESSIONS (intervals):
        merge consecutive same-key sessions whose boundary gap ≤ gap_s —
        the same rule, lifted from events to intervals. Slices partition
        time, so sorted session_start order == time order per key and the
        scan is exact."""
        _check_sizes(g[key].value_counts(), key, hot_key_bound)
        g = g.sort_values([key, "session_start"], kind="mergesort")
        kv = g[key].to_numpy()
        start_us = (
            g["session_start"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        end_us = (
            g["session_end"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (kv[1:] != kv[:-1]) | (
                start_us[1:] - end_us[:-1] > gap_us
            )
        sid = np.cumsum(new_session)
        return (
            g.assign(_sid=sid)
            .groupby("_sid")
            .agg(
                **{
                    key: (key, "first"),
                    "session_start": ("session_start", "min"),
                    "session_end": ("session_end", "max"),
                    "n": ("n", "sum"),
                    "value_sum": ("value_sum", "sum"),
                }
            )
            .reset_index(drop=True)
        )

    return (
        partial.map_batches(add_key_bkt, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(merge, batch_format="pandas")
    )


def running_sum(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_micros",
    hot_key_bound: int | None = None,
) -> Dataset:
    """Per-key ordered running (cumulative) sum — the row-level window
    function ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)``.

    ``value_col`` must be an INTEGER column: a prefix sum is
    order-dependent in float arithmetic, so callers quantize floats to
    exact integers (micros) first and the scan is exact at any
    parallelism. ONE coarse key-hash bucket shuffle (all rows of a key
    co-locate; many keys per Ray group — the per-key-dispatch trap), then
    a vectorized multi-key cumsum per bucket (pandas C-level groupby
    scan, no Python per-key loop). A key's rows must fit one task —
    ``check_sizes`` fails loudly with the salting remedy otherwise (a
    prefix sum salts by time slice: scan each slice, then add the
    previous slices' per-key totals as carry-in).
    """

    def route(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key, ts_col, id_col, value_col]].copy()
        if not len(b):
            b["_bkt"] = pd.Series(dtype="int64")
            return b
        b["_bkt"] = _coarse_bucket([b[key]])
        return b

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        _check_sizes(g[key].value_counts(), key, hot_key_bound)
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        g = g.drop(columns=["_bkt"])
        g["running"] = g.groupby(key, sort=False)[value_col].cumsum()
        return g.reset_index(drop=True)

    return (
        ds.map_batches(route, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(scan, batch_format="pandas")
    )


def cohort_retention(
    ds: Dataset,
    *,
    period_s: int = 86_400,
    key: str = "user_id",
    ts_col: str = "ts",
) -> Dataset:
    """Cohort retention matrix: users are cohorted by their FIRST active
    period (epoch-µs ``// period_s``) and counted in every later period
    they return — the standard product-analytics retention triangle.
    → ``(cohort, age, n_users)`` with ``age = active_period - cohort ≥ 0``
    and ``n_users`` the exact distinct-user count.

    Scale shape: per-batch dedup to distinct ``(user, period)`` pairs (the
    only rows that ever shuffle — bounded by users × periods, not events),
    ONE coarse user-bucket groupby computes each user's min period and its
    (cohort, age) pairs pre-combined to partial counts, then a tiny
    ``(cohort, age)`` reduce. A user's rows co-locate by construction, so
    the distinct-count needs no second global pass."""
    period_us = period_s * 1_000_000

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        w = (
            b[ts_col].astype("datetime64[us]").astype(np.int64) // period_us
        )
        out = pd.DataFrame({key: b[key].to_numpy(np.int64), "w": w})
        out = out.drop_duplicates()
        out["_bkt"] = _coarse_bucket([out[key]])
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "cohort": pd.Series(dtype="int64"),
                    "age": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        g = g[[key, "w"]].drop_duplicates()
        cw = g.groupby(key)["w"].transform("min")
        out = pd.DataFrame(
            {"cohort": cw.to_numpy(np.int64), "age": (g["w"] - cw).to_numpy(np.int64)}
        )
        # partial counts per bucket — the final reduce moves (cohort, age,
        # n) rows only
        return (
            out.groupby(["cohort", "age"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return b.groupby(["cohort", "age"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )

    return (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pandas")
        # two-level reduce of the tiny (cohort, age, n) partial table
        .repartition(4)
        .map_batches(combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


def late_events(
    ds: "Dataset",
    *,
    arrival_col: str,
    ts_col: str,
    lateness_us: int,
    bucket_size: int = 1024,
) -> "Dataset":
    """Streaming watermark / late-event detection (the Flink
    bounded-out-of-orderness rule): processing order is ``arrival_col``;
    the watermark BEFORE arrival i is ``max(event time of arrivals < i) −
    lateness``; an event is LATE iff its event time sits below the
    watermark that preceded it. ``ts_col`` must be int64 event-time micros.

    Distributed two-level prefix MAX (the packing pipeline's pattern):
    per-batch (bucket, max) partials → ONE narrow bucket reduce → the
    driver prefix-maxes the tiny bucket-maxima list (exclusive carry-in) →
    a second co-partition computes each bucket's exclusive running max
    plus carry-in. Per-task memory O(bucket); the stream never visits the
    driver. The first arrival overall has no watermark (NULL, never late).

    → Dataset (arrival, ts, watermark_us nullable, late)."""
    import ray

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        arr = b[arrival_col].to_numpy()
        g = pd.DataFrame(
            {"bucket": (arr // bucket_size).astype(np.int64), "mx": b[ts_col].to_numpy()}
        )
        return g.groupby("bucket", as_index=False)["mx"].max()

    bm = (
        ds.map_batches(partials, batch_format="pandas")
        .to_pandas()
        .groupby("bucket")["mx"]
        .max()
        .sort_index()
    )
    # exclusive carry-in per bucket: max over all strictly-earlier buckets
    carry: dict[int, int | None] = {}
    run: int | None = None
    for b, mx in bm.items():
        carry[int(b)] = run
        run = int(mx) if run is None else max(run, int(mx))
    carry_ref = ray.put(carry)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(carry_ref)
        g = g.sort_values(arrival_col, kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy(np.int64)
        prev = np.empty(len(ts), dtype=np.float64)
        cm = np.maximum.accumulate(ts).astype(np.float64)
        prev[0] = np.nan
        prev[1:] = cm[:-1]
        ci = c.get(int(g[arrival_col].iloc[0] // bucket_size))
        if ci is not None:
            prev = np.where(np.isnan(prev), float(ci), np.maximum(prev, float(ci)))
        wm = prev - float(lateness_us)
        late = ts < wm  # NaN compares False → first-ever arrival never late
        out = g[[arrival_col, ts_col]].copy()
        out["watermark_us"] = pd.array(
            [None if np.isnan(w) else int(w) for w in wm], dtype="Int64"
        )
        out["late"] = late
        return out

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = (b[arrival_col].to_numpy() // bucket_size).astype(np.int64)
        return b

    return (
        ds.map_batches(bucketed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
    )
