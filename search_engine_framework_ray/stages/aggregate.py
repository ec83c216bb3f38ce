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
