"""Attribute-filtered retrieval — the Lucene filter-query / filtered-alias
pattern: rank only documents matching a metadata predicate, with scores
computed against GLOBAL collection stats (the filter changes who ranks, not
how anyone scores — the same semantics the tombstone path pins for deletes,
applied as an inclusion set).

Scale shape: the allowed-docid set comes from ONE pruned, predicate-pushed
read of the corpus metadata columns (only ``doc_id`` + the filter column
leave storage, and only matching row groups decode), partitions into
per-shard sets by the manifests' docid ranges, and ships to the query
actors as per-shard Elias-Fano bytes (functions/ef.py — ~2 bytes/member at
webtext densities) decoded once per actor. Per-query work is one
searchsorted membership probe before the top-k cut. A DENSE filter (most
of the corpus matches) should invert to an exclusion set or a bitmap —
documented here, not needed at the selective-filter shapes this serves.

Reference parity: the reference engine has no metadata-filter surface (its
corpus has no attributes; SURVEY.md §2.10) — this is the web-deployment
addition next to per-language routing (pipelines/partitioned.py), which
PARTITIONS by an attribute at build time; this FILTERS by one at query
time over a single index.
"""

from __future__ import annotations

import numpy as np
import ray.data

from ..functions.ef import ef_encode
from ..state.index_layout import list_shards, read_manifest
from .models import ModelParams


def build_docid_filter(
    index_dir: str,
    corpus_path: str,
    col: str,
    values: list,
    *,
    id_col: str = "doc_id",
) -> dict[int, bytes]:
    """Per-shard Elias-Fano allowed-docid sets for ``col IN values``.

    One pruned read (``columns=[id_col, col]`` with the predicate pushed to
    the parquet scan), per-batch mask + id projection (only matching ids
    ever cross the wire), driver-side range partition by the shard
    manifests. Shards with no matches are OMITTED — the executor treats an
    absent shard as matching nothing, so a selective filter costs its
    losing shards zero bytes.
    """
    import pyarrow.dataset as pads

    # predicate pushed to the parquet scan (row-group prune + row filter);
    # only the id column leaves storage. Fully-pruned fragments surface as
    # schema-less empty blocks — guarded below, not an error.
    expr = pads.field(col).isin(values)
    ds = ray.data.read_parquet(corpus_path, columns=[id_col], filter=expr)
    chunks = [
        b[id_col].astype(np.int64)
        for b in ds.iter_batches(batch_format="numpy")
        if id_col in b and len(b[id_col])
    ]
    ids = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)

    out: dict[int, bytes] = {}
    for s in list_shards(index_dir):
        man = read_manifest(index_dir, s)
        lo = int(man["docid_base"])
        hi = lo + int(man["n_docs"])
        part = ids[np.searchsorted(ids, lo) : np.searchsorted(ids, hi)]
        if len(part):
            out[int(s)] = ef_encode(part, hi)
    return out


def filtered_topk(
    index_dir: str,
    corpus_path: str,
    queries: list[tuple[str, str]],
    params: ModelParams,
    col: str,
    values: list,
    *,
    k: int = 100,
) -> dict[str, list[tuple[str, float, int]]]:
    """Filter build + the ordinary distributed query path in one call."""
    from .executor import run_queries

    ef = build_docid_filter(index_dir, corpus_path, col, values)
    return run_queries(index_dir, queries, params, k=k, filter_ef=ef)
