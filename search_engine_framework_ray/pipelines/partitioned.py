"""Per-language (or any low-cardinality key) PARTITIONED index build +
routed querying.

The 100-TB pattern: a multilingual Common-Crawl corpus is physically split
by ``lang`` ONCE (one corpus pass through the resumable partitioned sink),
then every partition gets its own independent sharded index:

* per-partition global stats — df / avgdl / n_docs are per-language by
  construction (cross-language collection stats poison BM25: a French
  stopword is a great English discriminator);
* partition pruning — a query routes to exactly one index; the other
  languages' bytes are never opened;
* independent lifecycle — a re-crawl of one language rebuilds one
  partition (both the sink and ``build_index`` are fingerprint-resumable,
  so the other partitions are metadata-only no-ops).

The reference is monolingual (one Lucene index); this is the standard
production layout for the multilingual corpora the north rule targets.
"""

from __future__ import annotations

import os

import ray.data

from ..functions.analysis import AnalyzerConfig
from .build_index import PlainSource, build_index

__all__ = ["build_partitioned_indexes", "partition_index_dir"]


def partition_index_dir(base_dir: str, value: str) -> str:
    return os.path.join(base_dir, "idx", str(value))


def build_partitioned_indexes(
    src_parquet: str,
    base_dir: str,
    *,
    partition_col: str = "lang",
    analyzer: AnalyzerConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 2,
) -> dict[str, str]:
    """→ {partition value: index dir}. One corpus pass to split, then one
    independent (resumable) build per partition."""
    from ..stages.sink import write_partitioned

    split_dir = os.path.join(base_dir, "split")
    ds = ray.data.read_parquet(
        src_parquet, columns=[id_col, text_col, partition_col]
    )
    report = write_partitioned(
        ds, split_dir, partition_col, sort_within_by=[id_col]
    )
    out: dict[str, str] = {}
    for val in report["partition"].astype(str):
        part_file = os.path.join(split_dir, f"part={val}", "data.parquet")
        idx = partition_index_dir(base_dir, val)
        build_index(
            part_file,
            idx,
            analyzer=analyzer,
            plain_source=PlainSource(id_col=id_col, text_col=text_col),
            num_shards=num_shards,
        )
        out[val] = idx
    return out
