"""Sharded on-disk index layout + per-partition lineage manifests.

Layout (document-sharded — each shard owns a contiguous docid range and all
terms for its docs, like Lucene segments; SURVEY.md §4 partitioning decision)::

    <index_dir>/
      stats.json                  # global: n_docs, per-field sum_doclen/doccount,
                                  # analyzer key, shard count (built last = commit marker)
      termstats/bucket=<B>.parquet# GLOBAL (field, term, df, ctf), hash-bucketed by term
      docmap/shard=<K>.parquet    # docid, url (docid-ascending)
      shards/shard=<K>/
        terms.parquet             # field, term, df, ctf, offset, nbytes (shard-LOCAL df/ctf)
        postings.bin              # blocked varbyte posting lists (functions.codec)
        doclens.parquet           # docid + len_<field> columns (int32)
        manifest.json             # lineage: fingerprint of inputs, row counts,
                                  # bytes, wall seconds → resume skips finished shards

Shard directories are written to a temp path and atomically renamed, so a
killed build never leaves a half-written shard; a rerun rebuilds only shards
whose manifest is missing or whose input fingerprint changed.
"""

from __future__ import annotations

import json
import os

# Indexed fields, mirroring the reference's field list (QryEval.java:529).
FIELDS = ("body", "title", "keywords", "url", "inlink")
DEFAULT_FIELD = "body"


def shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "shards", f"shard={shard:05d}")


def docmap_path(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "docmap", f"shard={shard:05d}.parquet")


def termstats_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "termstats")


def stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(shard_dir(index_dir, shard), "manifest.json")


def read_manifest(index_dir: str, shard: int) -> dict | None:
    p = manifest_path(index_dir, shard)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def list_shards(index_dir: str) -> list[int]:
    root = os.path.join(index_dir, "shards")
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("shard=") and os.path.exists(
            os.path.join(root, name, "manifest.json")
        ):
            out.append(int(name.split("=")[1]))
    return out


def load_docmap(index_dir: str) -> tuple[dict, dict]:
    """(url → docid, docid → url) from every shard's docmap file — the
    reference's externalId↔docid lookups (QryEval.java:498-527)."""
    import glob

    import pyarrow.parquet as pq

    u2d: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(index_dir, "docmap", "shard=*.parquet"))):
        t = pq.read_table(p)
        u2d.update(zip(t["url"].to_pylist(), t["docid"].to_pylist()))
    return u2d, {d: u for u, d in u2d.items()}


def read_stats(index_dir: str) -> dict:
    with open(stats_path(index_dir)) as f:
        return json.load(f)


def write_stats(index_dir: str, stats: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = stats_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    os.replace(tmp, stats_path(index_dir))


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes.parquet")


def write_tombstones(index_dir: str, doc_ids) -> int:
    """Merge ``doc_ids`` into the index's delete list (tombstones). LSM /
    Lucene semantics: deleted docs are FILTERED at query time but still
    count in the collection statistics (df/ctf/avg_doclen) until a compaction
    physically reclaims them — exactly Lucene's liveDocs + docFreq behavior.
    Atomic replace, idempotent under re-delivery. Returns the total count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    new = np.asarray(sorted({int(d) for d in doc_ids}), dtype=np.int64)
    merged = np.union1d(load_tombstones(index_dir), new)
    path = tombstones_path(index_dir)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": merged}), tmp)
    os.replace(tmp, path)
    return int(len(merged))


def load_tombstones(index_dir: str) -> "np.ndarray":
    """Sorted int64 delete list; empty when the index has no tombstones."""
    import numpy as np
    import pyarrow.parquet as pq

    path = tombstones_path(index_dir)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(path)["doc_id"].to_numpy().astype(np.int64)
