"""Query-result cache with index-fingerprint invalidation — the
production search-tier staple (every web deployment fronts its brokers
with one): repeated queries return the stored ranking without touching a
single posting list, and ANY index mutation (extend_index's new shards,
compact_index's rewrite, a tombstone write) invalidates stale entries
automatically because the cache key CONTAINS the index state.

Key = sha1(index fingerprint ‖ model params ‖ k ‖ query text), where the
index fingerprint digests every shard's lineage manifest (the per-shard
input fingerprints the resumable build already maintains), the collection
stats file, and the tombstone list's bytes. No TTLs, no explicit
invalidation calls, no stale reads: a mutated index simply hashes to new
keys and old entries age out on eviction.

Scale shape: the cache is driver/broker-side (results are k-row tables —
kilobytes), entries are atomic single-file parquet writes (temp + rename,
same convention as the sinks), and the fingerprint read is metadata-only
(a handful of small JSON files + one stat of the tombstone file), so a
hit costs zero cluster work and a miss adds one metadata pass over
manifests it had to read anyway. Eviction is size-bounded FIFO by file
mtime — enough for a single-broker deployment; a multi-broker fleet would
back the same keys with a shared object store.

Reference parity: the reference evaluates every query from scratch
(QryEval.java main loop); caching is deployment infrastructure the brief's
production engine needs, keyed so cached results are bit-identical to
evaluation — which the driver entry's SQL oracle proves (the hash passes
THROUGH the cache hit).
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd

from ..state.index_layout import (
    list_shards,
    manifest_path,
    read_manifest,
    stats_path,
    tombstones_path,
)
from .models import ModelParams


def index_fingerprint(index_dir: str) -> str:
    """Digest of the index's CONTENT state: every shard manifest (lineage
    fingerprints + row counts), collection stats, and the tombstone bytes.
    Any build, extend, compact or delete changes it; a byte-identical
    rebuild does not."""
    h = hashlib.sha1()
    for s in list_shards(index_dir):
        h.update(f"shard:{s}:".encode())
        man = read_manifest(index_dir, s) or {}
        h.update(json.dumps(man, sort_keys=True).encode())
    sp = stats_path(index_dir)
    if os.path.exists(sp):
        with open(sp, "rb") as fh:
            h.update(fh.read())
    tp = tombstones_path(index_dir)
    if os.path.exists(tp):
        with open(tp, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


class QueryResultCache:
    """``run()``-compatible cached front for the distributed query path."""

    def __init__(self, index_dir: str, cache_dir: str, *, max_entries: int = 4096):
        self.index_dir = index_dir
        self.cache_dir = cache_dir
        self.max_entries = max_entries
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def _key(self, fp: str, qtext: str, params: ModelParams, k: int) -> str:
        blob = json.dumps(
            {"fp": fp, "q": qtext, "p": repr(params), "k": k}, sort_keys=True
        )
        return hashlib.sha1(blob.encode()).hexdigest()

    def _path(self, key: str) -> str:
        return os.path.join(self.cache_dir, f"{key}.parquet")

    def run(
        self,
        queries: list[tuple[str, str]],
        params: ModelParams,
        *,
        k: int = 100,
    ) -> dict[str, list[tuple[str, float, int]]]:
        """Same contract as ``executor.run_queries``; per-query granularity
        so a batch mixing hot and novel queries only evaluates the novel
        ones (ONE distributed round for all misses together)."""
        from .executor import run_queries

        fp = index_fingerprint(self.index_dir)
        out: dict[str, list[tuple[str, float, int]]] = {}
        misses: list[tuple[str, str]] = []
        for qid, qtext in queries:
            p = self._path(self._key(fp, qtext, params, k))
            if os.path.exists(p):
                df = pd.read_parquet(p)
                out[qid] = [
                    (u, float(s), int(d))
                    for u, s, d in zip(df["url"], df["score"], df["docid"])
                ]
                self.hits += 1
            else:
                misses.append((qid, qtext))
                self.misses += 1
        if misses:
            fresh = run_queries(self.index_dir, misses, params, k=k)
            for qid, qtext in misses:
                res = fresh[qid]
                out[qid] = res
                df = pd.DataFrame(
                    {
                        "url": [u for u, _, _ in res],
                        "score": [s for _, s, _ in res],
                        "docid": [d for _, _, d in res],
                    }
                )
                p = self._path(self._key(fp, qtext, params, k))
                tmp = p + ".tmp"
                df.to_parquet(tmp, index=False)
                os.replace(tmp, p)  # atomic: readers never see partial rows
            self._evict()
        return out

    def _evict(self) -> None:
        entries = [
            os.path.join(self.cache_dir, f)
            for f in os.listdir(self.cache_dir)
            if f.endswith(".parquet")
        ]
        if len(entries) <= self.max_entries:
            return
        entries.sort(key=os.path.getmtime)
        for p in entries[: len(entries) - self.max_entries]:
            try:
                os.remove(p)
            except OSError:
                pass  # concurrent evictor won the race; the entry is gone
