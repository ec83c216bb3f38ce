"""Per-shard term-membership Bloom sidecar — batch-query fan-out routing.

``run_queries`` (query/executor.py) fans every query to every shard; a shard
containing NONE of a query's terms can only produce zero candidates (every
candidate doc enters through some query term's posting list — true for all
four models, #NEAR/#WINDOW/#SYN, and #ANDNOT's positive arm), so skipping
shards whose Bloom filter rejects every ``field:term`` key is PROVABLY
result-identical: Bloom filters have no false negatives, and a false
positive only costs a wasted (empty) shard task. This is the within-index
twin of the cross-index Bloom routing in ``pipelines/selective.py``
(Kulkarni & Callan CIKM 2010 selective-search family).

Sizing: a fixed-size filter saturates on real vocabularies (measured: 4096
bits over an sf0.1 shard's vocab false-positived a nowhere-term into half
the shards), so bits scale with the shard's key count — the next power of
two ≥ 8·n_keys (k=4 ⇒ ~1.2% false positives at any vocabulary size). The
sidecar is stored BIT-PACKED (``np.packbits``): a 500k-term web shard costs
512 KiB, so a thousand-shard index routes from well under a GiB of driver
memory, loaded once and (size, mtime)-cache-keyed so a rebuilt shard never
serves a stale filter. It is emitted by the shard build task (vocabulary
already in memory) and lazily backfilled from ``terms.parquet`` for indexes
built before the sidecar existed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

MIN_BITS = 4096
BLOOM_K = 4
# v3: adaptive-size, bit-packed (MSB-first), md5-low64-LITTLE hash pair —
# the repo-wide PRF convention (== DuckDB md5_number_lower, as in
# dedup/clicks/graph); the filename version gates out sidecars built by
# earlier hash conventions, which would otherwise produce false negatives
_FILENAME = "term_bloom_v3.npy"


def _md5_low64(s: str) -> int:
    """== DuckDB ``md5_number_lower`` (digest bytes 8..16, little-endian —
    the same convention every other *_low64 PRF in this repo uses)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


def key_hashes(key: str) -> tuple[int, int]:
    """The (h1, h2) Kirsch-Mitzenmacher pair for ``key`` — bits-independent,
    so a router probing MANY shards (whose filters differ in size) computes
    the two md5s once per key, not once per (key, shard)."""
    h1 = _md5_low64(key)
    h2 = _md5_low64("2:" + key) | 1
    return h1, h2


def key_positions(key: str, bits: int, *, k: int = BLOOM_K) -> list[int]:
    """Kirsch-Mitzenmacher double hashing over the md5 PRF pair (exact
    unbounded-int arithmetic; any uint64 engine agrees for power-of-two
    ``bits``)."""
    h1, h2 = key_hashes(key)
    return [(h1 + i * h2) % bits for i in range(k)]


def build_bloom(keys, *, k: int = BLOOM_K, bits: int | None = None) -> np.ndarray:
    """PACKED uint8 Bloom filter over ``keys``; bits auto-sized to the next
    power of two ≥ 8·n_keys (min 4096) unless given."""
    keys = list(keys)
    if bits is None:
        bits = MIN_BITS
        while bits < 8 * len(keys):
            bits <<= 1
    arr = np.zeros(bits, dtype=np.uint8)
    for key in keys:
        arr[key_positions(key, bits, k=k)] = 1
    return np.packbits(arr)


def probe(packed: np.ndarray, key: str, *, k: int = BLOOM_K) -> bool:
    """True iff the shard MIGHT contain ``key`` (no false negatives)."""
    return probe_hashed(packed, key_hashes(key), k=k)


def probe_hashed(
    packed: np.ndarray, hashes: tuple[int, int], *, k: int = BLOOM_K
) -> bool:
    """Probe with a precomputed :func:`key_hashes` pair — the router path
    (one md5 pair per query term, reused across every shard)."""
    bits = len(packed) * 8
    h1, h2 = hashes
    for i in range(k):
        pos = (h1 + i * h2) % bits
        if not (int(packed[pos >> 3]) >> (7 - (pos & 7))) & 1:
            return False
    return True


def bloom_path(shard_dir: str) -> str:
    return os.path.join(shard_dir, _FILENAME)


def write_shard_bloom(shard_dir: str, fields, terms) -> None:
    """Emit the sidecar from the in-memory vocabulary (build-time path,
    also the lazy backfill). The tmp name is per-process so concurrent
    backfills of the same pre-sidecar shard cannot clobber each other's
    half-written file; both finish with an atomic rename of their own."""
    tmp = os.path.join(shard_dir, f"{_FILENAME}.tmp.{os.getpid()}.npy")
    np.save(tmp, build_bloom(f"{f}:{t}" for f, t in zip(fields, terms)))
    os.replace(tmp, bloom_path(shard_dir))


_LOAD_CACHE: dict[str, tuple[tuple[int, int], np.ndarray]] = {}


def load_shard_bloom(shard_dir: str) -> np.ndarray:
    """Load (cached) the shard's Bloom sidecar, lazily backfilling it from
    ``terms.parquet`` for pre-sidecar indexes. The cache key carries the
    file (size, mtime_ns), so a recompacted / rebuilt shard re-reads."""
    p = bloom_path(shard_dir)
    if not os.path.exists(p):
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(shard_dir, "terms.parquet"), columns=["field", "term"]
        )
        write_shard_bloom(shard_dir, t["field"].to_pylist(), t["term"].to_pylist())
    st = os.stat(p)
    key = (st.st_size, st.st_mtime_ns)
    hit = _LOAD_CACHE.get(p)
    if hit is not None and hit[0] == key:
        return hit[1]
    bloom = np.load(p)
    _LOAD_CACHE[p] = (key, bloom)
    return bloom
