"""Elias-Fano succinct encoding for sorted docid sets (Elias JACM 1974;
Fano 1971; Vigna WSDM 2013 "Quasi-succinct indices" — the format behind
modern index delete lists, filter sets, and docid-list transport).

A sorted set of n distinct ids drawn from universe U splits each id into
``l = max(0, ⌊log2(U/n)⌋)`` low bits (stored verbatim) and the remaining
high bits (stored unary in a bitmap with a 1 at position ``high_i + i``).
Total ≈ ``n·(2 + log2(U/n))`` bits — within 0.56 bits/element of the
information-theoretic minimum for ANY distribution, monotone access
without decompression in the classic variants.

Where this slots into the engine: the index's POSTING codec stays the
blocked varbyte + skip/block-max layout (``functions/codec.py`` — tf and
positions ride alongside docids there); Elias-Fano is the repo's codec
for PURE DOCID SETS that cross the wire or sit in metadata — tombstone
delete lists (``state/index_layout.py``), semi-join filter sets, per-
partition membership snapshots — where it beats varbyte deltas by ~2×
on sparse sets and is byte-deterministic for any input set.

Layout (little-endian)::

    u64 n          -- number of ids
    u64 U          -- universe (all ids < U)
    low section    -- ceil(n*l / 8) bytes: l-bit lows, LSB-first bitstream
    upper section  -- ceil((n + ((U-1) >> l) + 1) / 8) bytes: unary highs

Both sections are fixed CLOSED-FORM functions of (n, U) — the size is
predictable by a SQL twin in exact integer arithmetic
(``l = bit_length(U // n) - 1``), which is what puts the encoder under
the driver's value hash.

Encode/decode are fully vectorized numpy (bit matrices + ``packbits``/
``unpackbits``); no per-id Python.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ef_encode", "ef_decode", "ef_nbytes", "ef_low_bits"]

_HEADER = 16  # u64 n + u64 U


def ef_low_bits(n: int, universe: int) -> int:
    """``l = max(0, ⌊log2(U/n)⌋)`` in exact integer arithmetic
    (``bit_length(U // n) - 1``; for distinct ids U ≥ n so U//n ≥ 1)."""
    if n <= 0:
        return 0
    q = universe // n
    return q.bit_length() - 1 if q >= 1 else 0


def ef_nbytes(n: int, universe: int) -> int:
    """Exact encoded size in bytes — closed-form in (n, U)."""
    if n == 0:
        return _HEADER
    l = ef_low_bits(n, universe)
    low_bytes = (n * l + 7) // 8
    upper_bits = n + ((universe - 1) >> l) + 1
    return _HEADER + low_bytes + (upper_bits + 7) // 8


def ef_encode(ids: np.ndarray, universe: int) -> bytes:
    """Encode a STRICTLY-INCREASING uint64 array with every id < universe.
    Deterministic bytes for a given (ids, universe)."""
    ids = np.ascontiguousarray(ids, dtype=np.uint64)
    n = len(ids)
    if n:
        if int(ids[-1]) >= universe:
            raise ValueError("id >= universe")
        if n > 1 and not (ids[1:] > ids[:-1]).all():
            raise ValueError("ids must be strictly increasing")
    head = np.array([n, universe], dtype="<u8").tobytes()
    if n == 0:
        return head
    l = ef_low_bits(n, universe)
    if l:
        low = ids & np.uint64((1 << l) - 1)
        bits = (
            (low[:, None] >> np.arange(l, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        low_sec = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
        low_sec = low_sec.ljust((n * l + 7) // 8, b"\x00")
    else:
        low_sec = b""
    high = (ids >> np.uint64(l)).astype(np.int64)
    upper_bits = n + ((universe - 1) >> l) + 1
    upper = np.zeros(upper_bits, dtype=np.uint8)
    upper[high + np.arange(n, dtype=np.int64)] = 1
    up_sec = np.packbits(upper, bitorder="little").tobytes()
    return head + low_sec + up_sec


def ef_decode(buf: bytes | memoryview) -> tuple[np.ndarray, int]:
    """Decode → ``(ids uint64 array, universe)``."""
    head = np.frombuffer(buf[:_HEADER], dtype="<u8")
    n, universe = int(head[0]), int(head[1])
    if n == 0:
        return np.empty(0, dtype=np.uint64), universe
    l = ef_low_bits(n, universe)
    low_bytes = (n * l + 7) // 8
    if l:
        raw = np.frombuffer(buf[_HEADER : _HEADER + low_bytes], dtype=np.uint8)
        bits = np.unpackbits(raw, bitorder="little")[: n * l].reshape(n, l)
        low = (
            bits.astype(np.uint64) << np.arange(l, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
    else:
        low = np.zeros(n, dtype=np.uint64)
    upper_bits = n + ((universe - 1) >> l) + 1
    raw_up = np.frombuffer(buf[_HEADER + low_bytes :], dtype=np.uint8)
    upper = np.unpackbits(raw_up, bitorder="little")[:upper_bits]
    high = (np.flatnonzero(upper) - np.arange(n, dtype=np.int64)).astype(np.uint64)
    return (high << np.uint64(l)) | low, universe
