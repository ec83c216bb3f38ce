"""Posting-list codec: docid-delta + varbyte compression in skip blocks with
per-block max-tf metadata (north-star requirements; the reference keeps
postings as Java object vectors, ``InvList.java:17-52`` — the on-disk layout
here is new design).

Layout of one encoded posting list (all little-endian)::

    u32 n_blocks
    n_blocks × block header (24 B):
        u64 last_docid      -- docid of the last posting in the block
        u32 count           -- postings in the block (<= block_size)
        u32 max_tf          -- max term frequency in the block (block-max)
        u32 dt_nbytes       -- bytes of the docid/tf varbyte section
        u32 pos_nbytes      -- bytes of the positions varbyte section
    n_blocks × (dt_section ++ pos_section)

* ``dt_section``  = varbyte[ docid deltas (count) ++ tfs (count) ] — the first
  delta of block 0 is the absolute docid; later blocks delta off the previous
  block's ``last_docid``, so any block decodes independently given its header
  (that is what makes the skip pointers usable).
* ``pos_section`` = varbyte[ per-posting position deltas ] (first position of
  each posting absolute, subsequent ones delta-encoded).

Scoring (BM25 / Indri / boolean) decodes only the dt sections; positional
operators (#NEAR/#WINDOW/#SYN) additionally decode pos sections.

Encode and decode are fully vectorized numpy — no Python per-value loops.
"""

from __future__ import annotations

import numpy as np

_MAX_VB_BYTES = 10  # enough for u64

BLOCK_HEADER_DTYPE = np.dtype(
    [
        ("last_docid", "<u8"),
        ("count", "<u4"),
        ("max_tf", "<u4"),
        ("dt_nbytes", "<u4"),
        ("pos_nbytes", "<u4"),
    ]
)

DEFAULT_BLOCK_SIZE = 128


def vb_encode(values: np.ndarray) -> np.ndarray:
    """Varbyte-encode a uint array → uint8 array. Little-endian 7-bit groups;
    the terminal byte of each value has the high bit clear."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nbytes = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_VB_BYTES):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out


def vb_decode(buf: np.ndarray | bytes | memoryview) -> np.ndarray:
    """Decode a varbyte stream → uint64 array. Vectorized: terminal bytes
    (< 0x80) delimit values; contributions are shifted and reduced per group."""
    data = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(data < 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    within = np.arange(data.size, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), lengths
    )
    contrib = (data & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * within)
    return np.add.reduceat(contrib, starts)


def _pos_deltas(pos_flat: np.ndarray, pos_offsets: np.ndarray) -> np.ndarray:
    """Delta-encode concatenated position lists: first position of each
    posting absolute, the rest successive differences."""
    d = pos_flat.astype(np.int64).copy()
    d[1:] -= pos_flat[:-1]
    starts = pos_offsets[:-1]
    starts = starts[starts < pos_flat.size]
    d[starts] = pos_flat[starts]
    return d


def _pos_undelta(d: np.ndarray, pos_offsets: np.ndarray) -> np.ndarray:
    """Invert :func:`_pos_deltas` (vectorized segmented cumsum)."""
    if d.size == 0:
        return d.astype(np.int32)
    c = np.cumsum(d.astype(np.int64))
    starts = pos_offsets[:-1]
    counts = np.diff(pos_offsets)
    keep = counts > 0
    corr = c[starts[keep]] - d[starts[keep]]
    return (c - np.repeat(corr, counts[keep])).astype(np.int32)


def encode_postings(
    docids: np.ndarray,
    tfs: np.ndarray,
    pos_offsets: np.ndarray,
    pos_flat: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> bytes:
    """Encode one docid-ascending posting list (see module docstring).

    ``pos_offsets`` has length ``len(docids)+1``; positions of posting ``i``
    are ``pos_flat[pos_offsets[i]:pos_offsets[i+1]]``.
    """
    df = len(docids)
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    pos_offsets = np.ascontiguousarray(pos_offsets, dtype=np.int64)
    n_blocks = max(1, -(-df // block_size)) if df else 0
    headers = np.zeros(n_blocks, dtype=BLOCK_HEADER_DTYPE)
    payloads: list[np.ndarray] = []
    all_pos_deltas = _pos_deltas(np.asarray(pos_flat), pos_offsets) if df else None
    prev_docid = np.int64(0)
    for b in range(n_blocks):
        lo, hi = b * block_size, min((b + 1) * block_size, df)
        blk_doc = docids[lo:hi]
        deltas = blk_doc.astype(np.int64).copy()
        deltas[0] -= prev_docid
        deltas[1:] -= blk_doc[:-1]
        prev_docid = blk_doc[-1]
        dt = vb_encode(np.concatenate([deltas, tfs[lo:hi]]).astype(np.uint64))
        ps = vb_encode(
            all_pos_deltas[pos_offsets[lo] : pos_offsets[hi]].astype(np.uint64)
        )
        headers[b] = (blk_doc[-1], hi - lo, int(tfs[lo:hi].max()), dt.size, ps.size)
        payloads.append(dt)
        payloads.append(ps)
    parts = [np.uint32(n_blocks).tobytes(), headers.tobytes()] + [
        p.tobytes() for p in payloads
    ]
    return b"".join(parts)


def read_headers(buf: memoryview | bytes) -> tuple[np.ndarray, int]:
    """Return (block headers, offset of first payload byte)."""
    n_blocks = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    hdr_end = 4 + n_blocks * BLOCK_HEADER_DTYPE.itemsize
    headers = np.frombuffer(buf[4:hdr_end], dtype=BLOCK_HEADER_DTYPE)
    return headers, hdr_end


def decode_postings(
    buf: memoryview | bytes,
    with_positions: bool = True,
    block_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Decode an encoded posting list → ``(docids, tfs, pos_offsets, pos_flat)``.

    ``block_mask`` (bool per block) decodes only the selected skip blocks —
    the block-max WAND path uses this to skip blocks whose ``max_tf`` cannot
    beat the current top-k threshold. When positions are skipped the last two
    returns are None.
    """
    headers, off = read_headers(buf)
    if headers.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.astype(np.int32), (np.zeros(1, np.int64) if with_positions else None), (
            np.empty(0, np.int32) if with_positions else None
        )
    data = np.frombuffer(buf, dtype=np.uint8)
    doc_parts, tf_parts, pos_parts = [], [], []
    prev = np.int64(0)
    for b in range(headers.size):
        h = headers[b]
        dt_n, ps_n, cnt = int(h["dt_nbytes"]), int(h["pos_nbytes"]), int(h["count"])
        if block_mask is None or block_mask[b]:
            vals = vb_decode(data[off : off + dt_n]).astype(np.int64)
            deltas, tfs = vals[:cnt], vals[cnt:]
            deltas[0] += prev
            doc_parts.append(np.cumsum(deltas))
            tf_parts.append(tfs)
            if with_positions:
                pd = vb_decode(data[off + dt_n : off + dt_n + ps_n]).astype(np.int64)
                offs = np.zeros(cnt + 1, dtype=np.int64)
                np.cumsum(tfs, out=offs[1:])
                pos_parts.append(_pos_undelta(pd, offs))
        prev = np.int64(h["last_docid"])
        off += dt_n + ps_n
    docids = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
    tfs = (
        np.concatenate(tf_parts).astype(np.int32) if tf_parts else np.empty(0, np.int32)
    )
    if not with_positions:
        return docids, tfs, None, None
    pos_flat = (
        np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int32)
    )
    pos_offsets = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return docids, tfs, pos_offsets, pos_flat
