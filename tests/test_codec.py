"""Varbyte + blocked postings codec roundtrip tests (SURVEY.md §7.1-6)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_framework_ray.functions.codec import (
    decode_postings,
    encode_postings,
    read_headers,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**53], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


def test_vb_empty():
    assert vb_decode(vb_encode(np.array([], dtype=np.uint64))).size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
def test_vb_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


def _mk_postings(rng, df, max_doc=10**9):
    docids = np.sort(rng.choice(max_doc, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 20, size=df).astype(np.int64)
    pos_offsets = np.zeros(df + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    pos_flat = np.concatenate(
        [np.sort(rng.choice(5000, size=t, replace=False)) for t in tfs]
    ).astype(np.int32)
    return docids, tfs, pos_offsets, pos_flat


def test_postings_roundtrip_multi_block():
    rng = np.random.default_rng(3)
    docids, tfs, po, pf = _mk_postings(rng, df=1000)
    buf = encode_postings(docids, tfs, po, pf, block_size=128)
    d2, t2, po2, pf2 = decode_postings(buf)
    assert np.array_equal(d2, docids)
    assert np.array_equal(t2, tfs.astype(np.int32))
    assert np.array_equal(po2, po)
    assert np.array_equal(pf2, pf)


def test_postings_roundtrip_without_positions():
    rng = np.random.default_rng(4)
    docids, tfs, po, pf = _mk_postings(rng, df=300)
    buf = encode_postings(docids, tfs, po, pf, block_size=64)
    d2, t2, a, b = decode_postings(buf, with_positions=False)
    assert np.array_equal(d2, docids)
    assert a is None and b is None


def test_postings_single_posting_and_empty():
    buf = encode_postings(
        np.array([42], dtype=np.int64),
        np.array([3], dtype=np.int64),
        np.array([0, 3], dtype=np.int64),
        np.array([1, 5, 9], dtype=np.int32),
    )
    d, t, po, pf = decode_postings(buf)
    assert d.tolist() == [42] and t.tolist() == [3] and pf.tolist() == [1, 5, 9]

    empty = encode_postings(
        np.empty(0, np.int64), np.empty(0, np.int64), np.zeros(1, np.int64), np.empty(0, np.int32)
    )
    d, t, po, pf = decode_postings(empty)
    assert d.size == 0 and t.size == 0 and pf.size == 0


def test_block_headers_and_block_mask():
    rng = np.random.default_rng(5)
    docids, tfs, po, pf = _mk_postings(rng, df=400)
    buf = encode_postings(docids, tfs, po, pf, block_size=100)
    headers, _ = read_headers(buf)
    assert headers.size == 4
    assert headers["count"].sum() == 400
    assert int(headers["max_tf"][0]) == int(tfs[:100].max())
    assert int(headers["last_docid"][-1]) == int(docids[-1])
    # decode only blocks 1 and 3 — skip-block semantics
    mask = np.array([False, True, False, True])
    d2, t2, po2, pf2 = decode_postings(buf, block_mask=mask)
    want = np.concatenate([docids[100:200], docids[300:400]])
    assert np.array_equal(d2, want)
    want_pf = np.concatenate([pf[po[100] : po[200]], pf[po[300] : po[400]]])
    assert np.array_equal(pf2, want_pf)


# ---------------------------------------------------------------- Elias-Fano
def test_ef_roundtrip_random_and_edges():
    import numpy as np

    from search_engine_framework_ray.functions.ef import (
        ef_decode,
        ef_encode,
        ef_nbytes,
    )

    rng = np.random.default_rng(3)
    for _ in range(25):
        universe = int(rng.integers(1, 1_000_000))
        n = int(rng.integers(1, min(universe, 4000) + 1))
        ids = np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)
        buf = ef_encode(ids, universe)
        out, u2 = ef_decode(buf)
        assert u2 == universe and (out == ids).all()
        assert len(buf) == ef_nbytes(n, universe)
    for ids, universe in [
        (np.arange(10, dtype=np.uint64), 10),  # dense: l = 0
        (np.array([0], dtype=np.uint64), 1),
        (np.array([999_999], dtype=np.uint64), 1_000_000),
        (np.empty(0, dtype=np.uint64), 100),
    ]:
        buf = ef_encode(ids, universe)
        out, u2 = ef_decode(buf)
        assert (out == ids).all() and u2 == universe
        assert len(buf) == ef_nbytes(len(ids), universe)


def test_ef_guards_and_beats_varbyte_on_sparse_sets():
    import numpy as np
    import pytest

    from search_engine_framework_ray.functions.ef import ef_encode

    with pytest.raises(ValueError):
        ef_encode(np.array([5], dtype=np.uint64), 5)  # id >= universe
    with pytest.raises(ValueError):
        ef_encode(np.array([3, 3], dtype=np.uint64), 10)  # not strict
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(5_000_000, size=20_000, replace=False)).astype(
        np.uint64
    )
    vb = len(vb_encode(np.diff(ids, prepend=np.uint64(0))))
    ef = len(ef_encode(ids, 5_000_000))
    assert ef < vb  # succinct wins on sparse uniform docid sets
