"""Positional-kernel edge semantics on hand-built position lists (FIXTURES.md
F4; exact reference cursor behavior per QryopIlNear/Window.java)."""

import numpy as np

from search_engine_framework_ray.query.kernels import _near_match, _window_match


def P(*xs):
    return np.array(xs, dtype=np.int64)


def test_near_exact_distance():
    # match requires 0 <= gap <= n for each adjacent pair, in order
    assert _near_match([P(1), P(2)], 1) == [2]
    assert _near_match([P(1), P(3)], 1) == []
    assert _near_match([P(1), P(3)], 2) == [3]
    # order matters: second term before first never matches
    assert _near_match([P(5), P(3)], 4) == []


def test_near_advances_all_cursors_after_match():
    # after a match at (1,2), both cursors advance: next try starts (4,5)
    assert _near_match([P(1, 4), P(2, 5)], 1) == [2, 5]
    # the match consumes the 2nd arg's position: (1,2) matches, then first=4
    # must pair with a later position of arg2
    assert _near_match([P(1, 4), P(2, 3)], 1) == [2]


def test_near_three_args_chained_gap():
    # chain: a..b <= n and b..c <= n (gap measured between neighbours)
    assert _near_match([P(1), P(2), P(3)], 1) == [3]
    assert _near_match([P(1), P(2), P(4)], 1) == []
    assert _near_match([P(1), P(2), P(4)], 2) == [4]


def test_near_equal_positions_match():
    # reference skips only thisPos < lastPos; equality is a 0-gap match
    assert _near_match([P(3), P(3)], 1) == [3]


def test_near_stopword_gap():
    # "new york" with a stopword between: positions 0 and 2 → #NEAR/1 fails,
    # #NEAR/2 matches (gap-preserving positions)
    assert _near_match([P(0), P(2)], 1) == []
    assert _near_match([P(0), P(2)], 2) == [2]


def test_window_basic():
    # span = max - min + 1 must be <= width
    assert _window_match([P(1), P(3)], 3) == [3]
    assert _window_match([P(1), P(3)], 2) == []
    # unordered: arg order irrelevant
    assert _window_match([P(3), P(1)], 3) == [3]


def test_window_emits_max_and_advances_all():
    assert _window_match([P(1, 10), P(2, 11)], 5) == [2, 11]
    # failed window advances only the min cursor
    assert _window_match([P(1, 9), P(10)], 3) == [10]


def test_window_single_list():
    assert _window_match([P(4, 7, 9)], 1) == [4, 7, 9]


def test_window_repeated_scan():
    # k=3 unordered within width 4
    assert _window_match([P(5), P(3), P(6)], 4) == [6]
    assert _window_match([P(5), P(1), P(6)], 4) == []


def test_rrf_fuse_hand_example():
    """RRF: hand-checked two-list fusion — overlap doc sums both terms,
    single-list docs get one, ties break by ascending id, k cuts."""
    import numpy as np
    import pandas as pd

    from search_engine_framework_ray.query.fusion import rrf_fuse

    a = pd.DataFrame({"doc_id": [5, 3, 9]})  # ranks 1,2,3
    b = pd.DataFrame({"doc_id": [3, 7]})  # ranks 1,2
    out = rrf_fuse([a, b], k0=60, id_col="doc_id")
    sc = dict(zip(out["doc_id"], out["rrf_micros"]))
    micros = lambda v: int(np.floor(v * 1e6 + 0.5))
    assert sc[3] == micros(1 / 62 + 1 / 61)  # both lists
    assert sc[5] == micros(1 / 61)
    assert sc[7] == micros(1 / 62)
    assert sc[9] == micros(1 / 63)
    assert out["doc_id"].tolist() == [3, 5, 7, 9]  # descending micros
    assert out["rank"].tolist() == [1, 2, 3, 4]
    assert rrf_fuse([a, b], k=2)["doc_id"].tolist() == [3, 5]


def test_comb_mnz_hand_example():
    """CombMNZ: per-list min-max normalization, membership multiplier,
    constant-list guard, absent-doc zero contribution."""
    import numpy as np
    import pandas as pd

    from search_engine_framework_ray.query.fusion import comb_mnz

    a = pd.DataFrame({"doc_id": [5, 3, 9], "score_micros": [100, 60, 20]})
    b = pd.DataFrame({"doc_id": [3, 7], "score_micros": [50, 10]})
    out = comb_mnz([a, b], id_col="doc_id")
    sc = dict(zip(out["doc_id"], out["mnz_micros"]))
    micros = lambda v: int(np.floor(v * 1e6 + 0.5))
    # doc 3: sparse (60-20)/80 = 0.5, dense (50-10)/40 = 1.0 → 2 lists
    assert sc[3] == micros(2 * 1.5)
    assert sc[5] == micros(1 * 1.0)  # sparse max
    assert sc[7] == micros(0.0)  # dense min normalizes to 0
    assert sc[9] == micros(0.0)  # sparse min
    assert out["doc_id"].tolist() == [3, 5, 7, 9]  # micros desc, id asc ties
    assert dict(zip(out["doc_id"], out["n_lists"])) == {3: 2, 5: 1, 9: 1, 7: 1}
    # constant list → all normalized scores 0 (no division by zero)
    c = pd.DataFrame({"doc_id": [1, 2], "score_micros": [7, 7]})
    outc = comb_mnz([c])
    assert outc["mnz_micros"].tolist() == [0, 0]
    # CombSUM variant: no membership multiplier
    outs = comb_mnz([a, b], mnz=False)
    assert dict(zip(outs["doc_id"], outs["mnz_micros"]))[3] == micros(1.5)


def test_member_mask_edges():
    """Sorted membership probe: empty list, all-out-of-range candidates,
    exact boundary hits — the SvS intersection primitive for #AND and
    #NEAR/#WINDOW docid intersection."""
    import numpy as np

    from search_engine_framework_ray.query.kernels import _member_mask

    docids = np.array([2, 5, 9, 10], dtype=np.int64)
    cands = np.array([1, 2, 5, 8, 10, 11], dtype=np.int64)
    assert _member_mask(docids, cands).tolist() == [
        False, True, True, False, True, False,
    ]
    assert _member_mask(np.empty(0, np.int64), cands).sum() == 0
    assert _member_mask(docids, np.empty(0, np.int64)).shape == (0,)
    # candidates beyond the last docid clamp to the final element
    assert _member_mask(docids, np.array([99], np.int64)).tolist() == [False]
