"""Edit-distance similarity join (stages/strsim.py — PassJoin pigeonhole
blocking + capped-DP verify)."""

import numpy as np
import pandas as pd
import pytest

from search_engine_framework_ray.stages.strsim import (
    _segments,
    edit_distance_join,
    lev_capped,
)


def _ref_lev(s: str, t: str) -> int:
    n, m = len(s), len(t)
    dp = list(range(m + 1))
    for i in range(1, n + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, m + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (s[i - 1] != t[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[m]


def test_lev_capped_fuzz_vs_reference():
    rng = np.random.default_rng(3)
    alph = list("abcde")
    for _ in range(800):
        s = "".join(rng.choice(alph, size=rng.integers(0, 12)))
        t = "".join(rng.choice(alph, size=rng.integers(0, 12)))
        r = _ref_lev(s, t)
        for d in (0, 1, 2, 3):
            assert lev_capped(s, t, d) == (r if r <= d else d + 1), (s, t, d)


def test_lev_capped_edges():
    assert lev_capped("", "", 0) == 0
    assert lev_capped("", "abc", 2) == 3  # capped at d+1
    assert lev_capped("", "ab", 2) == 2
    assert lev_capped("kitten", "sitting", 3) == 3
    assert lev_capped("kitten", "sitting", 2) == 3  # over cap → d+1


def test_segments_layout():
    # even partition, longer segments last, covers the whole string
    for l in range(1, 30):
        for m in (1, 2, 3, 4):
            segs = _segments(l, m)
            assert len(segs) == m
            assert segs[0][0] == 0
            assert sum(li for _, li in segs) == l
            for (p0, l0), (p1, _) in zip(segs, segs[1:]):
                assert p1 == p0 + l0


def _brute(df: pd.DataFrame, d: int) -> list:
    ks = {int(i): str(s) for i, s in zip(df["doc_id"], df["key"]) if s is not None}
    ids = sorted(ks)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            dist = _ref_lev(ks[a], ks[b])
            if dist <= d:
                rows.append([a, b, dist])
    return rows


@pytest.mark.parametrize("d", [0, 1, 2])
def test_edit_join_exact_recall_vs_bruteforce(ray_session, d):
    import ray.data

    rng = np.random.default_rng(11)
    alph = list("abcd")
    for case in range(4):
        n = int(rng.integers(4, 24))
        keys = [
            "".join(rng.choice(alph, size=rng.integers(0, 10))) for _ in range(n)
        ]
        df = pd.DataFrame({"doc_id": range(n), "key": keys})
        got = edit_distance_join(
            ray.data.from_pandas(df), str_col="key", max_dist=d
        )
        assert got[["a", "b", "dist"]].values.tolist() == _brute(df, d), (
            f"case {case} d={d} keys={keys}"
        )


def test_edit_join_short_string_class(ray_session):
    """Strings shorter than d+1 chars can't be partitioned — the sentinel
    short-class bucket must still pair them (both with each other and with
    strings up to length 2d)."""
    import ray.data

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "key": ["", "a", "ab", "abcdef"]}
    )
    got = edit_distance_join(ray.data.from_pandas(df), str_col="key", max_dist=2)
    assert got[["a", "b", "dist"]].values.tolist() == _brute(df, 2)


def test_edit_join_null_keys_dropped(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": [0, 1, 2], "key": ["abc", None, "abd"]})
    got = edit_distance_join(ray.data.from_pandas(df), str_col="key", max_dist=1)
    assert got[["a", "b", "dist"]].values.tolist() == [[0, 2, 1]]


def test_edit_join_hot_bucket_guard(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": range(60), "key": ["same"] * 60})
    with pytest.raises(Exception, match="hot segment key"):
        edit_distance_join(
            ray.data.from_pandas(df),
            str_col="key",
            max_dist=1,
            hot_bucket_bound=100,
        )
