"""Prefix-filtered set-similarity join: exact recall vs brute force."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute(docs: pd.DataFrame, num: int, den: int) -> pd.DataFrame:
    from search_engine_framework_ray.stages.setsim import _token_set_hashes

    sets = {
        int(i): _token_set_hashes(t)
        for i, t in zip(docs["doc_id"], docs["text"].fillna(""))
    }
    ids = sorted(sets)
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            sa, sb = sets[ids[x]], sets[ids[y]]
            if not sa.size or not sb.size:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            if den * inter >= num * union:
                rows.append((ids[x], ids[y], inter / union))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


@pytest.mark.parametrize("num,den", [(3, 5), (4, 5)])
def test_setsim_exact_recall_vs_bruteforce(ray_session, num, den):
    import ray.data

    from search_engine_framework_ray.stages.setsim import setsim_join_pairs

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    got = setsim_join_pairs(
        ray.data.from_pandas(docs), threshold=(num, den)
    )
    want = _brute(docs, num, den)
    assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
    assert np.allclose(got["jaccard"], want["jaccard"])
    # the fixture plants near-duplicates — a silent empty pass proves nothing
    assert len(got) > 0


def test_setsim_prefix_math():
    from search_engine_framework_ray.stages.setsim import _prefix_len

    n = np.array([1, 2, 5, 10, 100], dtype=np.int64)
    # t = 3/5: p = n - ceil(0.6n) + 1
    assert _prefix_len(n, 3, 5).tolist() == [1, 1, 3, 5, 41]
    # t = 1 (exact duplicates only): prefix collapses to a single token
    assert _prefix_len(n, 1, 1).tolist() == [1, 1, 1, 1, 1]


def test_setsim_identical_and_disjoint(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.setsim import setsim_join_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta gamma delta",
                "alpha beta gamma delta",  # identical to 0
                "epsilon zeta eta theta",  # disjoint
                "alpha beta gamma iota",   # J = 3/5 with 0 and 1 (boundary)
            ],
        }
    )
    out = setsim_join_pairs(
        ray.data.from_pandas(docs), threshold=(3, 5)
    )
    assert out[["a", "b"]].values.tolist() == [[0, 1], [0, 3], [1, 3]]
    assert out["jaccard"].tolist() == [1.0, 0.6, 0.6]


def test_setsim_cross_vs_bruteforce(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.setsim import (
        _token_set_hashes,
        setsim_cross_pairs,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    left = docs[docs["doc_id"] % 3 == 0].reset_index(drop=True)
    right = docs[docs["doc_id"] % 3 != 0].reset_index(drop=True)
    got = setsim_cross_pairs(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        threshold=(3, 5),
    )
    sets = {
        int(i): _token_set_hashes(t)
        for i, t in zip(docs["doc_id"], docs["text"].fillna(""))
    }
    rows = []
    for a in sorted(left["doc_id"]):
        for b in sorted(right["doc_id"]):
            sa, sb = sets[a], sets[b]
            if not sa.size or not sb.size:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            if 5 * inter >= 3 * union:
                rows.append((a, b, inter / union))
    want = pd.DataFrame(rows, columns=["a", "b", "jaccard"])
    assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
    assert np.allclose(got["jaccard"], want["jaccard"])
    assert len(got) > 0


def test_setsim_cross_no_within_side_pairs(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.setsim import setsim_cross_pairs

    left = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c d", "a b c d"]}  # identical pair WITHIN left
    )
    right = pd.DataFrame({"doc_id": [7], "text": ["x y z w"]})  # disjoint
    out = setsim_cross_pairs(
        ray.data.from_pandas(left), ray.data.from_pandas(right), threshold=(1, 2)
    )
    assert len(out) == 0  # the within-left duplicate must NOT surface
