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


def test_setsim_hot_token_guard(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.setsim import setsim_join_pairs

    docs = pd.DataFrame(
        {"doc_id": range(8), "text": ["same tokens everywhere"] * 8}
    )
    with pytest.raises(ValueError, match="hot token"):
        setsim_join_pairs(
            ray.data.from_pandas(docs), threshold=(1, 2), hot_token_bound=4
        )
    # same corpus passes with the bound lifted (28 = C(8,2) identical pairs)
    out = setsim_join_pairs(
        ray.data.from_pandas(docs), threshold=(1, 2), hot_token_bound=None
    )
    assert len(out) == 28 and (out["jaccard"] == 1.0).all()


def test_setsim_sql_parity_nasty_whitespace(ray_session):
    """Engine vs DuckDB on text with tabs, runs of spaces, newlines and a
    vertical tab (\\x0b — INSIDE tokens for the RE2-aligned class, the
    historic engine/oracle divergence trap)."""
    import duckdb
    import ray.data

    from search_engine_framework_ray.stages.setsim import setsim_join_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha\tbeta  gamma\ndelta",
                "alpha beta\fgamma delta",   # \f separates → same 4 tokens
                "al\x0bpha beta gamma delta",  # \v is a TOKEN char: al\x0bpha ≠ alpha
                "",
            ],
        }
    )
    got = setsim_join_pairs(ray.data.from_pandas(docs), threshold=(3, 5))
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(r"""
        WITH tok AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS t
            FROM documents
        ),
        cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        inter AS (
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
            FROM tok x JOIN tok y ON x.t = y.t AND y.doc_id > x.doc_id
            GROUP BY 1, 2
        )
        SELECT i.a, i.b, i.i * 1.0 / (ca.n + cb.n - i.i) AS jaccard
        FROM inter i
        JOIN cnt ca ON ca.doc_id = i.a JOIN cnt cb ON cb.doc_id = i.b
        WHERE 5 * i.i >= 3 * (ca.n + cb.n - i.i)
        ORDER BY a, b
    """).df()
    assert got[["a", "b"]].values.tolist() == want[["a", "b"]].astype("int64").values.tolist()
    assert np.allclose(got["jaccard"], want["jaccard"])
    # docs 0,1 tokenize identically; doc 2's \v-fused token breaks the tie
    assert [0, 1] in got[["a", "b"]].values.tolist()


def test_setsim_property_random_corpora(ray_session):
    """Exact recall on arbitrary corpora: engine == brute force across
    randomized shapes (empty docs, singletons, duplicates, skewed df)."""
    rng = np.random.default_rng(42)
    import ray.data

    from search_engine_framework_ray.stages.setsim import setsim_join_pairs

    alphabet = [f"t{i}" for i in range(12)]
    for case in range(5):
        n_docs = int(rng.integers(2, 12))
        texts = [
            " ".join(rng.choice(alphabet, size=rng.integers(0, 9)))
            for _ in range(n_docs)
        ]
        docs = pd.DataFrame({"doc_id": range(n_docs), "text": texts})
        num, den = [(1, 2), (2, 3), (3, 5), (4, 5), (1, 1)][case]
        got = setsim_join_pairs(
            ray.data.from_pandas(docs), threshold=(num, den)
        )
        want = _brute(docs, num, den)
        assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist(), (
            f"case {case}: t={num}/{den} texts={texts}"
        )
        assert np.allclose(
            got["jaccard"].astype("float64"), want["jaccard"].astype("float64")
        )


def test_vocab_growth_small(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.aggregate import vocab_growth

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b", "b c", "", "c d e"],
        }
    )
    out = vocab_growth(ray.data.from_pandas(docs), bucket_size=2)
    # bucket 0 (docs 0-1): first-seen a,b,c → 3; bucket 1 (docs 2-3): d,e → +2
    assert out[["bucket", "new_terms", "vocab_size"]].values.tolist() == [
        [0, 3, 3],
        [1, 2, 5],
    ]


def _brute_containment(
    docs: pd.DataFrame, num: int, den: int, k: int, min_contained: int
) -> pd.DataFrame:
    from search_engine_framework_ray.stages.dedup import _shingles_strict

    sets = {
        int(i): set(_shingles_strict(t, k).tolist())
        for i, t in zip(docs["doc_id"], docs["text"])
    }
    rows = []
    for a, sa in sets.items():
        if len(sa) < min_contained:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            inter = len(sa & sb)
            if den * inter >= num * len(sa):
                rows.append((a, b, inter / len(sa)))
    return (
        pd.DataFrame(rows, columns=["a", "b", "containment"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def test_containment_directed_semantics(ray_session):
    """A short quote inside a long page: containment finds the directed
    pair even though Jaccard is far below any useful threshold."""
    import ray.data

    from search_engine_framework_ray.stages.setsim import containment_join_pairs

    quote = " ".join(f"q{i}" for i in range(12))  # 10 trigram shingles
    page = quote + " " + " ".join(f"p{i}" for i in range(80))
    other = " ".join(f"z{i}" for i in range(40))
    docs = pd.DataFrame({"doc_id": [0, 1, 2], "text": [quote, page, other]})
    out = containment_join_pairs(
        ray.data.from_pandas(docs), threshold=(4, 5), k_shingle=3, min_contained=8
    )
    # directed: quote (0) contained in page (1); page NOT contained in quote
    assert out[["a", "b"]].values.tolist() == [[0, 1]]
    assert out["containment"].iloc[0] == 1.0


@pytest.mark.parametrize("num,den", [(1, 2), (4, 5), (1, 1)])
def test_containment_exact_recall_vs_bruteforce(ray_session, num, den):
    import ray.data

    from search_engine_framework_ray.stages.setsim import containment_join_pairs

    rng = np.random.default_rng(7)
    alphabet = [f"w{i}" for i in range(9)]
    for case in range(4):
        n_docs = int(rng.integers(3, 10))
        texts = [
            " ".join(rng.choice(alphabet, size=rng.integers(0, 14)))
            for _ in range(n_docs)
        ]
        docs = pd.DataFrame({"doc_id": range(n_docs), "text": texts})
        got = containment_join_pairs(
            ray.data.from_pandas(docs),
            threshold=(num, den),
            k_shingle=2,
            min_contained=2,
        )
        want = _brute_containment(docs, num, den, 2, 2)
        assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist(), (
            f"case {case}: t={num}/{den} texts={texts}"
        )
        if len(want):
            assert np.allclose(
                got["containment"], want["containment"].astype("float64")
            )


def test_containment_min_contained_floor(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.setsim import containment_join_pairs

    # doc 0 has 3 shingles (5 words, k=3) — below the floor of 4, so its
    # total containment in doc 1 is excluded; doc 1 is not contained in 0
    small = "a b c d e"
    big = small + " f g h i j k"
    docs = pd.DataFrame({"doc_id": [0, 1], "text": [small, big]})
    out = containment_join_pairs(
        ray.data.from_pandas(docs), threshold=(1, 2), k_shingle=3, min_contained=4
    )
    assert len(out) == 0
    out2 = containment_join_pairs(
        ray.data.from_pandas(docs), threshold=(1, 2), k_shingle=3, min_contained=3
    )
    assert out2[["a", "b"]].values.tolist() == [[0, 1]]
