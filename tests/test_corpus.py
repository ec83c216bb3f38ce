"""Unit tests for stages/corpus.py (source stats, n-gram top-k, tf-idf,
deterministic shuffle) and stages/ann.kmeans_clusters — multi-block inputs so
the partial/reduce paths are exercised, planted data so answers are known."""

import numpy as np
import pandas as pd

import ray.data

from search_engine_framework_ray.stages.ann import kmeans_clusters
from search_engine_framework_ray.stages.corpus import (
    deterministic_shuffle,
    ngram_topk,
    source_stats,
    tfidf_topk,
)
from search_engine_framework_ray.stages.dedup import _md5_hash64


def _two_block_ds(df: pd.DataFrame):
    half = len(df) // 2
    return ray.data.from_pandas(
        [df.iloc[:half].reset_index(drop=True), df.iloc[half:].reset_index(drop=True)]
    )


def test_source_stats_counts(ray_session):
    df = pd.DataFrame(
        {
            "source": ["a", "b", "a", "b", "a", "c"],
            "text": ["x y", "z", "x", "", "p q r", "one two"],
        }
    )
    out = (
        source_stats(_two_block_ds(df))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert out["source"].tolist() == ["a", "b", "c"]
    assert out["n_docs"].tolist() == [3, 2, 1]
    assert out["n_tokens"].tolist() == [6, 1, 2]
    assert out["n_chars_total"].tolist() == [3 + 1 + 5, 1 + 0, 7]


def test_ngram_topk_planted(ray_session):
    df = pd.DataFrame(
        {
            "text": [
                "the cat sat",          # 'the cat', 'cat sat'
                "the cat ran",          # 'the cat' again
                "dog the cat",          # 'the cat' third time (cross-doc)
                "zz aa",                # gram that straddles docs must NOT exist
            ]
        }
    )
    top = ngram_topk(_two_block_ds(df), n=2, k=3)
    assert top.iloc[0]["gram"] == "the cat" and top.iloc[0]["cnt"] == 3
    # remaining grams all have cnt 1 → tie-break is gram-ascending
    rest = top.iloc[1:]
    assert (rest["cnt"] == 1).all()
    assert rest["gram"].tolist() == sorted(rest["gram"].tolist())
    # no gram joins the last word of one doc to the first of the next
    allg = ngram_topk(ray.data.from_pandas(df), n=2, k=100)
    assert "sat the" not in set(allg["gram"])
    assert "ran dog" not in set(allg["gram"])


def test_ngram_trigram(ray_session):
    df = pd.DataFrame({"text": ["a b c d", "a b c"]})
    top = ngram_topk(ray.data.from_pandas(df), n=3, k=10)
    got = dict(zip(top["gram"], top["cnt"]))
    assert got == {"a b c": 2, "b c d": 1}


def test_tfidf_rare_term_wins(ray_session):
    # 'rare' appears only in doc 2 → highest idf there; 'common' everywhere
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "common common x",
                "common y",
                "common rare rare",
                "common z",
            ],
        }
    )
    out = (
        tfidf_topk(_two_block_ds(df), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d2 = out[out["doc_id"] == 2]
    assert d2.iloc[0]["term"] == "rare" and d2.iloc[0]["rank"] == 1
    # 'common' has df == N → tfidf exactly 0 for every doc
    assert (out[out["term"] == "common"]["tfidf_micros"] == 0).all()
    # ranks are 1..k per doc
    assert out.groupby("doc_id")["rank"].apply(list).map(
        lambda r: r == list(range(1, len(r) + 1))
    ).all()


def test_deterministic_shuffle_is_permutation_and_reproducible(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64)})
    a = deterministic_shuffle(_two_block_ds(df)).to_pandas().sort_values("pos")
    assert a["pos"].tolist() == list(range(40))
    assert sorted(a["doc_id"].tolist()) == list(range(40))
    # exact replay: matches the driver-side md5 ordering
    keys = sorted(range(40), key=lambda i: (_md5_hash64(str(i)), i))
    assert a["doc_id"].tolist() == keys
    # reproducible across a second run
    b = deterministic_shuffle(_two_block_ds(df)).to_pandas().sort_values("pos")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_kmeans_separated_blobs(ray_session):
    rng = np.random.default_rng(7)
    blob0 = rng.normal(0.0, 0.05, size=(30, 4))
    blob1 = rng.normal(5.0, 0.05, size=(30, 4))
    df = pd.DataFrame(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in np.vstack([blob0, blob1])],
        }
    )
    out = (
        kmeans_clusters(_two_block_ds(df), k=2, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    c0 = set(out.iloc[:30]["cluster"])
    c1 = set(out.iloc[30:]["cluster"])
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1


def test_kmeans_drops_empty_cluster(ray_session):
    # two identical points far from the third seed candidate: with k=3 and
    # only 2 distinct locations, one cluster empties after the update and
    # must be dropped while survivors KEEP their original ids
    df = pd.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": [[0.0, 0.0]] * 3 + [[9.0, 9.0]] * 3,
        }
    )
    out = kmeans_clusters(ray.data.from_pandas(df), k=3, iters=2).to_pandas()
    assert set(out["cluster"]) <= {0, 1, 2}
    assert len(set(out["cluster"])) == 2


def test_curate_reasons(ray_session):
    from search_engine_framework_ray.stages.corpus import curate

    long_en = "the " * 30 + "cat sat on the mat with a dog and it was good " * 2
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "too short",          # short
                long_en,              # ok (canonical of dup cluster)
                long_en,              # dup of 1
                "xx yy " * 25,        # 50 words but no profile hits → lang
            ],
        }
    )
    out = (
        curate(_two_block_ds(df), min_words=40, keep_lang="en")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["reason"].tolist() == ["short", "ok", "dup", "lang"]
    assert out["keep"].tolist() == [0, 1, 0, 0]
    assert out.loc[2, "cluster_id"] == 1


def test_weighted_sample_biased_and_exact(ray_session):
    from search_engine_framework_ray.stages.corpus import weighted_sample

    # heavy rows (weight 1000) should dominate the sample vs weight-1 rows
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": np.where(np.arange(n) < 100, 1000, 1).astype(np.int64),
        }
    )
    out = weighted_sample(_two_block_ds(df), 40)
    assert len(out) == 40
    heavy = (out["doc_id"] < 100).sum()
    assert heavy >= 35  # P(pick light) ≈ w_l/w_h per pair
    # exact replay of the driver-side A-ES computation
    h = np.fromiter(
        (_md5_hash64(str(i)) for i in range(n)), dtype=np.uint64, count=n
    )
    u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
    kp = np.floor(-np.log(u) / df["n_chars"].to_numpy(np.float64) * 1e12 + 0.5)
    want = df.assign(kp=kp.astype(np.int64)).sort_values(["kp", "doc_id"]).head(40)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["key_picos"].tolist() == want["kp"].tolist()


def test_collocations_planted_phrase(ray_session):
    """A planted always-together bigram must out-lift independent pairs,
    with the exact integer lift value cnt*N*1e6 // (cx*cy)."""
    from search_engine_framework_ray.stages.corpus import collocations

    # "aa bb" always adjacent (8 times); "cc" and "dd" co-occur but also
    # appear apart, diluting their lift; filler "ee" is frequent everywhere.
    docs = ["aa bb cc dd ee ee"] * 8 + ["cc ee dd ee ee"] * 8
    ds = ray.data.from_items([{"text": t} for t in docs])
    out = collocations(ds, k=5, min_count=5, n_buckets=8)
    n_tokens = 8 * 6 + 8 * 5  # 88
    assert out.iloc[0]["gram"] == "aa bb"
    assert out.iloc[0]["cnt"] == 8
    # cx = cy = 8 → lift = 8*88*1e6 // 64
    assert out.iloc[0]["lift_micros"] == 8 * n_tokens * 1_000_000 // (8 * 8)
    grams = list(out["gram"])
    assert "cc dd" in grams  # adjacent in the first 8 docs only
    i = grams.index("cc dd")
    assert out.iloc[i]["lift_micros"] < out.iloc[0]["lift_micros"]


def test_facet_counts(ray_session):
    import ray.data
    from search_engine_framework_ray.stages.corpus import facet_counts

    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["s1", "s2"] * 5,
            "lang": ["en"] * 6 + ["de"] * 4,
        }
    )
    ds = ray.data.from_pandas(pdf).repartition(3)
    out = facet_counts(ds, {0, 1, 2, 6, 7}, ["source", "lang"])
    want = (
        pdf[pdf["doc_id"].isin({0, 1, 2, 6, 7})]
        .groupby(["source", "lang"], as_index=False)
        .size()
        .rename(columns={"size": "n_docs"})
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    want["n_docs"] = want["n_docs"].astype("int64")
    pd.testing.assert_frame_equal(out, want)
    # empty match set → zero rows, schema intact
    empty = facet_counts(ds, set(), ["source", "lang"])
    assert len(empty) == 0 and list(empty.columns) == ["source", "lang", "n_docs"]


def test_source_centroids_copartition(ray_session):
    import ray.data
    from search_engine_framework_ray.stages.ann import (
        centroids_from_partials,
        keyed_centroid_partials,
    )

    rng = np.random.default_rng(11)
    n, d = 120, 8
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=d).astype(np.float32) for _ in range(n)],
        }
    )
    keys = pd.DataFrame(
        {
            "doc_id": np.arange(n - 10, dtype=np.int64),  # last 10 ids unkeyed
            "source": ["s" + str(i % 3) for i in range(n - 10)],
        }
    )
    got = centroids_from_partials(
        keyed_centroid_partials(
            ray.data.from_pandas(emb).repartition(5),
            ray.data.from_pandas(keys).repartition(3),
        ),
        key_col="source",
    ).to_pandas().sort_values(["source", "dim"]).reset_index(drop=True)

    m = np.stack([e.astype(np.float64) for e in emb["embedding"]])
    naive = []
    for s in ("s0", "s1", "s2"):
        ids = keys[keys["source"] == s]["doc_id"].to_numpy()
        naive.append(
            pd.DataFrame(
                {
                    "source": s,
                    "dim": np.arange(d, dtype=np.int64),
                    "n": np.int64(len(ids)),
                    "centroid": m[ids].sum(axis=0) / len(ids),
                }
            )
        )
    want = pd.concat(naive, ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12)
    # unkeyed embeddings contribute nowhere: per-dim doc counts sum to 110
    assert got[got["dim"] == 0]["n"].sum() == n - 10
