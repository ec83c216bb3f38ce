"""Static index pruning (pipelines/prune.py): the global per-term cut must
equal the brute-force cut over the raw corpus (the per-shard local top-P
combiner + term-bucket reduce may drop nothing that belongs in the global
top-P), and pruned scoring must be a per-doc lower bound that degenerates
to plain BM25 when nothing is pruned."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def p_corpus(tmp_path_factory):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(50)]
    w = 1.0 / np.arange(1, len(vocab) + 1)
    texts = [
        " ".join(rng.choice(vocab, p=w / w.sum(), size=rng.integers(6, 30)))
        for _ in range(200)
    ]
    root = tmp_path_factory.mktemp("prune")
    src = root / "docs.parquet"
    pq.write_table(pa.table({"doc_id": list(range(200)), "text": texts}), src)
    return str(src), texts


@pytest.fixture(scope="module")
def p_index(ray_session, p_corpus, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    src, _ = p_corpus
    idx = str(tmp_path_factory.mktemp("prune_idx") / "idx")
    build_index(
        str(src), idx, analyzer=PLAIN_ANALYZER, plain_source=PlainSource(), num_shards=3
    )
    return idx


def _brute_tf(texts):
    rows = []
    for d, t in enumerate(texts):
        for tok, tf in pd.Series(t.split()).value_counts().items():
            rows.append((tok, d, int(tf)))
    return pd.DataFrame(rows, columns=["term", "docid", "tf"])


def test_prune_matches_brute_force_cut(p_index, p_corpus):
    from search_engine_framework_ray.pipelines.prune import prune_postings

    _, texts = p_corpus
    keep = 5
    got = (
        prune_postings(p_index, keep)
        .to_pandas()
        .sort_values(["term", "docid"])
        .reset_index(drop=True)
    )
    want = (
        _brute_tf(texts)
        .sort_values(["term", "tf", "docid"], ascending=[True, False, True])
        .groupby("term", sort=False)
        .head(keep)
        .sort_values(["term", "docid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # the cut must bite: at least one common term had > keep postings
    assert (_brute_tf(texts).groupby("term").size() > keep).any()


def test_unpruned_scoring_equals_bm25(p_index):
    from search_engine_framework_ray.pipelines.prune import pruned_bm25_topk
    from search_engine_framework_ray.query.executor import run_queries
    from search_engine_framework_ray.query.models import ModelParams

    got = pruned_bm25_topk(p_index, ["w3", "w7"], keep_top=10_000, k=25)
    res = run_queries(p_index, [("q", "w3 w7")], ModelParams(model="BM25"), k=25)["q"]
    assert got["docid"].tolist() == [d for _, _, d in res]
    assert np.allclose(
        got["score"].to_numpy(), [s for _, s, _ in res], rtol=1e-12, atol=0
    )


def test_pruned_scores_lower_bound(p_index, p_corpus):
    from search_engine_framework_ray.pipelines.prune import pruned_bm25_topk

    # the lower bound only holds for POSITIVE idf (df < N/2): dropping a
    # negative contribution would RAISE a score — pick terms accordingly
    _, texts = p_corpus
    df = _brute_tf(texts).groupby("term").size()
    terms = [t for t in df.index if 8 < df[t] < 90][:2]
    assert len(terms) == 2, f"fixture lacks mid-frequency terms: {df.describe()}"

    full = pruned_bm25_topk(p_index, terms, keep_top=10_000, k=200)
    cut = pruned_bm25_topk(p_index, terms, keep_top=8, k=200)
    f = full.set_index("docid")["score"]
    c = cut.set_index("docid")["score"]
    assert set(c.index) <= set(f.index)
    # surviving postings score exactly what they scored un-pruned
    assert (c <= f.loc[c.index] + 1e-12).all()
    assert len(c) < len(f), f"keep_top=8 must actually drop docs on {terms}"
