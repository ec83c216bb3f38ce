"""Block-max BM25 top-k must be RANK- and SCORE-identical to the exhaustive
evaluator for every k (pruning is strict, winners recomputed in query
order — query/blockmax.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.query.models import ModelParams


@pytest.fixture(scope="module")
def bm_index(ray_session, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(150)]
    # Zipf-ish draws so block max_tf values vary; short docs keep df < N/2
    # for most terms (positive idf → pruned path eligible)
    texts = [
        " ".join(rng.choice(vocab, p=_zipf(len(vocab)), size=rng.integers(5, 30)))
        for _ in range(400)
    ]
    root = tmp_path_factory.mktemp("bm")
    src = root / "docs.parquet"
    pq.write_table(pa.table({"doc_id": list(range(400)), "text": texts}), src)
    idx = str(root / "idx")
    build_index(
        str(src),
        idx,
        analyzer=PLAIN_ANALYZER,
        plain_source=PlainSource(),
        num_shards=3,
        block_size=16,  # small blocks → many skip opportunities
    )
    return idx


def _zipf(n):
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


QUERIES = [
    "w5 w9",
    "w8 w15 w40 w80",
    "w12",
    "w10 w10 w11",       # duplicate query term
    "w100 w110 w120 w130 w140",  # rare terms
    "w8 w9 w10 w11 w12 w13 w14 w15",
]


def _all_idf_positive(stats_q, n_docs):
    return all(
        np.log((n_docs - df + 0.5) / (df + 0.5)) > 0
        for df, _ in stats_q.values()
    )


@pytest.mark.parametrize("k", [1, 3, 10, 100, 1000])
def test_blockmax_matches_exhaustive(bm_index, k):
    from search_engine_framework_ray.query.blockmax import try_blockmax_bm25
    from search_engine_framework_ray.query.executor import (
        _ShardCache,
        plan_queries,
    )
    from search_engine_framework_ray.query.kernels import Evaluator
    from search_engine_framework_ray.state.index_layout import list_shards

    params = ModelParams(model="BM25")
    cache = _ShardCache(bm_index)
    queries = [(f"q{i}", q) for i, q in enumerate(QUERIES)]
    trees, stats, _ = plan_queries(bm_index, queries, params)
    n_pruned = 0
    for qid, _ in queries:
        eligible = _all_idf_positive(stats[qid], 400)
        for shard in list_shards(bm_index):
            view = cache.view(shard)
            got = try_blockmax_bm25(view, trees[qid], params, stats[qid], k)
            if not eligible:
                assert got is None, "negative idf must fall back to exhaustive"
                continue
            assert got is not None, f"{qid}: flat BM25 #SUM should take the pruned path"
            n_pruned += 1
            ev = Evaluator(view, params, stats[qid])
            res = ev.evaluate(trees[qid])
            order = np.lexsort((res.docids, -res.scores))[:k]
            want_d, want_s = res.docids[order], res.scores[order]
            assert got[0].tolist() == want_d.tolist(), f"{qid} shard{shard} k={k}"
            assert got[1].tolist() == want_s.tolist(), "scores must be bit-identical"
    assert n_pruned >= 9, "most fixture queries should exercise the pruned path"


def test_blockmax_declines_structured_and_negative_idf(bm_index):
    from search_engine_framework_ray.query.blockmax import try_blockmax_bm25
    from search_engine_framework_ray.query.executor import _ShardCache, plan_queries

    params = ModelParams(model="BM25")
    cache = _ShardCache(bm_index)
    # structured tree → decline
    trees, stats, _ = plan_queries(bm_index, [("s", "#NEAR/1(w0 w1)")], params)
    assert try_blockmax_bm25(cache.view(0), trees["s"], params, stats["s"], 10) is None
    # negative idf (term in > half the docs) → decline
    trees2, stats2, _ = plan_queries(bm_index, [("n", "w0")], params)
    sid = next(iter(stats2["n"]))
    df, ctf = stats2["n"][sid]
    if np.log((400 - df + 0.5) / (df + 0.5)) <= 0:
        assert try_blockmax_bm25(cache.view(0), trees2["n"], params, stats2["n"], 10) is None
