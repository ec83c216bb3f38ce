"""Language-partitioned index build (pipelines/partitioned.py): each
partition's index holds exactly its partition's docs with PER-PARTITION
collection stats, queries route without touching other partitions, and the
whole build is fingerprint-resumable."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.query.models import ModelParams


@pytest.fixture(scope="module")
def lang_corpus(tmp_path_factory):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    n = 60
    langs = ["en" if i % 3 else "de" for i in range(n)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 15))) for _ in range(n)]
    root = tmp_path_factory.mktemp("langs")
    src = root / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": list(range(n)), "text": texts, "lang": langs}), src
    )
    return str(src), texts, langs


def test_partitioned_build_routes_and_isolates_stats(
    ray_session, lang_corpus, tmp_path_factory
):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.partitioned import (
        build_partitioned_indexes,
    )
    from search_engine_framework_ray.query.executor import run_queries
    from search_engine_framework_ray.state.index_layout import read_stats

    src, texts, langs = lang_corpus
    base = str(tmp_path_factory.mktemp("langs_idx") / "base")
    idxs = build_partitioned_indexes(src, base, analyzer=PLAIN_ANALYZER)
    assert set(idxs) == {"en", "de"}

    # per-partition collection stats: n_docs is the partition count
    n_en = sum(1 for l in langs if l == "en")
    n_de = len(langs) - n_en
    assert read_stats(idxs["en"])["n_docs"] == n_en
    assert read_stats(idxs["de"])["n_docs"] == n_de

    # routing: the en index only ever returns en docs, and matches a
    # brute-force subset evaluation of membership
    res = run_queries(idxs["en"], [("q", "w0")], ModelParams(model="BM25"), k=1000)
    got = sorted(int(u[3:]) for u, _, _ in res["q"])
    want = sorted(
        d for d, (t, l) in enumerate(zip(texts, langs))
        if l == "en" and "w0" in t.split()
    )
    assert got == want

    # resumability: a second call is a metadata no-op with identical dirs
    again = build_partitioned_indexes(src, base, analyzer=PLAIN_ANALYZER)
    assert again == idxs


def test_bloom_routing_no_false_negatives_and_pruning(
    ray_session, lang_corpus, tmp_path_factory
):
    """Term-membership Bloom routing (pipelines/selective.py): every true
    term of a partition must pass its filter (no false negatives ⇒ routed
    ≡ fan-out), a vocabulary disjoint from a partition prunes it, and the
    'all' mode is conjunctive."""
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.partitioned import (
        build_partitioned_indexes,
    )
    from search_engine_framework_ray.pipelines.selective import (
        bloom_probe,
        bloom_route,
        build_term_bloom,
        term_bloom_positions,
    )

    src, texts, langs = lang_corpus
    base = str(tmp_path_factory.mktemp("bloom_idx") / "base")
    idxs = build_partitioned_indexes(src, base, analyzer=PLAIN_ANALYZER)
    blooms = {n: build_term_bloom(d) for n, d in idxs.items()}

    # no false negatives: every term actually in a partition passes
    for name in idxs:
        vocab = {
            t
            for text, l in zip(texts, langs)
            if l == name
            for t in text.split()
        }
        assert all(bloom_probe(blooms[name], t) for t in vocab)

    # mode semantics on controlled filters: shard 'x' holds only 'alpha',
    # shard 'y' only 'beta'
    import numpy as np

    bx = np.zeros(4096, dtype=np.uint8)
    bx[term_bloom_positions("alpha")] = 1
    by = np.zeros(4096, dtype=np.uint8)
    by[term_bloom_positions("beta")] = 1
    fleet = {"x": bx, "y": by}
    assert bloom_route(fleet, ["alpha"], mode="any") == ["x"]
    assert bloom_route(fleet, ["alpha", "beta"], mode="any") == ["x", "y"]
    assert bloom_route(fleet, ["alpha", "beta"], mode="all") == []
    assert bloom_route(fleet, ["alpha", "alpha"], mode="all") == ["x"]

    # cache: a rebuilt filter is byte-identical (atomic .npy next to stats)
    again = {n: build_term_bloom(d) for n, d in idxs.items()}
    for n in blooms:
        assert (blooms[n] == again[n]).all()
