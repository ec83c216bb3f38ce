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
