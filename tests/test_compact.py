"""Index compaction: compact_index(base+deltas → out_dir) must preserve the
logical index exactly — same docmap, doclens, termstats, forward vectors and
byte-identical query results vs both the uncompacted index and a full
rebuild — must resume idempotently, and must accept further extend_index
appends afterward."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.pipelines.build_index import (
    PlainSource,
    build_index,
    extend_index,
)
from search_engine_framework_ray.pipelines.compact import compact_index
from search_engine_framework_ray.query.executor import run_queries
from search_engine_framework_ray.query.models import ModelParams
from search_engine_framework_ray.state.index_layout import list_shards, read_stats

SF = "/root/testdata/sf0.01"

QS = [
    ("q1", "spark join stream"),
    ("q2", "#NEAR/2(table row)"),
    ("q3", "#SYN(window sort) batch"),
]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """documents.parquet split 250/150/100 (base + two deltas) plus the full
    table — PlainSource urls render the dense id, so append order == url
    order and every variant must be byte-identical."""
    d = tmp_path_factory.mktemp("compact_corpus")
    docs = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    paths = {}
    for name, lo, hi in [
        ("base", 0, 250),
        ("d1", 250, 400),
        ("d2", 400, 500),
        ("full", 0, 500),
    ]:
        p = str(d / f"{name}.parquet")
        docs.iloc[lo:hi].to_parquet(p, index=False)
        paths[name] = p
    return paths


@pytest.fixture(scope="module")
def indices(ray_session, corpora, tmp_path_factory):
    """Extended index (3+2+2 = 7 shards), its compaction (2 shards), and a
    from-scratch full rebuild."""
    ext_dir = str(tmp_path_factory.mktemp("ext") / "index")
    out_dir = str(tmp_path_factory.mktemp("cmp") / "index")
    full_dir = str(tmp_path_factory.mktemp("full") / "index")
    build_index(corpora["base"], ext_dir, num_shards=3, plain_source=PlainSource())
    extend_index(corpora["d1"], ext_dir, num_shards=2, plain_source=PlainSource())
    extend_index(corpora["d2"], ext_dir, num_shards=2, plain_source=PlainSource())
    r_cmp = compact_index(ext_dir, out_dir, num_shards=2)
    build_index(corpora["full"], full_dir, num_shards=5, plain_source=PlainSource())
    return ext_dir, out_dir, full_dir, r_cmp


def _docmap(d):
    rows = []
    for p in sorted(glob.glob(os.path.join(d, "docmap", "shard=*.parquet"))):
        t = pq.read_table(p)
        rows.extend(zip(t["docid"].to_pylist(), t["url"].to_pylist()))
    return sorted(rows)


def _termstats(d):
    parts = [
        pq.read_table(p).to_pandas()
        for p in sorted(glob.glob(os.path.join(d, "termstats", "bucket=*.parquet")))
    ]
    return (
        pd.concat(parts)
        .sort_values(["field", "term"], kind="mergesort")
        .reset_index(drop=True)
    )


def _shard_terms(d):
    """(field, term) → (df, ctf) summed over shards (shard-local stats)."""
    parts = [
        pq.read_table(p, columns=["field", "term", "df", "ctf"]).to_pandas()
        for p in sorted(glob.glob(os.path.join(d, "shards", "*", "terms.parquet")))
    ]
    return (
        pd.concat(parts)
        .groupby(["field", "term"], as_index=False)[["df", "ctf"]]
        .sum()
        .sort_values(["field", "term"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_compact_shape_and_stats(indices):
    ext_dir, out_dir, full_dir, r_cmp = indices
    assert len(list_shards(ext_dir)) == 7
    assert len(list_shards(out_dir)) == 2
    assert r_cmp["merged"] == 2 and r_cmp["resumed"] is False
    se, so = read_stats(ext_dir), read_stats(out_dir)
    assert so["n_docs"] == se["n_docs"] == 500
    assert so["fields"] == se["fields"]
    assert "extended_meta" not in so  # compacted index is a committed base


def test_compact_docmap_and_termstats(indices):
    ext_dir, out_dir, full_dir, _ = indices
    assert _docmap(out_dir) == _docmap(ext_dir) == _docmap(full_dir)
    pd.testing.assert_frame_equal(_termstats(out_dir), _termstats(full_dir))
    pd.testing.assert_frame_equal(_shard_terms(out_dir), _shard_terms(full_dir))


def test_compact_queries_identical(indices):
    ext_dir, out_dir, full_dir, _ = indices
    for model in ("BM25", "Indri", "RankedBoolean"):
        r_ext = run_queries(ext_dir, QS, ModelParams(model=model))
        r_cmp = run_queries(out_dir, QS, ModelParams(model=model))
        r_full = run_queries(full_dir, QS, ModelParams(model=model))
        assert r_cmp == r_ext == r_full, f"{model} results differ after compaction"


def test_compact_resumes_idempotently(indices):
    ext_dir, out_dir, *_ = indices
    again = compact_index(ext_dir, out_dir, num_shards=2)
    assert again["resumed"] is True and again["merged"] == 0
    assert again["n_docs"] == 500


def test_compact_refuses_in_place(indices):
    ext_dir, *_ = indices
    with pytest.raises(ValueError, match="out_dir"):
        compact_index(ext_dir, ext_dir)


def test_extend_after_compact(indices, corpora, tmp_path_factory):
    """The compacted index is a committed base: re-appending the last delta
    to a compaction of (base+d1) equals the full extended index."""
    ext_dir, _, full_dir, _ = indices
    part_dir = str(tmp_path_factory.mktemp("part") / "index")
    out2 = str(tmp_path_factory.mktemp("cmp2") / "index")
    build_index(corpora["base"], part_dir, num_shards=3, plain_source=PlainSource())
    extend_index(corpora["d1"], part_dir, num_shards=2, plain_source=PlainSource())
    compact_index(part_dir, out2, num_shards=2)
    extend_index(corpora["d2"], out2, num_shards=2, plain_source=PlainSource())
    assert read_stats(out2)["n_docs"] == 500
    for model in ("BM25", "Indri"):
        assert run_queries(out2, QS, ModelParams(model=model)) == run_queries(
            full_dir, QS, ModelParams(model=model)
        )


def test_recompact_different_width_cleans_stale_shards(indices, tmp_path_factory):
    """A directory first compacted to 3 shards then re-compacted to 2 (the
    crashed-with-different-plan shape) must not leave shard 2 behind —
    list_shards scans directories, so a stale survivor would double-count."""
    ext_dir, _, full_dir, _ = indices
    out3 = str(tmp_path_factory.mktemp("cmp3") / "index")
    compact_index(ext_dir, out3, num_shards=3)
    assert len(list_shards(out3)) == 3
    compact_index(ext_dir, out3, num_shards=2)
    assert len(list_shards(out3)) == 2
    assert read_stats(out3)["n_docs"] == 500
    assert run_queries(out3, QS, ModelParams(model="BM25")) == run_queries(
        full_dir, QS, ModelParams(model="BM25")
    )
