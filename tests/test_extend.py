"""Incremental (delta) index extension: extend_index(base, delta) must equal
a from-scratch build over the concatenated corpus — same docmap, same global
termstats, byte-identical query results — and must resume idempotently."""

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
from search_engine_framework_ray.query.executor import run_queries
from search_engine_framework_ray.query.models import ModelParams
from search_engine_framework_ray.state.index_layout import list_shards, read_stats

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def split_docs(tmp_path_factory):
    """documents.parquet split into a 300-doc base and a 200-doc delta —
    PlainSource urls render the dense id, so append order == url order and
    the extended index must be byte-identical to a full rebuild."""
    d = tmp_path_factory.mktemp("delta_corpus")
    docs = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    base, delta = str(d / "base.parquet"), str(d / "delta.parquet")
    full = str(d / "full.parquet")
    docs.iloc[:300].to_parquet(base, index=False)
    docs.iloc[300:].to_parquet(delta, index=False)
    docs.to_parquet(full, index=False)
    return base, delta, full


@pytest.fixture(scope="module")
def extended_and_full(ray_session, split_docs, tmp_path_factory):
    base, delta, full = split_docs
    ext_dir = str(tmp_path_factory.mktemp("ext") / "index")
    full_dir = str(tmp_path_factory.mktemp("full") / "index")
    r_base = build_index(base, ext_dir, num_shards=3, plain_source=PlainSource())
    r_ext = extend_index(delta, ext_dir, num_shards=2, plain_source=PlainSource())
    r_full = build_index(full, full_dir, num_shards=5, plain_source=PlainSource())
    return ext_dir, full_dir, r_base, r_ext, r_full


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


def test_extend_counts_and_stats(extended_and_full):
    ext_dir, full_dir, r_base, r_ext, r_full = extended_and_full
    assert r_base["n_docs"] == 300
    assert r_ext["n_docs"] == 500 == r_full["n_docs"]
    assert r_ext["new_shards"] == 2
    assert len(list_shards(ext_dir)) == 5
    se, sf = read_stats(ext_dir), read_stats(full_dir)
    assert se["n_docs"] == sf["n_docs"]
    assert se["fields"] == sf["fields"]  # doccount + sum_doclen per field


def test_extend_docmap_matches_full_rebuild(extended_and_full):
    ext_dir, full_dir, *_ = extended_and_full
    assert _docmap(ext_dir) == _docmap(full_dir)


def test_extend_termstats_match_full_rebuild(extended_and_full):
    ext_dir, full_dir, *_ = extended_and_full
    pd.testing.assert_frame_equal(_termstats(ext_dir), _termstats(full_dir))


def test_extend_queries_identical_to_full_rebuild(extended_and_full):
    ext_dir, full_dir, *_ = extended_and_full
    qs = [
        ("q1", "spark join stream"),
        ("q2", "#NEAR/2(table row)"),
        ("q3", "#SYN(window sort) batch"),
    ]
    for model in ("BM25", "Indri", "RankedBoolean"):
        r1 = run_queries(ext_dir, qs, ModelParams(model=model))
        r2 = run_queries(full_dir, qs, ModelParams(model=model))
        assert r1 == r2, f"{model} results differ: extended vs full rebuild"


def test_extend_resumes_idempotently(extended_and_full, split_docs):
    ext_dir, *_ = extended_and_full
    _, delta, _ = split_docs
    again = extend_index(delta, ext_dir, num_shards=2, plain_source=PlainSource())
    assert again.get("resumed") is True
    assert again["n_docs"] == 500


def test_build_over_extended_dir_refuses(extended_and_full, split_docs):
    ext_dir, *_ = extended_and_full
    base, _, _ = split_docs
    with pytest.raises(ValueError, match="extended"):
        build_index(base, ext_dir, num_shards=3, plain_source=PlainSource())


def test_extend_analyzer_mismatch_refuses(extended_and_full, split_docs):
    from search_engine_framework_ray.functions.analysis import AnalyzerConfig

    ext_dir, *_ = extended_and_full
    _, delta, _ = split_docs
    with pytest.raises(ValueError, match="analyzer"):
        extend_index(
            delta,
            ext_dir,
            plain_source=PlainSource(),
            analyzer=AnalyzerConfig(stemmer="none"),
        )
