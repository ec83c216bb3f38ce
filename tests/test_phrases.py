"""Materialized phrase postings must be indistinguishable from evaluating
``#NEAR/1`` live — including gap-preserving stopword positions (a stopword
slot consumes a position, so 'new THE york' is NOT a NEAR/1 match)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.functions.analysis import DEFAULT_ANALYZER
from search_engine_framework_ray.pipelines.phrases import (
    build_phrase_postings,
    phrase_tf,
)
from search_engine_framework_ray.query.models import ModelParams

TEXTS = [
    "new york city",  # tf 1
    "new the york",  # stopword gap: positions 0,2 → NO match
    "new york new york skyline",  # tf 2
    "york new",  # wrong order → no match
    "old boston",  # neither term
    "New York's finest",  # case + possessive → tf 1 (porter stems apply)
]


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("phrases")
    src = root / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS}), src
    )
    return root, str(src)


def test_phrase_store_matches_live_near1(corpus):
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )
    from search_engine_framework_ray.query.executor import run_queries

    root, src = corpus
    idx = str(root / "idx")
    build_index(src, idx, analyzer=DEFAULT_ANALYZER, plain_source=PlainSource(), num_shards=2)
    res = run_queries(
        idx, [("q", "#NEAR/1(new york)")], ModelParams(model="RankedBoolean"), k=100
    )["q"]
    live = sorted((int(u[3:]), int(s)) for u, s, _ in res)

    store = build_phrase_postings(
        src, str(root / "store"), [("new", "york")], analyzer=DEFAULT_ANALYZER
    )
    accel = phrase_tf(store, "new york")
    assert list(zip(accel["doc_id"], accel["tf"])) == live
    assert live == [(0, 1), (2, 2), (5, 1)]


def test_phrase_store_no_matches_is_valid_empty(corpus):
    """A phrase absent from the whole corpus yields a valid EMPTY store
    (zero-row parquet written explicitly — Ray's sink creates no file for
    an all-empty dataset), not a crash."""
    root, src = corpus
    out = build_phrase_postings(
        src, str(root / "store_empty"), [("zz", "qq")], analyzer=DEFAULT_ANALYZER
    )
    got = phrase_tf(out, "zz qq")
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "tf"]


def test_phrase_store_resume_and_invalidation(corpus):
    root, src = corpus
    out = str(root / "store2")
    build_phrase_postings(src, out, [("new", "york")], analyzer=DEFAULT_ANALYZER)
    import os

    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    # identical spec → metadata no-op
    build_phrase_postings(src, out, [("new", "york")], analyzer=DEFAULT_ANALYZER)
    assert mtimes == {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    # changed phrase list → rebuild (manifest fingerprint differs)
    build_phrase_postings(
        src, out, [("new", "york"), ("york", "citi")], analyzer=DEFAULT_ANALYZER
    )
    got = phrase_tf(out, "york citi")
    assert list(zip(got["doc_id"], got["tf"])) == [(0, 1)]
