"""Pseudo-relevance-feedback expansion (QryExpansion.java semantics):
hand-computed term scores on a micro corpus, reference string formats, and
the end-to-end fb flow over the distributed engine."""

import math
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.query.expansion import (
    FeedbackParams,
    expansion_terms,
    format_expanded,
    rewrite_query,
    run_queries_with_expansion,
)
from search_engine_framework_ray.query.models import ModelParams


@pytest.fixture(scope="module")
def micro_index(ray_session, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    root = tmp_path_factory.mktemp("fb")
    src = root / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "apple banana apple",
                    "banana cherry",
                    "apple cherry cherry date",
                ],
            }
        ),
        src,
    )
    idx = str(root / "idx")
    build_index(str(src), idx, analyzer=PLAIN_ANALYZER, plain_source=PlainSource(), num_shards=2)
    return idx


def test_expansion_terms_hand_computed(micro_index):
    # top docs: d0 with Indri score 2.0, d1 with 1.0; fbMu=0 →
    # s(term) = Σ_docs tf/doclen · docScore · ln(C/ctf), C=9
    fb = FeedbackParams(fb_docs=2, fb_terms=10, fb_mu=0.0)
    got = dict(expansion_terms(micro_index, {"q": [(0, 2.0), (1, 1.0)]}, fb)["q"])
    C = 9.0
    want = {
        "apple": (2 / 3) * 2.0 * math.log(C / 3),
        "banana": (1 / 3) * 2.0 * math.log(C / 2) + (1 / 2) * 1.0 * math.log(C / 2),
        "cherry": (1 / 2) * 1.0 * math.log(C / 3),
    }
    assert set(got) == set(want)
    for t, v in want.items():
        assert got[t] == pytest.approx(v, rel=1e-12)
    # ranked by score desc: banana > apple > cherry
    ranked = expansion_terms(micro_index, {"q": [(0, 2.0), (1, 1.0)]}, fb)["q"]
    assert [t for t, _ in ranked] == ["banana", "apple", "cherry"]


def test_fb_terms_truncation_and_tie_break(micro_index):
    fb = FeedbackParams(fb_docs=1, fb_terms=2, fb_mu=0.0)
    ranked = expansion_terms(micro_index, {"q": [(2, 1.0)]}, fb)["q"]
    assert len(ranked) == 2
    # d2 = apple cherry cherry date: cherry tf2 beats the rest
    assert ranked[0][0] == "cherry"


def test_reference_string_formats():
    terms = [("apple", 1.23456789), ("banana", 0.5)]
    exp = format_expanded(terms)
    assert exp == "#wand( 1.2346 apple 0.5000 banana )"  # %.4f truncation
    rw = rewrite_query("apple banana", exp, FeedbackParams(fb_orig_weight=0.5))
    assert rw == "#wand( 0.5 #and(apple banana) 0.5 #wand( 1.2346 apple 0.5000 banana ))"


def test_end_to_end_expansion_runs_and_is_deterministic(micro_index):
    params = ModelParams(model="Indri")
    qs = [("q1", "apple"), ("q2", "cherry date")]
    fb = FeedbackParams(fb_docs=2, fb_terms=4, fb_mu=0.0)
    r1, e1 = run_queries_with_expansion(micro_index, qs, params, fb)
    r2, e2 = run_queries_with_expansion(micro_index, qs, params, fb)
    assert r1 == r2 and e1 == e2
    assert all(re.fullmatch(r"#wand\( (?:\d+\.\d{4} \S+ )*\)", e) for e in e1.values())
    assert len(r1["q1"]) > 0
    # expansion pulls in co-occurring terms: q1 'apple' docs contain banana
    assert any("banana" in e1["q1"] for _ in [0])


def test_rocchio_terms_hand_computed(micro_index):
    """w(t) = 0.75·mean(tf·idf over D) + 1.0·idf for query terms;
    idf = ln(N/df), N=3; D = {d0, d1} (scores ignored — binary set)."""
    from search_engine_framework_ray.query.expansion import rocchio_terms

    got = rocchio_terms(
        micro_index,
        ["cherry", "date"],
        [(0, 99.0), (1, -1.0)],
        alpha=1.0,
        beta=0.75,
        n_terms=10,
    )
    idf = {
        "apple": math.log(3 / 2),
        "banana": math.log(3 / 2),
        "cherry": math.log(3 / 2),
        "date": math.log(3 / 1),
    }
    want = {
        # d0 = apple banana apple; d1 = banana cherry
        "apple": 0.75 * (2 * idf["apple"] / 2),
        "banana": 0.75 * ((1 + 1) * idf["banana"] / 2),
        "cherry": 0.75 * (1 * idf["cherry"] / 2) + idf["cherry"],
        "date": idf["date"],  # query term absent from D: pure alpha part
    }
    gmap = dict(zip(got["term"], got["weight"]))
    assert set(gmap) == set(want)
    for t, v in want.items():
        assert gmap[t] == pytest.approx(v, rel=1e-12)
    # ranking: desc weight, term-ascending ties
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got["term"].tolist() == [t for t, _ in order]


def test_more_like_this_hand_computed(micro_index):
    """Seed d2 = 'apple cherry cherry date' over the 3-doc corpus:
    interest = tf·ln(3/df) → date 1·ln(3) ≈ 1.0986 > cherry 2·ln(1.5)
    ≈ 0.8109 > apple 1·ln(1.5) ≈ 0.405. n_terms=2 picks {date, cherry};
    date appears only in the seed, so the ranking is driven by cherry →
    d1 ('banana cherry') is the one related doc, and the seed never
    appears."""
    from search_engine_framework_ray.query.expansion import more_like_this

    out = more_like_this(micro_index, 2, n_terms=2, k=5)
    assert 2 not in set(out["doc_id"])
    assert out["doc_id"].tolist() == [1]
    assert out["rank"].tolist() == [1]

    # n_terms=3 adds apple → d0 ('apple banana apple') joins the ranking
    out3 = more_like_this(micro_index, 2, n_terms=3, k=5)
    assert set(out3["doc_id"]) == {0, 1}
    assert 2 not in set(out3["doc_id"])
