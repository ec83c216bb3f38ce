"""End-to-end golden diff (SURVEY.md §5.3): rebuild the deterministic
synthetic corpus from scratch, run the fixed query set, and byte-compare the
TREC output against committed goldens — any unintended change to extraction,
analysis, codec, scoring, tie-breaks, merge, or expansion breaks this."""

import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

QS = [
    ("g1", "search engine ranking"),
    ("g2", "#AND(search engine)"),
    ("g3", "#NEAR/2(web page) market"),
    ("g4", "#WINDOW/5(model data) index"),
    ("g5", "#SYN(web page) crawl"),
    ("g6", "search.title engine.url"),
]


@pytest.fixture(scope="module")
def golden_index(ray_session, tiny_corpus, tmp_path_factory):
    from search_engine_framework_ray.pipelines.build_index import build_index

    idx = str(tmp_path_factory.mktemp("golden") / "idx")
    build_index(tiny_corpus, idx, num_shards=3, verify_golden=True)
    return idx


@pytest.mark.parametrize(
    "model", ["BM25", "Indri", "RankedBoolean", "UnrankedBoolean"]
)
def test_trec_output_matches_golden(golden_index, model):
    from search_engine_framework_ray.query.executor import run_queries
    from search_engine_framework_ray.query.models import ModelParams
    from search_engine_framework_ray.sources.trec import format_trec_run

    res = run_queries(golden_index, QS, ModelParams(model=model))
    got = format_trec_run(
        res, [q for q, _ in QS], is_ranked=(model != "UnrankedBoolean"), tag=model
    )
    want = open(os.path.join(GOLDEN_DIR, f"run_{model.lower()}.trec")).read()
    assert got == want, f"{model} TREC output diverged from committed golden"


def test_expansion_matches_golden(golden_index):
    from search_engine_framework_ray.query.expansion import (
        FeedbackParams,
        run_queries_with_expansion,
    )
    from search_engine_framework_ray.query.models import ModelParams
    from search_engine_framework_ray.sources.trec import format_trec_run

    res, exp = run_queries_with_expansion(
        golden_index,
        QS[:3],
        ModelParams(model="Indri"),
        FeedbackParams(fb_docs=5, fb_terms=5, fb_mu=0.0),
    )
    got_run = format_trec_run(res, [q for q, _ in QS[:3]], is_ranked=True, tag="fb")
    got_exp = "".join(f"{qid}: {exp[qid]}\n" for qid, _ in QS[:3])
    assert got_run == open(os.path.join(GOLDEN_DIR, "run_fb_indri.trec")).read()
    assert got_exp == open(os.path.join(GOLDEN_DIR, "expansion_fb_indri.txt")).read()
