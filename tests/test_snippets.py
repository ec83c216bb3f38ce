"""Best-window snippet kernel: edge cases + the streaming pass."""

import pandas as pd

from search_engine_framework_ray.query.snippets import (
    best_window,
    snippet_batch,
)


def test_best_window_basic():
    toks = "a b spark c d join spark e f g h i".split()
    # width 4: window starting at 'spark'(pos 3) .. 'join'(pos 6) has 2 hits;
    # best is start 3 (spark c d join) — earliest window with 2 hits
    start, score = best_window(toks, {"spark", "join"}, 4)
    assert (start, score) == (3, 2)


def test_best_window_tie_earliest():
    toks = "x spark y y y spark z".split()
    start, score = best_window(toks, {"spark"}, 2)
    # single-hit windows everywhere a 'spark' fits; earliest containing one
    # is start 1 ('x spark')
    assert (start, score) == (1, 1)


def test_best_window_short_doc():
    assert best_window("spark join".split(), {"spark"}, 10) == (1, 1)
    assert best_window([], {"spark"}, 10) == (1, 0)


def test_best_window_exact_width():
    toks = "join a b c d e f g h spark".split()
    start, score = best_window(toks, {"spark", "join"}, 10)
    assert (start, score) == (1, 2)


def test_snippet_batch_filters_and_labels():
    b = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "SPARK Join here",  # lowercased before matching
                "nothing relevant",
                "join join join",
            ],
        }
    )
    out = snippet_batch(b, {1: 2, 3: 1}, {"spark", "join"}, width=2).to_pandas()
    out = out.sort_values("rnk").reset_index(drop=True)
    assert out["doc_id"].tolist() == [3, 1]
    assert out["win_score"].tolist() == [2, 2]
    assert out["snippet"].tolist() == ["join join", "spark join"]
    # doc 2 (not in top-k) dropped
    assert 2 not in set(out["doc_id"])


def test_snippet_batch_empty():
    b = pd.DataFrame({"doc_id": [9], "text": ["no match doc"]})
    out = snippet_batch(b, {1: 1}, {"spark"}, width=3).to_pandas()
    assert len(out) == 0 and list(out.columns) == [
        "doc_id", "rnk", "win_start", "win_score", "snippet",
    ]
