"""Decontamination (eval n-gram overlap) and bigram-LM perplexity stages."""

import math

import numpy as np
import pandas as pd
import pytest


def _ds(pdf):
    import ray.data

    return ray.data.from_pandas(pdf)


def test_decontaminate_flags_overlap(ray_session):
    from search_engine_framework_ray.stages.decontam import decontaminate

    corpus = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta gamma delta",   # shares 'alpha beta gamma' ngram
                "zeta eta theta iota",       # no overlap
                "beta gamma delta epsilon",  # shares 'beta gamma delta'
                "tiny doc",                  # < k words → no shingles
            ],
        }
    )
    out = (
        decontaminate(_ds(corpus), ["alpha beta gamma delta epsilon"], k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc0 trigrams: {abc, bcd} both in eval; doc2: {bcd, cde} both in eval
    assert out["contam_ngrams"].tolist() == [2, 0, 2, 0]
    assert out["contaminated"].tolist() == [True, False, True, False]


def test_decontaminate_empty_eval(ray_session):
    from search_engine_framework_ray.stages.decontam import decontaminate

    corpus = pd.DataFrame({"doc_id": [0], "text": ["a b c d"]})
    out = decontaminate(_ds(corpus), [], k=3).to_pandas()
    assert out["contam_ngrams"].tolist() == [0]
    assert not out["contaminated"].iloc[0]


def _brute_bigram_ppl(texts):
    """Reference implementation: plain dict counting + math.log."""
    toks = [t.split() for t in texts]
    uni, bg = {}, {}
    for ws in toks:
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for i, ws in enumerate(toks):
        if len(ws) < 2:
            continue
        s = 0.0
        for a, b in zip(ws, ws[1:]):
            s -= math.log((bg[(a, b)] + 1) / (uni[a] + V))
        out[i] = (len(ws) - 1, s / (len(ws) - 1))
    return out


def test_bigram_ppl_matches_bruteforce(ray_session):
    from search_engine_framework_ray.stages.lm import bigram_model, score_bigram_ppl

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "single",  # 1 token → no bigram positions → dropped
        "the the the",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = _ds(pdf)
    model, vocab = bigram_model(ds)
    got = (
        score_bigram_ppl(ds, model, vocab)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_bigram_ppl(texts)
    assert got["doc_id"].tolist() == sorted(want)
    for _, row in got.iterrows():
        n, lp = want[row["doc_id"]]
        assert row["n_bigrams"] == n
        assert row["logppl"] == pytest.approx(lp, abs=1e-9)


def test_bigram_ppl_fused_matches_bruteforce(ray_session):
    from search_engine_framework_ray.stages.lm import bigram_ppl

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "single",
        "the the the",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        bigram_ppl(_ds(pdf), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_bigram_ppl(texts)
    assert got["doc_id"].tolist() == sorted(want)
    for _, row in got.iterrows():
        n, lp = want[row["doc_id"]]
        assert row["n_bigrams"] == n
        assert row["logppl"] == pytest.approx(lp, abs=1e-9)


def test_bigram_model_counts(ray_session):
    from search_engine_framework_ray.stages.lm import bigram_model

    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["a b a b", "b a"]})
    model, vocab = bigram_model(_ds(pdf))
    assert vocab == 2
    rows = {
        (r["w1"], r["w2"]): (r["cb"], r["cu"])
        for r in model.to_pandas().to_dict("records")
    }
    # corpus bigrams: (a,b)×2, (b,a)×2 ; unigrams: a×3, b×3
    assert rows == {("a", "b"): (2, 3), ("b", "a"): (2, 3)}


def test_repetition_stats_extremes(ray_session):
    from search_engine_framework_ray.stages.repetition import repetition_stats

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a a a a a a",            # one bigram repeated: both fracs 1
                "b c d e f g h",          # all grams unique: both fracs 0
                "x y",                     # bigram exists, no 5-gram positions
            ],
        }
    )
    out = repetition_stats(pdf)
    assert out["top_2gram_frac"].tolist() == [1.0, 1.0 / 6, 1.0]
    assert out["dup_5gram_frac"].tolist() == [1.0, 0.0, 0.0]


def test_cross_dup_fraction_planted(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.repetition import cross_dup_fraction

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "shared tri gram plus unique tail zero",
                "shared tri gram other words here",
                "completely different text with nothing common",
            ],
        }
    )
    got = (
        cross_dup_fraction(ray.data.from_pandas(pdf), k=3, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 'shared tri gram' is the only cross-doc trigram (successors differ)
    assert got["n_grams"].tolist() == [5, 4, 4]
    assert got.loc[0, "dup_frac"] == 1.0 / 5
    assert got.loc[1, "dup_frac"] == 1.0 / 4
    assert got.loc[2, "dup_frac"] == 0.0
