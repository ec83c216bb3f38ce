"""BPE trainer (stages/bpe.py): hand-computed merge tables, overlapping
pair counts, and the canonical leftmost-greedy run semantics (a 4-run of
'a' becomes [aa, aa], NOT the delimiter-replace artifact [aa, a, a])."""

import pandas as pd
import ray.data


def test_bpe_hand_computed_low_corpus(ray_session):
    from search_engine_framework_ray.stages.bpe import bpe_train

    docs = pd.DataFrame(
        {"text": ["low low low lower lowest", "new newer newest low"]}
    )
    out = bpe_train(ray.data.from_pandas(docs), 4)
    # (l,o)=6 ties (o,w)=6 -> left asc; then (lo,w)=6; then (e,w)=3 ties
    # (n,e)=3 -> 'e' < 'n'; then (n,ew)=3
    assert out[["left", "right", "count"]].values.tolist() == [
        ["l", "o", 6],
        ["lo", "w", 6],
        ["e", "w", 3],
        ["n", "ew", 3],
    ]
    assert out["merged"].tolist() == ["lo", "low", "ew", "new"]
    assert out["step"].tolist() == [1, 2, 3, 4]


def test_bpe_same_symbol_runs_merge_greedily(ray_session):
    from search_engine_framework_ray.stages.bpe import bpe_train

    # word 'aaaa' x2: overlapping (a,a) count = 3 per word -> 6; canonical
    # application gives [aa, aa], so step 2 must see (aa, aa) with count 2.
    out = bpe_train(ray.data.from_pandas(pd.DataFrame({"text": ["aaaa aaaa"]})), 2)
    assert out[["left", "right", "count"]].values.tolist() == [
        ["a", "a", 6],
        ["aa", "aa", 2],
    ]

    # 6-run: [aa, aa, aa]; overlapping (aa,aa) count = 2
    out6 = bpe_train(ray.data.from_pandas(pd.DataFrame({"text": ["aaaaaa"]})), 2)
    assert out6[["left", "right", "count"]].values.tolist() == [
        ["a", "a", 5],
        ["aa", "aa", 2],
    ]


def test_bpe_vocab_applies_all_merges(ray_session):
    from search_engine_framework_ray.stages.bpe import bpe_vocab

    docs = pd.DataFrame({"text": ["low low low lower lowest", "new newer newest low"]})
    out = bpe_vocab(ray.data.from_pandas(docs), 4, top_k=50)
    got = dict(zip(out["token"], out["cnt"]))
    # merges: lo, low, ew, new → low:[low]x4, lower:[low,e,r],
    # lowest:[low,e,s,t], new:[new], newer:[new,e,r], newest:[new,e,s,t]
    want = {"low": 6, "new": 3, "e": 4, "r": 2, "s": 2, "t": 2}
    assert got == want
    # ordering: cnt desc, token asc
    assert out["token"].tolist() == ["low", "e", "new", "r", "s", "t"]
