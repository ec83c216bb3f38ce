"""Clarity score (Cronen-Townsend et al. SIGIR 2002): hand-computed KL on a
micro corpus + the focused-beats-diffuse property the predictor exists for."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.query.clarity import clarity_scores


@pytest.fixture(scope="module")
def cl_index(ray_session, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    root = tmp_path_factory.mktemp("clarity")
    src = root / "docs.parquet"
    # docs 0-1: focused "quantum" vocabulary; docs 2-5: generic filler
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "text": [
                    "quantum qubit quantum gate",
                    "quantum qubit entangle",
                    "the cat sat on the mat",
                    "the dog ran to the park",
                    "a bird flew over a tree",
                    "the fish swam in the sea",
                ],
            }
        ),
        src,
    )
    idx = str(root / "idx")
    build_index(
        str(src), idx, analyzer=PLAIN_ANALYZER, plain_source=PlainSource(), num_shards=2
    )
    return idx


def _brute_clarity(texts: dict[int, str], corpus: list[str], docs: list[int], mu=2500.0):
    all_toks = [t for s in corpus for t in s.split()]
    c_total = float(len(all_toks))
    ctf = {}
    for t in all_toks:
        ctf[t] = ctf.get(t, 0) + 1
    vocab = sorted({t for d in docs for t in texts[d].split()})
    k = len(docs)
    total = 0
    for w in vocab:
        pc = ctf[w] / c_total
        s = 0.0
        for d in docs:
            toks = texts[d].split()
            tf = toks.count(w)
            s += (tf + mu * pc) / (len(toks) + mu)
        pqw = s / float(k)
        contrib = pqw * np.log2(pqw / pc)
        total += int(np.sign(contrib) * np.floor(abs(contrib) * 1e6 + 0.5))
    return len(vocab), total


def test_clarity_hand_computed(cl_index):
    texts = {
        0: "quantum qubit quantum gate",
        1: "quantum qubit entangle",
        2: "the cat sat on the mat",
        3: "the dog ran to the park",
        4: "a bird flew over a tree",
        5: "the fish swam in the sea",
    }
    corpus = [texts[i] for i in range(6)]
    out = clarity_scores(
        cl_index, {"focused": [0, 1], "diffuse": [2, 3, 4, 5]}
    ).set_index("qid")
    for qid, docs in (("focused", [0, 1]), ("diffuse", [2, 3, 4, 5])):
        nv, cm = _brute_clarity(texts, corpus, docs)
        assert out.loc[qid, "n_vocab"] == nv
        assert out.loc[qid, "clarity_micros"] == cm
    # the property the predictor exists for: a topically-focused retrieved
    # set diverges further from the collection LM than background docs
    assert (
        out.loc["focused", "clarity_micros"] > out.loc["diffuse", "clarity_micros"]
    )


def test_clarity_empty_query(cl_index):
    out = clarity_scores(cl_index, {"empty": []})
    assert out.loc[0, "n_vocab"] == 0
    assert out.loc[0, "clarity_micros"] == 0
