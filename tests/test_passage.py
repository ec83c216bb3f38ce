"""Passage-level BM25 (query/passage.py): clustering beats scattering,
window arithmetic vs a brute-force scan, tie pinning."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pas_index(ray_session, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    pad = " ".join(["x"] * 30)
    texts = [
        # doc 0: terms clustered in one window
        f"{pad} alpha beta alpha {pad}",
        # doc 1: same counts, scattered far apart
        f"alpha {pad} beta {pad} alpha",
        # doc 2: only one term, many times, clustered
        f"{pad} alpha alpha alpha {pad}",
        # doc 3: neither term
        f"{pad} {pad}",
    ]
    # filler docs keep df ≪ N so idf stays positive (a 4-doc corpus puts
    # df=3 terms at NEGATIVE idf and inverts the clustering intuition)
    texts += [f"{pad} y z" for _ in range(8)]
    root = tmp_path_factory.mktemp("passage")
    src = root / "docs.parquet"
    pq.write_table(pa.table({"doc_id": list(range(len(texts))), "text": texts}), src)
    idx = str(tmp_path_factory.mktemp("passage_idx") / "idx")
    build_index(
        str(src), idx, analyzer=PLAIN_ANALYZER, plain_source=PlainSource(),
        num_shards=2,
    )
    return idx, texts


def _brute(texts, terms, window, k1=1.2):
    """Brute-force best-window per doc over every start position."""
    n = len(texts)
    docfreq = {
        t: sum(1 for x in texts if t in x.split()) for t in terms
    }
    idf = {t: np.log((n - docfreq[t] + 0.5) / (docfreq[t] + 0.5)) for t in terms}
    best = {}
    for d, x in enumerate(texts):
        toks = x.split()
        starts = [i for i, w in enumerate(toks) if w in terms]
        if not starts:
            continue
        scored = []
        for s in starts:
            win = toks[s : s + window]
            sc = sum(
                idf[t] * (win.count(t) / (win.count(t) + k1))
                for t in terms
                if win.count(t)
            )
            scored.append((int(np.sign(sc) * np.floor(abs(sc) * 1e6 + 0.5)), -s))
        m, neg_s = max(scored)
        best[d] = (-neg_s, m)
    return best


def test_passage_matches_bruteforce_and_prefers_clustering(ray_session, pas_index):
    from search_engine_framework_ray.query.passage import passage_bm25_topk

    idx, texts = pas_index
    terms = ["alpha", "beta"]
    out = passage_bm25_topk(idx, terms, window=8, k=10)
    want = _brute(texts, terms, 8)
    got = {
        int(r.docid): (int(r.start_pos), int(r.score_micros))
        for r in out.itertuples()
    }
    assert got == want
    # clustered doc 0 outranks scattered doc 1 (same term counts)
    ranks = {int(d): i for i, d in enumerate(out["docid"])}
    assert ranks[0] < ranks[1]
    # no-match doc absent
    assert 3 not in ranks


def test_passage_tie_breaks_earliest_start(ray_session, pas_index):
    from search_engine_framework_ray.query.passage import passage_bm25_topk

    idx, texts = pas_index
    # doc 2 has three identical-score single-term windows ending at the
    # same count — the chosen start must be the earliest match position
    out = passage_bm25_topk(idx, ["alpha"], window=4, k=10)
    row = out[out["docid"] == 2].iloc[0]
    first_alpha = texts[2].split().index("alpha")
    assert int(row["start_pos"]) == first_alpha
