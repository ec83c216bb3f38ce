"""BM25F (query/bm25f.py) vs an independent in-test reference.

The fixture's fields are drawn INDEPENDENTLY (title/url/inlink are not body
slices like the driver corpus), so the cross-field union df genuinely
differs from the body df and the per-field length normalizations all bind.
Some docs have an empty inlink field (missing-field path)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WEIGHTS = {"body": 1.0, "title": 2.0, "url": 0.5, "inlink": 1.5}
K1, B = 1.2, 0.75
FIELD_COLS = {"body": "text", "title": "title", "url": "urltext", "inlink": "inlinktext"}


@pytest.fixture(scope="module")
def f_corpus(tmp_path_factory):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]

    def draw(lo, hi):
        return " ".join(rng.choice(vocab, size=rng.integers(lo, hi)))

    n = 120
    rows = {
        "doc_id": list(range(n)),
        "text": [draw(8, 25) for _ in range(n)],
        "title": [draw(2, 6) for _ in range(n)],
        "urltext": [draw(1, 4) for _ in range(n)],
        # every 5th doc has no inlink field at all
        "inlinktext": ["" if i % 5 == 0 else draw(1, 5) for i in range(n)],
    }
    root = tmp_path_factory.mktemp("bm25f")
    src = root / "docs.parquet"
    pq.write_table(pa.table(rows), src)
    return str(src), rows


@pytest.fixture(scope="module")
def f_index(ray_session, f_corpus, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    src, _ = f_corpus
    idx = str(tmp_path_factory.mktemp("bm25f_idx") / "idx")
    build_index(
        src,
        idx,
        analyzer=PLAIN_ANALYZER,
        plain_source=PlainSource(
            title_col="title", url_field_col="urltext", inlink_col="inlinktext"
        ),
        num_shards=3,
    )
    return idx


def _ref_bm25f(rows, terms, weights):
    """Pure-python/numpy reference (no engine imports)."""
    n = len(rows["doc_id"])
    toks = {f: [rows[c][i].split() for i in range(n)] for f, c in FIELD_COLS.items()}
    stats = {}
    for f in weights:
        dls = np.array([len(t) for t in toks[f]], dtype=np.float64)
        present = dls > 0
        stats[f] = (dls, dls[present].sum() / present.sum())
    scores = np.zeros(n)
    for t in terms:
        tf = {
            f: np.array([doc.count(t) for doc in toks[f]], dtype=np.float64)
            for f in weights
        }
        df = int(np.sum(np.any([tf[f] > 0 for f in weights], axis=0)))
        idf = np.log((n - df + 0.5) / (df + 0.5))
        tft = np.zeros(n)
        for f in ("body", "title", "url", "inlink"):
            dls, avg = stats[f]
            bf = (1 - B) + B * (dls / avg)
            m = tf[f] > 0
            tft[m] += (weights[f] * tf[f][m]) / bf[m]
        m = tft > 0
        scores[m] += idf * (tft[m] / (K1 + tft[m]))
    return scores


def test_bm25f_matches_reference(f_index, f_corpus):
    from search_engine_framework_ray.query.bm25f import bm25f_topk

    _, rows = f_corpus
    terms = ["w0", "w3"]
    got = bm25f_topk(f_index, terms, WEIGHTS, k=30)
    want = _ref_bm25f(rows, terms, WEIGHTS)
    order = np.lexsort((np.arange(len(want)), -want))[:30]
    order = order[want[order] > 0]
    assert got["docid"].tolist() == [int(d) for d in order]
    assert np.allclose(got["score"].to_numpy(), want[order], rtol=1e-12, atol=0)


def test_bm25f_union_df_exceeds_body_df(f_index, f_corpus):
    """A title-only occurrence must raise the union df above the body df —
    the idf the engine uses must reflect the union, not just body."""
    import duckdb

    from search_engine_framework_ray.query.bm25f import bm25f_topk

    src, rows = f_corpus
    term = "w1"
    n = len(rows["doc_id"])
    body = {i for i in range(n) if term in rows["text"][i].split()}
    anyf = {
        i
        for i in range(n)
        for c in FIELD_COLS.values()
        if term in rows[c][i].split()
    }
    assert len(anyf) > len(body), "fixture must exercise union > body df"
    # engine score for a doc matching ONLY outside body must use union idf
    got = bm25f_topk(f_index, [term], WEIGHTS, k=n)
    want = _ref_bm25f(rows, [term], WEIGHTS)
    assert np.allclose(
        got.set_index("docid")["score"].to_numpy(),
        want[got["docid"].to_numpy()],
        rtol=1e-12,
        atol=0,
    )


def test_bm25f_body_only_ranks_like_bm25(f_index):
    """Degenerate weights {body: 1} reduce BM25F to plain BM25 algebraically
    (idf·(tf/B)/(k1+tf/B) == idf·tf/(tf+k1·B)) — rank order must agree with
    the engine's BM25 evaluator (scores differ only in rounding)."""
    from search_engine_framework_ray.query.bm25f import bm25f_topk
    from search_engine_framework_ray.query.executor import run_queries
    from search_engine_framework_ray.query.models import ModelParams

    got = bm25f_topk(f_index, ["w0", "w3"], {"body": 1.0}, k=25)
    res = run_queries(f_index, [("q", "w0 w3")], ModelParams(model="BM25"), k=25)["q"]
    want = [docid for _, _, docid in res]
    assert got["docid"].tolist() == want
