"""LeToR feature pipeline vs hand-computed values (LearnToRank.java
semantics: overlap fractions, VSM lnc.ltc, NaN for missing fields, per-query
min-max normalization, SVMlight formatting)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.pipelines.letor import (
    compute_features,
    letor_rerank,
    normalize_features,
    rerank_scores,
    train_linear,
    write_svmlight,
)


@pytest.fixture(scope="module")
def letor_index(ray_session, tmp_path_factory):
    from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
    from search_engine_framework_ray.pipelines.build_index import (
        PlainSource,
        build_index,
    )

    root = tmp_path_factory.mktemp("letor")
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
                "title": ["apple pie", "banana split", ""],
            }
        ),
        src,
    )
    idx = str(root / "idx")
    build_index(
        str(src),
        idx,
        analyzer=PLAIN_ANALYZER,
        plain_source=PlainSource(title_col="title"),
        num_shards=2,
    )
    return idx


QUERIES = [("q1", "apple banana")]
CAND = {"q1": [0, 1, 2]}


@pytest.fixture(scope="module")
def feats(letor_index):
    attrs = pd.DataFrame(
        {
            "docid": [0, 1, 2],
            "raw_url": [
                "http://en.wikipedia.org/wiki/Apple",
                "http://example.com/a/b/c",
                "http://example.com",
            ],
            "spam_score": [50.0, 60.0, np.nan],
        }
    )
    return compute_features(
        letor_index, QUERIES, CAND, doc_attrs=attrs, page_rank={0: 3.5}
    ).set_index("docid")


def test_doc_attr_features(feats):
    assert feats.loc[0, "f1"] == 50.0 and np.isnan(feats.loc[2, "f1"])
    assert feats.loc[0, "f2"] == 4 and feats.loc[1, "f2"] == 5 and feats.loc[2, "f2"] == 2
    assert feats.loc[0, "f3"] == 1.0 and feats.loc[1, "f3"] == 0.0
    assert feats.loc[0, "f4"] == 3.5 and np.isnan(feats.loc[1, "f4"])


def test_overlap_features(feats):
    # body overlap f7: d0 both terms, d1/d2 one of two
    assert feats.loc[0, "f7"] == 1.0
    assert feats.loc[1, "f7"] == 0.5 and feats.loc[2, "f7"] == 0.5
    # title overlap f10: d2 has no title → NaN triple (ref :484-487)
    assert feats.loc[0, "f10"] == 0.5 and feats.loc[1, "f10"] == 0.5
    assert np.isnan(feats.loc[2, "f8"]) and np.isnan(feats.loc[2, "f10"])


def test_engine_scores_match_run_queries(letor_index, feats):
    from search_engine_framework_ray.query.executor import run_queries
    from search_engine_framework_ray.query.models import ModelParams

    res = run_queries(letor_index, QUERIES, ModelParams(model="BM25"), k=100)["q1"]
    by_doc = {docid: score for (_, score, docid) in res}
    for d in (0, 1, 2):
        assert feats.loc[d, "f5"] == pytest.approx(by_doc[d], abs=0)


def test_vsm_lnc_ltc_hand_computed(feats):
    # d0 title "apple pie", toks [apple, banana], N=3, df(title,·)=1 →
    # dot=ln3, doclen²=2, qrylen²=2·ln²3 → f18 = ln3 / sqrt(4·ln²3) = 0.5
    assert feats.loc[0, "f18"] == pytest.approx(0.5, rel=1e-12)
    # d1 title "banana split": dot=ln3, same norms → 0.5
    assert feats.loc[1, "f18"] == pytest.approx(0.5, rel=1e-12)
    assert np.isnan(feats.loc[2, "f18"])


def test_sdm_feature(feats):
    # f17 = Indri #NEAR/1(apple banana): only d0 has the adjacent bigram;
    # d1/d2 get 0.0 (score-map miss, ref :589-595)
    assert feats.loc[0, "f17"] > 0
    assert feats.loc[1, "f17"] == 0.0 and feats.loc[2, "f17"] == 0.0


def test_normalization_minmax_nan_constant():
    df = pd.DataFrame(
        {
            "qid": ["q"] * 3,
            "docid": [0, 1, 2],
            "f1": [1.0, 3.0, 2.0],   # → 0, 1, .5
            "f2": [5.0, 5.0, 5.0],   # constant → 0
            "f3": [np.nan, 1.0, 3.0],  # NaN passthrough, others min-maxed
        }
    )
    out = normalize_features(df).set_index("docid")
    assert out["f1"].tolist() == [0.0, 1.0, 0.5]
    assert out["f2"].tolist() == [0.0, 0.0, 0.0]
    assert np.isnan(out.loc[0, "f3"]) and out.loc[1, "f3"] == 0.0 and out.loc[2, "f3"] == 1.0


def test_svmlight_format_omits_nan():
    df = pd.DataFrame(
        {"qid": ["7"], "docid": [3], "f1": [0.5], "f2": [np.nan]}
    )
    for j in range(3, 19):
        df[f"f{j}"] = 0.0
    line = write_svmlight(df, {("7", 3): 2}, {3: "doc3"}).splitlines()[0]
    assert line.startswith("2 qid:7 1:0.5 3:0.0")
    assert " 2:" not in line
    assert line.endswith("# doc3")


def test_letor_rerank_end_to_end(letor_index):
    qrels = {("q1", 0): 2, ("q1", 1): 1, ("q1", 2): 0}
    out1 = letor_rerank(letor_index, QUERIES, qrels, QUERIES)
    out2 = letor_rerank(letor_index, QUERIES, qrels, QUERIES)
    assert out1 == out2  # ranksvm training is deterministic end-to-end
    ranked = out1["q1"]
    assert len(ranked) == 3
    # trained on these qrels, the most-relevant doc ranks first
    assert ranked[0][0] == 0


def test_ranksvm_orders_preference_pairs():
    """The pairwise hinge learner must satisfy the training preferences on
    a separable fixture (w·xᵢ > w·xⱼ whenever relᵢ > relⱼ) — the property
    svm_rank optimizes, which ridge regression does not directly."""
    from search_engine_framework_ray.pipelines.letor import (
        N_FEATURES,
        rerank_scores,
        train_ranksvm,
    )

    rng = np.random.default_rng(3)
    rows = []
    for q in ("a", "b"):
        for d in range(6):
            f = rng.standard_normal(N_FEATURES) * 0.1
            f[4] = d * 0.5  # informative feature correlated with rel
            rows.append({"qid": q, "docid": d, **{f"f{j+1}": f[j] for j in range(N_FEATURES)}})
    feats = pd.DataFrame(rows)
    rel = {(q, d): d // 2 for q in ("a", "b") for d in range(6)}
    w = train_ranksvm(feats, rel, c=1.0)
    w2 = train_ranksvm(feats, rel, c=1.0)
    assert np.array_equal(w, w2)  # bit-deterministic
    scored = rerank_scores(feats, w)
    for q in ("a", "b"):
        g = scored[scored["qid"] == q].set_index("docid")["score"]
        for hi in range(6):
            for lo in range(6):
                if rel[(q, hi)] > rel[(q, lo)]:
                    assert g[hi] > g[lo], (q, hi, lo)


def test_score_file_reader(letor_index, tmp_path):
    """extid\\tscore reader + docmap join (LearnToRank.java:131-144): bad
    lines skipped, unknown extids dropped (feature stays NaN)."""
    from search_engine_framework_ray.pipelines.letor import (
        read_score_file,
        scores_by_docid,
    )

    p = tmp_path / "pr.tsv"
    p.write_text(
        "doc0000000000\t0.5\n"
        "doc0000000002\t1.25\n"
        "malformed line without tab\n"
        "doc0000000001\tnot_a_number\n"
        "unknown_ext\t9.0\n"
    )
    m = read_score_file(str(p))
    assert m == {"doc0000000000": 0.5, "doc0000000002": 1.25, "unknown_ext": 9.0}
    by_doc = scores_by_docid(letor_index, m)
    assert by_doc == {0: 0.5, 2: 1.25}
    feats = compute_features(letor_index, QUERIES, CAND, page_rank=by_doc).set_index("docid")
    assert feats.loc[0, "f4"] == 0.5 and feats.loc[2, "f4"] == 1.25
    assert np.isnan(feats.loc[1, "f4"])


def test_letor_features_fourfield_entry_nan_and_oracle(ray_session, tmp_path):
    """The driver's full-18-feature entry over the derived four-field index:
    docs with exactly 10 words lack the inlink slice → the reference's NaN
    triple (f14-16 sentinel); everything hash-matches the SQL twin."""
    import duckdb

    import __ray_entry__ as entrymod

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = {"doc_id": [], "text": [], "lang": []}
    for d in range(24):
        if d % 2 == 0:
            t = "spark join " + " ".join(words)  # exactly 10 words → no inlink
        else:
            t = f"spark join w{d} " + " ".join(words) + " " + " ".join(words[:5])
        rows["doc_id"].append(d)
        rows["text"].append(t)
        rows["lang"].append("en")
    pq.write_table(pa.table(rows), tmp_path / "documents.parquet")

    got = entrymod.q_letor_features(str(tmp_path))
    short = got[got["doc_id"] % 2 == 0]
    long_ = got[got["doc_id"] % 2 == 1]
    assert len(short) and len(long_)
    assert (short[["f14", "f15", "f16"]].to_numpy() == -1_000_000).all()
    assert (long_[["f14", "f15", "f16"]].to_numpy() != -1_000_000).all()

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(entrymod.oracle_sql()["letor_features"]).df()
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_exact=True
    )


# Committed golden: the deterministic pairwise RankSVM's learned weight
# vector on a fixed synthetic four-field corpus (judged docs d%5==0, graded
# d%3, c=0.001, 300 full-batch harmonic-step epochs). Bit-reproducible —
# any drift in feature extraction, normalization, or the trainer fails this.
RANKSVM_GOLDEN_W = [
    0.002499999999999999, 0.0, 0.0, -0.0011587301587301588,
    -0.006662138410394695, 0.006666666138207728, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.006666666138206678, 0.0,
]


def test_ranksvm_weight_vector_golden(ray_session, tmp_path):
    import __ray_entry__ as entrymod
    from search_engine_framework_ray.pipelines.letor import (
        compute_features,
        normalize_features,
        read_score_file,
        scores_by_docid,
        train_ranksvm,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = {"doc_id": [], "text": [], "lang": []}
    for d in range(40):
        extra = f"w{d} " * (d % 4)
        t = ("spark join " + extra + " ".join(words[: 8 - (d % 3)])).strip()
        t = " ".join(t.split())
        if len(t.split()) < 10:
            t = t + " " + " ".join(words[: 10 - len(t.split())])
        rows["doc_id"].append(d)
        rows["text"].append(t)
        rows["lang"].append("en")
    pq.write_table(pa.table(rows), tmp_path / "documents.parquet")
    idx = entrymod._letor_index(str(tmp_path))
    base = entrymod._letor_base(str(tmp_path))
    ids = list(range(40))
    with open(f"{base}/pr.tsv", "w") as f:
        for d in ids:
            f.write(f"doc{d:010d}\t{1.0 / (1 + d % 17)!r}\n")
    with open(f"{base}/sp.tsv", "w") as f:
        for d in ids:
            f.write(f"doc{d:010d}\t{float((d * 37) % 101)!r}\n")
    qr = {("qt", d): d % 3 for d in ids if d % 5 == 0}
    cand = {"qt": sorted(d for (_, d) in qr)}
    pr = scores_by_docid(idx, read_score_file(f"{base}/pr.tsv"))
    sp = scores_by_docid(idx, read_score_file(f"{base}/sp.tsv"))
    tf = normalize_features(
        compute_features(
            idx, [("qt", "spark join")], cand,
            doc_attrs=entrymod._letor_doc_attrs(ids, sp), page_rank=pr,
        )
    )
    w = train_ranksvm(tf, qr, c=0.001)
    assert w.tolist() == RANKSVM_GOLDEN_W


def test_svm_rank_hook_subprocess_wiring(letor_index, tmp_path):
    """The dormant external-binary path (LearnToRank.java:921-994) with FAKE
    executables: asserts the hook writes byte-compatible SVMlight train/test
    files, passes -c and the three positional files exactly like the
    reference's Runtime.exec argv, parses the scores file in row order, and
    surfaces a non-zero exit as the reference's "SVM Rank crashed."."""
    import os
    import stat

    from search_engine_framework_ray.pipelines.letor import (
        letor_rerank,
        svm_rank_hook,
    )

    learn = tmp_path / "svm_rank_learn"
    classify = tmp_path / "svm_rank_classify"
    # fake learn: record argv, copy the train file into the model file
    learn.write_text(
        "#!/bin/sh\n"
        f'echo "$@" > {tmp_path}/learn.argv\n'
        'cp "$3" "$4"\n'
    )
    # fake classify: one score per test line = the line's feature-1 value
    classify.write_text(
        "#!/bin/sh\n"
        f'echo "$@" > {tmp_path}/classify.argv\n'
        "awk '{v=0; for(i=1;i<=NF;i++) if ($i ~ /^1:/) {split($i,a,\":\"); v=a[2]}; print v}' \"$1\" > \"$3\"\n"
    )
    for p in (learn, classify):
        os.chmod(p, os.stat(p).st_mode | stat.S_IXUSR)

    train_f = pd.DataFrame(
        {
            "qid": ["q1", "q1"],
            "docid": [0, 1],
            **{f"f{j}": [float(j), float(j) * 2] for j in range(1, 19)},
        }
    )
    test_f = pd.DataFrame(
        {
            "qid": ["q1", "q1", "q1"],
            "docid": [0, 1, 2],
            **{f"f{j}": [0.25, 0.5, 0.75] for j in range(1, 19)},
        }
    )
    scores = svm_rank_hook(
        train_f,
        {("q1", 0): 1},
        test_f,
        {0: "d0", 1: "d1", 2: "d2"},
        c=0.125,
        learn_path=str(learn),
        classify_path=str(classify),
        workdir=str(tmp_path),
    )
    assert scores == [0.25, 0.5, 0.75]  # row order preserved
    largv = (tmp_path / "learn.argv").read_text().split()
    cargv = (tmp_path / "classify.argv").read_text().split()
    assert largv[:2] == ["-c", "0.125"]  # svm_rank_learn -c C train model
    assert largv[2].endswith("train.feat") and largv[3].endswith("svm.model")
    # svm_rank_classify test model scores
    assert cargv[0].endswith("test.feat") and cargv[1].endswith("svm.model")
    assert cargv[2].endswith("test.scores")

    # end-to-end through letor_rerank(learner="svm_rank")
    qrels = {("q1", 0): 2, ("q1", 1): 1, ("q1", 2): 0}
    out = letor_rerank(
        letor_index, QUERIES, qrels, QUERIES,
        learner="svm_rank", svm_rank_paths=(str(learn), str(classify)),
    )
    assert len(out["q1"]) == 3

    # non-zero exit → the reference's crash contract
    bad = tmp_path / "bad_learn"
    bad.write_text("#!/bin/sh\nexit 3\n")
    os.chmod(bad, os.stat(bad).st_mode | stat.S_IXUSR)
    with pytest.raises(RuntimeError, match="SVM Rank crashed"):
        svm_rank_hook(
            train_f, {}, test_f, {}, learn_path=str(bad),
            classify_path=str(classify), workdir=str(tmp_path),
        )

    # dormant-by-default: absent binaries raise FileNotFoundError naming the fallback
    with pytest.raises(FileNotFoundError, match="ranksvm"):
        svm_rank_hook(
            train_f, {}, test_f, {},
            learn_path=str(tmp_path / "nope_learn"),
            classify_path=None,
        )
