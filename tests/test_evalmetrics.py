"""Local trec_eval metrics (P@k, MAP) vs hand-computed values."""

from search_engine_framework_ray.sources.evalmetrics import (
    average_precision,
    dcg_at_k,
    evaluate_run,
    ndcg_at_k,
    precision_at_k,
    read_qrels_grouped,
)


def test_dcg_and_ndcg():
    import math

    # run grades in rank order: 2, 0, 1; judged grades overall: {2, 1, 1}
    gains = [2, 0, 1]
    all_grades = [1, 2, 1]
    dcg = 2 / math.log(2) + 1 / math.log(4)
    assert dcg_at_k(gains, 10) == dcg
    ideal = 2 / math.log(2) + 1 / math.log(3) + 1 / math.log(4)
    assert ndcg_at_k(gains, all_grades, 10) == dcg / ideal
    # perfect ranking → 1.0 exactly
    assert ndcg_at_k([2, 1, 1], all_grades, 10) == 1.0
    # k cuts both run and ideal
    assert ndcg_at_k(gains, all_grades, 1) == 1.0  # 2/ln2 over 2/ln2
    assert ndcg_at_k(gains, [], 10) == 0.0


def test_precision_at_k():
    run = ["a", "b", "c", "d"]
    rel = {"a", "c", "z"}
    assert precision_at_k(run, rel, 1) == 1.0
    assert precision_at_k(run, rel, 2) == 0.5
    assert precision_at_k(run, rel, 4) == 0.5
    # ranks beyond the run are misses
    assert precision_at_k(run, rel, 10) == 0.2


def test_average_precision():
    # relevant at ranks 1 and 3; |relevant| = 3 (one never retrieved)
    run = ["a", "b", "c", "d"]
    rel = {"a", "c", "z"}
    # AP = (1/1 + 2/3) / 3
    assert average_precision(run, rel) == (1.0 + 2 / 3) / 3
    assert average_precision(run, set()) == 0.0
    assert average_precision([], {"a"}) == 0.0


def test_evaluate_run_with_all_row(tmp_path):
    qrels_file = tmp_path / "qrels.txt"
    qrels_file.write_text(
        "1 0 a 1\n1 0 c 2\n1 0 z 1\n"
        "2 0 x 1\n"
        "3 0 nojudge 0\n"   # graded 0 → not relevant
    )
    qrels = read_qrels_grouped(str(qrels_file))
    run = {
        "1": [("a", 9.0), ("b", 8.0), ("c", 7.0)],
        "2": [("y", 5.0), ("x", 4.0)],
        "9": [("a", 1.0)],  # unjudged query → skipped
    }
    m = evaluate_run(run, qrels, ks=(2,))
    assert set(m) == {"1", "2", "all"}
    assert m["1"]["P2"] == 0.5 and m["1"]["map"] == (1.0 + 2 / 3) / 3
    assert m["2"]["P2"] == 0.5 and m["2"]["map"] == 0.5
    assert m["all"]["map"] == (m["1"]["map"] + m["2"]["map"]) / 2


def test_vectorized_entry_kernel_matches_definitions():
    """The driver entry (``__ray_entry__.q_trec_eval``) recomputes P@k/AP as
    a vectorized cumsum kernel; pin it to these reference definitions on a
    run with relevant docs at mixed ranks and unretrieved relevant docs."""
    import numpy as np

    rng = np.random.default_rng(7)
    docs = rng.permutation(200)[:50]  # ranked run of 50 distinct doc ids
    relevant = {int(d) for d in range(200) if d % 9 == 0}  # |rel| = 23

    run = [f"d{d}" for d in docs]
    rel_ids = {f"d{d}" for d in relevant}
    want_ap = average_precision(run, rel_ids)
    want_pk = {k: precision_at_k(run, rel_ids, k) for k in (10, 20, 30)}

    # the entry's kernel arithmetic (cumsum form)
    rel = np.array([int(d) in relevant for d in docs], dtype=np.int64)
    rnk = np.arange(1, len(docs) + 1, dtype=np.int64)
    c = np.cumsum(rel)
    got_ap = float((rel * c / rnk).sum() / len(relevant))
    assert got_ap == want_ap
    for k in (10, 20, 30):
        assert float(rel[rnk <= k].sum() / k) == want_pk[k]


def test_reciprocal_rank():
    from search_engine_framework_ray.sources.evalmetrics import reciprocal_rank

    assert reciprocal_rank(["a", "b", "c"], {"b"}) == 0.5
    assert reciprocal_rank(["a", "b", "c"], {"a", "c"}) == 1.0
    assert reciprocal_rank(["a", "b"], {"z"}) == 0.0
    assert reciprocal_rank([], {"z"}) == 0.0
