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


def test_sign_flip_randomization_exact():
    """The sig_test enumeration kernel on hand-checkable diffs: with
    d = [10, -10], |sum| = 0 and every one of the 4 sign assignments
    reaches |T| >= 0 -> p = 4/4; with d = [10, 10], T_obs = 20 and only
    the two all-same-sign assignments reach it -> p = 2/4."""
    import numpy as np

    def p_num(d):
        d = np.asarray(d, dtype=np.int64)
        n = len(d)
        masks = np.arange(1 << n, dtype=np.int64)
        signs = 1 - 2 * ((masks[:, None] >> np.arange(n)) & 1)
        t = np.abs(signs @ d)
        return int((t >= abs(int(d.sum()))).sum()), 1 << n

    assert p_num([10, -10]) == (4, 4)
    assert p_num([10, 10]) == (2, 4)
    assert p_num([5, 6, 7, 8]) == (2, 16)  # all positive: only ++++ / ----
    assert p_num([0, 0, 0, 0]) == (16, 16)


def test_bpref_definition():
    """bpref on a 5-doc run, R = 2, rel at ranks 1 and 4: rank-1 hit has
    0 nonrel above (term 1), rank-4 hit has 2 nonrel above, min(2, R)=2
    -> term 1 - 2/2 = 0; bpref = (1 + 0)/2 = 0.5."""
    import numpy as np

    rel = np.array([1, 0, 0, 1, 0], dtype=bool)
    rnk = np.arange(1, 6, dtype=np.int64)
    c = np.cumsum(rel.astype(np.int64))
    r_total = 2
    n_above = (rnk - c)[rel]
    bpref = float(
        (1.0 - np.minimum(n_above, r_total) * 1.0 / r_total).sum() / r_total
    )
    assert bpref == 0.5


def test_err_integer_cascade():
    """The quantized ERR cascade: a single grade-2 doc at rank 1 gives
    R = 3/4 -> 750000 micros exactly; grade-1 at rank 1 then grade-2 at
    rank 2: 250000 + (750000*3)//8 = 531250 micros."""

    def err_micros(rnums):
        prob, acc = 1_000_000, 0
        for r, rn in enumerate(rnums, start=1):
            acc += (prob * rn) // (4 * r)
            prob = (prob * (4 - rn)) // 4
        return acc

    assert err_micros([3]) == 750_000
    assert err_micros([1, 3]) == 250_000 + (750_000 * 3) // 8
    assert err_micros([0, 0, 0]) == 0


def test_kendall_tau_pair_counts():
    """tau-a on reversed rankings is -1e6 micros; identical rankings +1e6;
    one adjacent swap on 4 items: C=5, D=1, tau = (10-6... ) exact."""
    import numpy as np

    def tau_micros(rb):
        rb = np.asarray(rb)
        n = len(rb)
        p = n * (n - 1) // 2
        conc = int(np.triu(rb[:, None] < rb[None, :], 1).sum())
        return round((2 * conc - p) / p * 1e6), conc, p - conc

    assert tau_micros([1, 2, 3, 4]) == (1_000_000, 6, 0)
    assert tau_micros([4, 3, 2, 1]) == (-1_000_000, 0, 6)
    t, c, d = tau_micros([2, 1, 3, 4])  # one adjacent swap
    assert (c, d) == (5, 1) and t == round((2 * 5 - 6) / 6 * 1e6)
