"""Local trec_eval metrics (P@k, MAP) vs hand-computed values."""

from search_engine_framework_ray.sources.evalmetrics import (
    average_precision,
    evaluate_run,
    precision_at_k,
    read_qrels_grouped,
)


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
