"""PBM click model (stages/clicks.py): partition invariance of the
integer-EM fit, debiasing direction, and log determinism."""

import numpy as np
import pandas as pd


def test_pbm_fit_partition_invariant(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.clicks import pbm_fit, synth_impressions

    imps = synth_impressions(1000, sessions=200)
    t1, a1 = pbm_fit(imps, iters=2)
    t2, a2 = pbm_fit(imps.repartition(13), iters=2)
    assert t1 == t2 and a1 == a2  # exact-integer EM ⇒ bit-identical

    # examination decays with rank (the position bias the model recovers)
    ranks = sorted(t1)
    assert t1[ranks[0]] > t1[ranks[-1]]
    assert all(0 <= v <= 1_000_000 for v in t1.values())
    assert all(0 <= v <= 1_000_000 for v in a1.values())


def test_synth_impressions_deterministic(ray_session):
    from search_engine_framework_ray.stages.clicks import synth_impressions

    a = synth_impressions(500, sessions=50).to_pandas().sort_values(
        ["session", "rank"]).reset_index(drop=True)
    b = synth_impressions(500, sessions=50).to_pandas().sort_values(
        ["session", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 500
    assert 0 < a["click"].sum() < len(a)  # neither degenerate extreme
    # the interleave shows the same doc at two ranks (PBM identifiability)
    spread = a.groupby(["qid", "doc_id"])["rank"].nunique()
    assert (spread == 2).any()
