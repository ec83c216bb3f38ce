"""PBM click model (stages/clicks.py): the co-partitioned bucketed fit is
pinned bit-identical to the driver-side reference fit, partition- and
bucket-count-invariant, and the synthetic log is deterministic."""

import numpy as np
import pandas as pd


def _alpha_frame(ds):
    return (
        ds.to_pandas()
        .sort_values(["qid", "doc_id"])
        .reset_index(drop=True)
        .astype("int64")
    )


def test_pbm_bucketed_equals_driver(ray_session):
    """The round-5 scale-safe fit (α in hash buckets, θ-only driver
    reduce) must be BIT-identical to the round-4 driver-dict fit — the
    equality the verdict asked to pin."""
    from search_engine_framework_ray.stages.clicks import (
        pbm_fit,
        pbm_fit_driver,
        synth_impressions,
    )

    imps = synth_impressions(1000, sessions=200)
    t_b, a_ds = pbm_fit(imps, iters=2, buckets=7)
    t_d, a_d = pbm_fit_driver(imps, iters=2)
    assert t_b == t_d
    want = pd.DataFrame(
        [(q, d, v) for (q, d), v in sorted(a_d.items())],
        columns=["qid", "doc_id", "alpha_micros"],
    ).astype("int64")
    pd.testing.assert_frame_equal(_alpha_frame(a_ds), want)


def test_pbm_fit_partition_and_bucket_invariant(ray_session):
    from search_engine_framework_ray.stages.clicks import pbm_fit, synth_impressions

    imps = synth_impressions(1000, sessions=200)
    t1, a1 = pbm_fit(imps, iters=2, buckets=32)
    t2, a2 = pbm_fit(imps.repartition(13), iters=2, buckets=5)
    assert t1 == t2  # exact-integer EM ⇒ bit-identical
    pd.testing.assert_frame_equal(_alpha_frame(a1), _alpha_frame(a2))

    # examination decays with rank (the position bias the model recovers)
    ranks = sorted(t1)
    assert t1[ranks[0]] > t1[ranks[-1]]
    assert all(0 <= v <= 1_000_000 for v in t1.values())
    av = _alpha_frame(a1)["alpha_micros"]
    assert ((av >= 0) & (av <= 1_000_000)).all()


def test_ips_ctr_bucketed_equals_driver(ray_session):
    from search_engine_framework_ray.stages.clicks import (
        ips_ctr,
        ips_ctr_driver,
        pbm_fit,
        synth_impressions,
    )

    imps = synth_impressions(1000, sessions=200).materialize()
    theta, _ = pbm_fit(imps, iters=2)
    got = (
        ips_ctr(imps, theta, buckets=5)
        .to_pandas()
        .sort_values(["qid", "doc_id"])
        .reset_index(drop=True)
    )
    want = ips_ctr_driver(imps, theta)
    pd.testing.assert_frame_equal(got, want)


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
