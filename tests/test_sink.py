"""Resumable partitioned-Parquet sink: atomic partitions, skip-if-done,
fingerprint invalidation, deterministic bytes."""

import glob
import os

import pandas as pd
import pytest


@pytest.fixture()
def events_ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")


def test_write_skip_and_invalidate(events_ds, tmp_path, ray_session):
    import ray.data

    from search_engine_framework_ray.stages.sink import (
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "out")
    r1 = write_partitioned(events_ds, out, by="event_type", sort_within_by=["event_id"])
    assert not r1["skipped"].any()
    n_parts = len(r1)
    assert n_parts == len(glob.glob(os.path.join(out, "part=*")))

    # rerun: every partition skipped, bytes untouched
    mtimes = {p: os.path.getmtime(p) for p in glob.glob(os.path.join(out, "part=*", "data.parquet"))}
    r2 = write_partitioned(events_ds, out, by="event_type", sort_within_by=["event_id"])
    assert r2["skipped"].all()
    assert mtimes == {p: os.path.getmtime(p) for p in mtimes}

    # read-back equals input
    got = read_partitioned(out).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = events_ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])

    # changed data for one partition → only that partition rewritten
    first_type = r1["partition"].iloc[0]
    changed = events_ds.map_batches(
        lambda b, ft=first_type: b.assign(
            value=b["value"].where(b["event_type"] != ft, b["value"] + 1)
        ),
        batch_format="pandas",
    )
    r3 = write_partitioned(changed, out, by="event_type", sort_within_by=["event_id"])
    rewritten = set(r3[~r3["skipped"]]["partition"])
    assert rewritten == {first_type}


def test_read_partitioned_empty_raises(tmp_path, ray_session):
    from search_engine_framework_ray.stages.sink import read_partitioned

    with pytest.raises(FileNotFoundError):
        read_partitioned(str(tmp_path / "nothing"))
