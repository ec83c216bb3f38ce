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


def test_zorder_layout_interleave_and_locality(ray_session):
    """Z-order keys: hand-checked interleave on corner points, power-of-two
    validation, and the locality property — per-file bounding boxes cover a
    small fraction of the (a, b) plane on BOTH axes, unlike a single-column
    sort whose files span the full b-range."""
    import numpy as np
    import ray.data

    from search_engine_framework_ray.stages.sink import zorder_layout

    # 64×64 grid, ids row-major: a = i // 64, b = i % 64
    n = 64 * 64
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"event_id": ids, "a": ids // 64, "b": ids % 64})
    ds = ray.data.from_pandas(pdf).repartition(4)

    with pytest.raises(ValueError):
        zorder_layout(ds, ("a", "b"), n_files=12, id_col="event_id")

    out = (
        zorder_layout(ds, ("a", "b"), bits=16, n_files=16, id_col="event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # corners: (0,0) → 0; a-bucket is on EVEN bits, b-bucket on ODD.
    # a=63 → bucket 63·65536//64 = 64512 = 0b1111110000000000 (bits 10-15)
    z = out.set_index("event_id")["zkey"]
    assert z.loc[0] == 0
    a_bits = sum(1 << (2 * i) for i in range(10, 16))
    b_bits = sum(1 << (2 * i + 1) for i in range(10, 16))
    assert z.loc[63 * 64] == a_bits  # (a=63, b=0)
    assert z.loc[63] == b_bits  # (a=0, b=63)
    assert z.loc[63 * 64 + 63] == a_bits | b_bits

    # locality: every file's bounding box spans ≤ 1/2 of each axis, so a
    # range predicate on EITHER column prunes most files (16 files over a
    # square grid → 4×4 quadrants of span 16 = 1/4 per axis)
    j = out.merge(pdf, on="event_id")
    spans = j.groupby("file_id").agg(
        sa=("a", lambda s: s.max() - s.min()),
        sb=("b", lambda s: s.max() - s.min()),
    )
    assert len(spans) == 16
    assert (spans["sa"] <= 32).all()
    assert (spans["sb"] <= 32).all()


def test_jsonl_partitioned_roundtrip_and_resume(ray_session, tmp_path):
    """JSONL sink: lossless roundtrip (unicode + quotes survive the ASCII
    escaping), identical rerun skips, changed rows rewrite."""
    import ray.data

    from search_engine_framework_ray.stages.sink import (
        read_jsonl_partitioned,
        write_jsonl_partitioned,
    )

    out = str(tmp_path / "jl")
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ['say "hi"', "café naïve", "tab\there"],
            "g": ["a", "a", "b"],
        }
    )
    rep = write_jsonl_partitioned(
        ray.data.from_pandas(pdf), out, "g", sort_within_by=["doc_id"]
    )
    assert not rep["skipped"].any() and rep["rows"].sum() == 3
    rep2 = write_jsonl_partitioned(
        ray.data.from_pandas(pdf), out, "g", sort_within_by=["doc_id"]
    )
    assert rep2["skipped"].all()
    changed = pdf.copy()
    changed.loc[2, "text"] = "new"
    rep3 = write_jsonl_partitioned(
        ray.data.from_pandas(changed), out, "g", sort_within_by=["doc_id"]
    )
    st = rep3.set_index("partition")["skipped"]
    assert bool(st.loc["a"]) and not bool(st.loc["b"])
    back = (
        read_jsonl_partitioned(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["text"].tolist() == changed["text"].tolist()
