"""Impact-ordered quantized index (Anh & Moffat 2005): quantization replay
parity vs an in-test brute force, level bounds, and fingerprint resume."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.functions.analysis import PLAIN_ANALYZER
from search_engine_framework_ray.pipelines.impact import (
    build_impact_index,
    impact_topk,
)

TEXTS = [
    "apple banana apple cherry",
    "banana cherry date",
    "apple apple apple banana",
    "cherry date egg fig",
    "apple egg",
]


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("impact")
    src = root / "docs.parquet"
    pq.write_table(pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS}), src)
    out = build_impact_index(
        str(src), str(root / "store"), analyzer=PLAIN_ANALYZER
    )
    return out


def _brute_quantized():
    n = len(TEXTS)
    toks = [t.split() for t in TEXTS]
    dls = [len(t) for t in toks]
    avg = sum(dls) / float(n)
    tf = {}
    for d, ts in enumerate(toks):
        for t in ts:
            tf[(t, d)] = tf.get((t, d), 0) + 1
    df = {}
    for (t, d) in tf:
        df[t] = df.get(t, 0) + 1
    imp = {
        k: math.log((n - df[k[0]] + 0.5) / (df[k[0]] + 0.5))
        * (v / (v + 1.2 * ((1 - 0.75) + 0.75 * (dls[k[1]] / avg))))
        for k, v in tf.items()
    }
    lo, hi = min(imp.values()), max(imp.values())
    return {
        k: min(int(np.floor((x - lo) / (hi - lo) * 255)), 255)
        for k, x in imp.items()
    }


def _store_files(store):
    import glob

    return sorted(glob.glob(os.path.join(store, "part=*", "data.parquet")))


def test_quantization_matches_brute_force(store):
    import pyarrow.dataset as pads

    dset = pads.dataset(_store_files(store))
    got = dset.to_table(columns=["term", "doc_id", "qimpact"]).to_pandas()
    want = _brute_quantized()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r["term"], int(r["doc_id"]))] == int(r["qimpact"])
    assert got["qimpact"].between(0, 255).all()
    assert got["qimpact"].max() == 255  # global max lands on the top level


def test_impact_topk_integer_sum(store):
    want = _brute_quantized()
    sums = {}
    for (t, d), q in want.items():
        if t in ("apple", "banana"):
            sums[d] = sums.get(d, 0) + q
    expect = sorted(sums.items(), key=lambda kv: (-kv[1], kv[0]))
    out = impact_topk(store, ["apple", "banana"], k=10)
    assert list(zip(out["doc_id"], out["impact_sum"])) == expect


def test_resume_is_noop(store):
    mtimes = {f: os.path.getmtime(f) for f in _store_files(store)}
    build_impact_index(
        os.path.join(os.path.dirname(store), "docs.parquet"),
        store,
        analyzer=PLAIN_ANALYZER,
    )
    assert mtimes == {f: os.path.getmtime(f) for f in _store_files(store)}
