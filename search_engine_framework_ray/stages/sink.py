"""Resumable partitioned-Parquet sink (task-brief scale requirement: never
one giant file; a failed run skips finished partitions on retry).

Layout::

    <out_dir>/
      part=<K>/data.parquet
      part=<K>/manifest.json     # {"rows": N, "fingerprint": ...}

Each partition is written by one task to a temp file and atomically renamed
with its manifest, so a killed job leaves only complete partitions; a rerun
with the same partition fingerprint skips them. The fingerprint is the
caller's choice of partition-content key (row count + column hash by
default — cheap, order-insensitive).
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Dataset


def _serialize_partition(g: pd.DataFrame) -> tuple[bytes, str]:
    """Parquet-serialize the partition in memory → (bytes, sha256). Works
    for any Arrow-expressible column (incl. list types pandas can't hash);
    the bytes are reused for the actual write, so no double serialization."""
    buf = pa.BufferOutputStream()
    pq.write_table(pa.Table.from_pandas(g, preserve_index=False), buf)
    data = buf.getvalue().to_pybytes()
    return data, hashlib.sha256(data).hexdigest()


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    by: str,
    *,
    sort_within_by: list[str] | None = None,
) -> pd.DataFrame:
    """Write ``ds`` as one Parquet file per distinct ``by`` value, atomically
    and resumably. Returns a report frame (partition, rows, skipped).

    ``sort_within_by``: optional column order inside each partition so output
    bytes are deterministic under any task scheduling.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        key = g[by].iloc[0]
        part_dir = os.path.join(out_dir, f"part={key}")
        if sort_within_by:
            g = g.sort_values(sort_within_by, kind="mergesort").reset_index(drop=True)
        data, fp = _serialize_partition(g)
        man_path = os.path.join(part_dir, "manifest.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("fingerprint") == fp:
                return pd.DataFrame(
                    {"partition": [key], "rows": [len(g)], "skipped": [True]}
                )
        tmp_dir = part_dir + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        with open(os.path.join(tmp_dir, "data.parquet"), "wb") as f:
            f.write(data)
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump({"rows": len(g), "fingerprint": fp}, f)
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
        return pd.DataFrame({"partition": [key], "rows": [len(g)], "skipped": [False]})

    return (
        ds.groupby(by)
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
        .sort_values("partition")
        .reset_index(drop=True)
    )


def read_partitioned(out_dir: str):
    """Read back a :func:`write_partitioned` directory as a Dataset (only
    complete partitions — those with a manifest)."""
    import glob

    import ray.data

    files = []
    for man in sorted(glob.glob(os.path.join(out_dir, "part=*", "manifest.json"))):
        files.append(os.path.join(os.path.dirname(man), "data.parquet"))
    if not files:
        raise FileNotFoundError(f"no complete partitions under {out_dir}")
    # partitioning=None: the hive-style part=<K> path segment must not be
    # inferred back as an extra column
    return ray.data.read_parquet(files, partitioning=None)
