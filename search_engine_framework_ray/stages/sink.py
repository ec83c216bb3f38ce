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


def write_jsonl_partitioned(
    ds: Dataset,
    out_dir: str,
    by: str,
    *,
    sort_within_by: list[str] | None = None,
) -> pd.DataFrame:
    """JSONL flavor of :func:`write_partitioned` — newline-delimited JSON,
    the standard interchange format LLM training stacks ingest (one object
    per line, shardable by line split). Same atomic temp-dir rename +
    fingerprint manifest per partition, so a crashed export resumes by
    skipping finished partitions.

    Bytes are deterministic: rows optionally ordered by ``sort_within_by``,
    pandas ``to_json(lines=True, force_ascii=True)`` rendering (stable
    column order, ASCII-escaped)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        key = g[by].iloc[0]
        part_dir = os.path.join(out_dir, f"part={key}")
        if sort_within_by:
            g = g.sort_values(sort_within_by, kind="mergesort").reset_index(drop=True)
        data = (
            g.to_json(orient="records", lines=True, force_ascii=True) or ""
        ).encode("utf-8")
        fp = hashlib.sha256(data).hexdigest()
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
        with open(os.path.join(tmp_dir, "data.jsonl"), "wb") as f:
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


def read_jsonl_partitioned(out_dir: str):
    """Read back a :func:`write_jsonl_partitioned` directory as a Dataset
    (complete partitions only — those with a manifest)."""
    import glob

    import ray.data

    files = []
    for man in sorted(glob.glob(os.path.join(out_dir, "part=*", "manifest.json"))):
        files.append(os.path.join(os.path.dirname(man), "data.jsonl"))
    if not files:
        raise FileNotFoundError(f"no complete partitions under {out_dir}")
    return ray.data.read_json(files)


# ----------------------------------------------------------------------------
# Z-order (Morton) layout — multi-column data clustering for range pruning
# ----------------------------------------------------------------------------


def zorder_layout(
    ds: Dataset,
    cols: tuple[str, str],
    *,
    bits: int = 16,
    n_files: int = 16,
    id_col: str = "event_id",
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """Assign every row a Morton (Z-order) key over two integer columns and
    a target file id — the multi-dimensional clustering pass behind
    "OPTIMIZE ZORDER BY" in lakehouse table formats (public: Morton 1966;
    Delta Lake / Iceberg docs): rows close in BOTH columns land in the same
    file, so per-file min/max statistics prune range predicates on EITHER
    column, not just the sort leader.

    → ``(id_col, zkey, file_id)``. Each column is bucketed to ``2^bits``
    cells by pure INTEGER arithmetic over its global (min, max) —
    ``((x - mn) * 2^bits) // (mx - mn + 1)`` — then the two bucket values
    bit-interleave (col A on even bits, col B on odd) into ``zkey``;
    ``file_id = zkey >> (2·bits - log2(n_files))``. Integer-only math means
    a DuckDB twin reproduces every key exactly.

    Scale shape: pass 1 streams per-batch (min, max) partials (2 rows per
    batch) to the driver; pass 2 is embarrassingly parallel. The write side
    composes with :func:`write_partitioned` keyed on ``file_id``, and a
    production variant swaps the linear bucketing for rank buckets from
    ``aggregate.exact_quantiles`` when a column is heavily skewed (linear
    cells degenerate under skew; the interleave and file math are
    unchanged).
    """
    import numpy as np

    if n_files & (n_files - 1):
        raise ValueError("n_files must be a power of two")
    shift = 2 * bits - int(n_files).bit_length() + 1
    a_col, b_col = cols

    def mm_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "col": [a_col, b_col],
                "mn": [b[a_col].min(), b[b_col].min()],
                "mx": [b[a_col].max(), b[b_col].max()],
            }
        )

    p = ds.map_batches(mm_partial, batch_format="pandas").to_pandas()
    g = p.groupby("col")
    mn = {c: int(v) for c, v in g["mn"].min().items()}
    mx = {c: int(v) for c, v in g["mx"].max().items()}
    span_a = mx[a_col] - mn[a_col] + 1
    span_b = mx[b_col] - mn[b_col] + 1
    cells = 1 << bits

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        xa = b[a_col].to_numpy(np.int64)
        xb = b[b_col].to_numpy(np.int64)
        ba = (xa - mn[a_col]) * cells // span_a
        bb = (xb - mn[b_col]) * cells // span_b
        z = np.zeros(len(b), dtype=np.int64)
        for i in range(bits):
            z |= ((ba >> i) & 1) << (2 * i)
            z |= ((bb >> i) & 1) << (2 * i + 1)
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "zkey": z,
                "file_id": z >> shift,
            }
        )
        for c in keep_cols:  # data columns ride along to the write/stats
            out[c] = b[c].to_numpy()
        return out

    return ds.map_batches(assign, batch_format="pandas")
