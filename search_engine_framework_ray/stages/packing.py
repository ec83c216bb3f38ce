"""Document packing for LM training-data pipelines: assign every document a
``pack_id`` so that packs are filled contiguously in ``id`` order with a
fixed token budget per pack (``pack_id = tokens_before // window`` — the
arithmetic contiguous-fill rule, so a doc straddling a boundary starts the
next region deterministically).

Scale shape — a distributed two-level prefix sum (the same pattern as the
index build's global docid assignment):

1. token counts per doc inside ``map_batches`` (vectorized regex count);
2. coarse ``bucket = id // bucket_size``; per-bucket token totals via ONE
   narrow groupby of (bucket, subtotal) rows;
3. driver prefix-sums the ~n/bucket_size bucket totals (tiny) and
   broadcasts the offsets;
4. a second groupby co-locates each bucket's docs; inside the group a
   sorted cumsum + the bucket offset yields each doc's global
   ``tokens_before`` — per-task memory O(bucket), corpus never touches the
   driver.

The rule is pure arithmetic over the token-count prefix sum, so a SQL
window function (``sum() OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)``)
reproduces it exactly — the driver entry is value-hash verified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .textstats import RE2_TOKEN_RE as _WS_RE  # RE2-aligned tokenizer (oracle parity)


def pack_documents(
    ds: Dataset,
    window: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1024,
) -> Dataset:
    """→ Dataset (id, n_tokens, tokens_before, pack_id, pack_offset).

    ``pack_offset`` = position of the doc's first token inside its pack.
    Docs longer than ``window`` span multiple packs; they are labeled by
    their starting pack (standard contiguous packing)."""
    import ray

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": b[text_col].fillna("").str.count(_WS_RE).astype("int64"),
                "bucket": (ids // bucket_size).astype(np.int64),
            }
        )

    cnt = ds.map_batches(counts, batch_format="pandas").materialize()

    # per-bucket totals (pre-aggregated inside map_batches → tiny shuffle)
    def partials(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("bucket", as_index=False)["n_tokens"].sum()
        return g.rename(columns={"n_tokens": "subtotal"})

    totals = (
        cnt.map_batches(partials, batch_format="pandas")
        .groupby("bucket")
        .map_groups(
            lambda g: pd.DataFrame(
                {"bucket": [g["bucket"].iloc[0]], "total": [int(g["subtotal"].sum())]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("bucket")
    )
    offsets = dict(
        zip(
            totals["bucket"].astype(int),
            np.concatenate([[0], np.cumsum(totals["total"].to_numpy())[:-1]]).astype(int),
        )
    )
    off_ref = ray.put(offsets)

    def label(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values(id_col, kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        before = int(off[int(g["bucket"].iloc[0])]) + np.concatenate(
            [[0], np.cumsum(n)[:-1]]
        )
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "n_tokens": n,
                "tokens_before": before,
                "pack_id": before // window,
                "pack_offset": before % window,
            }
        )

    return cnt.groupby("bucket").map_groups(label, batch_format="pandas")


def chunk_documents(
    ds,
    *,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sliding-window document chunking for embedding / training pipelines
    → (id, chunk_id, start_tok, n_tokens, chunk_fp): windows of ``size``
    whitespace tokens every ``stride`` (overlap = size − stride), the last
    window truncated at the document end; ``chunk_fp`` is the md5-low64
    signed fingerprint of the space-joined chunk text, so a DuckDB twin
    (list slicing over the same RE2 tokens + ``md5_number_lower``)
    certifies every chunk's exact content.

    Pure streaming map over batches; per-chunk work is O(chunk bytes) —
    the unavoidable cost of materializing chunk text (same class as any
    re-serialization). A chunkless empty document emits no rows.
    """
    import hashlib

    import pandas as pd

    from .textstats import RE2_TOKEN_RE

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc": [], "chunk_id": [], "start_tok": [], "n_tokens": [], "chunk_fp": []}
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            toks = RE2_TOKEN_RE.findall(t)
            n = len(toks)
            for c, s in enumerate(range(0, n, stride)):
                piece = " ".join(toks[s : s + size])
                v = int.from_bytes(
                    hashlib.md5(piece.encode("utf-8", "surrogatepass")).digest()[8:],
                    "little",
                )
                out["doc"].append(int(i))
                out["chunk_id"].append(c)
                out["start_tok"].append(s)
                out["n_tokens"].append(min(size, n - s))
                out["chunk_fp"].append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.DataFrame(
            {
                id_col: pd.Series(out["doc"], dtype="int64"),
                "chunk_id": pd.Series(out["chunk_id"], dtype="int64"),
                "start_tok": pd.Series(out["start_tok"], dtype="int64"),
                "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
                "chunk_fp": pd.Series(out["chunk_fp"], dtype="int64"),
            }
        )

    return ds.map_batches(chunk, batch_format="pandas")
