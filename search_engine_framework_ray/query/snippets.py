"""Best-window snippet extraction for ranked results.

A search surface the reference stops short of (its output ends at the
TREC run file, `QryEval.java` writeResults): given a query's top-k docs,
find each doc's best fixed-width token window — the window holding the
most query-term occurrences, earliest window winning ties — and emit it
as the display snippet.

Scale shape: the top-k (doc_id → rank) map is broadcast (k rows); ONE
streaming ``map_batches`` pass over the corpus filters to those ids and
computes windows only for matched rows, so per-batch work is bounded by
k, not corpus size, and the corpus never reaches the driver. The window
scan itself is a cumsum difference (O(L) per matched doc).

Tokens are lowercased via the RE2-aligned ASCII whitespace class shared
with the DuckDB oracles (``regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')``
+ ``lower()``), so the SQL twin reproduces window scores AND snippet
strings byte-for-byte.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from ..stages.textstats import RE2_TOKEN_RE

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def best_window(tokens: list[str], terms: set[str], width: int) -> tuple[int, int]:
    """→ (start, score): 1-based start of the best ``width``-token window
    (most query-term hits, earliest on ties) and its hit count. Documents
    shorter than ``width`` are one whole-doc window at start 1."""
    n = len(tokens)
    hits = np.fromiter((t in terms for t in tokens), dtype=np.int64, count=n)
    if n <= width:
        return 1, int(hits.sum())
    c = np.concatenate([[0], np.cumsum(hits)])
    scores = c[width:] - c[: n - width + 1]  # score of starts 0..n-width
    s = int(np.argmax(scores))  # argmax takes the FIRST max → earliest
    return s + 1, int(scores[s])


def _out_schema(id_col: str):
    import pyarrow as pa

    return pa.schema(
        [
            (id_col, pa.int64()),
            ("rnk", pa.int64()),
            ("win_start", pa.int64()),
            ("win_score", pa.int64()),
            ("snippet", pa.string()),
        ]
    )


def snippet_batch(
    b: pd.DataFrame,
    doc_ranks: dict[int, int],
    terms: set[str],
    width: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-batch kernel: rows whose id is in the broadcast top-k map get
    their best window; everything else is dropped. Work per batch is
    O(matched docs), bounded by k. Returns an Arrow table (typed even
    when empty — most batches match nothing)."""
    import pyarrow as pa

    m = b[b[id_col].isin(doc_ranks)]
    rows = []
    for did, text in zip(m[id_col].to_numpy(), m[text_col].fillna("")):
        toks = [t.lower() for t in RE2_TOKEN_RE.findall(text)]
        start, score = best_window(toks, terms, width)
        rows.append(
            {
                id_col: int(did),
                "rnk": int(doc_ranks[int(did)]),
                "win_start": start,
                "win_score": score,
                "snippet": " ".join(toks[start - 1 : start - 1 + width]),
            }
        )
    return pa.Table.from_pylist(rows, schema=_out_schema(id_col))


def snippets_for_topk(
    ds: "ray.data.Dataset",
    doc_ranks: dict[int, int],
    terms: set[str],
    width: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Streaming snippet pass: broadcast the (doc_id → rank) top-k map,
    one ``map_batches`` over the corpus."""

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        return snippet_batch(
            b, doc_ranks, terms, width, text_col=text_col, id_col=id_col
        )

    return ds.map_batches(kernel, batch_format="pandas")
