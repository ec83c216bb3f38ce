"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin
family: Chaudhuri et al. ICDE'06, Xiao et al. WWW'08).

Finds ALL document pairs whose distinct-whitespace-token Jaccard meets a
threshold — EXACT recall, unlike the MinHash-LSH path (`stages/dedup.py`),
which trades a provably-tiny miss probability for fewer candidates. The
prefix-filter theorem does the pruning instead: order every document's
token set by one global total order (ascending document frequency, rarest
first — ties by token hash) and keep only the first
``p = n - ceil(t*n) + 1`` tokens; two sets with Jaccard ≥ t MUST share at
least one prefix token, so grouping prefix tokens finds every qualifying
pair while frequent tokens (which would explode a naive token join) almost
never occupy a prefix slot.

Distributed shape (every shuffle moves narrow int rows only):

1. explode    — one corpus pass → (tok, doc_id, n) per DISTINCT token.
2. df-attach  — ``groupby(tok)``: group size IS the token's df; emit the
   rows back with df attached. (A pathologically hot token makes a group
   of df rows of 3 ints — at 1B docs a stopword group is ~24 GB; the
   production remedy is splitting off a broadcast df map for the top-k
   hottest tokens, documented here, not needed below ~100M docs/group.)
3. prefix     — ``groupby(doc_id)``: sort the doc's tokens by (df, tok),
   keep the first p. This is the step that makes frequent tokens
   disappear from candidate generation.
4. candidates — ``groupby(tok)`` over prefix rows only: all in-bucket
   pairs passing the exact length filter ``den·min(na,nb) ≥ num·max``
   (J ≥ t ⇒ t·|larger| ≤ |smaller|), vectorized via ``triu_indices``.
5. dedup + verify — unique pairs, then the shared co-partitioned exact
   verifier (:func:`dedup._verify_jaccard_distributed` with a token-set
   extractor and an integer-arithmetic threshold, so boundary pairs
   compare identically to an integer SQL oracle).

Tokens travel as md5-low64 hashes (:func:`dedup._md5_hash64` — DuckDB's
``md5_number_lower``), a bijection on real vocabularies, so set
intersections equal string-token intersections and a plain SQL token join
is a valid oracle.

Reference tie-in: the reference engine has no similarity join; this is
part of the LLM-training-data surface (near-dup mining with exact recall,
the verification pass behind MinHash audits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .dedup import (
    _md5_hash64,
    _verify_jaccard_distributed,
    _with_pair_bucket,
)


def _token_set_hashes(text: str) -> np.ndarray:
    """Distinct whitespace-token md5-low64 hashes, sorted uint64.
    RE2-aligned whitespace class (textstats.RE2_TOKEN_RE) so a DuckDB
    ``regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')`` oracle sees the same
    tokens on ANY input, not just single-space fixtures."""
    from .textstats import RE2_TOKEN_RE

    toks = set(RE2_TOKEN_RE.findall(text))
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.fromiter(
        (_md5_hash64(t) for t in toks), dtype=np.uint64, count=len(toks)
    ))


def _prefix_len(n: np.ndarray, num: int, den: int) -> np.ndarray:
    """Prefix length n - ceil(t*n) + 1 for t = num/den, exact int math."""
    return n - (-(-(num * n) // den)) + 1


def setsim_join_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (3, 5),
    concurrency: int = 4,
) -> pd.DataFrame:
    """All pairs (a < b) with distinct-token Jaccard ≥ num/den, plus the
    exact jaccard. Exact recall (prefix-filter theorem) — SQL-oracle-able
    on the full corpus with no miss-probability argument needed."""
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"threshold must be a fraction in (0, 1]: {threshold}")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            h = _token_set_hashes(t)
            if h.size:
                ids.append(np.full(h.size, int(i), dtype=np.int64))
                toks.append(h.view(np.int64))
        if not ids:
            return pd.DataFrame(
                {"tok": pd.Series(dtype="int64"),
                 "doc": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        doc = np.concatenate(ids)
        out = pd.DataFrame({"tok": np.concatenate(toks), "doc": doc})
        out["n"] = out.groupby("doc")["doc"].transform("size").astype(np.int64)
        return out

    exploded = ds.map_batches(explode, batch_format="pandas")

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # group = all (doc, n) rows of one token ⇒ df = group size
        return g.assign(df=np.int64(len(g)))

    with_df = exploded.groupby("tok").map_groups(attach_df, batch_format="pandas")

    def take_prefix(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].iloc[0])
        p = int(_prefix_len(np.int64(n), num, den))
        if p <= 0:
            return g.iloc[0:0][["tok", "doc", "n"]]
        # global order: (df asc, tok-hash asc) — any consistent total
        # order preserves exact recall; df-ascending maximizes pruning
        g = g.sort_values(["df", "tok"], kind="mergesort")
        return g.iloc[:p][["tok", "doc", "n"]]

    prefix = with_df.groupby("doc").map_groups(take_prefix, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = len(g)
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )
        if m < 2:
            return empty
        g = g.sort_values("doc", kind="mergesort")
        docs = g["doc"].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        ii, jj = np.triu_indices(m, k=1)
        na, nb = ns[ii], ns[jj]
        keep = den * np.minimum(na, nb) >= num * np.maximum(na, nb)
        if not keep.any():
            return empty
        return pd.DataFrame({"a": docs[ii[keep]], "b": docs[jj[keep]]})

    cand = prefix.groupby("tok").map_groups(bucket_pairs, batch_format="pandas")

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])

    # a pair surfaces once per shared prefix token → dedup on the pair
    # bucket (the same key the verifier co-partitions on), then verify
    cand = (
        cand.map_batches(_with_pair_bucket, batch_format="pandas")
        .groupby("pb")
        .map_groups(uniq, batch_format="pandas")
        .materialize()
    )

    out = _verify_jaccard_distributed(
        ds,
        cand,
        id_col=id_col,
        text_col=text_col,
        k_shingle=1,  # unused: set_fn overrides
        threshold=num / den,
        set_fn=_token_set_hashes,
        threshold_frac=(num, den),
    ).to_pandas()
    if "a" not in out.columns or not len(out):
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    return out.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)
