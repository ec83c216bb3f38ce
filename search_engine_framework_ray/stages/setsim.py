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
4. candidates — ``groupby(tok)`` over prefix rows only: in-bucket pairs
   passing the exact length filter ``den·min(na,nb) ≥ num·max`` AND the
   PPJoin positional filter (overlap upper bound from the shared token's
   rank on both sides), vectorized via ``triu_indices``.

Regime note (measured): the prefix filter's pruning power comes from df
SKEW — on real (Zipf) text at high thresholds (t ≥ 0.8) candidates stay
near the true-pair count, while a uniform synthetic vocabulary (every
token df ≈ mean) is its worst case and candidates approach the quadratic
token join. For low thresholds or skewless data, the MinHash-LSH path
(`stages/dedup.py`) is the right tool; this join is the exact-recall
complement for the high-threshold regime, matching how the AllPairs /
PPJoin literature evaluates (t ∈ [0.85, 0.95]).
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
from .join import int_bucket


def _token_set_hashes(text: str) -> np.ndarray:
    """Distinct whitespace-token md5-low64 hashes, sorted uint64.
    Measured: at 60-token docs the md5 loop (1.2 s/20k docs) matches or
    beats both per-doc and batch-level ``pd.util.hash_array`` (3.2 s /
    1.45 s) — string extraction and set-dedup dominate, not hashing — so
    the SQL-reproducible hash (DuckDB ``md5_number_lower``) costs nothing.
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
    hot_token_bound: int | None = 10_000,
) -> pd.DataFrame:
    """All pairs (a < b) with distinct-token Jaccard ≥ num/den, plus the
    exact jaccard. Exact recall (prefix-filter theorem) — SQL-oracle-able
    on the full corpus with no miss-probability argument needed."""
    return _setsim_impl(
        ds, id_col, text_col, threshold, cross=False,
        hot_token_bound=hot_token_bound,
    )


def setsim_cross_pairs(
    ds: Dataset,
    other: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (9, 10),
    hot_token_bound: int | None = 10_000,
) -> pd.DataFrame:
    """Cross-table (R×S) exact set-similarity join: pairs (a ∈ ds,
    b ∈ other) with distinct-token Jaccard ≥ num/den — the decontamination
    shape (held-out set vs training corpus) with exact recall. One
    pipeline serves both tables: each side's ids are encoded into the low
    bit (ids must be < 2^62), the global df order is computed over the
    UNION (one consistent order is all the prefix theorem needs), and
    candidate generation pairs only across sides."""

    def _enc(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            ids = b[id_col].to_numpy(np.int64)
            if ids.size and (
                int(ids.max()) >= (1 << 62) or int(ids.min()) <= -(1 << 62)
            ):
                # ids*2 would overflow int64 SILENTLY (numpy wraps) and
                # corrupt the side encoding — fail loudly instead
                raise ValueError("ids must fit in 62 bits for side encoding")
            return pd.DataFrame(
                {id_col: ids * 2 + side, text_col: b[text_col]}
            )

        return f

    union = ds.map_batches(_enc(0), batch_format="pandas").union(
        other.map_batches(_enc(1), batch_format="pandas")
    )
    out = _setsim_impl(
        union, id_col, text_col, threshold, cross=True,
        hot_token_bound=hot_token_bound,
    )
    out["a"] = out["a"] // 2
    out["b"] = out["b"] // 2
    return out.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)


def containment_join_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (4, 5),
    k_shingle: int = 3,
    min_contained: int = 8,
    hot_token_bound: int | None = 10_000,
) -> pd.DataFrame:
    """Directed containment join (Broder SEQUENCES'97's asymmetric twin of
    Jaccard): all ORDERED pairs (a, b), a ≠ b, with shingle containment
    ``C(A,B) = |A∩B| / |A| ≥ num/den`` and ``|A| ≥ min_contained`` — "a is
    (mostly) contained in b", the quote / boilerplate-superset / partial-
    copy detector that symmetric Jaccard misses (a 50-word quote inside a
    5,000-word page has Jaccard ≈ 0.01 but containment ≈ 1.0).

    Elements are distinct k-word shingles (:func:`dedup._shingles_strict` —
    docs with < k words have none), so a SQL oracle can rebuild the exact
    same sets from ``regexp_extract_all`` slices.

    EXACT recall via the asymmetric prefix-filter theorem: with overlap
    requirement ``o(A) = ceil(t·|A|)``, a qualifying pair shares an element
    within A's first ``|A| − o(A) + 1`` and B's first ``|B| − o(A) + 1``
    elements under one global (df asc, hash asc) order. Because B's bound
    depends on its PARTNER's size, the index keeps each element with rank
    ``< n − o_min + 1`` where ``o_min = ceil(t·min_contained)`` — a superset
    of every valid partner's requirement, so no qualifying pair is missed;
    ``min_contained`` is the operator's semantic floor (a 2-shingle "doc"
    being 100%-contained is noise, and the floor is what bounds the
    container-side prefix at scale). Candidate pruning adds the exact
    integer length filter (``num·|A| ≤ den·|B|``) and the PPJoin-style
    positional bound at the shared element (``den·(1 + min(rem_a, rem_b)) ≥
    num·|A|`` — every true pair passes it at its FIRST shared element and
    pair-level dedup keeps that emission). Verification is the shared
    co-partitioned exact pass (``denom="left"``) — nothing ever funnels
    through the driver.

    Distributed shape: same four narrow shuffles as
    :func:`setsim_join_pairs` (explode → df attach → per-doc prefix →
    per-token candidates), all on (int, int, int) rows.

    Reference tie-in: the reference engine has no similarity join; this is
    LLM-training-data surface (deduplicating quoted/boilerplate-superset
    pages where Jaccard-based near-dup passes them through).
    """
    from .dedup import _shingles_strict, _verify_jaccard_distributed

    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"threshold must be a fraction in (0, 1]: {threshold}")
    if min_contained < 1:
        raise ValueError("min_contained must be >= 1")
    # o_min = ceil(t * min_contained), exact ints
    o_min = -(-(num * min_contained) // den)

    def elems(t: str) -> np.ndarray:
        return _shingles_strict(t, k_shingle)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, ns, toks = [], [], []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            h = elems(t)
            if h.size:
                ids.append(np.full(h.size, int(i), dtype=np.int64))
                ns.append(np.full(h.size, h.size, dtype=np.int64))
                toks.append(h.view(np.int64))
        if not ids:
            return pd.DataFrame(
                {"tok": pd.Series(dtype="int64"),
                 "doc": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "tok": np.concatenate(toks),
                "doc": np.concatenate(ids),
                "n": np.concatenate(ns),
            }
        )

    _BUCKETS = 256

    def _bucketed(col: str):
        def add(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(gb=int_bucket(b[col].to_numpy(np.int64), _BUCKETS))

        return add

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(df=g.groupby("tok")["tok"].transform("size").astype(np.int64))
        return g[["tok", "doc", "n", "df"]]

    with_df = (
        ds.map_batches(explode, batch_format="pandas")
        .map_batches(_bucketed("tok"), batch_format="pandas")
        .groupby("gb")
        .map_groups(attach_df, batch_format="pandas")
    )

    def take_prefix(g: pd.DataFrame) -> pd.DataFrame:
        # retention covers BOTH roles: container prefix n − o_min + 1 is
        # ≥ the contained prefix n − ceil(t·n) + 1 whenever n ≥
        # min_contained (o(n) ≥ o_min), and a doc with n < o_min can't
        # contain any valid A (|A∩B| ≤ n < o_min ≤ o(A)) — its empty
        # retention is correct, not a miss
        g = g.sort_values(["doc", "df", "tok"], kind="mergesort")
        n = g["n"].to_numpy(np.int64)
        rank = g.groupby("doc").cumcount().to_numpy(np.int64)
        g = g.assign(pos=rank)
        return g.loc[rank < n - o_min + 1, ["tok", "doc", "n", "pos"]]

    prefix = (
        with_df.map_batches(_bucketed("doc"), batch_format="pandas")
        .groupby("gb")
        .map_groups(take_prefix, batch_format="pandas")
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        g = g[g.duplicated("tok", keep=False)]
        g = g.sort_values(["tok", "doc"], kind="mergesort")
        _CHUNK = 512

        for _, sub in g.groupby("tok"):
            m = len(sub)
            if hot_token_bound is not None and m > hot_token_bound:
                raise ValueError(
                    f"hot shingle {int(sub['tok'].iloc[0])}: {m:,} prefix "
                    f"occurrences would generate up to ~{m * (m - 1):,} "
                    f"ordered candidate pairs from one shingle (bound "
                    f"{hot_token_bound:,}). Raise the threshold or "
                    f"min_contained (shorter prefixes), or raise "
                    f"hot_token_bound if the workers can hold it."
                )
            docs = sub["doc"].to_numpy(np.int64)
            ns = sub["n"].to_numpy(np.int64)
            ps = sub["pos"].to_numpy(np.int64)
            # contained-side test: n ≥ min_contained AND this element is
            # within A's own (tighter) prefix n − ceil(t·n) + 1
            a_ok = (ns >= min_contained) & (
                ps < ns - (-(-(num * ns) // den)) + 1
            )
            lefts = np.flatnonzero(a_ok)
            if not lefts.size or m < 2:
                continue
            for s in range(0, lefts.size, _CHUNK):
                chunk = lefts[s : s + _CHUNK]
                ii = np.repeat(chunk, m)
                jj = np.tile(np.arange(m), chunk.size)
                sel = ii != jj
                ii, jj = ii[sel], jj[sel]
                na, nb = ns[ii], ns[jj]
                # length filter: ceil(t·n_a) ≤ n_b ⇔ num·n_a ≤ den·n_b
                keep = num * na <= den * nb
                # positional bound at the shared element
                ub = 1 + np.minimum(na - ps[ii] - 1, nb - ps[jj] - 1)
                keep &= den * ub >= num * na
                if keep.any():
                    out_a.append(docs[ii[keep]])
                    out_b.append(docs[jj[keep]])
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = (
        prefix.map_batches(_bucketed("tok"), batch_format="pandas")
        .groupby("gb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])

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
        k_shingle=k_shingle,
        threshold=num / den,
        set_fn=elems,
        threshold_frac=(num, den),
        denom="left",
        out_col="containment",
    ).to_pandas()
    if "a" not in out.columns or not len(out):
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "containment": pd.Series(dtype="float64")}
        )
    return out.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)


def _setsim_impl(
    ds: Dataset,
    id_col: str,
    text_col: str,
    threshold: tuple[int, int],
    *,
    cross: bool,
    hot_token_bound: int | None = 10_000,
) -> pd.DataFrame:
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"threshold must be a fraction in (0, 1]: {threshold}")

    # Tokenize TWICE (here and in the verify stage) rather than once:
    # measured at 100k docs, materializing per-doc token-set lists to
    # share them costs MORE than the saved md5 pass (21.8 s vs 13.7 s) —
    # object-list columns pickle/unpickle ~6M boxed ints through the
    # object store, while re-hashing reads zero-copy parquet strings.
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, ns, toks = [], [], []
        for i, t in zip(b[id_col], b[text_col].fillna("")):
            h = _token_set_hashes(t)
            if h.size:
                ids.append(np.full(h.size, int(i), dtype=np.int64))
                ns.append(np.full(h.size, h.size, dtype=np.int64))
                toks.append(h.view(np.int64))
        if not ids:
            return pd.DataFrame(
                {"tok": pd.Series(dtype="int64"),
                 "doc": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {
                "tok": np.concatenate(toks),
                "doc": np.concatenate(ids),
                "n": np.concatenate(ns),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pandas")

    # Millions of one-token / one-doc groups would pay a per-group Python
    # call each; instead every groupby below keys on a HASH BUCKET (a few
    # hundred groups regardless of corpus size) and vectorizes across the
    # bucket's groups with pandas — the repo's bucketed-vectorized shape
    # (cf. stages/join.py session salting note).
    _BUCKETS = 256

    def _bucketed(col: str):
        def add(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(gb=int_bucket(b[col].to_numpy(np.int64), _BUCKETS))

        return add

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # bucket of whole token-groups ⇒ per-token df = group size
        g = g.assign(df=g.groupby("tok")["tok"].transform("size").astype(np.int64))
        return g[["tok", "doc", "n", "df"]]

    with_df = (
        exploded.map_batches(_bucketed("tok"), batch_format="pandas")
        .groupby("gb")
        .map_groups(attach_df, batch_format="pandas")
    )

    def take_prefix(g: pd.DataFrame) -> pd.DataFrame:
        # global order: (df asc, tok-hash asc) — any consistent total
        # order preserves exact recall; df-ascending maximizes pruning.
        # pos (the token's rank in the doc's sorted order) feeds the
        # positional filter below.
        g = g.sort_values(["doc", "df", "tok"], kind="mergesort")
        p = _prefix_len(g["n"].to_numpy(np.int64), num, den)
        rank = g.groupby("doc").cumcount().to_numpy(np.int64)
        g = g.assign(pos=rank)
        return g.loc[rank < p, ["tok", "doc", "n", "pos"]]

    prefix = (
        with_df.map_batches(_bucketed("doc"), batch_format="pandas")
        .groupby("gb")
        .map_groups(take_prefix, batch_format="pandas")
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        # tokens appearing in ONE prefix can't pair — drop them before the
        # per-token loop (they are the vast majority after prefix pruning)
        g = g[g.duplicated("tok", keep=False)]
        g = g.sort_values(["tok", "doc"], kind="mergesort")
        # 512-row chunks bound the per-token pair-enumeration temporaries
        # to ~chunk·m elements; a group just under hot_token_bound would
        # otherwise materialize multiple O(m²) int64 arrays (GBs) at once
        _CHUNK = 512

        def _emit(sub: pd.DataFrame, ii: np.ndarray, jj: np.ndarray) -> None:
            docs = sub["doc"].to_numpy(np.int64)
            ns = sub["n"].to_numpy(np.int64)
            ps = sub["pos"].to_numpy(np.int64)
            na, nb = ns[ii], ns[jj]
            # length filter: J ≥ t ⇒ t·|larger| ≤ |smaller|
            keep = den * np.minimum(na, nb) >= num * np.maximum(na, nb)
            # PPJoin positional filter (Xiao et al. WWW'08): at the FIRST
            # common token (order-consistent, so it is within both
            # prefixes), overlap ≤ 1 + min(remaining tokens either side);
            # J ≥ t needs overlap ≥ num(na+nb)/(num+den). A later common
            # token may fail this bound spuriously, but the first one
            # passes for every true pair and the pair-level union keeps it.
            ub = 1 + np.minimum(na - ps[ii] - 1, nb - ps[jj] - 1)
            keep &= (num + den) * ub >= num * (na + nb)
            if keep.any():
                out_a.append(docs[ii[keep]])
                out_b.append(docs[jj[keep]])

        # duplicated(keep=False) above guarantees every group has ≥ 2 rows
        for _, sub in g.groupby("tok"):
            m = len(sub)
            if hot_token_bound is not None and m > hot_token_bound:
                # fail LOUDLY with the remedy, not silent O(m²) grind —
                # the join.py check_hot_key convention. A token this
                # frequent in PREFIXES means the df-skew assumption the
                # prefix filter relies on does not hold for this corpus.
                n_pairs = m * m // 4 if cross else m * (m - 1) // 2
                raise ValueError(
                    f"hot token {int(sub['tok'].iloc[0])}: {m:,} prefix "
                    f"occurrences would generate up to ~{n_pairs:,} "
                    f"candidate pairs from one token (bound "
                    f"{hot_token_bound:,}). Raise the threshold (shorter "
                    f"prefixes), use the MinHash-LSH path "
                    f"(stages/dedup.py) for low-skew corpora, or raise "
                    f"hot_token_bound if the workers can hold it."
                )
            if cross:
                # side bit lives in the id's parity; pair across sides only
                docs = sub["doc"].to_numpy(np.int64)
                left = np.flatnonzero(docs % 2 == 0)
                right = np.flatnonzero(docs % 2 == 1)
                if not left.size or not right.size:
                    continue
                for s in range(0, left.size, _CHUNK):
                    chunk = left[s : s + _CHUNK]
                    _emit(
                        sub,
                        np.repeat(chunk, right.size),
                        np.tile(right, chunk.size),
                    )
            else:
                for s in range(0, m - 1, _CHUNK):
                    e = min(s + _CHUNK, m - 1)
                    ii = np.repeat(np.arange(s, e), m)
                    jj = np.tile(np.arange(m), e - s)
                    upper = jj > ii
                    _emit(sub, ii[upper], jj[upper])
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    cand = (
        prefix.map_batches(_bucketed("tok"), batch_format="pandas")
        .groupby("gb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

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
