"""Query spelling correction over the index vocabulary (SymSpell-style
deletes prefilter + exact verify).

The reference engine has no spell correction; real users of a search
engine expect "did you mean". The design is the repo's standard
candidates-by-hash-join-then-verify-exactly shape (cf. MinHash dedup):

1. every query token expands to its 1-delete variants (plus itself) — a
   tiny set, broadcast;
2. ONE streaming pass over the termstats store (the per-bucket
   ``(field, term, df, ctf)`` parquet the build already maintains)
   generates each vocabulary term's 1-delete variants per batch and keeps
   terms sharing a variant with any query token — the classic SymSpell
   bound: sharing a 1-delete variant is NECESSARY for edit distance ≤ 1
   (but not sufficient — e.g. transpositions share variants at distance
   2), so the prefilter can only over-select;
3. the small candidate set is verified with an exact Levenshtein on the
   driver and ranked ``(distance asc, ctf desc, term asc)``.

Scale shape: the vocabulary never leaves the cluster (candidates only
cross), per-batch work is vectorized string slicing, and the broadcast
side is O(query tokens × token length).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _deletes(token: str) -> set[str]:
    return {token} | {token[:i] + token[i + 1 :] for i in range(len(token))}


def levenshtein(a: str, b: str) -> int:
    """Plain DP Levenshtein — DuckDB's ``levenshtein`` semantics (unit
    substitution; transposition costs 2), used only on the verified
    candidate set."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def spell_suggest(
    termstats_ds,
    tokens: list[str],
    *,
    field: str = "body",
    max_distance: int = 1,
    k: int = 3,
) -> pd.DataFrame:
    """→ (qtoken, rank, suggestion, distance, ctf): top-``k`` in-vocabulary
    corrections per query token within ``max_distance`` edits, ranked
    ``(distance asc, ctf desc, term asc)``. ``termstats_ds`` is a Dataset
    over the index's termstats parquet."""
    qvars: dict[str, set[str]] = {t: _deletes(t) for t in tokens}
    allvars = frozenset(v for vs in qvars.values() for v in vs)

    def prefilter(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["field"] == field]
        if not len(b):
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype="object"),
                    "ctf": pd.Series(dtype="int64"),
                }
            )
        terms = b["term"].to_numpy(object)
        keep = np.zeros(len(terms), dtype=bool)
        # vectorized-by-deletion-position: variant i = term minus char i
        maxlen = max((len(t) for t in terms), default=0)
        tser = pd.Series(terms)
        hit = tser.isin(allvars).to_numpy()
        keep |= hit
        for i in range(maxlen):
            var = (tser.str[:i] + tser.str[i + 1 :]).fillna(tser)
            keep |= var.isin(allvars).to_numpy()
        out = b.iloc[keep]
        return pd.DataFrame(
            {"term": out["term"].to_numpy(object), "ctf": out["ctf"].to_numpy(np.int64)}
        )

    cand = termstats_ds.map_batches(prefilter, batch_format="pandas").to_pandas()
    rows = []
    for qt in tokens:
        scored = []
        for term, ctf in zip(cand["term"], cand["ctf"]):
            d = levenshtein(qt, term)
            if d <= max_distance:
                scored.append((d, -int(ctf), term))
        scored.sort()
        for r, (d, negctf, term) in enumerate(scored[:k], start=1):
            rows.append(
                {
                    "qtoken": qt,
                    "rank": r,
                    "suggestion": term,
                    "distance": d,
                    "ctf": -negctf,
                }
            )
    return pd.DataFrame(rows)


def prefix_suggest(
    termstats_ds,
    prefixes: list[str],
    *,
    field: str = "body",
    k: int = 5,
) -> pd.DataFrame:
    """Search-box autocomplete → (prefix, rank, suggestion, ctf): top-``k``
    vocabulary completions per prefix ranked (ctf desc, term asc). One
    streaming termstats pass with a per-batch local top-k combiner per
    prefix (k·n_prefixes·n_batches candidate rows cross, never the
    vocabulary)."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["field"] == field]
        rows = []
        if len(b):
            terms = b["term"].astype(str)
            for p in prefixes:
                m = b[terms.str.startswith(p)]
                m = m.sort_values(
                    ["ctf", "term"], ascending=[False, True], kind="mergesort"
                ).head(k)
                for t, c in zip(m["term"], m["ctf"]):
                    rows.append({"prefix": p, "suggestion": t, "ctf": int(c)})
        return pd.DataFrame(
            rows,
            columns=["prefix", "suggestion", "ctf"],
        ).astype({"ctf": "int64"}) if rows else pd.DataFrame(
            {
                "prefix": pd.Series(dtype="object"),
                "suggestion": pd.Series(dtype="object"),
                "ctf": pd.Series(dtype="int64"),
            }
        )

    cand = termstats_ds.map_batches(local, batch_format="pandas").to_pandas()
    out = []
    for p in prefixes:
        m = cand[cand["prefix"] == p].sort_values(
            ["ctf", "suggestion"], ascending=[False, True], kind="mergesort"
        ).head(k)
        m = m.reset_index(drop=True)
        m["rank"] = np.arange(1, len(m) + 1, dtype=np.int64)
        out.append(m)
    res = pd.concat(out, ignore_index=True) if out else cand
    return res[["prefix", "rank", "suggestion", "ctf"]]


def expand_wildcard(
    termstats_ds,
    prefix: str,
    *,
    field: str = "body",
    max_terms: int = 64,
) -> list[str]:
    """``prefix*`` → the matching vocabulary terms (sorted), via one
    streaming termstats pass with a per-batch prefilter — only matching
    terms ever cross the wire, never the vocabulary. Refuses loudly when
    the expansion exceeds ``max_terms`` (Lucene's maxClauseCount guard:
    an unbounded wildcard over a web vocabulary is a query-of-death, and
    silently truncating it would change semantics)."""
    if not prefix:
        raise ValueError("empty wildcard prefix matches the whole vocabulary")

    def local(b: pd.DataFrame) -> pd.DataFrame:
        if "term" in b.columns and len(b):
            m = b[b["field"] == field]
            m = m[m["term"].astype(str).str.startswith(prefix)]
            return pd.DataFrame({"term": m["term"].astype(str)})
        return pd.DataFrame({"term": pd.Series(dtype="object")})

    got = termstats_ds.map_batches(local, batch_format="pandas").to_pandas()
    terms = sorted(set(got["term"])) if "term" in got.columns else []
    if len(terms) > max_terms:
        raise ValueError(
            f"wildcard '{prefix}*' expands to {len(terms)} terms "
            f"(> max_terms={max_terms}); narrow the prefix"
        )
    return terms


def expand_fuzzy(
    termstats_ds,
    token: str,
    *,
    field: str = "body",
    max_distance: int = 1,
    max_terms: int = 64,
) -> list[str]:
    """Fuzzy term expansion (Lucene FuzzyQuery's enumeration step):
    ``token`` → every vocabulary term within ``max_distance`` edits, via
    one streaming termstats pass. The per-batch SymSpell deletes-variant
    prefilter is EXACT-recall for distance ≤ 1 (two strings within one
    edit share a 1-delete variant), so only candidate terms leave the
    batch; the exact Levenshtein verify also runs inside the batch.
    Distances > 1 would need d-delete neighborhoods — refused loudly
    rather than silently under-recalling. Same loud ``max_terms`` bound as
    the wildcard expansion (Lucene's maxClauseCount)."""
    if max_distance != 1:
        raise ValueError(
            "expand_fuzzy supports max_distance=1 (the 1-delete prefilter "
            "is exact-recall only there); use d-delete neighborhoods for "
            "larger distances"
        )
    if not token:
        raise ValueError("empty fuzzy token")
    qvars = _deletes(token)

    def local(b: pd.DataFrame) -> pd.DataFrame:
        if "term" not in b.columns or not len(b):
            return pd.DataFrame({"term": pd.Series(dtype="object")})
        m = b[b["field"] == field]
        if not len(m):
            return pd.DataFrame({"term": pd.Series(dtype="object")})
        tser = m["term"].astype(str)
        keep = tser.isin(qvars).to_numpy()
        maxlen = int(tser.str.len().max())
        for i in range(maxlen):
            var = (tser.str[:i] + tser.str[i + 1 :]).fillna(tser)
            keep |= var.isin(qvars).to_numpy()
        cand = tser[keep]
        hit = [t for t in cand if levenshtein(token, t) <= max_distance]
        return pd.DataFrame({"term": pd.Series(hit, dtype="object")})

    got = termstats_ds.map_batches(local, batch_format="pandas").to_pandas()
    terms = sorted(set(got["term"])) if "term" in got.columns else []
    if len(terms) > max_terms:
        raise ValueError(
            f"fuzzy '{token}~{max_distance}' expands to {len(terms)} terms "
            f"(> max_terms={max_terms}); raise max_terms or use a rarer "
            f"token"
        )
    return terms


def fuzzy_query(
    termstats_ds,
    token: str,
    *,
    field: str = "body",
    max_distance: int = 1,
    max_terms: int = 64,
) -> str:
    """Rewrite ``token~`` (FuzzyQuery) to the reference algebra:
    ``#SYN(t1 t2 …)`` over the edit-distance expansion — #SYN's position
    merge makes the per-doc tf exactly the count of tokens within
    ``max_distance`` edits of the query token. Same re-parse caveat as
    :func:`wildcard_query` (expansion terms are analyzed vocabulary)."""
    terms = expand_fuzzy(
        termstats_ds, token, field=field,
        max_distance=max_distance, max_terms=max_terms,
    )
    if not terms:
        raise ValueError(
            f"fuzzy '{token}~{max_distance}' matches no vocabulary term"
        )
    suffix = "" if field == "body" else f".{field}"
    return "#SYN(" + " ".join(t + suffix for t in terms) + ")"


def wildcard_query(
    termstats_ds,
    prefix: str,
    *,
    field: str = "body",
    max_terms: int = 64,
) -> str:
    """Rewrite ``prefix*`` to the reference algebra: ``#SYN(t1 t2 …)`` over
    the expansion (Lucene's MultiTermQuery rewrite — #SYN's position merge
    makes the expansion's tf exactly the count of prefix-matching tokens).
    Terms are already-analyzed vocabulary entries, so this string is only
    safe to re-parse under an idempotent analyzer (stems re-stem under
    Porter; route pre-built trees through the executor for stemmed
    configs)."""
    terms = expand_wildcard(
        termstats_ds, prefix, field=field, max_terms=max_terms
    )
    if not terms:
        raise ValueError(f"wildcard '{prefix}*' matches no vocabulary term")
    suffix = "" if field == "body" else f".{field}"
    return "#SYN(" + " ".join(t + suffix for t in terms) + ")"
