"""BM25F — field-weighted BM25 over the multi-field index.

The reference scores each field independently (per-field BM25 features,
LearnToRank.java:358-445); BM25F (Zaragoza et al., CIKM 2004, "Microsoft
Cambridge at TREC-13: Web and HARD tracks") instead folds the fields into
ONE frequency before saturation, which is the standard web-search ranking
for title/body/anchor evidence:

    tf~(t, d)  =  sum_f  w_f * tf(t, f, d) / B_f(d)
    B_f(d)     =  (1 - b) + b * len_f(d) / avglen_f
    score(d)   =  sum_t  idf(t) * tf~ / (k1 + tf~)
    idf(t)     =  ln((N - df_u(t) + 0.5) / (df_u(t) + 0.5))

where ``df_u`` is the cross-field UNION document frequency (a doc counts
once no matter how many fields the term hits).

Distributed shape (same contract as query/executor.py): shards partition
docids, so

* pass 1 — per-shard union-df: each shard merges the term's posting docid
  sets across fields and reports ``len(union)``; the driver SUM over shards
  is the exact global union df (no doc appears in two shards).  One tiny
  (term, count) row per (shard, term).
* pass 2 — scoring: every shard computes tf~ fully vectorized from mmap'd
  postings + per-field doclen arrays using GLOBAL field stats (stats.json
  sum_doclen/doccount — identical on every shard, so scores are globally
  comparable), keeps a local top-k, and the driver merges k*S rows.

Both passes run as ``map_batches`` actor pools holding a ``_ShardCache``
(mmap once per actor, not per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .executor import _ShardCache, list_shards

# field accumulation order is part of the spec: IEEE float addition is not
# associative, so the SQL twin writes the B + title + url + inlink chain in
# exactly this order
FIELD_ORDER = ("body", "title", "url", "inlink")


def _union_df_rows(cache: _ShardCache, terms: list[str], fields, pairs) -> pd.DataFrame:
    out = {"term": [], "df": []}
    for shard in pairs:
        view = cache.view(int(shard))
        for t in terms:
            docs = [
                view.reader.get_postings(f, t, with_positions=False)[0]
                for f in fields
            ]
            docs = [d for d in docs if len(d)]
            n = len(np.unique(np.concatenate(docs))) if docs else 0
            out["term"].append(t)
            out["df"].append(n)
    return pd.DataFrame({"term": out["term"], "df": pd.Series(out["df"], dtype="int64")})


class UnionDfActor:
    def __init__(self, index_dir: str, terms: list[str], fields):
        self.cache = _ShardCache(index_dir)
        self.terms, self.fields = terms, fields

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return _union_df_rows(self.cache, self.terms, self.fields, batch["shard"])


def _score_rows(
    cache: _ShardCache,
    terms: list[str],
    weights: dict[str, float],
    idf: dict[str, float],
    k1: float,
    b: float,
    k: int,
    pairs,
) -> pd.DataFrame:
    out = {"docid": [], "url": [], "score": []}
    fields = [f for f in FIELD_ORDER if f in weights]
    for shard in pairs:
        view = cache.view(int(shard))
        # per-field avg doclen from GLOBAL build-time stats (identical on
        # every shard — cross-shard score comparability, executor.py:37)
        avg = {}
        for f in fields:
            dc = view.doccount(f)
            avg[f] = view.sum_doclen(f) / dc if dc else 0.0
        # union of matching docids across all (term, field) postings
        all_docs = []
        posts = {}  # (term, field) -> (docids, tfs)
        for t in terms:
            for f in fields:
                d, tf, _, _, _, _ = view.reader.get_postings(f, t, with_positions=False)
                if len(d):
                    posts[(t, f)] = (d, tf)
                    all_docs.append(d)
        if not all_docs:
            continue
        union = np.unique(np.concatenate(all_docs))
        score = np.zeros(len(union), dtype=np.float64)
        for t in terms:
            tft = np.zeros(len(union), dtype=np.float64)
            for f in fields:  # FIELD_ORDER accumulation (see module doc)
                if (t, f) not in posts or not avg[f]:
                    continue
                d, tf = posts[(t, f)]
                bf = (1.0 - b) + b * (
                    view.doclen(f, d).astype(np.float64) / avg[f]
                )
                tft[np.searchsorted(union, d)] += (weights[f] * tf.astype(np.float64)) / bf
            m = tft > 0
            score[m] += idf[t] * (tft[m] / (k1 + tft[m]))
        order = np.lexsort((union, -score))[:k]
        docids = union[order]
        out["docid"].extend(int(d) for d in docids)
        out["url"].extend(view.reader.url_of(docids))
        out["score"].extend(float(s) for s in score[order])
    return pd.DataFrame(
        {
            "docid": pd.Series(out["docid"], dtype="int64"),
            "url": pd.Series(out["url"], dtype="object"),
            "score": pd.Series(out["score"], dtype="float64"),
        }
    )


class Bm25fActor:
    def __init__(self, index_dir: str, spec_ref):
        import ray

        self.cache = _ShardCache(index_dir)
        self.spec = ray.get(spec_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = self.spec
        return _score_rows(
            self.cache, s["terms"], s["weights"], s["idf"],
            s["k1"], s["b"], s["k"], batch["shard"],
        )


def bm25f_topk(
    index_dir: str,
    terms: list[str],
    weights: dict[str, float],
    *,
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """→ (docid, url, score) global top-k, (score desc, docid) order."""
    import ray
    import ray.data

    shards = list_shards(index_dir)
    if not shards:
        raise ValueError(f"no shards in {index_dir}")
    if concurrency is None:
        concurrency = max(1, min(len(shards), 8))
    fields = [f for f in FIELD_ORDER if f in weights]
    work = [{"shard": s} for s in shards]
    bsz = max(1, len(work) // (concurrency * 2) or 1)

    local = (
        ray.data.from_items(work)
        .map_batches(
            UnionDfActor,
            fn_constructor_kwargs={"index_dir": index_dir, "terms": terms, "fields": fields},
            batch_format="pandas",
            concurrency=(1, concurrency),
            batch_size=bsz,
        )
        .to_pandas()
    )
    n_docs = _ShardCache(index_dir).stats["n_docs"]
    gdf = local.groupby("term")["df"].sum() if len(local) else pd.Series(dtype="int64")
    idf = {
        t: float(np.log((n_docs - int(gdf.get(t, 0)) + 0.5) / (int(gdf.get(t, 0)) + 0.5)))
        for t in terms
    }

    spec_ref = ray.put(
        {"terms": terms, "weights": weights, "idf": idf, "k1": k1, "b": b, "k": k}
    )
    rows = (
        ray.data.from_items(work)
        .map_batches(
            Bm25fActor,
            fn_constructor_kwargs={"index_dir": index_dir, "spec_ref": spec_ref},
            batch_format="pandas",
            concurrency=(1, concurrency),
            batch_size=bsz,
        )
        .to_pandas()
    )
    return (
        rows.sort_values(["score", "docid"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
