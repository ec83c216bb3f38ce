"""Distributed query execution: actor pool over mmap'd index shards.

Shape (SURVEY.md §3.1 "new engine equivalent"):

* the driver parses queries, resolves **global** term stats from the
  build-time ``termstats`` store (bucket-pruned parquet reads), and — only
  for queries whose scored leaves are composite (``#NEAR``/``#WINDOW``/
  ``#SYN`` under ``#SCORE``) — runs a cheap stats pre-pass so every shard
  scores with cross-shard (df, ctf);
* a ``(qid, shard)`` work list fans out to a ``map_batches`` actor pool;
  each actor holds ShardReaders (mmap postings + term dict + doclens) loaded
  once and cached LRU;
* each task returns the shard-local top-k (docid tie-break == url tie-break,
  because docid is the global url rank); the driver's final heap merge of
  k·S tiny rows is exact.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd

from ..functions.analysis import config_from_key
from ..state.index_layout import read_stats
from ..state.shard import ShardReader
from .ast import IL_TYPES, Term, iter_score_nodes
from .kernels import Evaluator
from .models import ModelParams


class ShardView:
    """Index-view adapter: ShardReader postings/doclens + GLOBAL collection
    stats (stats.json) so shard-local scores are globally comparable."""

    def __init__(self, reader: ShardReader, stats: dict):
        self.reader = reader
        self.n_docs = int(stats["n_docs"])
        self._fields = stats["fields"]

    def get_postings(self, field, term):
        d, t, po, pf, _, _ = self.reader.get_postings(field, term)
        return d, t, po, pf

    def doclen(self, field, docids):
        return self.reader.doclen(field, docids)

    def sum_doclen(self, field):
        return int(self._fields.get(field, {}).get("sum_doclen", 0))

    def doccount(self, field):
        return int(self._fields.get(field, {}).get("doccount", 0))


class _ShardCache:
    def __init__(self, index_dir: str, maxsize: int = 8):
        self.index_dir = index_dir
        self.stats = read_stats(index_dir)
        self._cache: OrderedDict[int, ShardReader] = OrderedDict()
        self.maxsize = maxsize

    def view(self, shard: int) -> ShardView:
        r = self._cache.get(shard)
        if r is None:
            r = ShardReader(self.index_dir, shard)
            self._cache[shard] = r
            if len(self._cache) > self.maxsize:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(shard)
        return ShardView(r, self.stats)


class StatsPrePassActor:
    """Phase A: per (qid, shard), the local (df, ctf) of every *composite*
    scored leaf — summed across shards by the driver (the reference reads
    these off the evaluated list, QryopSlScore.java:95,136; distributed they
    must be global before scoring)."""

    def __init__(self, index_dir: str, queries_ref):
        import ray

        self.cache = _ShardCache(index_dir)
        self.queries = ray.get(queries_ref)  # qid -> (qtree, params)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"qid": [], "score_id": [], "df": [], "ctf": []}
        for qid, shard in zip(batch["qid"], batch["shard"]):
            qtree, params = self.queries[qid]
            view = self.cache.view(int(shard))
            ev = Evaluator(view, params)
            for sn in iter_score_nodes(qtree):
                if isinstance(sn.child, Term):
                    continue
                inv = ev.eval_il(sn.child)
                out["qid"].append(qid)
                out["score_id"].append(sn.score_id)
                out["df"].append(inv.df)
                out["ctf"].append(inv.ctf)
        return pd.DataFrame(out)


class QueryExecActor:
    """Phase B: evaluate the full tree on one shard, emit shard-local top-k
    ``(qid, docid, url, score)``."""

    def __init__(self, index_dir: str, queries_ref, k: int = 100):
        import ray

        self.cache = _ShardCache(index_dir)
        # qid -> (qtree, params, score_stats)
        self.queries = ray.get(queries_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"qid": [], "docid": [], "url": [], "score": []}
        for qid, shard in zip(batch["qid"], batch["shard"]):
            qtree, params, score_stats = self.queries[qid]
            view = self.cache.view(int(shard))
            ev = Evaluator(view, params, score_stats)
            res = ev.evaluate(qtree)
            n = len(res.docids)
            if n == 0:
                continue
            if params.is_ranked:
                order = np.lexsort((res.docids, -res.scores))[: self.k]
            else:
                order = np.argsort(res.docids)[: self.k]
            docids = res.docids[order]
            scores = res.scores[order]
            urls = view.reader.url_of(docids)
            out["qid"].extend([qid] * len(docids))
            out["docid"].extend(int(d) for d in docids)
            out["url"].extend(urls)
            out["score"].extend(float(s) for s in scores)
        return pd.DataFrame(out)


def load_term_stats(index_dir: str, terms: set[tuple[str, str]]) -> dict:
    """Global (df, ctf) for the given (field, term) pairs from the
    hash-bucketed termstats store — reads only the needed buckets with a
    parquet filter (cheap at any vocabulary size)."""
    import pyarrow.dataset as pads

    from ..sources.corpus import hash_det
    from ..state.index_layout import read_stats, termstats_dir
    import os

    stats = read_stats(index_dir)
    nb = int(stats.get("termstats_buckets", 64))
    by_bucket: dict[int, set[str]] = {}
    for _, term in terms:
        by_bucket.setdefault(hash_det(term) % nb, set()).add(term)
    out: dict[tuple[str, str], tuple[int, int]] = {}
    for b, tset in by_bucket.items():
        path = os.path.join(termstats_dir(index_dir), f"bucket={b:04d}.parquet")
        if not os.path.exists(path):
            continue
        ds = pads.dataset(path)
        tab = ds.to_table(filter=pads.field("term").isin(sorted(tset)))
        for r in tab.to_pylist():
            out[(r["field"], r["term"])] = (int(r["df"]), int(r["ctf"]))
    return {k: v for k, v in out.items() if k in terms}


def resolve_analyzer(index_dir: str):
    return config_from_key(read_stats(index_dir)["analyzer"])


def run_queries(
    index_dir: str,
    queries: list[tuple[str, str]],
    params: ModelParams,
    *,
    k: int = 100,
    concurrency: int | None = None,
) -> dict[str, list[tuple[str, float, int]]]:
    """Run ``[(qid, qtext)]`` against the index; returns
    ``qid → [(url, score, docid)]`` top-k in final rank order.
    Queries that fail to parse or match nothing map to ``[]``."""
    import ray
    import ray.data

    from ..state.index_layout import list_shards
    from .parser import parse_query

    analyzer = resolve_analyzer(index_dir)
    shards = list_shards(index_dir)
    if not shards:
        raise ValueError(f"no shards in {index_dir}")

    trees: dict[str, object] = {}
    for qid, qtext in queries:
        t = parse_query(qtext, params.model, analyzer)
        if t is not None:
            trees[qid] = t

    # global stats for Term scored leaves (from the build-time store)
    need_terms: set[tuple[str, str]] = set()
    composite_qids = []
    for qid, t in trees.items():
        has_composite = False
        for sn in iter_score_nodes(t):
            if isinstance(sn.child, Term):
                need_terms.add((sn.child.fieldname, sn.child.term))
            else:
                has_composite = True
        if has_composite:
            composite_qids.append(qid)
    term_stats = load_term_stats(index_dir, need_terms)

    score_stats: dict[str, dict[int, tuple[int, int]]] = {q: {} for q in trees}
    for qid, t in trees.items():
        for sn in iter_score_nodes(t):
            if isinstance(sn.child, Term):
                score_stats[qid][sn.score_id] = term_stats.get(
                    (sn.child.fieldname, sn.child.term), (0, 0)
                )

    if concurrency is None:
        concurrency = max(1, min(len(shards), 8))

    # Phase A: composite scored leaves → cross-shard (df, ctf)
    if composite_qids:
        ref = ray.put({q: (trees[q], params) for q in composite_qids})
        work = [{"qid": q, "shard": s} for s in shards for q in composite_qids]
        pre = (
            ray.data.from_items(work)
            .map_batches(
                StatsPrePassActor,
                fn_constructor_kwargs={"index_dir": index_dir, "queries_ref": ref},
                batch_format="pandas",
                concurrency=concurrency,
                batch_size=max(1, len(work) // (concurrency * 2) or 1),
            )
            .to_pandas()
        )
        if len(pre):
            agg = pre.groupby(["qid", "score_id"], as_index=False)[["df", "ctf"]].sum()
            for r in agg.itertuples():
                score_stats[r.qid][int(r.score_id)] = (int(r.df), int(r.ctf))

    # Phase B: full evaluation, shard top-k, driver merge
    payload = {q: (trees[q], params, score_stats[q]) for q in trees}
    ref = ray.put(payload)
    work = [{"qid": q, "shard": s} for s in shards for q in trees]
    if not work:
        return {qid: [] for qid, _ in queries}
    rows = (
        ray.data.from_items(work)
        .map_batches(
            QueryExecActor,
            fn_constructor_kwargs={"index_dir": index_dir, "queries_ref": ref, "k": k},
            batch_format="pandas",
            concurrency=concurrency,
            batch_size=max(1, len(work) // (concurrency * 2) or 1),
        )
        .to_pandas()
    )

    results: dict[str, list[tuple[str, float, int]]] = {qid: [] for qid, _ in queries}
    if len(rows):
        for qid, g in rows.groupby("qid"):
            if params.is_ranked:
                g = g.sort_values(
                    ["score", "docid"], ascending=[False, True], kind="mergesort"
                )
            else:
                g = g.sort_values("docid", kind="mergesort")
            g = g.head(k)
            results[str(qid)] = list(
                zip(g["url"], g["score"].astype(float), g["docid"].astype(int))
            )
    return results
