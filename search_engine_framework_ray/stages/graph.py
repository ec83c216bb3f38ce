"""Link-graph analytics: distributed PageRank over an edge Dataset.

The reference engine CONSUMES PageRank as a per-document feature file
(``LearnToRank.java`` reads ``extid \\t score``; our
``pipelines/letor.py:read_score_file`` mirrors it). At Common-Crawl scale
the score file itself has to come from somewhere — this stage computes it
from the crawl's link graph, producing exactly the table the LeToR feature
join expects (``pipelines/letor.py:scores_from_dataset`` is the handoff).

Execution shape — the canonical data-parallel PageRank, expressed with the
repo's tagged-union co-partition pattern (``stages/join.py`` style) rather
than ``Dataset.join``: Ray's hash-join finalize cannot handle a partition
whose build side came up empty (pyarrow "no match for FieldRef" on a
schema-less table), which any skewed or small key domain can produce.
Bucketed groupbys have no such failure mode and skip the join's aggregator
actor spin-up besides.

* ONE setup shuffle: edges tagged and bucketed by ``hash(src) % B``; a
  vectorized in-bucket ``transform("size")`` attaches each src's
  out-degree (all rows of a src share its bucket by construction).
* Per iteration, TWO bucket shuffles over narrow rows:
  1. ranks (bucketed by the SAME key hash) union the prepared edges;
     per-bucket vectorized lookup emits ``(dst, rank//deg)`` contribution
     rows — nullable-Int64 transport, so ranks above 2^53 survive the
     missing-src path unscathed;
  2. contributions union per-node zero rows (the left-outer-join
     equivalent that keeps dangling/unlinked nodes in the vector), then a
     per-bucket int64 groupby-sum applies the damped update inline.

Ranks are materialized once per iteration (the plan would otherwise grow
multiplicatively), mirroring the Lloyd-iteration pattern in
``stages/ann.py:kmeans_clusters``.

Numerics — exact-parity integer arithmetic: ranks are int64 MICRO-units,
per-edge contributions use floor division (``rank // out_degree``) and the
damping update is ``teleport + damp_num * s // damp_den``. Every reduce is
an int64 pandas groupby-sum — exact regardless of partitioning or order —
so the whole computation is bit-reproducible and the driver hash-compares
it against a DuckDB twin. (Float PageRank would drift last-bits with
summation order.) Node ids may be int64 OR strings (urls): keys only flow
through hashes and groupbys; arithmetic touches rank values alone.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

__all__ = ["link_graph", "pagerank", "hits", "connected_components", "triangle_counts"]


def link_graph(corpus_paths: str | list[str]) -> ray.data.Dataset:
    """Anchor edge list ``(src, dst)`` (source url → link target) from a
    Common-Crawl-shaped HTML corpus, via the same ``ExtractStage`` the
    index build uses (one streaming pass, html dropped at extraction).
    Feeds :func:`pagerank` directly — node ids are urls — completing the
    crawl → link graph → PageRank → LeToR-feature-file lifecycle the
    reference starts from a precomputed score file (LearnToRank.java
    pagerank feature)."""
    from ..pipelines.build_index import ExtractStage

    ds = ray.data.read_parquet(corpus_paths, columns=["url", "html", "lang"])
    ds = ds.map_batches(ExtractStage(), batch_format="pyarrow")

    def edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["kind"], "a"))
        return pa.table({"src": t["src"], "dst": t["url"]})

    return ds.map_batches(edges, batch_format="pyarrow")


def _key_buckets(vals: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic vectorized key→bucket (fixed-key siphash; engine-side
    routing only, never part of a result)."""
    return (pd.util.hash_array(vals.astype(object)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _rebase(d: ray.data.Dataset) -> ray.data.Dataset:
    """Execute and RESET LINEAGE: hand the materialized pandas block refs
    to a fresh dataset (zero-copy, blocks stay in the object store).
    ``materialize()`` alone keeps the full logical plan, and an iterative
    dataflow that unions its own output back in doubles that plan every
    round — measured on a 100k-node connected-components run: executions
    stayed at 2-7 s while the DRIVER burned 47 s, then 77 s, then minutes
    of plan construction between executions by round ~13."""
    return ray.data.from_pandas_refs(d.materialize().to_pandas_refs())


def pagerank(
    edges: ray.data.Dataset,
    *,
    nodes: ray.data.Dataset | None = None,
    iters: int = 3,
    base_micros: int = 1_000_000,
    teleport_micros: int = 150_000,
    damp_num: int = 85,
    damp_den: int = 100,
    n_buckets: int = 64,
    seed_pred=None,
) -> ray.data.Dataset:
    """Power-iteration PageRank over ``edges`` (columns ``src``, ``dst``;
    int64 or string node ids). Returns a Dataset ``(node, rank_micros)``.

    ``seed_pred`` (optional): a vectorized ``node array → bool array``
    predicate selecting teleport targets — PERSONALIZED PageRank (random
    walk with restart to the seed set; Page et al. 1999 §6, the
    related-pages / recommendation scorer): non-seeds get NO teleport
    mass, so rank concentrates by proximity to the seeds. ``None`` =
    uniform teleport (classic PageRank). Integer arithmetic either way.

    ``nodes`` (single column ``node``) fixes the node universe — pass it
    when it is already known (e.g. every doc_id) to skip a distinct-scan of
    the edge list. The edge list defines mass flow: a ``dst`` id absent
    from ``nodes`` still accumulates rank (pre-filter the edges if a strict
    universe is required). ``n_buckets`` sizes the co-partition reduce
    groups (≈ cluster cores at scale).
    """
    if nodes is None:
        srcs = edges.select_columns(["src"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        dsts = edges.select_columns(["dst"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        nodes = srcs.union(dsts).groupby("node").count().select_columns(["node"])

    # ---- setup: edges bucketed by src hash, out-degree attached in-bucket
    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        if "src" not in b.columns or not len(b):
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype="object"),
                    "dst": pd.Series(dtype="object"),
                    "deg": pd.Series(dtype="int64"),
                    "r": pd.Series(dtype="int64"),
                    "kind": pd.Series(dtype="object"),
                    "kbucket": pd.Series(dtype="int64"),
                }
            )
        key = b["src"].to_numpy()
        return pd.DataFrame(
            {
                "key": key,
                "dst": b["dst"].to_numpy(),
                "deg": np.zeros(len(b), dtype=np.int64),
                "r": np.zeros(len(b), dtype=np.int64),
                "kind": np.full(len(b), "e", dtype=object),
                "kbucket": _key_buckets(key, n_buckets),
            }
        )

    def add_deg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["deg"] = g.groupby("key")["key"].transform("size").astype(np.int64)
        return g

    edges_t = (
        edges.map_batches(tag_edges, batch_format="pandas")
        .groupby("kbucket")
        .map_groups(add_deg, batch_format="pandas")
        .materialize()
    )

    # ---- per-node constant rows: initial ranks and the zero-contribution
    # rows that stand in for a left outer join (dangling/unlinked nodes)
    def tag_nodes(b: pd.DataFrame, rank: int, kind: str) -> pd.DataFrame:
        if "node" not in b.columns or not len(b):
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype="object"),
                    "dst": pd.Series(dtype="object"),
                    "deg": pd.Series(dtype="int64"),
                    "r": pd.Series(dtype="int64"),
                    "kind": pd.Series(dtype="object"),
                    "kbucket": pd.Series(dtype="int64"),
                }
            )
        key = b["node"].to_numpy()
        return pd.DataFrame(
            {
                "key": key,
                "dst": key,  # self-filler: same dtype, ignored by kernels
                "deg": np.ones(len(b), dtype=np.int64),
                "r": np.full(len(b), rank, dtype=np.int64),
                "kind": np.full(len(b), kind, dtype=object),
                "kbucket": _key_buckets(key, n_buckets),
            }
        )

    nodes = nodes.materialize()
    zeros = nodes.map_batches(
        lambda b: tag_nodes(b, 0, "z"), batch_format="pandas"
    ).materialize()
    ranks = nodes.map_batches(
        lambda b: tag_nodes(b, base_micros, "r"), batch_format="pandas"
    ).materialize()

    def emit_contribs(g: pd.DataFrame) -> pd.DataFrame:
        """One key bucket: rank rows + edge rows → (dst, rank//deg)."""
        rmap = g.loc[g["kind"] == "r"].set_index("key")["r"]
        e = g.loc[g["kind"] == "e"]
        out_cols = {
            "key": pd.Series(dtype="object"),
            "dst": pd.Series(dtype="object"),
            "deg": pd.Series(dtype="int64"),
            "r": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype="object"),
            "kbucket": pd.Series(dtype="int64"),
        }
        if not len(e):
            return pd.DataFrame(out_cols)
        # nullable Int64: a missing src rank must not round-trip through
        # float64 (ranks can exceed 2^53 at extreme node counts)
        rr = rmap.reindex(e["key"]).astype("Int64")
        keep = rr.notna().to_numpy()
        if not keep.any():
            return pd.DataFrame(out_cols)
        node = e["dst"].to_numpy()[keep]
        s = rr.to_numpy(dtype=np.int64, na_value=0)[keep] // e["deg"].to_numpy(
            np.int64
        )[keep]
        return pd.DataFrame(
            {
                "key": node,
                "dst": node,
                "deg": np.ones(len(node), dtype=np.int64),
                "r": s,  # contribution mass rides the rank column
                "kind": np.full(len(node), "c", dtype=object),
                "kbucket": _key_buckets(node, n_buckets),
            }
        )

    def reduce_ranks(g: pd.DataFrame) -> pd.DataFrame:
        """One node bucket: contributions + zero rows → damped new ranks
        (int64 pandas groupby-sum: exact, order-independent)."""
        s = g.groupby("key", sort=False, as_index=False)["r"].sum()
        key = s["key"].to_numpy()
        tele = (
            np.where(seed_pred(key), teleport_micros, 0).astype(np.int64)
            if seed_pred is not None
            else teleport_micros
        )
        r = tele + damp_num * s["r"].to_numpy(np.int64) // damp_den
        return pd.DataFrame(
            {
                "key": key,
                "dst": key,
                "deg": np.ones(len(key), dtype=np.int64),
                "r": r,
                "kind": np.full(len(key), "r", dtype=object),
                "kbucket": _key_buckets(key, n_buckets),
            }
        )

    for _ in range(iters):
        contribs = (
            ranks.union(edges_t)
            .groupby("kbucket")
            .map_groups(emit_contribs, batch_format="pandas")
        )
        ranks = _rebase(
            contribs.union(zeros)
            .groupby("kbucket")
            .map_groups(reduce_ranks, batch_format="pandas")
        )

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        if "key" not in b.columns or not len(b):
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="object"),
                    "rank_micros": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {"node": b["key"].to_numpy(), "rank_micros": b["r"].to_numpy(np.int64)}
        )

    return ranks.map_batches(finalize, batch_format="pandas")


def connected_components(
    edges: ray.data.Dataset,
    *,
    nodes: ray.data.Dataset | None = None,
    n_buckets: int = 64,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Undirected connected components over ``edges`` (columns ``src``,
    ``dst``; int64 or string node ids) → Dataset ``(node, comp)`` with
    ``comp`` = the smallest node id in the node's component.

    Algorithm: hash-min label propagation WITH pointer doubling — per round
    (1) every node takes the min of its own label and its neighbours'
    labels, then (2) every node jumps to its label's label
    (``lbl ← lbl[lbl]``, monotone since labels only decrease). Doubling
    collapses chains geometrically, so a path / ring of length L converges
    in O(log L) rounds instead of O(L) — the property that makes min-label
    components viable on web graphs whose diameter is thousands of hops.
    Each round is THREE narrow bucket shuffles (candidate emit, min reduce,
    pointer resolve) over the repo's tagged-union co-partition layout (no
    ``Dataset.join`` — see the module docstring for why), plus one scalar
    ``sum`` per round for the convergence check; rounds stop at the first
    all-quiet fixpoint.

    Labels are node ids and every reduce is an exact ``min`` — the result
    is bit-identical at any partitioning, so a recursive-CTE SQL twin can
    hash-check it. Edges whose endpoint is outside the node universe are
    dropped (pre-filter or pass ``nodes=None`` to derive the universe from
    the edge list itself).
    """
    if nodes is None:
        srcs = edges.select_columns(["src"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        dsts = edges.select_columns(["dst"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        nodes = srcs.union(dsts).groupby("node").count().select_columns(["node"])

    _EMPTY = {
        "key": pd.Series(dtype="object"),
        "val": pd.Series(dtype="object"),
        "flag": pd.Series(dtype="int64"),
        "kind": pd.Series(dtype="object"),
        "kbucket": pd.Series(dtype="int64"),
    }

    def _frame(key, val, flag, kind) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": key,
                "val": val,
                "flag": flag,
                "kind": np.full(len(key), kind, dtype=object),
                "kbucket": _key_buckets(np.asarray(key), n_buckets),
            }
        )

    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        if "src" not in b.columns or not len(b):
            return pd.DataFrame(_EMPTY)
        s = b["src"].to_numpy()
        d = b["dst"].to_numpy()
        key = np.concatenate([s, d])  # both directions: undirected closure
        val = np.concatenate([d, s])
        return _frame(key, val, np.zeros(len(key), dtype=np.int64), "e")

    def tag_labels(b: pd.DataFrame) -> pd.DataFrame:
        if "node" not in b.columns or not len(b):
            return pd.DataFrame(_EMPTY)
        key = b["node"].to_numpy()
        return _frame(key, key, np.zeros(len(key), dtype=np.int64), "l")

    # Every materialized intermediate is coalesced to n_buckets blocks
    # (repartition without shuffle = split/merge, no data exchange).
    # Without this the loop's block count EXPLODES: Ray's sort shuffle
    # emits one output block per input block, and each round unions the
    # previous labels into its own lineage twice (candidates + resolve), so
    # blocks double per round — measured 8 s → 94 s per round by round 4 on
    # a 500-doc graph before the cap, flat ~2 s/round after.
    edges_t = edges.map_batches(tag_edges, batch_format="pandas").repartition(
        n_buckets
    )
    labels = nodes.materialize().map_batches(
        tag_labels, batch_format="pandas"
    ).repartition(n_buckets)

    def emit_cands(g: pd.DataFrame) -> pd.DataFrame:
        """One src bucket: label rows + edge rows → (dst, lbl[src])."""
        lmap = g.loc[g["kind"] == "l"].set_index("key")["val"]
        e = g.loc[g["kind"] == "e"]
        if not len(e):
            return pd.DataFrame(_EMPTY)
        # positional gather, NOT reindex: a reindex miss (src outside the
        # node universe) upcasts the whole result to float64+NaN, and
        # pd.util.hash_array buckets 2007.0 differently from 2007 — one
        # out-of-universe edge would silently mis-bucket every downstream
        # label lookup (observed: full-graph NaN cascade in round 1)
        idx = lmap.index.get_indexer(e["key"].to_numpy())
        keep = idx >= 0
        if not keep.any():
            return pd.DataFrame(_EMPTY)
        dst = e["val"].to_numpy()[keep]
        lbl = lmap.to_numpy()[idx[keep]]
        return _frame(dst, lbl, np.zeros(len(dst), dtype=np.int64), "c")

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        """One node bucket: current labels + candidates → min label, with a
        changed flag for the convergence check."""
        cur = g.loc[g["kind"] == "l"]
        if not len(cur):
            return pd.DataFrame(_EMPTY)
        new = g.groupby("key", sort=False)["val"].min()
        # only keys with a label row are real nodes (a candidate aimed at a
        # node outside the universe carries no 'l' row and is dropped)
        old = cur.set_index("key")["val"]
        new = new.reindex(old.index)
        key = old.index.to_numpy()
        return _frame(
            key,
            new.to_numpy(),
            (new.to_numpy() != old.to_numpy()).astype(np.int64),
            "l",
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        """One label bucket: label rows + jump requests → lbl[lbl[node]].
        A label is itself a node id, so the lookup always hits. The emitted
        flag ORs the carried reduce-step flag with the jump flag, so ONE
        scalar sum per round covers both convergence conditions (label
        stability AND pointer flatness)."""
        lmap = g.loc[g["kind"] == "l"].set_index("key")["val"]
        q = g.loc[g["kind"] == "q"]
        out = []
        if len(q):
            # positional gather (see emit_cands): never let a miss upcast
            # labels to float64. A miss here is an algorithm invariant
            # violation (every label IS a node id) — fail loudly.
            idx = lmap.index.get_indexer(q["key"].to_numpy())
            if (idx < 0).any():
                raise RuntimeError(
                    "connected_components: label row missing in its own "
                    "bucket (dtype-inconsistent node ids across edges/nodes?)"
                )
            lbl2 = lmap.to_numpy()[idx]
            node = q["val"].to_numpy()
            jumped = lbl2 != q["key"].to_numpy()
            carried = q["flag"].to_numpy().astype(bool)
            out.append(
                _frame(node, lbl2, (carried | jumped).astype(np.int64), "l")
            )
        return pd.concat(out) if out else pd.DataFrame(_EMPTY)

    def to_requests(b: pd.DataFrame) -> pd.DataFrame:
        # request row: key = the label to look up, val = the asking node,
        # flag = the node's reduce-step changed flag (carried through)
        if "key" not in b.columns or not len(b):
            return pd.DataFrame(_EMPTY)
        lbl = b["val"].to_numpy()
        return _frame(lbl, b["key"].to_numpy(), b["flag"].to_numpy(), "q")

    edges_t = _rebase(edges_t)
    labels = _rebase(labels)

    for _ in range(max_rounds):
        cands = (
            labels.union(edges_t)
            .groupby("kbucket")
            .map_groups(emit_cands, batch_format="pandas")
        )
        labels = _rebase(
            cands.union(labels)
            .groupby("kbucket")
            .map_groups(reduce_min, batch_format="pandas")
            .repartition(n_buckets)
        )
        requests = labels.map_batches(to_requests, batch_format="pandas")
        labels = _rebase(
            requests.union(labels)
            .groupby("kbucket")
            .map_groups(resolve, batch_format="pandas")
            .repartition(n_buckets)
        )
        if (labels.sum("flag") or 0) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within max_rounds="
            f"{max_rounds}; the graph's diameter needs more pointer-doubling"
            f" rounds — raise max_rounds (labels would be silently partial)"
        )

    def finalize_cc(b: pd.DataFrame) -> pd.DataFrame:
        if "key" not in b.columns or not len(b):
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype="object"),
                    "comp": pd.Series(dtype="object"),
                }
            )
        return pd.DataFrame(
            {"node": b["key"].to_numpy(), "comp": b["val"].to_numpy()}
        )

    return labels.map_batches(finalize_cc, batch_format="pandas")


def triangle_counts(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-node triangle participation counts → (node, n_triangles), nodes
    with ≥1 triangle only.

    The degree-ordered orientation algorithm (Cohen's MapReduce triangle
    enumeration): orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one — out-degree is then O(√m) even on
    power-law webgraphs, so the wedge set Σ outdeg² is near-linear where
    naive per-node wedges (Σ deg²) explodes on hub nodes. Three narrow
    bucket shuffles, tagged-union style throughout (no Dataset.join —
    see the pagerank note on empty build sides):

    1. degree count: per-batch combiners → per-node degree rows, then a
       co-partition that attaches deg(src) and deg(dst) to each edge
       (both endpoints' rows share the endpoint's bucket);
    2. wedge generation: oriented out-adjacency grouped per bucket, each
       node's sorted neighbour list emits its C(outdeg, 2) wedges
       ``(lo, hi, witness)``;
    3. closing: wedges union canonical edges, bucketed by hash(lo, hi);
       a wedge with a matching edge row in its bucket is a triangle —
       each triangle is found exactly once (at its unique degree-minimal
       witness), and all three corners are credited.
    """

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src_col].to_numpy(np.int64)
        c = b[dst_col].to_numpy(np.int64)
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        m = lo != hi  # drop self-loops
        out = pd.DataFrame({"a": lo[m], "b": hi[m]}).drop_duplicates()
        # coarse pair bucket, NOT groupby(a, b): per-pair groups are
        # mostly singletons and Ray's per-group dispatch would dominate
        # (the salted-sessions lesson — 8-80× the kernel work)
        out["pb"] = (
            (
                pd.util.hash_array(out["a"].to_numpy().astype(object))
                ^ pd.util.hash_array(out["b"].to_numpy().astype(object))
            )
            % np.uint64(n_buckets * 4)
        ).astype(np.int64)
        return out

    e = (
        edges.map_batches(canon, batch_format="pandas")
        .groupby("pb")
        .map_groups(
            lambda g: g[["a", "b"]].drop_duplicates(), batch_format="pandas"
        )
    )
    e = _rebase(e)  # consumed three times below; execute once

    # -- per-node degrees: per-batch combiner → COARSE-bucket pandas sum.
    # Ray-level groupby(node).aggregate over ~|V| distinct keys is the
    # many-group trap (measured 105 s for 100k nodes where the bucketed
    # sum takes ~2 s — the pagerank design note); all per-node reduces
    # here go through _key_buckets + an in-bucket vectorized groupby-sum.
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = pd.concat([b["a"], b["b"]]).value_counts(sort=False)
        n = vc.index.to_numpy(np.int64)
        return pd.DataFrame(
            {"bkt": _key_buckets(n, n_buckets), "node": n,
             "d": vc.to_numpy(np.int64)}
        )

    def bucket_sum(alias: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("node", sort=False)["d"].sum()
            return pd.DataFrame(
                {"node": s.index.to_numpy(np.int64),
                 alias: s.to_numpy(np.int64)}
            )
        return f

    deg = (
        e.map_batches(deg_partial, batch_format="pandas")
        .groupby("bkt")
        .map_groups(bucket_sum("deg"), batch_format="pandas")
    )

    # -- attach (deg_a, deg_b) via tagged-union co-partition -------------
    def tag_deg(b: pd.DataFrame) -> pd.DataFrame:
        n = b["node"].to_numpy(np.int64)
        return pd.DataFrame(
            {"bkt": _key_buckets(n, n_buckets), "x": n, "y": np.int64(-1),
             "deg": b["deg"].to_numpy(np.int64), "side": np.int64(0)}
        )

    def tag_edge_by(col: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            k = b[col].to_numpy(np.int64)
            other = b["b" if col == "a" else "a"].to_numpy(np.int64)
            prev = (
                b["deg_a"].to_numpy(np.int64)
                if "deg_a" in b.columns
                else np.full(len(b), -1, dtype=np.int64)
            )
            return pd.DataFrame(
                {"bkt": _key_buckets(k, n_buckets), "x": k, "y": other,
                 "deg": prev, "side": np.int64(1)}
            )
        return f

    def attach(stage_col: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            degs = g[g["side"] == 0]
            ed = g[g["side"] == 1]
            if not len(ed):
                return pd.DataFrame(
                    {c: pd.Series(dtype="int64") for c in ("a", "b", "deg_a", "deg_b")}
                )[["a", "b", "deg_a", "deg_b"] if stage_col == "deg_b" else ["a", "b", "deg_a"]]
            idx = pd.Index(degs["x"].to_numpy(np.int64))
            pos = idx.get_indexer(ed["x"].to_numpy(np.int64))
            dv = degs["deg"].to_numpy(np.int64)[pos]  # every node has a degree row
            if stage_col == "deg_a":
                return pd.DataFrame(
                    {"a": ed["x"].to_numpy(np.int64), "b": ed["y"].to_numpy(np.int64),
                     "deg_a": dv}
                )
            return pd.DataFrame(
                {"a": ed["y"].to_numpy(np.int64), "b": ed["x"].to_numpy(np.int64),
                 "deg_a": ed["deg"].to_numpy(np.int64), "deg_b": dv}
            )
        return f

    e1 = (
        deg.map_batches(tag_deg, batch_format="pandas")
        .union(e.map_batches(tag_edge_by("a"), batch_format="pandas"))
        .groupby("bkt")
        .map_groups(attach("deg_a"), batch_format="pandas")
    )
    e2 = (
        deg.map_batches(tag_deg, batch_format="pandas")
        .union(e1.map_batches(tag_edge_by("b"), batch_format="pandas"))
        .groupby("bkt")
        .map_groups(attach("deg_b"), batch_format="pandas")
    )

    # -- orient from the (deg, id)-smaller endpoint; group out-adjacency --
    def orient(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(np.int64)
        c = b["b"].to_numpy(np.int64)
        da = b["deg_a"].to_numpy(np.int64)
        db = b["deg_b"].to_numpy(np.int64)
        a_first = (da < db) | ((da == db) & (a < c))
        src = np.where(a_first, a, c)
        dst = np.where(a_first, c, a)
        return pd.DataFrame(
            {"bkt": _key_buckets(src, n_buckets), "src": src, "dst": dst}
        )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized across ALL srcs in the bucket (a per-src Python
        # loop building one frame per node was ~100× the kernel at 100k
        # nodes): sort by (src, dst), then every row pairs with the rows
        # after it inside its src run via repeat/offset index math.
        empty = pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("lo", "hi", "wit")}
        )
        if not len(g):
            return empty
        g = g.sort_values(["src", "dst"], kind="mergesort")
        src = g["src"].to_numpy(np.int64)
        dst = g["dst"].to_numpy(np.int64)
        new = np.r_[True, src[1:] != src[:-1]]
        starts = np.flatnonzero(new)
        k = np.diff(np.r_[starts, len(src)])
        gidx = np.cumsum(new) - 1
        loc = np.arange(len(src)) - starts[gidx]
        rep = k[gidx] - loc - 1  # rows after this one in the same src run
        tot = int(rep.sum())
        if tot == 0:
            return empty
        cum = np.r_[0, np.cumsum(rep)]
        first = np.repeat(np.arange(len(src)), rep)
        offset = np.arange(tot) - np.repeat(cum[:-1], rep)
        second = first + 1 + offset
        return pd.DataFrame(
            {"lo": dst[first], "hi": dst[second], "wit": src[first]}
        )

    wedge_ds = (
        e2.map_batches(orient, batch_format="pandas")
        .groupby("bkt")
        .map_groups(wedges, batch_format="pandas")
    )

    # -- close wedges against canonical edges -----------------------------
    def pair_bkt(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        return (
            (pd.util.hash_array(lo.astype(object))
             ^ pd.util.hash_array(hi.astype(object)))
            % np.uint64(n_buckets * 4)
        ).astype(np.int64)

    def tag_wedge(b: pd.DataFrame) -> pd.DataFrame:
        lo, hi = b["lo"].to_numpy(np.int64), b["hi"].to_numpy(np.int64)
        return pd.DataFrame(
            {"pb": pair_bkt(lo, hi), "lo": lo, "hi": hi,
             "wit": b["wit"].to_numpy(np.int64), "is_edge": np.int64(0)}
        )

    def tag_edge_pair(b: pd.DataFrame) -> pd.DataFrame:
        lo, hi = b["a"].to_numpy(np.int64), b["b"].to_numpy(np.int64)
        return pd.DataFrame(
            {"pb": pair_bkt(lo, hi), "lo": lo, "hi": hi,
             "wit": np.int64(-1), "is_edge": np.int64(1)}
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        ed = g[g["is_edge"] == 1]
        wd = g[g["is_edge"] == 0]
        if not len(wd) or not len(ed):
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "t": pd.Series(dtype="int64")}
            )
        eset = pd.MultiIndex.from_arrays(
            [ed["lo"].to_numpy(np.int64), ed["hi"].to_numpy(np.int64)]
        )
        widx = pd.MultiIndex.from_arrays(
            [wd["lo"].to_numpy(np.int64), wd["hi"].to_numpy(np.int64)]
        )
        hit = widx.isin(eset)
        if not hit.any():
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "t": pd.Series(dtype="int64")}
            )
        tri = wd[hit]
        nodes = np.concatenate(
            [tri["lo"].to_numpy(np.int64), tri["hi"].to_numpy(np.int64),
             tri["wit"].to_numpy(np.int64)]
        )
        vc = pd.Series(nodes).value_counts(sort=False)
        return pd.DataFrame(
            {"node": vc.index.to_numpy(np.int64), "t": vc.to_numpy(np.int64)}
        )

    closed = (
        wedge_ds.map_batches(tag_wedge, batch_format="pandas")
        .union(e.map_batches(tag_edge_pair, batch_format="pandas"))
        .groupby("pb")
        .map_groups(close, batch_format="pandas")
    )

    def node_bkt(b: pd.DataFrame) -> pd.DataFrame:
        n = b["node"].to_numpy(np.int64)
        return pd.DataFrame(
            {"bkt": _key_buckets(n, n_buckets), "node": n,
             "d": b["t"].to_numpy(np.int64)}
        )

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", sort=False)["d"].sum()
        return pd.DataFrame(
            {"node": s.index.to_numpy(np.int64),
             "n_triangles": s.to_numpy(np.int64)}
        )

    return (
        closed.map_batches(node_bkt, batch_format="pandas")
        .groupby("bkt")
        .map_groups(final_sum, batch_format="pandas")
    )


def random_walks(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    steps: int = 4,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Deterministic "random" walk generation — the data-prep step of
    DeepWalk / node2vec graph embeddings (Perozzi et al. 2014, Grover &
    Leskovec 2016): one walk per node, ``steps`` hops; the next hop from
    ``cur`` is the out-neighbor ``m`` minimizing the keyed hash
    ``md5_low64("{s}|{cur}|{t}|{m}")`` (ties → lower ``m``). The hash is a
    PRF over (walk, position, candidate), so hop choices are
    pseudo-random yet bit-reproducible under any partitioning AND by a
    DuckDB twin ranking on ``md5_number_lower`` of the same string.

    → Dataset ``(s, step, cur)``, step 0..steps (walk ``s`` starts at
    node ``s``; a node with no out-edges would end its walk — pass an
    undirected expansion if every walk must run full length).

    Scale shape: per hop ONE tagged-union co-partition shuffle (the walk
    frontier and the edge table routed by the same cur/src hash bucket —
    the pregel step), candidates evaluated via ONE vectorized merge per
    bucket; the frontier is re-materialized with lineage reset per hop
    (``_rebase`` — plan growth is the measured iterative-loop killer).
    Edges re-route every hop; a production walk length would park the
    bucket adjacency in an actor pool instead (documented upgrade).
    """
    import hashlib

    def _h64(keys: list[str]) -> np.ndarray:
        out = np.empty(len(keys), dtype=np.uint64)
        for i, k in enumerate(keys):
            out[i] = int.from_bytes(hashlib.md5(k.encode()).digest()[8:], "little")
        return out

    def start(t: pa.Table) -> pa.Table:
        d = t.column(0).to_numpy().astype(np.int64)
        return pa.table({"s": d, "cur": d})

    frontier = _rebase(nodes.map_batches(start, batch_format="pyarrow"))
    snaps = [
        frontier.map_batches(
            lambda b, st=0: b.assign(step=np.int64(st))[["s", "step", "cur"]],
            batch_format="pandas",
        )
    ]

    def route_w(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "side": np.int64(0),
                "_bkt": _key_buckets(b["cur"].to_numpy(np.int64), n_buckets),
                "s": b["s"].to_numpy(np.int64),
                "cur": b["cur"].to_numpy(np.int64),
                "dst": np.int64(-1),
            }
        )

    def route_e(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "side": np.int64(1),
                "_bkt": _key_buckets(b["src"].to_numpy(np.int64), n_buckets),
                "s": np.int64(-1),
                "cur": b["src"].to_numpy(np.int64),
                "dst": b["dst"].to_numpy(np.int64),
            }
        )

    edges_routed = _rebase(
        edges.map_batches(route_e, batch_format="pandas").repartition(n_buckets)
    )

    for t in range(1, steps + 1):
        def hop(g: pd.DataFrame, t=t) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"s": pd.Series(dtype="int64"), "cur": pd.Series(dtype="int64")}
            )
            w = g[g["side"] == 0]
            e = g[g["side"] == 1]
            if not len(w) or not len(e):
                return empty
            cand = w[["s", "cur"]].merge(
                e[["cur", "dst"]], on="cur", how="inner"
            )
            if not len(cand):
                return empty
            cand["_h"] = _h64(
                [
                    f"{s}|{c}|{t}|{m}"
                    for s, c, m in zip(cand["s"], cand["cur"], cand["dst"])
                ]
            )
            # one walk per s in the frontier: min (_h, dst) per s
            cand = cand.sort_values(["s", "_h", "dst"], kind="mergesort")
            pick = cand.groupby("s", as_index=False).first()
            return pd.DataFrame(
                {"s": pick["s"].to_numpy(np.int64), "cur": pick["dst"].to_numpy(np.int64)}
            )

        frontier = _rebase(
            frontier.map_batches(route_w, batch_format="pandas")
            .union(edges_routed)
            .groupby("_bkt")
            .map_groups(hop, batch_format="pandas")
            .repartition(n_buckets)
        )
        snaps.append(
            frontier.map_batches(
                lambda b, st=t: b.assign(step=np.int64(st))[["s", "step", "cur"]],
                batch_format="pandas",
            )
        )

    out = snaps[0]
    for sn in snaps[1:]:
        out = out.union(sn)
    return out


def walk_pairs(
    walks: ray.data.Dataset,
    *,
    window: int = 2,
    top_n: int = 50,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Skip-gram (center, context) pair extraction from walk sequences —
    the training-pair step between :func:`random_walks` and a word2vec-
    style embedding fit: for every walk, all ordered pairs of visits
    within ``window`` positions (context ≠ center position), counted
    corpus-wide; top ``top_n`` by (count desc, center, context).

    Scale shape: ONE walk-id bucket shuffle (a walk's visits co-locate),
    per bucket a vectorized self-merge emits pairs and collapses them to
    partial counts; ONE pair-bucket reduce sums partials and keeps a
    LOCAL top-n (each pair lives in exactly one bucket, so local winners
    are global candidates); the driver merges ≤ top_n·n_buckets rows.
    """

    def route(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["s", "step", "cur"]].copy()
        b["_bkt"] = _key_buckets(b["s"].to_numpy(np.int64), n_buckets)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="s", suffixes=("_a", "_b"))
        d = (m["step_b"] - m["step_a"]).to_numpy(np.int64)
        m = m[(np.abs(d) <= window) & (d != 0)]
        out = (
            m.groupby(["cur_a", "cur_b"], as_index=False)
            .size()
            .rename(columns={"cur_a": "center", "cur_b": "context", "size": "cnt"})
        )
        out["_pbkt"] = _key_buckets(
            (out["center"].to_numpy(np.int64) << 20)
            ^ out["context"].to_numpy(np.int64),
            n_buckets,
        )
        return out

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["center", "context"], as_index=False)["cnt"].sum()
        t = t.sort_values(
            ["cnt", "center", "context"], ascending=[False, True, True],
            kind="mergesort",
        )
        return t.head(top_n)

    cand = (
        walks.map_batches(route, batch_format="pandas")
        .groupby("_bkt")
        .map_groups(pairs, batch_format="pandas")
        .groupby("_pbkt")
        .map_groups(reduce_pairs, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["cnt", "center", "context"], ascending=[False, True, True],
        kind="mergesort",
    ).head(top_n)
    return cand[["center", "context", "cnt"]].reset_index(drop=True).astype("int64")


def hits(
    edges: ray.data.Dataset,
    *,
    nodes: ray.data.Dataset | None = None,
    iters: int = 2,
    scale: int = 1_000_000,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg JACM 1999) over ``edges``
    (columns ``src``, ``dst``; int64 or string node ids) → Dataset
    ``(node, hub, auth)`` in fixed-point units of ``1/scale``.

    The query-independent companion to :func:`pagerank` on the same link
    graph: a page is a good AUTHORITY when good hubs link to it and a good
    HUB when it links to good authorities — the mutual-reinforcement pair
    behind anchor-quality signals. Per iteration: ``auth ← Σ hub(src)``
    over in-edges, ``hub ← Σ auth(dst)`` over out-edges, each followed by
    max-normalization (``v·scale // max(v)``) so the vectors stay in
    [0, scale].

    Execution shape mirrors :func:`pagerank`: the edge list is prepared
    ONCE in each orientation (bucketed by ``hash(src)`` for the auth
    update, ``hash(dst)`` for the hub update), each half-iteration is two
    narrow bucket shuffles (score⋈edges contribution emit, then a zero-row
    union + per-bucket int64 groupby-sum), and the normalizer is one
    driver-side ``max()`` over the narrow score table. Vectors are
    re-materialized per half-iteration with lineage reset (``_rebase``).

    Numerics — exact-parity integers throughout: sums and the
    ``v·scale // max`` rescale are int64, so the result is
    bit-reproducible across partitionings and a DuckDB twin with unrolled
    iterations hash-matches it. Bound: ``max_in_degree·scale²`` (and the
    out-degree twin) must stay below 2^63 — at web scale drop ``scale`` to
    10^3..10^4 (the ranking is unchanged; only the fixed-point resolution
    moves).
    """
    if nodes is None:
        srcs = edges.select_columns(["src"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        dsts = edges.select_columns(["dst"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        nodes = srcs.union(dsts).groupby("node").count().select_columns(["node"])

    _EMPTY = {
        "key": pd.Series(dtype="object"),
        "other": pd.Series(dtype="object"),
        "r": pd.Series(dtype="int64"),
        "kind": pd.Series(dtype="object"),
        "kbucket": pd.Series(dtype="int64"),
    }

    def _rows(key, other, r, kind) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": key,
                "other": other,
                "r": r,
                "kind": np.full(len(key), kind, dtype=object),
                "kbucket": _key_buckets(np.asarray(key), n_buckets),
            }
        )

    def orient(b: pd.DataFrame, key_col: str, other_col: str) -> pd.DataFrame:
        if key_col not in b.columns or not len(b):
            return pd.DataFrame(_EMPTY)
        return _rows(
            b[key_col].to_numpy(),
            b[other_col].to_numpy(),
            np.zeros(len(b), dtype=np.int64),
            "e",
        )

    # Edge list prepared ONCE per orientation (reused every iteration).
    by_src = edges.map_batches(
        lambda b: orient(b, "src", "dst"), batch_format="pandas"
    ).materialize()
    by_dst = edges.map_batches(
        lambda b: orient(b, "dst", "src"), batch_format="pandas"
    ).materialize()

    def node_rows(b: pd.DataFrame, r: int, kind: str) -> pd.DataFrame:
        if "node" not in b.columns or not len(b):
            return pd.DataFrame(_EMPTY)
        key = b["node"].to_numpy()
        return _rows(key, key, np.full(len(key), r, dtype=np.int64), kind)

    nodes = nodes.materialize()
    zeros = nodes.map_batches(
        lambda b: node_rows(b, 0, "z"), batch_format="pandas"
    ).materialize()
    hub = nodes.map_batches(
        lambda b: node_rows(b, scale, "s"), batch_format="pandas"
    ).materialize()

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        """One key bucket: score rows + oriented edge rows → (other, score)
        contribution rows, re-bucketed by the receiving endpoint."""
        smap = g.loc[g["kind"] == "s"].set_index("key")["r"]
        e = g.loc[g["kind"] == "e"]
        if not len(e):
            return pd.DataFrame(_EMPTY)
        rr = smap.reindex(e["key"]).astype("Int64")
        keep = rr.notna().to_numpy()
        if not keep.any():
            return pd.DataFrame(_EMPTY)
        node = e["other"].to_numpy()[keep]
        return _rows(node, node, rr.to_numpy(dtype=np.int64, na_value=0)[keep], "c")

    def reduce_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("key", sort=False, as_index=False)["r"].sum()
        key = s["key"].to_numpy()
        return _rows(key, key, s["r"].to_numpy(np.int64), "s")

    def half_step(scores: ray.data.Dataset, oriented: ray.data.Dataset):
        raw = _rebase(
            scores.union(oriented)
            .groupby("kbucket")
            .map_groups(emit, batch_format="pandas")
            .union(zeros)
            .groupby("kbucket")
            .map_groups(reduce_sum, batch_format="pandas")
        )
        mx = int(raw.max("r") or 0)

        def rescale(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            if mx > 0:
                b["r"] = b["r"].to_numpy(np.int64) * scale // mx
            return b

        # keep the _rebase: the lazy-tail variant re-executes the rescale
        # map at every downstream consumption and measured NO faster at
        # fixture scale (13.8 s vs 17.2 s) — the materialization is cheap
        # relative to the doubled scheduling
        return _rebase(raw.map_batches(rescale, batch_format="pandas"))

    auth = None
    for _ in range(iters):
        auth = half_step(hub, by_src)  # auth(dst) ← Σ hub(src)
        hub = half_step(auth, by_dst)  # hub(src) ← Σ auth(dst)

    def label(kind: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            if "key" not in b.columns or not len(b):
                return pd.DataFrame(_EMPTY)
            b = b.copy()
            b["kind"] = kind
            return b

        return f

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        h = g.loc[g["kind"] == "h"].set_index("key")["r"]
        a = g.loc[g["kind"] == "a"].set_index("key")["r"]
        key = h.index.to_numpy()
        return pd.DataFrame(
            {
                "node": key,
                "hub": h.to_numpy(np.int64),
                "auth": a.reindex(h.index).to_numpy(dtype=np.int64, na_value=0),
            }
        )

    return (
        hub.map_batches(label("h"), batch_format="pandas")
        .union(auth.map_batches(label("a"), batch_format="pandas"))
        .groupby("kbucket")
        .map_groups(finalize, batch_format="pandas")
    )
