"""Link-graph analytics: distributed PageRank over an edge Dataset.

The reference engine CONSUMES PageRank as a per-document feature file
(``LearnToRank.java`` reads ``extid \\t score``; our
``pipelines/letor.py:read_score_file`` mirrors it). At Common-Crawl scale
the score file itself has to come from somewhere — this stage computes it
from the crawl's link graph, producing exactly the table the LeToR feature
join expects.

Execution shape (per power iteration, the canonical data-parallel
PageRank):

* one hash join ``edges ⋈ ranks`` on ``src`` (both sides large at web
  scale → shuffle join, never a broadcast),
* one ``groupby(dst).sum`` for the incoming contribution mass,
* one ``groupby(node).sum`` over ``contribs ∪ zero-rows`` — the zero-row
  union is the left-outer-join equivalent that keeps dangling/unlinked
  nodes in the rank vector without a second join.

Ranks are materialized once per iteration (the plan would otherwise grow
multiplicatively), mirroring the Lloyd-iteration pattern in
``stages/ann.py:kmeans_clusters``.

Numerics — exact-parity integer arithmetic: ranks are int64 MICRO-units,
per-edge contributions use floor division (``rank // out_degree``) and the
damping update is ``teleport + damp_num * s // damp_den``. Every
intermediate is an integer ≤ 2^53, so float64 accumulation (Ray's sum
aggregate, DuckDB's SUM alike) is EXACT regardless of reduction order —
the whole computation is bit-reproducible across partitionings and
engines, which is what lets the driver hash-compare it against a DuckDB
twin. (Float PageRank would drift last-bits with summation order.)
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

__all__ = ["link_graph", "pagerank"]


def link_graph(corpus_paths: str | list[str]) -> ray.data.Dataset:
    """Anchor edge list ``(src, dst)`` (source url → link target) from a
    Common-Crawl-shaped HTML corpus, via the same ``ExtractStage`` the
    index build uses (one streaming pass, html dropped at extraction).
    Feeds :func:`pagerank` directly — node ids are urls (string keys work:
    every key operation is a join/groupby, only rank values do arithmetic)
    — completing the crawl → link graph → PageRank → LeToR-feature-file
    lifecycle the reference starts from a precomputed score file
    (LearnToRank.java pagerank feature)."""
    from ..pipelines.build_index import ExtractStage

    ds = ray.data.read_parquet(corpus_paths, columns=["url", "html", "lang"])
    ds = ds.map_batches(ExtractStage(), batch_format="pyarrow")

    def edges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.equal(t["kind"], "a"))
        return pa.table({"src": t["src"], "dst": t["url"]})

    return ds.map_batches(edges, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    *,
    nodes: ray.data.Dataset | None = None,
    iters: int = 3,
    base_micros: int = 1_000_000,
    teleport_micros: int = 150_000,
    damp_num: int = 85,
    damp_den: int = 100,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Power-iteration PageRank over ``edges`` (columns ``src``, ``dst``,
    int64 node ids). Returns a Dataset ``(node, rank_micros)``.

    ``nodes`` (single column ``node``) fixes the node universe — pass it
    when it is already known (e.g. every doc_id) to skip a distinct-scan of
    the edge list. The edge list defines mass flow: a ``dst`` id absent
    from ``nodes`` still accumulates rank (pre-filter the edges if a strict
    universe is required). ``num_partitions`` sizes the join's hash
    partitions (≈ rows/10M at cluster scale — see the measured
    over-partitioning note in ``__ray_entry__.q_revenue_by_priority``).
    """
    if nodes is None:
        srcs = edges.select_columns(["src"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        dsts = edges.select_columns(["dst"]).map_batches(
            lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
        )
        nodes = srcs.union(dsts).groupby("node").count().select_columns(["node"])
    nodes = nodes.materialize()

    deg = (
        edges.groupby("src")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["src", "deg"]), batch_format="pyarrow"
        )
    )
    edges_deg = edges.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",)
    ).materialize()

    def zero_rows(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {"node": t["node"], "s": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        )

    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow").materialize()

    def init_rows(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "rank_node": t["node"],
                "r": pa.array(np.full(t.num_rows, base_micros, dtype=np.int64)),
            }
        )

    ranks = nodes.map_batches(init_rows, batch_format="pyarrow").materialize()

    for _ in range(iters):
        joined = edges_deg.join(
            ranks,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("rank_node",),
        )

        def contrib(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.divide(t["r"], t["deg"])  # int64 // int64 floor division
            return pa.table({"node": t["dst"], "s": c})

        sums = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .union(zeros)
            .groupby("node")
            .sum("s")
        )

        def damp(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # sums of int64 micro-values are exact whatever the accumulator
            # type (all intermediates ≤ 2^53); the cast is a no-op re-type
            s = pc.cast(t["sum(s)"], pa.int64())
            r = pc.add(
                teleport_micros,
                pc.divide(pc.multiply(damp_num, s), damp_den),
            )
            return pa.table({"rank_node": t["node"], "r": pc.cast(r, pa.int64())})

        ranks = sums.map_batches(damp, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: t.rename_columns(["node", "rank_micros"]), batch_format="pyarrow"
    )
