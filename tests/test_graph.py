"""PageRank (stages/graph.py): exact int64 micro-unit arithmetic vs a
pure-Python reference, dangling nodes, and node-universe handling."""

from collections import Counter

import numpy as np
import pandas as pd
import ray.data

from search_engine_framework_ray.stages.graph import pagerank


def ref_pagerank(edges, nodes, iters=3):
    """Same integer arithmetic, single-threaded: rank//deg per edge,
    150000 + 85*s//100 damped update, all int."""
    deg = Counter(s for s, _ in edges)
    r = {v: 1_000_000 for v in nodes}
    for _ in range(iters):
        c: dict = {}
        for s, d in edges:
            if s in r:
                c[d] = c.get(d, 0) + r[s] // deg[s]
        universe = set(nodes) | set(c)
        r = {v: 150_000 + 85 * c.get(v, 0) // 100 for v in universe}
    return dict(sorted(r.items()))


def _run(edges, nodes, iters=3):
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    n = ray.data.from_items([{"node": v} for v in nodes]) if nodes is not None else None
    out = pagerank(e, nodes=n, iters=iters, n_buckets=8).to_pandas()
    return dict(
        sorted(zip(out["node"].astype(int), out["rank_micros"].astype(int)))
    )


def test_pagerank_matches_integer_reference(ray_session):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (4, 3)]
    nodes = [0, 1, 2, 3, 4]
    assert _run(edges, nodes) == ref_pagerank(edges, nodes)


def test_pagerank_dangling_and_unlinked_nodes(ray_session):
    # node 3 dangles (no out-edges), node 4 is fully isolated: both must
    # stay in the rank vector (4 at the pure-teleport value after iter 1)
    edges = [(0, 1), (1, 2), (2, 0), (0, 3)]
    nodes = [0, 1, 2, 3, 4]
    got = _run(edges, nodes)
    assert got == ref_pagerank(edges, nodes)
    assert got[4] == 150_000  # teleport-only mass


def test_pagerank_derives_node_universe_from_edges(ray_session):
    edges = [(0, 1), (1, 0), (1, 2)]
    got = _run(edges, nodes=None)
    assert set(got) == {0, 1, 2}
    assert got == ref_pagerank(edges, [0, 1, 2])


def test_pagerank_single_iteration_closed_cycle(ray_session):
    # a 3-cycle: every node keeps exactly the full mass through any number
    # of iterations (1_000_000 → 150000 + 85% = 1_000_000)
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _run(edges, [0, 1, 2], iters=4)
    assert got == {0: 1_000_000, 1: 1_000_000, 2: 1_000_000}


def test_pagerank_string_nodes(ray_session):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    out = pagerank(e, iters=2, n_buckets=8).to_pandas()
    got = dict(zip(out["node"], out["rank_micros"].astype(int)))
    assert got == ref_pagerank(edges, ["a", "b", "c"], iters=2)


def test_link_graph_pagerank_over_html_corpus(ray_session, tmp_path):
    """crawl → anchor extraction → PageRank over urls, end-to-end on the
    deterministic synthetic corpus; checked against the single-threaded
    integer reference on the SAME extracted edges."""
    from search_engine_framework_ray.sources.corpus import synthesize_corpus
    from search_engine_framework_ray.stages.graph import link_graph

    corpus = str(tmp_path / "corpus")
    synthesize_corpus(corpus, n_docs=200, n_files=4, seed=7)
    edges_ds = link_graph(corpus).materialize()
    edges = [(r["src"], r["dst"]) for r in edges_ds.take_all()]  # small fixture
    assert len(edges) > 50  # the synthesizer emits anchors
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    got_df = pagerank(edges_ds, iters=3, n_buckets=8).to_pandas()
    got = dict(zip(got_df["node"], got_df["rank_micros"].astype(int)))
    assert got == ref_pagerank(edges, nodes)


def test_pagerank_scores_into_letor(ray_session):
    """Closing the lifecycle: pagerank output feeds LeToR's pagerank
    feature through the broadcast-filter adapter — only the candidate
    extids reach the driver, values are the micro ranks scaled."""
    from search_engine_framework_ray.pipelines.letor import scores_from_dataset

    edges = [("u0", "u1"), ("u1", "u2"), ("u2", "u0"), ("u0", "u2")]
    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    pr = pagerank(e, iters=2, n_buckets=8)
    want = ref_pagerank(edges, ["u0", "u1", "u2"], iters=2)
    got = scores_from_dataset(pr, ["u0", "u2", "missing"])
    assert set(got) == {"u0", "u2"}  # candidates only; absent extid dropped
    assert got["u0"] == want["u0"] * 1e-6
    assert got["u2"] == want["u2"] * 1e-6


# ----------------------------------------------------------------------------
# connected components (hash-min + pointer doubling)
# ----------------------------------------------------------------------------


def _cc(edges, nodes=None, **kw):
    from search_engine_framework_ray.stages.graph import connected_components

    e = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    n = (
        ray.data.from_items([{"node": v} for v in nodes])
        if nodes is not None
        else None
    )
    out = connected_components(e, nodes=n, n_buckets=8, **kw).to_pandas()
    return dict(zip(out["node"], out["comp"]))


def ref_cc(edges, nodes):
    """Single-threaded union-find reference."""
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        if s in parent and d in parent:
            a, b = find(s), find(d)
            if a != b:
                parent[max(a, b)] = min(a, b)
    # min id per component
    comp = {}
    for v in nodes:
        comp.setdefault(find(v), []).append(v)
    return {v: min(ms) for r, ms in comp.items() for v in ms}


def test_cc_merged_int_graph(ray_session):
    """ONE CC run over a disjoint union of every int-graph case (Ray Data's
    per-execution overhead at the 4-cpu fixture makes one run per case
    prohibitively slow; disjoint id ranges keep the cases independent):

    - ids 1-99: two small components + an isolated node
    - ids 1000-1059: a 60-node path — naive min propagation needs 59
      rounds; pointer doubling must finish inside max_rounds=10
    - ids 2000-2021: an 8-ring plus a cross-linked pendant pair
    - ids 3001-3003: an edge whose endpoint (3777) is outside the node
      universe and must be dropped
    - ids 4000-4199: a 200-node random graph, fed through repartition(7)/
      repartition(3) to exercise partitioning invariance
    """
    import numpy as np

    edges = [(1, 2), (2, 3), (10, 11)]
    nodes = [1, 2, 3, 10, 11, 99]
    edges += [(1000 + i, 1001 + i) for i in range(59)]
    nodes += [1000 + i for i in range(60)]
    edges += [(2000 + i, 2000 + (i + 1) % 8) for i in range(8)]
    edges += [(2020, 2021), (2021, 2004)]
    nodes += [2000 + i for i in range(8)] + [2020, 2021]
    edges += [(3001, 3002), (3002, 3777)]  # 3777 not in the universe
    nodes += [3001, 3002, 3003]
    rng = np.random.default_rng(11)
    edges += [
        (4000 + int(a), 4000 + int(b))
        for a, b in rng.integers(0, 200, size=(150, 2))
    ]
    nodes += [4000 + i for i in range(200)]

    want = ref_cc(edges, nodes)
    from search_engine_framework_ray.stages.graph import connected_components

    e = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in edges]
    ).repartition(7)
    n = ray.data.from_items([{"node": v} for v in nodes]).repartition(3)
    out = connected_components(
        e, nodes=n, n_buckets=8, max_rounds=10
    ).to_pandas()
    got = dict(zip(out["node"], out["comp"]))
    assert got == want
    assert got[99] == 99  # isolated node survives with its own label
    assert all(got[1000 + i] == 1000 for i in range(60))  # path collapsed
    assert got[3003] == 3003  # out-of-universe edge dropped, 3003 isolated


def test_cc_string_nodes(ray_session):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    nodes = ["a", "b", "c", "x", "y"]
    got = _cc(edges, nodes)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_triangle_counts_vs_bruteforce(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(2)
    n_nodes, n_edges = 60, 240
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    got = (
        triangle_counts(
            ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(5)
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype("int64")
    )
    E = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj: dict[int, set[int]] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = set()
    for a, b in E:
        for c in adj[a] & adj[b]:
            tri.add(tuple(sorted((a, b, c))))
    from collections import Counter

    cnt = Counter(v for t in tri for v in t)
    want = pd.DataFrame(sorted(cnt.items()), columns=["node", "n_triangles"]).astype(
        "int64"
    )
    assert got.values.tolist() == want.values.tolist()
    assert len(tri) > 0


def test_triangle_counts_ring_exact(ray_session):
    # i→i+1, i→i+2 over a 12-ring: exactly one triangle per i, every node in 3
    import ray.data

    from search_engine_framework_ray.stages.graph import triangle_counts

    i = np.arange(12, dtype=np.int64)
    edges = pd.DataFrame(
        {"src": np.concatenate([i, i]), "dst": np.concatenate([(i + 1) % 12, (i + 2) % 12])}
    )
    out = triangle_counts(ray.data.from_pandas(edges)).to_pandas()
    assert out["n_triangles"].sum() == 3 * 12
    assert (out["n_triangles"] == 3).all() and len(out) == 12


def test_random_walks_prf_rule_and_continuity(ray_session):
    """Walks: every hop follows an existing edge, hop choice equals the
    brute-force argmin of the PRF hash, full length on an undirected
    graph."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data

    from search_engine_framework_ray.stages.graph import random_walks

    # small cycle + chords, undirected
    e0 = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6)]
    edges = pd.DataFrame(
        {
            "src": [a for a, b in e0] + [b for a, b in e0],
            "dst": [b for a, b in e0] + [a for a, b in e0],
        }
    )
    nodes = pd.DataFrame({"node": np.arange(8, dtype=np.int64)})
    out = (
        random_walks(
            ray.data.from_pandas(edges).repartition(3),
            ray.data.from_pandas(nodes).repartition(2),
            steps=3,
        )
        .to_pandas()
        .sort_values(["s", "step"])
        .reset_index(drop=True)
    )
    assert len(out) == 8 * 4
    adj = {}
    for a, b in zip(edges["src"], edges["dst"]):
        adj.setdefault(int(a), set()).add(int(b))

    def h(s, c, t, m):
        return int.from_bytes(
            hashlib.md5(f"{s}|{c}|{t}|{m}".encode()).digest()[8:], "little"
        )

    for s, g in out.groupby("s"):
        path = g.sort_values("step")["cur"].tolist()
        assert path[0] == s
        for t in range(1, len(path)):
            prev, cur = path[t - 1], path[t]
            assert cur in adj[prev]  # continuity
            want = min(sorted(adj[prev]), key=lambda m: (h(s, prev, t, m), m))
            assert cur == want  # exact PRF argmin


def test_personalized_pagerank_concentrates_on_seeds(ray_session):
    """PPR: with a single seed and uniform teleport off, seed + its
    out-neighborhood outrank distant nodes; uniform pagerank over the same
    graph does NOT show the same concentration."""
    import numpy as np
    import pandas as pd
    import ray.data

    from search_engine_framework_ray.stages.graph import pagerank

    # directed ring 0→1→…→9→0
    edges = pd.DataFrame({"src": np.arange(10), "dst": (np.arange(10) + 1) % 10})
    nodes = pd.DataFrame({"node": np.arange(10, dtype=np.int64)})
    ppr = (
        pagerank(
            ray.data.from_pandas(edges),
            nodes=ray.data.from_pandas(nodes),
            iters=3,
            seed_pred=lambda k: np.asarray(k, dtype=np.int64) == 0,
        )
        .to_pandas()
        .set_index("node")["rank_micros"]
    )
    # teleport lands only on 0; mass decays along the ring 0→1→2→3
    assert ppr.loc[0] > ppr.loc[5]
    assert ppr.loc[1] > ppr.loc[5] and ppr.loc[2] > ppr.loc[5]
    assert ppr.loc[1] >= ppr.loc[2] >= ppr.loc[3]


def test_walk_pairs_window_and_counts(ray_session):
    """Pair extraction: hand-built two walks, window 2, directed pairs
    with exact counts and (cnt desc, center, context) ordering."""
    import numpy as np
    import pandas as pd
    import ray.data

    from search_engine_framework_ray.stages.graph import walk_pairs

    # walk 0: 0→1→2 ; walk 1: 1→2→3 (steps 0..2)
    w = pd.DataFrame(
        {
            "s": [0, 0, 0, 1, 1, 1],
            "step": [0, 1, 2, 0, 1, 2],
            "cur": [0, 1, 2, 1, 2, 3],
        }
    )
    out = walk_pairs(ray.data.from_pandas(w).repartition(3), window=2, top_n=100)
    got = {(r.center, r.context): r.cnt for r in out.itertuples()}
    # (1,2) appears in both walks (dist 1); (2,1) likewise
    assert got[(1, 2)] == 2 and got[(2, 1)] == 2
    assert got[(0, 2)] == 1 and got[(2, 0)] == 1  # dist 2 within window
    assert (1, 3) in got and (0, 3) not in got  # different walks never pair
    assert out["cnt"].is_monotonic_decreasing or (
        out["cnt"].iloc[0] >= out["cnt"].iloc[-1]
    )


def _ref_hits(src, dst, n, iters=2, scale=1_000_000):
    """Single-threaded integer HITS: int64 sums + v*scale//max rescales."""
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)

    def norm(v):
        m = v.max()
        return v * scale // m if m > 0 else v

    for _ in range(iters):
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, dst, h[src])
        a = norm(a)
        h = np.zeros(n, dtype=np.int64)
        np.add.at(h, src, a[dst])
        h = norm(h)
    return h, a


def test_hits_matches_integer_reference(ray_session):
    from search_engine_framework_ray.stages.graph import hits

    rng = np.random.default_rng(11)
    n = 50
    src = rng.integers(0, n, 220)
    dst = rng.integers(0, n, 220)
    out = (
        hits(
            ray.data.from_pandas(
                pd.DataFrame({"src": src, "dst": dst})
            ).repartition(5),
            nodes=ray.data.from_pandas(pd.DataFrame({"node": np.arange(n)})),
            iters=2,
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    h, a = _ref_hits(src, dst, n)
    assert (out["node"].to_numpy() == np.arange(n)).all()
    assert (out["hub"].to_numpy(np.int64) == h).all()
    assert (out["auth"].to_numpy(np.int64) == a).all()


def test_hits_sinks_sources_and_derived_universe(ray_session):
    """A pure sink (no out-edges) must end with hub=0, a pure source with
    auth=0; node universe derivable from the edge list alone."""
    from search_engine_framework_ray.stages.graph import hits

    # 0 -> 1 -> 2 chain: 0 is a pure source, 2 a pure sink
    e = ray.data.from_items([{"src": 0, "dst": 1}, {"src": 1, "dst": 2}])
    out = (
        hits(e, iters=2, n_buckets=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(out["node"]) == [0, 1, 2]
    assert out.loc[out["node"] == 0, "auth"].item() == 0
    assert out.loc[out["node"] == 2, "hub"].item() == 0
    h, a = _ref_hits(np.array([0, 1]), np.array([1, 2]), 3)
    assert (out["hub"].to_numpy(np.int64) == h).all()
    assert (out["auth"].to_numpy(np.int64) == a).all()


def test_hits_string_nodes(ray_session):
    from search_engine_framework_ray.stages.graph import hits

    e = ray.data.from_items(
        [
            {"src": "hub.example/a", "dst": "auth.example/x"},
            {"src": "hub.example/a", "dst": "auth.example/y"},
            {"src": "hub.example/b", "dst": "auth.example/x"},
        ]
    )
    out = hits(e, iters=2, n_buckets=2).to_pandas().set_index("node")
    # x has two hubs pointing at it -> max auth; a points at both -> max hub
    assert out["auth"].idxmax() == "auth.example/x"
    assert out["hub"].idxmax() == "hub.example/a"
    assert out.loc["auth.example/x", "auth"] == 1_000_000
    assert out.loc["hub.example/a", "hub"] == 1_000_000
