"""URL-level web-curation operators: URL canonicalization + canonical-URL
dedup, and per-host document caps.

A Common-Crawl-scale corpus carries the same logical page under many URL
spellings (scheme/host case, explicit default ports, tracking query params,
fragments, trailing slashes) and a handful of hosts contribute a wildly
disproportionate share of documents. Production curation runs therefore
(1) canonicalize URLs and keep one capture per canonical URL, and
(2) cap the number of documents any single host may contribute. The
reference engine's corpus (ClueWeb09 via Lucene) had both applied upstream
out-of-band (see SURVEY.md §0 — the checked-in code opens a pre-built
index, `QryEval.java:102-103`); here they are first-class distributed
stages.

Scale shapes (shuffles are narrow — ids/keys only, text never crosses an
exchange):

* ``canonical_urls`` — one streaming ``map_batches`` pass; the kernel is a
  chain of vectorized pandas ``.str`` regex ops plus an explode/sort/agg
  for query-param ordering (no per-row Python in the hot path).
* ``url_canonical_dedup`` — the canonicalize pass emits
  ``(id, canon_url, bucket)`` rows only; ONE 256-bucket groupby picks the
  min-id canonical per canon_url (same coarse-bucket pattern as
  ``corpus.curate`` — per-group dispatch over millions of singleton URL
  clusters would be the scale killer, one vectorized ``transform('min')``
  per bucket is not).
* ``host_cap`` — per-batch partial top-N per host (a valid pre-filter: the
  global top-N per host is a subset of the union of per-batch top-Ns), so
  at most ``N × n_hosts_in_batch`` narrow rows reach the ONE bucketed
  groupby that ranks and cuts. A Zipf-heavy host contributes ≤
  N·num_batches candidate rows, never its documents.

Both operators are value-hash verified against DuckDB SQL twins
(string/list-function canonicalization, ``row_number()`` window for the
cap) — see ``__ray_entry__.oracle_sql()['url_canonical'|'host_cap']``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .dedup import _text_hash64

# Tracking params dropped during canonicalization (the common cross-site
# analytics/click identifiers). Anchored match over one `k=v` pair.
TRACKING_PARAM_RE = r"^(?:utm_[^=]*|ref|fbclid|gclid|msclkid)(?:=|$)"

_N_BUCKETS = 256


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized URL canonicalizer for absolute http(s) URLs →
    canonical string. Rules (each mirrored 1:1 in the SQL twin):

    * scheme and host lowercased (path/query case preserved);
    * scheme-default port stripped (``:443`` for https, ``:80`` for http);
    * fragment dropped;
    * tracking query params (``TRACKING_PARAM_RE``) dropped, remaining
      params sorted bytewise; empty query drops the ``?``;
    * trailing ``/``-run stripped from the path (so ``/`` ≡ empty path).

    Entirely pandas ``.str`` kernels except the query-param reorder, which
    is explode → lexicographic sort → group-join (still columnar; the
    per-group join is over the handful of params a single URL carries).
    """
    s = urls.fillna("").astype(object)
    scheme = (
        s.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", expand=False)
        .fillna("")
        .str.lower()
    )
    after = s.str.replace(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", regex=True)
    hostport = after.str.extract(r"^([^/?#]*)", expand=False).fillna("").str.lower()
    rest = after.str.replace(r"^[^/?#]*", "", regex=True)

    host = hostport.mask(
        scheme.eq("https"), hostport.str.replace(r":443$", "", regex=True)
    ).mask(scheme.eq("http"), hostport.str.replace(r":80$", "", regex=True))

    rest = rest.str.replace(r"#[\s\S]*$", "", regex=True)  # drop fragment
    path = rest.str.replace(r"\?[\s\S]*$", "", regex=True)
    query = rest.str.extract(r"\?([\s\S]*)$", expand=False).fillna("")
    path = path.str.replace(r"/+$", "", regex=True)

    # filter tracking params, sort the survivors, rejoin — vectorized via
    # explode + stable sort + per-index join
    parts = query.str.split("&").explode()
    kept = parts[
        parts.notna()
        & parts.ne("")
        & ~parts.str.match(TRACKING_PARAM_RE, na=False)
    ]
    sorted_q = pd.Series("", index=s.index, dtype=object)
    if len(kept):
        kf = pd.DataFrame({"i": kept.index.to_numpy(), "v": kept.to_numpy(object)})
        kf = kf.sort_values(["i", "v"], kind="mergesort")
        joined = kf.groupby("i", sort=False)["v"].agg("&".join)
        sorted_q.loc[joined.index] = joined

    canon = scheme + "://" + host + path
    canon = canon.where(sorted_q.eq(""), canon + "?" + sorted_q)
    return canon


def url_canonical_dedup(
    ds: Dataset, *, id_col: str = "doc_id", url_col: str = "url"
) -> Dataset:
    """Canonical-URL dedup → (id, url, canon_url, canon_id, keep).

    ``canon_id`` = min id sharing the canonical URL; ``keep`` = 1 on that
    canonical row. One streaming canonicalize pass, one narrow 256-bucket
    groupby (rows are ``(id, url, canon_url)`` — at web scale drop
    ``url`` from the exchange and re-join if the raw spelling is needed
    downstream; kept here for the verification surface).
    """

    def narrow(b: pd.DataFrame) -> pd.DataFrame:
        canon = canonicalize_urls(b[url_col])
        h = _text_hash64(canon.tolist())
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                url_col: b[url_col].to_numpy(object),
                "canon_url": canon.to_numpy(object),
                "bucket": (h.astype(np.uint64) % np.uint64(_N_BUCKETS)).astype(
                    np.int64
                ),
            }
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").copy()
        g["canon_id"] = g.groupby("canon_url", sort=False)[id_col].transform("min")
        g["keep"] = (g[id_col] == g["canon_id"]).astype(np.int64)
        return g[[id_col, url_col, "canon_url", "canon_id", "keep"]]

    return (
        ds.map_batches(narrow, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pick, batch_format="pandas")
    )


def parse_robots(text: str, agent: str = "*") -> list[str]:
    """Minimal robots.txt parser → the Disallow path-prefixes applying to
    ``agent`` (exact-token match; the conventional subset: comments, blank
    lines, User-agent grouping where consecutive UA lines share one rule
    block, empty Disallow = no restriction). Returns prefixes in file
    order."""
    rules: list[str] = []
    active = False  # current group applies to `agent`
    in_ua_run = True  # consecutive User-agent lines extend the group header
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_ua_run:  # a new group header starts
                active = False
                in_ua_run = True
            active = active or val == agent
        else:
            in_ua_run = False
            if key == "disallow" and active and val:
                rules.append(val)
    return rules


def robots_filter(
    ds: Dataset,
    robots_by_host: dict[str, str],
    *,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> Dataset:
    """Robots allow/deny pass → rows + ``allowed`` (1/0): a url is denied
    when its path starts with any of its host's Disallow prefixes.

    ``robots_by_host`` (host → robots.txt text) is parsed ONCE on the
    driver and the compiled prefix lists are broadcast via ``ray.put`` —
    the canonical small-side pattern (hosts ≪ pages); the per-batch check
    is a vectorized ``str.startswith`` per (host, prefix) group, never a
    per-row Python loop over rules."""
    import ray as _ray

    compiled = {h: tuple(parse_robots(t)) for h, t in robots_by_host.items()}
    ref = _ray.put(compiled)

    max_rules = max((len(r) for r in compiled.values()), default=0)

    def check(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ROWS per rule-INDEX (not per host — a batch can
        # span thousands of hosts and a per-host loop is overhead-bound):
        # rule i of each row's host is gathered into one array and matched
        # elementwise with np.char.find(path, prefix) == 0 (a prefix no
        # path starts with stands in where a host has < i rules (NUL would collapse to "" in numpy U-dtype and match everything))
        rules = _ray.get(ref)
        b = b.copy()
        allowed = np.ones(len(b), dtype=np.int64)
        paths = b[path_col].astype(str).to_numpy(dtype="U")
        hosts = b[host_col].astype(str)
        for i in range(max_rules):
            pref_of = {h: r[i] for h, r in rules.items() if len(r) > i}
            pref = hosts.map(pref_of).fillna("\x01").to_numpy(dtype="U")
            allowed[np.char.find(paths, pref) == 0] = 0
        b["allowed"] = allowed
        return b

    return ds.map_batches(check, batch_format="pandas")


def crawl_delta(
    old_ds: Dataset,
    new_ds: Dataset,
    *,
    key_col: str = "url",
    fp_col: str = "fp",
) -> Dataset:
    """Dump-over-dump crawl diff → (key, status, old_fp, new_fp) with
    status ∈ {added, removed, changed, unchanged}; missing-side
    fingerprints surface as -1 sentinels (int columns stay exact-hashable,
    matching the repo's outer-join convention).

    Both inputs are already narrow ``(key, fp)`` tables — fingerprint the
    crawls upstream (``textstats.fingerprint_md5``) so document text never
    enters this operator. Keys must be unique within each crawl
    (canonicalize + dedup upstream); a duplicate key fails loudly in the
    per-bucket reindex rather than silently picking one capture. Shape: tag each side, union, ONE co-partition
    bucket shuffle on the key hash, then a vectorized per-bucket
    reindex/compare — the same tagged-union pattern as the as-of join
    (``stages/join.py``), so neither crawl is ever broadcast or pulled to
    the driver. At 10¹²-page scale each bucket holds |corpus|/256 keys ×
    two int columns; raise ``_N_BUCKETS``-equivalent via ``n_buckets`` if
    a bucket outgrows worker heap.
    """

    def tag(side: int):
        def inner(b: pd.DataFrame) -> pd.DataFrame:
            h = _text_hash64(b[key_col].astype(str).tolist())
            return pd.DataFrame(
                {
                    key_col: b[key_col].to_numpy(object),
                    "fp": b[fp_col].to_numpy(np.int64),
                    "side": np.full(len(b), side, dtype=np.int64),
                    "bucket": (h.astype(np.uint64) % np.uint64(_N_BUCKETS)).astype(
                        np.int64
                    ),
                }
            )

        return inner

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        # nullable-Int64 through the reindex: a float64 NaN-fill would
        # silently shave the low bits off |fp| ≥ 2^53 (caught by the md5
        # oracle — same transport rule as the as-of join's id columns)
        old = g[g["side"] == 0].set_index(key_col)["fp"].astype("Int64")
        new = g[g["side"] == 1].set_index(key_col)["fp"].astype("Int64")
        keys = old.index.union(new.index, sort=True)
        ofp = old.reindex(keys)
        nfp = new.reindex(keys)
        o_na = ofp.isna().to_numpy()
        n_na = nfp.isna().to_numpy()
        o_val = ofp.fillna(-1).astype(np.int64).to_numpy()
        n_val = nfp.fillna(-1).astype(np.int64).to_numpy()
        status = np.select(
            [o_na, n_na, o_val == n_val],
            ["added", "removed", "unchanged"],
            default="changed",
        )
        return pd.DataFrame(
            {
                key_col: keys.to_numpy(object),
                "status": status,
                "old_fp": o_val,
                "new_fp": n_val,
            }
        )

    tagged = old_ds.map_batches(tag(0), batch_format="pandas").union(
        new_ds.map_batches(tag(1), batch_format="pandas")
    )
    return tagged.groupby("bucket").map_groups(diff, batch_format="pandas")


def host_cap(
    ds: Dataset,
    n: int,
    *,
    id_col: str = "doc_id",
    host_col: str = "source",
    order_col: str = "n_chars",
) -> Dataset:
    """Per-host document cap → (id, host, order, host_rank), keeping the
    top-``n`` docs per host ordered by (``order_col`` desc, id asc).

    Per-batch combiner keeps each batch's local top-``n`` per host (sound:
    any globally-kept row is in its batch's top-``n``), so only capped
    candidate rows reach the single bucketed groupby that assigns the
    final dense rank and cuts at ``n``.
    """

    def local(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, host_col, order_col]].copy()
        b = b.sort_values(
            [host_col, order_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        b = b.groupby(host_col, sort=False).head(n)
        h = _text_hash64(b[host_col].astype(str).tolist())
        b["bucket"] = (h.astype(np.uint64) % np.uint64(_N_BUCKETS)).astype(np.int64)
        return b

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [host_col, order_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        ).copy()
        g["host_rank"] = g.groupby(host_col, sort=False).cumcount() + 1
        g = g[g["host_rank"] <= n]
        g["host_rank"] = g["host_rank"].astype(np.int64)
        return g[[id_col, host_col, order_col, "host_rank"]]

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


def crawl_frontier(
    pages: Dataset,
    *,
    url_col: str = "url",
    top_k: int = 20,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Crawl-frontier prioritization: anchor targets NOT yet fetched,
    ranked by distinct-source indegree (the indegree-greedy frontier
    policy — the zero-iteration special case of OPIC/PageRank ordering).

    Shape, stage by stage:

    * anchors come from the REAL HTML extraction stage (the same
      ``ExtractStage`` rows the index build shuffles), so frontier
      discovery can never diverge from what indexing saw;
    * the fetched "seen set" is a broadcast Bloom filter over sha1-low64
      url keys (the standard crawler seen-set shape): bloom-FAILING
      anchors are definite frontier and stream through with NO shuffle,
      the passing sliver is verified exactly (stages/join.py
      bloom_semi_join anti=True);
    * distinct (src, target) pairs collapse per batch, then ONE
      target-bucket shuffle computes exact distinct-source indegree and a
      per-bucket local top-k — k·buckets rows reach the driver.

    → (rank, url, indegree) top_k by (indegree desc, url)."""
    from ..pipelines.build_index import ExtractStage
    from .join import bloom_semi_join

    def page_keys(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"ukey": _text_hash64(b[url_col].astype(str).tolist())})

    def anchor_pairs(b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        t = ExtractStage()(pa.Table.from_pandas(b, preserve_index=False))
        df = t.select(["kind", "url", "src"]).to_pandas()
        df = df[df["kind"] == "a"]
        out = pd.DataFrame({"target": df["url"], "src": df["src"]})
        out = out.drop_duplicates()  # per-batch combiner for distinct pairs
        out["ukey"] = _text_hash64(out["target"].astype(str).tolist())
        return out.reset_index(drop=True)

    probe = pages.map_batches(anchor_pairs, batch_format="pandas")
    frontier = bloom_semi_join(
        probe,
        pages.map_batches(page_keys, batch_format="pandas"),
        probe_key="ukey",
        build_key="ukey",
        anti=True,
    )

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["target", "src", "ukey"]].copy()
        b["bucket"] = (
            b["ukey"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)
        return b

    def degree_topk(g: pd.DataFrame) -> pd.DataFrame:
        deg = (
            g.drop_duplicates(["target", "src"])
            .groupby("target", sort=False)
            .size()
            .reset_index(name="indegree")
        )
        deg = deg.sort_values(
            ["indegree", "target"], ascending=[False, True], kind="mergesort"
        ).head(top_k)
        return pd.DataFrame(
            {"url": deg["target"], "indegree": deg["indegree"].astype(np.int64)}
        )

    rows = (
        frontier.map_batches(bucketed, batch_format="pandas")
        .groupby("bucket")
        .map_groups(degree_topk, batch_format="pandas")
        .to_pandas()
    )
    rows = rows.sort_values(
        ["indegree", "url"], ascending=[False, True], kind="mergesort"
    ).head(top_k)
    rows.insert(0, "rank", np.arange(1, len(rows) + 1, dtype=np.int64))
    return rows.reset_index(drop=True)
