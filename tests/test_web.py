"""Unit tests for stages/web.py (URL canonicalization, canonical-URL dedup,
per-host caps) — handcrafted URLs so every canonicalization rule is pinned
by a literal expectation, and multi-block inputs so the partial/reduce
paths are exercised."""

import pandas as pd

import ray.data

from search_engine_framework_ray.stages.web import (
    canonicalize_urls,
    host_cap,
    url_canonical_dedup,
)


def _two_block_ds(df: pd.DataFrame):
    half = len(df) // 2
    return ray.data.from_pandas(
        [df.iloc[:half].reset_index(drop=True), df.iloc[half:].reset_index(drop=True)]
    )


def test_canonicalize_rules():
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTPS://WWW.Ex.COM/Path/A": "https://www.ex.com/Path/A",
        # default port stripped only when it matches the scheme
        "https://ex.com:443/a": "https://ex.com/a",
        "http://ex.com:80/a": "http://ex.com/a",
        "http://ex.com:443/a": "http://ex.com:443/a",
        "https://ex.com:8443/a": "https://ex.com:8443/a",
        # fragment dropped
        "https://ex.com/a#sec-2": "https://ex.com/a",
        # tracking params dropped, rest sorted; empty query drops '?'
        "https://ex.com/a?utm_source=x&b=2&a=1&ref=rss": "https://ex.com/a?a=1&b=2",
        "https://ex.com/a?utm_campaign=x&fbclid=1": "https://ex.com/a",
        # bare tracking key without '=' also dropped
        "https://ex.com/a?ref&z=9": "https://ex.com/a?z=9",
        # trailing-slash run stripped; bare host with '/' == bare host
        "https://ex.com/a//": "https://ex.com/a",
        "https://ex.com/": "https://ex.com",
        "https://ex.com": "https://ex.com",
        # query survives trailing-slash handling on the path
        "https://ex.com/a/?b=2&a=1": "https://ex.com/a?a=1&b=2",
    }
    urls = pd.Series(list(cases))
    got = canonicalize_urls(urls).tolist()
    assert got == list(cases.values())


def test_url_canonical_dedup_groups(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "url": [
                "https://ex.com/p/1/",
                "HTTPS://EX.COM:443/p/1",
                "https://ex.com/p/1#frag",
                "https://ex.com/p/1?utm_source=a",
                "https://other.com/p/1",
                "https://ex.com/p/2",
            ],
        }
    )
    out = (
        url_canonical_dedup(_two_block_ds(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["canon_id"].tolist() == [0, 0, 0, 0, 4, 5]
    assert out["keep"].tolist() == [1, 0, 0, 0, 1, 1]
    assert (out.loc[:3, "canon_url"] == "https://ex.com/p/1").all()


def test_host_cap_rank_and_ties(ray_session):
    # host a: 5 docs, cap 2 → two longest win; equal n_chars break by id
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "source": ["a", "a", "a", "a", "a", "b", "b"],
            "n_chars": [10, 30, 30, 5, 30, 7, 7],
        }
    )
    out = (
        host_cap(_two_block_ds(df), 2)
        .to_pandas()
        .sort_values(["source", "host_rank"])
        .reset_index(drop=True)
    )
    assert out[["doc_id", "source", "host_rank"]].values.tolist() == [
        [2, "a", 1],
        [3, "a", 2],
        [6, "b", 1],
        [7, "b", 2],
    ]


def test_host_cap_partial_combiner_sound(ray_session):
    # the per-batch pre-filter must not drop a global winner: put the two
    # global best of host 'h' in DIFFERENT blocks, each behind a local rival
    df1 = pd.DataFrame(
        {"doc_id": [1, 2], "source": ["h", "h"], "n_chars": [100, 90]}
    )
    df2 = pd.DataFrame(
        {"doc_id": [3, 4], "source": ["h", "h"], "n_chars": [95, 1]}
    )
    ds = ray.data.from_pandas([df1, df2])
    out = host_cap(ds, 2).to_pandas().sort_values("host_rank")
    assert out["doc_id"].tolist() == [1, 3]


def test_crawl_delta_statuses_and_large_fp(ray_session):
    from search_engine_framework_ray.stages.web import crawl_delta

    # fp magnitudes above 2^53 pin the nullable-Int64 transport (a float64
    # NaN-fill reindex would corrupt them)
    big = 1888482423293860036
    old = pd.DataFrame(
        {"url": ["a", "b", "c"], "fp": [big, 7, 9]}
    )
    new = pd.DataFrame(
        {"url": ["b", "c", "d"], "fp": [7, 10, big + 1]}
    )
    out = (
        crawl_delta(
            ray.data.from_pandas([old.iloc[:2], old.iloc[2:]]),
            ray.data.from_pandas([new.iloc[:1], new.iloc[1:]]),
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["status"].tolist() == ["removed", "unchanged", "changed", "added"]
    assert out["old_fp"].tolist() == [big, 7, 9, -1]
    assert out["new_fp"].tolist() == [-1, 7, 10, big + 1]


def test_parse_robots_grouping():
    from search_engine_framework_ray.stages.web import parse_robots

    text = (
        "# comment\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: a\n"
        "User-agent: *\n"   # consecutive UA lines share one group
        "Disallow: /p/3\n"
        "Disallow: /q/\n"
        "\n"
        "User-agent: c\n"
        "Disallow: /z\n"
        "Disallow:\n"       # empty value = no restriction
    )
    assert parse_robots(text) == ["/p/3", "/q/"]
    assert parse_robots(text, agent="badbot") == ["/"]
    assert parse_robots(text, agent="c") == ["/z"]


def test_robots_filter_prefix_semantics(ray_session):
    from search_engine_framework_ray.stages.web import robots_filter

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "host": ["h1", "h1", "h2", "h1"],
            "path": ["/p/3/x", "/p/31", "/p/3/x", "/a"],
        }
    )
    robots = {"h1": "User-agent: *\nDisallow: /p/3\n"}  # h2 has no robots
    out = (
        robots_filter(_two_block_ds(df), robots)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # prefix match: /p/3 denies /p/3/x AND /p/31; h2 unaffected
    assert out["allowed"].tolist() == [0, 0, 1, 1]


def test_crawl_frontier_seen_filter_distinct_src_and_ties(ray_session):
    """Fetched targets are filtered (even when heavily linked), a source
    linking the same target twice counts once, ties break url-ascending."""
    import ray.data

    from search_engine_framework_ray.stages.web import crawl_frontier

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x{i}</a>' for i, h in enumerate(hrefs))
        return {"url": url, "html": f"<html><body>{body}</body></html>".encode()}

    pages = [
        # p0..p2 all link the FETCHED page p3 (must not surface) and ext-a
        page("p0", ["p3", "https://a/", "https://a/"]),  # dup href: 1 src
        page("p1", ["p3", "https://a/", "https://b/"]),
        page("p2", ["p3", "https://b/"]),
        page("p3", ["https://c/"]),
    ]
    out = crawl_frontier(ray.data.from_items(pages), top_k=10)
    assert out["url"].tolist() == ["https://a/", "https://b/", "https://c/"]
    assert out["indegree"].tolist() == [2, 2, 1]  # a ties b at 2 → url order
    assert out["rank"].tolist() == [1, 2, 3]
    assert "p3" not in set(out["url"])
