"""Ranking-comparison operators (query/abtest.py): exact-integer RBO and
deterministic team-draft interleaving."""

from search_engine_framework_ray.query.abtest import (
    _md5_low64,
    rbo_table,
    team_draft_interleave,
)


def test_rbo_identical_lists_hits_prefix_mass():
    t = rbo_table([1, 2, 3, 4, 5], [1, 2, 3, 4, 5], k=5)
    assert list(t["overlap"]) == [1, 2, 3, 4, 5]
    # identical lists: term_d = (1-p)·p^(d-1) exactly; micros rounded
    # half-away per depth: .1, .09, .081, .0729, .06561
    assert list(t["term_micros"]) == [100000, 90000, 81000, 72900, 65610]
    assert t["rbo_cum_micros"].iloc[-1] == 409510


def test_rbo_disjoint_is_zero_and_partial_overlap_counts():
    t = rbo_table([1, 2, 3], [4, 5, 6], k=3)
    assert (t["term_micros"] == 0).all()
    t = rbo_table([1, 2, 3], [3, 9, 1], k=3)
    # depth1: {1}∩{3}=0; depth2: {1,2}∩{3,9}=0; depth3: {1,2,3}∩{3,9,1}=2
    assert list(t["overlap"]) == [0, 0, 2]
    # term3 = 2·(1/10)·(81/100)/3 = 0.054 exactly
    assert t["term_micros"].iloc[-1] == 54000


def test_team_draft_no_dups_balanced_and_deterministic():
    a = [10, 11, 12, 13, 14, 15]
    b = [11, 20, 10, 21, 22, 23]
    out = team_draft_interleave(a, b, k=6, salt="td")
    assert out["doc_id"].is_unique
    na = (out["team"] == "A").sum()
    nb = (out["team"] == "B").sum()
    assert abs(na - nb) <= 1
    again = team_draft_interleave(a, b, k=6, salt="td")
    assert out.equals(again)
    # every pick is the drafting team's best not-yet-picked doc
    chosen: set[int] = set()
    for _, row in out.iterrows():
        lst = a if row["team"] == "A" else b
        expect = next(x for x in lst if x not in chosen)
        assert row["doc_id"] == expect
        chosen.add(int(row["doc_id"]))


def test_team_draft_exhausted_list_cedes():
    out = team_draft_interleave([1], [2, 3, 4, 5], k=4, salt="td")
    assert len(out) == 4
    assert (out["team"] == "B").sum() == 3  # A ran out after its one doc
    assert set(out["doc_id"]) == {1, 2, 3, 4}


def test_coin_matches_duckdb_md5_number_lower():
    import duckdb

    got = [_md5_low64(f"td:{i}") % 2 for i in range(10)]
    want = [
        int(x)
        for (x,) in duckdb.sql(
            "SELECT md5_number_lower('td:' || CAST(i AS VARCHAR)) % 2 "
            "FROM generate_series(0, 9) t(i)"
        ).fetchall()
    ]
    assert got == want
