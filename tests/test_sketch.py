"""KMV bottom-k sketch: estimator accuracy (the n ≥ k formula branch the
tiny-vocab driver fixture never reaches), mergeability, and Ray-vs-DuckDB
parity on a large-vocabulary synthetic corpus."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from search_engine_framework_ray.stages.dedup import _md5_hash64
from search_engine_framework_ray.stages.sketch import (
    _batch_kmv_partial,
    kmv_distinct,
    kmv_estimate,
    kmv_jaccard_pairs,
)


def _hashes(tokens):
    return np.array(sorted({_md5_hash64(t) for t in tokens}), dtype=np.uint64)


def test_estimator_exact_below_k():
    toks = [f"w{i}" for i in range(40)]
    assert kmv_estimate(_hashes(toks), k=64) == 40


def test_estimator_accuracy_above_k():
    # 5,000 distinct tokens, k=64 → relative standard error ≈ 1/√(k-2) ≈ 13%
    toks = [f"tok{i}" for i in range(5000)]
    est = kmv_estimate(_hashes(toks), k=64)
    assert 0.6 * 5000 < est < 1.5 * 5000


def test_sketch_merge_equals_whole():
    # bottom-k of the union == bottom-k of (bottom-k(A) ∪ bottom-k(B))
    a = [f"a{i}" for i in range(500)]
    b = [f"b{i}" for i in range(500)] + a[:100]
    k = 64
    whole = _hashes(a + b)[:k]
    merged = np.unique(np.concatenate([_hashes(a)[:k], _hashes(b)[:k]]))[:k]
    assert np.array_equal(whole, merged)


def test_batch_partial_caps_per_key():
    b = pd.DataFrame(
        {
            "source": ["s1"] * 3 + ["s2"],
            "text": [
                " ".join(f"w{i}" for i in range(100)),
                " ".join(f"w{i}" for i in range(50, 150)),
                "w1 w2 w3",
                "only two",
            ],
        }
    )
    out = _batch_kmv_partial(b, "source", "text", k=16)
    sizes = out.groupby("source")["h"].agg(["size", "nunique"])
    assert sizes.loc["s1", "size"] == 16  # capped, distinct across docs
    assert sizes.loc["s2", "size"] == 2  # below k → the whole set
    assert (sizes["size"] == sizes["nunique"]).all()
    # the retained hashes ARE the k smallest of the key's distinct set
    want = _hashes([f"w{i}" for i in range(150)])[:16]
    got = np.sort(out[out["source"] == "s1"]["h"].to_numpy(np.uint64))
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def big_vocab_docs(ray_session, tmp_path_factory):
    # 3 sources × 120 docs × 40 tokens drawn from per-source vocabularies
    # with controlled overlap: src_a ∩ src_b large, src_c disjoint.
    rng = np.random.default_rng(7)
    vocab_a = [f"common{i}" for i in range(3000)] + [f"a{i}" for i in range(1000)]
    vocab_b = [f"common{i}" for i in range(3000)] + [f"b{i}" for i in range(1000)]
    vocab_c = [f"c{i}" for i in range(4000)]
    rows = []
    for src, vocab in (("src_a", vocab_a), ("src_b", vocab_b), ("src_c", vocab_c)):
        for d in range(120):
            toks = rng.choice(vocab, size=40, replace=True)
            rows.append({"source": src, "text": " ".join(toks)})
    pdf = pd.DataFrame(rows)
    path = tmp_path_factory.mktemp("kmv") / "docs.parquet"
    pdf.to_parquet(path)
    return str(path), pdf


def test_kmv_distinct_parity_big_vocab(big_vocab_docs):
    import ray.data

    path, pdf = big_vocab_docs
    ds = ray.data.read_parquet(path)
    got = kmv_distinct(ds, k=64).sort_values("source").reset_index(drop=True)
    assert (got["k_used"] == 64).all()  # formula branch exercised
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql(
        r"""
        WITH toks AS (
            SELECT source,
                   unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS tok
            FROM docs
        ),
        d AS (SELECT DISTINCT source, md5_number_lower(tok) AS h FROM toks),
        r AS (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
                   count(*) OVER (PARTITION BY source) AS n_distinct
            FROM d
        )
        SELECT source,
               CAST(LEAST(n_distinct, 64) AS BIGINT) AS k_used,
               CAST(CASE WHEN h >= CAST(9223372036854775808 AS UBIGINT)
                         THEN CAST(h AS HUGEINT)
                              - CAST(4294967296 AS HUGEINT) * CAST(4294967296 AS HUGEINT)
                         ELSE CAST(h AS HUGEINT) END AS BIGINT) AS kth_hash,
               CAST(CASE WHEN n_distinct < 64 THEN CAST(n_distinct AS HUGEINT)
                         ELSE (CAST(63 AS HUGEINT)
                               * CAST(4294967296 AS HUGEINT) * CAST(4294967296 AS HUGEINT))
                              // CAST(h AS HUGEINT)
                    END AS BIGINT) AS est_distinct
        FROM r WHERE rn = LEAST(n_distinct, 64) ORDER BY source
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["source", "k_used", "kth_hash", "est_distinct"]],
        want,
        check_dtype=False,
        check_exact=True,
    )
    # sanity: true distincts are ~4000/source; k=64 keeps the estimate coarse
    truth = (
        pdf.assign(tok=pdf["text"].str.split(" "))
        .explode("tok")
        .groupby("source")["tok"]
        .nunique()
    )
    for _, row in got.iterrows():
        t = truth[row["source"]]
        assert 0.5 * t < row["est_distinct"] < 2.0 * t


def test_kmv_jaccard_overlap_structure(big_vocab_docs):
    import ray.data

    path, pdf = big_vocab_docs
    ds = ray.data.read_parquet(path)
    out = kmv_jaccard_pairs(ds, k=64).set_index(["key_a", "key_b"])
    # a∩b share the 3k common vocab; c is disjoint from both. k=64 has
    # SE ≈ √(J(1−J)/k) ≈ 0.06, so check against the TRUE sampled-set
    # Jaccard within a generous ±0.20 band.
    tok_sets = (
        pdf.assign(tok=pdf["text"].str.split(" "))
        .explode("tok")
        .groupby("source")["tok"]
        .agg(set)
    )
    true_j = len(tok_sets["src_a"] & tok_sets["src_b"]) / len(
        tok_sets["src_a"] | tok_sets["src_b"]
    )
    est_j = out.loc[("src_a", "src_b"), "j_micros"] / 1e6
    assert abs(est_j - true_j) < 0.20 and est_j > 0
    assert out.loc[("src_a", "src_c"), "j_micros"] == 0
    assert out.loc[("src_b", "src_c"), "j_micros"] == 0
    assert (out["k_eff"] == 64).all()


def test_empty_and_single_key_edges(ray_session):
    import ray.data

    pdf_empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                              "text": pd.Series(dtype="object")})
    ds = ray.data.from_pandas(pdf_empty)
    assert len(kmv_distinct(ds, k=8)) == 0
    assert len(kmv_jaccard_pairs(ds, k=8)) == 0
    one = ray.data.from_pandas(pd.DataFrame({"source": ["s"], "text": ["a b c"]}))
    d = kmv_distinct(one, k=8)
    assert d["est_distinct"].tolist() == [3]
    assert len(kmv_jaccard_pairs(one, k=8)) == 0  # one key → no pairs


# ----------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ----------------------------------------------------------------------------


def test_mg_summary_decrement_semantics():
    from search_engine_framework_ray.stages.sketch import _mg_summary

    counts = pd.Series({"a": 10, "b": 7, "c": 3, "d": 2, "e": 1})
    kept, dec = _mg_summary(counts, m=2)
    # (m+1)-th largest = 3; survivors undercount by exactly 3
    assert dec == 3
    assert kept.to_dict() == {"a": 7, "b": 4}
    # below-m input passes through exactly, no decrement
    kept2, dec2 = _mg_summary(counts, m=5)
    assert dec2 == 0 and kept2.to_dict() == counts.to_dict()


def test_heavy_hitters_exact_across_batches(ray_session):
    """Skewed multi-block corpus: the MG+verify path must return the exact
    top-k even though each per-batch summary decrements (m < per-batch
    vocab), because the candidate superset rule retains every true heavy
    term."""
    import ray.data

    from search_engine_framework_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    # 2 heavy terms + 40 rare ones, spread over 8 blocks
    docs = []
    for i in range(64):
        toks = ["heavy1"] * 30 + ["heavy2"] * 20 + [
            f"rare{rng.integers(0, 40)}" for _ in range(10)
        ]
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    df = pd.DataFrame({"text": docs})
    ds = ray.data.from_pandas(df).repartition(8)
    out = heavy_hitters(ds, m=6, k=2)
    assert out["term"].tolist() == ["heavy1", "heavy2"]
    assert out["cnt"].tolist() == [30 * 64, 20 * 64]


def test_heavy_hitters_fails_loudly_on_flat_skew(ray_session):
    """Uniform counts with m far below the vocabulary: the superset
    guarantee collapses (lb_k ≤ D) and the operator must refuse rather
    than return a plausible-but-unverified list."""
    import ray.data

    from search_engine_framework_ray.stages.sketch import heavy_hitters

    docs = [" ".join(f"t{j}" for j in range(50)) for _ in range(32)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(4)
    with pytest.raises(ValueError, match="raise m"):
        heavy_hitters(ds, m=4, k=3)


# ----------------------------------------------------------------------------
# Count-min sketch
# ----------------------------------------------------------------------------


def test_cms_one_sided_and_exact_when_wide(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.sketch import cms_point_counts

    docs = pd.DataFrame(
        {
            "text": [
                "apple apple banana cherry",
                "apple banana banana date",
                "cherry date date date",
            ]
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    probes = ["apple", "banana", "cherry", "date", "missing"]
    # wide sketch → no collisions among 5 distinct tokens → est == exact
    out = cms_point_counts(ds, probes, d=4, w=1 << 16)
    got = dict(zip(out["term"], out["est_cnt"]))
    assert got == {"apple": 3, "banana": 3, "cherry": 2, "date": 4, "missing": 0}
    assert (out["est_cnt"] == out["exact_cnt"]).all()
    # narrow sketch → collisions possible, but never an undercount
    tight = cms_point_counts(ds, probes, d=2, w=4)
    assert (tight["est_cnt"] >= tight["exact_cnt"]).all()


def test_cms_row_hashes_independent():
    from search_engine_framework_ray.stages.sketch import _cms_cols, _md5_hash128

    terms = np.array([f"t{i}" for i in range(200)], dtype=object)
    cols = _cms_cols(terms, 4, 1024)
    assert cols.shape == (200, 4)
    assert not np.array_equal(cols[:, 0], cols[:, 1])
    assert cols.min() >= 0 and cols.max() < 1024
    # row 0 is the plain lower-64 hash; row j wraps mod 2^64 exactly
    lo, up = _md5_hash128("t0")
    assert cols[0, 0] == lo % 1024
    assert cols[0, 3] == ((lo + 3 * (up | 1)) % (1 << 64)) % 1024


# ----------------------------------------------------------------------------
# HyperLogLog
# ----------------------------------------------------------------------------


def test_bit_length_u64_exact():
    from search_engine_framework_ray.stages.sketch import _bit_length_u64

    vals = np.array(
        [0, 1, 2, 3, (1 << 56) - 1, 1 << 56, (1 << 63), (1 << 64) - 1, 12345],
        dtype=np.uint64,
    )
    got = _bit_length_u64(vals)
    want = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    assert np.array_equal(got, want)
    rng = np.random.default_rng(7)
    rand = rng.integers(0, 1 << 63, size=500, dtype=np.int64).astype(np.uint64)
    assert np.array_equal(
        _bit_length_u64(rand),
        np.array([int(v).bit_length() for v in rand], dtype=np.int64),
    )


def _brute_hll(tokens):
    """Driver-side single-pass HLL over a token iterable."""
    regs = {}
    for t in set(tokens):
        h = _md5_hash64(t)
        b = h >> 56
        rest = h & ((1 << 56) - 1)
        rho = 57 if rest == 0 else 56 - rest.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_brute_force(ray_session):
    import ray.data

    from search_engine_framework_ray.stages.sketch import hll_registers

    toks_a = [f"alpha{i}" for i in range(800)]
    toks_b = [f"beta{i}" for i in range(50)]
    docs = pd.DataFrame(
        {
            "source": ["a"] * 8 + ["b"],
            "text": [" ".join(toks_a[i * 100 : (i + 1) * 100]) for i in range(8)]
            + [" ".join(toks_b)],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    regs = hll_registers(ds, key_col="source", text_col="text").to_pandas()
    for key, toks in (("a", toks_a), ("b", toks_b)):
        got = dict(
            zip(
                regs.loc[regs["source"] == key, "bucket"],
                regs.loc[regs["source"] == key, "m_j"],
            )
        )
        assert got == _brute_hll(toks), key


def test_hll_estimate_accuracy_and_lc_parity(ray_session):
    import math

    import ray.data

    from search_engine_framework_ray.stages.sketch import hll_distinct

    # 20k distinct tokens → raw-estimator regime; HLL rse ≈ 1.04/√256 ≈ 6.5%
    toks = [f"v{i}" for i in range(20_000)]
    docs = pd.DataFrame(
        {
            "source": ["big"] * 20,
            "text": [" ".join(toks[i * 1000 : (i + 1) * 1000]) for i in range(20)],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(5)
    out = hll_distinct(ds, key_col="source", text_col="text")
    est = int(out.loc[out["source"] == "big", "est_distinct"].iloc[0])
    assert 0.8 * 20_000 < est < 1.2 * 20_000

    # linear-counting branch: DuckDB ln == Python math.log for every
    # possible zero-register count (the only float in the operator)
    con = duckdb.connect()
    rows = con.sql(
        "SELECT v, CAST(floor(256 * ln(256.0 / v)) AS BIGINT)"
        " FROM unnest(range(1, 257)) AS t(v)"
    ).fetchall()
    for v, dk in rows:
        assert dk == math.floor(256 * math.log(256 / v)), v
