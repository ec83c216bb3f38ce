"""ray-job-submittable CLI: build → query → TREC output (in-process, reusing
the session Ray)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_framework_ray.cli import main, read_query_file


@pytest.fixture(scope="module")
def cli_env(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    src = root / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "apple banana apple",
                    "banana cherry date",
                    "apple cherry",
                    "date date date",
                ],
            }
        ),
        src,
    )
    qfile = root / "q.txt"
    qfile.write_text("1: apple\n2: #NEAR/1(banana cherry)\n")
    idx = str(root / "idx")
    assert main(["build", "--corpus", str(src), "--index", idx, "--plain", "--shards", "2", "--stemmer", "none"]) == 0
    return root, str(src), str(qfile)


def test_cli_build_and_query(cli_env, capsys):
    root, src, qfile = cli_env
    idx = str(root / "idx")
    out = str(root / "run.trec")
    assert main(["query", "--index", idx, "--queries", qfile, "--model", "RankedBoolean", "--out", out]) == 0
    lines = open(out).read().splitlines()
    assert any(l.startswith("1 Q0 doc") for l in lines)
    assert any(l.startswith("2 Q0 doc") for l in lines)
    # qid 2: only doc1 has "banana cherry" adjacent
    r2 = [l for l in lines if l.startswith("2 ")]
    assert len(r2) == 1 and "doc0000000001" in r2[0]


def test_cli_kstem_index_and_query(cli_env):
    """End-to-end with the reference's shipped stemmer (KSTEM,
    QryEval.java:61-65): 'apples'/'apple' must co-match under kstem."""
    root, src, qfile = cli_env
    src2 = root / "docs_kstem.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "apples and bananas",
                    "the apple was red",
                    "cherry flies running",
                ],
            }
        ),
        src2,
    )
    idx = str(root / "idx_kstem")
    assert main(["build", "--corpus", str(src2), "--index", idx, "--plain",
                 "--shards", "2", "--stemmer", "kstem"]) == 0
    q2 = root / "q_kstem.txt"
    q2.write_text("1: apple\n2: fly\n")
    out = str(root / "run_kstem.trec")
    assert main(["query", "--index", idx, "--queries", str(q2), "--model",
                 "UnrankedBoolean", "--out", out]) == 0
    lines = open(out).read().splitlines()
    r1 = [l for l in lines if l.startswith("1 ")]
    assert len(r1) == 2  # doc0 ('apples') AND doc1 ('apple') both match
    r2 = [l for l in lines if l.startswith("2 ")]
    assert len(r2) == 1 and "doc0000000002" in r2[0]  # 'flies' → fly


def test_cli_param_file_fb(cli_env):
    root, src, qfile = cli_env
    idx = str(root / "idx")
    pfile = root / "p.txt"
    exp = root / "exp.txt"
    pfile.write_text(
        "retrievalAlgorithm=Indri\nfb=true\nfbDocs=2\nfbTerms=3\nfbMu=0\n"
        f"fbExpansionQueryFile={exp}\n"
    )
    out = str(root / "run_fb.trec")
    assert main(["query", "--index", idx, "--queries", qfile, "--param-file", str(pfile), "--out", out]) == 0
    assert open(out).read().strip()
    assert open(exp).read().startswith("1: #wand(")


def test_read_query_file(tmp_path):
    p = tmp_path / "q.txt"
    p.write_text("5: a b\n\nbadline\n7: #AND(x y)\n")
    assert read_query_file(str(p)) == [("5", "a b"), ("7", "#AND(x y)")]


def test_cli_fb_initial_ranking_file(cli_env):
    """fbInitialRankingFile path: expansion seeded from a TREC file instead
    of running the query (QryExpansion.java:240-286)."""
    root, src, qfile = cli_env
    idx = str(root / "idx")
    # hand-written initial ranking: q1 top docs = doc2, doc0
    init = root / "init.trec"
    init.write_text(
        "1 Q0 doc0000000002 1 0.9 X\n1 Q0 doc0000000000 2 0.5 X\n"
        "2 Q0 doc0000000001 1 0.8 X\n"
    )
    pfile = root / "p2.txt"
    exp = root / "exp2.txt"
    pfile.write_text(
        "retrievalAlgorithm=Indri\nfb=true\nfbDocs=2\nfbTerms=3\nfbMu=0\n"
        f"fbInitialRankingFile={init}\nfbExpansionQueryFile={exp}\n"
    )
    out = str(root / "run_init.trec")
    assert main(["query", "--index", idx, "--queries", qfile, "--param-file", str(pfile), "--out", out]) == 0
    # expansion terms must come from doc2 ("apple cherry") + doc0 vocab
    line1 = [l for l in open(exp).read().splitlines() if l.startswith("1:")][0]
    assert "apple" in line1 and ("cherry" in line1 or "banana" in line1)


def test_cli_letor(cli_env):
    root, src, qfile = cli_env
    idx = str(root / "idx")
    # LeToR takes PLAIN bag-of-words queries (the reference's training sets
    # are plain; structured ops would make garbage .field/SDM rewrites)
    tq = root / "train_q.txt"
    tq.write_text("1: apple banana\n")
    qrels = root / "qrels.txt"
    qrels.write_text(
        "1 0 doc0000000000 2\n1 0 doc0000000002 1\n1 0 doc0000000003 0\n"
    )
    out = str(root / "run_letor.trec")
    assert main([
        "letor", "--index", idx, "--train-queries", str(tq), "--qrels", str(qrels),
        "--queries", str(tq), "--out", out,
    ]) == 0
    lines = open(out).read().splitlines()
    assert any(l.startswith("1 Q0 doc") for l in lines)
    ranks = [int(l.split()[3]) for l in lines if l.startswith("1 ")]
    assert ranks == sorted(ranks)


def test_structured_query_in_letor_does_not_crash_batch(cli_env):
    """A garbage SDM/.field rewrite from a structured training query must
    not kill the distributed batch — per-query isolation in the actors."""
    root, src, qfile = cli_env
    idx = str(root / "idx")
    qrels = root / "qrels2.txt"
    qrels.write_text("2 0 doc0000000001 1\n")
    out = str(root / "run_letor2.trec")
    assert main([
        "letor", "--index", idx, "--train-queries", qfile, "--qrels", str(qrels),
        "--queries", qfile, "--out", out,
    ]) == 0


def test_cli_sweep(cli_env, capsys):
    """The hw4test.py workflow as a CLI: grid of (k1, b) BM25 runs over one
    index, metric table best-first."""
    import json

    root, src, qfile = cli_env
    idx = str(root / "idx")
    qrels = root / "sweep_qrels.txt"
    qrels.write_text(
        "1 0 doc0000000000 1\n1 0 doc0000000002 1\n2 0 doc0000000001 1\n"
    )
    assert main([
        "sweep", "--index", idx, "--queries", str(qfile), "--qrels", str(qrels),
        "--k1", "1.2,2.0", "--b", "0.75,0.0",
    ]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 4
    assert {"k1", "b", "map"} <= set(rows[0])
    maps = [r["map"] for r in rows]
    assert maps == sorted(maps, reverse=True)  # best-first
    assert all(0.0 <= r["map"] <= 1.0 for r in rows)
