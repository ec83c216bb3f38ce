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
    return root, str(src), str(qfile)


def test_cli_build_and_query(cli_env, capsys):
    root, src, qfile = cli_env
    idx = str(root / "idx")
    out = str(root / "run.trec")
    assert main(["build", "--corpus", src, "--index", idx, "--plain", "--shards", "2", "--stemmer", "none"]) == 0
    assert main(["query", "--index", idx, "--queries", qfile, "--model", "RankedBoolean", "--out", out]) == 0
    lines = open(out).read().splitlines()
    assert any(l.startswith("1 Q0 doc") for l in lines)
    assert any(l.startswith("2 Q0 doc") for l in lines)
    # qid 2: only doc1 has "banana cherry" adjacent
    r2 = [l for l in lines if l.startswith("2 ")]
    assert len(r2) == 1 and "doc0000000001" in r2[0]


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
