"""End-to-end spark-submit --py-files run of the job entry points
(north rule: "runs via spark-submit --py-files"). Builds a tiny index
and runs a TSV query batch through the WAND path, in subprocesses."""

import csv
import os
import shutil
import subprocess
import sys
import zipfile

import pytest


@pytest.mark.slow
def test_spark_submit_build_and_query(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pyz = str(tmp_path / "mse.zip")
    with zipfile.ZipFile(pyz, "w") as z:
        pkg = os.path.join(repo, "modern_search_engines_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))

    idx = str(tmp_path / "idx")
    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g",
           "SPARK_GRAFT_CPUS": "4"}
    base = [spark_submit, "--master", "local[4]", "--py-files", pyz]

    r = subprocess.run(
        base + [os.path.join(repo, "jobs", "build_index.py"),
                "--synthetic", "40", "--out", idx, "--positional",
                "--anchor"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(idx, "postings_compressed"))
    # --positional commits the phrase-query layer as its own stage
    pos = os.path.join(idx, "positional_postings")
    assert os.path.exists(pos)
    assert any(d.startswith("bucket=") for d in os.listdir(pos))
    # --anchor commits the anchor-text field + norms stages
    assert os.path.exists(os.path.join(idx, "anchor_field"))
    assert os.path.exists(os.path.join(idx, "field_norms"))

    qf = str(tmp_path / "queries.tsv")
    with open(qf, "w") as f:
        f.write("q1\tcastle museum\nq2\ttravel guide\n")
    out = str(tmp_path / "run")
    r = subprocess.run(
        base + [os.path.join(repo, "jobs", "run_queries.py"),
                "--index", idx, "--queries", qf, "--out", out,
                "--k", "10", "--method", "wand"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]

    def read_run(path):
        rows = []
        for name in sorted(os.listdir(path)):
            if name.startswith("part-"):
                with open(os.path.join(path, name)) as f:
                    rows += list(csv.reader(f, delimiter="\t"))
        return rows

    rows = read_run(out)
    assert rows, "empty run file"
    qids = {r[0] for r in rows}
    assert qids <= {"q1", "q2"}
    for qid, rank, url, score in rows:
        assert rank.isdigit() and url.startswith("http")
        float(score)

    # reranked run (batch_retrieve.py:33: diversity 0.1) — same doc sets
    # per query, ranks renumbered 1..n contiguously
    out2 = str(tmp_path / "run_rr")
    r = subprocess.run(
        base + [os.path.join(repo, "jobs", "run_queries.py"),
                "--index", idx, "--queries", qf, "--out", out2,
                "--k", "10", "--method", "wand",
                "--rerank-diversity", "0.1"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    rr_rows = read_run(out2)
    plain_by_q, rr_by_q = {}, {}
    for q, rank, url, score in rows:
        plain_by_q.setdefault(q, set()).add(url)
    for q, rank, url, score in rr_rows:
        rr_by_q.setdefault(q, set()).add(url)
    assert rr_by_q == plain_by_q
    for q in rr_by_q:
        ranks = sorted(int(r[1]) for r in rr_rows if r[0] == q)
        assert ranks == list(range(1, len(ranks) + 1))

    # batch phrase retrieval over the positional layer (the index above
    # was built with --positional): integer-valued occurrence scores,
    # contiguous ranks
    qf2 = str(tmp_path / "phrases.tsv")
    with open(qf2, "w") as f:
        f.write("p1\tcastle museum\np2\tuniversity research\n")
    out3 = str(tmp_path / "run_phrase")
    r = subprocess.run(
        base + [os.path.join(repo, "jobs", "run_queries.py"),
                "--index", idx, "--queries", qf2, "--out", out3,
                "--k", "5", "--method", "phrase"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    ph_rows = read_run(out3)
    assert ph_rows, "empty phrase run file"
    for qid, rank, url, score in ph_rows:
        assert qid in {"p1", "p2"} and rank.isdigit()
        assert float(score) == int(float(score)) >= 1

    # BM25F over the anchor field (the index above was built with
    # --anchor): contiguous ranks, parseable scores. Semantic parity
    # vs a pure-python twin is covered in tests/test_anchor_build.py —
    # this drives the job surface end-to-end
    out4 = str(tmp_path / "run_bm25f")
    r = subprocess.run(
        base + [os.path.join(repo, "jobs", "run_queries.py"),
                "--index", idx, "--queries", qf, "--out", out4,
                "--k", "10", "--method", "bm25f"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    bf_rows = read_run(out4)
    assert bf_rows, "empty bm25f run file"
    for qid, rank, url, score in bf_rows:
        assert qid in {"q1", "q2"} and rank.isdigit()
        float(score)
    for q in {r[0] for r in bf_rows}:
        ranks = sorted(int(r[1]) for r in bf_rows if r[0] == q)
        assert ranks == list(range(1, len(ranks) + 1))
