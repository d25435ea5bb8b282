"""jobs/evaluate_run.py end-to-end: run TSV + qrels TSV → metrics JSON,
with the per-query numbers matching the driver-side metric functions
(which replicate the reference's EvaluatePage quirks exactly)."""

import json
import os
import subprocess
import sys

from modern_search_engines_spark.operators import evaluate

RUN = [
    ("q1", 1, "https://a.example/1", 2.0),
    ("q1", 2, "https://a.example/2", 1.5),
    ("q1", 3, "https://a.example/3", 1.0),
    ("q2", 1, "https://b.example/1", 3.0),
    ("q2", 2, "https://b.example/2", 2.0),
]
QRELS = [
    ("q1", "https://a.example/2", 1),
    ("q1", "https://a.example/3", 1),
    ("q1", "https://a.example/9", 1),   # unreturned gt — hits MAP/IDCG
    ("q1", "https://a.example/1", -1),
    ("q2", "https://b.example/1", 1),
]


def test_evaluate_job_matches_reference_quirks(tmp_path):
    run_path = str(tmp_path / "run.tsv")
    qrels_path = str(tmp_path / "qrels.tsv")
    with open(run_path, "w") as f:
        for row in RUN:
            f.write("\t".join(str(x) for x in row) + "\n")
    with open(qrels_path, "w") as f:
        for row in QRELS:
            f.write("\t".join(str(x) for x in row) + "\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)  # spark-submit --py-files twin
    proc = subprocess.run(
        [sys.executable, "jobs/evaluate_run.py", "--run", run_path,
         "--qrels", qrels_path, "--model", "m1"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])

    # driver-side expected values via the spec functions
    gt_q1 = [u for q, u, r in QRELS if q == "q1" and r == 1]
    ranked_q1 = [u for q, _, u, _ in RUN if q == "q1"]
    exp = {
        "mrr": evaluate.mrr(ranked_q1, gt_q1),
        "ndcg": evaluate.ndcg(ranked_q1, gt_q1),
        "map": evaluate.average_precision(ranked_q1, gt_q1),
    }
    got = out["per_query"]["q1"]
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)
    assert out["per_query"]["q2"]["mrr"] == 1.0
    assert out["summary"][0]["model"] == "m1"
    # the quirks bite: |gt|=3 in denominators though only 2 were returned
    assert exp["map"] == (1 / 2 + 2 / 3) / 3
