"""jobs/train_tokenizer.py: end-to-end in a subprocess (own Spark
session: word-count stage → local merge loop → merges.json →
token-count stage), rerun determinism via stage resume, and count
consistency with the library encoder."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from modern_search_engines_spark.functions import bpe

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_docs(spark, path):
    (spark.range(0, 120)
     .select(F.col("id").alias("doc_id"),
             F.concat_ws(" ", F.transform(
                 F.sequence(F.lit(1), (F.col("id") % 7) + 2),
                 lambda i: F.concat(F.lit("word"),
                                    (i % 5).cast("string"))))
             .alias("text"))
     .write.mode("overwrite").parquet(path))


def _run(docs, out):
    env = {**os.environ, "PYTHONPATH": REPO,
           "SPARK_GRAFT_CPUS": "4"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "train_tokenizer.py"),
         "--docs", docs, "--out", out, "--n-merges", "12",
         "--count-tokens"],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_train_tokenizer_job_end_to_end(spark, tmp_path):
    docs = str(tmp_path / "docs")
    out = str(tmp_path / "tok")
    _write_docs(spark, docs)

    res = _run(docs, out)
    assert res["n_merges"] == 12
    assert res["word_mass_covered"] == res["word_mass_total"]

    blob = json.load(open(os.path.join(out, "merges.json")))
    merges = [tuple(m) for m in blob["merges"]]
    assert len(merges) == 12

    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in
              spark.read.parquet(os.path.join(out, "token_counts"))
              .collect()}
    # spot-check against the library encoder in THIS session
    lib = {r["doc_id"]: r["n_bpe_tokens"] for r in
           bpe.bpe_token_count(spark.read.parquet(docs), merges)
           .collect()}
    assert counts == lib
    assert res["total_bpe_tokens"] == sum(counts.values())

    # rerun resumes the committed stages and reproduces merges.json
    res2 = _run(docs, out)
    assert res2["total_bpe_tokens"] == res["total_bpe_tokens"]
    blob2 = json.load(open(os.path.join(out, "merges.json")))
    assert blob2["merges"] == blob["merges"]
