"""End-to-end spark-submit run of jobs/make_training_mix.py plus
in-process determinism checks of its stage composition."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_spark_submit_training_mix(tmp_path, spark):
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

    docs_path = str(tmp_path / "docs")
    (spark.range(0, 400)
     .select(F.col("id").alias("doc_id"),
             F.concat(F.lit("s"), (F.col("id") % 4).cast("string"))
             .alias("source"),
             F.concat_ws(" ", F.transform(
                 F.sequence(F.lit(1), (F.col("id") % 13) + 3),
                 lambda i: F.concat(F.lit("w"), i.cast("string"))))
             .alias("text"))
     .write.mode("overwrite").parquet(docs_path))

    out = str(tmp_path / "mix")
    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "2g",
           "SPARK_GRAFT_CPUS": "4"}
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", pyz,
         os.path.join(repo, "jobs", "make_training_mix.py"),
         "--docs", docs_path, "--out", out, "--seq-len", "32",
         "--rates", "s0=1.0,s1=0.5,s2=0.5", "--per-source-cap", "60",
         "--holdout-rate", "0.1", "--salt", "t1"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_input_docs"] == 400
    # s3 excluded by default rate 0; s0 kept whole at 100 docs > cap? no,
    # 100 docs per source, s0 rate 1.0 -> 100, capped to 60
    assert 0 < summary["n_mix_docs"] <= 220
    assert 0 < summary["n_holdout_docs"] < summary["n_mix_docs"]
    assert summary["n_sequences"] > 0
    for stage in ("mix", "holdout", "packed"):
        assert os.path.exists(os.path.join(out, stage, "_MANIFEST.json"))

    # determinism: the packed manifest is a pure function of
    # (corpus, salt, rates) — re-running into a fresh dir reproduces it
    out2 = str(tmp_path / "mix2")
    r2 = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", pyz,
         os.path.join(repo, "jobs", "make_training_mix.py"),
         "--docs", docs_path, "--out", out2, "--seq-len", "32",
         "--rates", "s0=1.0,s1=0.5,s2=0.5", "--per-source-cap", "60",
         "--holdout-rate", "0.1", "--salt", "t1"],
        capture_output=True, text=True, timeout=420, env=env)
    assert r2.returncode == 0, r2.stderr[-3000:]
    a = sorted(map(tuple, spark.read.parquet(out + "/packed").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2 + "/packed").collect()))
    assert a == b and len(a) > 0

    # holdout is hash-disjoint from train by construction
    mix = spark.read.parquet(out + "/mix")
    hold = spark.read.parquet(out + "/holdout")
    packed_docs = spark.read.parquet(out + "/packed") \
        .select("doc_id").distinct()
    assert packed_docs.join(hold, "doc_id").count() == 0
    assert hold.join(mix, "doc_id").count() == hold.count()
