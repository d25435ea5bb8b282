"""Corpus-cleaning pipeline semantics (plans/clean.py): status
precedence on planted duplicates/junk, greedy near-dup survivor rule,
staged resume, and the spark-submit job's JSON contract."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import Row

from modern_search_engines_spark.plans.clean import (
    classify_docs, clean_corpus, verified_near_dup_pairs,
)

BASE = ("the castle and the museum of the old town in the river valley "
        "is a place to see and to visit in every season of the year")


def _docs(spark):
    rows = [
        Row(doc_id=1, text=BASE),                       # kept (canonical)
        Row(doc_id=2, text=BASE),                       # exact_dup of 1
        Row(doc_id=3, text=BASE + " with a new tower"),  # near_dup of 1
        Row(doc_id=4, text="der die das und ist mit von der die das und "
                           "ist mit von " + "wort " * 30),  # wrong_lang
        Row(doc_id=5, text="tiny the doc"),             # too_short
        Row(doc_id=6, text="the spam and the spam " * 20),  # repetitive
        Row(doc_id=7, text="a completely different story about the sea "
                           "and the ships that is long enough to pass "
                           "every the quality gate with room to spare "
                           "because it keeps the going on and on in the "
                           "calm water of the wide open bay"),  # kept
    ]
    return spark.createDataFrame(rows)


PARAMS = dict(langs=("en",), min_tokens=10, max_rep_ratio=0.3,
              jaccard_threshold=0.5, n_minhash=8, n_bands=4)


def test_status_precedence(spark):
    st = {r["doc_id"]: r["status"]
          for r in classify_docs(_docs(spark), **PARAMS).collect()}
    assert st == {1: "kept", 2: "exact_dup", 3: "near_dup",
                  4: "wrong_lang", 5: "too_short", 6: "repetitive",
                  7: "kept"}


def test_near_dup_keeps_lowest_id(spark):
    pairs = verified_near_dup_pairs(
        _docs(spark).where("doc_id in (1, 3)"), jaccard_threshold=0.5)
    rows = pairs.collect()
    assert len(rows) == 1
    assert (rows[0]["doc_a"], rows[0]["doc_b"]) == (1, 3)
    assert 0.5 <= rows[0]["jaccard"] <= 1.0


def test_exact_dup_not_counted_as_near_dup(spark):
    # doc 2 is an exact dup — it must be dropped by the md5 gate and
    # excluded from the near-dup join (only survivors are paired)
    st = classify_docs(_docs(spark), **PARAMS)
    assert st.where("doc_id = 2").collect()[0]["status"] == "exact_dup"


def test_staged_clean_and_resume(spark, tmp_path):
    out = str(tmp_path / "clean")
    res = clean_corpus(spark, _docs(spark), out, verbose=False, **PARAMS)
    assert res["summary"] == {"kept": 2, "exact_dup": 1, "near_dup": 1,
                              "wrong_lang": 1, "too_short": 1,
                              "repetitive": 1}
    kept = {r["doc_id"] for r in res["clean"].collect()}
    assert kept == {1, 7}
    for stage in ("doc_stats", "doc_status", "clean"):
        assert os.path.exists(os.path.join(out, stage, "_MANIFEST.json"))
    # resume: a second run must skip every complete stage
    res2 = clean_corpus(spark, _docs(spark), out, verbose=False, **PARAMS)
    assert res2["summary"] == res["summary"]
    # param change forces a rebuild of the status stage
    res3 = clean_corpus(spark, _docs(spark), out, verbose=False,
                        langs=("en",), min_tokens=1000,
                        max_rep_ratio=0.3, jaccard_threshold=0.5)
    assert res3["summary"].get("kept") is None  # everything too_short


def test_hot_shingle_cap_bounds_candidates(spark):
    # a universal shingle must not explode the candidate join when capped
    rows = [Row(doc_id=i,
                text="the common shared boilerplate line " +
                     f"unique {i} words of body content here {i}")
            for i in range(1, 21)]
    docs = spark.createDataFrame(rows)
    capped = verified_near_dup_pairs(docs, jaccard_threshold=0.0,
                                     max_shingle_df=3)
    assert capped.count() <= 20  # without the cap: ~190 all-pairs


@pytest.mark.slow
def test_clean_job_cli(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    _docs(spark).write.parquet(docs_path)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "jobs/clean_corpus.py", "--docs", docs_path,
         "--out", out, "--min-tokens", "10", "--max-rep-ratio", "0.3",
         "--jaccard-threshold", "0.5"],
        capture_output=True, text=True, timeout=300, cwd=repo,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4", "PYTHONPATH": repo})
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out_json = json.loads(line)
    assert out_json["summary"]["kept"] == 2
    assert {m["name"] for m in out_json["stages"]} == {
        "doc_stats", "doc_status", "clean"}


def test_curated_stage(spark, tmp_path):
    """The optional curation stage: decontam drops an eval-overlapping
    doc, line dedup strips the repeated line, PII is scrubbed, and the
    stage is an atomic resumable commit like the others."""
    from pyspark.sql import functions as F
    rows = [
        Row(doc_id=1, text=BASE),
        Row(doc_id=7, text="a completely different story about the sea "
                           "and the ships that is long enough to pass "
                           "every the quality gate with room to spare "
                           "because it keeps the going on and on in the "
                           "calm water of the wide open bay"),
        Row(doc_id=9, text="an original essay on mountains and snow "
                           "that mentions nothing else of note but is "
                           "long enough to be kept around here with "
                           "contact me at someone@mail.example.org "
                           "for more details on the mountain passes"),
    ]
    docs = spark.createDataFrame(rows).withColumn(
        "source", F.lit("srcX"))
    # eval set overlaps doc 7's opening 8 tokens
    ev = spark.createDataFrame(
        [Row(text="a completely different story about the sea and")])
    out = str(tmp_path / "curated")
    res = clean_corpus(spark, docs, out, verbose=False,
                       evalset=ev, decontam_n=6, scrub_pii=True,
                       **PARAMS)
    cur = {r["doc_id"]: r["text"] for r in res["curated"].collect()}
    assert 7 not in cur                      # decontaminated
    assert 1 in cur and 9 in cur
    assert "<EMAIL>" in cur[9]               # scrubbed
    assert "someone@" not in cur[9]
    assert res["summary"]["curated"] == 2
    assert os.path.exists(os.path.join(out, "curated", "_MANIFEST.json"))


def test_curated_line_dedup_and_cap(spark, tmp_path):
    from pyspark.sql import functions as F
    from modern_search_engines_spark.plans.clean import curate_docs
    docs = spark.createDataFrame([
        Row(doc_id=1, source="a",
            text="unique first line\ncookie banner text here"),
        Row(doc_id=2, source="a",
            text="cookie banner text here\nreal content of doc two"),
        Row(doc_id=3, source="a",
            text="cookie banner text here"),   # all-boilerplate → dropped
        Row(doc_id=4, source="b", text="solo content"),
    ])
    out = curate_docs(docs, drop_dup_lines=True, per_source_cap=1)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 3 not in got                       # every line was a dup
    assert got[4] == "solo content"
    remaining_a = [d for d in got if d in (1, 2)]
    assert len(remaining_a) == 1              # capped to 1 per source
    assert "cookie banner" not in got[remaining_a[0]] or \
        remaining_a[0] == 1                   # only doc1 may keep banner


def test_curated_web_gates(spark):
    """Round-4 gates on curate_docs: canonical-URL dedup drops the
    refetched page, C4 line rules rewrite text / page rules drop, and
    the CCNet perplexity gate drops the tail bucket."""
    from modern_search_engines_spark.plans.clean import curate_docs
    good = "this line has plenty of words to keep around."
    docs = spark.createDataFrame([
        Row(doc_id=1, lang="en", url="http://example.com/a",
            text="\n".join([good] * 3) + "\nno punct line dropped"),
        Row(doc_id=2, lang="en", url="HTTP://EXAMPLE.com:80/a/",
            text="\n".join([good] * 3)),          # url dup of 1
        Row(doc_id=3, lang="en", url="http://example.com/b",
            text="\n".join([good] * 3) + "\nwe sell lorem ipsum here."),
        Row(doc_id=4, lang="en", url="http://example.com/c",
            text="\n".join([good] * 3)),
    ])
    out = curate_docs(docs, dedup_urls=True, c4_rules=True)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 4}                    # 2 url-dup, 3 lorem
    assert got[1] == "\n".join([good] * 3)       # junk line rewritten out
    assert got[4] == "\n".join([good] * 3)


def test_curated_ppl_gate(spark):
    from modern_search_engines_spark.plans.clean import curate_docs
    rows = ([Row(doc_id=i, lang="en", text="the cat sat on the mat")
             for i in range(8)]
            + [Row(doc_id=50, lang="en", text="the cat sat on the rug")]
            + [Row(doc_id=99, lang="en", text="mat the on sat cat the")])
    docs = spark.createDataFrame(rows)
    out = curate_docs(docs, ppl_keep=("head", "middle"))
    kept = {r["doc_id"] for r in out.collect()}
    assert 99 not in kept            # reversed word order = tail bucket
    assert set(range(8)) <= kept     # the common phrasing stays


def test_curated_ppl_gate_with_reference_train(spark):
    """ppl_train switches the LM to a reference corpus (CCNet's
    Wikipedia slot): docs phrased like the REFERENCE score head even
    when the corpus majority is phrased differently."""
    from modern_search_engines_spark.plans.clean import curate_docs
    ref = spark.createDataFrame(
        [Row(doc_id=i, text="the cat sat on the mat") for i in range(5)])
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text="mat the on sat cat the")
         for i in range(8)]
        + [Row(doc_id=50, lang="en", text="the cat sat on the mat")])
    out = curate_docs(docs, ppl_keep=("head",), ppl_train=ref)
    kept = {r["doc_id"] for r in out.collect()}
    assert 50 in kept        # reference-like doc is the head bucket
    # self-train would invert this: the majority phrasing wins instead
    out2 = curate_docs(docs, ppl_keep=("head",))
    kept2 = {r["doc_id"] for r in out2.collect()}
    assert 50 not in kept2


def test_curation_report_funnel(spark):
    from pyspark.sql import functions as F
    from modern_search_engines_spark.plans.clean import (
        classify_docs, curation_report)
    docs = _docs(spark).withColumn(
        "source", F.when(F.col("doc_id") <= 3, "a").otherwise("b"))
    rep = {(r["source"], r["status"]): (r["n_docs"], r["n_tokens"])
           for r in curation_report(
               classify_docs(docs, **PARAMS), docs).collect()}
    # docs 1/2/3 are source a: kept, exact_dup, near_dup; 4..7 are b
    assert rep[("a", "kept")][0] == 1
    assert rep[("a", "exact_dup")][0] == 1
    assert rep[("a", "near_dup")][0] == 1
    assert rep[("b", "kept")][0] == 1
    assert sum(n for n, _ in rep.values()) == 7     # every doc counted
    assert all(nt > 0 for _, nt in rep.values())
