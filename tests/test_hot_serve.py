"""Hot (no-Spark-job) serving path: rank- and score-identical to both
the distributed WAND path and the single-node oracle, at driver-side
latency (no per-query Spark job)."""

import time

import pytest

from modern_search_engines_spark import corpus
from modern_search_engines_spark.operators import wand
from modern_search_engines_spark.oracle import OracleEngine
from modern_search_engines_spark.oracle.engine import doc_from_page
from modern_search_engines_spark.plans.build import build_persistent_index
from modern_search_engines_spark.plans.hot import HotSearcher

N, SEED = 60, 17

QUERIES = ["castle museum", "university research lecture",
           "food restaurant river", "tübingen", "quiet park view"]


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hot") / "idx")
    pages = corpus.pages_df(spark, N, seed=SEED,
                            num_partitions=2).drop("text", "lang")
    build_persistent_index(spark, pages, out, n_shards=2, verbose=False)
    return out


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine()
    eng.build([doc_from_page(p["url"], p["html"].decode())
               for p in corpus.generate_pages(N, seed=SEED)])
    return eng


def test_hot_matches_oracle_and_spark(spark, index_dir, oracle):
    hot = HotSearcher(index_dir)
    from modern_search_engines_spark.plans.build import load_index
    idx = load_index(spark, index_dir)
    for q in QUERIES:
        got = hot.search(q, top_k=10)
        expected = oracle.retrieve(q, 10)
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, rel=1e-9)
        spark_res = wand.run_wand(
            spark, [("q", q)], idx["postings_compressed"],
            idx["doc_dim"], k=10).collect()
        assert [r["doc_id"] for r in spark_res] == [d for d, _ in got], q


def test_hot_latency_is_driver_side(index_dir):
    hot = HotSearcher(index_dir)
    hot.search(QUERIES[0], top_k=10)  # warm the bucket cache + doc map
    t0 = time.time()
    for q in QUERIES * 4:
        hot.search(q, top_k=10)
    per_query = (time.time() - t0) / (len(QUERIES) * 4)
    # generous bound: no Spark job floor (~0.8 s) anywhere in the path
    assert per_query < 0.1, per_query


def test_hot_absent_terms(index_dir):
    hot = HotSearcher(index_dir)
    assert hot.search("zzqqxx absent", top_k=5) == []


def test_hot_doc_id_lookup_is_rowgroup_pruned(index_dir, tmp_path):
    """The doc_idx→doc_id resolution must NEVER materialize the docs
    table: with a doc_id-sorted docs file split into many row groups,
    a top-k search reads only the stat-matching groups and O(k) rows."""
    import glob
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    idx2 = str(tmp_path / "idx2")
    shutil.copytree(index_dir, idx2)
    docs_dir = f"{idx2}/docs"
    table = pq.read_table(docs_dir)
    table = table.sort_by("doc_id")
    for f in glob.glob(f"{docs_dir}/*.parquet"):
        import os
        os.remove(f)
    pq.write_table(table, f"{docs_dir}/part-rewrite.parquet",
                   row_group_size=4)

    hot = HotSearcher(idx2)
    got = hot.search(QUERIES[0], top_k=5)
    baseline = HotSearcher(index_dir).search(QUERIES[0], top_k=5)
    assert got == baseline
    n_docs = table.num_rows
    assert hot.docs_rowgroups_total >= n_docs // 4
    # ≤ k groups actually read (one per result id, often fewer),
    # never the whole table
    assert 0 < hot.docs_rowgroups_read <= 5
    assert hot.docs_rows_read <= 5 * 4
    # repeat query: served from the resolved-id cache, zero new reads
    before = hot.docs_rowgroups_read
    assert hot.search(QUERIES[0], top_k=5) == got
    assert hot.docs_rowgroups_read == before
