"""IVF ANN: recall vs the brute-force baseline; junk-url/domain ops."""

from pyspark.sql import functions as F

from modern_search_engines_spark import corpus
from modern_search_engines_spark.operators import indexing, similarity


def test_ivf_recall_vs_brute_force(spark, sf_dirs):
    emb = spark.read.parquet(f"{sf_dirs['t2']}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in
             similarity.brute_force_topk(emb, qvec, k=10).collect()]
    assigned, centroids = similarity.train_ivf(emb, n_lists=8)
    approx = [r["vec_id"] for r in
              similarity.ivf_topk(assigned, centroids, qvec,
                                  k=10, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)
    # full probe ⇒ exact
    full = [r["vec_id"] for r in
            similarity.ivf_topk(assigned, centroids, qvec,
                                k=10, n_probe=8).collect()]
    assert full == exact


def test_ivf_deterministic(spark, sf_dirs):
    emb = spark.read.parquet(f"{sf_dirs['t1']}/embeddings.parquet")
    _, c1 = similarity.train_ivf(emb, n_lists=4)
    _, c2 = similarity.train_ivf(emb, n_lists=4)
    assert c1 == c2


def test_filter_junk_urls(spark):
    df = spark.createDataFrame(
        [("https://a.example/x",),
         ("https://a.example/javascript:linkTo_UnCryptMailto('x')",),
         ("tel:+4970712972",)], "url string")
    kept = [r["url"] for r in indexing.filter_junk_urls(df).collect()]
    assert kept == ["https://a.example/x"]


def test_domain_stats_rollup(spark):
    pages = corpus.pages_df(spark, 60, seed=3, num_partitions=2)
    ext = indexing.extract_pages(pages, ngram_max=1)
    rows = {r["domain"]: r["n_pages"]
            for r in indexing.domain_stats(ext, 0.05).collect()}
    assert sum(rows.values()) == 60
    assert all(not d.startswith("www.") for d in rows)
    # high threshold folds everything into 'other'
    allother = indexing.domain_stats(ext, 1.1).collect()
    assert [r["domain"] for r in allother] == ["other"]
