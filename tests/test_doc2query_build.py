"""doc2query wired into the index build (DocumentIndex.py:47-66,
Doc2Query.py:11-21):

* expanded terms actually appear in build_tf output (the hook extends
  doc_unigrams, the column build_tf consumes — not just single_tokens);
* Spark tf with use_doc2query=True matches the single-node oracle built
  with the same flag, term-for-term (including cross-boundary n-grams
  from the reference's re-tokenization of ' '.join(single_tokens));
* avgdl is unchanged by expansion (reference computes averages first);
* toggling use_doc2query on resume forces a tf rebuild (stage params).
"""

import pytest

from modern_search_engines_spark import corpus
from modern_search_engines_spark.operators import indexing, mlhooks
from modern_search_engines_spark.oracle import OracleEngine
from modern_search_engines_spark.oracle.engine import doc_from_page
from modern_search_engines_spark.plans.build import build_persistent_index
from modern_search_engines_spark.sources import tables as tbl

N_PAGES, SEED = 40, 7


@pytest.fixture(scope="module")
def pages(spark):
    return corpus.pages_df(spark, N_PAGES, seed=SEED,
                           num_partitions=2).drop("text", "lang")


def _oracle(use_doc2query: bool) -> OracleEngine:
    raw = corpus.generate_pages(N_PAGES, seed=SEED)
    docs = [doc_from_page(p["url"], p["html"].decode("utf-8"))
            for p in raw if p["html"][:4] != b"%PDF"
            and len(p["html"]) <= indexing.MAX_HTML_CHARS]
    eng = OracleEngine()
    eng.build(docs, use_doc2query=use_doc2query)
    return eng


def _tf_map(tf_df):
    return {(r["doc_id"], r["term"]): r["tf"] for r in tf_df.collect()}


def test_expansion_reaches_tf_and_matches_oracle(spark, pages, tmp_path):
    plain = build_persistent_index(spark, pages, str(tmp_path / "plain"),
                                   verbose=False)
    expanded = build_persistent_index(spark, pages, str(tmp_path / "exp"),
                                      use_doc2query=True, verbose=False)

    tf_plain = _tf_map(plain["tf"])
    tf_exp = _tf_map(expanded["tf"])

    # expansions flow into tf: strictly more mass, and at least one
    # (doc, term) gains count (the fake generator emits the doc's most
    # frequent non-stopword tokens, which the doc already contains)
    assert sum(tf_exp.values()) > sum(tf_plain.values())
    assert any(tf_exp[k] > tf_plain.get(k, 0) for k in tf_exp)

    # term-for-term parity with the oracle built the same way
    oracle = _oracle(use_doc2query=True)
    oracle_tf = {(d, t): c for d, terms in oracle.tf.items()
                 for t, c in terms.items()}
    assert tf_exp == oracle_tf

    # averages precede expansion: avgdl identical across the two builds
    assert plain["stats"]["avgdl"] == expanded["stats"]["avgdl"]
    assert oracle.avg_doc_length == pytest.approx(
        expanded["stats"]["avgdl"])


def test_toggling_doc2query_rebuilds_tf(spark, pages, tmp_path):
    out = str(tmp_path / "idx")
    build_persistent_index(spark, pages, out, verbose=False)
    sw = tbl.StageWriter(spark, out, verbose=False)
    pre_tf = sw.manifest("tf")["commit_id"]
    pre_ext = sw.manifest("extracted")["commit_id"]

    build_persistent_index(spark, pages, out, use_doc2query=True,
                           verbose=False)
    sw = tbl.StageWriter(spark, out, verbose=False)
    assert sw.manifest("tf")["commit_id"] != pre_tf  # params mismatch
    assert sw.manifest("extracted")["commit_id"] == pre_ext  # untouched


def test_standalone_expand_defaults_documented(spark):
    """doc2query_expand (standalone) touches only its tokens column —
    the build-integrated expand_for_index also extends doc_unigrams."""
    df = spark.createDataFrame(
        [("d1", "castle tour castle garden visit", ["castle", "tour"],
          ["castle", "tour"])],
        "doc_id string, text string, single_tokens array<string>, "
        "doc_unigrams array<string>")
    alone = mlhooks.doc2query_expand(df).collect()[0]
    both = mlhooks.expand_for_index(df, ngram_max=2).collect()[0]
    assert alone["doc_unigrams"] == ["castle", "tour"]  # untouched
    assert len(both["doc_unigrams"]) > 2                # extended
    assert len(both["single_tokens"]) > len(alone["single_tokens"]) or \
        len(both["single_tokens"]) > 2
