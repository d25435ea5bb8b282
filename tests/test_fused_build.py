"""materialize_bm25=False fuses the flat-postings stage into the
compressed one (plans/build.py): the compressed index must be IDENTICAL
to an unfused build's, the flat table must not exist on disk, and
load_index must rebuild the SAME lazy scoring plan from tf so the
naive-bm25 query path works on a fused index."""

import os

import pytest

from modern_search_engines_spark import corpus
from modern_search_engines_spark.plans.build import (
    build_persistent_index, load_index,
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pages = corpus.pages_df(spark, 400, seed=42, num_partitions=8)
    pages.cache().count()
    outs = {}
    for tag, mat in (("unfused", True), ("fused", False)):
        out = str(tmp_path_factory.mktemp(tag))
        build_persistent_index(spark, pages, out, verbose=False,
                               materialize_bm25=mat)
        outs[tag] = out
    pages.unpersist()
    return outs


def test_compressed_postings_identical(spark, built):
    a = spark.read.parquet(
        os.path.join(built["unfused"], "postings_compressed"))
    b = spark.read.parquet(
        os.path.join(built["fused"], "postings_compressed"))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_fused_build_skips_flat_table(built):
    assert os.path.exists(
        os.path.join(built["unfused"], "bm25_postings"))
    assert not os.path.exists(
        os.path.join(built["fused"], "bm25_postings"))


def test_load_index_rebuilds_lazy_bm25_plan(spark, built):
    idx = load_index(spark, built["fused"])
    # fused indexes get the flat partials as a lazy plan recomputed from
    # tf — bit-identical to the unfused build's materialized table (the
    # fused compressed stage consumed this exact plan; every scalar in
    # it is deterministic, no order-dependent float aggregation)
    flat = load_index(spark, built["unfused"])["bm25_postings"]
    lazy = idx["bm25_postings"].select(*flat.columns)
    assert flat.exceptAll(lazy).count() == 0
    assert lazy.exceptAll(flat).count() == 0
    assert idx["postings_compressed"].count() > 0
    # fused resume: a re-run must skip every committed stage
    pages = corpus.pages_df(spark, 400, seed=42, num_partitions=8)
    build_persistent_index(spark, pages, built["fused"], verbose=False,
                           materialize_bm25=False)
