"""Broadcast Bloom prefilter: no false negatives ever, false-positive
rate near target, and crossdedup output bit-identical with it on."""

import hashlib

import pytest
from pyspark.sql import functions as F

from modern_search_engines_spark.operators import bloom, crossdedup


def _md5s(spark, words):
    return spark.createDataFrame(
        [(hashlib.md5(w.encode()).hexdigest(),) for w in words],
        "text_md5 string")


def test_sizing_monotone_and_floored():
    assert bloom.bloom_size_bits(10, 0.01) == 1024  # floor
    big = bloom.bloom_size_bits(1_000_000, 0.01)
    assert big > bloom.bloom_size_bits(100_000, 0.01)
    assert big % 64 == 0
    with pytest.raises(ValueError):
        bloom.bloom_size_bits(10, 0.0)


def test_no_false_negatives_and_bounded_false_positives(spark):
    inserted = [f"key-{i}" for i in range(2000)]
    absent = [f"other-{i}" for i in range(2000)]
    bf = bloom.build_bloom(_md5s(spark, inserted), fpp=0.01)
    assert bf.n_keys == 2000
    assert bf.expected_fpp < 0.02

    hits_in = _md5s(spark, inserted).where(
        bloom.might_contain(bf, F.col("text_md5"))).count()
    assert hits_in == 2000  # NEVER a false negative

    hits_out = _md5s(spark, absent).where(
        bloom.might_contain(bf, F.col("text_md5"))).count()
    assert hits_out / 2000 < 0.05, hits_out  # ~fpp, generous margin


def test_dedup_against_identical_with_bloom_prefilter(spark):
    seen = spark.createDataFrame(
        [(i, f"seen text number {i}") for i in range(200)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        # 50 dups of seen, 150 fresh
        [(1000 + i, f"seen text number {i}") for i in range(50)]
        + [(2000 + i, f"fresh text number {i}") for i in range(150)],
        "doc_id long, text string")
    base = sorted(map(tuple, crossdedup.dedup_against(
        new, seen).collect()))
    seen_md5, _, _ = crossdedup.seen_index(seen)
    bf = crossdedup.seen_bloom_filter(seen_md5, fpp=0.01)
    got = sorted(map(tuple, crossdedup.dedup_against(
        new, seen, seen_bloom=bf).collect()))
    assert got == base
    assert sum(1 for r in got if r[1] == "exact_dup") == 50
