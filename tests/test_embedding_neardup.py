"""Embedding-cosine near-dup pairs (operators/similarity.py
embedding_near_dups) vs a numpy oracle implementing the identical
banding + exact-verify semantics: candidates = pairs agreeing on every
sign bit of ≥1 band, verified with true cosine ≥ threshold."""

import numpy as np
from pyspark.sql import types as T

from modern_search_engines_spark.operators import similarity

DIM, N_BANDS, BAND_BITS = 32, 4, 8


def _np_near_dups(vecs: dict[int, np.ndarray], threshold: float):
    def bands(v):
        bits = (v >= 0).astype(int)
        return {(j, tuple(bits[j * BAND_BITS:(j + 1) * BAND_BITS]))
                for j in range(N_BANDS)}
    ids = sorted(vecs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not bands(vecs[a]) & bands(vecs[b]):
                continue
            va, vb = vecs[a], vecs[b]
            cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if round(cos, 6) >= threshold:
                out.add((a, b, round(cos, 6)))
    return out


def _mk_df(spark, vecs: dict[int, np.ndarray]):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        schema)


def test_planted_near_dups_found_and_precision_exact(spark):
    rng = np.random.default_rng(5)
    vecs = {i: rng.normal(size=DIM).astype(np.float32) for i in range(60)}
    # plant 6 near-dups: tiny perturbations of existing vectors — same
    # sign pattern (ε ≪ |components|) so banding certainly catches them
    for j in range(6):
        base = vecs[j]
        vecs[100 + j] = base + np.sign(base).astype(np.float32) * 0.01
    got = {(r["vec_a"], r["vec_b"], r["cos"])
           for r in similarity.embedding_near_dups(
               _mk_df(spark, vecs), threshold=0.95, n_bands=N_BANDS,
               band_bits=BAND_BITS, round_to=6).collect()}
    want = _np_near_dups({k: v.astype(np.float64) for k, v in vecs.items()},
                         0.95)
    assert got == want
    planted = {(j, 100 + j) for j in range(6)}
    assert planted <= {(a, b) for a, b, _ in got}
    # precision is exact: every returned pair really is ≥ threshold
    for a, b, cos in got:
        va, vb = vecs[a].astype(np.float64), vecs[b].astype(np.float64)
        true = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert round(true, 6) >= 0.95
        assert a < b


def test_hot_bucket_split_bounds_candidates(spark):
    """A planted hot sign-pattern bucket (every vector agrees on band 0
    — near-dup-heavy corpora cluster by construction) must not go
    quadratic once ``max_bucket_docs`` is set, and planted true
    near-dups — which share EVERY band, hence ≥ 2 — must survive the
    split with identical verified output."""
    rng = np.random.default_rng(13)
    vecs = {}
    for i in range(400):
        v = rng.normal(size=DIM).astype(np.float32)
        v[:BAND_BITS] = np.abs(v[:BAND_BITS])  # band 0: all-positive
        vecs[i] = v
    for j in range(6):  # near-identical partners: share all 4 bands
        base = vecs[j]
        vecs[1000 + j] = base + np.sign(base).astype(np.float32) * 0.01
    df = _mk_df(spark, vecs).cache()

    unsplit = similarity._emb_band_candidates(
        df, N_BANDS, BAND_BITS, "vec_id", None).count()
    split = similarity._emb_band_candidates(
        df, N_BANDS, BAND_BITS, "vec_id", 50).count()
    assert unsplit >= 406 * 405 // 2  # the hot bucket went quadratic
    assert split < unsplit / 20  # bounded by two-band intersections

    kw = dict(threshold=0.95, n_bands=N_BANDS, band_bits=BAND_BITS,
              round_to=6)
    got_split = {(r["vec_a"], r["vec_b"], r["cos"])
                 for r in similarity.embedding_near_dups(
                     df, max_bucket_docs=50, **kw).collect()}
    got_plain = {(r["vec_a"], r["vec_b"], r["cos"])
                 for r in similarity.embedding_near_dups(
                     df, **kw).collect()}
    assert got_split == got_plain
    planted = {(j, 1000 + j) for j in range(6)}
    assert planted <= {(a, b) for a, b, _ in got_split}
    df.unpersist()


def test_low_threshold_matches_numpy_banding_semantics(spark):
    # random vectors, low threshold: result = banding ∩ verify, NOT the
    # full brute-force pair set (recall is the banding probability by
    # contract) — the numpy oracle applies the same candidate rule
    rng = np.random.default_rng(9)
    vecs = {i: rng.normal(size=DIM).astype(np.float32) for i in range(40)}
    got = {(r["vec_a"], r["vec_b"], r["cos"])
           for r in similarity.embedding_near_dups(
               _mk_df(spark, vecs), threshold=0.1, n_bands=N_BANDS,
               band_bits=BAND_BITS, round_to=6).collect()}
    want = _np_near_dups({k: v.astype(np.float64) for k, v in vecs.items()},
                         0.1)
    assert got == want and len(got) > 0
