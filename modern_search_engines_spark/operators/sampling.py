"""Deterministic, engine-portable sampling for training-data mixing.

``df.sample()`` is seed-stable only within one Spark version/partition
layout — useless when the SAME subset must be reproducible across
engines, re-runs and repartitions (train/holdout splits, mixture
weights per source, decontamination re-runs). These operators decide
membership from a cryptographic hash of the ROW KEY alone:

    keep  ⇔  md5(salt || key)[:8]  <  hex_threshold(rate)

so membership is a pure function of (key, salt, rate) — stable under
any partitioning, any engine (the DuckDB twin computes the identical
md5), and MONOTONE in rate: raising 10% to 20% only ADDS rows, which is
what an ablation ladder needs (the 10% set is a subset of the 20% set).

The comparison stays in HEX-STRING space (lowercase hex compares
lexicographically = numerically) — no 64-bit int parsing, which Spark
and DuckDB expose differently. Everything is a map-only JVM projection:
sampling 100 TB is one scan, no shuffle; the stratified variant adds
one broadcast-size map lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hex_threshold(rate: float) -> str:
    """rate ∈ [0,1] → cutoff the 8-hex decision key is compared ``<``
    against: floor(rate · 16^8) zero-padded. Quantization is 2^-32.
    rate=1.0 returns "g", which every hex string sorts below — ALL rows
    kept, with no ``<=`` special case in the predicate."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def sample_key_expr(key_col: Column, salt: str = "") -> Column:
    """The 8-hex-char decision key: md5(salt || key) prefix."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key_col.cast("string"))
              .cast("binary")), 1, 8)


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Deterministic ``rate``-fraction subset of ``df`` by row key.
    Same (key, salt, rate) → same subset, on any engine, any layout."""
    return df.where(sample_key_expr(F.col(key_col), salt)
                    < F.lit(hex_threshold(rate)))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source",
                      key_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weights step of
    a training-data pipeline (e.g. {'web': 0.1, 'wiki': 1.0}). Strata
    absent from ``rates`` get ``default_rate``. The rate map is a tiny
    literal MAP expression (broadcast-free map-side lookup)."""
    pairs: list[Column] = []
    for s, r in sorted(rates.items()):
        pairs += [F.lit(s), F.lit(hex_threshold(r))]
    thresh = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(hex_threshold(default_rate))) if pairs else \
        F.lit(hex_threshold(default_rate))
    return df.where(sample_key_expr(F.col(key_col), salt) < thresh)
