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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", salt: str = "",
               split_col: str = "split") -> DataFrame:
    """Assign every row to exactly ONE named split (train/val/test …)
    by disjoint, contiguous ranges of the deterministic hash key, sized
    by ``weights`` (which must sum to 1 within float tolerance). The
    assignment is a pure map-only function of (key, salt, weights) —
    same split membership on any engine, any layout, any re-run; and
    because ranges are laid out in sorted-name order, growing one
    split's weight only moves rows across the SINGLE boundary it
    shares with its neighbors (no global reshuffle of membership).

    This is the split operator a training pipeline wants alongside
    ``hash_sample`` — sampling answers "which subset", splitting
    answers "which partition of the whole"; both decide from the same
    md5 key, but DIFFERENT salts should be used for a split-within-
    sample so the two decisions stay independent."""
    total = sum(weights.values())
    if not weights or abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    key = sample_key_expr(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = key < F.lit(hex_threshold(min(cum, 1.0)))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def cap_per_stratum(df: DataFrame, cap: int, strata_col: str = "source",
                    key_col: str = "doc_id", salt: str = "",
                    margin: float = 3.0) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — the C4-style per-domain
    quota that stops head domains from dominating a training mix. The
    kept rows are the ``cap`` smallest by the deterministic hash key
    (``sample_key_expr``), so the quota subset is engine- and layout-
    independent like every sampler here, and re-running with a larger
    cap only ADDS rows.

    Scale shape: the naive ``row_number() OVER (PARTITION BY domain)``
    sorts a hot domain's 10^9 rows in one task. This does it in two
    phases, exactly:

    1. per-stratum counts (map-combinable aggregate, broadcast back);
       strata already ≤ cap keep ALL rows with no rank at all — at web
       scale that is almost every domain;
    2. over-cap strata first drop to hash < cap/count · ``margin``
       candidates (map-only filter, ~margin·cap rows per stratum,
       bounded), then rank exactly within the bounded candidate set.

    The margin makes phase 2's input bounded instead of corpus-sized.
    If a pathological hash layout left fewer than ``cap`` candidates
    (Chernoff-small; at margin 3 even cap=8 has P < 1e-4 per stratum,
    and membership is deterministic per dataset — it either always
    passes or always raises for a given corpus), the result
    would silently differ from the exact quota — so the operator
    ASSERTS candidate sufficiency per stratum and raises, never returns
    a wrong subset (rerun with a larger margin)."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    hexk = sample_key_expr(F.col(key_col), salt)
    d = df.withColumn("__sk", hexk)
    counts = d.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    d = d.join(F.broadcast(counts), strata_col)
    under = d.where(F.col("__n") <= cap)
    # phase-2 pre-filter: hex threshold per stratum ~ cap/count · margin
    # ('g' = keep-all when the margin already covers the whole stratum;
    # conv() emits uppercase, md5 keys are lowercase — lower() before
    # the lexicographic compare)
    tnum = F.ceil(F.lit(float(16**8)) * F.lit(float(margin) * cap)
                  / F.col("__n")).cast("long")
    thresh = F.when(
        F.lit(float(margin) * cap) >= F.col("__n"), F.lit("g")
    ).otherwise(
        F.lpad(F.lower(F.conv(tnum.cast("string"), 10, 16)), 8, "0"))
    cand = d.where((F.col("__n") > cap) & (F.col("__sk") < thresh))
    w = Window.partitionBy(strata_col).orderBy("__sk", key_col)
    # persist the bounded candidate set (~margin·cap rows per over-cap
    # stratum): the sufficiency check below fully materializes it (its
    # groupBy scans every partition), so the returned plan's action
    # reads the cache instead of re-executing the corpus scan — ONE
    # pass over the data for check + output, with graceful recompute
    # (not failure) if blocks are evicted
    ranked = cand.withColumn("__rk", F.row_number().over(w)).persist()
    # loud sufficiency check, driven from the AUTHORITATIVE side: every
    # over-cap stratum (from `counts`, which sees all strata) must have
    # ≥ cap candidates. Driving it from `ranked` would let a stratum
    # whose margin pre-filter left ZERO candidates vanish from the
    # check entirely — the guard would pass and the stratum's rows
    # would be silently dropped (neither `under` nor `kept`).
    maxrk = ranked.groupBy(strata_col).agg(F.max("__rk").alias("m"))
    short = (counts.where(F.col("__n") > cap)
             .join(maxrk, strata_col, "left")
             .where(F.coalesce(F.col("m"), F.lit(0)) < cap))
    bad = short.limit(1).collect()
    if bad:
        raise RuntimeError(
            f"cap_per_stratum margin={margin} left stratum "
            f"{bad[0][strata_col]} with {bad[0]['m'] or 0} < cap={cap} "
            "candidates; rerun with a larger margin")
    kept = ranked.where(F.col("__rk") <= cap).drop("__rk")
    return under.unionByName(kept).drop("__sk", "__n")


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
