"""Range (interval) join — the second classic operator Spark's API
lacks (brief §custom-operators; DuckDB/QuestDB have native range/ASOF
support, Databricks ships a RANGE_JOIN hint): match each point to the
intervals containing it, ``lo <= point <= hi``. Naively expressed as a
θ-join Spark plans a BroadcastNestedLoopJoin — O(|points| × |intervals|)
— which is exactly the plan this operator exists to avoid.

The standard bucketization: pick ``bin_width``, a point lands in ONE
bin, an interval is exploded into every bin it touches, and the θ-join
becomes an EQUI-join on (keys…, bin) + a residual BETWEEN filter. Each
(point, interval) pair meets in exactly one bin (the point's), so no
post-dedup is needed. One hash shuffle on (keys…, bin); whole-stage
codegen end to end; never a nested-loop product.

Choosing ``bin_width`` ≈ the typical interval length keeps the
explode factor ~2; ``max_bins_per_interval`` is the loud guard (one
cheap aggregate) against a mis-sized width or a degenerate interval
blowing the build side up silently. Intervals with ``hi < lo`` are
dropped (empty by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               bin_width: float, keys: tuple = (),
               how: str = "inner",
               max_bins_per_interval: int | None = None) -> DataFrame:
    """points ⋈ intervals on ``lo <= point <= hi`` (and equal ``keys``),
    returning every point column + every interval column. ``how`` is
    ``inner`` or ``left`` (unmatched points kept with NULL interval
    columns)."""
    assert how in ("inner", "left"), how
    assert bin_width > 0
    lo_bin = F.floor(F.col(lo_col) / bin_width).cast("long")
    hi_bin = F.floor(F.col(hi_col) / bin_width).cast("long")
    ivs = intervals.where(F.col(lo_col) <= F.col(hi_col))
    if max_bins_per_interval is not None:
        over = (ivs.select((hi_bin - lo_bin + 1).alias("__nb"))
                .where(F.col("__nb") > max_bins_per_interval)
                .limit(1).collect())
        if over:
            raise ValueError(
                f"range_join: an interval spans {over[0][0]} bins > "
                f"max_bins_per_interval={max_bins_per_interval} — raise "
                "bin_width (or split the degenerate interval)")
    ib = ivs.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    pb = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long"))
    cond = [pb["__bin"] == ib["__bin"]] + \
           [pb[k] == ib[k] for k in keys]
    between = (ib[lo_col] <= pb[point_col]) & (pb[point_col] <= ib[hi_col])
    if how == "inner":
        j = pb.join(ib, cond + [between])
        return j.select(*[pb[c] for c in points.columns],
                        *[ib[c] for c in intervals.columns
                          if c not in keys])
    # left: inner-match first, then re-attach unmatched points
    matched = pb.join(ib, cond + [between]).select(
        *[pb[c] for c in points.columns],
        *[ib[c] for c in intervals.columns if c not in keys])
    iv_cols = [c for c in intervals.columns if c not in keys]
    hit_keys = matched.select(*points.columns).distinct()
    missed = points.join(hit_keys, points.columns, "left_anti")
    for c in iv_cols:
        missed = missed.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(missed)
