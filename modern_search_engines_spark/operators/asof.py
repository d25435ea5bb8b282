"""As-of (point-in-time) join — the classic operator Spark's DataFrame
API lacks (pandas ``merge_asof``, DuckDB/QuestDB ``ASOF JOIN``,
Flink temporal joins): attach to each left row the LATEST right row of
the same key whose timestamp is ≤ the left row's (backward direction),
optionally strict (<) and/or within a tolerance window. The standard
need everywhere events meet slowly-changing state: sessions → most
recent profile snapshot, trades → latest quote, clicks → last
purchase.

Implemented as a composition of existing DataFrame ops (no UDF, no
cogroup): union both sides tagged, ONE shuffle partitioning by key,
and a running ``last(non-null right payload)`` over a per-key
time-ordered window. The right payload travels as ONE struct column so
every output field comes from the SAME matched right row (per-column
last-non-null would mix rows when a right field is legitimately NULL).

100-TB shape: one hash shuffle on the join key; the window is keyed
(never corpus-wide — partitionBy(key) ORDER BY ts), evaluated as a
running aggregate in a single pass over each key's sorted run, state
O(1) per key. A mega-key is a straight sorted scan — no blow-up, but
its full history still sorts in ONE task. ``bucket_s`` defuses that:
the two-phase time-bucketed variant windows per (key, time-bucket) —
a mega-key's events spread across as many tasks as it has buckets —
then carries the last right payload across bucket boundaries with a
second window over the per-(key, bucket) AGGREGATE (one row per
bucket, so that window's partitions are bounded by the time span, not
the event count). Identical results by construction: an earlier-bucket
right row always strictly precedes every current-bucket left row, so
coalesce(within-bucket running match, carried boundary match) is
exactly the single-window running match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts: str = "ts", right_cols: tuple = ("value",),
              strict: bool = False, tolerance_s: float | None = None,
              suffix: str = "_r",
              bucket_s: float | None = None) -> DataFrame:
    """Left rows + ``<col><suffix>`` for each of ``right_cols`` and
    ``<ts><suffix>`` (the matched right row's timestamp), NULL when no
    right row precedes. ``strict=True`` requires right.ts < left.ts
    (default ≤). ``tolerance_s`` voids matches older than that many
    seconds before the left timestamp.

    ``bucket_s`` (seconds) switches to the two-phase time-bucketed
    plan — same results, hot-key safe: pick a bucket width that gives
    the largest key's history ≥ tens of buckets (e.g. a day of ticks →
    ``bucket_s=3600``).

    Right-side ties (two right rows with the same (key, ts)) resolve
    to the LAST in the union's sort order (single-window path) or the
    greatest payload struct (bucketed path) — pass a pre-deduped right
    side (e.g. max-id per (key, ts)) when tie identity matters.
    """
    payload = F.struct(F.col(ts).alias("__rts"),
                       *[F.col(c) for c in right_cols])
    r = right.select(F.col(key), F.col(ts),
                     # strict: right sorts AFTER left at equal ts, so a
                     # same-instant right row is invisible to that left
                     F.lit(2 if strict else 0).alias("__side"),
                     payload.alias("__p"))
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__p", F.lit(None).cast(r.schema["__p"].dataType))
    u = (l.select(*left.columns, "__side", "__p")
         .unionByName(r.select(*[F.lit(None).cast(left.schema[c].dataType)
                                 .alias(c) if c not in (key, ts)
                                 else F.col(c) for c in left.columns],
                               "__side", "__p")))
    if bucket_s is None:
        w = (Window.partitionBy(key).orderBy(ts, "__side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        u = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    else:
        # phase 1: running match WITHIN each (key, bucket) — mega-keys
        # parallelize across buckets
        u = u.withColumn(
            "__b", F.floor(F.col(ts).cast("double") / float(bucket_s)))
        w_in = (Window.partitionBy(key, "__b").orderBy(ts, "__side")
                .rowsBetween(Window.unboundedPreceding,
                             Window.currentRow))
        u = u.withColumn("__m_in", F.last("__p", ignorenulls=True)
                         .over(w_in))
        # phase 2: the last right payload of each (key, bucket) — an
        # AGGREGATE (max by (ts) via struct ordering; __rts is the
        # payload's first field so the struct max IS the latest row) —
        # then carry it forward over STRICTLY EARLIER buckets with a
        # window whose partitions hold one row per bucket, not per event
        bl = (u.where(F.col("__p").isNotNull())
              .groupBy(key, "__b").agg(F.max("__p").alias("__bl")))
        w_carry = (Window.partitionBy(key).orderBy("__b")
                   .rowsBetween(Window.unboundedPreceding, -1))
        carried = (u.select(key, "__b").distinct()
                   .join(bl, [key, "__b"], "left")
                   .withColumn("__c", F.last("__bl", ignorenulls=True)
                               .over(w_carry))
                   .select(key, "__b", "__c"))
        u = (u.join(carried, [key, "__b"], "left")
             .withColumn("__m", F.coalesce("__m_in", "__c")))
    out = u.where(F.col("__side") == 1)
    m = F.col("__m")
    if tolerance_s is not None:
        in_tol = (F.col(ts).cast("double")
                  - m["__rts"].cast("double")) <= tolerance_s
        m = F.when(m.isNotNull() & in_tol, m)
    return out.select(
        *left.columns,
        m["__rts"].alias(f"{ts}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in right_cols])
