"""Scale-safe global top-k with rank assignment.

The naive pattern — ``row_number()`` over ``Window.orderBy(...)`` with no
partitionBy — funnels EVERY input row through a single task (Spark logs
``WARN WindowExec: No Partition Defined``); at corpus scale that one task
is the job. The scale-safe shape is:

1. ``df.orderBy(*order).limit(k)`` — Catalyst plans this as
   ``TakeOrderedAndProject``: a per-partition bounded heap (size k) with a
   single k-row merge, never a global sort or single-partition shuffle;
2. rank the ≤ k survivors with a window partitioned by a synthetic
   constant key. The key is ``pmod(xxhash64(col), 1)`` (always 0) rather
   than ``lit(0)`` because Catalyst constant-folds a literal partition
   key away, which re-triggers the unpartitioned-window path; a column-
   dependent expression survives folding (and ``xxhash64`` accepts any
   column type, unlike a ``cast('long')`` which crashes under ANSI for
   string keys). The window input is bounded by k rows, so the single
   partition is by construction tiny.

Output is identical to the naive pattern (same total order, same
tie-breaks, same rank values) — verified by the contract oracle rows
staying green after the swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def ranked_topk(df: DataFrame, order: list[Column], k: int,
                key_col: str, rank_col: str = "rank") -> DataFrame:
    """Top-``k`` rows of ``df`` by ``order`` with a 1-based ``rank_col``.

    ``key_col`` names any non-null column of ``df`` — used only to build
    the fold-proof constant partition key for the bounded rank window.
    """
    top = df.orderBy(*order).limit(k)
    # xxhash64 accepts ANY column type (string ids included — a cast to
    # long would crash under ANSI for non-numeric strings) and stays
    # non-foldable, so the constant key survives Catalyst folding
    w = Window.partitionBy(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(1))).orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w))
