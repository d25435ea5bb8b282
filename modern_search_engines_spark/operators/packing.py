"""Sequence packing — lay a tokenized corpus end-to-end into fixed-
length training sequences and emit the (sequence ← document-span)
manifest a training data-loader consumes.

This is the GPT-style "concatenate everything, cut every ``seq_len``
tokens" packing (the highest-throughput packer — zero padding except
the final sequence; doc boundaries survive as spans for attention-mask
construction). Docs are ordered by id (deterministic — same manifest on
any engine/partitioning), each doc gets its global token offset, and a
doc crossing sequence boundaries is split across as many sequences as
it covers.

Scale shape — the global running sum is THE hazard here. The naive
``sum() OVER (ORDER BY doc_id)`` funnels the whole corpus through one
task. This operator computes it in two phases, both parallel:

1. range-repartition by doc id, cumsum WITHIN each partition (window
   partitioned by ``spark_partition_id()`` — parallel; the range
   partitioner guarantees partition p holds ids strictly below
   partition p+1). The pid-stamped base is pinned with an eager
   ``localCheckpoint`` BEFORE phases 1 and 2 branch off it: both
   subtrees must see the same physical partitioning, and relying on
   ReuseExchange to collapse them is fragile — with exchange reuse
   disabled (or a canonicalization miss) RangePartitioner would
   resample boundaries per execution with rdd.id-dependent seeds,
   pids would diverge between the two subtrees, and the pid→offset
   join would silently misplace every global offset. The checkpoint
   makes the pid column a property of ONE materialized RDD. (The
   checkpointed rows are narrow — (id, n_tok, pid) — so the block
   footprint is rows × ~24 bytes, not corpus text.)
2. per-partition totals (one tiny P-row aggregate) get their own
   cumsum on the driver-sized side and broadcast-join back as offsets.

The span explosion is a per-row ``sequence()`` bounded by
ceil(doc_len / seq_len) — never corpus-sized state.

Offsets are computed with integer ``DIV`` (never float division) so the
manifest is exact past 2^53 tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(docs: DataFrame, seq_len: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int | None = None) -> DataFrame:
    """(seq_id, doc_id, doc_tok_begin, doc_tok_end, seq_tok_begin) —
    one row per (sequence, contiguous doc span), ordered semantics:

    * ``seq_id``: 0-based index of the fixed-``seq_len`` window;
    * ``doc_tok_begin``/``doc_tok_end``: [begin, end) token slice of
      the doc that lands in this sequence (whitespace tokens);
    * ``seq_tok_begin``: where the slice starts inside the sequence.

    Zero-token docs are dropped (they occupy no training tokens).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n_tok = F.size(F.filter(F.split(F.col(text_col), " "),
                            lambda x: x != "")).cast("long")
    base = docs.select(F.col(id_col), n_tok.alias("n_tok")) \
               .where(F.col("n_tok") > 0)
    if num_partitions:
        base = base.repartitionByRange(num_partitions, id_col)
    else:
        base = base.repartitionByRange(id_col)
    # pin the range partitioning + pid stamps (see module docstring):
    # phase 1 and phase 2 below each re-execute `base` if it stays a
    # lazy plan, and two executions of a range exchange need not pick
    # the same boundaries
    base = (base.withColumn("pid", F.spark_partition_id())
            .localCheckpoint(eager=True))

    # phase 1: cumsum inside each range partition (parallel)
    w_local = Window.partitionBy("pid").orderBy(id_col)
    local = base.withColumn("local_end", F.sum("n_tok").over(w_local))

    # phase 2: cumsum of the P partition totals (P rows — driver-sized;
    # the fold-proof constant partition key is the repo's ranked_topk
    # convention for windows whose input is bounded by construction)
    w_parts = (Window.partitionBy(F.pmod(F.xxhash64(F.col("pid")),
                                         F.lit(1)))
               .orderBy("pid")
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (base.groupBy("pid").agg(F.sum("n_tok").alias("ptot"))
               .select("pid", F.coalesce(F.sum("ptot").over(w_parts),
                                         F.lit(0)).alias("poff")))
    placed = (local.join(F.broadcast(offsets), "pid")
              .select(id_col, "n_tok",
                      (F.col("poff") + F.col("local_end") - F.col("n_tok"))
                      .alias("g0")))  # global start offset of the doc

    # span explosion: doc [g0, g0+n) covers seqs g0 DIV L .. (g0+n-1) DIV L
    L = F.lit(int(seq_len)).cast("long")
    first = F.expr(f"g0 DIV {int(seq_len)}")
    last = F.expr(f"(g0 + n_tok - 1) DIV {int(seq_len)}")
    out = (placed
           .select(id_col, "n_tok", "g0",
                   F.explode(F.sequence(first, last)).alias("seq_id"))
           .select(
               F.col("seq_id"),
               F.col(id_col),
               # slice of the DOC that falls inside [seq_id*L, (seq_id+1)*L)
               F.greatest(F.col("seq_id") * L - F.col("g0"), F.lit(0))
               .cast("long").alias("doc_tok_begin"),
               F.least((F.col("seq_id") + 1) * L - F.col("g0"),
                       F.col("n_tok")).cast("long").alias("doc_tok_end"),
               F.greatest(F.col("g0") - F.col("seq_id") * L, F.lit(0))
               .cast("long").alias("seq_tok_begin")))
    return out
