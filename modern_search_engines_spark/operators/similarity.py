"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k, JVM higher-order functions
  (zip_with dot product; no Python in the loop). The correctness
  baseline; O(N) per query — the right choice when queries ≪ corpus.
* lsh_topk — sign-bit LSH bucketed search: candidates limited to the
  query's bucket (+ optional multi-probe neighbors at Hamming distance 1),
  exact cosine verify inside. The scale path: the scan prunes to matching
  buckets (partition column when persisted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cos_expr(qvec: list[float]):
    qarr = F.array(*[F.lit(float(x)) for x in qvec])
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(e, qarr, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    ne = F.sqrt(F.aggregate(F.transform(e, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nq = float(sum(x * x for x in qvec)) ** 0.5
    return dot / (ne * F.lit(nq))


def brute_force_topk(emb: DataFrame, qvec: list[float],
                     k: int = 10) -> DataFrame:
    """(vec_id, cos, rank) — exact cosine top-k vs one query vector."""
    scored = emb.select("vec_id", _cos_expr(qvec).alias("cos"))
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def sign_bucket(col: str = "embedding", n_bits: int = 12):
    return F.concat(*[
        F.when(F.element_at(col, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(1, n_bits + 1)
    ])


def _probe_buckets(qvec: list[float], n_bits: int,
                   multi_probe: bool) -> list[str]:
    base = "".join("1" if qvec[i] >= 0 else "0" for i in range(n_bits))
    buckets = [base]
    if multi_probe:
        for i in range(n_bits):
            flipped = base[:i] + ("0" if base[i] == "1" else "1") + base[i+1:]
            buckets.append(flipped)
    return buckets


def lsh_topk(emb: DataFrame, qvec: list[float], k: int = 10,
             n_bits: int = 12, multi_probe: bool = True) -> DataFrame:
    """(vec_id, cos, rank) — approximate top-k: exact cosine within the
    query's sign-bucket (+Hamming-1 probes). At scale ``bucket`` is the
    table's partition column → the scan reads only probed buckets."""
    buckets = _probe_buckets(qvec, n_bits, multi_probe)
    scored = (emb.withColumn("bucket", sign_bucket(n_bits=n_bits))
              .where(F.col("bucket").isin(buckets))
              .select("vec_id", _cos_expr(qvec).alias("cos")))
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
