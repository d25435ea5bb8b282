"""IR evaluation metrics with the reference's exact quirks
(subpages/EvaluatePage.py:21-51, SURVEY.md R3-R5):

* MRR@k: reciprocal rank of the first hit, 0 if none;
* NDCG@k: binary gains; the IDCG denominator sums over **all** ground-
  truth results (not min(k, |gt|)) — quirk replicated;
* MAP@k: precision sum divided by **len(gt)** (not min(k, |gt|)) —
  quirk replicated.

Driver-side functions over small ranked lists, plus a distributed
variant over a (qid, rank, url) runs DataFrame joined with qrels.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def mrr(model_results: list[str], gt_results: list[str]) -> float:
    gt = set(gt_results)
    for i, res in enumerate(model_results, 1):
        if res in gt:
            return 1.0 / i
    return 0.0


def ndcg(model_results: list[str], gt_results: list[str]) -> float:
    gt = set(gt_results)
    dcg = sum(1.0 / math.log2(n + 1)
              for n, res in enumerate(model_results, 1) if res in gt)
    idcg = sum(1.0 / math.log2(j + 1)
               for j in range(1, len(gt_results) + 1))
    return dcg / idcg if idcg else 0.0


def average_precision(model_results: list[str],
                      gt_results: list[str]) -> float:
    gt = set(gt_results)
    rel_at_n, precision = 0, 0.0
    for n, res in enumerate(model_results, 1):
        if res in gt:
            rel_at_n += 1
            precision += rel_at_n / n
    return precision / len(gt_results) if gt_results else 0.0


def evaluate_runs(runs: DataFrame, qrels: DataFrame) -> DataFrame:
    """Distributed per-query metrics: runs(qid, rank, url) vs
    qrels(qid, url, relevant∈{1,-1}) → (qid, mrr, ndcg, map).

    Set up as window + agg so it scales to millions of queries; the
    formulas keep the reference's denominators.
    """
    gt_sizes = (qrels.where(F.col("relevant") == 1)
                .groupBy("qid").agg(F.count(F.lit(1)).alias("n_gt")))
    hits = runs.join(
        qrels.where(F.col("relevant") == 1).select("qid", "url")
        .withColumn("hit", F.lit(1)), ["qid", "url"], "left"
    ).withColumn("hit", F.coalesce("hit", F.lit(0)))
    w = (Window.partitionBy("qid").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, 0))
    hits = hits.withColumn("rel_at_n", F.sum("hit").over(w))
    per_q = hits.groupBy("qid").agg(
        F.max(F.when(F.col("hit") == 1,
                     1.0 / F.col("rank")).otherwise(0.0)).alias("mrr"),
        F.sum(F.when(F.col("hit") == 1,
                     1.0 / F.log2(F.col("rank") + 1)).otherwise(0.0))
        .alias("dcg"),
        F.sum(F.when(F.col("hit") == 1,
                     F.col("rel_at_n").cast("double") / F.col("rank"))
              .otherwise(0.0)).alias("p_sum"),
    )
    # reference IDCG: sum over ALL gt results; reference MAP: /len(gt)
    idcg = gt_sizes.withColumn(
        "idcg",
        F.aggregate(F.sequence(F.lit(1), F.col("n_gt")), F.lit(0.0),
                    lambda acc, j: acc + 1.0
                    / F.log2(j.cast("double") + 1.0)))
    return (per_q.join(idcg, "qid")
            .select("qid", "mrr",
                    (F.col("dcg") / F.col("idcg")).alias("ndcg"),
                    (F.col("p_sum") / F.col("n_gt")).alias("map")))


def summarize_by_model(metrics: DataFrame,
                       model_col: str = "model") -> DataFrame:
    """A12 (EvaluatePage.py:159-167): per-model mean and sample variance
    of each metric (the reference's pandas groupby mean()/var())."""
    aggs = []
    for m in ("mrr", "ndcg", "map"):
        aggs += [F.avg(m).alias(f"{m}_mean"),
                 F.var_samp(m).alias(f"{m}_var")]
    return metrics.groupBy(model_col).agg(*aggs)
