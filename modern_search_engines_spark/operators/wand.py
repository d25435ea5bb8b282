"""Block-max WAND top-k over compressed posting lists.

Document-at-a-time union scoring (the reference's OR semantics,
BM25Ranker.py:49-61) with two pruning levels:
  1. WAND pivoting on global per-term upper bounds — lists whose summed
     bounds cannot beat the current k-th score are skipped wholesale;
  2. block-max refinement — when the pivot aligns, the per-block maxima
     (codec ``block_max``) give a tighter bound; if even that cannot beat
     the threshold the pivot document is skipped WITHOUT scoring.

Rank-identity guarantee: pruning only ever skips a document when its
score upper bound is *strictly below* the current k-th best score, so a
document that could enter the top-k under the deterministic tie-break
(score desc, doc_id asc) is always fully scored. The naive union-sum path
(operators/query.py) stays the reference implementation; tests assert the
two are rank-identical (SURVEY.md §4.3).

Runs inside ``applyInPandas`` over (qid, shard) groups: a document lives
in exactly one shard, so shard-local top-k lists are complete for their
documents and the global top-k is the k best of the union.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import codec


def wand_topk(lists: list[dict], k: int) -> list[tuple[int, float]]:
    """Exact top-k by (score desc, doc_idx asc) over posting lists.

    Each list dict: ids (int64 asc), scores (f64), mult (query-side
    multiplier qtf·w — constant per term, F9), block_max (f64 per block).
    """
    lists = [l for l in lists if l["ids"].size > 0]
    if not lists:
        return []
    n_lists = len(lists)
    cursors = [0] * n_lists
    sizes = [l["ids"].size for l in lists]
    ubs = [float(l["mult"]) * float(l["block_max"].max()) for l in lists]

    # min-heap of (score, -doc_idx): root is the weakest top-k member —
    # lowest score, and among equal scores the LARGEST doc_idx (which the
    # canonical order ranks last).
    heap: list[tuple[float, int]] = []

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    def offer(doc: int, score: float) -> None:
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)

    while True:
        order = sorted(
            (i for i in range(n_lists) if cursors[i] < sizes[i]),
            key=lambda i: lists[i]["ids"][cursors[i]])
        if not order:
            break
        theta = threshold()
        acc = 0.0
        pivot_pos = None
        for pos, i in enumerate(order):
            acc += ubs[i]
            if acc >= theta:
                pivot_pos = pos
                break
        if pivot_pos is None:
            break  # no remaining doc can enter the top-k
        pivot_list = order[pivot_pos]
        pivot_doc = int(lists[pivot_list]["ids"][cursors[pivot_list]])

        first_doc = int(lists[order[0]]["ids"][cursors[order[0]]])
        if first_doc == pivot_doc:
            # aligned: every list whose current doc equals the pivot doc
            # (this can extend PAST the pivot position — lists after the
            # pivot may sit on the same doc and must count toward the
            # bound, else a true top-k doc gets skipped)
            aligned = []
            for i in order:
                if int(lists[i]["ids"][cursors[i]]) == pivot_doc:
                    aligned.append(i)
                else:
                    break
            bm_acc = 0.0
            for i in aligned:
                bi = cursors[i] // codec.BLOCK
                bm_acc += float(lists[i]["mult"]) * float(
                    lists[i]["block_max"][bi])
            if len(heap) >= k and bm_acc < theta:
                # block bound rules the pivot out — skip without scoring
                for i in aligned:
                    cursors[i] += 1
                continue
            score = 0.0
            for i in order:
                c = cursors[i]
                if int(lists[i]["ids"][c]) == pivot_doc:
                    score += float(lists[i]["mult"]) * float(
                        lists[i]["scores"][c])
                    cursors[i] += 1
                elif int(lists[i]["ids"][c]) > pivot_doc:
                    break
            offer(pivot_doc, score)
        else:
            # advance lists before the pivot up to the pivot doc
            for i in order[:pivot_pos]:
                c = cursors[i]
                cursors[i] = c + int(np.searchsorted(
                    lists[i]["ids"][c:], pivot_doc, side="left"))

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(-nd, s) for s, nd in out]


def _rows_to_lists(pdf: pd.DataFrame) -> list[dict]:
    out = []
    for r in pdf.itertuples():
        ids, scores = codec.decompress({
            "n": r.n, "ids_blob": r.ids_blob, "scores_blob": r.scores_blob,
            "block_first": r.block_first, "block_max": r.block_max,
            "block_off": r.block_off,
        })
        out.append({
            "ids": ids, "scores": scores,
            "mult": float(r.mult),
            "block_max": np.frombuffer(r.block_max, dtype=np.float64),
        })
    return out


def run_wand(spark: SparkSession, queries: list[tuple[str, str]],
             compressed: DataFrame, doc_dim: DataFrame, k: int = 100,
             n_buckets: int = 64, prune: bool = True) -> DataFrame:
    """Batch block-max-WAND retrieval over the compressed postings.

    One pass for all queries: broadcast the (qid, term, mult) side onto
    the bucket-pruned compressed scan, then ``applyInPandas`` per
    (qid, shard) runs WAND, and a final window merges shard top-ks.
    Returns (qid, rank, doc_id, score).
    """
    from . import query as qmod

    rows = qmod.query_term_rows(queries)
    terms = spark.createDataFrame(
        rows, "qid string, term string, qtf long, w double")
    terms = terms.select(
        "qid", "term",
        (F.col("qtf").cast("double") * F.col("w")).alias("mult"))
    work = compressed
    if prune and "bucket" in compressed.columns:
        work = qmod.prune_postings(compressed, terms, n_buckets,
                                   term_list=[r[1] for r in rows])
    joined = work.join(F.broadcast(terms), "term")

    def _wand_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = key[0]
        top = wand_topk(_rows_to_lists(pdf), k)
        return pd.DataFrame(
            {"qid": [qid] * len(top),
             "doc_idx": [d for d, _ in top],
             "score": [s for _, s in top]})

    shard_tops = joined.groupBy("qid", "shard").applyInPandas(
        _wand_group, schema="qid string, doc_idx long, score double")

    # shard-local top-ks merge through one window exchange (≤ k·shards
    # rows per query — the exchange moves almost nothing)
    w = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_idx")))
    ranked = shard_tops.withColumn("rank", w).where(F.col("rank") <= k)
    # J2 materialization: AQE broadcasts the smaller side (doc_dim at
    # bench scale — cheap, and it keeps the expensive WAND stage free of
    # a broadcast barrier). At 10^12-doc scale doc_dim is partitioned on
    # doc_idx and the k·|queries| ranked side becomes the broadcast.
    return (ranked.join(doc_dim, "doc_idx")
            .select("qid", "rank", "doc_id", "score")
            .orderBy("qid", "rank"))
