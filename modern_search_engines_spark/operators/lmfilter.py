"""N-gram language-model perplexity filtering — the CCNet quality gate
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document with a language
model and keep/bucket by perplexity. CCNet trains a KenLM 5-gram on
Wikipedia; this repo's deterministic, dependency-free stand-in is an
add-k-smoothed **bigram** LM trained on a reference corpus (default:
the corpus itself), with the exact same downstream dataflow — per-doc
mean negative log-likelihood, then per-language head/middle/tail
percentile buckets. Swap a real KenLM scorer into the ``nll`` column
and the bucketing stage is unchanged.

100-TB shape (``lm_score``):
  * training counts: explode bigram positions -> groupBy (w1, w2) count
    — map-side combinable, one shuffle; context counts n(w1) derive
    from the bigram table (no second corpus pass); vocabulary size is
    ONE bounded scalar aggregate.
  * scoring: per-doc gram counts first (``(doc_id, w1, w2, c)`` — the
    probe side is compressed to distinct grams per doc BEFORE the
    join), then a shuffle join against the aggregated count tables.
    The count tables have ONE row per key, so AQE's skew-join handling
    can split hot stopword-bigram keys freely; nothing is broadcast
    because a web-scale bigram table does not fit on one executor
    (pass ``broadcast_model=True`` when the training corpus is small).
  * no windows, no driver-side loops; the only ``collect`` is the
    vocabulary-size scalar.

``perplexity_buckets`` computes per-group percentile thresholds as a
SMALL aggregate (rows = groups) joined back broadcast — never a
corpus-wide rank window. Default is the exact ``percentile`` aggregate
(twinnable against DuckDB's ``quantile_cont``); at true scale pass
``approx=True`` to use ``percentile_approx`` (bounded-memory sketch,
CCNet itself thresholds on sampled histograms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

LM_ADD_K = 0.5
BUCKET_LO = 0.3
BUCKET_HI = 0.7


def _toks(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def _bigrams(toks: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs ([] when < 2
    tokens — Spark's ``sequence(1, 0)`` would count DOWN, so guard)."""
    pair = lambda i: F.struct(F.element_at(toks, i).alias("w1"),
                              F.element_at(toks, i + 1).alias("w2"))
    return F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1), pair),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def lm_score(docs: DataFrame, train: DataFrame | None = None,
             text_col: str = "text", id_col: str = "doc_id",
             k: float = LM_ADD_K,
             broadcast_model: bool = False) -> DataFrame:
    """(id, n_bigrams, nll, ppl) — add-k bigram-LM negative
    log-likelihood per token transition and its exp (perplexity).

    ``P(w2|w1) = (n(w1,w2) + k) / (n(w1) + k*V)`` with ``V`` = training
    vocabulary size; ``nll = -mean(ln P)`` over the doc's bigram
    positions, rounded to 6dp (engine-order-independent: the per-doc
    gram counts are integers, so the sum has one term per DISTINCT
    gram). Docs with < 2 tokens score NULL — they have no transitions
    to judge; gate them on length, not perplexity.
    """
    train = train if train is not None else docs
    tb = (train.select(F.explode(_bigrams(_toks(text_col))).alias("g"))
          .groupBy("g.w1", "g.w2").agg(F.count(F.lit(1)).alias("n12")))
    ctx = tb.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = (train.select(F.explode(_toks(text_col)).alias("t"))
             .agg(F.count_distinct("t")).collect()[0][0])

    if broadcast_model:
        tb, ctx = F.broadcast(tb), F.broadcast(ctx)
    pd = (docs.select(F.col(id_col),
                      F.explode(_bigrams(_toks(text_col))).alias("g"))
          .groupBy(id_col, "g.w1", "g.w2")
          .agg(F.count(F.lit(1)).alias("c")))
    lp = F.log((F.coalesce(F.col("n12"), F.lit(0)) + k)
               / (F.coalesce(F.col("n1"), F.lit(0)) + k * vocab))
    sc = (pd.join(tb, ["w1", "w2"], "left")
          .join(ctx, "w1", "left")
          .groupBy(id_col)
          .agg(F.sum("c").alias("n_bigrams"),
               F.round(-F.sum(F.col("c") * lp) / F.sum("c"), 6)
               .alias("nll")))
    out = docs.select(id_col).join(sc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        "nll",
        F.round(F.exp(F.col("nll")), 2).alias("ppl"))


def perplexity_buckets(scored: DataFrame, by: str = "lang",
                       score_col: str = "nll",
                       lo: float = BUCKET_LO, hi: float = BUCKET_HI,
                       approx: bool = False) -> DataFrame:
    """Input + ``bucket`` ∈ {head, middle, tail, NULL}: CCNet's
    per-language perplexity split — ``head`` is the best (lowest-nll)
    ``lo`` fraction, ``tail`` the worst, NULL scores stay NULL.

    Thresholds are ONE tiny aggregate (a row per group) broadcast back
    — never a corpus-wide rank window. ``approx=True`` switches to the
    ``percentile_approx`` sketch for web-scale groups (the exact
    aggregate buffers each group's values on its reducer)."""
    pct = (F.percentile_approx if approx else F.percentile)
    thr = (scored.where(F.col(score_col).isNotNull())
           .groupBy(by)
           .agg(pct(score_col, F.lit(lo)).alias("__t_lo"),
                pct(score_col, F.lit(hi)).alias("__t_hi")))
    s = F.col(score_col)
    bucket = (F.when(s.isNull(), F.lit(None).cast("string"))
              .when(s <= F.col("__t_lo"), F.lit("head"))
              .when(s <= F.col("__t_hi"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (scored.join(F.broadcast(thr), by, "left")
            .withColumn("bucket", bucket)
            .drop("__t_lo", "__t_hi"))
