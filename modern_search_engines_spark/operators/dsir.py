"""Data Selection via Importance Resampling (DSIR) — hashed-n-gram
importance weights for training-data selection (Xie et al., NeurIPS
2023, "Data Selection Language Models via Importance Resampling").

Given a raw corpus and a (usually much smaller) target domain, DSIR
scores every raw document by how target-like its hashed bag-of-n-grams
is:

    features(d)   = multiset of unigrams + bigrams of d,
                    each hashed into one of B buckets
    lambda_b      = ln p_hat(b | target) - ln q_hat(b | raw)
                    (add-alpha smoothed bucket unigram models)
    log_weight(d) = sum over d's grams of lambda_{bucket(gram)}

Documents with high log-weight are resampled into the training mix
(the deterministic md5-threshold machinery in operators/sampling.py is
the companion selection step).

100-TB shape
------------
* The gram explode is the only corpus-sized fan-out and it collapses
  immediately into per-(doc, bucket) counts — a map-side-combinable
  groupBy, so the shuffle carries at most B rows per document, not one
  row per token.
* The bucket model is B rows total (B ~ 1e2..1e4). It is built from
  the (doc, bucket) aggregate — never from the raw gram stream — and
  joined back via an explicit ``broadcast()``: scoring is a map-only
  pass over the aggregate, zero additional shuffle.
* The hash is md5-prefix based (same idiom as operators/sampling.py):
  engine- and layout-independent, so the exact same weights come out
  of any cluster size — reproducibility is part of the contract and
  the DuckDB twin in contract.py proves it cross-engine.

Reference scope note: the reference engine (XeniaRieger/
Modern-Search-Engines) has no data-selection stage; this operator is
part of the round brief's training-data-pipeline family, built on the
same tokenize/hash plumbing as its indexer (backend/core/Tokenizer.py
analog lives in textlib.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def gram_buckets_expr(toks, n_buckets: int):
    """Hashed unigram+bigram bucket ids for a token-array column.

    bucket(g) = int(md5(g)[:6], 16) % n_buckets — 24 bits of md5 is
    plenty for B <= 1e6 and is cheap to restate in ANSI SQL
    (('0x' || substr(md5(g),1,6))::BIGINT % B).
    """
    unigrams = toks
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(unigrams, bigrams)
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 6), 16, 10)
        .cast("long") % n_buckets)


def dsir_log_weights(docs: DataFrame, is_target,
                     n_buckets: int = 64, alpha: float = 0.5,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id_col, log_weight) — DSIR importance log-weight per document.

    ``is_target`` is a boolean Column marking the target-domain rows
    *within* ``docs`` (the common "select raw docs that look like my
    curated seed set" deployment; for a separate target corpus, union
    it in with a flag first). The raw model q is fit on ALL rows,
    the target model p on the flagged rows only. Empty documents have
    no grams and score 0.0 by definition.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = docs.select(
        F.col(id_col),
        is_target.alias("__tgt"),
        F.explode(gram_buckets_expr(toks, n_buckets)).alias("__b"),
    )
    # ONE corpus-sized aggregation; everything below is over its
    # (<= B rows per doc) output or the B-row bucket model.
    per_doc = (base.groupBy(id_col, "__tgt", "__b")
               .agg(F.count(F.lit(1)).alias("__c"))
               .persist())
    model = (per_doc.groupBy("__b")
             .agg(F.sum("__c").alias("__raw"),
                  F.sum(F.when(F.col("__tgt"), F.col("__c"))
                        .otherwise(F.lit(0))).alias("__tgt_c")))
    # add-alpha smoothing over exactly n_buckets outcomes: buckets that
    # no gram hashed into still carry probability mass alpha/(T+aB) —
    # totals therefore come from the model rows, denominators from B.
    tot = model.agg(F.sum("__raw").alias("__R"),
                    F.sum("__tgt_c").alias("__T"))
    lam = (model.crossJoin(F.broadcast(tot)).select(
        "__b",
        (F.log((F.col("__tgt_c") + alpha)
               / (F.col("__T") + alpha * n_buckets))
         - F.log((F.col("__raw") + alpha)
                 / (F.col("__R") + alpha * n_buckets))).alias("__lam")))
    scored = (per_doc.join(F.broadcast(lam), "__b")
              .groupBy(id_col)
              .agg(F.round(F.sum(F.col("__c") * F.col("__lam")), 6)
                   .alias("log_weight")))
    out = (docs.select(id_col)
           .join(scored, id_col, "left")
           .select(id_col, F.coalesce("log_weight", F.lit(0.0))
                   .alias("log_weight")))
    return out
