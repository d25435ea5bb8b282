"""Staged corpus-cleaning pipeline — the training-data-pipeline
integration of the dedup + text-analysis operator families (round
brief: "the operations a large-scale training-data pipeline would
need", composed end-to-end).

documents → doc_stats → doc_status → clean, each an atomic
StageWriter commit (same resume/lineage machinery as the index build),
so a killed cleaning run resumes from the last complete stage.

Per-doc status, by fixed precedence (first matching reason wins):

  exact_dup   text_md5 seen on a lower doc_id (md5 groupBy — one
              shuffle; the canonical survivor is the group's min id)
  wrong_lang  lang_guess (stopword-vote heuristic) not in ``langs``
  too_short   n_tokens < min_tokens
  repetitive  rep_ratio (duplicated-trigram fraction) > max_rep_ratio
  near_dup    verified-jaccard ≥ threshold against a LOWER-id survivor
              (candidates from MinHash+LSH band buckets — shuffle by
              band, never all-pairs; exact shingle-jaccard verify on
              candidates only)
  kept        everything else

near_dup has two modes. Default (``transitive=False``): keep each
pair's lowest doc_id (greedy keep-first) — exact for duplicate CLIQUES
(the common case: one source text, many near-copies), but for chains
a-b-c where a~b, b~c, a≁c it drops both b and c even though c's only
near neighbor b was itself dropped. ``transitive=True`` runs
distributed connected components (``dedup.connected_components``,
large-star/small-star) over the verified pairs and keeps exactly one
survivor — the min doc_id — per component, which is the standard
corpus-dedup semantics (MinHash cluster dedup à la C4/RefinedWeb).

Scale shape: every step is a hash shuffle keyed by md5 / band / pair —
no global sort, no window over the corpus, no driver-side state. The
verified-pairs join explodes candidate pairs by their shingles; the
LSH prefilter bounds candidates, and ``max_shingle_df`` (passed to the
shingle table) guards hot shingles the same way jaccard_near_dups does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup, quality
from ..sources.tables import StageWriter

STATUSES = ("kept", "exact_dup", "wrong_lang", "too_short",
            "repetitive", "near_dup")


def shingle_table(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_shingle_df: int | None = None) -> DataFrame:
    """(doc_id, sh) distinct word-trigram shingles (df-capped) — the
    shingle build itself is shared with cross-dump dedup
    (``crossdedup.shingles_of``); this adds the hot-shingle df cap."""
    from ..operators.crossdedup import shingles_of
    sh = shingles_of(docs, text_col, id_col)
    if max_shingle_df is not None:
        hot = (sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
               .where(F.col("df") > max_shingle_df).select("sh"))
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    return sh


def verified_near_dup_pairs(docs: DataFrame,
                            jaccard_threshold: float = 0.6,
                            n_minhash: int = 8, n_bands: int = 4,
                            max_shingle_df: int | None = None,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            cache_registry: list | None = None
                            ) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates verified by exact
    shingle jaccard ≥ threshold. doc_a < doc_b always.

    The shingle table is ``.cache()``d (it feeds the signature build,
    both exact-verify join sides, and the size aggregate). Long-lived
    sessions should unpersist it once the returned plan is
    materialized: pass ``cache_registry`` (a list; every DataFrame this
    plan caches is appended) and unpersist its entries afterwards —
    ``clean_corpus`` does exactly that after the doc_status commit."""
    sh = shingle_table(docs, text_col, id_col, max_shingle_df).cache()
    if cache_registry is not None:
        cache_registry.append(sh)
    cand = dedup.minhash_lsh_pairs(sh, n_minhash, n_bands)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (cand.join(sa, "doc_a").join(sb, ["doc_b", "sh"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("n", "na"), "doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b")
                  .withColumnRenamed("n", "nb"), "doc_b")
            .select("doc_a", "doc_b",
                    (F.col("inter").cast("double")
                     / (F.col("na") + F.col("nb") - F.col("inter")))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= jaccard_threshold))


def classify_docs(docs: DataFrame, langs=("en",), min_tokens: int = 5,
                  max_rep_ratio: float = 0.5,
                  jaccard_threshold: float = 0.6,
                  n_minhash: int = 8, n_bands: int = 4,
                  max_shingle_df: int | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  stats: DataFrame | None = None,
                  transitive: bool = False,
                  cache_registry: list | None = None) -> DataFrame:
    """(doc_id, status, n_tokens, lang_guess, rep_ratio) — the whole
    classification as one composable plan (no materialization; the
    staged pipeline below commits it). Pass ``stats`` to reuse an
    already-materialized doc_quality table instead of recomputing it;
    ``cache_registry`` collects the plan's cached subtrees for the
    caller to unpersist after materialization."""
    if stats is None:
        stats = quality.doc_quality(docs, text_col, id_col)
    canon = stats.groupBy("text_md5").agg(
        F.min(id_col).alias("canon_id"))
    flagged = stats.join(canon, "text_md5").select(
        id_col, "n_tokens", "lang_guess", "rep_ratio",
        F.when(F.col(id_col) != F.col("canon_id"), F.lit("exact_dup"))
        .when(~F.col("lang_guess").isin(*langs), F.lit("wrong_lang"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("rep_ratio") > max_rep_ratio, F.lit("repetitive"))
        .alias("gate"))
    survivors = flagged.where(F.col("gate").isNull()).select(id_col)
    pairs = verified_near_dup_pairs(
        docs.join(survivors, id_col), jaccard_threshold,
        n_minhash, n_bands, max_shingle_df, text_col, id_col,
        cache_registry=cache_registry)
    if transitive:
        comp = dedup.connected_components(pairs, "doc_a", "doc_b")
        losers = (comp.where(F.col("node") != F.col("component"))
                  .select(F.col("node").alias(id_col))
                  .withColumn("near_dup", F.lit(True)))
    else:
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct() \
            .withColumn("near_dup", F.lit(True))
    return (flagged.join(losers, id_col, "left")
            .select(id_col,
                    F.coalesce(
                        F.col("gate"),
                        F.when(F.col("near_dup"), F.lit("near_dup")),
                        F.lit("kept")).alias("status"),
                    "n_tokens", "lang_guess", "rep_ratio"))


def curation_report(status: DataFrame, docs: DataFrame,
                    source_col: str = "source", id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(source, status, n_docs, n_tokens) — the per-source cleaning
    funnel (the per-dump stats public pipelines publish: how many docs
    and tokens each gate removed, by source). Reuses the status
    frame's ``n_tokens`` when present (``classify_docs`` emits it);
    otherwise recounts whitespace tokens from ``docs``. One map-side-
    combinable aggregation — a single shuffle keyed by
    (source, status), no windows, at any corpus size."""
    if "n_tokens" in status.columns:
        st = status.select(id_col, "status", "n_tokens")
    else:
        toks = quality.tokens_expr(text_col)
        st = status.select(id_col, "status").join(
            docs.select(F.col(id_col),
                        F.size(toks).cast("long").alias("n_tokens")),
            id_col)
    src = docs.select(F.col(id_col), F.col(source_col).alias("source"))
    return (st.join(src, id_col)
            .groupBy("source", "status")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))


def curate_docs(docs: DataFrame, evalset: DataFrame | None = None,
                decontam_n: int = 8, drop_dup_lines: bool = False,
                scrub_pii: bool = False, per_source_cap: int | None = None,
                strata_col: str = "source", text_col: str = "text",
                id_col: str = "doc_id",
                dedup_urls: bool = False, url_col: str = "url",
                c4_rules: bool = False,
                ppl_keep: tuple | None = None,
                lang_col: str = "lang",
                ppl_train: DataFrame | None = None,
                cache_registry: list | None = None) -> DataFrame:
    """The post-cleaning curation transforms of a training-data
    pipeline, composed in the order public recipes apply them:

      0. canonical-URL dedup — the crawl pipeline's first dedup pass
         (operators/urlnorm.py; needs ``url_col``); losers dropped;
      1. C4 page/line rules — line rules REWRITE ``text_col`` to the
         kept lines, page rules drop failing pages
         (operators/c4filters.py, Raffel et al. 2020 §2.2);
      2. decontaminate — drop docs sharing an n-gram with ``evalset``
         (broadcast semi-join probe; operators/decontam.py);
      3. corpus-level line dedup — strip every repeated line, keep the
         corpus-wide first occurrence (operators/linededup.py); docs
         whose every line was boilerplate are dropped;
      4. PII scrub — map-only regex replacement (operators/pii.py);
      5. perplexity-bucket gate — keep only docs whose CCNet
         head/middle/tail bucket (per ``lang_col``; bigram LM trained
         on ``ppl_train`` when given — CCNet's Wikipedia slot — else
         self-trained; operators/lmfilter.py) is in ``ppl_keep``; docs
         too short to score (NULL bucket) PASS — length gates own them;
      6. per-source quota cap — deterministic head-domain flattening
         (operators/sampling.cap_per_stratum).

    Returns ``docs`` with the same schema, ``text_col`` transformed.
    Every step is optional; the default arguments make this the
    identity plan."""
    from ..operators import (c4filters, decontam, lmfilter, linededup,
                             pii, sampling, urlnorm)
    out = docs
    if dedup_urls:
        winners = (urlnorm.dedup_by_canonical_url(
            out.select(F.col(id_col), F.col(url_col)),
            url_col=url_col, id_col=id_col)
            .where(F.col("keep")).select(id_col))
        out = out.join(winners, id_col)
    if c4_rules:
        c4 = c4filters.c4_quality_filters(
            out, text_col=text_col, id_col=id_col, with_text=True)
        out = (out.drop(text_col)
               .join(c4.where(F.col("keep"))
                     .select(F.col(id_col),
                             F.col("clean_text").alias(text_col)),
                     id_col))
    if evalset is not None:
        out = decontam.decontaminate(out, evalset, decontam_n,
                                     text_col=text_col, id_col=id_col)
    if drop_dup_lines:
        ld = linededup.line_dedup(out, id_col=id_col, text_col=text_col)
        out = (out.drop(text_col)
               .join(ld.where(F.col("n_kept") > 0)
                     .select(F.col(id_col),
                             F.col("clean_text").alias(text_col)),
                     id_col))
    if scrub_pii:
        out = out.withColumn(
            text_col, pii.scrubbed_text_expr(F.col(text_col)))
    if ppl_keep is not None:
        # the LM self-train reads `out` several times (bigram counts,
        # context counts, the vocab scalar, the scoring probe) — pin
        # the curated-so-far lineage instead of recomputing the whole
        # upstream gate chain per read; callers unpersist via
        # cache_registry after materializing (clean_corpus does)
        out = out.persist()
        if cache_registry is not None:
            cache_registry.append(out)
        sc = lmfilter.lm_score(out, train=ppl_train, text_col=text_col,
                               id_col=id_col).select(id_col, "nll")
        grp = (out.select(F.col(id_col), F.col(lang_col).alias("__lang"))
               if lang_col in out.columns
               else out.select(F.col(id_col),
                               F.lit("all").alias("__lang")))
        buckets = lmfilter.perplexity_buckets(sc.join(grp, id_col),
                                              by="__lang")
        keep_ids = buckets.where(
            F.col("bucket").isin(*ppl_keep)
            | F.col("bucket").isNull()).select(id_col)
        out = out.join(keep_ids, id_col)
    if per_source_cap is not None:
        out = sampling.cap_per_stratum(out, per_source_cap,
                                       strata_col=strata_col,
                                       key_col=id_col)
    return out


def clean_corpus(spark: SparkSession, docs: DataFrame, out_dir: str,
                 langs=("en",), min_tokens: int = 5,
                 max_rep_ratio: float = 0.5,
                 jaccard_threshold: float = 0.6,
                 n_minhash: int = 8, n_bands: int = 4,
                 max_shingle_df: int | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 transitive: bool = False,
                 evalset: DataFrame | None = None, decontam_n: int = 8,
                 drop_dup_lines: bool = False, scrub_pii: bool = False,
                 per_source_cap: int | None = None,
                 strata_col: str = "source",
                 dedup_urls: bool = False, url_col: str = "url",
                 c4_rules: bool = False,
                 ppl_keep: tuple | None = None, lang_col: str = "lang",
                 ppl_train: DataFrame | None = None,
                 verbose: bool = True) -> dict:
    """Run (or resume) the staged cleaning pipeline; returns stage
    handles + a per-status count summary.

    The curation options (``evalset``/``drop_dup_lines``/``scrub_pii``/
    ``per_source_cap``) add one further atomic stage, ``curated``,
    applying ``curate_docs`` to the kept documents; with none of them
    set the pipeline ends at ``clean`` exactly as before."""
    params = {"langs": list(langs), "min_tokens": min_tokens,
              "max_rep_ratio": max_rep_ratio,
              "jaccard_threshold": jaccard_threshold,
              "n_minhash": n_minhash, "n_bands": n_bands,
              "max_shingle_df": max_shingle_df,
              "transitive": transitive}
    sw = StageWriter(spark, out_dir, verbose=verbose)
    stats = sw.write_stage(quality.doc_quality(docs, text_col, id_col),
                           "doc_stats")
    caches: list = []
    status = sw.write_stage(
        classify_docs(docs, langs, min_tokens, max_rep_ratio,
                      jaccard_threshold, n_minhash, n_bands,
                      max_shingle_df, text_col, id_col, stats=stats,
                      transitive=transitive, cache_registry=caches),
        "doc_status", inputs=("doc_stats",), params=params)
    for c in caches:  # the stage commit materialized the plan — drop
        c.unpersist()  # the shingle cache instead of leaking it
    clean = sw.write_stage(
        docs.join(status.where(F.col("status") == "kept")
                  .select(id_col), id_col),
        "clean", inputs=("doc_status",), params=params)
    summary = {r["status"]: r["n"] for r in
               status.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    out = {"doc_stats": stats, "doc_status": status, "clean": clean,
           "summary": summary, "writer": sw}
    if (evalset is not None or drop_dup_lines or scrub_pii
            or per_source_cap is not None or dedup_urls or c4_rules
            or ppl_keep is not None):
        cur_params = dict(params, decontam=evalset is not None,
                          decontam_n=decontam_n,
                          drop_dup_lines=drop_dup_lines,
                          scrub_pii=scrub_pii,
                          per_source_cap=per_source_cap,
                          dedup_urls=dedup_urls, c4_rules=c4_rules,
                          ppl_keep=(list(ppl_keep)
                                    if ppl_keep is not None else None),
                          ppl_train=ppl_train is not None)
        cur_caches: list = []
        out["curated"] = sw.write_stage(
            curate_docs(clean, evalset, decontam_n, drop_dup_lines,
                        scrub_pii, per_source_cap, strata_col,
                        text_col, id_col, dedup_urls=dedup_urls,
                        url_col=url_col, c4_rules=c4_rules,
                        ppl_keep=ppl_keep, lang_col=lang_col,
                        ppl_train=ppl_train,
                        cache_registry=cur_caches),
            "curated", inputs=("clean",), params=cur_params)
        for c in cur_caches:
            c.unpersist()
        out["summary"]["curated"] = out["curated"].count()
    return out
