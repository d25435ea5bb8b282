"""Incremental (cross-dump) deduplication — dedup a NEW batch of
documents against an already-ingested corpus, the operational shape of
every recurring web-crawl pipeline (FineWeb dedups each CommonCrawl
dump against itself and prior state; CCNet shards by dump). The batch
self-dedup operators (``dedup.exact_dups``, ``minhash_lsh_pairs``)
answer "what is duplicated WITHIN this table"; this one answers "which
of today's documents were already seen".

Statuses per new doc (first matching wins):
  exact_dup  text md5 present in the seen corpus; ``dup_of`` = the
             smallest seen id with that md5
  near_dup   (only when ``jaccard_threshold`` is set) a seen doc shares
             a MinHash-LSH band AND verified shingle-jaccard ≥
             threshold; ``dup_of`` = the best match (highest jaccard,
             ties to the smallest seen id)
  new        everything else

100-TB shape: the seen side is reduced to three REUSABLE aggregates —
an md5→min-id table, a minhash signature table, and the distinct
shingle table (build them once per ingest with ``seen_index`` and
persist; each daily dump then probes them without rescanning the
corpus). All joins are keyed (md5 / band / (id, shingle)); the band
join is new×seen only — never new×new or seen×seen — so a dump's cost
scales with the dump, not the corpus. The exact-verify join explodes
only LSH candidates by the new doc's shingles, the same bounded shape
as ``plans/clean.verified_near_dup_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, quality


def shingles_of(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh) distinct word-trigram shingles."""
    toks = quality.tokens_expr(text_col)
    return (docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
            .select("doc_id",
                    F.explode(F.array_distinct(
                        quality.trigrams_expr(F.col("t")))).alias("sh")))


def seen_index(seen: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", n_minhash: int = 8
               ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(md5 table, signature table, shingle table) of the seen corpus
    — persist these between dumps; ``dedup_against`` accepts them via
    ``seen_md5``/``seen_sig``/``seen_sh`` so only the new dump is
    scanned per run."""
    md5 = (seen.select(F.md5(F.col(text_col).cast("binary"))
                       .alias("text_md5"), F.col(id_col))
           .groupBy("text_md5").agg(F.min(id_col).alias("seen_id")))
    sh = shingles_of(seen, text_col, id_col)
    sig = dedup.minhash_signatures(sh, n_minhash)
    return md5, sig, sh


def seen_bloom_filter(seen_md5: DataFrame, n_keys: int | None = None,
                      fpp: float = 0.01):
    """Build the reusable broadcast Bloom prefilter over a seen-md5
    table (persist it next to the seen index; rebuild per ingest).
    See ``operators/bloom.py`` for sizing/sharding guidance."""
    from . import bloom
    return bloom.build_bloom(seen_md5, "text_md5", n_keys, fpp)


def dedup_against(new: DataFrame, seen: DataFrame | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_minhash: int = 8, n_bands: int = 4,
                  jaccard_threshold: float | None = None,
                  seen_md5: DataFrame | None = None,
                  seen_sig: DataFrame | None = None,
                  seen_sh: DataFrame | None = None,
                  max_band_docs: int | None = None,
                  seen_bloom=None) -> DataFrame:
    """(id, status, dup_of, jaccard) — every NEW doc classified against
    the seen corpus. Pass either ``seen`` (the index is derived) or the
    three precomputed ``seen_*`` tables.

    ``max_band_docs`` is the loud guard against a degenerate seen
    corpus: a band value shared by B seen docs multiplies every
    colliding new doc by B in the candidate join (10^6 near-identical
    boilerplate pages ⇒ one bucket goes quadratic). When set, a cheap
    seen-side band-size aggregate runs first and RAISES over the cap —
    the fix is to self-dedup the seen corpus (its exact/near dups are
    what inflate the bucket) rather than silently lose recall."""
    if seen_md5 is None or (jaccard_threshold is not None
                            and (seen_sig is None or seen_sh is None)):
        assert seen is not None, \
            "dedup_against: pass seen= or the precomputed seen_* tables"
        m, s, h = seen_index(seen, text_col, id_col, n_minhash)
        seen_md5 = seen_md5 if seen_md5 is not None else m
        seen_sig = seen_sig if seen_sig is not None else s
        seen_sh = seen_sh if seen_sh is not None else h

    base = new.select(F.col(id_col),
                      F.md5(F.col(text_col).cast("binary"))
                      .alias("text_md5"))
    # optional Bloom prefilter (``seen_bloom_filter``): map-only
    # might-contain over the dump BEFORE the keyed join, so only true
    # dups + ~fpp false positives shuffle; the join below verifies
    # exactly — the output is identical with or without it
    probe = base
    if seen_bloom is not None:
        from . import bloom
        probe = base.where(
            bloom.might_contain(seen_bloom, F.col("text_md5")))
    exact = (probe.join(seen_md5, "text_md5")
             .select(id_col, F.col("seen_id").alias("__exact")))

    near = None
    if jaccard_threshold is not None:
        sh_new = shingles_of(new, text_col, id_col)
        sig_new = dedup.minhash_signatures(sh_new, n_minhash)

        def _bands(sig: DataFrame, name: str) -> DataFrame:
            return dedup.banded_ids(sig, name, n_minhash, n_bands)

        seen_bands = _bands(seen_sig, "seen_id")
        if max_band_docs is not None:
            over = (seen_bands.groupBy("band")
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .where(F.col("__n") > max_band_docs)
                    .limit(1).collect())
            if over:
                raise ValueError(
                    f"dedup_against: seen band bucket has {over[0][1]} "
                    f"> max_band_docs={max_band_docs} docs — the "
                    "candidate join would be quadratic in it; self-dedup "
                    "the seen corpus (exact_dups/minhash) first")
        cand = (_bands(sig_new, "new_id")
                .join(seen_bands, "band")
                .select("new_id", "seen_id").distinct())
        sizes_new = sh_new.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("na"))
        sizes_seen = seen_sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("nb"))
        inter = (cand
                 .join(sh_new.withColumnRenamed("doc_id", "new_id"),
                       "new_id")
                 .join(seen_sh.withColumnRenamed("doc_id", "seen_id"),
                       ["seen_id", "sh"])
                 .groupBy("new_id", "seen_id")
                 .agg(F.count(F.lit(1)).alias("inter")))
        jac = (inter
               .join(sizes_new.withColumnRenamed("doc_id", "new_id"),
                     "new_id")
               .join(sizes_seen.withColumnRenamed("doc_id", "seen_id"),
                     "seen_id")
               .select("new_id", "seen_id",
                       (F.col("inter").cast("double")
                        / (F.col("na") + F.col("nb") - F.col("inter")))
                       .alias("j"))
               .where(F.col("j") >= jaccard_threshold))
        # best match: highest jaccard, ties to smallest seen id — one
        # map-side-combinable min over an orderable struct
        near = (jac.groupBy(F.col("new_id").alias(id_col))
                .agg(F.min(F.struct((-F.col("j")).alias("nj"),
                                    F.col("seen_id").alias("sid")))
                     .alias("b"))
                .select(id_col,
                        F.col("b.sid").alias("__near"),
                        F.round(-F.col("b.nj"), 6).alias("__jac")))

    out = base.join(exact, id_col, "left")
    if near is not None:
        out = out.join(near, id_col, "left")
    else:
        out = out.withColumn("__near", F.lit(None).cast("long")) \
                 .withColumn("__jac", F.lit(None).cast("double"))
    status = (F.when(F.col("__exact").isNotNull(), F.lit("exact_dup"))
              .when(F.col("__near").isNotNull(), F.lit("near_dup"))
              .otherwise(F.lit("new")))
    return out.select(
        id_col, status.alias("status"),
        F.coalesce("__exact", "__near").cast("long").alias("dup_of"),
        F.when(F.col("__exact").isNull(), F.col("__jac"))
        .alias("jaccard"))
