"""Per-document quality metrics for corpus filtering — the text-analysis
family of a training-data pipeline (round brief: language-ID heuristic,
quality scoring, token counting, repetition).

Everything here is a pure JVM column expression (higher-order functions
over a token array) — no Python in the row path, so the metrics run
inside whole-stage codegen and scale linearly with the corpus. The same
expressions back the standalone contract entries (text_quality,
lang_id_heuristic, text_repetition) and the staged cleaning pipeline
(plans/clean.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny embedded samples — enough signal for a heuristic gate; real
# deployments swap in the full public stopword lists (textlib.py embeds
# the complete NLTK English list for the search engine's tokenizer)
EN_STOPWORD_SAMPLE = ("the", "a", "and", "of", "in", "to", "is")
DE_STOPWORD_SAMPLE = ("der", "die", "das", "und", "ist", "mit", "von")


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def trigrams_expr(toks: Column) -> Column:
    """Word-trigram array ([] when < 3 tokens)."""
    return F.when(
        F.size(toks) >= 3,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 3))),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio_expr(toks: Column,
                        stopwords=EN_STOPWORD_SAMPLE) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    # zero-token docs → 0.0, not DIVIDE_BY_ZERO (ANSI mode is on in
    # Spark 4; the cleaning pipeline must survive exactly the empty docs
    # it exists to filter out)
    return F.when(F.size(toks) > 0,
                  F.round(n_sw.cast("double") / F.size(toks), 6)
                  ).otherwise(F.lit(0.0))


def avg_token_len_expr(toks: Column) -> Column:
    total_len = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                            F.lit(0), lambda acc, v: acc + v)
    return F.when(F.size(toks) > 0,
                  F.round(total_len.cast("double") / F.size(toks), 6)
                  ).otherwise(F.lit(0.0))


def repetition_ratio_expr(toks: Column) -> Column:
    """Fraction of duplicated word-trigrams (0 when < 3 tokens) — high
    values flag boilerplate/spam."""
    tg = trigrams_expr(toks)
    total = F.size(tg)
    return F.when(
        total > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(tg))
                .cast("double") / total, 6)).otherwise(F.lit(0.0))


def lang_guess_expr(toks: Column) -> Column:
    """en-vs-de stopword-hit vote (ties → en)."""
    en = F.array(*[F.lit(s) for s in EN_STOPWORD_SAMPLE])
    de = F.array(*[F.lit(s) for s in DE_STOPWORD_SAMPLE])
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_de = F.size(F.filter(toks, lambda t: F.array_contains(de, t)))
    return F.when(n_en >= n_de, F.lit("en")).otherwise(F.lit("de"))


def doc_quality(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, text_md5, n_tokens, stopword_ratio, avg_token_len,
    rep_ratio, lang_guess) — every per-doc metric in ONE scan/projection
    (the token array is materialized once and shared by all metrics)."""
    d = docs.select(F.col(id_col),
                    F.md5(F.col(text_col).cast("binary")).alias("text_md5"),
                    tokens_expr(text_col).alias("toks"))
    toks = F.col("toks")
    return d.select(
        id_col, "text_md5",
        F.size(toks).cast("long").alias("n_tokens"),
        stopword_ratio_expr(toks).alias("stopword_ratio"),
        avg_token_len_expr(toks).alias("avg_token_len"),
        repetition_ratio_expr(toks).alias("rep_ratio"),
        lang_guess_expr(toks).alias("lang_guess"),
    )


# Gopher rules (Rae et al. 2021, "Scaling Language Models: ... Gopher",
# Appendix A1.1) — the published word-level subset that needs no
# symbol/ellipsis census: token-count window, mean-word-length window,
# and the required-English-word test. The 8-word list is verbatim from
# the paper; rep_ratio adds the within-doc duplicate-trigram screen in
# the same spirit as the paper's duplicate-line fractions.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that",
                         "have", "with")
GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS = 50, 100_000
GOPHER_MIN_AVG_LEN, GOPHER_MAX_AVG_LEN = 3.0, 10.0
GOPHER_MIN_REQUIRED_HITS = 2
GOPHER_MAX_REP_RATIO = 0.2


def gopher_quality_filter(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, keep, fail_reason) — Gopher-style composite
    quality gate. ``fail_reason`` names the FIRST failing rule in the
    fixed order (n_tokens, avg_token_len, required_words, rep_ratio) or
    is NULL when the document passes; ``keep`` is the conjunction. The
    document set is preserved (flag, don't drop) so the caller decides
    whether to filter, stratify, or audit.

    Pure JVM column expressions over one token-array projection — a
    map-only pass, zero shuffle, same 100-TB shape as doc_quality."""
    d = docs.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
    toks = F.col("toks")
    n = F.size(toks)
    avg_len = avg_token_len_expr(toks)
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    # count of required words PRESENT (each word counts once no matter
    # how often it occurs) — filter the 8-word list, not the document,
    # so the expression is O(8) per doc and restates 1:1 in ANSI SQL
    req_hits = F.size(F.filter(req, lambda w: F.array_contains(toks, w)))
    rep = repetition_ratio_expr(toks)
    reason = (
        F.when((n < GOPHER_MIN_TOKENS) | (n > GOPHER_MAX_TOKENS),
               F.lit("n_tokens"))
        .when((avg_len < GOPHER_MIN_AVG_LEN)
              | (avg_len > GOPHER_MAX_AVG_LEN), F.lit("avg_token_len"))
        .when(req_hits < GOPHER_MIN_REQUIRED_HITS,
              F.lit("required_words"))
        .when(rep > GOPHER_MAX_REP_RATIO, F.lit("rep_ratio"))
        .otherwise(F.lit(None).cast("string")))
    return d.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"))


# ---------------------------------------------------------------------------
# Hashed-linear quality classifier (fastText-style)
# ---------------------------------------------------------------------------
#
# The model-based quality gate of the public pipelines (CCNet and
# FineWeb-Edu score pages with a linear fastText classifier; DCLM uses
# the same shape): features = unigrams + token bigrams, hashed into a
# fixed bucket space, score = mean of per-bucket weights, prob =
# sigmoid(score). Everything below is pure JVM column expressions —
# hashing, weight lookup and the sum run inside whole-stage codegen, so
# the default path is a MAP-ONLY pass (zero shuffle at any corpus
# size). A trained model drops in as a (bucket, weight) table via
# ``weights=`` (broadcast + one map-combinable aggregation).
#
# The built-in weights are a deterministic LCG over the bucket id —
# explicitly a stand-in for trained coefficients (same stance as
# operators/mlhooks.py): INTEGER weights in [-2048, 2047], so the
# per-document sum is an exact integer (order-independent, identical
# across engines) and only the final division is float.

QC_N_BUCKETS = 1 << 16
_QC_A, _QC_C, _QC_M, _QC_HALF = 1103515245, 12345, 4096, 2048


def hashed_feature_buckets_expr(toks: Column,
                                n_buckets: int = QC_N_BUCKETS) -> Column:
    """token array → array of feature-bucket ids: "u:"-prefixed
    unigrams ++ "b:"-prefixed bigrams, each hashed to
    ``conv(md5[:8], 16, 10) % n_buckets`` (md5's first 32 bits —
    uniform, engine-independent, and restatable 1:1 in ANSI SQL)."""
    uni = F.transform(toks, lambda t: F.concat(F.lit("u:"), t))
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat(F.lit("b:"), F.element_at(toks, i),
                                       F.lit(" "),
                                       F.element_at(toks, i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(uni, bi),
        lambda f: F.conv(F.substring(F.md5(f.cast("binary")), 1, 8),
                         16, 10).cast("long") % n_buckets)


def _lcg_weight_int(bucket: Column) -> Column:
    """Deterministic stand-in weight for a bucket: integer in
    [-2048, 2047] via a fixed LCG (bucket*a + c) % m - m/2. Bucket ids
    are < 2^32 so the product stays well inside int64."""
    return (bucket * F.lit(_QC_A) + F.lit(_QC_C)) % F.lit(_QC_M) \
        - F.lit(_QC_HALF)


def hashed_linear_quality(docs: DataFrame, weights: DataFrame | None = None,
                          n_buckets: int = QC_N_BUCKETS,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(id, n_feats, score, prob, label) — fastText-style hashed linear
    quality score per document.

    * ``weights=None`` (default): the LCG stand-in model, map-only —
      score = sum(int weights)/(2048·n_feats) ∈ [-1, 1], an exact
      integer sum so the value is identical across engines and
      partitionings; prob = sigmoid(score); label = score > 0.
    * ``weights=`` a (bucket BIGINT, weight DOUBLE) table — the trained
      path: features explode, the weight table is broadcast (a fastText
      bucket space is ≤ 2M rows ≈ 32 MB), missing buckets weigh 0.0,
      and the per-doc sum is one map-side-combinable aggregation — the
      corpus side still never shuffles more than the (id, n_feats) agg.

    Empty documents score 0.0 / prob 0.5 / label false (flag-don't-drop:
    the caller composes this with gopher_quality_filter / doc_quality)."""
    d = docs.select(F.col(id_col), tokens_expr(text_col).alias("toks"))
    buckets = hashed_feature_buckets_expr(F.col("toks"), n_buckets)
    if weights is None:
        wsum = F.aggregate(F.transform(buckets, _lcg_weight_int),
                           F.lit(0).cast("long"), lambda acc, v: acc + v)
        base = d.select(F.col(id_col),
                        F.size(buckets).cast("long").alias("n_feats"),
                        wsum.alias("s"))
        raw = F.when(F.col("n_feats") > 0,
                     F.col("s").cast("double")
                     / (F.lit(float(_QC_HALF)) * F.col("n_feats"))
                     ).otherwise(F.lit(0.0))
    else:
        feats = d.select(F.col(id_col),
                         F.size(buckets).cast("long").alias("n_feats"),
                         F.explode_outer(buckets).alias("bucket"))
        base = (feats.join(F.broadcast(weights), "bucket", "left")
                .groupBy(id_col, "n_feats")
                .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0.0)))
                     .alias("s")))
        raw = F.when(F.col("n_feats") > 0,
                     F.col("s") / F.col("n_feats")).otherwise(F.lit(0.0))
    return base.select(
        id_col, "n_feats",
        F.round(raw, 6).alias("score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6).alias("prob"),
        (raw > 0).alias("label"))


def line_repetition_stats(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          sep: str = "\n") -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_char_frac) — Gopher's
    within-document duplicate-LINE screens (Rae et al. 2021 A1.1:
    pages over 30% duplicate lines / 20% characters in duplicate lines
    are dropped; this emits the two statistics, flag-don't-drop like
    ``gopher_quality_filter``, and composes with the word-trigram
    ``repetition_ratio_expr`` which catches rephrasing the line screens
    miss).

    dup_line_frac = repeated line occurrences / lines;
    dup_char_frac = characters in occurrences beyond each line's first
    / total line characters. Empty-line runs are dropped before
    counting. ``sep`` is a LITERAL separator (quoted before reaching
    Java's regex split, so '|' or '.' behave as text, not patterns).
    Pure JVM array expressions — map-only, zero shuffle."""
    lines = F.filter(F.split(F.col(text_col), "\\Q" + sep + "\\E"),
                     lambda x: x != "")
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    total = F.aggregate(F.transform(lines, lambda ln: F.length(ln)),
                        F.lit(0), lambda a, v: a + v)
    dist = F.aggregate(
        F.transform(F.array_distinct(lines), lambda ln: F.length(ln)),
        F.lit(0), lambda a, v: a + v)
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_lines"),
        F.when(n > 0, F.round((n - nd).cast("double") / n, 6))
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(total > 0,
               F.round((total - dist).cast("double") / total, 6))
        .otherwise(F.lit(0.0)).alias("dup_char_frac"))
