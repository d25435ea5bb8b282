"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k, JVM higher-order functions
  (zip_with dot product; no Python in the loop). The correctness
  baseline; O(N) per query — the right choice when queries ≪ corpus.
* lsh_topk — sign-bit LSH bucketed search: candidates limited to the
  query's bucket (+ optional multi-probe neighbors at Hamming distance 1),
  exact cosine verify inside. The scale path: the scan prunes to matching
  buckets (partition column when persisted).
* embedding_near_dups — pairwise cosine near-duplicate detection via
  sign-bit LSH BANDING (the all-pairs analog of lsh_topk): candidates
  are pairs agreeing on every bit of ≥1 band, verified with exact
  cosine. Shuffles by band bucket — never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .topk import ranked_topk

def _order():
    return [F.desc("cos"), F.asc("vec_id")]


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
    return ranked_topk(scored, _order(), k, key_col="vec_id")


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
    return ranked_topk(scored, _order(), k, key_col="vec_id")


def _cos_pair_expr(ea, eb):
    """cosine(ea, eb) for two array columns — JVM higher-order folds."""
    a = F.transform(ea, lambda x: x.cast("double"))
    b = F.transform(eb, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def _emb_band_array(n_bands: int, band_bits: int):
    """array<string> of the vector's sign-bit band keys ("j|bits…")."""
    return F.array(*[
        F.concat(F.lit(f"{j}|"), *[
            F.when(F.element_at("embedding",
                                j * band_bits + i) >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for i in range(1, band_bits + 1)])
        for j in range(n_bands)])


def _emb_band_candidates(emb: DataFrame, n_bands: int, band_bits: int,
                         id_col: str,
                         max_bucket_docs: int | None) -> DataFrame:
    """Candidate pairs (vec_a, vec_b, ea, eb) from the band join,
    pre-verify — factored out so tests can count candidates.

    ``max_bucket_docs`` splits hot band buckets exactly like
    dedup._sim_band_candidates: vectors in a band bucket over the cap
    are re-keyed on (hot band, each OTHER band of the vector) and
    self-joined on the composite key, so within-bucket pairing is
    bounded by two-band intersection sizes instead of the hot bucket's
    square."""
    band_arr = _emb_band_array(n_bands, band_bits)
    banded = emb.select(F.col(id_col).alias("vid"), "embedding",
                        F.explode(band_arr).alias("band"))

    def _self_join(p: DataFrame, key: str) -> DataFrame:
        a, b = p.alias("a"), p.alias("b")
        return (a.join(b, (F.col(f"a.{key}") == F.col(f"b.{key}"))
                       & (F.col("a.vid") < F.col("b.vid")))
                .select(F.col("a.vid").alias("vec_a"),
                        F.col("b.vid").alias("vec_b"),
                        F.col("a.embedding").alias("ea"),
                        F.col("b.embedding").alias("eb")))

    if max_bucket_docs is None:
        return _self_join(banded, "band")
    hot = (banded.groupBy("band")
           .agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") > max_bucket_docs)
           .select("band"))
    cold = banded.join(F.broadcast(hot), "band", "left_anti")
    hot_keys = (banded.join(F.broadcast(hot), "band")
                .select("vid", "embedding", "band",
                        F.explode(band_arr).alias("sec"))
                .where(F.col("sec") != F.col("band"))
                .select("vid", "embedding",
                        F.concat("band", F.lit("#"), "sec").alias("key")))
    return _self_join(cold, "band").unionByName(
        _self_join(hot_keys, "key"))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.9,
                        n_bands: int = 8, band_bits: int = 8,
                        id_col: str = "vec_id",
                        round_to: int | None = None,
                        max_bucket_docs: int | None = None) -> DataFrame:
    """(vec_a, vec_b, cos) — pairs with cosine ≥ ``threshold``;
    vec_a < vec_b always. The embedding-cosine member of the dedup
    family (exact / minhash / simhash / jaccard / embedding) — and the
    ONLY embedding near-dup operator in the package (an older
    single-bucket variant in operators/dedup.py was removed; this
    multi-band one strictly dominates it on recall at equal cost).

    Candidates: band ``j`` of a vector is the sign-bit string of
    components ``[j·band_bits, (j+1)·band_bits)``; a pair is a candidate
    iff it agrees on EVERY bit of at least one band (random-hyperplane
    model: a bit agrees w.p. 1 − θ/π, so a band of b bits agrees w.p.
    ≈ (1 − θ/π)^b and B bands give recall ≈ 1 − (1 − p_band)^B — tune
    (n_bands, band_bits) to the threshold). Precision is EXACT (every
    candidate is verified with true cosine); recall is the banding
    probability — same contract as MinHash-LSH in ``operators/dedup``.

    Scale shape: explode to (vector, band) rows, self-join on the band
    bucket, verify inside. One shuffle keyed by band bucket — candidate
    work is Σ bucket² over ACTUAL collisions, never the corpus². Near-
    dup-heavy corpora cluster by construction, so a popular sign
    pattern can still make ONE bucket quadratic at 10⁹+ vectors: pass
    ``max_bucket_docs`` to split over-cap buckets on a (hot band,
    second band) composite key — the automatic guard, preferable to
    the manual recall-changing "raise band_bits" knob. Recall effect:
    a pair whose EVERY shared band is over-cap is found iff it shares
    ≥ 2 bands, i.e. for those pairs recall tightens from
    1 − (1−p)^B to 1 − (1−p)^B − B·p·(1−p)^(B−1); for true near-dups
    p = p_band is close to 1, so the second term is tiny — and pairs
    with any cold shared band are unaffected.

    ``round_to`` rounds the verified cosine before thresholding (set it
    when a cross-engine twin must agree on boundary pairs)."""
    cand = _emb_band_candidates(emb, n_bands, band_bits, id_col,
                                max_bucket_docs) \
        .dropDuplicates(["vec_a", "vec_b"])
    cos = _cos_pair_expr(F.col("ea"), F.col("eb"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (cand.select("vec_a", "vec_b", cos.alias("cos"))
            .where(F.col("cos") >= threshold))


def train_ivf(emb: DataFrame, n_lists: int = 16, seed: int = 7):
    """IVF coarse quantizer: k-means centroids over the embedding column
    (pyspark.ml, seeded). Returns (assigned_df, centroids) where
    ``assigned_df`` carries a ``list_id`` column — the IVF partition key
    when the table is persisted (scan prunes to probed lists)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn(
        "fv", array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))))
    km = KMeans(k=n_lists, seed=seed, featuresCol="fv",
                predictionCol="list_id")
    model = km.fit(vecs)
    assigned = (model.transform(vecs).drop("fv"))
    centroids = [list(c) for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_lists(qvec: list[float], centroids: list[list[float]],
                   n_probe: int, round_to: int | None = None) -> list[int]:
    import math
    nq = math.sqrt(sum(x * x for x in qvec)) or 1.0

    def cos(c):
        dot = sum(a * b for a, b in zip(qvec, c))
        nc = math.sqrt(sum(x * x for x in c)) or 1.0
        v = dot / (nc * nq)
        return round(v, round_to) if round_to is not None else v

    order = sorted(range(len(centroids)),
                   key=lambda i: (-cos(centroids[i]), i))
    return order[:n_probe]


def assign_lists(emb: DataFrame, centroids: list[list[float]],
                 round_to: int = 6) -> DataFrame:
    """IVF assignment against FIXED centroids: ``list_id`` = argmax over
    centroids of cosine(embedding, centroid), ties → lowest index. Pure
    JVM higher-order functions (one fold per centroid), no Python per
    row; cosines are rounded to ``round_to`` decimals so a cross-engine
    twin (DuckDB ``list_cosine_similarity``) lands on the same argmax.

    This is the quantizer-free half of IVF — use ``train_ivf`` when a
    k-means codebook should be learned instead (pytest-verified; k-means
    is not expressible in the ANSI-SQL oracle, fixed centroids are)."""
    cos_arr = F.array(*[F.round(_cos_expr(c), round_to) for c in centroids])
    return emb.withColumn(
        "list_id",
        (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int"))


def ivf_topk(assigned: DataFrame, centroids: list[list[float]],
             qvec: list[float], k: int = 10, n_probe: int = 4,
             round_to: int | None = None) -> DataFrame:
    """(vec_id, cos, rank) — IVF search: rank the ``n_probe`` nearest
    inverted lists driver-side (centroids are tiny), exact cosine inside
    the probed lists only. At 10^9+-vector scale ``list_id`` is the
    table's partition column, so the scan reads n_probe/n_lists of the
    data; recall is tunable via n_probe (=n_lists ⇒ exact).

    ``round_to`` rounds every cosine (probe ranking AND scoring) before
    ordering — set it when a cross-engine twin must reproduce the exact
    probe set and ranks despite last-ulp float divergence."""
    lists = _nearest_lists(qvec, centroids, n_probe, round_to=round_to)
    cos = _cos_expr(qvec)
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (assigned.where(F.col("list_id").isin(lists))
              .select("vec_id", cos.alias("cos")))
    return ranked_topk(scored, _order(), k, key_col="vec_id")


def semdedup(emb: DataFrame, threshold: float = 0.9,
             cluster_col: str = "label", id_col: str = "vec_id",
             round_to: int = 6,
             max_cluster_docs: int | str | None = "auto") -> DataFrame:
    """(id, <cluster_col>, keep, dup_of) — SemDeDup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): within each pre-computed cluster, a vector is a
    semantic duplicate if some LOWER-id vector in the same cluster has
    cosine >= ``threshold``; ``dup_of`` is the smallest such id (NULL on
    keepers). Dominated-by-any-earlier is a single deterministic pass —
    the paper's keep-one-per-near-dup-group policy with the same
    id-ordered tie-break as the exact/minhash/simhash family.

    Cluster assignments come in as a column (the paper k-means them with
    k ≈ sqrt(N); ``train_ivf``/``assign_lists`` produce exactly such a
    column when none exists — the `embeddings` table ships `label`).

    100-TB shape: ONE shuffle on the cluster key, then an exact
    within-cluster pair scan — quadratic in cluster size BY DESIGN
    (SemDeDup's k is chosen so clusters stay ~sqrt-sized; this is the
    verify stage, not a banding stage). ``max_cluster_docs`` is the
    loud guard for skewed clusterings, ON BY DEFAULT: ``"auto"`` counts
    cluster sizes first (one cheap aggregate) and raises when any
    cluster exceeds max(200, 10·sqrt(N)) — a well-clustered corpus at
    the paper's k ≈ sqrt(N) sits far under 10× the mean cluster size —
    instead of launching a quadratic job on a degenerate cluster.
    Re-cluster finer or band (``embedding_near_dups``) on violation.
    Pass an int for an explicit cap, or ``None`` to opt OUT (only for
    inputs whose clustering is already size-bounded upstream).
    """
    if max_cluster_docs is not None:
        stats = (emb.groupBy(cluster_col)
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .agg(F.sum("__n").alias("__total"),
                      F.max(F.struct("__n", cluster_col)).alias("__top"))
                 .collect()[0])
        n_total = int(stats["__total"] or 0)
        if max_cluster_docs == "auto":
            cap = max(200, int(10.0 * n_total ** 0.5))
        else:
            cap = int(max_cluster_docs)
        if n_total and int(stats["__top"]["__n"]) > cap:
            raise ValueError(
                f"semdedup: cluster {stats['__top'][cluster_col]} has "
                f"{stats['__top']['__n']} > max_cluster_docs={cap} "
                "vectors — the within-cluster pair scan would be "
                "quadratic in it; re-cluster finer or use "
                "embedding_near_dups banding (pass max_cluster_docs="
                "None only when cluster sizes are bounded upstream)")
    base = emb.select(F.col(id_col), F.col(cluster_col), "embedding")
    a, b = base.alias("a"), base.alias("b")
    cos = F.round(_cos_pair_expr(F.col("a.embedding"),
                                 F.col("b.embedding")), round_to)
    dominated = (
        a.join(b, (F.col(f"a.{cluster_col}") == F.col(f"b.{cluster_col}"))
               & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")))
        .where(cos >= threshold)
        .groupBy(F.col(f"a.{id_col}").alias(id_col))
        .agg(F.min(F.col(f"b.{id_col}")).alias("__dup")))
    out = base.drop("embedding").join(dominated, id_col, "left")
    return out.select(
        id_col, cluster_col,
        F.col("__dup").isNull().alias("keep"),
        F.col("__dup").cast("long").alias("dup_of"))
