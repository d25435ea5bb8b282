"""Deduplication operators — the training-data-pipeline family.

* exact            md5 content-hash groupBy (F1)
* simhash banded   the reference's near-dup check (Crawler.py:209-213, J3)
                   re-expressed as an LSH-style band join: the O(N²)
                   nested loop becomes band-equality buckets + bit_count
                   verify — linear shuffle, never a crossJoin
* minhash LSH      shingle → md5-minhash → banded bucket join
* ngram jaccard    shared-shingle candidate pairs + exact jaccard verify
* connected components  transitive closure over verified pair tables
                   (large-star/small-star — near-dup chains collapse to
                   one canonical survivor per component)

Each returns candidate/confirmed pairs as DataFrames; the contract
(contract.py) exposes the documents-table variants with DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 128-bit simhash lives in two longs (sim_hi, sim_lo). Band each long
# into ``64 // band_bits`` chunks: pairs at hamming distance < n_bands
# must share ≥1 band (pigeonhole), so the band join finds every pair the
# distance filter would keep.
#
# band_bits trades bucket count against recall guarantee:
#   16 (default) → 8 bands, 2^16 buckets/band, guarantees distance < 8
#   32           → 4 bands, 2^32 buckets/band, guarantees distance < 4
# At 10^12 docs the 16-bit banding leaves ~10^7 docs per bucket and the
# within-bucket pairing goes quadratic. band_bits=32 multiplies the
# bucket space by 65536× but its 4 bands only support max_distance ≤ 4
# (the assert below enforces this) — NOT the reference's hamming < 5
# (Crawler.py:209-213, max_distance=5, needs ≥ 5 bands). For that
# threshold at extreme scale, keep 16-bit bands and pass
# ``max_bucket_docs``: band buckets over the cap are re-joined on a
# (band, second-shared-band) composite key instead of the band alone —
# sub-bucket size is |bucket_b ∩ bucket_s|, and recall stays EXACT
# because a pair within max_distance ≤ n_bands − 1 shares ≥ 2 bands
# (pigeonhole), so it meets on (hot band, some other shared band).


def _bands(col: str, prefix: str, band_bits: int):
    n = 64 // band_bits
    mask = (1 << band_bits) - 1
    out = []
    for i in range(n):
        out.append(
            F.concat(F.lit(f"{prefix}{i}:"),
                     (F.shiftright(F.col(col), i * band_bits)
                      .bitwiseAND(F.lit(mask))).cast("string")))
    return out


def _sim_band_candidates(sh: DataFrame, band_bits: int,
                         max_bucket_docs: int | None) -> DataFrame:
    """Candidate pairs (a.*, b.*) from the band join, pre-verify.

    ``max_bucket_docs`` splits hot band buckets: docs in a bucket over
    the cap are re-keyed on (hot band, each OTHER band of the doc) and
    self-joined on that composite key, so the within-bucket pairing is
    bounded by the two-band intersection size instead of the hot
    bucket's square. Factored out so tests can count candidates."""
    band_arr = F.array(*_bands("sim_hi", "h", band_bits),
                       *_bands("sim_lo", "l", band_bits))
    banded = sh.select("doc_id", "sim_hi", "sim_lo",
                       F.explode(band_arr).alias("band"))

    def _self_join(p: DataFrame, key: str) -> DataFrame:
        a, b = p.alias("a"), p.alias("b")
        return (a.join(b, (F.col(f"a.{key}") == F.col(f"b.{key}"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"),
                        F.col("a.sim_hi").alias("a_hi"),
                        F.col("a.sim_lo").alias("a_lo"),
                        F.col("b.sim_hi").alias("b_hi"),
                        F.col("b.sim_lo").alias("b_lo")))

    if max_bucket_docs is None:
        return _self_join(banded, "band")
    hot = (banded.groupBy("band")
           .agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") > max_bucket_docs)
           .select("band"))
    cold = banded.join(F.broadcast(hot), "band", "left_anti")
    # hot branch: every doc of a hot bucket re-keyed by (hot band, one
    # of its other bands). A qualifying pair shares ≥ 2 bands, so if
    # its shared band b is hot it also shares some s ≠ b and both docs
    # emit key (b, s).
    hot_keys = (banded.join(F.broadcast(hot), "band")
                .select("doc_id", "sim_hi", "sim_lo", "band",
                        F.explode(band_arr).alias("sec"))
                .where(F.col("sec") != F.col("band"))
                .select("doc_id", "sim_hi", "sim_lo",
                        F.concat("band", F.lit("|"), "sec").alias("key")))
    return _self_join(cold, "band").unionByName(
        _self_join(hot_keys, "key"))


def simhash_near_dups(docs: DataFrame, max_distance: int = 5,
                      band_bits: int = 16,
                      max_bucket_docs: int | None = None) -> DataFrame:
    """(doc_a, doc_b, distance) — hamming(simhash) < max_distance
    (Crawler.py:209-213 semantics, ``hamming < 5``).

    Requires ``max_distance ≤ 128 // band_bits`` (pigeonhole: a pair at
    distance ≤ n_bands − 1 has some band untouched by the differing
    bits). ``band_bits`` must divide 64.

    ``max_bucket_docs`` enables the hot-bucket secondary split (exact —
    no recall loss) and additionally requires
    ``max_distance ≤ n_bands − 1`` so every qualifying pair shares two
    bands; at the boundary ``max_distance == n_bands`` a pair may share
    only one band and a split of that band could lose it.
    """
    n_bands = 128 // band_bits
    assert 64 % band_bits == 0, "band_bits must divide 64"
    assert max_distance <= n_bands, (
        f"max_distance {max_distance} needs ≥ {max_distance} bands; "
        f"band_bits={band_bits} gives only {n_bands}")
    assert max_bucket_docs is None or max_distance <= n_bands - 1, (
        f"hot-bucket split needs max_distance ≤ {n_bands - 1} "
        f"(pairs must share ≥ 2 bands); got {max_distance}")
    sh = docs.select("doc_id", "sim_hi", "sim_lo")
    cand = _sim_band_candidates(sh, band_bits, max_bucket_docs)
    dist = (F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
            + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo"))))
    return (
        cand
        .select("doc_a", "doc_b", dist.alias("distance"))
        .where(F.col("distance") < max_distance)
        .distinct()
    )


def jaccard_near_dups(shingles: DataFrame, threshold: float | None = 0.2,
                      max_shingle_df: int | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) — n-gram Jaccard near-dup pairs from a
    (doc_id, sh) distinct-shingle table: candidate pairs via shared
    shingle (inverted-index prefilter, never O(N²)), exact
    |∩|/|∪| verify.

    ``max_shingle_df`` drops shingles present in more than that many
    docs BEFORE the self-join. Without it one ubiquitous shingle makes
    the equi-join quadratic in its group — the canonical scale-killer
    (df 10^6 ⇒ 10^12 candidate rows from a single shingle). Sizes and
    intersections are both computed over the FILTERED shingle space, so
    the jaccard stays a well-defined similarity (over informative
    shingles — the same rationale as stopword removal); with the cap
    above the corpus's max df it is exactly the unfiltered jaccard.
    """
    if max_shingle_df is not None:
        hot = (shingles.groupBy("sh")
               .agg(F.count(F.lit(1)).alias("df"))
               .where(F.col("df") > max_shingle_df)
               .select("sh"))
        # broadcast anti-join: the hot-shingle list is tiny by definition
        shingles = shingles.join(F.broadcast(hot), "sh", "left_anti")
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "nb"), "doc_b")
        .select("doc_a", "doc_b",
                (F.col("inter").cast("double")
                 / (F.col("na") + F.col("nb") - F.col("inter")))
                .alias("jaccard"))
    )
    if threshold is not None:
        out = out.where(F.col("jaccard") >= threshold)
    return out


def minhash_signatures(shingles: DataFrame, n_hashes: int = 8) -> DataFrame:
    """(doc_id, h0..h{n-1}) — md5 minhash signature per doc over its
    distinct-shingle set (hash family = md5 of an index-salted shingle;
    min per doc). One groupBy — the signature build is a single shuffle
    however many hash functions are used."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")).cast("binary")))
        .alias(f"h{i}") for i in range(n_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def minhash_band_keys(n_hashes: int, n_bands: int):
    """array<string> of LSH band keys ``'j|h_a|h_b…'`` over a signature
    row's h0..h{n-1} columns — THE band construction, shared by the
    self-join LSH here, ``crossdedup.dedup_against`` and
    ``decontam.find_contaminated_fuzzy`` (and restated 1:1 in their
    DuckDB twins — change it in lockstep)."""
    rows = n_hashes // n_bands
    assert rows * n_bands == n_hashes, "n_bands must divide n_minhash"
    return F.array(*[
        F.concat_ws("|", F.lit(str(j)),
                    *[F.col(f"h{rows * j + r}") for r in range(rows)])
        for j in range(n_bands)
    ])


def banded_ids(sig: DataFrame, name: str, n_hashes: int,
               n_bands: int) -> DataFrame:
    """signature table → (``name``, band) exploded band-key rows."""
    return sig.select(F.col("doc_id").alias(name),
                      F.explode(minhash_band_keys(n_hashes, n_bands))
                      .alias("band"))


def lsh_band_pairs(sig: DataFrame, n_hashes: int = 8,
                   n_bands: int = 4) -> DataFrame:
    """(doc_a, doc_b) — docs whose minhash signatures share any band
    bucket (bands of ``n_hashes // n_bands`` rows). The near-dup scale
    path: the only shuffle is by band bucket — never all-pairs.
    Probability a pair at jaccard s collides ≈ 1-(1-s^r)^b. Pass a
    ``.cache()``d sig when the caller reuses it (both join sides read
    the banded projection)."""
    bd = banded_ids(sig, "doc_id", n_hashes, n_bands)
    a, b = bd.alias("a"), bd.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(shingles: DataFrame, n_hashes: int = 8,
                      n_bands: int = 4) -> DataFrame:
    """(doc_a, doc_b) — MinHash+LSH candidate pairs straight from a
    (doc_id, sh) shingle table: signature build + band join."""
    return lsh_band_pairs(minhash_signatures(shingles, n_hashes),
                          n_hashes, n_bands)


def exact_dups(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_docs, doc_ids) — exact-duplicate clusters."""
    return (df.select(F.md5(F.col(text_col).cast("binary"))
                      .alias("text_md5"), F.col(id_col))
            .groupBy("text_md5")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .where(F.col("n_docs") > 1))


def _skew_safe_min_join(rows: DataFrame, mins: DataFrame, key: str,
                        hot_cap: int) -> DataFrame:
    """``rows ⋈ mins`` on ``key`` where ``mins`` carries (key, m, n):
    keys whose group size exceeds ``hot_cap`` are joined via a
    BROADCAST of the (tiny — ≤ total_rows/hot_cap entries) hot subset,
    map-side, while the rest take the normal shuffle join. This is the
    mega-component guard: AQE's skew-join CANNOT split this shape (its
    rule only matches SMJ over two bare shuffle stages, and the mins
    side has a post-shuffle aggregate — verified empirically), so at
    10^12-edge scale the component hub's min-label join would otherwise
    funnel the whole giant component through one task."""
    hot = mins.where(F.col("n") > hot_cap).drop("n")
    cold = (rows.join(F.broadcast(hot.select(key)), key, "left_anti")
            .join(mins.drop("n"), key))
    return cold.unionByName(rows.join(F.broadcast(hot), key))


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 25,
                         hot_key_rows: int = 2_000_000) -> DataFrame:
    """(node, component) for every node that appears in ``edges``;
    ``component`` is the smallest node id in the node's connected
    component (so exact duplicates of transitivity chains a~b~c collapse
    to one canonical survivor even when a≁c directly).

    Alternating large-star / small-star label propagation (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC 2014):
    each round is two groupBy-join passes over the current edge set —
    hash shuffles keyed by node, no global sort, no driver-side graph —
    and the edge set contracts toward a star per component in
    O(log² n) rounds. Works for any orderable id type (string md5 ids
    order lexicographically).

    ``hot_key_rows`` caps the rows any single min-label join key may
    route through the shuffle: beyond it the key's min is broadcast and
    its rows are joined map-side (``_skew_safe_min_join``), so a
    component spanning most of the corpus never becomes a single
    straggler task (property-tested with a 90%-of-nodes component).

    Per-round ``localCheckpoint`` truncates the iterative plan lineage
    (the canonical Spark iterative-algorithm hazard: without it every
    round's plan embeds all prior rounds and analysis time explodes);
    on a cluster with executor loss concerns use reliable
    ``checkpoint`` instead. Convergence is detected by a count +
    order-insensitive hash-sum checksum of the canonical (big→small)
    edge set — one tiny aggregation job per round — and then CONFIRMED
    exactly (``exceptAll`` emptiness against the previous round's edge
    set, one extra job on the final contracted edges): a 2⁻⁶⁴ checksum
    collision between distinct consecutive edge sets can therefore
    never silently terminate the loop early.
    """
    # checkpoint the input once: the edge plan is often an expensive
    # derivation (e.g. the shingle self-join pair graph) and the first
    # round's star passes would otherwise re-execute it several times
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")).distinct()
         .localCheckpoint(eager=True))
    prev_chk, prev_e, converged = None, None, False
    for _ in range(max_iter):
        # large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u}).
        # The min aggregation is algebraic (map-side partial absorbs any
        # hub fan-in); the join back is the skew hazard — a giant
        # component's hub key holds most of sym in late rounds — so keys
        # over hot_key_rows take the broadcast branch of
        # _skew_safe_min_join instead of one monster shuffle partition.
        sym = e.union(e.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        mins = (sym.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m"),
                     F.count(F.lit(1)).alias("n")))
        e = (_skew_safe_min_join(sym.where(F.col("v") > F.col("u")),
                                 mins, "u", hot_key_rows)
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .where(F.col("u") != F.col("v")).distinct())
        # small-star: direct edges big→small; every smaller neighbor and
        # u itself link to m = min(N⁻(u)). Same hot-key guard: a
        # high-degree node whose id EXCEEDS its neighbors' keys all its
        # edges here.
        d = e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"),
                                  F.count(F.lit(1)).alias("n"))
        e = (_skew_safe_min_join(d, mins, "u", hot_key_rows)
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .where(F.col("u") != F.col("v"))
             .union(mins.select(F.col("u"), F.col("m").alias("v")))
             .distinct()
             .localCheckpoint(eager=True))
        chk = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a bigint sum of 64-bit hashes
            # overflows (ANSI would raise ARITHMETIC_OVERFLOW)
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
            .alias("h")).collect()[0]
        chk = (chk["n"], chk["h"])
        if chk == prev_chk:
            # exact confirmation: counts already match, so one-sided
            # multiset difference emptiness ⇔ the edge sets are equal —
            # a checksum collision cannot cause silent early exit
            if e.exceptAll(prev_e).isEmpty():
                converged = True
                break
        prev_chk, prev_e = chk, e
    if not converged:
        # a non-fixpoint edge set is not a star per component — nodes
        # could carry multiple, non-minimal labels. Refuse loudly rather
        # than hand back a silently-wrong mapping (O(log² n) rounds
        # suffice: 25 covers any graph the id space can address).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds; raise max_iter")
    # converged: every edge is (node → component min); roots appear only
    # on the v side and map to themselves
    roots = e.select(F.col("v").alias("u"),
                     F.col("v").alias("component")).distinct()
    return (e.select("u", F.col("v").alias("component")).union(roots)
            .distinct()
            .select(F.col("u").alias("node"), "component"))


# embedding-cosine near-dup lives in operators/similarity.py
# (embedding_near_dups — multi-band sign-LSH + exact verify, with the
# same hot-bucket composite-band split simhash has). An older single-
# full-vector-bucket variant here was removed: two near-same-named
# operators with different recall contracts were a user trap, and the
# multi-band one strictly dominates on recall at equal cost.


def duplicated_gram_fraction(shingles: DataFrame,
                             id_col: str = "doc_id",
                             sh_col: str = "sh",
                             min_df: int = 2) -> DataFrame:
    """(id_col, n_shingles, dup_fraction) — the fraction of a document's
    distinct shingles that also occur in >= ``min_df`` documents
    corpus-wide. The cross-document cousin of
    quality.repetition_ratio_expr (which is intra-document): a high
    value flags template/boilerplate pages whose *content* is mostly
    shared even when no single other document is a near-duplicate —
    exactly the tail that pairwise dedup (jaccard/minhash/simhash)
    misses. Inspired by the duplicate-n-gram statistics of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better").

    100-TB shape: one map-side-combinable groupBy for shingle df, one
    shuffle join back on the shingle key, one groupBy per doc. A
    ubiquitous shingle contributes one df row and a wide-but-flat join
    group — never a self-join blow-up (there is no pair output here).
    """
    df = (shingles.groupBy(sh_col)
          .agg(F.count(F.lit(1)).alias("__df")))
    tagged = shingles.join(df, sh_col)
    return (tagged.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.round(
                     F.sum(F.when(F.col("__df") >= min_df, 1)
                           .otherwise(0)).cast("double")
                     / F.count(F.lit(1)), 6).alias("dup_fraction")))


def keep_best_representative(components: DataFrame, quality: DataFrame,
                             comp_col: str = "component",
                             id_col: str = "doc_id",
                             score_col: str = "score") -> DataFrame:
    """(component, keep_doc_id, keep_score, n_members) — pick ONE
    canonical document per near-duplicate cluster: the highest
    ``score_col`` (longest / highest-quality), ties broken by smallest
    id so the choice is deterministic on any engine or layout.

    This is the step that turns the pair/component machinery
    (jaccard_near_dups → connected_components) into an actual
    deduplicated corpus: keep the representative, drop the rest.

    100-TB shape: a single map-side-combinable max-of-struct
    aggregation per component — no window over the corpus, no sort.
    The (score, -id) struct max is the distributed argmax; a
    corpus-wide row_number() would range-shuffle every row instead.
    """
    j = components.join(quality, id_col).select(
        comp_col,
        F.struct(F.col(score_col).alias("s"),
                 (-F.col(id_col)).alias("negid")).alias("__best"))
    return (j.groupBy(comp_col)
            .agg(F.max("__best").alias("b"),
                 F.count(F.lit(1)).alias("n_members"))
            .select(comp_col,
                    (-F.col("b.negid")).alias("keep_doc_id"),
                    F.col("b.s").alias("keep_score"),
                    "n_members"))
