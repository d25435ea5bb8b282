"""Deduplication operators — the training-data-pipeline family.

* exact            md5 content-hash groupBy (F1)
* simhash banded   the reference's near-dup check (Crawler.py:209-213, J3)
                   re-expressed as an LSH-style band join: the O(N²)
                   nested loop becomes band-equality buckets + bit_count
                   verify — linear shuffle, never a crossJoin
* minhash LSH      shingle → md5-minhash → banded bucket join
* ngram jaccard    shared-shingle candidate pairs + exact jaccard verify
* embedding cosine near-dup via sign-bit LSH buckets + cosine verify

Each returns candidate/confirmed pairs as DataFrames; the contract
(contract.py) exposes the documents-table variants with DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 128-bit simhash lives in two longs (sim_hi, sim_lo). Band it into 8
# 16-bit chunks: equal-hamming-≤K pairs must share ≥1 band when K < 8
# (pigeonhole), so the band join finds every pair with distance < 8.
_N_BANDS_PER_LONG = 4


def _bands(col: str, prefix: str):
    out = []
    for i in range(_N_BANDS_PER_LONG):
        out.append(
            F.concat(F.lit(f"{prefix}{i}:"),
                     (F.shiftright(F.col(col), i * 16)
                      .bitwiseAND(F.lit(0xFFFF))).cast("string")))
    return out


def simhash_near_dups(docs: DataFrame, max_distance: int = 5) -> DataFrame:
    """(doc_a, doc_b, distance) — hamming(simhash) < max_distance
    (Crawler.py:209-213 semantics, ``hamming < 5``).

    Requires max_distance ≤ 8 for the 8-band pigeonhole guarantee.
    """
    assert max_distance <= 8
    sh = docs.select("doc_id", "sim_hi", "sim_lo")
    banded = sh.select(
        "doc_id", "sim_hi", "sim_lo",
        F.explode(F.array(*_bands("sim_hi", "h"),
                          *_bands("sim_lo", "l"))).alias("band"))
    a, b = banded.alias("a"), banded.alias("b")
    dist = (F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
            + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo"))))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                dist.alias("distance"))
        .where(F.col("distance") < max_distance)
        .distinct()
    )


def exact_dups(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_docs, doc_ids) — exact-duplicate clusters."""
    return (df.select(F.md5(F.col(text_col).cast("binary"))
                      .alias("text_md5"), F.col(id_col))
            .groupBy("text_md5")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
            .where(F.col("n_docs") > 1))


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        n_bits: int = 12) -> DataFrame:
    """(vec_a, vec_b, cos) — cosine ≥ threshold, candidates from sign-bit
    LSH buckets (recall-limited prefilter; exact verify inside bucket)."""
    bits = F.concat(*[
        F.when(F.element_at("embedding", i) >= 0, F.lit("1"))
        .otherwise(F.lit("0")) for i in range(1, n_bits + 1)
    ])
    e = emb.select("vec_id", "embedding", bits.alias("bucket"))
    a, b = e.alias("a"), e.alias("b")
    ea = F.transform(F.col("a.embedding"), lambda x: x.cast("double"))
    eb = F.transform(F.col("b.embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(ea, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(eb, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                (dot / (na * nb)).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
