"""Corpus-size scale curve for the curation family (span_dedup,
semdedup, lm_perplexity, c4_filters) — the same 10×-steps protocol the
index build was curved with (BASELINE.md "Scale datapoint" sections):
run each operator at N and 10N (and optionally 100N) rows of a
DETERMINISTIC synthetic documents/embeddings table, bracketed by
re-running the smallest size before AND after the big sizes so machine
weather is visible, and print per-(operator, N) wall seconds as one
JSON line.

The synthetic tables are generated DISTRIBUTED (spark.range + JVM hash
expressions, no driver loop, no Python UDF) and mirror the driver
testdata shapes: documents(doc_id, text, lang, source, n_chars) with
~60 whitespace tokens/doc over a 2000-word vocabulary and a planted
corpus-wide 25-token boilerplate prefix on every 5th doc (so
ExactSubstr span dedup has real work at every scale), and
embeddings(vec_id, embedding float[64], label) with FIXED ~200-vector
clusters — #clusters grows with N, cluster size does not, which is the
deployment shape SemDeDup's k is chosen for (and keeps the
within-cluster pair scan LINEAR in N; letting clusters grow as sqrt(N)
is the paper's N^1.5 curve, a property of the parameter choice, not of
this implementation).

    python scripts/scale_curve_curation.py [--sizes 5000,50000,500000]
        [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BOILERPLATE = " ".join(f"bp{i}" for i in range(25))
CLUSTER_SIZE = 200
VOCAB = 2000


def synth_documents(spark, n: int):
    from pyspark.sql import functions as F
    did = F.col("id")
    n_words = (40 + F.pmod(F.xxhash64(did, F.lit("len")), 40)).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(F.lit("w"),
                           F.pmod(F.xxhash64(did, i), VOCAB)))
    body = F.concat_ws(" ", words)
    text = F.when(did % 5 == 0,
                  F.concat(F.lit(BOILERPLATE + " "), body)).otherwise(body)
    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "it")])
    return (spark.range(n, numPartitions=64).select(
        did.alias("doc_id"), text.alias("text"),
        F.element_at(langs, (F.pmod(did, 5) + 1).cast("int")).alias("lang"),
        F.concat(F.lit("src"), F.pmod(did, 20)).alias("source"))
        .withColumn("n_chars", F.length("text")))


def synth_embeddings(spark, n: int):
    from pyspark.sql import functions as F
    vid = F.col("id")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: ((F.pmod(F.xxhash64(vid, j), 2000001) / 1000000.0)
                   - F.lit(1.0)).cast("float"))
    return spark.range(n, numPartitions=64).select(
        vid.alias("vec_id"), emb.alias("embedding"),
        F.floor(vid / CLUSTER_SIZE).cast("int").alias("label"))


def run_ops(spark, docs_path: str, emb_path: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from modern_search_engines_spark.operators import (
        c4filters, lmfilter, similarity, spandedup)

    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    out: dict[str, float] = {}

    def timed(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()

    timed("span_dedup", spandedup.remove_duplicate_spans(docs, k=20)
          .select("doc_id", "n_tokens_after",
                  F.md5(F.col("clean_text").cast("binary"))))
    timed("c4_filters", c4filters.c4_quality_filters(
        docs.select("doc_id",
                    F.regexp_replace("text", r"(\w+ \w+ \w+ \w+ \w+ \w+)",
                                     "$1.\n").alias("text"))))
    timed("lm_perplexity", lmfilter.lm_score(docs))
    timed("semdedup", similarity.semdedup(emb, threshold=0.9))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import shutil
    import tempfile

    from modern_search_engines_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="mse_scale_")
    results: list[dict] = []
    try:
        spark = get_spark("scale-curve", master=f"local[{args.cpus}]",
                          shuffle_partitions=args.cpus * 2)
        try:
            for n in sizes:
                dp, ep = f"{work}/docs{n}", f"{work}/emb{n}"
                synth_documents(spark, n).write.parquet(dp)
                synth_embeddings(spark, n).write.parquet(ep)
                # warm the page cache untimed (gVisor cold-read penalty)
                spark.read.parquet(dp).write.format("noop") \
                    .mode("overwrite").save()
                spark.read.parquet(ep).write.format("noop") \
                    .mode("overwrite").save()
            # bracketing: smallest size before AND after the big sizes
            plan = [sizes[0], *sizes[1:], sizes[0]]
            for n in plan:
                r = run_ops(spark, f"{work}/docs{n}", f"{work}/emb{n}")
                results.append({"n_docs": n, **r})
                print(json.dumps(results[-1]), flush=True)
        finally:
            spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"curve": results}))


if __name__ == "__main__":
    main()
