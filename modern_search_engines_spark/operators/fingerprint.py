"""Document fingerprinting via rolling-hash winnowing (MOSS-style).

Training-data-pipeline operator: robust near-dup / provenance
fingerprints that survive insertions and reorderings better than a
whole-document hash. Public algorithm (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):

1. normalize text → character stream;
2. Rabin-Karp rolling hash over k-grams (k=KGRAM);
3. winnowing: slide a window of W hashes, keep each window's minimum
   (rightmost on ties) — guarantees any match ≥ W+k-1 chars shares a
   fingerprint;
4. a document's fingerprint set = the selected (hash, position) values.

Spark shape: one Arrow-batched pandas UDF produces the fingerprint
array per doc (numpy rolling hash — no per-char python); candidate
pairs come from an exploded equi-join on fingerprint values — the same
inverted-index prefilter shape as the shingle/minhash paths, never a
cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

KGRAM = 8
WINDOW = 4
_BASE = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)  # keep hashes positive in int64


def winnow_fingerprints(text: str, k: int = KGRAM,
                        w: int = WINDOW) -> list[int]:
    """Winnowed rolling-hash fingerprint set (sorted, distinct)."""
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        return []
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n < k:
        return []
    # Rabin-Karp: h[i] = sum b[i+j] * BASE^(k-1-j) mod 2^64, masked
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is intended
        powers = np.empty(k, dtype=np.uint64)
        powers[k - 1] = np.uint64(1)
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _BASE
        # windows via stride trick, then weighted sum
        idx = np.arange(n - k + 1)[:, None] + np.arange(k)[None, :]
        hashes = (b[idx] * powers[None, :]).sum(axis=1,
                                                dtype=np.uint64) & _MASK
    if hashes.size <= w:
        return sorted({int(hashes.min())})
    # winnow: min of each window of w hashes, rightmost on ties
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    rev_arg = w - 1 - np.argmin(win[:, ::-1], axis=1)  # rightmost min
    picked = win[np.arange(win.shape[0]), rev_arg]
    return sorted(set(int(x) for x in picked))


def fingerprint_docs(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp array<long>) — winnowed fingerprints per doc."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow_fingerprints(t))

    return docs.select(F.col(id_col).alias("doc_id"),
                       fp(F.col(text_col)).alias("fp"))


def fingerprint_near_dups(docs: DataFrame, min_shared: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, n_shared) — pairs sharing ≥ min_shared winnowed
    fingerprints. Equi-join on fingerprint value (inverted-index
    prefilter; shuffle is by fingerprint, never all-pairs)."""
    fps = fingerprint_docs(docs, text_col, id_col).select(
        "doc_id", F.explode("fp").alias("h"))
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))
