"""Byte-pair-encoding tokenizer — train, encode, count.

A training-data pipeline budgets corpora in TOKENS UNDER THE TRAINING
TOKENIZER, not whitespace words (the regex counter in
``operators/quality.py`` is the cheap screen; this is the exact one).
Classic word-level BPE (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from characters
plus an end-of-word marker, repeatedly merge the most frequent adjacent
symbol pair.

100-TB shape — the trick is that BPE training NEVER iterates over the
corpus:

1. one map-combinable ``groupBy(word)`` collapses the corpus to its
   word-frequency table (Zipf: ~10^6-10^7 distinct words for web text —
   five orders of magnitude smaller than the corpus, and the ONLY
   corpus-wide pass in training);
2. the merge loop runs over the top ``max_words`` rows of that table —
   the standard practical approximation (a 200k-word cap covers ~all
   token mass of a Zipf corpus; the dropped tail is reported loudly in
   the returned stats, never silently);
3. encoding broadcasts the merge ranks (n_merges pairs ≈ a few MB at
   GPT-2's 50k) and runs as one Arrow-batched pandas UDF with a
   per-batch word memo — Zipf again: a 10k-row batch has far fewer
   distinct words than words, so the greedy merge loop runs once per
   DISTINCT word per batch.
"""

from __future__ import annotations

import pandas as pd  # module-global: pandas_udf resolves the hints here

from pyspark.sql import DataFrame, functions as F

END_OF_WORD = "</w>"


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) — whitespace word frequencies, empties dropped. The
    single corpus-wide pass of BPE training (map-side combinable)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    return (docs.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def pair_counts(words: DataFrame) -> DataFrame:
    """(pair, cnt) — frequency-weighted adjacent symbol pairs of the
    FIRST merge round (symbols = characters + the end-of-word marker),
    straight from a (word, cnt) table. Pure column expressions — this
    is the distributed half of one training round, and the contract
    twin for the merge loop below (later rounds only re-pair the words
    a merge touched, which the local loop does incrementally)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1))
    syms = F.concat(chars, F.array(F.lit(END_OF_WORD)))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.concat(F.element_at(syms, i), F.lit(" "),
                           F.element_at(syms, i + 1)))
    return (words.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair").agg(F.sum("cnt").cast("long").alias("cnt")))


def train_bpe(words: DataFrame, n_merges: int,
              max_words: int = 200_000
              ) -> tuple[list[tuple[str, str]], dict]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) table.

    Returns (merges, stats): merges ordered by learn rank (apply order
    at encode time); stats reports the word-mass coverage of the
    ``max_words`` cap so the approximation is loud. Ties break
    deterministically: highest pair count, then lexicographically
    smallest pair — layout/partitioning never changes the result."""
    # two actions read the word table (top-k collect + total mass);
    # persist so the corpus-wide groupBy underneath runs once
    words = words.persist()
    top = (words.orderBy(F.desc("cnt"), "word").limit(max_words)
           .collect())
    total = words.agg(F.sum("cnt")).collect()[0][0] or 0
    words.unpersist()
    covered = sum(r["cnt"] for r in top)
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (END_OF_WORD,): r["cnt"] for r in top}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + cnt
        vocab = nxt
    stats = {"n_words_used": len(top), "word_mass_covered": covered,
             "word_mass_total": total, "n_merges": len(merges)}
    return merges, stats


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-priority BPE encode of one word (lowest learn rank
    merges first — the canonical apply order)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b), -1), i)
                 for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        cands = [(r, i) for r, i in pairs if r >= 0]
        if not cands:
            break
        _, i = min(cands)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """docs + ``out_col`` array<string> of BPE tokens. One Arrow-batched
    pandas UDF; the merge ranks ride the closure (broadcast once per
    executor), and a per-batch memo collapses repeated words."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_text(t):
            out = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(enc_text)

    return docs.withColumn(out_col, _enc(F.col(text_col)))


def bpe_token_count(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> DataFrame:
    """(id, n_bpe_tokens) — exact token budget under the trained
    tokenizer. Same UDF shape as ``bpe_encode`` but only the count
    crosses Arrow (narrow output for the 100-TB scan)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def _cnt(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count_text(t):
            n = 0
            for w in (t or "").split(" "):
                if not w:
                    continue
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    memo[w] = c
                n += c
            return n

        return texts.map(count_text)

    return docs.select(F.col(id_col),
                       _cnt(F.col(text_col)).alias("n_bpe_tokens"))
