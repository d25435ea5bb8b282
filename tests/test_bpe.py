"""BPE train/encode/count vs an independent naive reference (string-
join + regex merging — a structurally different implementation of
Sennrich et al.'s algorithm), plus corpus-side aggregation checks.
The distributed round-1 twin lives in test_contract_oracle.py
(bpe_pair_counts)."""

import re

import pytest

from modern_search_engines_spark.functions import bpe


# --- independent naive reference (test-local, recomputes everything
# from scratch each round over space-joined symbol strings) ----------

def ref_train(word_freqs: dict[str, int], n_merges: int):
    vocab = {" ".join(list(w) + ["</w>"]): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for s, c in vocab.items():
            syms = s.split(" ")
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat = re.compile(r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)")
        vocab = {pat.sub("".join(best), s): c for s, c in vocab.items()}
        agg = {}
        for s, c in vocab.items():
            agg[s] = agg.get(s, 0) + c
        vocab = agg
    return merges


def ref_encode(word: str, merges) -> list[str]:
    s = " ".join(list(word) + ["</w>"])
    for a, b in merges:  # rank order — for each rank, merge exhaustively
        pat = re.compile(r"(?<!\S)" + re.escape(f"{a} {b}") + r"(?!\S)")
        while True:
            s2 = pat.sub(a + b, s)
            if s2 == s:
                break
            s = s2
    return s.split(" ")


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTraining:
    def test_merges_match_naive_reference(self, spark):
        text = " ".join(w for w, c in SENNRICH.items() for _ in range(c))
        words = bpe.word_counts(_docs(spark, [(0, text)]))
        merges, stats = bpe.train_bpe(words, n_merges=10)
        assert merges == ref_train(SENNRICH, 10)
        assert stats["word_mass_covered"] == stats["word_mass_total"] \
            == sum(SENNRICH.values())

    def test_first_merge_is_the_top_pair_count(self, spark):
        text = " ".join(w for w, c in SENNRICH.items() for _ in range(c))
        d = _docs(spark, [(0, text)])
        words = bpe.word_counts(d)
        merges, _ = bpe.train_bpe(words, n_merges=1)
        top = (bpe.pair_counts(words)
               .orderBy("cnt", ascending=False).collect())
        best = min(((-r["cnt"], r["pair"]) for r in top))[1]
        assert " ".join(merges[0]) == best

    def test_max_words_cap_is_loud(self, spark):
        d = _docs(spark, [(0, "aa bb cc dd"), (1, "aa aa bb")])
        words = bpe.word_counts(d)
        _, stats = bpe.train_bpe(words, n_merges=2, max_words=2)
        assert stats["n_words_used"] == 2
        assert stats["word_mass_covered"] < stats["word_mass_total"]

    def test_determinism_under_repartition(self, spark):
        text = "banana bandana cabana banana bandana banana"
        d = _docs(spark, [(0, text)])
        w1 = bpe.word_counts(d)
        w2 = bpe.word_counts(d.repartition(7))
        assert bpe.train_bpe(w1, 5)[0] == bpe.train_bpe(w2, 5)[0]


class TestEncoding:
    @pytest.fixture(scope="class")
    def merges(self, spark):
        text = " ".join(w for w, c in SENNRICH.items() for _ in range(c))
        return bpe.train_bpe(
            bpe.word_counts(_docs(spark, [(0, text)])), 8)[0]

    def test_encode_word_matches_reference(self, merges):
        for w in list(SENNRICH) + ["lowest", "newer", "wide", "zzz"]:
            assert bpe.encode_word(w, {p: i for i, p in
                                       enumerate(merges)}) \
                == ref_encode(w, merges), w

    def test_tokens_reassemble_the_word(self, merges):
        ranks = {p: i for i, p in enumerate(merges)}
        for w in ["newest", "slowest", "q"]:
            assert "".join(bpe.encode_word(w, ranks)) == w + "</w>"

    def test_dataframe_encode_and_count(self, spark, merges):
        d = _docs(spark, [(0, "low newest"), (1, ""), (2, "newest  low")])
        enc = {r["doc_id"]: r["bpe_tokens"]
               for r in bpe.bpe_encode(d, merges).collect()}
        cnt = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe.bpe_token_count(d, merges).collect()}
        assert enc[0] == ref_encode("low", merges) \
            + ref_encode("newest", merges)
        assert enc[1] == []
        assert enc[2] == ref_encode("newest", merges) \
            + ref_encode("low", merges)  # double space adds nothing
        for i in (0, 1, 2):
            assert cnt[i] == len(enc[i])
        assert cnt[2] == cnt[0]  # double space adds nothing
