"""Round-3 training-mix operators: benchmark decontamination, sequence
packing, per-stratum quota caps. Cross-engine twins live in
test_contract_oracle.py; these pin semantics on hand-built corpora."""

import pytest
from pyspark.sql import functions as F

from modern_search_engines_spark.operators import decontam, packing, sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontam:
    def test_flags_exact_ngram_overlap_only(self, spark):
        d = _docs(spark, [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a totally different document about spark engines"),
            (2, "quick brown fox jumps over the lazy cat instead"),
        ])
        ev = spark.createDataFrame(
            [("benchmark says quick brown fox jumps over the lazy dog",)],
            "text string")
        hits = {r["doc_id"]: r["n_hits"] for r in
                decontam.find_contaminated(d, ev, n=6).collect()}
        assert 0 in hits            # shares 6-grams with the benchmark
        assert 1 not in hits        # no overlap
        # doc 2 shares "quick brown fox jumps over the" + "... the lazy"
        assert hits[2] >= 1

    def test_decontaminate_drops_flagged_docs(self, spark):
        d = _docs(spark, [(0, "one two three four five six seven"),
                          (1, "eight nine ten eleven twelve thirteen")])
        ev = spark.createDataFrame(
            [("one two three four five six",)], "text string")
        kept = decontam.decontaminate(d, ev, n=6).collect()
        assert [r["doc_id"] for r in kept] == [1]

    def test_short_docs_never_flagged(self, spark):
        d = _docs(spark, [(0, "too short"), (1, "")])
        ev = spark.createDataFrame([("too short",)], "text string")
        assert decontam.find_contaminated(d, ev, n=6).count() == 0


class TestDecontamFuzzy:
    EV = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    def _ev(self, spark, *texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "eval_id long, text string")

    def test_catches_one_token_edit_the_exact_probe_misses(self, spark):
        # one mid-document token edited: EVERY 6-token window contains
        # the edit, so the exact n-gram probe finds nothing — but 5 of
        # 8 trigram shingles survive (j = 5/11 ≈ 0.4545)
        edited = self.EV.replace("zeta", "zzz")
        d = _docs(spark, [(0, edited),
                          (1, "an unrelated spark document entirely")])
        ev = self._ev(spark, self.EV)
        assert decontam.find_contaminated(d, ev, n=6).count() == 0
        got = decontam.find_contaminated_fuzzy(d, ev, threshold=0.3).collect()
        assert [(r["doc_id"], r["eval_id"]) for r in got] == [(0, 0)]
        assert abs(got[0]["jaccard"] - 5 / 11) < 1e-6

    def test_threshold_gates_exactly(self, spark):
        edited = self.EV.replace("zeta", "zzz")
        d = _docs(spark, [(0, edited)])
        ev = self._ev(spark, self.EV)
        assert decontam.find_contaminated_fuzzy(
            d, ev, threshold=0.5).count() == 0  # 0.4545 < 0.5

    def test_best_match_highest_jaccard_then_min_eval_id(self, spark):
        d = _docs(spark, [(0, self.EV)])
        # eval 0 = exact copy (j=1.0), eval 1 = edited (j<1): best is 0
        ev = self._ev(spark, self.EV, self.EV.replace("zeta", "zzz"))
        got = decontam.find_contaminated_fuzzy(d, ev, threshold=0.3).collect()
        assert [(r["doc_id"], r["eval_id"], r["jaccard"])
                for r in got] == [(0, 0, 1.0)]

    def test_disjoint_docs_never_flagged(self, spark):
        d = _docs(spark, [(0, "one two three four five six seven eight")])
        ev = self._ev(spark, self.EV)
        assert decontam.find_contaminated_fuzzy(
            d, ev, threshold=0.05).count() == 0


class TestPacking:
    def test_exact_layout_tiny(self, spark):
        # doc0: 3 tokens, doc1: 5, doc2: 4 → stream of 12, seq_len=5
        d = _docs(spark, [(0, "a b c"), (1, "d e f g h"), (2, "i j k l")])
        rows = sorted(
            packing.pack_sequences(d, seq_len=5).collect(),
            key=lambda r: (r["seq_id"], r["doc_id"]))
        got = [(r["seq_id"], r["doc_id"], r["doc_tok_begin"],
                r["doc_tok_end"], r["seq_tok_begin"]) for r in rows]
        assert got == [
            (0, 0, 0, 3, 0),   # seq0: doc0[0:3] at 0
            (0, 1, 0, 2, 3),   # seq0: doc1[0:2] at 3
            (1, 1, 2, 5, 0),   # seq1: doc1[2:5] at 0
            (1, 2, 0, 2, 3),   # seq1: doc2[0:2] at 3
            (2, 2, 2, 4, 0),   # seq2 (tail): doc2[2:4] at 0
        ]

    def test_token_conservation_and_full_sequences(self, spark):
        d = spark.range(0, 300).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), (F.col("id") % 17) + 1),
                lambda i: F.concat(F.lit("t"), i.cast("string"))))
            .alias("text"))
        out = packing.pack_sequences(d, seq_len=32).cache()
        spans = out.select(
            (F.col("doc_tok_end") - F.col("doc_tok_begin")).alias("w"),
            "seq_id").cache()
        total = spans.agg(F.sum("w")).collect()[0][0]
        n_tok = d.select(F.size(F.filter(F.split("text", " "),
                                         lambda x: x != ""))
                         .alias("n")).agg(F.sum("n")).collect()[0][0]
        assert total == n_tok  # every token placed exactly once
        per_seq = {r["seq_id"]: r["s"] for r in
                   spans.groupBy("seq_id").agg(F.sum("w").alias("s"))
                   .collect()}
        last = max(per_seq)
        assert all(v == 32 for s, v in per_seq.items() if s != last)
        assert 0 < per_seq[last] <= 32
        out.unpersist()
        spans.unpersist()

    def test_layout_independent_of_partitioning(self, spark):
        d = _docs(spark, [(i, " ".join(["w"] * (1 + i % 7)))
                          for i in range(100)])
        a = sorted(map(tuple, packing.pack_sequences(
            d, seq_len=16).collect()))
        b = sorted(map(tuple, packing.pack_sequences(
            d.repartition(17), seq_len=16, num_partitions=3).collect()))
        assert a == b

    def test_rejects_bad_seq_len(self, spark):
        with pytest.raises(ValueError):
            packing.pack_sequences(_docs(spark, [(0, "a")]), seq_len=0)


class TestCapPerStratum:
    def _skewed(self, spark):
        # one hot stratum (600 rows), two small ones (5 and 40)
        rows = [(i, "hot") for i in range(600)]
        rows += [(1000 + i, "small") for i in range(5)]
        rows += [(2000 + i, "mid") for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_caps_hot_keeps_small_whole(self, spark):
        d = self._skewed(spark)
        out = sampling.cap_per_stratum(d, cap=25, salt="s")
        counts = {r["source"]: r["n"] for r in
                  out.groupBy("source").agg(F.count("*").alias("n"))
                  .collect()}
        assert counts == {"hot": 25, "small": 5, "mid": 25}

    def test_matches_plain_window_rank(self, spark):
        from pyspark.sql import Window
        d = self._skewed(spark)
        got = {tuple(r) for r in sampling.cap_per_stratum(
            d, cap=25, salt="s").select("doc_id", "source").collect()}
        w = Window.partitionBy("source").orderBy(
            sampling.sample_key_expr(F.col("doc_id"), "s"), "doc_id")
        want = {tuple(r) for r in
                d.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= 25)
                .select("doc_id", "source").collect()}
        assert got == want

    def test_monotone_in_cap(self, spark):
        d = self._skewed(spark)
        lo = {r["doc_id"] for r in
              sampling.cap_per_stratum(d, cap=10, salt="s").collect()}
        hi = {r["doc_id"] for r in
              sampling.cap_per_stratum(d, cap=30, salt="s").collect()}
        assert lo <= hi

    def test_zero_candidate_stratum_raises_not_drops(self, spark):
        # a margin so small the hot stratum's pre-filter leaves ZERO
        # candidates: the sufficiency check must be driven from the
        # authoritative counts side (LEFT join, coalesce to 0) — a
        # check built from the candidate set alone never sees the
        # stratum at all, passes, and silently drops every row of it
        d = self._skewed(spark)
        with pytest.raises(RuntimeError, match="candidates"):
            sampling.cap_per_stratum(d, cap=1, salt="s",
                                     margin=1e-6).collect()
