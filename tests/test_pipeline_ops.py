"""Unit tests for the training-data pipeline trio added after round 2:
corpus-level line dedup, regex PII scrubbing, deterministic hash
sampling. (Their cross-engine twins live in test_contract_oracle.py;
these tests pin the operator semantics on hand-built corpora.)"""

from pyspark.sql import functions as F

from modern_search_engines_spark.operators import linededup, pii, sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLineDedup:
    def test_first_occurrence_kept_corpus_wide(self, spark):
        d = _docs(spark, [
            (0, "alpha\nshared line\nbeta"),
            (1, "shared line\ngamma"),
            (2, "gamma\ndelta"),
        ])
        out = {r["doc_id"]: r for r in linededup.line_dedup(d).collect()}
        # doc 0 is the first (lowest doc_id) holder of "shared line"
        assert out[0]["clean_text"] == "alpha\nshared line\nbeta"
        assert out[1]["clean_text"] == "gamma"          # lost "shared line"
        assert out[2]["clean_text"] == "delta"          # lost "gamma" to doc 1
        assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)

    def test_within_doc_repeats_collapse_to_first(self, spark):
        d = _docs(spark, [(7, "x\ny\nx\nx")])
        row = linededup.line_dedup(d).collect()[0]
        assert row["clean_text"] == "x\ny"
        assert (row["n_lines"], row["n_kept"]) == (4, 2)

    def test_fully_deduped_and_empty_docs_survive(self, spark):
        d = _docs(spark, [(0, "only line"), (1, "only line"), (2, "")])
        out = {r["doc_id"]: r for r in linededup.line_dedup(d).collect()}
        assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
        assert out[2]["clean_text"] == "" and out[2]["n_lines"] == 0
        assert len(out) == 3

    def test_chunk_tokens_expr_windows(self, spark):
        d = _docs(spark, [(0, "a b c d e")])
        lines = d.select(
            linededup.chunk_tokens_expr(F.col("text"), 2).alias("l")
        ).collect()[0]["l"]
        assert lines == ["a b", "c d", "e"]


class TestPiiScrub:
    def test_each_type_replaced_and_counted(self, spark):
        d = _docs(spark, [(0, "mail a.b@c.example.org ip 10.1.2.3 "
                              "ssn 123-45-6789 tel +1 555 867 5309 end")])
        row = pii.scrub_pii(d).collect()[0]
        assert row["clean_text"] == ("mail <EMAIL> ip <IP> "
                                     "ssn <SSN> tel <PHONE> end")
        assert (row["n_email"], row["n_ipv4"],
                row["n_ssn"], row["n_phone"]) == (1, 1, 1, 1)

    def test_ssn_consumed_before_phone(self, spark):
        # an SSN also matches the looser phone shape; order guarantees
        # it is counted (and replaced) as SSN, not phone
        d = _docs(spark, [(0, "id 123-45-6789 only")])
        row = pii.scrub_pii(d).collect()[0]
        assert row["n_ssn"] == 1 and row["n_phone"] == 0
        assert "<SSN>" in row["clean_text"]

    def test_phone_requires_phone_intent(self, spark):
        # the phone rule must NOT fire on bare digit runs — year lists,
        # scores, numeric table rows, ISO dates, year ranges (the old
        # any-8-of-[0-9 ()-] shape corrupted all of these)
        benign = ["in 2020 2021 2022 the", "score 10 24 36 48 90",
                  "range 2020-2021 was", "date 2020-01-15 iso",
                  "date 15-01-2020 eu", "(2020) was a year",
                  "pages 100 - 200"]
        d = _docs(spark, list(enumerate(benign)))
        rows = pii.scrub_pii(d).collect()
        assert all(r["n_phone"] == 0 for r in rows), rows
        texts = {r["doc_id"]: r["clean_text"] for r in rows}
        assert texts == dict(enumerate(benign))

    def test_phone_shapes_still_caught(self, spark):
        phones = ["tel +1 555 867 5309 end", "(555) 123-4567",
                  "call 555-123-4567 x", "+49 7071 29570",
                  "+14155551234", "local 555-0199 line"]
        d = _docs(spark, list(enumerate(phones)))
        rows = pii.scrub_pii(d).collect()
        assert all(r["n_phone"] == 1 for r in rows), rows
        assert all("<PHONE>" in r["clean_text"] for r in rows)

    def test_clean_text_has_no_residual_matches(self, spark):
        d = _docs(spark, [(0, "x@y.example.com 1.2.3.4 999-88-7777 "
                              "(555) 123-4567")])
        clean = pii.scrub_pii(d).select(
            F.col("clean_text").alias("text"), F.lit(0).alias("doc_id"))
        again = pii.scrub_pii(clean).collect()[0]
        assert (again["n_email"] + again["n_ipv4"] +
                again["n_ssn"] + again["n_phone"]) == 0


class TestHashSampling:
    def test_deterministic_and_layout_independent(self, spark):
        d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"] for r in
             sampling.hash_sample(d, 0.3, salt="s").collect()}
        b = {r["doc_id"] for r in
             sampling.hash_sample(d.repartition(13), 0.3, salt="s").collect()}
        assert a == b and 0.2 < len(a) / 2000 < 0.4

    def test_monotone_in_rate(self, spark):
        d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        lo = {r["doc_id"] for r in sampling.hash_sample(d, 0.1).collect()}
        hi = {r["doc_id"] for r in sampling.hash_sample(d, 0.2).collect()}
        assert lo <= hi and len(lo) < len(hi)

    def test_rate_edges(self, spark):
        d = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        assert sampling.hash_sample(d, 1.0).count() == 100
        assert sampling.hash_sample(d, 0.0).count() == 0

    def test_stratified_rates_and_default(self, spark):
        d = (spark.range(0, 3000)
             .select(F.col("id").alias("doc_id"),
                     F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
                     .alias("source")))
        out = sampling.stratified_sample(
            d, {"s0": 1.0, "s1": 0.5}, strata_col="source")
        counts = {r["source"]: r["n"] for r in
                  out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert counts["s0"] == 1000
        assert 350 < counts["s1"] < 650
        assert "s2" not in counts  # default_rate=0.0


class TestHashSplit:
    def test_disjoint_covering_and_proportional(self, spark):
        from modern_search_engines_spark.operators import sampling
        d = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        out = sampling.hash_split(
            d, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s")
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n"))
                  .collect()}
        assert sum(counts.values()) == 5000          # covering
        assert set(counts) == {"train", "val", "test"}
        assert 3800 < counts["train"] < 4200
        assert 350 < counts["val"] < 650

    def test_deterministic_across_layouts(self, spark):
        from modern_search_engines_spark.operators import sampling
        d = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        w = {"a": 0.5, "b": 0.5}
        x = {r["doc_id"]: r["split"] for r in
             sampling.hash_split(d, w, salt="z").collect()}
        y = {r["doc_id"]: r["split"] for r in
             sampling.hash_split(d.repartition(7), w, salt="z").collect()}
        assert x == y

    def test_reweighting_moves_only_boundary_rows(self, spark):
        from modern_search_engines_spark.operators import sampling
        d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in sampling.hash_split(
            d, {"test": 0.1, "train": 0.8, "val": 0.1}, salt="s").collect()}
        b = {r["doc_id"]: r["split"] for r in sampling.hash_split(
            d, {"test": 0.2, "train": 0.7, "val": 0.1}, salt="s").collect()}
        # growing test only converts train rows to test; val untouched
        changed = {k for k in a if a[k] != b[k]}
        assert changed and all(a[k] == "train" and b[k] == "test"
                               for k in changed)

    def test_rejects_bad_weights(self, spark):
        from modern_search_engines_spark.operators import sampling
        d = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            sampling.hash_split(d, {"a": 0.5, "b": 0.4})
