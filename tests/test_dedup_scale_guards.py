"""Scale guards on the dedup operators plus the Iceberg write branch:

* simhash banding parameterized by band width — wider bands (32-bit →
  2^32 buckets) must return exactly the pairs brute force finds, for
  every width whose pigeonhole guarantee covers the distance;
* jaccard hot-shingle cap — a planted universal shingle must not
  generate quadratic candidate pairs once capped;
* StageWriter's Iceberg branch fails loudly (no silent parquet
  fallback) when no catalog is configured.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from modern_search_engines_spark.operators import dedup
from modern_search_engines_spark.sources import tables as tbl


def _random_simhash_docs(spark, n=60, seed=3, planted_pairs=6):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rows.append((f"d{i:03d}", int(rng.integers(-2**63, 2**63 - 1)),
                     int(rng.integers(-2**63, 2**63 - 1))))
    # plant near-dup partners at hamming distance 1..4
    for j in range(planted_pairs):
        base = rows[j]
        flip = 1 << int(rng.integers(0, 63))
        rows.append((f"p{j:03d}", base[1] ^ flip, base[2]))
    return spark.createDataFrame(
        rows, "doc_id string, sim_hi long, sim_lo long")


def _brute_pairs(rows, max_distance):
    def u(x):
        return x & 0xFFFFFFFFFFFFFFFF

    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            x, y = (a, b) if a[0] < b[0] else (b, a)
            d = (bin(u(x[1]) ^ u(y[1])).count("1")
                 + bin(u(x[2]) ^ u(y[2])).count("1"))
            if d < max_distance:
                out.add((x[0], y[0], d))
    return out


@pytest.mark.parametrize("band_bits,max_distance",
                         [(16, 5), (16, 8), (32, 4), (8, 5)])
def test_simhash_banding_matches_brute_force(spark, band_bits,
                                             max_distance):
    df = _random_simhash_docs(spark)
    rows = [tuple(r) for r in df.collect()]
    got = {(r["doc_a"], r["doc_b"], r["distance"])
           for r in dedup.simhash_near_dups(
               df, max_distance=max_distance,
               band_bits=band_bits).collect()}
    assert got == _brute_pairs(rows, max_distance)


def test_simhash_hot_bucket_split_bounds_candidates(spark):
    """A planted 10³-doc hot band bucket (all docs share band h0) must
    not go quadratic once ``max_bucket_docs`` is set — and the split
    must return EXACTLY the unsplit pairs (the secondary key is a
    recall-exact re-partition of the hot bucket, not a sampler)."""
    rng = np.random.default_rng(11)
    hot16 = 0x4A3C << 48  # shared band h3 (bits 48..63 of sim_hi)
    rows = []
    for i in range(1000):
        lo48 = int(rng.integers(0, 2**48))
        rows.append((f"d{i:04d}", hot16 | lo48,
                     int(rng.integers(-2**63, 2**63 - 1))))
    # plant true near-dups (distance 1..4) inside the hot bucket
    for j in range(8):
        base = rows[j]
        flip = 1 << int(rng.integers(0, 40))
        rows.append((f"p{j:03d}", base[1] ^ flip, base[2]))
    df = spark.createDataFrame(
        rows, "doc_id string, sim_hi long, sim_lo long").cache()

    unsplit = dedup._sim_band_candidates(df, 16, None).count()
    split = dedup._sim_band_candidates(df, 16, 100).count()
    assert unsplit >= 1008 * 1007 // 2  # the hot bucket went quadratic
    assert split < unsplit / 50  # bounded by two-band intersections

    got_split = {(r["doc_a"], r["doc_b"], r["distance"])
                 for r in dedup.simhash_near_dups(
                     df, max_distance=5, max_bucket_docs=100).collect()}
    got_plain = {(r["doc_a"], r["doc_b"], r["distance"])
                 for r in dedup.simhash_near_dups(
                     df, max_distance=5).collect()}
    assert got_split == got_plain and len(got_split) >= 8
    df.unpersist()


def test_simhash_hot_bucket_split_needs_two_shared_bands():
    # at max_distance == n_bands a pair may share only ONE band — the
    # split could lose it, so the operator must refuse
    with pytest.raises(AssertionError):
        dedup.simhash_near_dups(None, max_distance=8, band_bits=16,
                                max_bucket_docs=100)


def test_simhash_band_width_guard():
    # 32-bit bands only guarantee distance < 4 — asking for more must
    # be rejected, not silently lossy
    with pytest.raises(AssertionError):
        dedup.simhash_near_dups(None, max_distance=5, band_bits=32)


def test_jaccard_hot_shingle_cap_bounds_candidates(spark):
    # 40 docs all share one universal shingle; only 2 docs genuinely
    # overlap. Uncapped: the universal shingle alone creates C(40,2)
    # = 780 candidate pairs. Capped: only the genuine pair remains.
    rows = [(f"d{i:02d}", "the universal shingle") for i in range(40)]
    rows += [("d00", "rare match one"), ("d01", "rare match one"),
             ("d00", "rare other two"), ("d01", "rare other two")]
    sh = spark.createDataFrame(rows, "doc_id string, sh string")

    uncapped = dedup.jaccard_near_dups(sh, threshold=None)
    assert uncapped.count() == 40 * 39 // 2  # quadratic blow-up

    capped = dedup.jaccard_near_dups(sh, threshold=None,
                                     max_shingle_df=10)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in capped.collect()}
    assert set(got) == {("d00", "d01")}
    assert got[("d00", "d01")] == pytest.approx(1.0)  # 2/2 rare shingles

    # cap above the max df reproduces the exact unfiltered jaccard
    loose = dedup.jaccard_near_dups(sh, threshold=None,
                                    max_shingle_df=1000)
    assert loose.count() == uncapped.count()


def test_iceberg_branch_manifest_bookkeeping(spark, tmp_path, monkeypatch):
    """The cluster (Iceberg) write branch, exercised with a mocked
    ``writeTo``/``read.table`` pair standing in for a catalog: the
    snapshot commit must materialize the observed plan, record
    rows/schema/partitioning/table in the manifest, and resume by
    reading the table back instead of rewriting."""
    import pyspark.sql as psql
    # PySpark 4 splits the API: the concrete classic DataFrame OVERRIDES
    # the pyspark.sql.DataFrame base-class writeTo, so the patch must
    # land on the class the session actually instantiates
    import pyspark.sql.classic.dataframe as classic_df

    tables: dict[str, str] = {}
    created = []

    class FakeWriter:
        def __init__(self, df, table):
            self.df, self.table, self.parts = df, table, None

        def using(self, fmt):
            assert fmt == "iceberg"
            return self

        def partitionedBy(self, *cols):
            self.parts = cols
            return self

        def createOrReplace(self):
            path = str(tmp_path / "wh" / self.table.replace(".", "_"))
            self.df.write.mode("overwrite").parquet(path)
            tables[self.table] = path
            created.append((self.table, self.parts))

    monkeypatch.setattr(classic_df.DataFrame, "writeTo",
                        lambda self, table: FakeWriter(self, table))
    monkeypatch.setattr(psql.readwriter.DataFrameReader, "table",
                        lambda self, name: spark.read.parquet(tables[name]))

    sw = tbl.StageWriter(spark, str(tmp_path / "mfs"), verbose=False,
                         iceberg_table_prefix="ice.db")
    df = spark.range(7).select(F.col("id").alias("v"),
                               (F.col("id") % 2).alias("p"))
    out = sw.write_stage(df, "s", partition_by=["p"])
    assert out.count() == 7
    m = sw.manifest("s")
    assert m["layout"] == "iceberg" and m["table"] == "ice.db.s"
    assert m["rows"] == 7 and m["status"] == "complete"
    assert m["partition_by"] == ["p"]
    assert created and created[0][0] == "ice.db.s"
    assert created[0][1] is not None  # partitionedBy passed through
    # resume: complete manifest + same schema → no rewrite, table read
    out2 = sw.write_stage(df, "s", partition_by=["p"])
    assert out2.count() == 7
    assert len(created) == 1


def test_iceberg_branch_fails_loudly_without_catalog(spark, tmp_path):
    sw = tbl.StageWriter(spark, str(tmp_path), verbose=False,
                         iceberg_table_prefix="ice.db")
    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(Exception):  # no catalog/jar in this sandbox
        sw.write_stage(df, "s")
    # and the parquet default is unaffected
    sw2 = tbl.StageWriter(spark, str(tmp_path / "pq"), verbose=False)
    out = sw2.write_stage(df, "s")
    assert out.count() == 5
