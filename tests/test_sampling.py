"""Deterministic sampling + data-mixing operators (operators/sampling).
Oracle parity runs in tests/test_demoted_contract.py; these tests pin
the SEMANTIC properties the no-RNG design exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fileverification_spark.operators import sampling as SMP

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet").cache()


def _key():
    return F.col("doc_id").cast("string")


def test_hash_sample_deterministic_and_sized(spark, docs):
    a = {r.doc_id for r in SMP.hash_sample(docs, _key(), 0.2)
         .select("doc_id").collect()}
    b = {r.doc_id for r in SMP.hash_sample(docs, _key(), 0.2)
         .select("doc_id").collect()}
    assert a == b and a
    n = docs.count()
    # Bernoulli(0.2) over 500 uniform hashes: mean 100, sd ~8.9
    assert 0.1 * n <= len(a) <= 0.3 * n


def test_hash_sample_nested_fractions(spark, docs):
    """A smaller fraction's sample is a SUBSET of a larger one — the
    threshold construction gives consistent nested samples (grow the
    sample without re-drawing)."""
    s10 = {r.doc_id for r in SMP.hash_sample(docs, _key(), 0.1)
           .select("doc_id").collect()}
    s30 = {r.doc_id for r in SMP.hash_sample(docs, _key(), 0.3)
           .select("doc_id").collect()}
    assert s10 < s30


def test_hash_sample_append_consistent(spark, docs):
    """New rows never change the verdict on old rows."""
    half = docs.where(F.col("doc_id") % 2 == 0)
    s_half = {r.doc_id for r in SMP.hash_sample(half, _key(), 0.2)
              .select("doc_id").collect()}
    s_full = {r.doc_id for r in SMP.hash_sample(docs, _key(), 0.2)
              .select("doc_id").collect()}
    assert s_half == {d for d in s_full if d % 2 == 0}


def test_hash_sample_bounds(spark, docs):
    assert SMP.hash_sample(docs, _key(), 0.0).count() == 0
    assert SMP.hash_sample(docs, _key(), 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        SMP.hash_sample(docs, _key(), 1.5)


def test_hash_sample_full_fraction_is_identity(spark, docs):
    """fraction=1.0 is df itself, not a '< ffffffff' filter that would
    drop ~1/2^32 of rows (ADVICE r3); SQL twin mirrors it."""
    assert SMP.hash_sample(docs, _key(), 1.0) is docs
    assert "WHERE" not in SMP.sql_hash_sample("url", 1.0, "documents")


def test_hash_sample_pushed_to_scan(spark, docs):
    """The predicate is scan-side: no Exchange in the plan."""
    plan = SMP.hash_sample(
        spark.read.parquet(f"{SF0001}/documents.parquet"), _key(), 0.2
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_exact_quota_and_determinism(spark, docs):
    got = SMP.stratified_sample(docs, "lang", 7, _key())
    per = {r.lang: r.n for r in
           got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {k: min(7, v) for k, v in sizes.items()}
    again = SMP.stratified_sample(docs, "lang", 7, _key())
    assert {r.doc_id for r in got.select("doc_id").collect()} == \
        {r.doc_id for r in again.select("doc_id").collect()}


def test_stratified_small_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 3 else "b") for i in range(20)], "doc_id int, lang string"
    ).withColumn("doc_id", F.col("doc_id").cast("string"))
    got = SMP.stratified_sample(df, "lang", 10, "doc_id")
    per = {r.lang: r.n for r in
           got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 3, "b": 10}


def test_mixture_weights_arithmetic(spark, docs):
    target = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    rows = {r.source: r for r in
            SMP.mixture_weights(docs, "source", target).collect()}
    assert len(rows) == 20
    # equal 25-row sources, total 500 -> actual_share 0.05 each;
    # ratios 10/6/4 -> keep 1.0 / 0.6 / 0.4; everything else dropped
    assert rows["src0"].keep_fraction == pytest.approx(1.0)
    assert rows["src1"].keep_fraction == pytest.approx(0.6)
    assert rows["src2"].keep_fraction == pytest.approx(0.4)
    for s, r in rows.items():
        if s not in target:
            assert r.keep_fraction == 0.0
        assert r.actual_share == pytest.approx(r.n_rows / 500)


def test_mixture_realisation_hits_target(spark, docs):
    """hash_sample per source at the computed keep_fractions lands the
    realised mixture near the target proportions."""
    target = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    plan = {r.source: r.keep_fraction for r in
            SMP.mixture_weights(docs, "source", target).collect()}
    kept = None
    for s, f in plan.items():
        if f <= 0:
            continue
        part = SMP.hash_sample(
            docs.where(F.col("source") == s), _key(), f)
        kept = part if kept is None else kept.unionByName(part)
    shares = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(shares.values())
    for s, p in target.items():
        # 25-row sources -> quantisation noise dominates; loose bound
        assert abs(shares.get(s, 0) / total - p) < 0.15


def test_mixture_no_target_match_raises(spark, docs):
    with pytest.raises(ValueError, match="no source"):
        SMP.mixture_weights(docs, "source", {"nope": 1.0})
