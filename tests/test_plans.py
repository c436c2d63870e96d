"""Scale-critical plan properties: pushdown, pruning, broadcast, codegen.

These pin the '.explain and iterate' outcomes — a regression here means a
100-TB run reads or shuffles more than it should, even if results stay
correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark import config as C
from fileverification_spark.operators import spatial as S
from fileverification_spark.plans import explain as X
from fileverification_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def test_point_lookup_filter_pushdown(spark):
    docs = P.load_documents(spark, SF).where(F.col("doc_id") == 7)
    assert X.has_pushed_filter(docs, "doc_id")


def test_column_pruning_reaches_scan(spark):
    pg = P.pages(spark, SF).select("url")
    cols = X.read_schema_columns(pg)
    # url is derived from source/lang/doc_id only — text must NOT be read
    assert "text" not in cols
    assert set(cols) <= {"doc_id", "source", "lang"}


def test_exclusion_filter_pushes_down(spark):
    docs = P.load_documents(spark, SF)
    filtered = docs.where(~(F.col("source") == F.lit("src3")))
    assert X.has_pushed_filter(filtered, "source")


def test_pip_join_broadcasts(spark, pages_small):
    pip = S.pip_join_sql(pages_small, S.default_polygons(), res=P.LEAF_RES)
    assert X.uses_broadcast_join(pip)


def test_knn_bruteforce_broadcasts(spark, pages_small):
    knn = S.knn_bruteforce(pages_small, S.default_query_points(3), 5)
    assert X.uses_broadcast_join(knn)


def test_derivation_stays_in_codegen(spark):
    pg = P.pages_with_derived(spark, SF)
    # whole derivation (hashing, geocode, cell encode) is one codegen span
    assert X.codegen_stage_count(pg) >= 1
