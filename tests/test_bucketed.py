"""Bucketed-layout tests: the co-located join must drop every Exchange
from the plan and still produce exactly the plain join's rows."""

import pytest
from pyspark.sql import functions as F

from bern2_spark.sources.bucketed import (colocated_join, exchange_count,
                                          write_bucketed)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    triples = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("cui_ord"),
        F.concat(F.lit("CUI:"), (F.col("id") % 97).cast("string"))
         .alias("cui"),
        (F.col("id") % 13).alias("doc_id"))
    catalog = spark.range(0, 97).select(
        F.concat(F.lit("CUI:"), F.col("id").cast("string")).alias("cui"),
        F.concat(F.lit("name_"), F.col("id").cast("string"))
         .alias("canonical"))
    write_bucketed(triples.drop("cui_ord"), "t_triples_b", "cui",
                   n_buckets=8, path=str(base / "triples"))
    write_bucketed(catalog, "t_catalog_b", "cui",
                   n_buckets=8, path=str(base / "catalog"))
    yield "t_triples_b", "t_catalog_b", triples.drop("cui_ord"), catalog
    spark.sql("DROP TABLE IF EXISTS t_triples_b")
    spark.sql("DROP TABLE IF EXISTS t_catalog_b")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt, _, _ = bucketed_tables
    joined = colocated_join(spark, lt, rt, "cui")
    assert joined.count() == 2000
    assert exchange_count(joined) == 0, \
        joined._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt, triples, catalog = bucketed_tables
    fast = colocated_join(spark, lt, rt, "cui")
    plain = triples.join(catalog, "cui")
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, plain.select(fast.columns).collect()))


def test_unbucketed_same_join_does_shuffle(spark, bucketed_tables):
    """Control: the identical join over plain parquet reads pays two
    Exchanges — the cost bucketing removes."""
    lt, rt, triples, catalog = bucketed_tables
    plain = triples.hint("merge").join(catalog, "cui")
    plain.count()
    assert exchange_count(plain) >= 2


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout."""
    lt, _, _, _ = bucketed_tables
    agg = spark.table(lt).groupBy("cui").agg(F.count("*").alias("n"))
    assert agg.count() == 97
    assert exchange_count(agg) == 0
