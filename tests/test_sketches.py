"""Sketch-accuracy pins for the rows-only approximate aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_TEST_DIR


def test_hll_merged_estimate_close_to_exact(spark):
    from phoenix_spark.queries import all_queries
    from phoenix_spark.queries._util import t

    est = all_queries()["agg_hll_sketch_merge"](spark, SF_TEST_DIR).collect()[0]
    exact = t(spark, SF_TEST_DIR, "orders").agg(
        F.countDistinct("o_custkey")
    ).collect()[0][0]
    assert abs(est.merged_estimate - exact) / exact < 0.05


def test_approx_percentile_close_to_exact(spark):
    from phoenix_spark.queries import all_queries

    rows = all_queries()["agg_percentile_approx"](spark, SF_TEST_DIR).collect()
    for r in rows:
        assert r.p50_approx <= r.p99_approx
