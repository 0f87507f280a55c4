"""Sketch-accuracy pins for the approximate aggregates.

Round 5 made the sketch registry entries oracle-paired (exact anchor +
bounded-error invariant), so these tests pin the TIGHTER bounds the entries
themselves only claim loosely (15 %), plus the raw sketch accuracy the
entries no longer expose directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_TEST_DIR


def test_hll_merged_estimate_close_to_exact(spark):
    """The merged (reaggregated) HLL estimate lands within 5 % of the exact
    distinct count — tighter than the 15 % contract the registry entry
    hashes; computed directly here since the entry now returns the
    invariant, not the raw estimate."""
    from phoenix_spark.queries import all_queries
    from phoenix_spark.queries._util import t

    o = t(spark, SF_TEST_DIR, "orders")
    est = (
        o.groupBy("o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    exact = o.agg(F.countDistinct("o_custkey")).collect()[0][0]
    assert abs(est - exact) / exact < 0.05
    # and the registry entry's own invariant row holds
    row = all_queries()["agg_hll_sketch_merge"](spark, SF_TEST_DIR).collect()[0]
    assert row.merged_within_15pct is True
    assert row.exact_custkeys == exact


def test_approx_percentile_close_to_exact(spark):
    from phoenix_spark.queries import all_queries

    rows = all_queries()["agg_percentile_approx"](spark, SF_TEST_DIR).collect()
    for r in rows:
        assert r.p50_in_bounds is True and r.p99_in_bounds is True
