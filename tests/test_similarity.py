"""Consistency checks for the ANN paths (IVF probe / LSH pairs) against the
exact brute-force baseline — the un-oracle-able halves of pipeline_similarity
get their correctness pinned here instead."""

from __future__ import annotations

from tests.conftest import SF_TEST_DIR


def test_ivf_probe_consistent_with_bruteforce(spark):
    from phoenix_spark.queries import all_queries

    qs = all_queries()
    brute = {r.vec_id: r.cosine for r in qs["similarity_topk"](spark, SF_TEST_DIR).collect()}
    ivf = qs["similarity_ivf_probe"](spark, SF_TEST_DIR).collect()
    assert 0 < len(ivf) <= 10
    cos = [r.cosine for r in ivf]
    assert cos == sorted(cos, reverse=True)
    for r in ivf:
        if r.vec_id in brute:
            assert abs(r.cosine - brute[r.vec_id]) == 0.0


def test_lsh_pairs_are_symmetric_and_thresholded(spark):
    from phoenix_spark.queries import all_queries

    pairs = all_queries()["similarity_lsh_pairs"](spark, SF_TEST_DIR).collect()
    assert pairs, "banded sign-LSH should surface pairs on the fixture"
    for r in pairs:
        assert r.id_a < r.id_b and r.cosine >= 0.4
