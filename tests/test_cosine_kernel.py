"""Equivalence pin for the round-9 Arrow integer-cosine kernels.

similarity_lsh_pairs' verify stage, similarity_knn_batch's scored stage and
similarity_ivf_probe's cell assignment compute their dot products in
Arrow-batched numpy kernels (pipeline_similarity._cos_pair_kernel /
_cos_scored_kernel / _ivf_dist_kernel) instead of the interpreted JVM
`aggregate(zip_with(...))` fold.  The quantized vectors make every dot and
norm an *integer* sum (exact in any order — the round-8 float-summation
objection does not apply), and the final double is a chain of single
correctly-rounded IEEE ops, so the kernels must be BIT-identical:

  * these tests compare kernel vs JVM-fold cosines with exact equality
    (no tolerance) on adversarial integer vectors — extreme magnitudes at
    the quantization bound, negatives, zeros and near-orthogonal pairs —
    and on the sf0.001 fixture through the full lsh_pairs query;
  * the per-row big-int fallback path is forced with ragged-width rows.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import Row

from phoenix_spark.queries.pipeline_similarity import (
    _cos_pair_kernel,
    _ivf_dist_kernel,
    _lsh_pairs,
)

# magnitude bound of the quantized values (|x| <= ~0.53 * 1e7)
_M = 5_300_000

# NOTE: an all-zero vector is excluded — under ANSI mode (Spark 4 default)
# the JVM fold ERRORS on the 0/0 division, so no data with a zero norm can
# ever have produced a cosine on the JVM path; the kernel yields NaN there.
VEC_PAIRS = [
    ([_M] * 64, [_M] * 64),  # maximal dot: 64 * M² ≈ 1.8e15 (< 2^53)
    ([_M] * 64, [-_M] * 64),  # maximal negative
    ([_M, -_M] * 32, [-_M, _M] * 32),
    ([1] * 64, [1] * 64),
    ([(-1) ** i * (i * 77777 + 13) for i in range(64)],
     [(-1) ** (i + 1) * (i * 91919 + 7) for i in range(64)]),
    ([i + 1 for i in range(64)], [64 - i for i in range(64)]),
]


def _jvm_cosine(spark, rows):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        rows, "id_a bigint, id_b bigint, q_a array<bigint>, q_b array<bigint>"
    )
    dot = F.expr(
        "aggregate(zip_with(q_a, q_b, (x, y) -> x * y), cast(0 as bigint),"
        " (acc, v) -> acc + v)"
    )
    norm = lambda c: F.expr(
        f"aggregate({c}, cast(0 as bigint), (acc, v) -> acc + v * v)"
    )
    out = df.select(
        "id_a",
        "id_b",
        norm("q_a").alias("qn_a"),
        norm("q_b").alias("qn_b"),
        (dot / (F.sqrt(norm("q_a")) * F.sqrt(norm("q_b")))).alias("cosine"),
    )
    return {(r["id_a"], r["id_b"]): (r["qn_a"], r["qn_b"], r["cosine"]) for r in out.collect()}


def _kernel_cosine(rows, jvm):
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.int64()),
            pa.array([r[1] for r in rows], type=pa.int64()),
            pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
            pa.array([jvm[(r[0], r[1])][0] for r in rows], type=pa.int64()),
            pa.array([r[3] for r in rows], type=pa.list_(pa.int64())),
            pa.array([jvm[(r[0], r[1])][1] for r in rows], type=pa.int64()),
        ],
        names=["id_a", "id_b", "q_a", "qn_a", "q_b", "qn_b"],
    )
    (out,) = list(_cos_pair_kernel(iter([batch])))
    return {
        (i, j): c
        for i, j, c in zip(
            out.column(0).to_pylist(),
            out.column(1).to_pylist(),
            out.column(2).to_pylist(),
        )
    }


def test_pair_kernel_bit_exact_on_adversarial_vectors(spark):
    rows = [(i, i + 1000, a, b) for i, (a, b) in enumerate(VEC_PAIRS)]
    jvm = _jvm_cosine(spark, rows)
    got = _kernel_cosine(rows, jvm)
    assert set(got) == set(jvm)
    for k, c in got.items():
        expect = jvm[k][2]
        if expect is None or (isinstance(expect, float) and expect != expect):
            assert c is None or c != c  # NaN agrees with NaN
        else:
            assert c == expect, (k, c, expect)  # EXACT, no tolerance


def test_pair_kernel_ragged_fallback_bit_exact(spark):
    # different widths per row force the pure-Python big-int fallback
    rows = [
        (1, 2, [3, 4, 5], [6, 7, 8]),
        (2, 3, [_M] * 8, [-_M] * 8),
        (3, 4, [10], [20]),
    ]
    jvm = _jvm_cosine(spark, rows)
    got = _kernel_cosine(rows, jvm)
    assert {k: v for k, v in got.items()} == {k: v[2] for k, v in jvm.items()}


def test_ivf_dist_kernel_exact(spark):
    rows = [(i, i + 1000, a, b) for i, (a, b) in enumerate(VEC_PAIRS)]
    jvm = _jvm_cosine(spark, rows)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], type=pa.int64()),
            pa.array([r[1] for r in rows], type=pa.int64()),
            pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
            pa.array([jvm[(r[0], r[1])][0] for r in rows], type=pa.int64()),
            pa.array([r[3] for r in rows], type=pa.list_(pa.int64())),
            pa.array([jvm[(r[0], r[1])][1] for r in rows], type=pa.int64()),
        ],
        names=["vec_id", "cell", "q", "qn", "cq", "cqn"],
    )
    (out,) = list(_ivf_dist_kernel(iter([batch])))
    for vid, cell, d in zip(
        out.column(0).to_pylist(), out.column(1).to_pylist(), out.column(2).to_pylist()
    ):
        qn, cqn, _ = jvm[(vid, cell)]
        a = dict((r[0], r) for r in rows)[vid]
        exact = qn + cqn - 2 * sum(x * y for x, y in zip(a[2], a[3]))
        assert d == exact


def test_lsh_pairs_kernel_path_equals_jvm_fold_on_fixture(spark):
    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in _lsh_pairs(spark, sf, arrow_kernel=True).collect()
    }
    spark.catalog.clearCache()
    slow = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in _lsh_pairs(spark, sf, arrow_kernel=False).collect()
    }
    spark.catalog.clearCache()
    assert len(fast) > 0
    assert fast == slow  # bit-identical doubles
