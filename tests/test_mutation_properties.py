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

_BATCH = st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=4)
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _BATCH),
        st.tuples(st.just("delete_le"), KEYS),
        st.tuples(st.just("compact"), st.just(None)),
        # ON DUPLICATE KEY flavors (UpsertStatement.OnDuplicateKeyType):
        # IGNORE inserts only absent PKs; UPDATE applies the expression over
        # the EXISTING row for matched PKs and inserts unmatched; UPDATE_ONLY
        # (grammar :899,911) applies the expression and DROPS unmatched.
        st.tuples(st.just("dup_ignore"), _BATCH),
        st.tuples(st.just("dup_update"), _BATCH),
        st.tuples(st.just("dup_update_only"), _BATCH),
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
        elif op == "dup_ignore":
            batch = {k: v for k, v in arg}
            n = mt.upsert_rows(
                [{"k": k, "v": v} for k, v in batch.items()],
                on_duplicate="ignore",
            )
            # r7 count contract (OnDuplicateKey2IT.testIgnoreReturnValue):
            # only the actually-INSERTED rows count
            assert n == sum(1 for k in batch if k not in model)
            for k, v in batch.items():
                model.setdefault(k, v)
        elif op in ("dup_update", "dup_update_only"):
            from phoenix_spark.ddl import UpdateOnly

            batch = {k: v for k, v in arg}
            assigns = {"v": "v + 1"}
            n = mt.upsert_rows(
                [{"k": k, "v": v} for k, v in batch.items()],
                on_duplicate=(
                    UpdateOnly(assigns) if op == "dup_update_only" else assigns
                ),
            )
            if op == "dup_update_only":
                # r7 count contract: absent-PK rows are dropped, not counted
                assert n == sum(1 for k in batch if k in model)
            for k, v in batch.items():
                if k in model:
                    model[k] = model[k] + 1  # expression over the EXISTING row
                elif op == "dup_update":
                    model[k] = v  # UPDATE inserts unmatched; UPDATE_ONLY drops
        else:
            mt.compact()
    got = {r.k: r.v for r in mt.read().collect()}
    assert got == model
    mt.drop()


# --- partial-column cell semantics (round 4) ---------------------------------
# Phoenix writes only the LISTED cells: a partial-column upsert preserves
# unlisted columns of existing rows and NULL-fills them for new rows.  The
# model is a dict of (a, b) pairs; ops randomly update a-only, b-only, or
# both, interleaved with deletes — the Engine path under test is the
# read-modify-write join in _exec_upsert.

PARTIAL_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("both"), KEYS, VALS, VALS),
        st.tuples(st.just("a_only"), KEYS, VALS, st.none()),
        st.tuples(st.just("b_only"), KEYS, st.none(), VALS),
        st.tuples(st.just("delete"), KEYS, st.none(), st.none()),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=PARTIAL_OPS)
def test_partial_upsert_preserves_cells(spark, tmp_path_factory, ops):
    from phoenix_spark.engine import Engine

    wh = str(tmp_path_factory.mktemp("prop_wh2"))
    e = Engine(spark, warehouse=wh)
    e.sql(
        "CREATE TABLE pc (k BIGINT NOT NULL, a BIGINT, b BIGINT, "
        "CONSTRAINT pk PRIMARY KEY (k))"
    )
    model: dict[int, tuple] = {}
    for op, k, a, b in ops:
        if op == "both":
            e.sql(f"UPSERT INTO pc VALUES ({k}, {a}, {b})")
            model[k] = (a, b)
        elif op == "a_only":
            e.sql(f"UPSERT INTO pc (k, a) VALUES ({k}, {a})")
            model[k] = (a, model.get(k, (None, None))[1])
        elif op == "b_only":
            e.sql(f"UPSERT INTO pc (k, b) VALUES ({k}, {b})")
            model[k] = (model.get(k, (None, None))[0], b)
        else:
            e.sql(f"DELETE FROM pc WHERE k = {k}")
            model.pop(k, None)
    got = {r.k: (r.a, r.b) for r in e.table("pc").collect()}
    assert got == model
