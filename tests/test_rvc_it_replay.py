"""RowValueConstructorIT replay over the shared ATABLE fixture
(phoenix-core/src/it/.../RowValueConstructorIT.java:76-310).

Pins the dialect's row-value-constructor comparison semantics: lexicographic
compare that short-circuits on the first deciding component (so a NULL in a
later component only nulls the comparison when the prefix ties), UNEQUAL
argument counts (the shorter side compares as a prefix; the longer side wins
ties), degenerate scalar-vs-RVC forms on either side, and bind variables
inside the constructor."""

from __future__ import annotations

import pytest

from tests.atable import TENANT, create_atable
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def atable(spark, tmp_path):
    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    create_atable(e)
    return e


def _rows(engine, where, params=None):
    return engine.sql(
        "SELECT a_integer, x_integer FROM atable "
        f"WHERE ?=organization_id AND {where}",
        [TENANT, *(params or [])],
    ).collect()


def test_rvc_equals(atable):
    # RowValueConstructorIT.java:76-99
    rows = _rows(atable, "(a_integer, x_integer) = (7, 5)")
    assert [(r.a_integer, r.x_integer) for r in rows] == [(7, 5)]


def test_rvc_greater_than_with_null_component(atable):
    # java:101-126 — x_integer is NULL for a_integer<=6: (4,null)>=(4,4) is
    # NULL (prefix ties), but (5,null)/(6,null) decide on the first component
    rows = _rows(atable, "(a_integer, x_integer) >= (4, 4)")
    assert sorted(r.a_integer for r in rows) == [5, 6, 7, 8, 9]


def test_rvc_unequal_number_of_args(atable):
    # java:128-153 — 3-component LHS vs 2-component RHS compares the prefix
    rows = _rows(atable, "(a_integer, x_integer, y_integer) >= (7, 5)")
    assert sorted(r.a_integer for r in rows) == [7, 8, 9]


def test_rvc_bind_vars(atable):
    # java:155-180
    rows = _rows(atable, "(a_integer, x_integer) = (?, ?)", [7, 5])
    assert [(r.a_integer, r.x_integer) for r in rows] == [(7, 5)]


def test_rvc_lhs_vs_scalar_literal(atable):
    # java:182-205 — (a_integer, x_integer) >= 7 acts as the prefix compare
    rows = _rows(atable, "(a_integer, x_integer) >= 7")
    assert sorted(r.a_integer for r in rows) == [7, 8, 9]


def test_scalar_vs_rhs_rvc(atable):
    # java:207-230 — 7 <= (a_integer, x_integer), same three rows
    rows = _rows(atable, "7 <= (a_integer, x_integer)")
    assert sorted(r.a_integer for r in rows) == [7, 8, 9]
