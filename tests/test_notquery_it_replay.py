"""NotQueryIT replay (end2end/NotQueryIT.java) over the ATABLE fixture —
NOT IN lists and != comparisons per numeric type, including the FLOAT
precision trap: Phoenix coerces comparison literals to the COLUMN's type,
so a_float NOT IN (0.01, ...) compares at float precision
(sqlfront._rewrite_float_literal_cmp); Spark's double promotion would
silently exclude nothing."""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT
from tests.conftest import SF_TEST_DIR


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    from tests.atable import create_atable

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("nq_wh")),
    )
    create_atable(e)
    return e


def vals(engine, sql):
    return [r[0] for r in engine.sql(sql).collect()]


def test_not_in_list(engine):
    # NotQueryIT.java:55 — entity_id NOT IN (ROW2,ROW4,ROW1,ROW5,ROW7,ROW8)
    excl = ", ".join(f"'{ROWS[i]}'" for i in (1, 3, 0, 4, 6, 7))
    got = vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        f"AND entity_id NOT IN ({excl}) ORDER BY entity_id"
    ))
    assert got == [ROWS[2], ROWS[5], ROWS[8]]


def test_not_in_list_of_float(engine):
    # NotQueryIT.java:83 — float-precision NOT IN
    got = vals(engine, (
        f"SELECT a_float FROM atable WHERE organization_id='{TENANT}' "
        "AND a_float NOT IN (0.01, 0.02, 0.03, 0.04, 0.05, 0.06) "
        "ORDER BY a_float"
    ))
    assert [round(float(v), 6) for v in got] == [0.07, 0.08, 0.09]


def test_not_in_list_of_double(engine):
    # NotQueryIT.java:111
    got = vals(engine, (
        f"SELECT a_double FROM atable WHERE organization_id='{TENANT}' "
        "AND a_double NOT IN (0.0001, 0.0002, 0.0003, 0.0004, 0.0005, 0.0006) "
        "ORDER BY a_double"
    ))
    assert got == [0.0007, 0.0008, 0.0009]


def test_not_equals(engine):
    # NotQueryIT.java:139 — with an inline `--` comment
    got = vals(engine, (
        "SELECT entity_id -- and here comment\n FROM atable "
        f"WHERE organization_id='{TENANT}' AND a_integer != 1 "
        "AND a_integer <= 2"
    ))
    assert got == [ROWS[1]]


def test_not_equals_by_tinyint_and_float(engine):
    # NotQueryIT.java:157/:193
    got = vals(engine, (
        f"SELECT a_byte FROM atable WHERE organization_id='{TENANT}' "
        "AND a_byte != 1 AND a_byte <= 2"
    ))
    assert got == [2]
    got = vals(engine, (
        f"SELECT a_float FROM atable WHERE organization_id='{TENANT}' "
        "AND a_float != 0.01 AND a_float <= 0.02"
    ))
    assert [round(float(v), 6) for v in got] == [0.02]
