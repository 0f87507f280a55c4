"""CastAndCoerceIT replay (end2end/CastAndCoerceIT.java) over the ATABLE
fixture (tests/atable.py) — the cross-type coercion matrix: CAST to DECIMAL
division, int/long/decimal and tinyint/smallint comparisons, and the
datetime↔numeric epoch-millis casts (PDateCodec: Phoenix DATE/TIME/
TIMESTAMP hold epoch ms, so CAST(date AS BIGINT) is a ms count and
CAST(n AS DATE) reads n as ms)."""

from __future__ import annotations

from decimal import Decimal

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
        warehouse=str(tmp_path_factory.mktemp("cc_wh")),
    )
    create_atable(e)
    return e


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_cast_operator_in_select(engine):
    # CastAndCoerceIT.java:59 — CAST to DECIMAL makes / a decimal division
    got = rows(engine, (
        f"SELECT CAST(a_integer AS decimal)/2 AS v FROM atable "
        f"WHERE '{TENANT}' = organization_id AND 5 = a_integer"
    ))
    assert len(got) == 1 and float(got[0][0]) == 2.5


def test_cast_operator_in_where(engine):
    # CastAndCoerceIT.java:77
    got = rows(engine, (
        f"SELECT a_integer FROM atable WHERE '{TENANT}' = organization_id "
        "AND 2.5 = CAST(a_integer AS DECIMAL)/2"
    ))
    assert got == [(5,)]


def test_coerce_integer_to_long(engine):
    # CastAndCoerceIT.java:95 — ROW7 (x_long=5 >= x_integer=5) and ROW9
    # (x_long=2147483648 >= 3); ROW8's x_long is < INT_MIN
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = '{TENANT}' "
        "AND x_long >= x_integer ORDER BY entity_id"
    ))
    assert [g[0] for g in got] == [ROWS[6], ROWS[8]]


def test_coerce_long_to_decimal(engine):
    # CastAndCoerceIT.java:116/:135 — only ROW9 has x_decimal(3.3) >
    # x_integer(3)
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = '{TENANT}' "
        "AND x_decimal > x_integer"
    ))
    assert [g[0] for g in got] == [ROWS[8]]
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = '{TENANT}' "
        "AND x_integer <= x_decimal"
    ))
    assert [g[0] for g in got] == [ROWS[8]]


def test_coerce_tinyint_to_smallint(engine):
    # CastAndCoerceIT.java:154 — only ROW9 (a_byte=9 >= a_short=0)
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = '{TENANT}' "
        "AND a_byte >= a_short"
    ))
    assert [g[0] for g in got] == [ROWS[8]]
    # :177 — explicit CAST form
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = "
        f"CAST('{TENANT}' AS varchar) AND CAST(a_byte AS smallint) >= a_short"
    ))
    assert [g[0] for g in got] == [ROWS[8]]


def test_coerce_date_to_bigint_roundtrip(engine):
    # CastAndCoerceIT.java:200 — CAST(date AS BIGINT) is epoch MILLIS and
    # CAST(ms AS DATE) reads it back to the same instant
    got = rows(engine, (
        f"SELECT entity_id, CAST(a_date AS BIGINT) AS ms FROM atable "
        f"WHERE organization_id = '{TENANT}' AND entity_id = '{ROWS[0]}'"
    ))
    assert len(got) == 1
    ms = got[0][1]
    assert isinstance(ms, int) and ms > 10**12  # 2024 epoch millis
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = '{TENANT}' "
        f"AND a_date = CAST({ms} AS DATE) AND entity_id = '{ROWS[0]}'"
    ))
    assert [g[0] for g in got] == [ROWS[0]]


def test_coerce_date_to_decimal_roundtrip(engine):
    # CAST(ts AS DECIMAL) keeps sub-millisecond fraction; the TIMESTAMP
    # round-trip restores the instant
    got = rows(engine, (
        f"SELECT CAST(a_date AS DECIMAL) AS d FROM atable "
        f"WHERE organization_id = '{TENANT}' AND entity_id = '{ROWS[0]}'"
    ))
    d = got[0][0]
    assert isinstance(d, Decimal) and d == d.to_integral_value()
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id = '{TENANT}' "
        f"AND a_date = CAST({d} AS TIMESTAMP) AND entity_id = '{ROWS[0]}'"
    ))
    assert [g[0] for g in got] == [ROWS[0]]
