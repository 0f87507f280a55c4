"""NullIT replay (end2end/NullIT.java) over the ATABLE fixture — Phoenix's
empty-byte-array null convention: '' stores as NULL for VARCHAR/CHAR
(PVarchar), IS NULL / IS NOT NULL over the x_decimal split, and
PHOENIX-6583's listed-vs-omitted column distinction (an explicit NULL in
the column list OVERWRITES the cell; an omitted column preserves it)."""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    from tests.atable import create_atable

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    create_atable(e)
    return e


def test_null_and_empty_string_value(engine):
    # NullIT.java:61-106 — '' and NULL store identically (empty byte array)
    for value in ("null", "''"):
        engine.sql(
            f"upsert into atable (organization_id, entity_id, a_string) "
            f"VALUES ('{TENANT}', '{ROWS[4]}', {value})"
        )
        got = engine.sql(
            f"SELECT a_string, b_string FROM atable WHERE "
            f"organization_id='{TENANT}' AND a_integer = 5"
        ).collect()
        assert len(got) == 1
        assert got[0].a_string is None
        assert got[0].b_string == "c"


def test_is_null_is_not_null(engine):
    # NullIT.java:109/:135 — x_decimal is set only on ROW7/8/9
    got = [
        r.entity_id
        for r in engine.sql(
            "SELECT entity_id FROM atable WHERE x_decimal IS NULL "
            "ORDER BY entity_id"
        ).collect()
    ]
    assert got == ROWS[:6]
    got = [
        r.entity_id
        for r in engine.sql(
            "SELECT entity_id FROM atable WHERE x_decimal IS NOT NULL "
            "ORDER BY entity_id"
        ).collect()
    ]
    assert got == ROWS[6:]


def test_binary_null_assignment_phoenix_6583(engine):
    # NullIT.java:156 — explicit NULL overwrites; a later value set and a
    # re-NULL round-trip all behave cell-wise
    engine.sql(
        "create table bin6583 (id integer not null, text varchar(255), "
        "testbin binary(16), CONSTRAINT pk primary key (id))"
    )
    q = "select id from bin6583 where testbin is null"
    engine.sql("upsert into bin6583 (id, text) values (1, 'anytext')")
    assert len(engine.sql(q).collect()) == 1
    engine.sql("upsert into bin6583 (id, text, testbin) values (1, 'anytext', null)")
    assert len(engine.sql(q).collect()) == 1
    engine.sql("upsert into bin6583 (id, text, testbin) values (1, 'anytext', 'a')")
    assert engine.sql(q).collect() == []
    engine.sql("upsert into bin6583 (id, text, testbin) values (1, 'anytext', null)")
    assert len(engine.sql(q).collect()) == 1
    # omitted column preserves the existing cell (contrast with the
    # explicit-NULL overwrite above)
    engine.sql("upsert into bin6583 (id, testbin) values (1, 'bb')")
    got = engine.sql("select text from bin6583 where id = 1").collect()
    assert got[0].text == "anytext"
