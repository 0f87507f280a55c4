"""OnDuplicateKey2IT replay (end2end/OnDuplicateKey2IT.java) — the atomic
upsert/delete RETURNING * contract plus executeUpdate counts:

  * an UPSERT fully ignored by ON DUPLICATE KEY IGNORE reports 0 mutations
    (testIgnoreReturnValue:112);
  * RETURNING * yields the POST-operation row — the inserted row, the
    EXISTING row when IGNORE skips, the updated row for UPDATE/UPDATE_ONLY
    with conditional CASE expressions (validateAtomicUpsertReturnRow:425);
  * partial-column upserts preserve unspecified cells (HBase put
    semantics);
  * DELETE ... RETURNING * yields the deleted rows; an unmatched predicate
    deletes (and returns) nothing.

Adaptation: the BSON payloads (json/sample_01.json) are opaque to the
scenario — compact JSON documents stand in; the engine's BSON type is the
JSON text representation."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

DOC1 = '{"attr_0": "str_val_0", "attr_1": 1295.03}'
DOC2 = '{"attr_0": "str_val_1", "rather": "hello"}'


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def t(engine):
    engine.sql(
        "CREATE TABLE odk2 (PK1 VARCHAR, PK2 DOUBLE NOT NULL, PK3 VARCHAR, "
        "COUNTER1 DOUBLE, COUNTER2 VARCHAR, COL3 BSON, COL4 INTEGER, "
        "CONSTRAINT pk PRIMARY KEY(PK1, PK2, PK3))"
    )
    return engine


def test_ignore_return_value(engine):
    # OnDuplicateKey2IT.java:112
    engine.sql(
        "create table odk2_c (pk varchar primary key, counter1 bigint, "
        "counter2 bigint)"
    )
    engine.sql("UPSERT INTO odk2_c VALUES('a',10)")
    n = engine.sql("UPSERT INTO odk2_c VALUES('a',0) ON DUPLICATE KEY IGNORE")
    assert n == 0
    # partially ignored batch counts only the inserted row
    n = engine.sql(
        "UPSERT INTO odk2_c VALUES('a',0), ('b',7) ON DUPLICATE KEY IGNORE"
    )
    assert n == 1


def test_atomic_upsert_return_row(t):
    # validateAtomicUpsertReturnRow (OnDuplicateKey2IT.java:425-455)
    # step a: IGNORE inserts the absent row; RETURNING * = the new row
    row = t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1, COL3, COL4) VALUES("
        f"'pk000', -123.98, 'pk003', 1011.202, '{DOC1}', 123) "
        "ON DUPLICATE KEY IGNORE RETURNING *"
    ).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.pk1, r.pk2, r.pk3) == ("pk000", -123.98, "pk003")
    assert r.counter1 == 1011.202 and r.counter2 is None
    assert r.col4 == 123

    # step b: IGNORE on the existing key — RETURNING * = the EXISTING row
    row = t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1) VALUES("
        "'pk000', -123.98, 'pk003', 0) ON DUPLICATE KEY IGNORE RETURNING *"
    ).collect()
    assert len(row) == 1 and row[0].counter1 == 1011.202

    # step c: plain partial-column upsert — COL3/COL4 cells survive
    t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1, COUNTER2) VALUES("
        "'pk000', -123.98, 'pk003', 234, 'col2_000')"
    )
    r = t.table("odk2").collect()[0]
    assert r.counter1 == 234.0 and r.counter2 == "col2_000"
    assert r.col4 == 123  # preserved

    # step d: conditional CASE atomic update touching four columns
    row = t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3) VALUES('pk000', -123.98, 'pk003') "
        "ON DUPLICATE KEY UPDATE "
        "COUNTER1 = CASE WHEN COUNTER1 < 2000 THEN COUNTER1 + 1999.99 "
        "ELSE COUNTER1 END, "
        "COUNTER2 = CASE WHEN COUNTER2 = 'col2_000' THEN 'col2_001' "
        "ELSE COUNTER2 END, "
        f"COL3 = '{DOC2}', COL4 = 234 RETURNING *"
    ).collect()
    assert len(row) == 1
    r = row[0]
    assert r.counter1 == 2233.99 and r.counter2 == "col2_001"
    assert r.col4 == 234

    # step e: the same conditions no longer fire (post-state unchanged)
    row = t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3) VALUES('pk000', -123.98, 'pk003') "
        "ON DUPLICATE KEY UPDATE "
        "COUNTER1 = CASE WHEN COUNTER1 < 2000 THEN COUNTER1 + 1999.99 "
        "ELSE COUNTER1 END, "
        "COUNTER2 = CASE WHEN COUNTER2 = 'col2_000' THEN 'col2_001' "
        "ELSE COUNTER2 END RETURNING *"
    ).collect()
    assert len(row) == 1
    assert row[0].counter1 == 2233.99 and row[0].counter2 == "col2_001"


def test_atomic_upsert_update_only_return_row(t):
    # validateAtomicUpsertOnlyReturnRow (OnDuplicateKey2IT.java:457-491)
    t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1, COL3, COL4) VALUES("
        f"'pk000', -123.98, 'pk003', 1011.202, '{DOC1}', 123) "
        "ON DUPLICATE KEY IGNORE"
    )
    t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1, COUNTER2) VALUES("
        "'pk000', -123.98, 'pk003', 234, 'col2_000')"
    )
    row = t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3) VALUES('pk000', -123.98, 'pk003') "
        "ON DUPLICATE KEY UPDATE_ONLY "
        "COUNTER1 = CASE WHEN COUNTER1 < 2000 THEN COUNTER1 + 1999.99 "
        "ELSE COUNTER1 END, "
        "COUNTER2 = CASE WHEN COUNTER2 = 'col2_000' THEN 'col2_001' "
        "ELSE COUNTER2 END, "
        f"COL3 = '{DOC2}', COL4 = 234 RETURNING *"
    ).collect()
    assert len(row) == 1
    assert row[0].counter1 == 2233.99 and row[0].counter2 == "col2_001"
    # UPDATE_ONLY on an ABSENT key: nothing written, nothing returned
    row = t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3) VALUES('nope', 1.0, 'x') "
        "ON DUPLICATE KEY UPDATE_ONLY COUNTER1 = COUNTER1 + 1 RETURNING *"
    ).collect()
    assert row == []


def test_delete_returning(t):
    # validateReturnedRowAfterDelete / validateMultiRowDelete (:509-545)
    t.sql(
        "UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1, COUNTER2, COL4) VALUES("
        "'pk000', -123.98, 'pk003', 2233.99, 'col2_001', 234)"
    )
    # predicate misses (COL4 = 235): nothing deleted, nothing returned
    got = t.sql(
        "DELETE FROM odk2 WHERE PK1 = 'pk000' AND PK2 = -123.98 AND "
        "PK3 = 'pk003' AND COL4 = 235 RETURNING *"
    ).collect()
    assert got == []
    # predicate hits: the deleted row comes back, then the table is empty
    got = t.sql(
        "DELETE FROM odk2 WHERE PK1 = 'pk000' AND PK2 = -123.98 AND "
        "PK3 = 'pk003' AND COL4 = 234 RETURNING *"
    ).collect()
    assert len(got) == 1 and got[0].counter2 == "col2_001"
    assert t.table("odk2").collect() == []
    # multi-row delete with IN predicates (addRows :493)
    for pk1, pk3 in (("pk001", "pk004"), ("pk001", "pk005"), ("pk003", "pk005")):
        t.sql(
            f"UPSERT INTO odk2 (PK1, PK2, PK3, COUNTER1, COUNTER2) VALUES("
            f"'{pk1}', 122.34, '{pk3}', 23, 'col2_001')"
        )
    got = t.sql(
        "DELETE FROM odk2 WHERE PK1 IN ('pk001') AND PK2 IN (122.34) "
        "AND PK3 IN ('pk004', 'pk005') RETURNING *"
    ).collect()
    assert len(got) == 2
    assert [r.pk1 for r in t.table("odk2").collect()] == ["pk003"]
    # unconditional DELETE clears the table
    t.sql("DELETE FROM odk2")
    assert t.table("odk2").collect() == []
