"""DerivedTableIT replay (end2end/DerivedTableIT.java) — the
SubselectRewriter flattening matrix: WHERE/GROUP BY/HAVING/ORDER BY/LIMIT/
OFFSET/DISTINCT/aggregate/join shapes inside and around derived tables over
the canonical ATABLE (a_byte = 1..9, a_string = a×4 b×4 c, b_string =
b,c,e repeating).

Adaptations: binds inlined; where the IT relies on Phoenix's implicit PK
scan order to pick WHICH rows a bare LIMIT/OFFSET returns, the replay adds
ORDER BY entity_id inside the derived table (the documented sort-contract
divergence) — the flattening shape under test is unchanged.  The
COLLECTDISTINCT tests are skipped: they exercise a custom Java UDF jar
(UDFExpression), the declared §2.12 scope boundary.
"""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT, create_atable
from tests.conftest import SF_TEST_DIR

A, B, C, E = "a", "b", "c", "e"
(ROW1, ROW2, ROW3, ROW4, ROW5, ROW6, ROW7, ROW8, ROW9) = ROWS


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("dt_wh")),
    )
    create_atable(e)
    return e


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_derived_with_where(engine):
    # DerivedTableIT.testDerivedTableWithWhere:140
    # (where)
    got = rows(engine, (
        "SELECT t.eid, t.x + 9 FROM (SELECT entity_id eid, b_string b, "
        "a_byte + 1 x FROM atable WHERE a_byte + 1 < 9) AS t ORDER BY t.eid"
    ))
    assert got == [(ROWS[i], i + 11) for i in range(7)]
    # () where
    got = rows(engine, (
        "SELECT t.eid, t.x + 9 FROM (SELECT entity_id eid, b_string b, "
        f"a_byte + 1 x FROM atable) AS t WHERE t.b = '{C}' ORDER BY t.eid"
    ))
    assert got == [(ROW2, 12), (ROW5, 15), (ROW8, 18)]
    # (where) where
    got = rows(engine, (
        "SELECT t.eid, t.x + 9 FROM (SELECT entity_id eid, b_string b, "
        "a_byte + 1 x FROM atable WHERE a_byte + 1 < 9) AS t "
        f"WHERE t.b = '{C}' ORDER BY t.eid"
    ))
    assert got == [(ROW2, 12), (ROW5, 15)]
    # (groupby where) where
    got = rows(engine, (
        "SELECT t.a, t.c, t.m FROM (SELECT a_string a, count(*) c, "
        "max(a_byte) m FROM atable WHERE a_byte != 8 GROUP BY a_string) AS t "
        "WHERE t.c > 1 ORDER BY t.a"
    ))
    assert got == [(A, 4, 4), (B, 3, 7)]
    # (groupby having where) where
    got = rows(engine, (
        "SELECT t.a, t.c, t.m FROM (SELECT a_string a, count(*) c, "
        "max(a_byte) m FROM atable WHERE a_byte != 8 GROUP BY a_string "
        f"HAVING count(*) >= 2) AS t WHERE t.a != '{A}'"
    ))
    assert got == [(B, 3, 7)]
    # (limit) where — LIMIT 2 in PK order is ROW1,ROW2 (ORDER BY added)
    got = rows(engine, (
        "SELECT t.eid FROM (SELECT entity_id eid, b_string b FROM atable "
        f"ORDER BY entity_id LIMIT 2) AS t WHERE t.b = '{C}'"
    ))
    assert got == [(ROW2,)]
    # ((where limit) where limit) limit
    got = rows(engine, (
        "SELECT u.eid FROM (SELECT t.eid FROM (SELECT entity_id eid, "
        f"b_string b FROM atable WHERE a_string = '{B}' "
        f"ORDER BY entity_id LIMIT 5) AS t WHERE t.b = '{C}' LIMIT 4) AS u "
        f"WHERE u.eid >= '{ROW1}' ORDER BY u.eid LIMIT 3"
    ))
    assert got == [(ROW5,), (ROW8,)]
    # (count) where
    got = rows(engine, (
        "SELECT t.c FROM (SELECT count(*) c FROM atable) AS t WHERE t.c > 0"
    ))
    assert got == [(9,)]
    # inner limit < outer offset: empty
    got = rows(engine, (
        "SELECT t.eid, t.x + 9 FROM (SELECT entity_id eid, b_string b, "
        "a_byte + 1 x FROM atable ORDER BY entity_id LIMIT 1 OFFSET 1) AS t "
        f"WHERE t.b = '{C}' OFFSET 2"
    ))
    assert got == []
    # (where) offset
    got = rows(engine, (
        "SELECT t.eid, t.x + 9 FROM (SELECT entity_id eid, b_string b, "
        "a_byte + 1 x FROM atable WHERE a_byte + 1 < 9 ORDER BY entity_id) "
        "AS t OFFSET 2"
    ))
    assert [g[0] for g in got] == [ROW3, ROW4, ROW5, ROW6, ROW7]
    # (offset) where
    got = rows(engine, (
        "SELECT t.eid, t.x + 9 FROM (SELECT entity_id eid, b_string b, "
        "a_byte + 1 x FROM atable ORDER BY entity_id OFFSET 4) AS t "
        f"WHERE t.b = '{C}' ORDER BY t.eid"
    ))
    assert got == [(ROW5, 15), (ROW8, 18)]


def test_derived_with_groupby(engine):
    # DerivedTableIT.testDerivedTableWithGroupBy:313
    # () groupby having
    got = rows(engine, (
        "SELECT t.a, count(*), max(t.s) FROM (SELECT a_string a, a_byte s "
        "FROM atable WHERE a_byte != 8) AS t GROUP BY t.a "
        "HAVING count(*) > 1 ORDER BY t.a"
    ))
    assert got == [(A, 4, 4), (B, 3, 7)]
    # (groupby) groupby
    got = rows(engine, (
        "SELECT t.c, count(*) FROM (SELECT count(*) c FROM atable "
        "GROUP BY a_string) AS t GROUP BY t.c ORDER BY t.c"
    ))
    assert got == [(1, 1), (4, 2)]
    # (groupby) groupby orderby
    got = rows(engine, (
        "SELECT t.c, count(*) FROM (SELECT count(*) c FROM atable "
        "GROUP BY a_string) AS t GROUP BY t.c ORDER BY count(*) DESC"
    ))
    assert got == [(4, 2), (1, 1)]
    # (orderby) groupby
    got = rows(engine, (
        "SELECT t.a_string, count(*) FROM (SELECT * FROM atable "
        "order by a_integer) AS t where a_byte != 8 group by t.a_string "
        "ORDER BY t.a_string"
    ))
    assert got == [(A, 4), (B, 3), (C, 1)]
    # (groupby) groupby orderby offset
    got = rows(engine, (
        "SELECT t.c, count(*) FROM (SELECT count(*) c FROM atable "
        "GROUP BY a_string) AS t GROUP BY t.c ORDER BY count(*) DESC OFFSET 1"
    ))
    assert got == [(1, 1)]


def test_derived_with_orderby(engine):
    # DerivedTableIT.testDerivedTableWithOrderBy:455
    by_b_eid = [ROW1, ROW4, ROW7, ROW2, ROW5, ROW8, ROW3, ROW6, ROW9]
    got = rows(engine, (
        "SELECT t.eid FROM (SELECT entity_id eid, b_string b FROM atable "
        "ORDER BY b, eid) AS t"
    ))
    assert [g[0] for g in got] == by_b_eid
    got = rows(engine, (
        "SELECT t.eid FROM (SELECT entity_id eid, b_string b FROM atable) "
        "AS t ORDER BY t.b, t.eid"
    ))
    assert [g[0] for g in got] == by_b_eid
    got = rows(engine, (
        "SELECT t.eid FROM (SELECT entity_id eid, b_string b FROM atable "
        "ORDER BY b, eid) AS t ORDER BY t.b DESC, t.eid DESC"
    ))
    assert [g[0] for g in got] == list(reversed(by_b_eid))
    # (limit) orderby
    got = rows(engine, (
        "SELECT t.eid FROM (SELECT entity_id eid, b_string b FROM atable "
        "ORDER BY entity_id LIMIT 2) AS t ORDER BY t.b DESC, t.eid"
    ))
    assert [g[0] for g in got] == [ROW2, ROW1]


def test_derived_with_limit_offset(engine):
    # DerivedTableIT.testDerivedTableWithLimit:554 / WithOffset:652
    q = ("SELECT t.eid FROM (SELECT entity_id eid FROM atable "
         "ORDER BY entity_id{inner}) AS t{outer}")
    assert [g[0] for g in rows(engine, q.format(inner=" LIMIT 2", outer=""))] == [ROW1, ROW2]
    assert [g[0] for g in rows(engine, q.format(inner="", outer=" LIMIT 2"))] == [ROW1, ROW2]
    # inner LIMIT 2 then outer LIMIT 4: min wins
    assert [g[0] for g in rows(engine, q.format(inner=" LIMIT 2", outer=" LIMIT 4"))] == [ROW1, ROW2]
    assert [g[0] for g in rows(engine, q.format(inner=" LIMIT 4", outer=" LIMIT 2"))] == [ROW1, ROW2]
    # (limit offset)
    assert [g[0] for g in rows(engine, q.format(inner=" LIMIT 2 OFFSET 1", outer=""))] == [ROW2, ROW3]
    # (offset) limit
    assert [g[0] for g in rows(engine, q.format(inner=" OFFSET 1", outer=" LIMIT 2"))] == [ROW2, ROW3]
    # (groupby orderby limit): top-2 sums
    got = rows(engine, (
        "SELECT a, s FROM (SELECT a_string a, sum(a_byte) s FROM atable "
        "GROUP BY a_string ORDER BY s DESC LIMIT 2) AS x ORDER BY a"
    ))
    assert got == [(A, 10), (B, 26)]


def test_derived_with_distinct(engine):
    # DerivedTableIT.testDerivedTableWithDistinct:749
    got = rows(engine, (
        "SELECT * FROM (SELECT DISTINCT a_string, b_string FROM atable) AS t "
        f"WHERE t.b_string != '{C}' ORDER BY t.b_string, t.a_string"
    ))
    assert got == [(A, B), (B, B), (A, E), (B, E), (C, E)]
    got = rows(engine, (
        "SELECT DISTINCT t.a, t.b FROM (SELECT a_string a, b_string b FROM "
        f"atable) AS t WHERE t.b != '{C}' ORDER BY t.b, t.a"
    ))
    assert got == [(A, B), (B, B), (A, E), (B, E), (C, E)]
    got = rows(engine, (
        "SELECT DISTINCT t.a FROM (SELECT DISTINCT a_string a, b_string b "
        "FROM atable) AS t ORDER BY t.a"
    ))
    assert [g[0] for g in got] == [A, B, C]
    got = rows(engine, (
        "SELECT distinct t.c FROM (SELECT count(*) c FROM atable "
        "GROUP BY a_string) AS t ORDER BY t.c"
    ))
    assert [g[0] for g in got] == [1, 4]
    got = rows(engine, (
        "SELECT distinct t.c FROM (SELECT count(*) c FROM atable "
        "GROUP BY a_string) AS t ORDER BY t.c DESC"
    ))
    assert [g[0] for g in got] == [4, 1]
    # distinct (limit)
    got = rows(engine, (
        "SELECT DISTINCT t.a, t.b FROM (SELECT a_string a, b_string b FROM "
        "atable ORDER BY a, b LIMIT 2) AS t ORDER BY t.a, t.b"
    ))
    assert got == [(A, B)]


def test_derived_with_aggregate(engine):
    # DerivedTableIT.testDerivedTableWithAggregate:856
    assert rows(engine, (
        "SELECT * FROM (SELECT count(*) c FROM atable WHERE a_byte != 8) AS t"
    )) == [(8,)]
    assert rows(engine, (
        "SELECT count(*) FROM (SELECT a_byte FROM atable) AS t "
        "WHERE t.a_byte != 8"
    )) == [(8,)]
    assert rows(engine, (
        "SELECT count(*) FROM (SELECT DISTINCT a_string FROM atable) AS t"
    )) == [(3,)]
    assert rows(engine, (
        "SELECT count(*) FROM (SELECT count(*) c FROM atable "
        "GROUP BY a_string) AS t"
    )) == [(3,)]
    assert rows(engine, (
        "SELECT count(*) FROM (SELECT entity_id FROM atable LIMIT 2) AS t"
    )) == [(2,)]
    # count (subquery)
    assert rows(engine, (
        "SELECT count(*) FROM (SELECT * FROM atable WHERE "
        "(organization_id, entity_id) in (SELECT organization_id, entity_id "
        "FROM atable WHERE a_byte != 8)) AS t"
    )) == [(8,)]
    # count (orderby)
    assert rows(engine, (
        "SELECT count(a_byte) FROM (SELECT * FROM atable order by a_integer) "
        "AS t where a_byte != 8"
    )) == [(8,)]


def test_derived_with_join(engine):
    # DerivedTableIT.testDerivedTableWithJoin:934
    got = rows(engine, (
        "SELECT q.id1, count(q.id2) FROM (SELECT t1.entity_id id1, "
        "t2.entity_id id2, t2.a_byte b2 FROM atable t1 JOIN atable t2 "
        "ON t1.a_string = t2.b_string WHERE t1.a_byte >= 8) AS q "
        "WHERE q.b2 != 5 GROUP BY q.id1 ORDER BY q.id1"
    ))
    assert got == [(ROW8, 3), (ROW9, 2)]
    got = rows(engine, (
        "SELECT DISTINCT q.id1 FROM (SELECT t1.entity_id id1, t2.a_byte b2 "
        "FROM atable t1 JOIN atable t2 ON t1.a_string = t2.b_string "
        "WHERE t1.a_byte >= 8) AS q WHERE q.b2 != 5 ORDER BY q.id1"
    ))
    assert [g[0] for g in got] == [ROW8, ROW9]
    got = rows(engine, (
        "SELECT COUNT(*) FROM (SELECT t2.a_byte b2 FROM atable t1 JOIN "
        "atable t2 ON t1.a_string = t2.b_string WHERE t1.a_byte >= 8) AS q "
        "WHERE q.b2 != 5"
    ))
    assert got == [(5,)]


def test_nested_derived_table(engine):
    # DerivedTableIT.testNestedDerivedTable:983 (binds inlined: 9/a/c/e and
    # 8/5; the IT's index DDL omitted — access-path invariance is covered by
    # the test_query_it_replay index matrix)
    got = rows(engine, (
        "SELECT q.id, q.x10 * 10 FROM (SELECT t.eid id, t.x + 9 x10, "
        "t.astr a, t.bstr b FROM (SELECT entity_id eid, a_string astr, "
        "b_string bstr, a_byte + 1 x FROM atable WHERE a_byte + 1 < 9) AS t "
        f"ORDER BY b, id) AS q WHERE q.a = '{A}' OR q.b = '{C}' OR q.b = '{E}'"
    ))
    assert got == [
        (ROW1, 110), (ROW4, 140), (ROW2, 120),
        (ROW5, 150), (ROW3, 130), (ROW6, 160),
    ]
    got = rows(engine, (
        "SELECT q1.id, q2.id FROM (SELECT t.eid id, t.astr a, t.bstr b FROM "
        "(SELECT entity_id eid, a_string astr, b_string bstr, a_byte abyte "
        "FROM atable) AS t WHERE t.abyte >= 8) AS q1 JOIN (SELECT t.eid id, "
        "t.astr a, t.bstr b, t.abyte x FROM (SELECT entity_id eid, "
        "a_string astr, b_string bstr, a_byte abyte FROM atable) AS t) AS q2 "
        "ON q1.a = q2.b WHERE q2.x != 5 ORDER BY q1.id, q2.id DESC"
    ))
    assert got == [
        (ROW8, ROW7), (ROW8, ROW4), (ROW8, ROW1),
        (ROW9, ROW8), (ROW9, ROW2),
    ]
