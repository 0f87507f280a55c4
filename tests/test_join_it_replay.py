"""HashJoinIT replay over the reference's shared join fixture.

Scenarios and inline expected values from HashJoinIT.java (phoenix-core/
src/it/java/org/apache/phoenix/end2end/join/HashJoinIT.java, file:line per
test); fixture from tests/jointables.py (BaseJoinIT.java).

Adaptations (each noted at the test):
  * JDBC ``getInt`` renders a NULL aggregate/int as 0 — expected values here
    use ``None`` for those rows (the true SQL value).
  * Queries the reference runs without ORDER BY but asserts in row-key
    order get an explicit ORDER BY reproducing that order (Phoenix scans
    return PK order; Spark makes no such promise).
  * The reference's mixed alias/table-name qualification of the SAME
    relation (HashJoinIT.java:182 query[2]) and parenthesized comma-group
    FROM lists (:491 query[3]) are Phoenix grammar quirks Spark rejects —
    the semantically identical alias-consistent forms are replayed instead.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from tests.conftest import SF_TEST_DIR
from tests.jointables import create_join_tables


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("join_wh")),
    )
    create_join_tables(e)
    return e


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def dt(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


# --- testDefaultJoin / testInnerJoin (HashJoinIT.java:55-161) ----------------

INNER_EXPECTED = [
    ("0000000001", "T1", "0000000001", "S1"),
    ("0000000002", "T2", "0000000001", "S1"),
    ("0000000003", "T3", "0000000002", "S2"),
    ("0000000004", "T4", "0000000002", "S2"),
    ("0000000005", "T5", "0000000005", "S5"),
    ("0000000006", "T6", "0000000006", "S6"),
]


def test_default_join(engine):
    got = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jitem item JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id ORDER BY item.item_id"
    ))
    assert got == INNER_EXPECTED


def test_inner_join_with_sequence(engine):
    # HashJoinIT.java:65 — the select list carries NEXT VALUE FOR seq; the
    # reference asserts values 1..6 in item order.  Sequence-assignment
    # order is row order, so the seq column must be 1..6 over the ordered
    # result.
    engine.sql("CREATE SEQUENCE join_seq")
    got = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name, "
        "NEXT VALUE FOR join_seq FROM jitem item INNER JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id ORDER BY item.item_id"
    ))
    assert [g[:4] for g in got] == INNER_EXPECTED
    assert sorted(g[4] for g in got) == [1, 2, 3, 4, 5, 6]


def test_left_join(engine):
    # HashJoinIT.java:169 — variants 0 (aliased) and 1 (table-name
    # qualified); variant 2 mixes both for one relation (Phoenix quirk).
    for sql in (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jitem item LEFT JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id ORDER BY item_id",
        "SELECT jitem.item_id, jitem.name, jsupplier.supplier_id, "
        "jsupplier.name FROM jitem LEFT JOIN jsupplier "
        "ON jitem.supplier_id = jsupplier.supplier_id ORDER BY item_id",
    ):
        got = rows(engine, sql)
        assert got == INNER_EXPECTED + [("invalid001", "INVALID-1", None, None)]


def test_right_join(engine):
    got = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jsupplier supp RIGHT JOIN jitem item "
        "ON item.supplier_id = supp.supplier_id ORDER BY item_id"
    ))
    assert got == INNER_EXPECTED + [("invalid001", "INVALID-1", None, None)]


def test_inner_join_with_prefilters(engine):
    # HashJoinIT.java:289 — extra ON conditions on one side act as
    # pre-filters of that side, not post-filters of the join.
    got1 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jitem item INNER JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id "
        "AND supp.supplier_id BETWEEN '0000000001' AND '0000000005' "
        "ORDER BY item_id"
    ))
    assert got1 == INNER_EXPECTED[:5]
    got2 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jitem item INNER JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id "
        "AND (supp.supplier_id = '0000000001' OR supp.supplier_id = '0000000005') "
        "ORDER BY item_id"
    ))
    assert got2 == [INNER_EXPECTED[0], INNER_EXPECTED[1], INNER_EXPECTED[4]]


def test_join_with_postfilters(engine):
    # HashJoinIT.java:408 — WHERE over outer-join results: the NULL-extended
    # rows fail the predicate (3VL), effectively inner semantics.
    got1 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jsupplier supp RIGHT JOIN jitem item "
        "ON item.supplier_id = supp.supplier_id "
        "WHERE supp.supplier_id BETWEEN '0000000001' AND '0000000005' "
        "ORDER BY item_id"
    ))
    assert got1 == INNER_EXPECTED[:5]
    got2 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jitem item LEFT JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id "
        "WHERE supp.supplier_id = '0000000001' OR supp.supplier_id = '0000000005' "
        "ORDER BY item_id"
    ))
    assert got2 == [INNER_EXPECTED[0], INNER_EXPECTED[1], INNER_EXPECTED[4]]


# --- testStarJoin (HashJoinIT.java:474) --------------------------------------

STAR_EXPECTED = [
    ("000000000000001", "C4", "T1", 1000, dt("2013-11-22 14:22:56")),
    ("000000000000002", "C3", "T6", 2000, dt("2013-11-25 10:06:29")),
    ("000000000000003", "C2", "T2", 3000, dt("2013-11-25 16:45:07")),
    ("000000000000004", "C4", "T6", 4000, dt("2013-11-26 13:26:04")),
    ("000000000000005", "C5", "T3", 5000, dt("2013-11-27 09:37:50")),
]


def test_star_join(engine):
    for sql in (
        "SELECT order_id, c.name, i.name iname, quantity, o.odate "
        "FROM jorder o JOIN jcustomer c ON o.customer_id = c.customer_id "
        "JOIN jitem i ON o.item_id = i.item_id ORDER BY order_id",
        "SELECT order_id, c.name, i.name iname, quantity, o.odate "
        "FROM jorder o, jcustomer c, jitem i "
        "WHERE o.item_id = i.item_id AND o.customer_id = c.customer_id "
        "ORDER BY order_id",
    ):
        assert rows(engine, sql) == STAR_EXPECTED


# --- aggregation over joins (HashJoinIT.java:549-705) ------------------------

def test_left_join_with_aggregation(engine):
    got1 = rows(engine, (
        "SELECT i.name, sum(quantity) FROM jorder o LEFT JOIN jitem i "
        "ON o.item_id = i.item_id GROUP BY i.name ORDER BY i.name"
    ))
    assert got1 == [("T1", 1000), ("T2", 3000), ("T3", 5000), ("T6", 6000)]
    got2 = rows(engine, (
        "SELECT i.item_id iid, sum(quantity) q FROM jorder o LEFT JOIN "
        "jitem i ON o.item_id = i.item_id GROUP BY i.item_id ORDER BY q DESC"
    ))
    assert got2 == [
        ("0000000006", 6000), ("0000000003", 5000),
        ("0000000002", 3000), ("0000000001", 1000),
    ]
    # sum over no matched orders is NULL (the IT's getInt renders 0)
    got3 = rows(engine, (
        "SELECT i.item_id iid, sum(quantity) q FROM jitem i LEFT JOIN "
        "jorder o ON o.item_id = i.item_id GROUP BY i.item_id "
        "ORDER BY q DESC NULLS LAST, iid"
    ))
    assert got3 == [
        ("0000000006", 6000), ("0000000003", 5000), ("0000000002", 3000),
        ("0000000001", 1000), ("0000000004", None), ("0000000005", None),
        ("invalid001", None),
    ]


def test_right_join_with_aggregation(engine):
    got1 = rows(engine, (
        "SELECT i.name, sum(quantity) FROM jorder o RIGHT JOIN jitem i "
        "ON o.item_id = i.item_id GROUP BY i.name ORDER BY i.name"
    ))
    assert got1 == [
        ("INVALID-1", None), ("T1", 1000), ("T2", 3000), ("T3", 5000),
        ("T4", None), ("T5", None), ("T6", 6000),
    ]
    got2 = rows(engine, (
        "SELECT i.item_id iid, sum(quantity) q FROM jorder o RIGHT JOIN "
        "jitem i ON o.item_id = i.item_id GROUP BY i.item_id "
        "ORDER BY q DESC NULLS LAST, iid"
    ))
    assert got2 == [
        ("0000000006", 6000), ("0000000003", 5000), ("0000000002", 3000),
        ("0000000001", 1000), ("0000000004", None), ("0000000005", None),
        ("invalid001", None),
    ]


# --- mixed left/right join trees (HashJoinIT.java:708-943) -------------------

LEFT_RIGHT_Q1_EXPECTED = [
    (None, None, "S5", None, None),
    (None, None, "S4", None, None),
    (None, None, "S3", None, None),
    ("000000000000001", "T1", "S1", 1000, dt("2013-11-22 14:22:56")),
    ("000000000000002", "T6", "S6", 2000, dt("2013-11-25 10:06:29")),
    ("000000000000003", "T2", "S1", 3000, dt("2013-11-25 16:45:07")),
    ("000000000000004", "T6", "S6", 4000, dt("2013-11-26 13:26:04")),
    ("000000000000005", "T3", "S2", 5000, dt("2013-11-27 09:37:50")),
]


def test_left_right_join(engine):
    # (o LEFT JOIN i) RIGHT JOIN s — left-associative
    got1 = rows(engine, (
        "SELECT order_id, i.name, s.name, quantity, odate FROM jorder o "
        "LEFT JOIN jitem i ON o.item_id = i.item_id "
        "RIGHT JOIN jsupplier s ON i.supplier_id = s.supplier_id "
        "ORDER BY order_id, s.supplier_id DESC"
    ))
    assert got1 == LEFT_RIGHT_Q1_EXPECTED
    # o LEFT JOIN (i RIGHT JOIN s) — parenthesized join tree
    got2 = rows(engine, (
        "SELECT order_id, i.name, s.name, quantity, odate FROM jorder o "
        "LEFT JOIN (jitem i RIGHT JOIN jsupplier s "
        "ON i.supplier_id = s.supplier_id) ON o.item_id = i.item_id "
        "ORDER BY order_id, s.supplier_id DESC"
    ))
    assert got2 == LEFT_RIGHT_Q1_EXPECTED[3:]


def test_multi_left_join(engine):
    for sql in (
        "SELECT order_id, i.name, s.name, quantity, odate FROM jorder o "
        "LEFT JOIN jitem i ON o.item_id = i.item_id "
        "LEFT JOIN jsupplier s ON i.supplier_id = s.supplier_id "
        "ORDER BY order_id",
        "SELECT order_id, i.name, s.name, quantity, odate FROM jorder o "
        "LEFT JOIN (jitem i LEFT JOIN jsupplier s "
        "ON i.supplier_id = s.supplier_id) ON o.item_id = i.item_id "
        "ORDER BY order_id",
    ):
        assert rows(engine, sql) == LEFT_RIGHT_Q1_EXPECTED[3:]


def test_multi_right_join(engine):
    got = rows(engine, (
        "SELECT order_id, i.name, s.name, quantity, odate FROM jorder o "
        "RIGHT JOIN jitem i ON o.item_id = i.item_id "
        "RIGHT JOIN jsupplier s ON i.supplier_id = s.supplier_id "
        "ORDER BY order_id, s.supplier_id DESC"
    ))
    assert got == [
        (None, "T5", "S5", None, None),
        (None, None, "S4", None, None),
        (None, None, "S3", None, None),
        (None, "T4", "S2", None, None),
    ] + LEFT_RIGHT_Q1_EXPECTED[3:]


# --- join-key semantics (HashJoinIT.java:1340-1431) --------------------------

def test_join_multi_join_keys_null_safe(engine):
    # HashJoinIT.java:1340 — C3's and S3's loc_id are both NULL and the
    # rows MATCH: Phoenix join keys are byte-concatenated with NULL as
    # empty (TupleUtil.getConcatenatedValue), i.e. null-safe equality.
    got = rows(engine, (
        "SELECT c.name, s.name FROM jcustomer c LEFT JOIN jsupplier s "
        "ON customer_id = supplier_id AND c.loc_id = s.loc_id "
        "AND substr(s.name, 2, 1) = substr(c.name, 2, 1) "
        "ORDER BY customer_id"
    ))
    assert got == [
        ("C1", "S1"), ("C2", None), ("C3", "S3"),
        ("C4", None), ("C5", "S5"), ("C6", None),
    ]


def test_join_with_different_numeric_join_key_types(engine):
    # expression join key with decimal division (HashJoinIT.java:1374)
    got = rows(engine, (
        "SELECT order_id, i.name, i.price, discount2, quantity FROM jorder o "
        "INNER JOIN jitem i ON o.item_id = i.item_id "
        "AND o.price = (i.price * (100 - discount2)) / 100.0 "
        "WHERE quantity < 5000"
    ))
    assert got == [("000000000000004", "T6", 600, 15, 4000)]


def test_join_with_different_date_join_key_types(engine):
    # TIMESTAMP key = DATE key: Phoenix DATE carries time, so the exact
    # datetimes match (HashJoinIT.java:1397)
    got = rows(engine, (
        "SELECT order_id, c.name, o.odate FROM jorder o INNER JOIN "
        "jcustomer c ON o.customer_id = c.customer_id AND o.odate = c.cdate "
        "ORDER BY order_id"
    ))
    assert got == [
        ("000000000000001", "C4", dt("2013-11-22 14:22:56")),
        ("000000000000002", "C3", dt("2013-11-25 10:06:29")),
        ("000000000000003", "C2", dt("2013-11-25 16:45:07")),
        ("000000000000005", "C5", dt("2013-11-27 09:37:50")),
    ]


def test_self_join(engine):
    got1 = rows(engine, (
        "SELECT i2.item_id, i1.name FROM jitem i1 JOIN jitem i2 "
        "ON i1.item_id = i2.item_id ORDER BY i1.item_id"
    ))
    assert got1 == [
        ("0000000001", "T1"), ("0000000002", "T2"), ("0000000003", "T3"),
        ("0000000004", "T4"), ("0000000005", "T5"), ("0000000006", "T6"),
        ("invalid001", "INVALID-1"),
    ]
    got2 = rows(engine, (
        "SELECT i1.name, i2.name FROM jitem i1 JOIN jitem i2 "
        "ON i1.item_id = i2.supplier_id ORDER BY i1.name, i2.name"
    ))
    assert got2 == [
        ("T1", "T1"), ("T1", "T2"), ("T2", "T3"),
        ("T2", "T4"), ("T5", "T5"), ("T6", "T6"),
    ]


# --- UPSERT SELECT over joins (HashJoinIT.java:1618) -------------------------

def test_upsert_with_join(engine):
    engine.sql(
        "CREATE TABLE join_upsert_tmp (order_id varchar not null, "
        "item_name varchar not null, supplier_name varchar, "
        "quantity integer, odate timestamp "
        "CONSTRAINT pk PRIMARY KEY (order_id, item_name))"
    )
    engine.sql(
        "UPSERT INTO join_upsert_tmp (order_id, item_name, supplier_name, "
        "quantity, odate) SELECT order_id, i.name, s.name, quantity, odate "
        "FROM jorder o LEFT JOIN jitem i ON o.item_id = i.item_id "
        "LEFT JOIN jsupplier s ON i.supplier_id = s.supplier_id"
    )
    engine.sql(
        "UPSERT INTO join_upsert_tmp (order_id, item_name, quantity) "
        "SELECT 'ORDER_SUM', i.name, sum(quantity) FROM jorder o "
        "LEFT JOIN jitem i ON o.item_id = i.item_id GROUP BY i.name "
        "ORDER BY i.name"
    )
    got = rows(engine, (
        "SELECT order_id, item_name, supplier_name, quantity "
        "FROM join_upsert_tmp ORDER BY order_id, item_name"
    ))
    assert got == [
        ("000000000000001", "T1", "S1", 1000),
        ("000000000000002", "T6", "S6", 2000),
        ("000000000000003", "T2", "S1", 3000),
        ("000000000000004", "T6", "S6", 4000),
        ("000000000000005", "T3", "S2", 5000),
        ("ORDER_SUM", "T1", None, 1000),
        ("ORDER_SUM", "T2", None, 3000),
        ("ORDER_SUM", "T3", None, 5000),
        ("ORDER_SUM", "T6", None, 6000),
    ]


def test_upsert_with_self_join_phoenix_1182(engine):
    engine.sql(
        "CREATE TABLE join_src_1182 (tid CHAR(3) NOT NULL, "
        "a UNSIGNED_INT NOT NULL, b UNSIGNED_INT NOT NULL "
        "CONSTRAINT pk PRIMARY KEY (tid, a, b))"
    )
    engine.sql(
        "CREATE TABLE join_dst_1182 (tid CHAR(3) NOT NULL, "
        "a UNSIGNED_INT NOT NULL, b UNSIGNED_INT NOT NULL, "
        "cnt UNSIGNED_INT CONSTRAINT pk PRIMARY KEY (tid, a, b))"
    )
    for a, b in [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2)]:
        engine.sql(f"UPSERT INTO join_src_1182 (tid, a, b) VALUES ('1', {a}, {b})")
    engine.sql(
        "UPSERT INTO join_dst_1182 (tid, a, b, cnt) "
        "SELECT t1.tid, t1.a, t2.a, COUNT(*) FROM join_src_1182 t1 "
        "INNER JOIN join_src_1182 t2 ON t1.b = t2.b "
        "WHERE t1.a != t2.a AND t1.tid = '1' AND t2.tid = '1' "
        "GROUP BY t1.tid, t1.a, t2.a"
    )
    got = rows(engine, "SELECT * FROM join_dst_1182 ORDER BY a")
    assert got == [("1", 1, 2, 2), ("1", 2, 1, 2)]


# --- sub-join trees + derived tables (HashJoinIT.java:1766-2271) -------------

def test_sub_join_aggregate(engine):
    got = rows(engine, (
        "SELECT i.name, count(c.name) c_cnt, min(s.name) s_min, "
        "max(quantity) q_max FROM jorder o LEFT JOIN "
        "(jsupplier s RIGHT JOIN jitem i ON i.supplier_id = s.supplier_id) "
        "ON o.item_id = i.item_id LEFT JOIN jcustomer c "
        "ON c.customer_id = o.customer_id GROUP BY i.name ORDER BY i.name"
    ))
    assert got == [
        ("T1", 1, "S1", 1000), ("T2", 1, "S1", 3000),
        ("T3", 1, "S2", 5000), ("T6", 2, "S6", 4000),
    ]


def test_sub_join_wide(engine):
    # HashJoinIT.java:1776 query2 — SELECT * over a 4-table nested join;
    # replayed with an explicit select list (the wildcard's column ordering
    # across join sides is Phoenix display-specific).
    got = rows(engine, (
        "SELECT c.customer_id, c.name, c.loc_id, c.cdate, o.order_id, "
        "o.price, o.quantity, o.odate, i.item_id, i.name, i.description, "
        "s.supplier_id, s.name, s.loc_id "
        "FROM jcustomer c INNER JOIN (jorder o INNER JOIN "
        "(jsupplier s RIGHT JOIN jitem i ON i.supplier_id = s.supplier_id) "
        "ON o.item_id = i.item_id) ON c.customer_id = o.customer_id "
        "WHERE c.customer_id <= '0000000005' "
        "AND order_id != '000000000000003' AND i.name != 'T3' "
        "ORDER BY c.customer_id, i.name"
    ))
    assert got == [
        ("0000000003", "C3", None, dt("2013-11-25 10:06:29"),
         "000000000000002", 552, 2000, dt("2013-11-25 10:06:29"),
         "0000000006", "T6", "Item T6", "0000000006", "S6", "10006"),
        ("0000000004", "C4", "10004", dt("2013-11-22 14:22:56"),
         "000000000000001", 100, 1000, dt("2013-11-22 14:22:56"),
         "0000000001", "T1", "Item T1", "0000000001", "S1", "10001"),
        ("0000000004", "C4", "10004", dt("2013-11-22 14:22:56"),
         "000000000000004", 510, 4000, dt("2013-11-26 13:26:04"),
         "0000000006", "T6", "Item T6", "0000000006", "S6", "10006"),
    ]


def test_join_with_subquery(engine):
    got1 = rows(engine, (
        "SELECT item.item_id, item.name, supp.sid, supp.name FROM jitem item "
        "INNER JOIN (SELECT reverse(loc_id) rl, supplier_id sid, name FROM "
        "jsupplier WHERE name BETWEEN 'S1' AND 'S5') AS supp "
        "ON item.supplier_id = supp.sid ORDER BY item_id"
    ))
    assert got1 == INNER_EXPECTED[:5]
    got2 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name FROM "
        "jitem item INNER JOIN (SELECT reverse(loc_id) rl, supplier_id, name "
        "FROM jsupplier) AS supp ON item.supplier_id = supp.supplier_id "
        "AND (supp.name = 'S1' OR supp.name = 'S5') ORDER BY item_id"
    ))
    assert got2 == [INNER_EXPECTED[0], INNER_EXPECTED[1], INNER_EXPECTED[4]]


def test_join_with_subquery_post_filters(engine):
    # derived tables with LIMIT / ORDER BY ... OFFSET (HashJoinIT.java:1968)
    got1 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name FROM "
        "jitem item INNER JOIN (SELECT reverse(loc_id) rl, supplier_id, name "
        "FROM jsupplier ORDER BY supplier_id LIMIT 5) AS supp "
        "ON item.supplier_id = supp.supplier_id AND (supp.name != 'S1') "
        "ORDER BY item_id"
    ))
    assert got1 == INNER_EXPECTED[2:5]
    got2 = rows(engine, (
        "SELECT item.item_id, item.name, supp.supplier_id, supp.name FROM "
        "jitem item INNER JOIN (SELECT reverse(loc_id) rl, supplier_id, name "
        "FROM jsupplier ORDER BY supplier_id OFFSET 2) AS supp "
        "ON item.supplier_id = supp.supplier_id AND (supp.name != 'S1') "
        "ORDER BY item_id"
    ))
    assert got2 == [INNER_EXPECTED[4], INNER_EXPECTED[5]]


def test_join_with_subquery_and_aggregation(engine):
    got1 = rows(engine, (
        "SELECT i.name, sum(quantity) FROM jorder o LEFT JOIN "
        "(SELECT name, item_id iid FROM jitem) AS i ON o.item_id = i.iid "
        "GROUP BY i.name ORDER BY i.name"
    ))
    assert got1 == [("T1", 1000), ("T2", 3000), ("T3", 5000), ("T6", 6000)]
    got2 = rows(engine, (
        "SELECT o.iid, sum(o.quantity) q FROM "
        "(SELECT item_id iid, quantity FROM jorder) AS o LEFT JOIN "
        "(SELECT item_id FROM jitem) AS i ON o.iid = i.item_id "
        "GROUP BY o.iid ORDER BY q DESC"
    ))
    assert got2 == [
        ("0000000006", 6000), ("0000000003", 5000),
        ("0000000002", 3000), ("0000000001", 1000),
    ]
    got3 = rows(engine, (
        "SELECT i.iid, o.q FROM (SELECT item_id iid FROM jitem) AS i "
        "LEFT JOIN (SELECT item_id iid, sum(quantity) q FROM jorder "
        "GROUP BY item_id) AS o ON o.iid = i.iid "
        "ORDER BY o.q DESC NULLS LAST, i.iid"
    ))
    assert got3 == [
        ("0000000006", 6000), ("0000000003", 5000), ("0000000002", 3000),
        ("0000000001", 1000), ("0000000004", None), ("0000000005", None),
        ("invalid001", None),
    ]
    got4 = rows(engine, (
        "SELECT i.iid, o.q FROM (SELECT item_id iid, sum(quantity) q FROM "
        "jorder GROUP BY item_id) AS o JOIN (SELECT item_id iid FROM jitem) "
        "AS i ON o.iid = i.iid ORDER BY o.q DESC, i.iid"
    ))
    assert got4 == [
        ("0000000006", 6000), ("0000000003", 5000),
        ("0000000002", 3000), ("0000000001", 1000),
    ]


def test_nested_subqueries(engine):
    got = rows(engine, (
        "SELECT q.iname, count(c.name) c_cnt, min(q.sname) s_min, "
        "max(o.quantity) q_max FROM "
        "(SELECT customer_id cid, item_id iid, quantity FROM jorder) AS o "
        "LEFT JOIN (SELECT i.iid iid, s.name sname, i.name iname FROM "
        "(SELECT supplier_id sid, name FROM jsupplier) AS s RIGHT JOIN "
        "(SELECT item_id iid, name, supplier_id sid FROM jitem) AS i "
        "ON i.sid = s.sid) AS q ON o.iid = q.iid "
        "LEFT JOIN (SELECT customer_id cid, name FROM jcustomer) AS c "
        "ON c.cid = o.cid GROUP BY q.iname ORDER BY q.iname"
    ))
    assert got == [
        ("T1", 1, "S1", 1000), ("T2", 1, "S1", 3000),
        ("T3", 1, "S2", 5000), ("T6", 2, "S6", 4000),
    ]


# --- LIMIT / OFFSET over joins (HashJoinIT.java:2274-2403) -------------------

def test_join_with_limit(engine):
    # ORDER BY added to pin the reference's row-key result order
    got1 = rows(engine, (
        "SELECT order_id, i.name, s.name, s.address, quantity FROM "
        "jsupplier s LEFT JOIN jitem i ON i.supplier_id = s.supplier_id "
        "LEFT JOIN jorder o ON o.item_id = i.item_id "
        "ORDER BY s.supplier_id, i.item_id LIMIT 4"
    ))
    assert got1 == [
        ("000000000000001", "T1", "S1", "101 YYY Street", 1000),
        ("000000000000003", "T2", "S1", "101 YYY Street", 3000),
        ("000000000000005", "T3", "S2", "202 YYY Street", 5000),
        (None, "T4", "S2", "202 YYY Street", None),
    ]
    got2 = rows(engine, (
        "SELECT order_id, i.name, s.name, s.address, quantity FROM "
        "jsupplier s JOIN jitem i ON i.supplier_id = s.supplier_id "
        "JOIN jorder o ON o.item_id = i.item_id "
        "ORDER BY s.supplier_id, i.item_id, order_id LIMIT 4"
    ))
    assert got2 == [
        ("000000000000001", "T1", "S1", "101 YYY Street", 1000),
        ("000000000000003", "T2", "S1", "101 YYY Street", 3000),
        ("000000000000005", "T3", "S2", "202 YYY Street", 5000),
        ("000000000000002", "T6", "S6", "606 YYY Street", 2000),
    ]


def test_join_with_offset(engine):
    for sql, expected in (
        (
            "SELECT order_id, i.name, s.name, s.address, quantity FROM "
            "jsupplier s LEFT JOIN jitem i ON i.supplier_id = s.supplier_id "
            "LEFT JOIN jorder o ON o.item_id = i.item_id "
            "ORDER BY s.supplier_id, i.item_id LIMIT 1 OFFSET 2",
            [("000000000000005", "T3", "S2", "202 YYY Street", 5000)],
        ),
        (
            "SELECT order_id, i.name, s.name, s.address, quantity FROM "
            "jsupplier s JOIN jitem i ON i.supplier_id = s.supplier_id "
            "JOIN jorder o ON o.item_id = i.item_id "
            "ORDER BY s.supplier_id, i.item_id, order_id LIMIT 1 OFFSET 2",
            [("000000000000005", "T3", "S2", "202 YYY Street", 5000)],
        ),
    ):
        assert rows(engine, sql) == expected


def test_non_equi_join(engine):
    # comma join with a range predicate (HashJoinIT.java:2406); the ON-form
    # is AMBIGUOUS_JOIN_CONDITION in Phoenix but valid here (superset)
    expected = sorted([
        ("T3", "S1"), ("T4", "S1"), ("T5", "S1"), ("T5", "S2"),
        ("T5", "S3"), ("T5", "S4"), ("T6", "S1"), ("T6", "S2"),
        ("T6", "S3"), ("T6", "S4"), ("T6", "S5"),
    ])
    got = rows(engine, (
        "SELECT item.name, supp.name FROM jitem item, jsupplier supp "
        "WHERE item.supplier_id > supp.supplier_id"
    ))
    assert sorted(got) == expected
    got_on = rows(engine, (
        "SELECT item.name, supp.name FROM jitem item JOIN jsupplier supp "
        "ON item.supplier_id > supp.supplier_id"
    ))
    assert sorted(got_on) == expected


# --- SortMergeJoinIT (SortMergeJoinIT.java) ----------------------------------
# Same fixture and expected values with the USE_SORT_MERGE_JOIN hint; plus
# testRightLeftJoin (:811), which only exists in the sort-merge suite.

def test_sort_merge_hint_variants(engine):
    hint = "/*+ USE_SORT_MERGE_JOIN*/ "
    got = rows(engine, (
        f"SELECT {hint}item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jitem item JOIN jsupplier supp "
        "ON item.supplier_id = supp.supplier_id ORDER BY item.item_id"
    ))
    assert got == INNER_EXPECTED
    got = rows(engine, (
        f"SELECT {hint}item.item_id, item.name, supp.supplier_id, supp.name "
        "FROM jsupplier supp RIGHT JOIN jitem item "
        "ON item.supplier_id = supp.supplier_id ORDER BY item_id"
    ))
    assert got == INNER_EXPECTED + [("invalid001", "INVALID-1", None, None)]
    got = rows(engine, (
        f"SELECT {hint}c.name, s.name FROM jcustomer c LEFT JOIN jsupplier s "
        "ON customer_id = supplier_id AND c.loc_id = s.loc_id "
        "AND substr(s.name, 2, 1) = substr(c.name, 2, 1) ORDER BY customer_id"
    ))
    assert got == [
        ("C1", "S1"), ("C2", None), ("C3", "S3"),
        ("C4", None), ("C5", "S5"), ("C6", None),
    ]


def test_right_left_join(engine):
    # SortMergeJoinIT.java:811
    got1 = rows(engine, (
        "SELECT order_id, i.name, s.name, quantity, odate FROM jitem i "
        "RIGHT JOIN jorder o ON o.item_id = i.item_id "
        "LEFT JOIN jsupplier s ON i.supplier_id = s.supplier_id "
        "ORDER BY order_id"
    ))
    assert got1 == LEFT_RIGHT_Q1_EXPECTED[3:]
    # o RIGHT JOIN (i LEFT JOIN s): every item survives; unmatched orders
    # NULL-extend.  ORDER BY order_id, s.supplier_id DESC — the reference
    # expects the NULL supplier row FIRST under the bare DESC (Phoenix
    # ORDER BY defaults to NULLS FIRST in both directions,
    # PhoenixSQL.g:1017-1021).
    got2 = rows(engine, (
        "SELECT order_id, i.name, s.name, quantity, odate FROM jorder o "
        "RIGHT JOIN (jitem i LEFT JOIN jsupplier s "
        "ON i.supplier_id = s.supplier_id) ON o.item_id = i.item_id "
        "ORDER BY order_id, s.supplier_id DESC"
    ))
    assert got2 == [
        (None, "INVALID-1", None, None, None),
        (None, "T5", "S5", None, None),
        (None, "T4", "S2", None, None),
    ] + LEFT_RIGHT_Q1_EXPECTED[3:]
