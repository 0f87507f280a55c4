"""SubqueryIT replay over the reference's shared join fixture.

Scenarios and inline expected values from SubqueryIT.java (phoenix-core/
src/it/java/org/apache/phoenix/end2end/join/SubqueryIT.java, file:line per
test); fixture from tests/jointables.py (BaseJoinIT.java).

The suite covers SubqueryRewriter's whole surface: non-correlated
ANY/ALL/scalar comparisons, (RVC) IN / NOT IN, EXISTS / NOT EXISTS
(correlated and not, incl. PHOENIX-3633's constant-false inner),
correlated scalar comparisons with their multi-row runtime error contract,
correlated IN over aggregates (PHOENIX-6224), correlated EXISTS with
GROUP BY / HAVING (PHOENIX-6498), and correlated ANY/ALL quantified
comparisons."""

from __future__ import annotations

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
        warehouse=str(tmp_path_factory.mktemp("subq_wh")),
    )
    create_join_tables(e)
    return e


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


ITEMS_1_TO_5 = [
    ("0000000001", "T1"), ("0000000002", "T2"), ("0000000003", "T3"),
    ("0000000004", "T4"), ("0000000005", "T5"),
]


def test_non_correlated_subquery(engine):
    # SubqueryIT.java:259
    got = rows(engine, (
        "SELECT item_id, name FROM jitem WHERE item_id >= ALL "
        "(SELECT item_id FROM jorder) ORDER BY name"
    ))
    assert got == [("invalid001", "INVALID-1"), ("0000000006", "T6")]
    got = rows(engine, (
        "SELECT item_id, name FROM jitem WHERE item_id < ANY "
        "(SELECT item_id FROM jorder) ORDER BY item_id"
    ))
    assert got == ITEMS_1_TO_5
    got = rows(engine, (
        "SELECT item_id, name FROM jitem WHERE item_id < "
        "(SELECT max(item_id) FROM jorder) ORDER BY item_id"
    ))
    assert got == ITEMS_1_TO_5
    got = rows(engine, (
        "SELECT * FROM jcoitem WHERE (item_id, item_name) != ALL "
        "(SELECT item_id, name FROM jitem)"
    ))
    assert got == [("0000000003", "T4", "0000000005", "T5")]
    got = rows(engine, (
        "SELECT * FROM jcoitem WHERE EXISTS "
        "(SELECT item_id, name FROM jitem) ORDER BY item_id, item_name"
    ))
    assert got == [
        ("0000000001", "T1", "0000000002", "T3"),
        ("0000000003", "T4", "0000000005", "T5"),
        ("0000000004", "T4", "0000000003", "T3"),
        ("0000000006", "T6", "0000000001", "T1"),
    ]
    # scalar (non-aggregate) subquery returning >1 row must fail loudly
    with pytest.raises(Exception):
        rows(engine, (
            "SELECT item_id, name FROM jitem WHERE item_id < "
            "(SELECT item_id FROM jorder)"
        ))


def test_in_subquery(engine):
    # SubqueryIT.java:376
    got = rows(engine, (
        "SELECT item_id, name FROM jitem WHERE item_id IN "
        "(SELECT item_id FROM jorder) ORDER BY name"
    ))
    assert got == [
        ("0000000001", "T1"), ("0000000002", "T2"),
        ("0000000003", "T3"), ("0000000006", "T6"),
    ]
    got = rows(engine, (
        "SELECT item_id, name FROM jitem WHERE item_id NOT IN "
        "(SELECT item_id FROM jorder) ORDER BY name"
    ))
    assert got == [
        ("invalid001", "INVALID-1"), ("0000000004", "T4"), ("0000000005", "T5"),
    ]
    got = rows(engine, (
        "SELECT i.item_id, s.name FROM jitem i JOIN jsupplier s "
        "ON i.supplier_id = s.supplier_id WHERE i.item_id IN "
        "(SELECT item_id FROM jorder WHERE order_id > '000000000000001') "
        "ORDER BY i.name"
    ))
    assert got == [
        ("0000000002", "S1"), ("0000000003", "S2"), ("0000000006", "S6"),
    ]
    got = rows(engine, (
        "SELECT i.item_id, s.name FROM jsupplier s LEFT JOIN jitem i "
        "ON i.supplier_id = s.supplier_id WHERE i.item_id IN "
        "(SELECT item_id FROM jorder) ORDER BY i.name"
    ))
    assert got == [
        ("0000000001", "S1"), ("0000000002", "S1"),
        ("0000000003", "S2"), ("0000000006", "S6"),
    ]
    # RVC IN over subqueries, OR of two (SubqueryIT.java:463)
    got = rows(engine, (
        "SELECT * FROM jcoitem WHERE (item_id, item_name) IN "
        "(SELECT item_id, name FROM jitem WHERE item_id NOT IN "
        "(SELECT item_id FROM jorder)) "
        "OR (co_item_id, co_item_name) IN (SELECT item_id, name FROM jitem "
        "WHERE item_id IN (SELECT item_id FROM jorder)) "
        "ORDER BY item_id"
    ))
    assert got == [
        ("0000000004", "T4", "0000000003", "T3"),
        ("0000000006", "T6", "0000000001", "T1"),
    ]


def test_exists_subquery(engine):
    # SubqueryIT.java:492
    got = rows(engine, (
        "SELECT item_id, name FROM jitem i WHERE NOT EXISTS "
        "(SELECT 1 FROM jorder o WHERE o.item_id = i.item_id) ORDER BY name"
    ))
    assert got == [
        ("invalid001", "INVALID-1"), ("0000000004", "T4"), ("0000000005", "T5"),
    ]
    # OR of two correlated EXISTS, one with a nested NOT EXISTS
    got = rows(engine, (
        "SELECT * FROM jcoitem co WHERE EXISTS (SELECT 1 FROM jitem i "
        "WHERE NOT EXISTS (SELECT 1 FROM jorder WHERE item_id = i.item_id) "
        "AND co.item_id = i.item_id AND i.name = co.item_name) "
        "OR EXISTS (SELECT 1 FROM jitem ii WHERE ii.item_id IN "
        "(SELECT item_id FROM jorder) AND co.co_item_id = ii.item_id "
        "AND ii.name = co.co_item_name) ORDER BY item_id"
    ))
    assert got == [
        ("0000000004", "T4", "0000000003", "T3"),
        ("0000000006", "T6", "0000000001", "T1"),
    ]
    # PHOENIX-3633: NOT EXISTS over a constant-false inner keeps every row
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE NOT EXISTS (SELECT 1 FROM "
        "jitem i WHERE item_id = 'does not exist') ORDER BY order_id"
    ))
    assert [g[0] for g in got] == [f"00000000000000{i}" for i in range(1, 6)]


def test_comparison_subquery(engine):
    # SubqueryIT.java:568 — correlated scalar comparisons
    expected = [
        ("000000000000001", "T1"), ("000000000000003", "T2"),
        ("000000000000004", "T6"), ("000000000000005", "T3"),
    ]
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity = "
        "(SELECT max(quantity) FROM jorder q WHERE o.item_id = q.item_id) "
        "ORDER BY order_id"
    ))
    assert got == expected
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity = "
        "(SELECT max(quantity) FROM jitem i2 JOIN jorder q "
        "ON i2.item_id = q.item_id WHERE o.item_id = i2.item_id) "
        "ORDER BY order_id"
    ))
    assert got == expected
    got = rows(engine, (
        "SELECT name FROM jcustomer WHERE customer_id IN "
        "(SELECT customer_id FROM jitem i JOIN jorder o "
        "ON o.item_id = i.item_id WHERE i.name = 'T2' OR quantity > "
        "(SELECT avg(quantity) FROM jorder q WHERE o.item_id = q.item_id)) "
        "ORDER BY name"
    ))
    assert got == [("C2",), ("C4",)]
    # non-aggregate correlated scalar: unique per outer row → rows
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE quantity = "
        "(SELECT quantity FROM jorder WHERE o.item_id = item_id "
        "AND order_id != '000000000000004') ORDER BY order_id"
    ))
    assert [g[0] for g in got] == [
        "000000000000001", "000000000000002",
        "000000000000003", "000000000000005",
    ]
    # ... and >1 row per outer row → runtime error (the reference throws
    # SQLException; Spark's ScalarSubquery raises the same contract)
    with pytest.raises(Exception):
        rows(engine, (
            "SELECT order_id FROM jorder o WHERE quantity = "
            "(SELECT quantity FROM jorder WHERE o.item_id = item_id "
            "AND order_id != '000000000000003')"
        ))
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE quantity = "
        "(SELECT max(quantity) FROM jorder WHERE o.item_id = item_id "
        "AND order_id != '000000000000004' GROUP BY order_id) "
        "ORDER BY order_id"
    ))
    assert [g[0] for g in got] == [
        "000000000000001", "000000000000002",
        "000000000000003", "000000000000005",
    ]
    with pytest.raises(Exception):
        rows(engine, (
            "SELECT order_id FROM jorder o WHERE quantity = "
            "(SELECT max(quantity) FROM jorder WHERE o.item_id = item_id "
            "AND order_id != '000000000000003' GROUP BY order_id)"
        ))


def test_correlated_in_subquery_bug6224(engine):
    expected = [
        ("000000000000001", "T1"), ("000000000000003", "T2"),
        ("000000000000004", "T6"), ("000000000000005", "T3"),
    ]
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity IN "
        "(SELECT max(quantity) FROM jorder q WHERE o.item_id = q.item_id) "
        "ORDER BY order_id"
    ))
    assert got == expected
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity IN "
        "(SELECT max(quantity) FROM jitem i2 JOIN jorder q "
        "ON i2.item_id = q.item_id WHERE o.item_id = i2.item_id) "
        "ORDER BY order_id"
    ))
    assert got == expected
    got = rows(engine, (
        "SELECT name FROM jcustomer WHERE customer_id IN "
        "(SELECT customer_id FROM jitem i JOIN jorder o "
        "ON o.item_id = i.item_id WHERE i.name = 'T2' OR quantity IN "
        "(SELECT max(quantity) FROM jorder q WHERE o.item_id = q.item_id "
        "AND q.item_id = '0000000006')) ORDER BY name"
    ))
    assert got == [("C2",), ("C4",)]
    # IN tolerates multi-row inners where `=` errors
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE quantity IN "
        "(SELECT quantity FROM jorder WHERE o.item_id = item_id "
        "AND order_id != '000000000000003') ORDER BY order_id"
    ))
    assert [g[0] for g in got] == [
        "000000000000001", "000000000000002",
        "000000000000004", "000000000000005",
    ]
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE quantity IN "
        "(SELECT max(quantity) FROM jorder WHERE o.item_id = item_id "
        "AND order_id != '000000000000003' GROUP BY order_id) "
        "ORDER BY order_id"
    ))
    assert [g[0] for g in got] == [
        "000000000000001", "000000000000002",
        "000000000000004", "000000000000005",
    ]


def test_correlated_exists_with_having_bug6498(engine):
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE EXISTS (SELECT 1 FROM jorder q "
        "WHERE o.item_id = q.item_id GROUP BY q.customer_id "
        "HAVING count(order_id) > 1)"
    ))
    assert got == []
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE EXISTS (SELECT 1 FROM jorder q "
        "WHERE o.item_id = q.item_id GROUP BY q.customer_id "
        "HAVING count(order_id) >= 1) ORDER BY order_id"
    ))
    assert got == [
        ("000000000000001", "T1"), ("000000000000002", "T6"),
        ("000000000000003", "T2"), ("000000000000004", "T6"),
        ("000000000000005", "T3"),
    ]
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE EXISTS (SELECT 1 FROM jorder q "
        "WHERE o.item_id = q.item_id AND q.price <= 150 "
        "GROUP BY q.customer_id HAVING count(order_id) >= 1) "
        "OR o.quantity = 5000 ORDER BY order_id"
    ))
    assert got == [("000000000000001", "T1"), ("000000000000005", "T3")]
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE EXISTS (SELECT 1 FROM jorder "
        "WHERE o.item_id = item_id AND order_id != '000000000000003' "
        "GROUP BY order_id HAVING count(customer_id) >= 1) ORDER BY order_id"
    ))
    assert [g[0] for g in got] == [
        "000000000000001", "000000000000002",
        "000000000000004", "000000000000005",
    ]
    got = rows(engine, (
        "SELECT order_id FROM jorder o WHERE EXISTS (SELECT 1 FROM jorder "
        "WHERE o.item_id = item_id AND order_id != '000000000000003' "
        "GROUP BY order_id HAVING count(customer_id) > 1) ORDER BY order_id"
    ))
    assert got == []


def test_any_all_correlated_comparison(engine):
    # SubqueryIT.java:918
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity = ALL(SELECT quantity "
        "FROM jorder q WHERE o.item_id = q.item_id) ORDER BY order_id"
    ))
    assert got == [
        ("000000000000001", "T1"), ("000000000000003", "T2"),
        ("000000000000005", "T3"),
    ]
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity != ALL(SELECT max(quantity) "
        "FROM jorder q WHERE o.item_id = q.item_id) ORDER BY order_id"
    ))
    assert got == [("000000000000002", "T6")]
    got = rows(engine, (
        "SELECT order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity != ANY(SELECT quantity "
        "FROM jorder q WHERE o.item_id = q.item_id GROUP BY quantity) "
        "ORDER BY order_id"
    ))
    assert got == [("000000000000002", "T6"), ("000000000000004", "T6")]


def test_subquery_with_sort_merge_hint(engine):
    # SubqueryUsingSortMergeJoinIT.java — the same SubqueryRewriter shapes
    # with the USE_SORT_MERGE_JOIN hint; results identical.
    hint = "/*+ USE_SORT_MERGE_JOIN*/ "
    got = rows(engine, (
        f"SELECT {hint}item_id, name FROM jitem WHERE item_id IN "
        "(SELECT item_id FROM jorder) ORDER BY name"
    ))
    assert got == [
        ("0000000001", "T1"), ("0000000002", "T2"),
        ("0000000003", "T3"), ("0000000006", "T6"),
    ]
    got = rows(engine, (
        f"SELECT {hint}item_id, name FROM jitem i WHERE NOT EXISTS "
        "(SELECT 1 FROM jorder o WHERE o.item_id = i.item_id) ORDER BY name"
    ))
    assert got == [
        ("invalid001", "INVALID-1"), ("0000000004", "T4"), ("0000000005", "T5"),
    ]
    got = rows(engine, (
        f"SELECT {hint}order_id, name FROM jorder o JOIN jitem i "
        "ON o.item_id = i.item_id WHERE quantity = "
        "(SELECT max(quantity) FROM jorder q WHERE o.item_id = q.item_id) "
        "ORDER BY order_id"
    ))
    assert got == [
        ("000000000000001", "T1"), ("000000000000003", "T2"),
        ("000000000000004", "T6"), ("000000000000005", "T3"),
    ]
