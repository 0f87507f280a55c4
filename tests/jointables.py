"""The reference's shared join-IT fixture, recreated through Engine.sql.

DDL and rows from BaseJoinIT.java (phoenix-core/src/it/java/org/apache/
phoenix/end2end/join/BaseJoinIT.java:78-436): the Join schema's OrderTable /
CustomerTable / ItemTable / SupplierTable / CoitemTable with the exact
literal rows every HashJoinIT / SortMergeJoinIT / SubqueryIT scenario
asserts against.

Adaptations (documented once, apply everywhere):
  * identifiers are unquoted lower-case (the reference quotes mixed-case
    column names; this engine is case-insensitive like Spark);
  * the TIMESTAMP/DATE columns are named odate/cdate instead of "DATE"
    (reserved word); Phoenix DATE carries time, so cdate keeps the full
    datetime values the fixture sets (BaseJoinIT.java:207 uses setDate with
    a parsed "yyyy-MM-dd HH:mm:ss" value).
"""

from __future__ import annotations

CUSTOMERS = [
    # (customer_id, name, phone, address, loc_id, cdate)
    ("0000000001", "C1", "999-999-1111", "101 XXX Street", "10001", "2013-11-01 10:20:36"),
    ("0000000002", "C2", "999-999-2222", "202 XXX Street", None, "2013-11-25 16:45:07"),
    ("0000000003", "C3", "999-999-3333", "303 XXX Street", None, "2013-11-25 10:06:29"),
    ("0000000004", "C4", "999-999-4444", "404 XXX Street", "10004", "2013-11-22 14:22:56"),
    ("0000000005", "C5", "999-999-5555", "505 XXX Street", "10005", "2013-11-27 09:37:50"),
    ("0000000006", "C6", "999-999-6666", "606 XXX Street", "10001", "2013-11-01 10:20:36"),
]

ITEMS = [
    # (item_id, name, price, discount1, discount2, supplier_id, description)
    ("0000000001", "T1", 100, 5, 10, "0000000001", "Item T1"),
    ("0000000002", "T2", 200, 5, 8, "0000000001", "Item T2"),
    ("0000000003", "T3", 300, 8, 12, "0000000002", "Item T3"),
    ("0000000004", "T4", 400, 6, 10, "0000000002", "Item T4"),
    ("0000000005", "T5", 500, 8, 15, "0000000005", "Item T5"),
    ("0000000006", "T6", 600, 8, 15, "0000000006", "Item T6"),
    ("invalid001", "INVALID-1", 0, 0, 0, "0000000000", "Invalid item for join test"),
]

SUPPLIERS = [
    # (supplier_id, name, phone, address, loc_id)
    ("0000000001", "S1", "888-888-1111", "101 YYY Street", "10001"),
    ("0000000002", "S2", "888-888-2222", "202 YYY Street", "10002"),
    ("0000000003", "S3", "888-888-3333", "303 YYY Street", None),
    ("0000000004", "S4", "888-888-4444", "404 YYY Street", None),
    ("0000000005", "S5", "888-888-5555", "505 YYY Street", "10005"),
    ("0000000006", "S6", "888-888-6666", "606 YYY Street", "10006"),
]

ORDERS = [
    # (order_id, customer_id, item_id, price, quantity, odate)
    ("000000000000001", "0000000004", "0000000001", 100, 1000, "2013-11-22 14:22:56"),
    ("000000000000002", "0000000003", "0000000006", 552, 2000, "2013-11-25 10:06:29"),
    ("000000000000003", "0000000002", "0000000002", 190, 3000, "2013-11-25 16:45:07"),
    ("000000000000004", "0000000004", "0000000006", 510, 4000, "2013-11-26 13:26:04"),
    ("000000000000005", "0000000005", "0000000003", 264, 5000, "2013-11-27 09:37:50"),
]

COITEMS = [
    # (item_id, item_name, co_item_id, co_item_name)
    ("0000000001", "T1", "0000000002", "T3"),
    ("0000000004", "T4", "0000000003", "T3"),
    ("0000000003", "T4", "0000000005", "T5"),
    ("0000000006", "T6", "0000000001", "T1"),
]


def _s(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def create_join_tables(engine) -> None:
    """CREATE + populate the five BaseJoinIT tables on ``engine``."""
    engine.sql(
        "create table jorder (order_id varchar(15) not null primary key, "
        "customer_id varchar(10), item_id varchar(10), price integer, "
        "quantity integer, odate timestamp)"
    )
    engine.sql(
        "create table jcustomer (customer_id varchar(10) not null primary key, "
        "name varchar, phone varchar(12), address varchar, loc_id varchar(5), "
        "cdate date)"
    )
    engine.sql(
        "create table jitem (item_id varchar(10) not null primary key, "
        "name varchar, price integer, discount1 integer, discount2 integer, "
        "supplier_id varchar(10), description varchar)"
    )
    engine.sql(
        "create table jsupplier (supplier_id varchar(10) not null primary key, "
        "name varchar, phone varchar(12), address varchar, loc_id varchar(5))"
    )
    engine.sql(
        "create table jcoitem (item_id varchar(10) not null, "
        "item_name varchar not null, co_item_id varchar(10), "
        "co_item_name varchar, "
        "constraint pk primary key (item_id, item_name)) SALT_BUCKETS=4"
    )
    for c in CUSTOMERS:
        vals = ", ".join(_s(v) for v in c[:5])
        engine.sql(
            f"upsert into jcustomer values ({vals}, TIMESTAMP '{c[5]}')"
        )
    for i in ITEMS:
        engine.sql("upsert into jitem values (" + ", ".join(_s(v) for v in i) + ")")
    for s in SUPPLIERS:
        engine.sql("upsert into jsupplier values (" + ", ".join(_s(v) for v in s) + ")")
    for o in ORDERS:
        vals = ", ".join(_s(v) for v in o[:5])
        engine.sql(f"upsert into jorder values ({vals}, TIMESTAMP '{o[5]}')")
    for co in COITEMS:
        engine.sql("upsert into jcoitem values (" + ", ".join(_s(v) for v in co) + ")")
