"""InListIT replay (end2end/InListIT.java:528-770) — the RVC-IN-list
compilation matrix (InListExpression + WhereOptimizer skip-scan keys):
fully/partially qualified row keys, leading-PK + trailing-RVC
combinations, overlapping RVC/PK slots, and slot holes — each over a plain
AND a salted (SALT_BUCKETS=4) table, with the SKIP_SCAN / RANGE_SCAN
hints (scan-strategy hints; result-identical by contract)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

# DEFAULT_UPSERTS (InListIT.java:528): (pk1..pk5, nonPk)
ROWS = [
    (1, 2, 4, 5, 6, "row1"),
    (2, 3, 4, 5, 6, "row2"),
    (2, 3, 6, 4, 5, "row3"),
    (6, 5, 4, 3, 2, "row4"),
]

# (where_clause, expected nonPk names) — InListIT.java:551-770
CASES = [
    ("WHERE (pk1, pk2, pk3, pk4, pk5) IN ((1, 2, 3, 4, 5), (1, 2, 4, 5, 3))",
     []),
    ("WHERE (pk1, pk2, pk3, pk4, pk5) IN ((1, 2, 3, 4, 5), (1, 2, 4, 5, 6))",
     ["row1"]),
    ("WHERE (pk1, pk2, pk3, pk4) IN ((2, 3, 4, 5), (1, 2, 4, 5))",
     ["row1", "row2"]),
    ("WHERE (pk2, pk3, pk4, pk5) IN ((2, 3, 4, 5), (2, 4, 5, 6))",
     ["row1"]),
    ("WHERE (pk1, pk2, pk4, pk5) IN ((1, 2, 4, 5), (6, 5, 3, 2))",
     ["row4"]),
    ("WHERE pk1 != 2 AND (pk3, pk4, pk5) IN ((6, 4, 5), (5, 6, 4))",
     []),
    ("WHERE pk1 = 2 AND (pk2, pk3, pk4, pk5) IN ((2, 4, 5, 6), (3, 4, 5, 6))",
     ["row2"]),
    ("WHERE pk1 = 2 AND (pk2, pk3) IN ((3, 6), (5, 4))",
     ["row3"]),
    ("WHERE pk2 = 3 AND (pk3, pk4) IN ((4, 5), (6, 4))",
     ["row2", "row3"]),
    ("WHERE pk1 = 2 AND (pk3, pk5) IN ((6, 5), (4, 6))",
     ["row2", "row3"]),
    # leading RVC + trailing PK (InListIT.java:632-664)
    ("WHERE (pk1, pk2, pk3) IN ((1, 2, 3), (2, 3, 5)) AND pk4 = 5",
     []),
    ("WHERE (pk1, pk2, pk3, pk4) IN ((1, 2, 4, 5), (2, 3, 6, 4)) AND pk5 = 6",
     ["row1"]),
    ("WHERE (pk1, pk2) IN ((6, 5), (2, 3)) AND pk3 = 4",
     ["row2", "row4"]),
    ("WHERE (pk2, pk3) IN ((5, 4), (3, 6)) AND pk4 = 3",
     ["row4"]),
    ("WHERE (pk1, pk3) IN ((2, 6), (6, 4)) AND pk4 = 4",
     ["row3"]),
    # overlapping RVC and PK / RVC and RVC (:672-753, expecteds verbatim)
    ("WHERE (pk1, pk2) IN ((1, 2), (2, 3)) AND pk2 = 4",
     []),
    ("WHERE (pk1, pk2, pk3, pk4, pk5) IN ((1, 2, 4, 5, 6), (2, 3, 4, 5, 6)) "
     "AND pk1 = 2",
     ["row2"]),
    ("WHERE (pk1, pk2, pk3) IN ((1, 2, 4), (2, 3, 6)) AND pk3 = 4",
     ["row1"]),
    ("WHERE (pk3, pk4, pk5) IN ((4, 5, 6), (4, 3, 2)) AND pk5 = 2",
     ["row4"]),
    ("WHERE (pk1, pk2) IN ((1, 2), (2, 3)) AND (pk2, pk3) IN ((4, 4), (4, 6))",
     []),
    ("WHERE (pk1, pk2, pk3) IN ((2, 3, 6), (2, 3, 4)) AND "
     "(pk3, pk4, pk5) IN ((4, 5, 6), (4, 3, 2))",
     ["row2"]),
    ("WHERE pk2=3 and (pk1, pk2, pk3, pk4) IN ((2, 3, 6, 6), (2, 3, 4, 5))",
     ["row2"]),
    ("WHERE (pk2,pk3) in ((3,4)) and "
     "(pk1, pk2, pk3, pk4) IN ((2, 3, 6, 6), (2, 3, 4, 5))",
     ["row2"]),
    ("WHERE (pk1, pk2) IN ((1, 2), (2, 3)) AND (pk2, pk3) IN ((3, 4), (3, 6))",
     ["row2", "row3"]),
    ("WHERE (pk3, pk4) IN ((4, 5), (4, 3)) AND (pk4, pk5) IN ((3, 2), (4, 5))",
     ["row4"]),
]


@pytest.fixture(scope="module", params=["plain", "salted"])
def inlist_table(request, tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp(f"inlist_{request.param}")),
    )
    salt = " SALT_BUCKETS=4" if request.param == "salted" else ""
    e.sql(
        "CREATE TABLE inlist_t (pk1 INTEGER NOT NULL, pk2 INTEGER NOT NULL, "
        "pk3 INTEGER NOT NULL, pk4 INTEGER NOT NULL, pk5 INTEGER NOT NULL, "
        "nonPk VARCHAR CONSTRAINT pk PRIMARY KEY (pk1, pk2, pk3, pk4, pk5))"
        + salt
    )
    for r in ROWS:
        e.sql(
            "UPSERT INTO inlist_t (pk1, pk2, pk3, pk4, pk5, nonPk) VALUES "
            f"({r[0]}, {r[1]}, {r[2]}, {r[3]}, {r[4]}, '{r[5]}')"
        )
    return e


@pytest.mark.parametrize("where,expected", CASES)
def test_rvc_in_list(inlist_table, where, expected):
    for hint in ("", "/*+ SKIP_SCAN */ ", "/*+ RANGE_SCAN */ "):
        got = sorted(
            r.nonPk
            for r in inlist_table.sql(
                f"SELECT {hint}nonPk FROM inlist_t {where}"
            ).collect()
        )
        assert got == sorted(expected), (hint, where)
