"""DistinctPrefixFilterIT replay (end2end/DistinctPrefixFilterIT.java:240-371)
— the SEMANTIC half of the distinct-prefix optimization suite: GROUP BY
over PK prefixes with HAVING on prefix columns (incl. max-int values),
DISTINCT mixed with IN/skip-scan and boolean filters, the tuple form
COUNT(DISTINCT (p1, p2)), and DESC orderings over both fixed-width and
variable-width prefix types.  (The reference also asserts plan shapes —
its server-side DistinctPrefixFilter; the Spark analogues are partial
aggregation + parquet min/max pruning, covered in tests/test_plans.py.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

PREFIXES = [
    (1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3),
    (3, 1), (3, 2), (2147483647, 2147483647), (3, 2147483647), (3, 3),
]
V_PREFIXES = [
    ("1", "1"), ("1", "2"), ("1", "3"), ("2", "1"), ("2", "2"), ("2", "3"),
    ("22", "1"), ("3", "22"), ("3", "1"), ("3", "2"), ("3", "3"),
]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("dpf_wh")),
    )
    e.sql(
        "CREATE TABLE dpf_f (prefix1 INTEGER NOT NULL, prefix2 INTEGER NOT "
        "NULL, prefix3 INTEGER NOT NULL, col1 FLOAT, col2 INTEGER, "
        "CONSTRAINT pk PRIMARY KEY(prefix1, prefix2, prefix3))"
    )
    e.sql(
        "CREATE TABLE dpf_v (prefix1 varchar NOT NULL, prefix2 varchar NOT "
        "NULL, prefix3 INTEGER NOT NULL, col1 FLOAT, col2 INTEGER, "
        "CONSTRAINT pk PRIMARY KEY(prefix1, prefix2, prefix3)) SALT_BUCKETS=8"
    )
    for i, (p1, p2) in enumerate(PREFIXES):
        for p3 in (1, 2):  # two rows per prefix so DISTINCT earns its keep
            e.sql(
                f"upsert into dpf_f values ({p1}, {p2}, {p3}, "
                f"CAST(0.{i + 1} AS FLOAT), {i})"
            )
    for i, (p1, p2) in enumerate(V_PREFIXES):
        for p3 in (1, 2):
            e.sql(
                f"upsert into dpf_v values ('{p1}', '{p2}', {p3}, "
                f"CAST(0.{i + 1} AS FLOAT), {i})"
            )
    return e


def n_rows(engine, sql):
    return len(engine.sql(sql).collect())


def test_group_by_having_prefix_fixed(engine):
    # DistinctPrefixFilterIT.java:240-256
    cases = [
        ("SELECT prefix1 FROM dpf_f GROUP BY prefix1, prefix2 "
         "HAVING prefix1 IN (1,2)", 6),
        ("SELECT prefix1 FROM dpf_f GROUP BY prefix1, prefix2 "
         "HAVING prefix1 IN (1,2) AND prefix2 IN (1,2)", 4),
        ("SELECT prefix1 FROM dpf_f GROUP BY prefix1, prefix2 "
         "HAVING prefix2 = 2", 3),
        ("SELECT prefix1 FROM dpf_f GROUP BY prefix1, prefix2 "
         "HAVING prefix2 = 2147483647", 2),
        ("SELECT prefix1 FROM dpf_f GROUP BY prefix1, prefix2 "
         "HAVING prefix1 = 2147483647", 1),
    ]
    for sql, want in cases:
        assert n_rows(engine, sql) == want, sql


def test_group_by_having_prefix_variable(engine):
    # :258-275 — '22' sorts between '2' and '3' as a VARCHAR
    cases = [
        ("SELECT prefix1 FROM dpf_v GROUP BY prefix1, prefix2 "
         "HAVING prefix1 IN ('1','2')", 6),
        ("SELECT prefix1 FROM dpf_v GROUP BY prefix1, prefix2 "
         "HAVING prefix1 IN ('1','2') AND prefix2 IN ('1','2')", 4),
        ("SELECT prefix1 FROM dpf_v GROUP BY prefix1, prefix2 "
         "HAVING prefix2 = '2'", 3),
        ("SELECT prefix1 FROM dpf_v GROUP BY prefix1, prefix2 "
         "HAVING prefix2 = '22'", 1),
        ("SELECT prefix1 FROM dpf_v GROUP BY prefix1, prefix2 "
         "HAVING prefix1 = '22'", 1),
    ]
    for sql, want in cases:
        assert n_rows(engine, sql) == want, sql


@pytest.mark.parametrize("table,lit", [("dpf_f", ""), ("dpf_v", "'")])
def test_common_group_by_and_distinct(engine, table, lit):
    # :281-294 / :338-363
    assert n_rows(engine, f"SELECT prefix1 FROM {table} GROUP BY prefix1") == 4
    assert n_rows(engine, (
        f"SELECT prefix1 FROM {table} GROUP BY prefix1 ORDER BY prefix1 DESC"
    )) == 4
    assert n_rows(engine, (
        f"SELECT prefix1 FROM {table} GROUP BY prefix1, prefix2"
    )) == 11
    assert n_rows(engine, (
        f"SELECT prefix1 FROM {table} GROUP BY prefix1, prefix2 "
        "ORDER BY prefix1, prefix2 DESC"
    )) == 11
    assert n_rows(engine, f"SELECT DISTINCT prefix1 FROM {table}") == 4
    assert n_rows(engine, (
        f"SELECT DISTINCT prefix1, prefix2 FROM {table} ORDER BY prefix2 DESC"
    )) == 11
    got = engine.sql(
        f"SELECT COUNT(DISTINCT prefix1) AS a, "
        f"COUNT(DISTINCT (prefix1, prefix2)) AS b FROM {table}"
    ).collect()[0]
    assert (got[0], got[1]) == (4, 11)
    got = engine.sql(
        f"SELECT COUNT(*) AS c FROM "
        f"(SELECT DISTINCT prefix1, prefix2 FROM {table})"
    ).collect()[0]
    assert got[0] == 11


def test_distinct_with_skip_scan_filters(engine):
    # :297-332
    assert n_rows(engine, (
        "SELECT DISTINCT prefix1, prefix2 FROM dpf_f WHERE prefix1 IN (1,2)"
    )) == 6
    assert n_rows(engine, (
        "SELECT DISTINCT prefix1, prefix2 FROM dpf_f "
        "WHERE prefix1 IN (3,2147483647) ORDER BY prefix1 DESC"
    )) == 5
    assert n_rows(engine, (
        "SELECT DISTINCT prefix1, prefix2 FROM dpf_f "
        "WHERE prefix1 IN (2147483647,2147483647)"
    )) == 1
    assert n_rows(engine, (
        "SELECT DISTINCT prefix1, prefix2 FROM dpf_v "
        "WHERE prefix1 IN ('3','22')"
    )) == 5
    assert n_rows(engine, (
        "SELECT DISTINCT prefix1, prefix2 FROM dpf_v "
        "WHERE prefix1 IN ('2','22')"
    )) == 4
    # prefix-count split by a non-prefix filter (:314-317)
    got = engine.sql(
        "SELECT COUNT(DISTINCT prefix1) AS a, "
        "COUNT(DISTINCT (prefix1, prefix2)) AS b FROM dpf_f WHERE prefix2=2"
    ).collect()[0]
    assert (got[0], got[1]) == (3, 3)
    got = engine.sql(
        "SELECT COUNT(DISTINCT prefix1) AS a, "
        "COUNT(DISTINCT (prefix1, prefix2)) AS b FROM dpf_f WHERE prefix1=2"
    ).collect()[0]
    assert (got[0], got[1]) == (1, 3)
