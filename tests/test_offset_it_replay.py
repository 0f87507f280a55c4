"""QueryWithOffsetIT replay (end2end/QueryWithOffsetIT.java) — OFFSET in
its grammar variants (bare integer, `offset n row[s]`, with LIMIT, with
FETCH FIRST over a UNION ALL, after GROUP BY ... ORDER BY DESC), over a
column-family table with SALT_BUCKETS.

Adaptation: the reference's no-ORDER-BY offsets ride row-key scan order;
an explicit ORDER BY pins the same order here."""

from __future__ import annotations

import string

import pytest

from tests.conftest import SF_TEST_DIR

STRINGS = list(string.ascii_lowercase)


@pytest.fixture(scope="module", params=["plain", "salted"])
def engine(request, tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp(f"off_{request.param}")),
    )
    salt = " SALT_BUCKETS=10" if request.param == "salted" else ""
    e.sql(
        "CREATE TABLE offt (t_id VARCHAR NOT NULL, k1 INTEGER NOT NULL, "
        "k2 INTEGER NOT NULL, C3.k3 INTEGER, C2.v1 VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (t_id, k1, k2))" + salt
    )
    for i, s in enumerate(STRINGS):
        e.sql(
            f"UPSERT INTO offt values('{s}', {i}, {i + 1}, {i + 2}, "
            f"'{STRINGS[25 - i]}')"
        )
    return e


def ids(engine, sql):
    return [r[0] for r in engine.sql(sql).collect()]


def test_limit_offset(engine):
    # QueryWithOffsetIT.java:78
    got = ids(engine, "SELECT t_id from offt order by t_id limit 10 offset 10")
    assert got == STRINGS[10:20]
    got = ids(engine, "SELECT k2 from offt order by k2 desc limit 1 offset 1")
    assert got == [25]


def test_union_all_offset_fetch_first(engine):
    # :99 — OFFSET + FETCH FIRST over a UNION ALL; scan order pinned
    got = ids(engine, (
        "SELECT t_id FROM (SELECT t_id from offt union all "
        "SELECT t_id from offt) u ORDER BY t_id "
        "OFFSET 10 FETCH FIRST 35 rows only"
    ))
    # sorted doubled alphabet: aabbcc... offset 10 lands mid-'f'
    doubled = sorted(STRINGS * 2)
    assert got == doubled[10:45]


def test_offset_without_limit(engine):
    # :176 — `offset n row`, and GROUP BY + ORDER BY DESC + offset
    got = ids(engine, "SELECT t_id from offt order by t_id offset 10 row")
    assert got == STRINGS[10:]
    got = ids(engine, (
        "SELECT k3, count(*) from offt group by k3 order by k3 desc "
        "offset 10 row"
    ))
    # k3 = 2..27 desc → offset 10 → 17..2
    assert got == list(range(17, 1, -1))
