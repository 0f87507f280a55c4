"""SpillableGroupByIT replay (end2end/SpillableGroupByIT.java) — the
semantic surface: COUNT/SUM/AVG/MIN/MAX grouped over a 1000-row load where
every group has exactly two members (ids i and i+500 as VARCHAR), plus
COUNT(DISTINCT uri) over 2000 unique groups.

The reference runs this with a 1-entry group-by cache to force server-side
spill files; Spark's hash aggregate spills through Tungsten's
UnsafeFixedWidthAggregationMap automatically, so the spill knobs have no
analogue — the results contract is what replays.  (AVG over INTEGER is
integral in the IT's assertions: 20/2 = 10 exactly.)
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

N = 1000
GROUPS = N // 2


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("spill_wh")),
    )
    e.sql(
        "CREATE TABLE gbt (id VARCHAR NOT NULL, uri VARCHAR, appcpu INTEGER, "
        "CONSTRAINT pk PRIMARY KEY (id))"
    )
    # bulk-load via UPSERT SELECT (the IT loops 1000 single upserts; the
    # values are identical: id = 0..999, uri = id % 500, appcpu = 10)
    e.sql(
        "UPSERT INTO gbt SELECT CAST(o_orderkey AS VARCHAR), "
        "CAST(o_orderkey % 500 AS VARCHAR), 10 FROM orders "
        "WHERE o_orderkey < 1000"
    )
    return e


def test_grouped_aggregates_two_per_group(engine):
    # SpillableGroupByIT.testScanUri:62 (GROUPBY1)
    rows = engine.sql(
        "select count(*) AS c, sum(appcpu) AS s, avg(appcpu) AS a, uri, "
        "min(id) AS mn, max(id) AS mx from gbt group by uri"
    ).collect()
    assert len(rows) == GROUPS
    for r in rows:
        assert r.c == 2 and r.s == 20 and int(r.a) == 10
        lo, hi = int(r.mn), int(r.mx)
        assert min(lo, hi) == int(r.uri)
        assert max(lo, hi) == GROUPS + int(r.uri)


def test_count_distinct_unique_uris(engine):
    # testStatisticsAreNotWritten's GROUPBY2 shape over unique uris
    engine.sql(
        "CREATE TABLE gbt2 (id VARCHAR NOT NULL, uri VARCHAR, "
        "appcpu INTEGER, CONSTRAINT pk PRIMARY KEY (id))"
    )
    engine.sql(
        "UPSERT INTO gbt2 SELECT CAST(o_orderkey AS VARCHAR), "
        "CAST(o_orderkey AS VARCHAR), 10 FROM orders WHERE o_orderkey < 2000"
    )
    got = engine.sql("select count(distinct uri) AS c from gbt2").collect()
    assert [r.c for r in got] == [
        engine.sql("select count(*) AS c from gbt2").collect()[0].c
    ]
