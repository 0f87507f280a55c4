"""Run the reference's SHIPPED example scripts verbatim through Engine.sql.

The reference distributes examples/ (STOCK_SYMBOL.sql, WEB_STAT.sql +
WEB_STAT.csv + WEB_STAT_QUERIES.sql) as its getting-started surface — the
exact statements a Phoenix user would paste into sqlline.  Executing them
unmodified is the sharpest "a user could switch engines" check we have:
column families (USAGE.CORE), CHAR(2) keys, a DATE column named DATE,
TRUNC(date,'DAY'), implicit column aliases, LIKE, and expression
comparisons all have to work through the dialect front-end.

Results are cross-checked against DuckDB evaluating equivalent ANSI SQL
over the same CSV.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from phoenix_spark.engine import Engine
from tests.parity import compare

EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not present"
)


def _statements(path: str) -> list[str]:
    out = []
    for raw in open(path).read().split(";"):
        stmt = "\n".join(
            line for line in raw.splitlines() if not line.strip().startswith("--")
        ).strip()
        if stmt:
            out.append(stmt)
    return out


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def test_stock_symbol_script(engine):
    stmts = _statements(f"{EXAMPLES}/STOCK_SYMBOL.sql")
    results = [engine.sql(s) for s in stmts]
    rows = results[-1].collect()  # SELECT * FROM STOCK_SYMBOL
    assert [(r.symbol, r.company) for r in rows] == [("CRM", "SalesForce.com")]
    # and the shipped CSV loads on top through the bulk-load path
    n = engine.bulk_load_csv("stock_symbol", f"{EXAMPLES}/STOCK_SYMBOL.csv", header=False)
    assert n > 0
    total = engine.sql("SELECT COUNT(*) AS n FROM STOCK_SYMBOL").collect()[0].n
    assert total == n  # CRM upserted again by the CSV: latest wins, no dup


@pytest.fixture()
def web_stat(engine):
    (ddl,) = _statements(f"{EXAMPLES}/WEB_STAT.sql")
    engine.sql(ddl)
    n = engine.bulk_load_csv("web_stat", f"{EXAMPLES}/WEB_STAT.csv", header=False)
    assert n == 39  # shipped fixture size
    return engine


def _duck():
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW web_stat AS
        SELECT column0 AS host, column1 AS domain, column2 AS feature,
               column3::TIMESTAMP AS "date",
               column4::BIGINT AS core, column5::BIGINT AS db,
               column6::INT AS active_visitor
        FROM read_csv('{EXAMPLES}/WEB_STAT.csv', header=false)
        """
    )
    return con


def _lc(df):
    # unquoted identifier case folding differs (Phoenix/Spark preserve the
    # written case, DuckDB lowercases) — fold for the value compare
    df.columns = [c.lower() for c in df.columns]
    return df


def test_web_stat_queries_match_duckdb(web_stat):
    q1, q2, q3 = _statements(f"{EXAMPLES}/WEB_STAT_QUERIES.sql")
    con = _duck()

    spark_df = web_stat.sql(q1).toPandas()
    duck_df = con.execute(
        """
        SELECT domain, AVG(core) AS average_cpu_usage, AVG(db) AS average_db_usage
        FROM web_stat GROUP BY domain ORDER BY domain DESC
        """
    ).df()
    assert compare(_lc(spark_df), _lc(duck_df)) == []

    spark_df = web_stat.sql(q2).toPandas()
    duck_df = con.execute(
        """
        SELECT date_trunc('day', "date") AS day,
               CAST(SUM(core) AS BIGINT) AS total_cpu_usage,
               MIN(core) AS min_cpu_usage, MAX(core) AS max_cpu_usage
        FROM web_stat WHERE domain LIKE 'Salesforce%'
        GROUP BY date_trunc('day', "date")
        """
    ).df()
    assert compare(_lc(spark_df), _lc(duck_df)) == []

    spark_df = web_stat.sql(q3).toPandas()
    duck_df = con.execute(
        """
        SELECT host, CAST(SUM(active_visitor) AS BIGINT) AS total_active_visitors
        FROM web_stat WHERE db > (core * 10) GROUP BY host
        """
    ).df()
    assert compare(_lc(spark_df), _lc(duck_df)) == []


def test_date_round_units_match_duckdb(spark):
    """TRUNC/ROUND/FLOOR/CEIL date forms (TimeUnit.java) through Engine.sql
    vs DuckDB over the events fixture — pins WEEK's Monday alignment, the
    HALF_UP round midpoints, and the multiplier form."""
    from tests.conftest import SF_TEST_DIR

    e = Engine(spark, sf_dir=SF_TEST_DIR)
    spark_df = e.sql(
        """
        SELECT event_id,
               TRUNC(ts, 'DAY')      AS t_day,
               TRUNC(ts, 'WEEK')     AS t_week,
               TRUNC(ts, 'MONTH')    AS t_month,
               TRUNC(ts, 'YEAR')     AS t_year,
               ROUND(ts, 'HOUR')     AS r_hour,
               CEIL(ts, 'MINUTE')    AS c_minute,
               FLOOR(ts, 'HOUR', 6)  AS f_hour6
        FROM events
        """
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_TEST_DIR}/events.parquet')"
    )
    duck_df = con.execute(
        """
        SELECT event_id,
               date_trunc('day', ts)    AS t_day,
               date_trunc('week', ts)   AS t_week,
               date_trunc('month', ts)  AS t_month,
               date_trunc('year', ts)   AS t_year,
               to_timestamp(round(epoch_us(ts) / 3600e6) * 3600)::TIMESTAMP
                                        AS r_hour,
               to_timestamp(ceil(epoch_us(ts) / 60e6) * 60)::TIMESTAMP
                                        AS c_minute,
               to_timestamp(floor(epoch_us(ts) / 21600e6) * 21600)::TIMESTAMP
                                        AS f_hour6
        FROM events
        """
    ).df()
    assert compare(_lc(spark_df), _lc(duck_df)) == []
