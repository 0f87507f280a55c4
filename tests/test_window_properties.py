"""Property-based model check for sessionization: random event sets vs a
pure-Python reference of the gap rule (SURVEY §5-style expression-eval
testing, extended with hypothesis — the reference has no property tests).

Pins the tricky edges fixtures rarely hit: equal timestamps within a user
(ordered by event_id), a gap of EXACTLY the threshold (no new session —
the rule is strictly-greater), single-event users, and empty users.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GAP_MIN = 5  # small threshold so random data crosses it often

_BASE = dt.datetime(2024, 1, 1)

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id (few users → ties)
        st.integers(min_value=0, max_value=40),  # minutes offset (collisions)
    ),
    min_size=0,
    max_size=25,
)


def _model(rows):
    """rows: [(user_id, event_id, ts_dt)] → {(user, sess): (n, start, end)}."""
    out = {}
    by_user: dict[int, list] = {}
    for user, eid, ts in rows:
        by_user.setdefault(user, []).append((ts, eid))
    for user, evs in by_user.items():
        evs.sort()
        sess = 0
        prev = None
        for ts, _eid in evs:
            if prev is None or (ts - prev) > dt.timedelta(minutes=GAP_MIN):
                sess += 1
            prev = ts
            key = (user, sess)
            n, start, end = out.get(key, (0, ts, ts))
            out[key] = (n + 1, min(start, ts), max(end, ts))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=EVENTS)
def test_sessionize_matches_model(spark, events):
    from phoenix_spark.queries.windows import sessionize

    rows = [
        (user, eid, _BASE + dt.timedelta(minutes=mins))
        for eid, (user, mins) in enumerate(events)
    ]
    expected = _model(rows)
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp_ntz"
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
        )
        for r in sessionize(df, gap_minutes=GAP_MIN).collect()
    }
    assert got == expected


def test_sessionize_timezone_independent(spark):
    """Gap computation must be pure NTZ arithmetic: under a non-UTC session
    timezone, a pair of events straddling a DST transition (2024-03-10
    02:00 America/New_York) must still split by the naive 30-min gap rule,
    not by wall-clock-shifted instants."""
    from phoenix_spark.queries.windows import sessionize

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.sql(
            """
            SELECT * FROM VALUES
              (1, 1, timestamp_ntz'2024-03-10 01:50:00'),
              (1, 2, timestamp_ntz'2024-03-10 02:10:00'),  -- naive gap 20m: same session
              (1, 3, timestamp_ntz'2024-03-10 03:20:00')   -- naive gap 70m: new session
            AS t(user_id, event_id, ts)
            """
        )
        out = {
            (r.user_id, r.session_id): r.n_events
            for r in sessionize(df).collect()
        }
        assert out == {(1, 1): 2, (1, 2): 1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
