"""The reference's canonical 9-row ATABLE fixture, recreated through
Engine.sql for replaying the BaseQueryIT family of ITs verbatim.

DDL from BaseTest.java's ATABLE_NAME builder entry; rows from
BaseTest.initATableValues (TestUtil ROW1..ROW9, A/B/C/E_VALUE).  The
fixture date is pinned to 2024-06-01 (the ITs use 'now'; replays bind a
literal between day 0 and day 1 to preserve the ordering)."""

from __future__ import annotations

TENANT = "00D300000000XHP"
TENANT2 = "00D400000000XHP"
ROWS = [f"00A{i}23122312312" for i in (1, 2, 3, 4)] + [
    f"00B{i}23122312312" for i in (5, 6, 7, 8)
] + ["00C923122312312"]
D = "2024-06-01 00:00:00"

# (entity, a_string, b_string, a_integer, date_offset_days, x_decimal,
#  x_long, x_integer, y_integer, a_byte, a_short, a_float, a_double)
ATABLE_ROWS = [
    (ROWS[0], "a", "b", 1, 0, None, None, None, None, 1, 128, 0.01, 0.0001),
    (ROWS[1], "a", "c", 2, 1, None, None, None, None, 2, 129, 0.02, 0.0002),
    (ROWS[2], "a", "e", 3, 2, None, None, None, None, 3, 130, 0.03, 0.0003),
    (ROWS[3], "a", "b", 4, 0, None, None, None, None, 4, 131, 0.04, 0.0004),
    (ROWS[4], "b", "c", 5, 1, None, None, None, None, 5, 132, 0.05, 0.0005),
    (ROWS[5], "b", "e", 6, 2, None, None, None, None, 6, 133, 0.06, 0.0006),
    (ROWS[6], "b", "b", 7, 0, 0.1, 5, 5, None, 7, 134, 0.07, 0.0007),
    (ROWS[7], "b", "c", 8, 1, 3.9, -2147483649, 4, None, 8, 135, 0.08, 0.0008),
    (ROWS[8], "c", "e", 9, 2, 3.3, 2147483648, 3, 300, 9, 0, 0.09, 0.0009),
]


def create_atable(engine, table: str = "atable", tenant2: str | None = None) -> None:
    """CREATE + populate the ATABLE fixture on ``engine``.

    ``tenant2``: also insert DistinctCountIT.initATableValues' two extra
    rows (ROW1/ROW2 under a second organization_id)."""
    engine.sql(
        f"create table {table} (organization_id char(15) not null, "
        "entity_id char(15) not null, a_string varchar(100), "
        "b_string varchar(100), a_integer integer, a_date date, "
        "x_decimal decimal(31,10), x_long bigint, x_integer integer, "
        "y_integer integer, a_byte tinyint, a_short smallint, "
        "a_float float, a_double double, "
        "constraint pk primary key (organization_id, entity_id))"
    )

    def _ins(tenant, row):
        ent, a_s, b_s, a_i, doff, x_d, x_l, x_i, y_i, a_b, a_sh, a_f, a_d = row
        date = f"TIMESTAMP '{D}' + {doff}" if doff else f"TIMESTAMP '{D}'"
        engine.sql(
            f"upsert into {table} (organization_id, entity_id, a_string, "
            "b_string, a_integer, a_date, x_decimal, x_long, x_integer, "
            "y_integer, a_byte, a_short, a_float, a_double) values "
            f"('{tenant}', '{ent}', '{a_s}', '{b_s}', {a_i}, {date}, "
            f"{'null' if x_d is None else x_d}, "
            f"{'null' if x_l is None else x_l}, "
            f"{'null' if x_i is None else x_i}, "
            f"{'null' if y_i is None else y_i}, "
            f"{a_b}, {a_sh}, CAST({a_f} AS FLOAT), {a_d})"
        )

    for row in ATABLE_ROWS:
        _ins(TENANT, row)
    if tenant2:
        for row in ATABLE_ROWS[:2]:
            _ins(tenant2, row)
