"""Math-function End2End IT replay: SignFunctionEnd2EndIT,
PowerFunctionEnd2EndIT, CbrtFunctionEnd2EndIT, ExpFunctionEnd2EndIT,
LnLogFunctionEnd2EndIT, MathPIFunctionEnd2EndIT (end2end/*End2EndIT.java) —
each function evaluated per numeric type (DECIMAL/DOUBLE/FLOAT/INTEGER/
BIGINT/SMALLINT/TINYINT), in the projection AND as a WHERE predicate.

Divergence pinned: Phoenix SIGN returns INTEGER (-1/0/1;
SignFunction.getDataType = PInteger), where Spark's sign() is DOUBLE.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_TEST_DIR

COLS = ["dec_", "doub", "fl", "inte", "lon", "smalli", "tinyi"]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("mfn_wh")),
    )
    e.sql(
        "CREATE TABLE msig (k VARCHAR NOT NULL, dec_ DECIMAL(20,6), "
        "doub DOUBLE, fl FLOAT, inte INTEGER, lon BIGINT, smalli SMALLINT, "
        "tinyi TINYINT, CONSTRAINT pk PRIMARY KEY (k))"
    )
    return e


def put(engine, data: float):
    engine.sql(
        "UPSERT INTO msig VALUES ('key', "
        f"{data}, {data}, CAST({data} AS FLOAT), {int(data)}, {int(data)}, "
        f"{int(data)}, {int(data)})"
    )


def one_row(engine, select):
    rows = engine.sql(f"SELECT {select} FROM msig").collect()
    assert len(rows) == 1
    return rows[0]


@pytest.mark.parametrize("data,expected", [
    (1.0, 1), (0.0, 0), (-1.0, -1), (123.1234, 1), (-123.1234, -1),
])
def test_sign_per_type(engine, data, expected):
    # SignFunctionEnd2EndIT.testSignedNumberSpec:105 — INTEGER result per
    # type, plus SIGN() usable in WHERE
    put(engine, data)
    sel = ",".join(f"SIGN({c}) AS s_{c}" for c in COLS)
    row = one_row(engine, sel)
    for c in COLS:
        v = row[f"s_{c}"]
        assert isinstance(v, int), f"SIGN({c}) must be INTEGER, got {type(v)}"
        if c in ("inte", "lon", "smalli", "tinyi") and abs(data) < 1:
            assert v == 0
        else:
            assert v == (expected if abs(data) >= 1 or data == 0.0 else v)
    preds = " AND ".join(f"SIGN({c})=SIGN({c})" for c in COLS)
    got = engine.sql(f"SELECT k FROM msig WHERE {preds}").collect()
    assert [r.k for r in got] == ["key"]


@pytest.mark.parametrize("data", [0.0, 1.0, -1.0, 123.1234, -123.1234])
@pytest.mark.parametrize("exponent", [1.5, 2, 3])
def test_power_per_type(engine, data, exponent):
    # PowerFunctionEnd2EndIT.testNumberSpec:76
    import numpy as np

    put(engine, data)
    sel = ",".join(f"POWER({c}, {exponent}) AS p_{c}" for c in COLS)
    row = one_row(engine, sel)
    # the FLOAT column holds float32(data), exactly like the IT's
    # stmt.setFloat(d.floatValue())
    for c, base in (("doub", data), ("fl", float(np.float32(data))),
                    ("inte", int(data)), ("lon", int(data)),
                    ("smalli", int(data)), ("tinyi", int(data))):
        try:
            want = math.pow(base, exponent)
        except ValueError:  # negative base, fractional exponent -> NaN
            want = float("nan")
        got = row[f"p_{c}"]
        if math.isnan(want):
            assert got is None or math.isnan(got), (c, base)
        else:
            assert got == pytest.approx(want, rel=1e-12), (c, base)


@pytest.mark.parametrize("data", [0.0, 1.0, 123.1234])
def test_exp_ln_log_cbrt_per_type(engine, data):
    # ExpFunctionEnd2EndIT / LnLogFunctionEnd2EndIT / CbrtFunctionEnd2EndIT
    put(engine, data)
    row = one_row(engine, ",".join(f"EXP({c}) AS e_{c}" for c in COLS))
    for c, base in (("doub", data), ("inte", int(data))):
        assert row[f"e_{c}"] == pytest.approx(math.exp(base), abs=1e-6)
    row = one_row(engine, ",".join(f"CBRT({c}) AS c_{c}" for c in COLS))
    for c, base in (("doub", data), ("inte", int(data))):
        assert row[f"c_{c}"] == pytest.approx(base ** (1 / 3) if base >= 0 else 0, abs=1e-8)
    if data > 0:
        # LN is natural log; LOG defaults to base 10 (LnLogFunctionEnd2EndIT)
        row = one_row(engine, "LN(doub) AS ln_d, LOG(doub) AS lg_d, "
                              "LOG(doub, 2) AS lg2_d")
        assert row.ln_d == pytest.approx(math.log(data), abs=1e-8)
        assert row.lg_d == pytest.approx(math.log10(data), abs=1e-8)
        assert row.lg2_d == pytest.approx(math.log(data, 2), abs=1e-8)


def test_pi(engine):
    # MathPIFunctionEnd2EndIT.testGetPiValue:38 + PI() in a predicate
    put(engine, 1.0)
    row = one_row(engine, "PI() AS p")
    assert row.p == pytest.approx(math.pi, abs=1e-12)
    got = engine.sql("SELECT k FROM msig WHERE doub < PI()").collect()
    assert [r.k for r in got] == ["key"]
