"""Emulation of the driver's DuckDB-oracle compare: order-insensitive,
columns sorted by name, exact value equality after light normalization.

Stricter than necessary on floats on purpose: our queries are engineered to
produce bit-identical doubles on both engines (exact decimal aggregation),
so any float drift here is a design bug worth catching early.
"""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _norm_cell(v):
    import numpy as np

    if isinstance(v, np.ndarray):  # DuckDB returns LIST columns as ndarray
        v = v.tolist()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if pd.isna(v) if not isinstance(v, (list, tuple, dict, set)) else False:
        return "<NULL>"
    if isinstance(v, float):
        # exact repr — we *want* bit-identical doubles
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems = []
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        return [f"column mismatch: spark={scols} duck={dcols}"]
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    s, d = canon(spark_df), canon(duck_df)
    if s != d:
        diff_s = [r for r in s if r not in set(d)][:3]
        diff_d = [r for r in d if r not in set(s)][:3]
        problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
    return problems
