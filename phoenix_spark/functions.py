"""Complete Phoenix built-in function surface → Spark lowering
(SURVEY.md §2.8; authoritative list: /root/reference/docs/phoenix.csv
"Functions (...)" sections, 82 documented functions; implementations under
phoenix-core-client/.../expression/function/).

Three lowering kinds:
  * rename   — 1:1 Spark builtin under another name (wired into
               sqlfront.RENAME so Engine.sql accepts the Phoenix spelling)
  * template — argument-shape/order rewrite (sqlfront handles the SQL form;
               the Column helpers below are the DataFrame form)
  * helper   — no Spark builtin; composed here from JVM expressions (still
               zero Python UDFs)

`coverage()` reports every documented function with its lowering and the
query/test that pins it — the §2.8 completeness check in executable form.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# name -> (group, lowering, pinned_by)
FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # Aggregate
    "AVG": ("agg", "avg", "agg_ungrouped"),
    "COUNT": ("agg", "count", "agg_ungrouped"),
    "APPROX_COUNT_DISTINCT": ("agg", "approx_count_distinct / hll_sketch_agg", "agg_approx_count_distinct"),
    "MAX": ("agg", "max", "agg_ungrouped"),
    "MIN": ("agg", "min", "agg_ungrouped"),
    "SUM": ("agg", "sum (exact-decimal discipline)", "agg_ungrouped"),
    "PERCENTILE_CONT": ("agg", "percentile_cont WITHIN GROUP", "agg_percentile"),
    "PERCENTILE_DISC": ("agg", "percentile_disc WITHIN GROUP", "agg_percentile"),
    "PERCENT_RANK": ("agg", "percent_rank window; WITHIN GROUP form -> count_if ratio (sqlfront)", "agg_percent_rank / test_sql_function_surface"),
    "FIRST_VALUE": ("agg", "min_by ordered-set (SQL WITHIN GROUP rewrite)", "agg_first_last_value / test_sql_function_surface"),
    "LAST_VALUE": ("agg", "max_by ordered-set (SQL WITHIN GROUP rewrite)", "agg_first_last_value / test_sql_function_surface"),
    "FIRST_VALUES": ("agg", "slice(sort_array(collect_list(struct)), 1, k) (SQL WITHIN GROUP rewrite)", "agg_nth_first_last_values / test_sql_function_surface"),
    "LAST_VALUES": ("agg", "slice(reverse(sort_array(...)), 1, k) (SQL WITHIN GROUP rewrite)", "agg_nth_first_last_values / test_sql_function_surface"),
    "NTH_VALUE": ("agg", "element_at(sort_array(collect_list(struct)), n) (SQL WITHIN GROUP rewrite)", "agg_nth_first_last_values / test_sql_function_surface"),
    "STDDEV_POP": ("agg", "stddev_pop (exact-decimal moments)", "agg_stddev"),
    "STDDEV_SAMP": ("agg", "stddev_samp (exact-decimal moments)", "agg_stddev"),
    # Numeric
    "ROUND": ("num", "round (numbers); epoch-int arithmetic (dates)", "math_round_floor_ceil / dt_trunc_round"),
    "CEIL": ("num", "ceil; date_trunc+interval (dates)", "math_round_floor_ceil"),
    "FLOOR": ("num", "floor; date_trunc (dates)", "math_round_floor_ceil"),
    "TRUNC": ("num", "floor on positives; date_trunc (dates)", "math_round_floor_ceil / dt_trunc_round"),
    "TO_NUMBER": ("num", "cast(x as double); format form via sqlfront.to_number_expr (java.text DecimalFormat)", "math_to_number / math_to_number_fmt"),
    "RAND": ("num", "rand([seed])", "tests/test_functions.py"),
    # Math
    "SIGN": ("math", "signum", "math_round_floor_ceil"),
    "ABS": ("math", "abs", "math_round_floor_ceil"),
    "SQRT": ("math", "sqrt", "math_transcendental"),
    "CBRT": ("math", "cbrt", "math_transcendental"),
    "EXP": ("math", "exp", "math_transcendental"),
    "POWER": ("math", "pow", "math_transcendental"),
    "LN": ("math", "ln", "math_transcendental"),
    "LOG": ("math", "LOG(x[,b]) -> log10(x) / log(b, x) — arg order flips", "tests/test_functions.py"),
    # String
    "SUBSTR": ("str", "substring (1-based, negative=from-end)", "str_substr_instr_case"),
    "INSTR": ("str", "instr", "str_substr_instr_case"),
    "TRIM": ("str", "trim", "str_trim_pad_concat"),
    "LTRIM": ("str", "ltrim", "str_trim_pad_concat"),
    "RTRIM": ("str", "rtrim", "str_trim_pad_concat"),
    "LPAD": ("str", "lpad; empty fill / len<1 → NULL (LPadFunction)", "str_trim_pad_concat / test_string_it_replay"),
    "LENGTH": ("str", "length", "str_substr_instr_case"),
    "REGEXP_SUBSTR": ("str", "regexp_extract(s, p, 0) (whole match)", "str_regexp / engine_sql_roundtrip"),
    "REGEXP_REPLACE": ("str", "regexp_replace (all matches)", "str_regexp"),
    "REGEXP_SPLIT": ("str", "split", "tests/test_functions.py"),
    "REGEXP_LIKE": ("str", "rlike / regexp_like", "str_regexp"),
    "UPPER": ("str", "upper", "str_substr_instr_case"),
    "LOWER": ("str", "lower", "str_substr_instr_case"),
    "REVERSE": ("str", "reverse", "str_substr_instr_case"),
    "TO_CHAR": ("str", "date_format / format_number (pattern dialects differ)", "dt_format_arith_tz"),
    "COLLATION_KEY": ("str", "collate(x, locale[_CI]) ICU collation (sqlfront rewrite)", "str_collation_ci / test_sql_function_surface"),
    # Time and Date
    "TO_DATE": ("dt", "to_timestamp (Phoenix DATE carries time)", "dt_parse"),
    "TO_TIME": ("dt", "to_timestamp", "dt_parse"),
    "TO_TIMESTAMP": ("dt", "to_timestamp", "dt_parse"),
    "CURRENT_DATE": ("dt", "current_timestamp (DATE carries time)", "sqlfront rename"),
    "CURRENT_TIME": ("dt", "current_timestamp", "sqlfront rename"),
    "NOW": ("dt", "current_timestamp", "sqlfront rename"),
    "CONVERT_TZ": ("dt", "to_utc_timestamp ∘ from_utc_timestamp (3-arg)", "dt_format_arith_tz / tests"),
    "TIMEZONE_OFFSET": ("dt", "helper timezone_offset (minutes)", "tests/test_functions.py"),
    "YEAR": ("dt", "year", "dt_extract_fields"),
    "MONTH": ("dt", "month", "dt_extract_fields"),
    "WEEK": ("dt", "weekofyear (ISO)", "dt_extract_fields"),
    "DAYOFYEAR": ("dt", "dayofyear", "dt_extract_fields"),
    "DAYOFMONTH": ("dt", "dayofmonth", "dt_extract_fields"),
    "DAYOFWEEK": ("dt", "weekday(ts)+1 (ISO Monday=1)", "dt_extract_fields"),
    "HOUR": ("dt", "hour", "dt_extract_fields"),
    "MINUTE": ("dt", "minute", "dt_extract_fields"),
    "SECOND": ("dt", "second", "dt_extract_fields"),
    # Array
    "ARRAY_ELEM": ("arr", "element_at (both 1-based)", "arr_elem_len"),
    "ARRAY_LENGTH": ("arr", "size", "arr_elem_len"),
    "ARRAY_APPEND": ("arr", "array_append", "arr_construct_ops"),
    "ARRAY_PREPEND": ("arr", "array_prepend", "arr_construct_ops"),
    "ARRAY_CAT": ("arr", "concat", "arr_construct_ops"),
    "ARRAY_FILL": ("arr", "array_repeat", "arr_construct_ops"),
    "ARRAY_TO_STRING": ("arr", "array_join", "arr_construct_ops"),
    "ANY": ("arr", "array_contains(transform(...))", "arr_any_all"),
    "ALL": ("arr", "forall", "arr_any_all"),
    # General
    "MD5": ("gen", "md5", "str_trim_pad_concat"),
    "INVERT": ("gen", "ORDER BY direction flip (sqlfront rewrite); loud error elsewhere", "test_sql_function_surface"),
    "ENCODE": ("gen", "encode_base62 helper + BASE62/BASE64 SQL rewrite", "test_functions / test_sql_function_surface"),
    "DECODE": ("gen", "unhex / unbase64 / BASE62 fold (SQL rewrite)", "test_functions / test_sql_function_surface"),
    "COALESCE": ("gen", "coalesce", "filter_case_cast"),
    "GET_BIT": ("gen", "helper get_bit", "bin_bytes_bits / tests"),
    "GET_BYTE": ("gen", "helper get_byte", "bin_bytes_bits / tests"),
    "OCTET_LENGTH": ("gen", "length(binary)", "bin_bytes_bits"),
    "SET_BIT": ("gen", "helper set_bit + SQL rewrite", "test_functions / test_sql_function_surface"),
    "SET_BYTE": ("gen", "helper set_byte + SQL rewrite", "test_functions / test_sql_function_surface"),
    # ---- post-doc reference functions (implemented in the reference under
    # phoenix-core-client/.../expression/function/ but not yet listed in
    # docs/phoenix.csv; counted separately by coverage()) ----
    "SIN": ("postdoc", "sin", "math_trig"),
    "COS": ("postdoc", "cos", "math_trig"),
    "TAN": ("postdoc", "tan", "math_trig"),
    "PI": ("postdoc", "pi() literal (MathPIFunction)", "math_transcendental"),
    "STRING_TO_ARRAY": (
        "postdoc",
        "split with regex-escaped literal delimiter (sqlfront rewrite)",
        "mutations_ddl (n_type_words) / tests/test_sqlfront.py",
    ),
    "ARRAY_REMOVE": ("postdoc", "array_remove", "arr_construct_ops"),
    "JSON_VALUE": ("postdoc", "get_json_object (scalar leaf)", "json_value"),
    "JSON_QUERY": ("postdoc", "get_json_object (object/array leaf; sqlfront RENAME)", "json_value / test_sql_function_surface"),
    "JSON_EXISTS": ("postdoc", "get_json_object IS NOT NULL (SQL rewrite)", "json_exists_filter / test_sql_function_surface"),
    "JSON_MODIFY": ("postdoc", "variant map rebuild, type-preserving (SQL rewrite; top-level paths)", "json_construct / test_sql_function_surface"),
    "BSON_VALUE": ("postdoc", "typed JSON leaf extraction (SQL rewrite via catalog types)", "bson_condition_filter / test_sql_function_surface"),
    "BSON_CONDITION_EXPRESSION": ("postdoc", "bson condition grammar → Column or SQL text (dual backend; $EXPR/$VAL/$KEYS form)", "bson_condition_filter / bson_condition_sql"),
    "ENCODE_BINARY": ("postdoc", "base64 / hex by format arg", "bin_encode_decode"),
    "DECODE_BINARY": ("postdoc", "unbase64 / unhex by format arg", "bin_encode_decode"),
    "SUB_BINARY": ("postdoc", "substring on binary", "bin_bytes_bits"),
    "PHOENIX_ROW_TIMESTAMP": ("postdoc", "change-log commit timestamp column", "meta_row_timestamp"),
    "PARTITION_ID": ("postdoc", "spark_partition_id (SQL rewrite)", "meta_partition_id / test_sql_function_surface"),
    "DISTINCT_COUNT": ("postdoc", "count(DISTINCT x) (DistinctCountAggregateFunction)", "agg_count_distinct"),
    "COLLECTDISTINCT": ("postdoc", "sort_array(collect_set(x)) (DistinctValueAggregateFunction)", "tests/test_functions.py"),
    "SUBBINARY": ("postdoc", "substring on binary (NAME-constant spelling of SUB_BINARY; sqlfront RENAME)", "bin_bytes_bits"),
    "BSON_VALUE_TYPE": ("postdoc", "helper bson_value_type + SQL CASE rendering of the variant probe", "bson_value_type / test_sql_function_surface"),
    "BSON_UPDATE_EXPRESSION": ("postdoc", "bson_update_expression; binds in plain-SQL ON DUPLICATE KEY UPDATE", "test_bson / test_sql_function_surface"),
    "ROW_SIZE": ("postdoc", "helper row_size — serialized-row byte length", "tests/test_functions.py"),
    "RAW_ROW_SIZE": ("postdoc", "helper row_size (HBase cell overhead has no parquet analog; same value)", "tests/test_functions.py"),
    "ROWKEY_BYTES_STRING": ("postdoc", "helper rowkey_bytes_string — \\x00-joined PK rendering", "tests/test_functions.py"),
    # HBase scan-internals diagnostics: deliberately doc-only.  Their subjects
    # (region scan boundaries, salt segments, view-index id byte layout) do
    # not exist in a Parquet+Catalyst engine; the nearest observable analogs
    # are noted so a migrating user knows where to look instead.
    "SCAN_START_KEY": ("postdoc", "doc-only: region scan boundary; Spark analog input_file_name()", "doc-only"),
    "SCAN_END_KEY": ("postdoc", "doc-only: region scan boundary; Spark analog input_file_name()", "doc-only"),
    "TOTAL_SEGMENTS": ("postdoc", "doc-only: salt-segment count; catalog salt metadata (scan_salted_roundtrip)", "doc-only"),
    "DECODE_VIEW_INDEX_ID": ("postdoc", "doc-only: view-index id byte layout; index DDL is parse-only (SURVEY §4.1)", "doc-only"),
}


def coverage() -> dict[str, int]:
    """Counts per lowering group — the §2.8 completeness summary."""
    out: dict[str, int] = {}
    for group, _, _ in FUNCTIONS.values():
        out[group] = out.get(group, 0) + 1
    return out


# ---------------------------------------------------------------------------
# Column helpers for the functions with no 1:1 Spark builtin.  All are pure
# JVM expression compositions — whole-stage-codegen friendly, no Python UDFs.
# ---------------------------------------------------------------------------


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def get_byte(bin_col, offset: int) -> Column:
    """GET_BYTE(binary, offset) — 0-based byte value (GetByteFunction)."""
    return F.conv(
        F.substring(F.hex(_c(bin_col)), 2 * offset + 1, 2), 16, 10
    ).cast("int")


def get_bit(bin_col, offset: int) -> Column:
    """GET_BIT(binary, offset) — 0-based bit across the byte array."""
    byte = get_byte(bin_col, offset // 8)
    return F.shiftright(byte, offset % 8).bitwiseAND(F.lit(1)).cast("int")


def set_byte(bin_col, offset: int, value: int) -> Column:
    """SET_BYTE(binary, offset, v) — splice one byte (SetByteFunction)."""
    b = _c(bin_col)
    return F.concat(
        F.substring(b, 1, offset),
        F.unhex(F.lpad(F.hex(F.lit(value)), 2, "0")),
        F.substring(b, offset + 2, 2147483647),
    )


def set_bit(bin_col, offset: int, value: int) -> Column:
    """SET_BIT(binary, offset, v) — rewrite one bit via its byte."""
    byte = get_byte(bin_col, offset // 8)
    mask = 1 << (offset % 8)
    new_byte = (
        byte.bitwiseOR(F.lit(mask))
        if value
        else byte.bitwiseAND(F.lit(~mask & 0xFF))
    )
    b = _c(bin_col)
    return F.concat(
        F.substring(b, 1, offset // 8),
        F.unhex(F.lpad(F.hex(new_byte), 2, "0")),
        F.substring(b, offset // 8 + 2, 2147483647),
    )


_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def encode_base62(num_col) -> Column:
    """ENCODE(n, 'BASE62') (EncodeFunction): base-62 rendering of a
    non-negative bigint — an 11-step aggregate fold (62^11 > 2^63), emitting
    digits least-significant first into a prepend.  No loops, no UDF."""
    n = _c(num_col).cast("long")
    init = F.struct(n.alias("rem"), F.lit("").alias("s"))

    def _merge(acc, i):
        digit = F.substr(
            F.lit(_B62), (F.pmod(acc["rem"], F.lit(62)) + 1).cast("int"), F.lit(1)
        )
        next_rem = ((acc["rem"] - F.pmod(acc["rem"], F.lit(62))) / 62).cast("long")
        return F.when(
            (acc["rem"] > 0) | (i == 0),
            F.struct(next_rem.alias("rem"), F.concat(digit, acc["s"]).alias("s")),
        ).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(10)), init, _merge, lambda acc: acc["s"]
    )


def decode_hex(str_col) -> Column:
    """DECODE(s, 'HEX') (DecodeFunction): hex string → bytes."""
    return F.unhex(_c(str_col))


def convert_tz(ts_col, from_tz: str, to_tz: str) -> Column:
    """CONVERT_TZ(ts, from, to) (ConvertTimezoneFunction): reinterpret a
    naive timestamp from one zone into another."""
    return F.from_utc_timestamp(F.to_utc_timestamp(_c(ts_col), from_tz), to_tz)


def timezone_offset(tz: str, ts_col) -> Column:
    """TIMEZONE_OFFSET(tz, ts) (TimezoneOffsetFunction): offset of tz from
    UTC at ts, in minutes (DST-aware)."""
    ts = _c(ts_col)
    return (
        (F.unix_timestamp(F.from_utc_timestamp(ts, tz)) - F.unix_timestamp(ts)) / 60
    ).cast("int")


def dayofweek_iso(ts_col) -> Column:
    """DAYOFWEEK (DayOfWeekFunction.java:66, Joda): ISO Monday=1..Sunday=7."""
    return (F.weekday(_c(ts_col)) + 1).cast("int")


def collect_distinct(col) -> Column:
    """COLLECTDISTINCT (DistinctValueAggregateFunction.java:34): distinct
    values of a group as an array.  The reference emits them in value-count
    map order; sort_array pins a deterministic order instead."""
    return F.sort_array(F.collect_set(_c(col)))


def bson_value_type(doc_col, field: str) -> Column:
    """BSON_VALUE_TYPE(doc, 'field') → Phoenix SQL type name of the field
    (BsonValueTypeFunction.java:121-143: VARCHAR / INTEGER / BIGINT / DOUBLE
    / BOOLEAN / BSON / 'NULL'; SQL NULL when the field is absent).

    BSON documents are stored as JSON strings in this engine (PJson/PBson →
    string column, see queries/scalar_json.py); the probe is Spark 4 variant
    introspection — parse_json → try_variant_get → schema_of_variant — all
    JVM-side.  JSON integers always parse as BIGINT-class variants, so the
    INTEGER/BIGINT split is decided by magnitude, matching how a JSON parser
    chooses BsonInt32 vs BsonInt64."""
    parsed = F.parse_json(_c(doc_col))
    v = F.try_variant_get(parsed, f"$.{field}", "variant")
    t = F.schema_of_variant(v)
    as_long = F.try_variant_get(parsed, f"$.{field}", "long")
    return (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(t == "VOID", F.lit("NULL"))
        .when(t == "STRING", F.lit("VARCHAR"))
        .when(t == "BOOLEAN", F.lit("BOOLEAN"))
        .when(
            t.isin("TINYINT", "SMALLINT", "INT", "BIGINT"),
            # asymmetric int32 range: abs() would misclassify INT32_MIN
            F.when(
                as_long.between(-2147483648, 2147483647), F.lit("INTEGER")
            ).otherwise(F.lit("BIGINT")),
        )
        .when(
            t.startswith("DECIMAL") | t.isin("DOUBLE", "FLOAT"), F.lit("DOUBLE")
        )
        .when(
            t.startswith("OBJECT") | t.startswith("ARRAY") | t.startswith("MAP"),
            F.lit("BSON"),
        )
        .otherwise(F.lit("VARCHAR"))
    )


def row_size(*cols) -> Column:
    """ROW_SIZE / RAW_ROW_SIZE (RowSizeFunction.java, RawRowSizeFunction.java):
    the reference sums HBase cell sizes for the row.  Cells don't exist in
    columnar parquet, so the analog is the serialized-row byte length of the
    projected columns (JSON rendering, octet-exact).  RAW_ROW_SIZE's extra
    per-cell key overhead has no parquet equivalent; both names map here."""
    return F.octet_length(F.to_json(F.struct(*[_c(c) for c in cols])))


def rowkey_bytes_string(*pk_cols) -> Column:
    """ROWKEY_BYTES_STRING (RowKeyBytesStringFunction.java): printable form
    of the row key.  Phoenix rowkeys join variable-length PK parts with a
    \\x00 separator; the analog renders the PK tuple the same way (each part
    in its canonical string form)."""
    return F.concat_ws("\x00", *[_c(c).cast("string") for c in pk_cols])


def ntz_epoch_micros_sql(col: str) -> str:
    """Timezone-INDEPENDENT epoch-microseconds SQL for a DATE / TIMESTAMP_NTZ
    column: the naive value interpreted as UTC, as DuckDB's epoch_us does.

    ``unix_micros(cast(x as timestamp))`` would route the naive value through
    the session timezone (an NTZ→LTZ cast), shifting results by the UTC
    offset and breaking across DST transitions under a non-UTC driver.  This
    form uses only field extractions, which are pure on NTZ values:
    ``unix_date`` of the date part (a plain day count) plus time-of-day
    microseconds; ``date_part('SECOND')`` carries the fractional seconds
    exactly.  DATE inputs first cast to TIMESTAMP_NTZ (midnight, a pure
    field operation — unlike DATE→TIMESTAMP, which is zone-dependent).
    """
    c = f"cast({col} as timestamp_ntz)"
    # field extractions return INT — widen before multiplying (minute*6e7
    # overflows int32 for minute >= 36)
    return (
        f"(cast(unix_date(cast({c} as date)) as bigint) * 86400000000"
        f" + cast(hour({c}) as bigint) * 3600000000"
        f" + cast(minute({c}) as bigint) * 60000000"
        f" + cast(date_part('SECOND', {c}) * 1000000 as bigint))"
    )


# Phoenix date ROUND/FLOOR/CEIL/TRUNC time units (TimeUnit.java: day, hour,
# minute, second, millisecond, week, month, year) with fixed microsecond
# widths where the unit is uniform.  WEEK floors to MONDAY (java.time ISO
# week), which epoch arithmetic reaches via the Monday-aligned offset
# (1969-12-29 was a Monday = -3 days epoch).
_UNIT_MICROS = {
    "MILLISECOND": 1_000,
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
    "WEEK": 7 * 86_400_000_000,
}
_WEEK_OFFSET = -3 * 86_400_000_000  # Monday 1969-12-29 00:00 in epoch µs
DATE_ROUND_UNITS = frozenset(_UNIT_MICROS) | {"MONTH", "YEAR"}


def ntz_date_round_sql(mode: str, col: str, unit: str, multiplier: int = 1) -> str:
    """Timezone-independent SQL for Phoenix ROUND/FLOOR/CEIL/TRUNC on a
    DATE/TIMESTAMP_NTZ column, mirroring the reference bit-for-bit:

      * Fixed-width units (MILLISECOND..DAY, with multiplier) follow
        RoundDateExpression.roundTime: ``(ms + up) / divBy * divBy`` with
        JAVA TRUNCATING division and up = 0 (floor), divBy/2 (round),
        divBy-1 (ceil) — so pre-epoch (negative-ms) values round TOWARD
        ZERO, e.g. FLOOR(1969-12-31, 'DAY') = 1970-01-01, exactly as the
        reference computes it.  Spark's ``div`` is Java-truncating, and the
        arithmetic runs in the reference's millisecond domain (PDate is
        ms-precision; sub-ms µs truncate first).
      * WEEK / MONTH / YEAR are joda field rounds (RoundWeekExpression /
        RoundMonthExpression / RoundYearExpression use GJChronology
        roundFloorCopy / roundCeilingCopy / roundHalfEvenCopy): FLOOR and
        CEIL are true calendar floor/ceiling even pre-epoch, and ROUND is
        HALF-EVEN — at the exact midpoint the boundary whose field value
        (ISO week number / month-of-year / year) is even wins.

    All arithmetic is field extraction + epoch integers + ``timestampadd``
    on an NTZ literal — never the session zone.
    """
    mode = mode.upper()
    unit = unit.upper()
    if unit not in DATE_ROUND_UNITS:
        raise ValueError(f"unknown date unit {unit!r}")
    if multiplier != 1 and unit in ("MONTH", "YEAR"):
        raise ValueError(f"multiplier on {unit} is not uniform; unsupported")
    c = f"cast({col} as timestamp_ntz)"
    if unit in _UNIT_MICROS and unit != "WEEK":
        u_ms = (_UNIT_MICROS[unit] * multiplier) // 1_000
        e_ms = f"({ntz_epoch_micros_sql(col)} div 1000)"
        up = {
            "FLOOR": 0,
            "TRUNC": 0,
            "ROUND": u_ms // 2,
            "CEIL": u_ms - 1,
        }.get(mode)
        if up is None:
            raise ValueError(f"unknown round mode {mode!r}")
        fe = f"((({e_ms} + {up}) div {u_ms}) * {u_ms * 1000})"
        return (
            f"timestampadd(MICROSECOND, {fe},"
            f" TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        )
    if unit == "WEEK":
        # joda weekOfWeekyear: true Monday floor/ceiling (pmod is
        # sign-correct floor, unlike truncating division)
        u = _UNIT_MICROS["WEEK"] * multiplier
        e = ntz_epoch_micros_sql(col)
        base = f"({e} - {_WEEK_OFFSET})"
        floor_e = f"(({base} - pmod({base}, {u})) + {_WEEK_OFFSET})"
        ceil_e = f"(({base} + pmod(- {base}, {u})) + {_WEEK_OFFSET})"
        if mode in ("FLOOR", "TRUNC"):
            fe = floor_e
        elif mode == "CEIL":
            fe = ceil_e
        elif mode == "ROUND":
            # half-even: nearer Monday wins; the exact midpoint (Thursday
            # 12:00) goes to the Monday whose ISO week number is even
            d = f"pmod({base}, {u})"
            even_fl = (
                "weekofyear(timestampadd(MICROSECOND, "
                f"{floor_e}, TIMESTAMP_NTZ'1970-01-01 00:00:00')) % 2 = 0"
            )
            fe = (
                f"(CASE WHEN {d} < {u // 2} THEN {floor_e} "
                f"WHEN {d} > {u // 2} THEN {ceil_e} "
                f"WHEN {even_fl} THEN {floor_e} ELSE {ceil_e} END)"
            )
        else:
            raise ValueError(f"unknown round mode {mode!r}")
        return (
            f"timestampadd(MICROSECOND, {fe},"
            f" TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        )
    # MONTH / YEAR: non-uniform widths -> field arithmetic
    if unit == "MONTH":
        fl = f"make_timestamp_ntz(year({c}), month({c}), 1, 0, 0, 0)"
        nxt = f"timestampadd(MONTH, 1, {fl})"
        even_fl = f"month({fl}) % 2 = 0"
    else:  # YEAR
        fl = f"make_timestamp_ntz(year({c}), 1, 1, 0, 0, 0)"
        nxt = f"timestampadd(YEAR, 1, {fl})"
        even_fl = f"year({fl}) % 2 = 0"
    if mode in ("FLOOR", "TRUNC"):
        return fl
    if mode == "CEIL":
        return f"(CASE WHEN {c} = {fl} THEN {fl} ELSE {nxt} END)"
    if mode == "ROUND":
        # joda roundHalfEvenCopy: µs distance to each boundary; the exact
        # midpoint goes to the boundary with the even field value
        e = ntz_epoch_micros_sql(c)
        lo = f"({e} - {ntz_epoch_micros_sql(fl)})"
        hi = f"({ntz_epoch_micros_sql(nxt)} - {e})"
        return (
            f"(CASE WHEN {lo} < {hi} THEN {fl} "
            f"WHEN {lo} > {hi} THEN {nxt} "
            f"WHEN {even_fl} THEN {fl} ELSE {nxt} END)"
        )
    raise ValueError(f"unknown round mode {mode!r}")

