"""String function surface (SURVEY.md §2.8 "Functions (String)").

Phoenix string functions live one-class-per-function under
phoenix-core-client/.../expression/function/ (SubstrFunction.java,
InstrFunction.java, RegexpReplaceFunction.java, ...; registry enum
ExpressionType.java:36); the complete documented list is docs/phoenix.csv
"Functions (String)".

Mappings pinned here (Phoenix → Spark), including the SURVEY-flagged traps:
  SUBSTR(s, pos[, len])  → substring   (both 1-based; negative pos = from end)
  INSTR(s, sub)          → instr       (1-based, 0 = not found)
  TRIM/LTRIM/RTRIM       → trim/ltrim/rtrim
  LPAD(s, n[, pad])      → lpad
  LENGTH / REVERSE / UPPER / LOWER → length / reverse / upper / lower
  REGEXP_SUBSTR(s, p)    → regexp_extract(s, p, 0)  (group 0 = full match,
                           matching Phoenix's whole-match return; Spark's
                           default group 1 would error on group-free patterns)
  REGEXP_REPLACE(s, p, r)→ regexp_replace  (replaces ALL matches — DuckDB
                           needs the 'g' flag to agree)
  ||                     → concat
  MD5                    → md5

Everything is a built-in JVM expression inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t, views

REG = Registry()

# --- COLLATION_KEY analogue: collation-aware compare/distinct ----------------
# Phoenix CollationKeyFunction produces an ICU sort key for locale-aware
# ordering; Spark 4's native collations (COLLATE UNICODE_CI, ...) are the
# engine-level equivalent.  Pinned against the oracle through the
# case-insensitive *semantics* (lower()-normalized on DuckDB's side).
def _collation_ci(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT p_brand,
               COUNT(DISTINCT upper(p_type) COLLATE UNICODE_CI) AS n_types_ci,
               CAST(SUM(CASE WHEN p_name COLLATE UNICODE_CI = upper(p_name)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_ci_eq
        FROM part GROUP BY p_brand
        """
    )


REG.add(
    "str_collation_ci",
    _collation_ci,
    """
    SELECT p_brand,
           CAST(COUNT(DISTINCT lower(upper(p_type))) AS BIGINT) AS n_types_ci,
           CAST(SUM(CASE WHEN lower(p_name) = lower(upper(p_name))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ci_eq
    FROM part GROUP BY p_brand
    """,
)

REG.add(
    "str_substr_instr_case",
    lambda spark, sf: t(spark, sf, "part").select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("sub_pos"),
        F.substring("p_name", -4, 4).alias("sub_neg"),
        F.instr("p_name", "a").alias("pos_a"),
        F.upper("p_type").alias("type_up"),
        F.lower("p_brand").alias("brand_lo"),
        F.length("p_name").cast("int").alias("name_len"),
        F.reverse("p_brand").alias("brand_rev"),
    ),
    """
    SELECT p_partkey,
           substr(p_name, 1, 8)        AS sub_pos,
           substr(p_name, -4, 4)       AS sub_neg,
           CAST(instr(p_name, 'a') AS INT)  AS pos_a,
           upper(p_type)               AS type_up,
           lower(p_brand)              AS brand_lo,
           CAST(length(p_name) AS INT) AS name_len,
           reverse(p_brand)            AS brand_rev
    FROM part
    """,
)

REG.add(
    "str_trim_pad_concat",
    lambda spark, sf: t(spark, sf, "customer").select(
        "c_custkey",
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("xx"), F.col("c_name")), F.lit("x")).alias("ltrimmed"),
        F.rtrim(F.concat(F.col("c_name"), F.lit("..")), F.lit(".")).alias("rtrimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("tagged"),
        F.md5("c_name").alias("name_md5"),
    ),
    """
    SELECT c_custkey,
           trim('  ' || c_name || '  ')      AS trimmed,
           ltrim('xx' || c_name, 'x')        AS ltrimmed,
           rtrim(c_name || '..', '.')        AS rtrimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           c_mktsegment || '#' || c_name     AS tagged,
           md5(c_name)                       AS name_md5
    FROM customer
    """,
)

# --- CHAR(n) space-padding comparison semantics (SURVEY §7 hard part #5) ----
# Phoenix CHAR values are space-padded to n but compare as if trimmed
# (PChar.java pads on write; comparisons strip).  The engine's rule: CHAR
# columns keep StringType and equality against CHAR-typed operands goes
# through rtrim — pinned here by comparing padded vs unpadded forms.
REG.add(
    "str_char_padding",
    lambda spark, sf: t(spark, sf, "nation").select(
        "n_nationkey",
        F.rpad("n_name", 20, " ").alias("as_char20"),
        (F.rtrim(F.rpad("n_name", 20, " ")) == F.col("n_name")).alias("char_eq"),
        F.length(F.rpad("n_name", 20, " ")).cast("int").alias("char_len"),
    ),
    """
    SELECT n_nationkey,
           rpad(n_name, 20, ' ')                        AS as_char20,
           rtrim(rpad(n_name, 20, ' ')) = n_name        AS char_eq,
           CAST(length(rpad(n_name, 20, ' ')) AS INT)   AS char_len
    FROM nation
    """,
)

REG.add(
    "str_regexp",
    lambda spark, sf: t(spark, sf, "part").select(
        "p_partkey",
        F.regexp_extract("p_type", "[A-Z]+", 0).alias("first_word"),
        F.regexp_extract("p_name", "[0-9]+", 0).alias("first_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_type").rlike("^ECONOMY").cast("boolean").alias("is_economy"),
    ),
    """
    SELECT p_partkey,
           regexp_extract(p_type, '[A-Z]+')        AS first_word,
           regexp_extract(p_name, '[0-9]+')        AS first_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(p_type, '^ECONOMY')      AS is_economy
    FROM part
    """,
)


# --- LPAD's NULL/truncation contract (§2.8) ----------------------------------
# LpadFunction.evaluate orders its fast-paths so the FILL expression is only
# evaluated when padding is actually needed: a non-positive output length is
# NULL, output length <= input length truncates (even with an empty/NULL
# fill), and only the pad path turns an empty fill into NULL
# (LpadFunction.java:79-127; StringIT.java:159-232).
def _lpad_contract(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        "SELECT c_custkey, "
        "LPAD(c_name, 5) AS t5, "
        "LPAD(c_name, 3, '') AS t3, "
        "LPAD(c_name, 25, 'xy') AS p25, "
        "LPAD(c_name, 25, '') AS pe, "
        "LPAD(c_name, 0, 'x') AS p0 "
        "FROM customer WHERE c_custkey <= 200"
    )


REG.add(
    "str_lpad_contract",
    _lpad_contract,
    """
    SELECT c_custkey,
           substr(c_name, 1, 5)  AS t5,
           substr(c_name, 1, 3)  AS t3,
           lpad(c_name, 25, 'xy') AS p25,
           CASE WHEN length(c_name) >= 25 THEN substr(c_name, 1, 25)
                ELSE NULL END    AS pe,
           CAST(NULL AS VARCHAR) AS p0
    FROM customer WHERE c_custkey <= 200
    """,
)
