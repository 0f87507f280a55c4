"""Binary / bit / encode function surface (SURVEY.md §2.8 binary group).

Reference: GetByteFunction / GetBitFunction / SetByteFunction /
OctetLengthFunction / SubBinaryFunction / EncodeBinaryFunction /
DecodeBinaryFunction under phoenix-core-client/.../expression/function/.

Mappings pinned:
  OCTET_LENGTH(bin)     → length(binary)  /  octet_length
  GET_BYTE(bin, i)      → ascii(substr(s, i, 1)) for ASCII payloads;
                          general bytes go through conv(hex(...)) — pinned
                          via the ascii form on the documents payload
  GET_BIT(bin, i)       → (byte >> bit) & 1 expression
  SUBBINARY(bin, s, n)  → substring on binary (rendered as lowercase hex)
  ENCODE/DECODE base64  → base64/unbase64 round-trip
  ENCODE/DECODE hex     → hex/unhex (lowercased — DuckDB renders lowercase)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()

REG.add(
    "bin_bytes_bits",
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.length(F.col("text").cast("binary")).cast("int").alias("octet_len"),
        F.ascii(F.substring("text", 3, 1)).cast("int").alias("byte3"),
        (
            F.shiftright(F.ascii(F.substring("text", 3, 1)), 2).bitwiseAND(F.lit(1))
        ).cast("int").alias("bit2_of_byte3"),
        F.lower(F.hex(F.substring(F.col("text"), 5, 6).cast("binary"))).alias(
            "subbin_hex"
        ),
    ),
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT)        AS octet_len,
           CAST(ascii(substr(text, 3, 1)) AS INT)         AS byte3,
           CAST((ascii(substr(text, 3, 1)) >> 2) & 1 AS INT) AS bit2_of_byte3,
           lower(hex(encode(substr(text, 5, 6))))         AS subbin_hex
    FROM documents
    """,
)

REG.add(
    "bin_encode_decode",
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.substring("text", 1, 12).cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
        F.lower(F.hex(F.substring("text", 1, 6).cast("binary"))).alias("hx"),
        F.unhex(F.hex(F.substring("text", 1, 6).cast("binary")))
        .cast("string")
        .alias("hx_roundtrip"),
    ),
    """
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 12)))                  AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 12))))) AS b64_roundtrip,
           lower(hex(encode(substr(text, 1, 6))))                  AS hx,
           decode(from_hex(lower(hex(encode(substr(text, 1, 6)))))) AS hx_roundtrip
    FROM documents
    """,
)

# --- system/meta: PARTITION_ID() (PartitionIdFunction.java → the physical
# partition the row came from).  The value SET is engine/parallelism-specific,
# so the oracle checks the engine-independent invariant instead: every row
# reports a valid (non-null, non-negative) partition id, and at least one
# partition exists.  The sketchy part — spark_partition_id() evaluated per
# row inside the scan — is still fully exercised Spark-side.
REG.add(
    "meta_partition_id",
    lambda spark, sf: t(spark, sf, "lineitem")
    .select(F.spark_partition_id().alias("pid"))
    .agg(
        F.sum(F.when(F.col("pid") >= 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rows_with_pid"),
        (F.countDistinct("pid") >= F.lit(1)).alias("has_partitions"),
    ),
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_with_pid,
           true AS has_partitions
    FROM lineitem
    """,
)

# --- SET_BYTE / SET_BIT / ENCODE_BINARY / DECODE_BINARY from plain SQL -------
# Round-5 sqlfront lowering (SetByteFunction / SetBitFunction /
# EncodeBinaryFunction / DecodeBinaryFunction): splice byte 1 of the first
# four MD5 bytes to 0x7f and re-encode.  The oracle reproduces the splice
# with plain hex-string surgery; the constant SET_BIT case pins the
# bit-twiddling path (X'F0' bit0 := 1 -> 0xf1).
def _bin_set_splice(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        """
        SELECT doc_id,
               ENCODE_BINARY(
                 SET_BYTE(DECODE_BINARY(SUBSTR(MD5(text), 1, 8), 'HEX'), 1, 127),
                 'HEX') AS spliced,
               ENCODE_BINARY(SET_BIT(DECODE_BINARY('f0', 'HEX'), 0, 1), 'HEX')
                 AS bit_set
        FROM documents
        """
    )


REG.add(
    "bin_set_splice",
    _bin_set_splice,
    """
    SELECT doc_id,
           substr(md5(text), 1, 2) || '7f' || substr(md5(text), 5, 4) AS spliced,
           'f1' AS bit_set
    FROM documents
    """,
)
