"""Multimodal column operators (SURVEY.md §7 M8).

Design for image/audio/video at 100 TB: media lives in opaque `binary`
columns (or object-store path columns) beside typed metadata; per-item work
(decode / resize / frame-sample / feature-extract) runs as Arrow-batched
Pandas iterators over `mapInPandas`, so bytes stream batch-by-batch through
Python without ever concentrating on the driver, and the surrounding plan
(partitioning, predicate pushdown on metadata, joins against labels) stays
JVM-side.

The fixture set has no real media, so the `documents.text` bytes stand in as
the payload:

  * mm_binary_meta — pure-JVM binary ops (octet length, byte slicing, hex,
    content hash): oracle-paired.
  * mm_decode_features — the mapInPandas plumbing with a DETERMINISTIC FAKE
    feature extractor (byte histogram + mean; numpy, vectorized per batch).
    The real decoder hook (`decode_media`) raises NotImplementedError: the
    image/audio libs aren't in this container — the Spark-side contract
    (schema, batch iteration, partitioning) is what's real and tested.
  * mm_frame_sample — 1→N frame sampling through mapInPandas, value-hash
    oracle-paired (frames are code-point slices fingerprinted with md5,
    both reproducible in SQL).
  * mm_resize_thumbnail — fixed-dimension mean-pool downsample emitting a
    typed array<double>, the post-decode step of an image resize.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from phoenix_spark.queries._util import Registry, ship_package, t

REG = Registry()

# --- binary metadata ops, JVM-side (oracle-paired) ---------------------------
REG.add(
    "mm_binary_meta",
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.length(F.col("text").cast("binary")).cast("int").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("text"), 1, 8).cast("binary"))).alias(
            "head_hex"
        ),
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        F.substring(F.col("text"), 1, 4).alias("magic"),
    ),
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT)      AS n_bytes,
           lower(hex(encode(substr(text, 1, 8))))       AS head_hex,
           md5(text)                                    AS content_md5,
           substr(text, 1, 4)                           AS magic
    FROM documents
    """,
)


def decode_media(payload: bytes, media_type: str):
    """Real media decode hook (image/audio/video).

    STUB: decode libraries (PIL/libav/...) are not in this container.  The
    fake featurizer below exercises the identical Spark plumbing.
    """
    raise NotImplementedError(
        f"media decoding ({media_type}) requires codec libraries not present "
        "in this environment; see _fake_features for the plumbing contract"
    )


_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("h0", LongType()),  # byte histogram, 4 x 64-value buckets
        StructField("h1", LongType()),
        StructField("h2", LongType()),
        StructField("h3", LongType()),
    ]
)


def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic per-item featurizer over Arrow batches.

    The shape is exactly what a real decoder would use: iterate batches,
    vectorize per batch, emit a typed frame — nothing touches the driver.
    """
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(b >> 6, minlength=4)
            rows.append(
                (
                    int(doc_id),
                    int(b.size),
                    float(b.sum()) / b.size if b.size else 0.0,
                    int(hist[0]),
                    int(hist[1]),
                    int(hist[2]),
                    int(hist[3]),
                )
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA.fields])


# --- mapInPandas decode/featurize plumbing (rows-only check) -----------------
# mean_byte = sum/size: integer sum (< 2^53) divided once — deterministic.
def _decode_features(spark, sf):
    ship_package(spark)  # executors must import this module for the UDF
    return (
        t(spark, sf, "documents")
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
        .mapInPandas(_fake_features, schema=_FEAT_SCHEMA)
    )


# Oracle-paired: fixture text is pure ASCII (verified: max codepoint 121),
# so unicode(char) == byte value and DuckDB can recompute the histogram +
# integer-sum mean exactly — the Pandas-UDF batch plumbing gets a value-hash
# check, not just a row count.  (The Python path stays general for non-ASCII
# payloads; only the oracle relies on the fixture's ASCII-ness.)
REG.add(
    "mm_decode_features",
    _decode_features,
    """
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             [unicode(text[p]) FOR p IN range(1, length(text) + 1)] AS bs
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(list_sum(bs) AS DOUBLE) / n AS mean_byte,
           CAST(len(list_filter(bs, x -> x // 64 = 0)) AS BIGINT) AS h0,
           CAST(len(list_filter(bs, x -> x // 64 = 1)) AS BIGINT) AS h1,
           CAST(len(list_filter(bs, x -> x // 64 = 2)) AS BIGINT) AS h2,
           CAST(len(list_filter(bs, x -> x // 64 = 3)) AS BIGINT) AS h3
    FROM b
    """,
)


# --- frame sampling: 1 item → N sampled frames (oracle-paired) ---------------
# Video frame-sampling plumbing: each payload is treated as a sequence of
# fixed-size frames (a real decoder would read codec frame boundaries —
# decode_media above is the gated hook); every STRIDE-th frame is emitted as
# its own row.  The mapInPandas iterator yields MORE rows than it receives —
# the 1→N explode shape a frame sampler needs — while frames are sliced and
# fingerprinted per Arrow batch.  Slicing is by code point and the
# fingerprint is md5 of the slice's UTF-8 bytes, both of which DuckDB's
# substr/md5 reproduce exactly — so this mapInPandas operator is value-hash
# oracle-paired, not just rows-checked.
_FRAME_CHARS = 64
_FRAME_STRIDE = 4

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_md5", StringType()),
        StructField("frame_len", LongType()),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        out: list[tuple] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n_frames = -(-len(text) // _FRAME_CHARS)  # ceil
            for fi in range(0, n_frames, _FRAME_STRIDE):
                frame = text[fi * _FRAME_CHARS : (fi + 1) * _FRAME_CHARS]
                out.append(
                    (
                        int(doc_id),
                        fi,
                        hashlib.md5(frame.encode("utf-8")).hexdigest(),
                        len(frame),
                    )
                )
        yield pd.DataFrame(
            out, columns=[f.name for f in _FRAME_SCHEMA.fields]
        )


def _frame_sample(spark, sf):
    ship_package(spark)
    return (
        t(spark, sf, "documents")
        .select("doc_id", "text")
        .mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)
    )


REG.add(
    "mm_frame_sample",
    _frame_sample,
    f"""
    SELECT doc_id,
           fi                                                   AS frame_no,
           md5(substr(text, fi * {_FRAME_CHARS} + 1, {_FRAME_CHARS}))
                                                                AS frame_md5,
           length(substr(text, fi * {_FRAME_CHARS} + 1, {_FRAME_CHARS}))
                                                                AS frame_len
    FROM documents,
         LATERAL (
           SELECT unnest(range(0,
                    CAST(ceil(length(text) / {_FRAME_CHARS}.0) AS BIGINT),
                    {_FRAME_STRIDE})) AS fi
         )
    """,
)


# --- resize: fixed-dimension thumbnail per item (deterministic fake) ---------
# Image-resize plumbing: the payload's bytes are pooled into a fixed
# _THUMB_DIM-cell thumbnail (mean byte value per equal-width cell — the
# downsample a real resize kernel performs after decode).  Cell sums are
# integer (< 2^53), so the emitted doubles are run-to-run deterministic;
# the decode itself stays behind decode_media.  Output is a typed
# array<double> column — the shape an embedding/vision model consumes.
_THUMB_DIM = 16

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("thumb", ArrayType(DoubleType())),
    ]
)


def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            if b.size == 0:
                rows.append((int(doc_id), 0, [0.0] * _THUMB_DIM))
                continue
            edges = np.linspace(0, b.size, _THUMB_DIM + 1, dtype=np.int64)
            sums = np.add.reduceat(b.astype(np.int64), edges[:-1])
            widths = np.maximum(np.diff(edges), 1)
            rows.append(
                (int(doc_id), int(b.size), (sums / widths).tolist())
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in _RESIZE_SCHEMA.fields]
        )


def _resize_thumbnail(spark, sf):
    ship_package(spark)
    pooled = (
        t(spark, sf, "documents")
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
        .mapInPandas(_fake_resize, schema=_RESIZE_SCHEMA)
    )
    # Registry contract flattens the typed array<double> to one row per
    # pooling cell: every registered output column stays a plain scalar
    # (the hash-compare format proven against the driver; pinned by
    # tests/test_plans.py::test_output_dtype_discipline).
    return pooled.select(
        "doc_id",
        "n_bytes",
        F.posexplode("thumb").alias("cell", "cell_mean"),
    ).select("doc_id", "n_bytes", F.col("cell").cast("bigint"), "cell_mean")


# Oracle-paired under two fixture facts (both verified at every SF): text is
# pure ASCII (unicode(char) == byte value) and length >= 16 (every pooling
# cell is non-empty, so numpy reduceat == plain slice sum).  np.linspace
# edges equal (c*n)//16 exactly: n/16 is an exponent shift (exact double),
# and c*(n/16) stays < 2^53, so int64 truncation == floor division — both
# engines compute identical cell boundaries, integer sums, and one IEEE
# division per cell.
REG.add(
    "mm_resize_thumbnail",
    _resize_thumbnail,
    f"""
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             [unicode(text[p]) FOR p IN range(1, length(text) + 1)] AS bs
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           c AS cell,
           CAST(list_sum(bs[((c * n) // {_THUMB_DIM} + 1)
                            :(((c + 1) * n) // {_THUMB_DIM})]) AS DOUBLE)
             / (((c + 1) * n) // {_THUMB_DIM} - (c * n) // {_THUMB_DIM})
             AS cell_mean
    FROM b, range({_THUMB_DIM}) r(c)
    """,
)
