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
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from phoenix_spark.queries._util import Registry, t

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
REG.add(
    "mm_decode_features",
    lambda spark, sf: t(spark, sf, "documents")
    .select("doc_id", F.col("text").cast("binary").alias("payload"))
    .mapInPandas(_fake_features, schema=_FEAT_SCHEMA),
    None,
)
