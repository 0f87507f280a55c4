"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §7 M8).

Beyond-reference surface (Phoenix has nothing comparable) required by the
project brief: token counting, quality scoring, language-ID heuristics and
document fingerprinting over the `documents` fixture.

Everything is built from JVM-side expressions (split / transform / filter /
regexp_extract_all / md5) — no Python UDFs — so the operators run inside
whole-stage codegen and scale linearly with a parquet scan: at 100 TB these
are embarrassingly parallel per-row maps with zero shuffles.

Note: the fixture's `lang` column is synthetic (all langs share one
vocabulary), so `text_langid` pins the *scoring formula* (stopword-hit
argmax with deterministic tie-break), not recovery of the label.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()

# Shared token expression: whitespace tokenization of trimmed text.
_TOKENS = "split(trim(text), '\\\\s+')"

# --- per-document statistics: lengths, token counts, ratios ------------------
REG.add(
    "text_stats",
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.length("text").cast("int").alias("n_chars_calc"),
        F.expr(f"size({_TOKENS})").cast("int").alias("n_tokens"),
        F.expr(f"size(array_distinct({_TOKENS}))").cast("int").alias("n_distinct"),
        # avg token length and type-token ratio: exact int/int IEEE division
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / F.expr(f"size({_TOKENS})")
        ).alias("avg_tok_len"),
        (
            F.expr(f"size(array_distinct({_TOKENS}))")
            / F.expr(f"size({_TOKENS})")
        ).alias("ttr"),
        F.expr(
            f"size(filter({_TOKENS}, x -> x IN ('the', 'a', 'of', 'and', 'to')))"
        ).cast("int").alias("n_stopwords"),
    ),
    """
    SELECT doc_id, lang,
           CAST(length(text) AS INT)                                AS n_chars_calc,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INT)
                                                                    AS n_distinct,
           length(replace(text, ' ', ''))
             / len(string_split_regex(trim(text), '\\s+'))          AS avg_tok_len,
           len(list_distinct(string_split_regex(trim(text), '\\s+')))
             / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS ttr,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                    x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS INT)
                                                                    AS n_stopwords
    FROM documents
    """,
)

# --- quality scoring + filter (the C4/Gopher-style heuristic gate) -----------
REG.add(
    "text_quality_filter",
    lambda spark, sf: t(spark, sf, "documents")
    .withColumn("n_tokens", F.expr(f"size({_TOKENS})"))
    .withColumn(
        "stop_ratio",
        F.expr(f"size(filter({_TOKENS}, x -> x IN ('the', 'a', 'of', 'and', 'to')))")
        / F.col("n_tokens"),
    )
    .withColumn(
        "ttr",
        F.expr(f"size(array_distinct({_TOKENS}))") / F.col("n_tokens"),
    )
    .filter(
        (F.col("n_tokens") >= 50)
        & (F.col("n_tokens") <= 100000)
        & (F.col("stop_ratio") >= 0.01)
        & (F.col("ttr") >= 0.05)
    )
    .select("doc_id", "lang", F.col("n_tokens").cast("int").alias("n_tokens")),
    """
    SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens FROM (
      SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x IN ('the', 'a', 'of', 'and', 'to')))
               / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
               AS stop_ratio,
             len(list_distinct(string_split_regex(trim(text), '\\s+')))
               / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS ttr
      FROM documents) q
    WHERE n_tokens >= 50 AND n_tokens <= 100000
      AND stop_ratio >= 0.01 AND ttr >= 0.05
    """,
)

# --- language-ID heuristic: stopword-hit argmax ------------------------------
_LANG_SETS = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "de", "los", "es"),
}


def _langid(spark, sf):
    df = t(spark, sf, "documents")
    for code, words in _LANG_SETS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        df = df.withColumn(
            f"h_{code}", F.expr(f"size(filter({_TOKENS}, x -> x IN ({lst})))")
        )
    pred = (
        F.when(
            (F.col("h_en") >= F.col("h_de"))
            & (F.col("h_en") >= F.col("h_fr"))
            & (F.col("h_en") >= F.col("h_es")),
            "en",
        )
        .when((F.col("h_de") >= F.col("h_fr")) & (F.col("h_de") >= F.col("h_es")), "de")
        .when(F.col("h_fr") >= F.col("h_es"), "fr")
        .otherwise("es")
    )
    return df.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        F.col("h_en").cast("int").alias("h_en"),
    )


def _langid_oracle() -> str:
    hits = []
    for code, words in _LANG_SETS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hits.append(
            f"len(list_filter(string_split_regex(trim(text), '\\s+'),"
            f" x -> x IN ({lst}))) AS h_{code}"
        )
    cols = ",\n             ".join(hits)
    return f"""
    SELECT doc_id, lang,
           CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                WHEN h_fr >= h_es THEN 'fr'
                ELSE 'es' END AS lang_pred,
           CAST(h_en AS INT) AS h_en
    FROM (
      SELECT doc_id, lang,
             {cols}
      FROM documents) x
    """


REG.add("text_langid", _langid, _langid_oracle())

# --- document fingerprinting (rolling-hash analogue: stable content hash of
# the normalized text + shingle count) ----------------------------------------
REG.add(
    "text_fingerprint",
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp"),
        F.substring(
            F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))), 1, 8
        ).alias("fp8"),
        F.expr(f"size(array_distinct({_TOKENS}))").cast("int").alias("n_shingle1"),
    ),
    """
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))            AS fp,
           substr(md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 8) AS fp8,
           CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INT)
             AS n_shingle1
    FROM documents
    """,
)

# --- BPE-ish regex token counting (words / numbers / other symbols) ----------
REG.add(
    "text_tokenize_bpe",
    lambda spark, sf: t(spark, sf, "documents").select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '[a-z]+', 0))").cast("int").alias(
            "n_words"
        ),
        F.expr("size(regexp_extract_all(text, '[0-9]+', 0))").cast("int").alias(
            "n_nums"
        ),
        F.expr("size(regexp_extract_all(text, '[^a-z0-9 ]', 0))").cast("int").alias(
            "n_other"
        ),
    ),
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT)    AS n_words,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)    AS n_nums,
           CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS INT) AS n_other
    FROM documents
    """,
)
