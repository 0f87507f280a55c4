"""Dataset-assembly operators for LLM training pipelines (SURVEY.md §7 M8):
stratified sampling / domain mixing, shard-local sequence packing, and
benchmark decontamination.

Beyond-reference surface (Phoenix has nothing comparable) — these are the
steps between "curated documents" and "training batches" in a production
pipeline, and each is built scale-first:

  * sample_stratified — per-domain keep-rates as a pure deterministic filter
    (md5-bucket of the PK vs a per-source rate).  Zero shuffles: at 100 TB
    this is a predicate on the scan, and the md5 bucket makes the sample
    reproducible run-to-run and engine-to-engine (no RNG state, unlike
    rand()-based sampling which can't be oracle-paired).
  * text_seq_pack — greedy token packing into fixed-budget training
    sequences.  A GLOBAL greedy pack is a single-partition window — the
    classic scale trap — so packing is SHARD-LOCAL: documents are md5-hashed
    into shards, each shard packs independently with one window pass, and
    pack ids are (shard, seq) pairs.  One shuffle on shard; shard count
    scales with the cluster, and the only cross-shard effect is <= one
    under-filled tail pack per shard — exactly the trade distributed
    training-data builders make.
  * text_decontaminate — n-gram overlap against a held-out benchmark/eval
    set.  The benchmark's distinct shingle set is small by construction
    (eval sets are ~10^3-10^6 docs), so the plan is: broadcast the hashed
    benchmark shingles, inner-join the corpus' exploded shingles against it,
    and count distinct overlaps per doc — a broadcast join plus one
    map-side-combined groupBy; the corpus is never shuffled by shingle.
    Shingles are md5-hashed to 8-byte ints (same trick as dedup_minhash_lsh)
    so the broadcast and the join keys stay narrow.

All three are fully oracle-paired: the md5-derived buckets/hashes are
bit-identical in DuckDB, so sampling decisions, pack assignments, and
overlap counts hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t
from phoenix_spark.queries.pipeline_dedup import _docs_wide, _shingles_col

REG = Registry()

# Deterministic 0..99 bucket from the PK: top-60-bits-of-md5 mod 100.
_BUCKET = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
    " as bigint) % 100"
)
_DUCK_BUCKET = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"
)

# Per-domain keep-rates (percent).  A production run feeds this from a
# mixing-weights config; the shape — CASE over the source column — is the
# same at any number of domains.
_RATES = {"src0": 100, "src1": 80, "src2": 50, "src3": 20}
_DEFAULT_RATE = 10

_RATE_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {r}" for s, r in _RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)


# --- stratified / domain-mix sampling ----------------------------------------
def _sample_stratified(spark, sf):
    return (
        t(spark, sf, "documents")
        .withColumn("bucket", F.expr(_BUCKET).cast("int"))
        .filter(F.expr(f"{_BUCKET} < {_RATE_CASE}"))
        .select("doc_id", "source", "lang", "bucket")
    )


REG.add(
    "sample_stratified",
    _sample_stratified,
    f"""
    SELECT doc_id, source, lang,
           CAST({_DUCK_BUCKET} AS INT) AS bucket
    FROM documents
    WHERE {_DUCK_BUCKET} < {_RATE_CASE.replace("CASE source", "CASE source")}
    """,
)

# --- shard-local greedy sequence packing -------------------------------------
_N_SHARDS = 8
_PACK_BUDGET = 256  # tokens per training sequence (fixture docs are short)

_NTOK = "size(split(trim(text), '\\\\s+'))"
_DUCK_NTOK = "len(string_split_regex(trim(text), '\\s+'))"
_SHARD = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
    f" as bigint) % {_N_SHARDS}"
)
_DUCK_SHARD = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    f" % {_N_SHARDS}"
)


def _seq_pack(spark, sf):
    from pyspark.sql.window import Window

    base = t(spark, sf, "documents").select(
        "doc_id",
        F.expr(_SHARD).cast("int").alias("shard"),
        F.expr(_NTOK).cast("int").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # A doc goes into the pack where its tokens START (greedy, packs may
    # overflow by < one doc — the standard streaming-pack contract).
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / _PACK_BUDGET)
        .cast("int")
        .alias("seq_in_shard"),
    )


REG.add(
    "text_seq_pack",
    _seq_pack,
    f"""
    SELECT doc_id,
           CAST({_DUCK_SHARD} AS INT) AS shard,
           CAST({_DUCK_NTOK} AS INT)  AS n_tokens,
           CAST(floor((SUM({_DUCK_NTOK}) OVER (
                         PARTITION BY {_DUCK_SHARD} ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING)
                       - {_DUCK_NTOK}) / {_PACK_BUDGET}) AS INT) AS seq_in_shard
    FROM documents
    """,
)

# --- benchmark decontamination -----------------------------------------------
# Stand-in eval set: every 97th doc (a production run joins a real benchmark
# table; the plan shape is identical).
_BENCH_PRED = "doc_id % 97 = 0"

# 8-byte hashed shingle (same derivation as dedup_minhash_lsh's base hash).
_HASH_SH = lambda col: F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast(
    "bigint"
)


def _decontaminate(spark, sf, arrow_kernel: bool = True):
    # One cached tokenize+shingle+md5 pass (doc_id, hs-array) feeds BOTH the
    # benchmark shingle set and the corpus side (round 8: before the cache,
    # each side re-scanned documents and re-ran the map — one extra full
    # corpus pass at scale).  Round 9: the map runs in the Arrow kernel
    # (pipeline_dedup._hs_kernel, raw 60-bit hashes — no mod P): measured
    # executor CPU 7-11.6 s -> 3.3-4.2 s at 32 tasks, and wall 0.74 -> 0.42-
    # 0.61 s median with the cache.  Two no-cache designs were measured and
    # DECLINED: (a) filter-early two-scan with a JVM bench-side map — the
    # explode over an uncached JVM map gets the whole HOF tree duplicated
    # into InferFiltersFromGenerate conjuncts (~1.0-1.6 s for the 52-doc
    # side alone); (b) filter-early two-scan with kernels on both sides —
    # honest cold cost (~1.0 s) but every run pays both Python stages
    # (median 1.1 s vs 0.42-0.79 here).  The JVM expression path is kept
    # under arrow_kernel=False for A/B and the equivalence test.
    from pyspark import StorageLevel  # noqa: PLC0415

    from phoenix_spark.queries.pipeline_dedup import _hs_kernel, _HS_SCHEMA

    docs = _docs_wide(spark, sf)
    if arrow_kernel:
        from phoenix_spark.queries._util import ship_package  # noqa: PLC0415

        ship_package(spark)
        base = docs.select("doc_id", "text").mapInArrow(_hs_kernel, _HS_SCHEMA)
    else:
        base = docs.select(
            "doc_id", F.transform(_shingles_col(), _HASH_SH).alias("hs")
        )
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    hashed = base.select("doc_id", F.explode("hs").alias("h"))
    bench = hashed.filter(F.expr(_BENCH_PRED)).select("h").distinct()
    return (
        hashed.filter(~F.expr(_BENCH_PRED))
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        # COUNT, not COUNT(DISTINCT): hs is per-doc distinct by construction
        # (_shingles_col array_distincts before hashing) and bench is
        # distinct, so the joined h values are already unique per doc —
        # same value, minus the two-shuffle distinct-aggregate rewrite.
        # Caveat (ADVICE r8): "per-doc distinct" is over the 60-bit
        # md5-prefix hashes, so two distinct shingles of one doc colliding
        # in 60 bits (~k²·2⁻⁶¹ per doc — astronomically rare, oracle-gated)
        # would make this diverge from COUNT(DISTINCT) by the collision
        # count; if _HASH_SH ever narrows, restore COUNT(DISTINCT h).
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )


_DUCK_SHINGLES = """
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents) x
"""

REG.add(
    "text_decontaminate",
    _decontaminate,
    f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    hashed AS (
      SELECT doc_id,
             unnest(list_transform(sh, s ->
               ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS h
      FROM sh
    ),
    bench AS (
      SELECT DISTINCT h FROM hashed WHERE {_BENCH_PRED}
    )
    SELECT hashed.doc_id, CAST(COUNT(DISTINCT hashed.h) AS BIGINT) AS n_overlap
    FROM hashed JOIN bench ON hashed.h = bench.h
    WHERE NOT ({_BENCH_PRED.replace('doc_id', 'hashed.doc_id')})
    GROUP BY hashed.doc_id
    """,
)

# --- deterministic train/val/test split --------------------------------------
# The split every training run needs, as a pure per-row expression: the
# md5 bucket of the PK maps 90/5/5 into train/val/test.  Deterministic and
# engine-independent (same md5 both sides), so the split can be re-derived
# at any time and never leaks rows between sets across reruns — the property
# rand()-based splits cannot give.  Zero shuffles at any scale.
_SPLIT_CASE = (
    f"CASE WHEN {{b}} < 90 THEN 'train' "
    f"WHEN {{b}} < 95 THEN 'val' ELSE 'test' END"
)


def _sample_split(spark, sf):
    return t(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.expr(_SPLIT_CASE.format(b=_BUCKET)).alias("split"),
    )


REG.add(
    "sample_split",
    _sample_split,
    f"""
    SELECT doc_id, source,
           {_SPLIT_CASE.format(b=_DUCK_BUCKET)} AS split
    FROM documents
    """,
)

# --- training-mix accounting report ------------------------------------------
# The bookkeeping step every dataset-assembly run ends with: per-source doc
# and token counts plus each source's fraction of the corpus.  One map-side-
# combined groupBy over the scan; the corpus total joins back as a broadcast
# scalar (1 row) rather than an unpartitioned window, so no stage ever
# funnels the aggregated frame through a single partition.
def _mix_report(spark, sf):
    agg = (
        t(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr(_NTOK)).cast("long").alias("n_tokens"),
        )
    )
    total = agg.agg(F.sum("n_tokens").alias("_tot"))
    return agg.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("_tot")).alias("token_frac"),
    )


REG.add(
    "assembly_mix_report",
    _mix_report,
    f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM({_DUCK_NTOK}) AS BIGINT) AS n_tokens,
           SUM({_DUCK_NTOK}) / CAST(SUM(SUM({_DUCK_NTOK})) OVER () AS DOUBLE)
                                           AS token_frac
    FROM documents
    GROUP BY source
    """,
)

# --- fused end-to-end assembly: documents -> training batches -----------------
# The full "curated corpus to training sequences" chain as ONE declarative
# plan: quality gate -> stratified domain mix -> benchmark decontamination ->
# shard-local sequence packing.  Stage order is chosen for scale: the cheap
# per-row predicates (quality heuristics, md5 sample bucket, benchmark
# exclusion) run FIRST so the expensive shingle explode only touches
# surviving documents; the benchmark shingle set is built from the FULL
# corpus (a benchmark doc that fails the quality gate still contaminates).
# Shuffle inventory: broadcast-anti join on doc_id (decontamination) + one
# shard window — everything else is scan-side maps.
_QUALITY = (
    f"size({{toks}}) BETWEEN 50 AND 100000"
    " AND size(filter({toks}, x -> x IN ('the', 'a', 'of', 'and', 'to')))"
    " / size({toks}) >= 0.01"
    " AND size(array_distinct({toks})) / size({toks}) >= 0.05"
).format(toks="split(trim(text), '\\\\s+')")


_ASM_SCHEMA = (
    "doc_id bigint, source string, n_tokens int, is_bench boolean,"
    " hs array<bigint>"
)
_ASM_STOP = ("the", "a", "of", "and", "to")


def _asm_kernel(batches):
    """(doc_id, source, text) -> (doc_id, source, n_tokens, is_bench, hs)
    for the rows the assembly chain can still use: benchmark docs (their
    shingles seed the contamination set) and non-benchmark docs that pass
    the quality + stratified-mix gate.  Everything else is dropped HERE —
    no hashes computed, no bytes emitted (guide §4: ship decisions, not
    dropped payloads).

    Every predicate replicates the JVM expression exactly (same IEEE double
    divisions and comparisons; md5 bucket == _BUCKET; tokenizer ==
    split(trim(text)) per the pipeline_dedup kernel contract); rows with
    NULL text can never pass the gate and never contribute shingles on
    either path, and are dropped.  Pinned against the JVM expression path
    by tests/test_shingle_kernel.py."""
    import hashlib  # noqa: PLC0415

    import pyarrow as pa  # noqa: PLC0415

    from phoenix_spark.queries.pipeline_dedup import (  # noqa: PLC0415
        _JAVA_WS,
        _doc_hashes,
    )

    md5 = hashlib.md5
    for batch in batches:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_src, o_nt, o_bench, o_hs = [], [], [], [], []
        for did, src, txt in zip(ids, srcs, texts):
            if txt is None:
                continue
            if did % 97 == 0:
                o_id.append(did)
                o_src.append(src)
                o_nt.append(None)
                o_bench.append(True)
                o_hs.append(_doc_hashes(txt, None))
                continue
            toks = _JAVA_WS.split(txt.strip(" "))
            n = len(toks)
            if not (50 <= n <= 100000):
                continue
            stop = sum(1 for x in toks if x in _ASM_STOP)
            if stop / n < 0.01 or len(set(toks)) / n < 0.05:
                continue
            bucket = int(md5(str(did).encode()).hexdigest()[:15], 16) % 100
            if bucket >= _RATES.get(src, _DEFAULT_RATE):
                continue
            o_id.append(did)
            o_src.append(src)
            o_nt.append(n)
            o_bench.append(False)
            o_hs.append(_doc_hashes(txt, None))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(o_id, type=pa.int64()),
                pa.array(o_src, type=pa.string()),
                pa.array(o_nt, type=pa.int32()),
                pa.array(o_bench, type=pa.bool_()),
                pa.array(o_hs, type=pa.list_(pa.int64())),
            ],
            names=["doc_id", "source", "n_tokens", "is_bench", "hs"],
        )


def _assemble_e2e(spark, sf, arrow_kernel: bool = True):
    from pyspark.sql.window import Window

    # Round 9 restructure: ONE Arrow-kernel pass computes gate + mix + md5
    # shingles and emits ONLY the rows the chain can use — quality/mix
    # survivors plus the 1/97 benchmark docs, flagged is_bench — and that
    # frame is cached once for its three consumers (benchmark shingle set,
    # contamination probe, final anti-join).  Compared to the round-8
    # design this caches the survivors+bench slice instead of every doc
    # (fewer cached bytes at 100 TB) and runs the tokenize/gate/md5 work in
    # the kernel (executor CPU 6-7 s -> ~1.8-2.0 s at sf0.1).  A two-scan
    # variant (separate filtered pass for the bench side, no shared cache)
    # was measured and DECLINED: each run pays two Python stages (median
    # 0.94-1.0 s vs ~0.7 here).
    from pyspark import StorageLevel  # noqa: PLC0415

    docs = _docs_wide(spark, sf)
    if arrow_kernel:
        from phoenix_spark.queries._util import ship_package  # noqa: PLC0415

        ship_package(spark)
        base = (
            docs.select("doc_id", "source", "text")
            .mapInArrow(_asm_kernel, _ASM_SCHEMA)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        gated = base.filter(~F.col("is_bench")).select(
            "doc_id", "source", "n_tokens", "hs"
        )
        bench = (
            base.filter("is_bench")
            .select(F.explode("hs").alias("h"))
            .distinct()
        )
    else:
        base = (
            docs.select(
                "doc_id",
                "source",
                F.expr(_NTOK).cast("int").alias("n_tokens"),
                F.expr(_QUALITY).alias("_qual"),
                F.expr(f"{_BUCKET} < {_RATE_CASE}").alias("_kept"),
                F.expr(_BENCH_PRED).alias("_bench"),
                F.transform(_shingles_col(), _HASH_SH).alias("hs"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        gated = base.filter(
            F.col("_qual") & F.col("_kept") & ~F.col("_bench")
        ).select("doc_id", "source", "n_tokens", "hs")
        bench = (
            base.filter("_bench")
            .select(F.explode("hs").alias("h"))
            .distinct()
        )
    dirty = (
        gated.select("doc_id", F.explode("hs").alias("h"))
        .join(F.broadcast(bench), "h")
        .select("doc_id")
    )
    clean = gated.join(dirty, "doc_id", "left_anti")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        clean.select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(_SHARD).cast("int").alias("shard"),
        )
        .select(
            "doc_id",
            "source",
            "shard",
            "n_tokens",
            F.floor((cum - F.col("n_tokens")) / _PACK_BUDGET)
            .cast("int")
            .alias("seq_in_shard"),
        )
    )


_DUCK_QUALITY = (
    "len(toks) BETWEEN 50 AND 100000"
    " AND len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to')))"
    "   / CAST(len(toks) AS DOUBLE) >= 0.01"
    " AND len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) >= 0.05"
)

REG.add(
    "pipeline_assemble_e2e",
    _assemble_e2e,
    f"""
    WITH toked AS (
      SELECT doc_id, source, text,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    gated AS (
      SELECT doc_id, source, text, CAST(len(toks) AS INT) AS n_tokens
      FROM toked
      WHERE {_DUCK_QUALITY}
        AND {_DUCK_BUCKET} < {_RATE_CASE}
        AND NOT ({_BENCH_PRED})
    ),
    bench AS (
      SELECT DISTINCT unnest(list_transform(sh, s ->
               ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS h
      FROM ({_DUCK_SHINGLES}) bs
      WHERE {_BENCH_PRED}
    ),
    dirty AS (
      SELECT DISTINCT g.doc_id
      FROM (SELECT doc_id,
                   unnest(list_transform(sh, s ->
                     ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS h
            FROM ({_DUCK_SHINGLES}) gs
            WHERE doc_id IN (SELECT doc_id FROM gated)) g
      JOIN bench ON g.h = bench.h
    ),
    clean AS (
      SELECT g.doc_id, g.source, g.n_tokens,
             CAST({_DUCK_SHARD} AS INT) AS shard
      FROM gated g
      WHERE g.doc_id NOT IN (SELECT doc_id FROM dirty)
    )
    SELECT doc_id, source, shard, n_tokens,
           CAST(floor((SUM(n_tokens) OVER (
                         PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING)
                       - n_tokens) / {_PACK_BUDGET}) AS INT) AS seq_in_shard
    FROM clean
    """,
)

# --- temperature-flattened domain mixing (mT5/XLM-R alpha sampling) ----------
# Multilingual/multi-domain training flattens the domain distribution with a
# temperature: target share q_d ∝ n_d^α (α = 0.5 here).  Downsample-only
# normalization (no upsampling/duplication) collapses to keep-rate
# r_d = sqrt(n_min / n_d): the smallest domain keeps 100 %, larger domains
# shrink toward parity.  α = 0.5 is deliberate — sqrt and the division are
# IEEE correctly-rounded in both engines, so the thresholds (and therefore
# every sampling decision) are bit-identical and oracle-pairable; a general
# pow(x, α) is only ulp-accurate and could flip boundary buckets.
#
# Plan shape at 100 TB: one tiny per-domain count aggregate (map-side
# combined), a broadcast of the per-domain thresholds, and a deterministic
# md5-bucket filter on the scan — the corpus is never shuffled to be
# sampled.  The bucket reads md5 chars 3..17 so decisions are independent
# of sample_stratified's bucket (chars 1..15).
_TBUCKET = (
    "cast(conv(substring(md5(cast(doc_id as string)), 3, 15), 16, 10)"
    " as bigint) % 10000"
)
_DUCK_TBUCKET = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 3, 15))::BIGINT % 10000"
)


def _sample_temperature(spark, sf):
    docs = t(spark, sf, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_d"))
    nmin = counts.agg(F.min("n_d").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "source",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_d")) * 10000
        )
        .cast("long")
        .alias("thr"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(F.expr(_TBUCKET) < F.col("thr"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.min("thr").cast("long").alias("keep_thr_bp"),
        )
    )


REG.add(
    "sample_temperature",
    _sample_temperature,
    f"""
    WITH c AS (SELECT source, COUNT(*) AS n_d FROM documents GROUP BY source),
         m AS (SELECT MIN(n_d) AS n_min FROM c),
         r AS (SELECT source,
                      CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE) / n_d) * 10000)
                           AS BIGINT) AS thr
               FROM c, m)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(r.thr) AS BIGINT) AS keep_thr_bp
    FROM documents d JOIN r ON d.source = r.source
    WHERE {_DUCK_TBUCKET} < r.thr
    GROUP BY d.source
    """,
)
