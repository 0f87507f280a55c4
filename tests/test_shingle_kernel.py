"""Equivalence pin for the round-9 Arrow shingle-hash kernels.

The dedup/decontaminate/assemble family computes its tokenize + 3-gram +
md5-prefix hashes (and, for MinHash, the 32 affine-permutation signature
minima) in Arrow-batched Python kernels (pipeline_dedup._hs_kernel /
_hs_sig_kernel, pipeline_sampling._asm_kernel) instead of the JVM
higher-order-function expressions used through round 8 (kept under
``arrow_kernel=False``).  These tests pin the risks of that swap:

  * tokenizer drift from `split(trim(text), '\\s+')` (Java \\s class,
    space-only trim, kept leading/trailing empties),
  * the arrays_zip n<3 edge shapes (NULL-padded zip + concat_ws skip),
  * first-occurrence dedup (array_distinct == dict.fromkeys),
  * md5-prefix arithmetic (conv(substring(md5,1,15),16,10) == int(hex,16)),
  * the mod-P signature arithmetic in numpy int64,
  * the quality/mix-gate predicate replication in _asm_kernel,
  * NULL-text rows (dropped by the kernels; unable to join/gate on the JVM
    path) — identical final frames.

Both paths run over an adversarial synthetic table and the sf0.001
fixture, and must return byte-identical rows for every consuming query.
"""

from __future__ import annotations

from pyspark.sql import Row

EDGE_TEXTS = [
    (1, "src0", "plain three token document body"),
    (2, "src1", "a a a a a a"),  # maximal repetition, tiny distinct set
    (3, "src2", "x y x y x y x y"),
    (4, "src0", "  leading and trailing spaces  "),
    (5, "src1", "\ttab\tseparated\ttokens\t"),  # tabs survive trim -> empties
    (6, "src9", "mixed \t whitespace\n runs \x0b here \f and \r back"),
    (7, "src0", "two tokens"),  # n=2: single "t0 t1" gram
    (8, "src1", "one"),  # n=1: the token itself is the gram
    (9, "src2", ""),  # split('') = [''] -> gram ""
    (10, "src3", "   "),  # trim -> '' -> gram ""
    (11, "src0", "\t\t"),  # tabs only -> ['', ''] -> gram " "
    (12, None, None),  # NULL text: dropped / never joins
    (13, "src1", "a b a b c a b"),  # duplicate shingles -> distinct dedup
    (14, "src2", "\tlead tab first"),  # leading empty token in grams
    (15, "src3", "trail tab last\t"),
    (16, "src0", "a\xa0b c d e"),  # NBSP is NOT Java \s: stays one token
    (17, "src1", "unicode tökens déjà vu encoded as utf8 bytes"),
]


def _edge_df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, s, t in EDGE_TEXTS],
        "doc_id bigint, source string, text string",
    )


def _rows(df):
    cols = df.columns
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _ab(spark, builder, df=None, **kw):
    """Collect builder with arrow_kernel True/False; route t() to df."""
    import phoenix_spark.queries.pipeline_dedup as PD
    import phoenix_spark.queries.pipeline_sampling as PS

    mods = [PD, PS]
    origs = [m.t for m in mods]
    # _docs_wide lives in pipeline_dedup; pipeline_sampling imports it
    try:
        if df is not None:
            for m in mods:
                m.t = lambda _spark, _sf, _name: df
        spark.catalog.clearCache()
        fast = _rows(builder(spark, "/root/testdata/sf0.001", arrow_kernel=True, **kw))
        spark.catalog.clearCache()
        slow = _rows(builder(spark, "/root/testdata/sf0.001", arrow_kernel=False, **kw))
    finally:
        for m, o in zip(mods, origs):
            m.t = o
        spark.catalog.clearCache()
    return fast, slow


def test_hash_kernel_exact_on_edge_cases(spark):
    """The raw 60-bit hash kernel: per-row hashes identical to the JVM
    transform(_shingles_col(), conv∘substring∘md5) expression."""
    import pyspark.sql.functions as F

    from phoenix_spark.queries.pipeline_dedup import _hs_kernel, _HS_SCHEMA, _shingles_col
    from phoenix_spark.queries.pipeline_sampling import _HASH_SH

    df = _edge_df(spark)
    fast = {
        r["doc_id"]: r["hs"]
        for r in df.select("doc_id", "text")
        .mapInArrow(_hs_kernel, _HS_SCHEMA)
        .collect()
    }
    slow = {
        r["doc_id"]: r["hs"]
        for r in df.select(
            "doc_id", F.transform(_shingles_col(), _HASH_SH).alias("hs")
        ).collect()
        if r["hs"] is not None  # NULL text: kernel drops, JVM yields NULL
    }
    assert set(fast) == set(slow) == {i for i, _s, t in EDGE_TEXTS if t is not None}
    assert fast == slow
    # the NBSP row proves Java-\s fidelity: "a\xa0b" stays ONE token, so the
    # doc has 4 tokens -> 2 distinct trigrams (5 tokens -> 3 would mean the
    # Python \s split broke it apart)
    assert len(fast[16]) == 2


def test_minhash_and_incremental_kernel_paths_equal(spark):
    from phoenix_spark.queries.pipeline_dedup import _dedup_incremental, _minhash_lsh

    for builder in (_minhash_lsh, _dedup_incremental):
        fast, slow = _ab(spark, builder, df=None)
        assert len(fast) > 0
        assert fast == slow


def test_minhash_signatures_equal_on_edge_cases(spark):
    """The in-kernel numpy signature minima == the JVM's 32 interpreted
    array_min(transform(...)) permutations, on the adversarial rows."""
    import pyspark.sql.functions as F

    from phoenix_spark.queries.pipeline_dedup import (
        _A,
        _B,
        _HS_SIG_SCHEMA,
        _K,
        _P,
        _hs_sig_kernel,
        _shingles_col,
    )

    df = _edge_df(spark)
    fast = {
        r["doc_id"]: tuple(r[f"s{i}"] for i in range(_K))
        for r in df.select("doc_id", "text")
        .mapInArrow(_hs_sig_kernel, _HS_SIG_SCHEMA)
        .collect()
    }
    hashed = df.select(
        "doc_id",
        F.transform(
            _shingles_col(),
            lambda s: F.pmod(
                F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
                F.lit(_P),
            ),
        ).alias("hs"),
    )

    def perm(i):
        return lambda h: F.pmod(h * F.lit(_A[i]) + F.lit(_B[i]), F.lit(_P))

    slow = {
        r["doc_id"]: tuple(r[f"s{i}"] for i in range(_K))
        for r in hashed.select(
            "doc_id",
            *[F.array_min(F.transform("hs", perm(i))).alias(f"s{i}") for i in range(_K)],
        ).collect()
        if r["s0"] is not None
    }
    assert set(fast) == set(slow)
    assert fast == slow


def test_simhash_kernel_paths_equal_on_fixture(spark):
    """The Arrow SimHash fingerprint (zero-shuffle per-row map) == the
    explode+64-SUM JVM formulation, for both registered configs, through
    the full candidate+verify query."""
    from phoenix_spark.queries.pipeline_dedup import _simhash

    for n_bits, n_chunks in ((64, 4), (128, 8)):
        spark.catalog.clearCache()
        fast = _rows(
            _simhash(spark, "/root/testdata/sf0.001", n_bits, n_chunks, arrow_kernel=True)
        )
        spark.catalog.clearCache()
        slow = _rows(
            _simhash(spark, "/root/testdata/sf0.001", n_bits, n_chunks, arrow_kernel=False)
        )
        spark.catalog.clearCache()
        assert len(fast) > 0
        assert fast == slow


def test_simhash_kernel_fingerprints_on_edge_cases(spark):
    """Fingerprint chunks identical on adversarial whitespace/empty rows
    (the lower(trim()) normalization stays on the JVM in BOTH paths, so
    only tokenization/md5/bit arithmetic is exercised here)."""
    from phoenix_spark.queries.pipeline_dedup import _simhash_fp
    import phoenix_spark.queries.pipeline_dedup as PD

    df = _edge_df(spark)
    orig = PD.t
    try:
        PD.t = lambda _spark, _sf, _name: df
        fast = _rows(_simhash_fp(spark, "unused", arrow_kernel=True))
        slow = _rows(_simhash_fp(spark, "unused", arrow_kernel=False))
    finally:
        PD.t = orig
    assert fast == slow
    assert len(fast) == len([1 for _i, _s, t in EDGE_TEXTS if t is not None])


def test_decontaminate_and_assemble_kernel_paths_equal(spark):
    from phoenix_spark.queries.pipeline_sampling import _assemble_e2e, _decontaminate

    for builder in (_decontaminate, _assemble_e2e):
        fast, slow = _ab(spark, builder, df=None)
        assert len(fast) > 0
        assert fast == slow


def test_assemble_gate_kernel_on_edge_cases(spark):
    """_asm_kernel's in-Python quality/mix gate == the JVM predicate chain,
    on rows engineered around the gate boundaries."""
    import pyspark.sql.functions as F

    from phoenix_spark.queries.pipeline_sampling import (
        _ASM_SCHEMA,
        _BUCKET,
        _HASH_SH,
        _NTOK,
        _QUALITY,
        _RATE_CASE,
        _asm_kernel,
    )
    from phoenix_spark.queries.pipeline_dedup import _shingles_col

    rows = [
        # (doc_id, source, text): around n_tokens/stop_ratio/ttr boundaries
        (100, "src0", " ".join(["the"] * 25 + ["tok%d" % i for i in range(25)])),
        (101, "src0", " ".join(["tok%d" % i for i in range(49)])),  # n=49 < 50
        (102, "src1", " ".join(["the"] + ["word"] * 99)),  # ttr = 2/100 < 0.05
        (103, "src2", " ".join(["the"] + ["w%d" % i for i in range(99)])),
        (104, "srcX", " ".join(["of"] * 5 + ["u%d" % i for i in range(95)])),
        (105, None, " ".join(["and"] * 2 + ["v%d" % i for i in range(98)])),
        (106, "src3", None),  # NULL text
        (194, "src1", "short benchmark doc"),  # 194 % 97 = 0: bench row
        (291, "src2", None),  # bench row with NULL text: contributes nothing
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, text=t) for i, s, t in rows],
        "doc_id bigint, source string, text string",
    )
    kout = df.select("doc_id", "source", "text").mapInArrow(_asm_kernel, _ASM_SCHEMA)
    fast_gated = _rows(
        kout.filter(~F.col("is_bench")).select("doc_id", "source", "n_tokens", "hs")
    )
    slow_gated = _rows(
        df.select(
            "doc_id",
            "source",
            F.expr(_NTOK).cast("int").alias("n_tokens"),
            F.expr(_QUALITY).alias("_qual"),
            F.expr(f"{_BUCKET} < {_RATE_CASE}").alias("_kept"),
            F.transform(_shingles_col(), _HASH_SH).alias("hs"),
        )
        .filter(F.col("_qual") & F.col("_kept") & ~F.expr("doc_id % 97 = 0"))
        .select("doc_id", "source", "n_tokens", "hs")
    )
    assert fast_gated == slow_gated
    assert len(fast_gated) > 0
    # benchmark rows: shingle hashes equal the JVM map's, NULL text absent
    fast_bench = _rows(kout.filter("is_bench").select("doc_id", "hs"))
    slow_bench = _rows(
        df.filter("doc_id % 97 = 0 AND text IS NOT NULL").select(
            "doc_id", F.transform(_shingles_col(), _HASH_SH).alias("hs")
        )
    )
    assert fast_bench == slow_bench
    assert len(fast_bench) == 1
