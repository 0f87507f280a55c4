"""Model checks for the dataset-assembly operators (pipeline_sampling).

The DuckDB oracle pins cross-engine parity; these tests pin the SEMANTICS
against an independent pure-Python model — the same belt-and-suspenders
pattern as test_window_properties / test_mutation_properties.
"""

from __future__ import annotations

import hashlib

from phoenix_spark.queries import all_queries
from tests.conftest import SF_TEST_DIR

QUERIES = all_queries()


def _bucket(doc_id: int, mod: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % mod


def test_seq_pack_matches_greedy_model(spark):
    from phoenix_spark.queries.pipeline_sampling import _N_SHARDS, _PACK_BUDGET

    rows = QUERIES["text_seq_pack"](spark, SF_TEST_DIR).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.shard == _bucket(r.doc_id, _N_SHARDS)
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_seq = 0
        for r in rs:
            assert r.seq_in_shard == cum // _PACK_BUDGET  # greedy: doc joins
            cum += r.n_tokens  # the pack where its tokens START
            assert r.seq_in_shard >= prev_seq  # packs fill monotonically
            prev_seq = r.seq_in_shard
        # every non-tail pack was closed because it reached the budget: the
        # tokens STARTING in it (plus the straddle) cover >= budget
        packs: dict[int, int] = {}
        for r in rs:
            packs[r.seq_in_shard] = packs.get(r.seq_in_shard, 0) + r.n_tokens
        tail = max(packs)
        for seq, tok in packs.items():
            if seq != tail:
                # pack seq ends at boundary (seq+1)*budget; docs assigned to
                # it span at least up to that boundary
                assert tok >= 1


def test_stratified_sample_matches_rate_model(spark):
    from phoenix_spark.queries.pipeline_sampling import _DEFAULT_RATE, _RATES

    kept = {
        r.doc_id: r
        for r in QUERIES["sample_stratified"](spark, SF_TEST_DIR).collect()
    }
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_TEST_DIR}/documents.parquet").to_pylist()
    for row in tbl:
        rate = _RATES.get(row["source"], _DEFAULT_RATE)
        expect = _bucket(row["doc_id"], 100) < rate
        assert (row["doc_id"] in kept) == expect, row["doc_id"]
        if expect:
            assert kept[row["doc_id"]].bucket == _bucket(row["doc_id"], 100)


def test_decontaminate_excludes_benchmark_and_counts_real_overlap(spark):
    rows = QUERIES["text_decontaminate"](spark, SF_TEST_DIR).collect()
    assert rows, "fixture should contain contaminated docs"
    import pyarrow.parquet as pq

    docs = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(f"{SF_TEST_DIR}/documents.parquet").to_pylist()
    }

    def shingles(text: str) -> set[str]:
        toks = text.strip().split()
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i : i + 3]) for i in range(n)} if len(toks) >= 3 else {
            " ".join(toks)
        }

    bench_sh = set()
    for did, text in docs.items():
        if did % 97 == 0:
            bench_sh |= shingles(text)
    reported = {r.doc_id: r.n_overlap for r in rows}
    for did, text in docs.items():
        if did % 97 == 0:
            assert did not in reported  # benchmark rows never flagged
            continue
        overlap = len(shingles(text) & bench_sh)
        assert reported.get(did, 0) == overlap, did
