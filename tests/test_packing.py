"""Gates for context-window chunking and sequence packing, beyond the
driver-strict oracle rows (asserted here too, plus the two entries newly
rotated off the driver surface for them)."""

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.packing import (chunk_documents,
                                                      pack_greedy,
                                                      with_token_count)
from stackoverflowner_spark.session import get_spark

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-packing", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_driver_strict(spark):
    from tests.oracle_harness import run_all
    res = run_all(spark, SF, only=["doc_chunks", "pack_docs"], strict=True)
    assert all(v == [] for v in res.values()), res


def test_chunks_cover_everything_with_exact_overlap(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))),
         (2, "a b c"), (3, "solo")],
        "doc_id long, text string")
    out = chunk_documents(docs, window=40, stride=32).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_len))
    # 100 tokens, stride 32: starts 0/32/64/96 -> lens 40/40/36/4
    assert sorted(by_doc[1]) == [(0, 40), (1, 40), (2, 36), (3, 4)]
    # shorter than one window: a single full-doc chunk
    assert by_doc[2] == [(0, 3)] and by_doc[3] == [(0, 1)]
    # token coverage: sum of NON-overlapped contributions == n_tokens
    # (every chunk except the last contributes exactly stride new tokens)
    lens = [l for _, l in sorted(by_doc[1])]
    assert sum(min(l, 32) for l in lens[:-1]) + lens[-1] == 100


def test_chunk_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=4)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=0)
    with pytest.raises(ValueError):
        pack_greedy(docs, budget=0)


def test_pack_bins_are_contiguous_and_bounded(spark):
    docs = spark.read.parquet(SF + "/documents.parquet")
    budget = 1000  # sf0.01 holds ~27k tokens -> ~27 bins over 8 partitions
    out = pack_greedy(docs, budget=budget, n_parts=8).collect()
    per_bin = {}
    max_tok = 0
    for r in out:
        per_bin.setdefault((r.part, r.bin), []).append(r)
        max_tok = max(max_tok, r.n_tokens)
    assert len({r.part for r in out}) == 8
    for (part, b), rows in per_bin.items():
        tot = sum(r.n_tokens for r in rows)
        # streaming pack: a bin exceeds the budget by at most one document
        assert tot < budget + max_tok
        # and every bin except a partition's last is actually full
    # fullness: within each part, all bins but the highest carry >= budget
    by_part = {}
    for (part, b), rows in per_bin.items():
        by_part.setdefault(part, {})[b] = sum(r.n_tokens for r in rows)
    # a non-last bin spans one full budget stripe, shifted by at most the
    # previous boundary's overshoot: budget - max_tok < tot < budget + max_tok
    filled = 0
    for part, bins in by_part.items():
        last = max(bins)
        for b, tot in bins.items():
            if b != last:
                assert budget - max_tok < tot, (part, b, tot)
                filled += 1
    assert filled > 10  # non-vacuous: plenty of full bins at sf0.01
    # bins are contiguous per partition: 0..max with no gaps
    for part, bins in by_part.items():
        assert sorted(bins) == list(range(max(bins) + 1))


def test_pack_backfill_stable(spark):
    # a document's (part, bin) never changes when LATER doc_ids arrive —
    # the property that makes incremental corpus growth safe
    docs = spark.read.parquet(SF + "/documents.parquet")
    half = docs.filter(F.col("doc_id") < 250)
    full_map = {r.doc_id: (r.part, r.bin)
                for r in pack_greedy(docs, 2000, 8).collect()}
    half_map = {r.doc_id: (r.part, r.bin)
                for r in pack_greedy(half, 2000, 8).collect()}
    assert half_map and all(full_map[k] == v for k, v in half_map.items())


def test_with_token_count_matches_split(spark):
    docs = spark.createDataFrame(
        [(1, "a b  c"), (2, "")], "doc_id long, text string")
    got = {r.doc_id: r.n_tokens
           for r in with_token_count(docs).collect()}
    # split keeps empties: 'a b  c' -> [a,b,'',c]; '' -> ['']
    assert got == {1: 4, 2: 1}
