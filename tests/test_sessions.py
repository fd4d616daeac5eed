"""Sessionize + domain_cap: property gates and the skew-equality proof.

domain_cap's claim is structural — the two-stage salted rank returns
EXACTLY the rows and ranks of a plain per-domain row_number — so the gate
checks literal frame equality on a head-skewed input (one domain carrying
~90% of rows), where a salting bug would diverge. sessionize is gated on
its defining invariants: within-session consecutive gaps <= threshold,
session-opening gaps > threshold, seq contiguity from 1 per user.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.sampling import domain_cap
from stackoverflowner_spark.operators.sessions import sessionize, session_stats
from stackoverflowner_spark.session import get_spark

GAP = 1_000_000  # 1 s, in micros


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-sessions", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _events(spark, n=600, users=7):
    # deterministic pseudo-random gaps straddling the threshold
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % users).alias("user_id"),
        F.timestamp_micros(
            # same-user base gap = users*120k = 840k micros; jitter up to
            # 1.2M swings consecutive sorted gaps across the 1 s threshold
            (F.col("id") * 120_000
             + F.pmod(F.xxhash64("id"), F.lit(1_200_000)))
        ).alias("ts"))


def test_sessionize_invariants(spark):
    s = sessionize(_events(spark), gap_us=GAP).collect()
    by_user = {}
    for r in s:
        by_user.setdefault(r.user_id, []).append(r)
    n_sessions = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.us, r.event_id))
        assert rows[0].session_seq == 1
        prev = rows[0]
        seqs = {1}
        for r in rows[1:]:
            gap = r.us - prev.us
            if r.session_seq == prev.session_seq:
                assert gap <= GAP
            else:
                assert r.session_seq == prev.session_seq + 1
                assert gap > GAP
                seqs.add(r.session_seq)
            prev = r
        n_sessions += len(seqs)
    # non-degenerate: strictly more sessions than users, fewer than events
    assert len(by_user) < n_sessions < len(s)


def test_session_stats_matches_sessionize(spark):
    ev = _events(spark)
    s = sessionize(ev, gap_us=GAP).collect()
    agg = {}
    for r in s:
        k = (r.user_id, r.session_seq)
        c, lo, hi = agg.get(k, (0, None, None))
        agg[k] = (c + 1, r.us if lo is None else min(lo, r.us),
                  r.us if hi is None else max(hi, r.us))
    got = {(r.user_id, r.session_seq): (r.n_events, r.start_us, r.end_us)
           for r in session_stats(ev, gap_us=GAP).collect()}
    assert got == agg


def _skewed_docs(spark, n=4000):
    # head domain takes ~90% of rows; ties in n_chars exercise the
    # doc_id tie-break across the salt boundary
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "head")
         .otherwise(F.concat(F.lit("tail"), (F.col("id") % 7).cast("string")))
         .alias("source"),
        (F.xxhash64("id") % 50).alias("n_chars"))


@pytest.mark.parametrize("n", [1, 10, 37])
def test_domain_cap_equals_plain_rank_under_skew(spark, n):
    docs = _skewed_docs(spark)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                             F.asc("doc_id"))
    plain = (docs.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= n).select("doc_id", "source", "rk"))
    salted = domain_cap(docs, n=n, salt_buckets=8)
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b and len(a) > 0


def test_domain_cap_plan_bounded(spark):
    # exactly two hash exchanges (salted stage + final), no Python nodes
    plan = (domain_cap(_skewed_docs(spark), n=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "EvalPython" not in plan, plan
