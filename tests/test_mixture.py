"""Mixture/temperature resampling gates: driver-strict oracle row, rate
math against closed-form expectations, alpha endpoints, frozen-rate
stability, and the no-corpus-shuffle plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.mixture import (mixture_rates,
                                                      sample_with_rates,
                                                      temperature_sample)
from stackoverflowner_spark.session import get_spark

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-mixture", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(SF + "/documents.parquet")


def test_driver_strict(spark):
    from tests.oracle_harness import run_all
    res = run_all(spark, SF, only=["temperature_sample"], strict=True)
    assert res == {"temperature_sample": []}


def test_rates_match_closed_form(spark, docs):
    got = {r.lang: (r.n, r.rate) for r in
           mixture_rates(docs, 400, alpha=0.5, source_col="lang").collect()}
    ns = {k: v[0] for k, v in got.items()}
    tw = sum(math.sqrt(n) for n in ns.values())
    for lang, (n, rate) in got.items():
        expect = min(1.0, 400.0 * math.sqrt(n) / (n * tw))
        assert abs(rate - expect) < 1e-12, (lang, rate, expect)
    # the skew is real: en proportional (<1), smallest lang capped at 1
    assert got["en"][1] < 0.7
    assert got[min(ns, key=ns.get)][1] == 1.0


def test_alpha_endpoints(spark, docs):
    # alpha=1: natural proportions — every source gets the SAME rate
    r1 = {r.lang: r.rate for r in
          mixture_rates(docs, 300, alpha=1.0, source_col="lang").collect()}
    assert max(r1.values()) - min(r1.values()) < 1e-12
    # alpha=0: equal weight per source — rate inversely proportional to n
    r0 = {r.lang: (r.n, r.rate) for r in
          mixture_rates(docs, 200, alpha=0.0, source_col="lang").collect()}
    for lang, (n, rate) in r0.items():
        assert abs(rate - min(1.0, 200.0 / (n * 5))) < 1e-12


def test_frozen_rates_are_backfill_stable(spark, docs):
    # with FROZEN rates, membership is a pure function of the doc key:
    # dropping half the corpus never flips a surviving doc's membership
    rates = mixture_rates(docs, 400, source_col="lang").localCheckpoint()
    full = {r.doc_id for r in
            sample_with_rates(docs, rates, source_col="lang")
            .select("doc_id").collect()}
    half = {r.doc_id for r in
            sample_with_rates(docs.filter(F.col("doc_id") < 250), rates,
                              source_col="lang").select("doc_id").collect()}
    assert half == {d for d in full if d < 250}
    # ...while the COMPOSED operator recomputes rates and may not be —
    # that trade is the documented reason the two halves are separate.


def _find(node, name):
    out, stack = [], [node]
    while stack:
        x = stack.pop()
        if name in x.nodeName():
            out.append(x)
        ch = x.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def test_corpus_never_shuffles(spark, docs):
    # the filter path (scan -> broadcast join -> hash filter) must carry
    # the corpus with ZERO Exchange; the rates subtree may shuffle freely
    # (per-source partial-agg counts + the SinglePartition ordered fold —
    # both dimension-sized)
    out = temperature_sample(docs, 400, source_col="lang")
    ep = out._jdf.queryExecution().executedPlan()
    if ep.nodeName() == "AdaptiveSparkPlan":
        ep = ep.initialPlan()
    bhj = _find(ep, "BroadcastHashJoin")
    assert len(bhj) == 1
    kids = bhj[0].children()
    sides = [kids.apply(i) for i in range(kids.size())]
    builds = [s for s in sides if _find(s, "BroadcastExchange")]
    streams = [s for s in sides if not _find(s, "BroadcastExchange")]
    assert len(builds) == 1 and len(streams) == 1
    assert not _find(streams[0], "Exchange"), streams[0].toString()
