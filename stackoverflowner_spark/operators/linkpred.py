"""KG link prediction: common-neighbor and Adamic-Adar scoring.

The standard KG-completion baseline (Liben-Nowell & Kleinberg 2003,
"The Link Prediction Problem for Social Networks"): for node pairs NOT
yet connected, score the likelihood of a missing edge from their shared
neighborhood — `cn` (how many common neighbors) and `aa` (Adamic-Adar:
sum of 1/ln(degree) over common neighbors, down-weighting promiscuous
hubs). Feeds KG QA (which missing alias edges should a curator look
at?) and canonicalization candidate generation. The reference has no
graph analytics — engine-beyond-reference surface alongside
pagerank/triangles (operators/graphalgo.py).

Scale shape, same discipline as triangle_count:

* the wedge join is keyed on the MIDPOINT node, so fan-out is per-node
  degree squared — `max_degree` drops hub midpoints above the cap (the
  standard guard: a node of degree 100k contributes 5e9 wedges of
  near-zero AA weight each, 1/ln(100k) ~ 0.087, while blowing up the
  shuffle; its *endpoint* role is untouched, so predictions for hub
  pairs still form through their other, informative neighbors).
* one groupBy(u, w) shuffle over surviving wedges; the existing-edge
  anti-join is broadcast-eligible whenever the edge list is dimension-
  sized, else a shuffled left-anti on the same key.
* the AA sum is an ORDERED double fold over the sorted common-neighbor
  degree list (sort asc, transform 1/ln, fold left) — order-deterministic
  across partitionings. It is NOT bitwise-portable across ENGINES:
  JVM ``Math.log`` guarantees <=1 ulp, C libm (Python/DuckDB) is
  correctly rounded, and the two disagree in the last bit on real
  inputs (measured in tests/test_linkpred.py). So the strict-oracle
  column is ``ra_fp`` — the Resource-Allocation index (sum of
  1/degree, Zhou et al. 2009) in exact 1e-12 fixed point via integer
  division, bit-identical everywhere — while ``aa`` is gated against a
  brute-force replay at 1e-13 relative tolerance.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_predict(edges: DataFrame, max_degree: Optional[int] = None,
                 min_cn: int = 1) -> DataFrame:
    """(u, w, cn, aa) for unconnected pairs with >= ``min_cn`` common
    neighbors, over canonical undirected ``edges`` (src < dst).

    A common neighbor always has degree >= 2 (it touches both endpoints),
    so ln(degree) is never zero."""
    e = edges.select("src", "dst")
    und = (e.select(F.col("src").alias("v"), F.col("dst").alias("n"))
           .unionAll(e.select(F.col("dst").alias("v"),
                              F.col("src").alias("n"))))
    deg = und.groupBy("v").agg(F.count("*").alias("d"))
    mid = und.join(deg, "v")
    if max_degree is not None:
        mid = mid.filter(F.col("d") <= max_degree)
    a = mid.select("v", F.col("n").alias("u"), "d")
    b = mid.select(F.col("v"), F.col("n").alias("w"))
    wedges = (a.join(b, "v").filter(F.col("u") < F.col("w")))
    new_pairs = wedges.join(
        e, (wedges.u == e.src) & (wedges.w == e.dst), "left_anti")
    return (new_pairs.groupBy("u", "w")
            .agg(F.count("*").cast("long").alias("cn"),
                 F.aggregate(
                     F.sort_array(F.collect_list("d")),
                     F.lit(0.0),
                     lambda acc, x: acc + F.lit(1.0) / F.log(x)).alias("aa"),
                 F.sum(F.expr("1000000000000 div d"))
                 .cast("long").alias("ra_fp"))
            .filter(F.col("cn") >= min_cn))


LINK_PREDICT_SQL_TMPL = """
    with e as ({edges_sql}),
    und as (select src as v, dst as n from e
            union all
            select dst as v, src as n from e),
    deg as (select v, count(*) as d from und group by v),
    mid as (select und.v, und.n, deg.d from und join deg using (v)
            {degree_filter}),
    wed as (select a.n as u, b.n as w, a.d
            from mid a join mid b on a.v = b.v and a.n < b.n),
    new_pairs as (select u, w, d from wed
                  where not exists (select 1 from e
                                    where e.src = wed.u and e.dst = wed.w))
    select u, w, cast(count(*) as bigint) as cn,
           list_reduce(
             list_prepend(cast(0.0 as double),
                          list_transform(list_sort(list(d)),
                                         x -> cast(1.0 as double)/ln(x))),
             (acc, x) -> acc + x) as aa,
           cast(sum(1000000000000 // d) as bigint) as ra_fp
    from new_pairs
    group by u, w
    having count(*) >= {min_cn}"""


def link_predict_sql(edges_sql: str, max_degree: Optional[int] = None,
                     min_cn: int = 1) -> str:
    """DuckDB replay of ``link_predict`` over an edge-producing SQL
    (columns src, dst, canonical src < dst) — the strict-oracle twin."""
    degree_filter = f"where deg.d <= {max_degree}" if max_degree else ""
    return LINK_PREDICT_SQL_TMPL.format(
        edges_sql=edges_sql, degree_filter=degree_filter, min_cn=min_cn)
