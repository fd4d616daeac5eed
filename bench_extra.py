#!/usr/bin/env python3
"""Per-query isolation bench (guide §1.4): times each named query with the
noop sink in a fresh-ish session, min of N runs after a warm run, and
optionally dumps .explain("formatted") to plans/r06/<q>_<tag>.txt.

NOT part of the driver contract — bench.py stays the frozen measurement
surface. This harness exists so optimization work can isolate one query
without paying the whole bench.

Usage:
  python bench_extra.py q1 q2 ...            # time queries
  python bench_extra.py --explain-tag before q1 q2  # also dump plans
  python bench_extra.py --runs 3 merge_candidates
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain-tag", default=None,
                    help="dump explain('formatted') to plans/r06/<q>_<tag>.txt")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(repo, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from bench import _fresh_spark

    spark = _fresh_spark(CPUS)
    for tname in ("lineitem", "orders", "customer", "supplier", "part",
                  "nation", "region", "events", "documents", "embeddings"):
        entry._t(spark, SF_DIR, tname)
    # JIT/codegen warm with a non-headline query, mirroring bench.py
    entry.q_tpch_q18ish(spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()

    out: dict[str, float] = {}
    for name in args.queries:
        fn = getattr(entry, f"q_{name}")
        if args.explain_tag:
            os.makedirs(os.path.join(repo, "plans", "r06"), exist_ok=True)
            plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(repo, "plans", "r06",
                                   f"{name}_{args.explain_tag}.txt"),
                      "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        n = args.runs if args.no_warm else args.runs + 1
        for i in range(n):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        best = min(times if args.no_warm else times[1:])
        out[name] = best
        print(json.dumps({"query": name, "min": best, "runs": times}),
              flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
