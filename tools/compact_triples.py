#!/usr/bin/env python3
"""Compact a partitioned triples table (operators/compact.py) from the
command line — the table-maintenance job an incremental crawl schedules
after enough appends.

    python tools/compact_triples.py SRC DST [--target-rows N]
        [--plan-only] [--master local[8]]

``--plan-only`` prints the inventory record (partitions/files/rows/
output budget) without rewriting anything.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst", nargs="?", default=None)
    ap.add_argument("--target-rows", type=int, default=4_000_000)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args(argv)
    if not args.plan_only and not args.dst:
        ap.error("DST required unless --plan-only")

    from stackoverflowner_spark.operators.compact import (compact_triples,
                                                          plan_compaction)
    from stackoverflowner_spark.session import get_spark

    spark = get_spark(app_name="compact-triples", master=args.master,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if args.plan_only:
        print(json.dumps(plan_compaction(spark, args.src,
                                         args.target_rows)))
    else:
        print(json.dumps(compact_triples(spark, args.src, args.dst,
                                         args.target_rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
