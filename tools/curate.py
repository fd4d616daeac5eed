#!/usr/bin/env python3
"""CLI for the document-curation pipeline (operators/curation.py).

    spark-submit --py-files stackoverflowner_spark.zip tools/curate.py \
        --docs /path/to/documents_parquet --out /path/to/curated \
        [--lang en] [--min-quality 0.3] [--jaccard 0.7]

Writes the curated corpus partitioned by split (train/val/test) plus a
stage-by-stage drop report, and prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--jaccard", type=float, default=0.7)
    ap.add_argument("--near-dup", default="fast",
                    choices=["fast", "md5", "simhash"],
                    help="near-dup stage: xxhash64 MinHash (scale default), "
                         "md5 MinHash (engine-portable twin), or "
                         "banded-Hamming simhash")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from stackoverflowner_spark.operators.curation import curate_with_report
    from stackoverflowner_spark.session import get_spark

    spark = get_spark(app_name="sokg-curate", master=args.master)
    # input repair for single-row-group fixture files: the MinHash/simhash
    # stages fan out ~50x per row, so the scan must arrive splittable
    # (no-op for properly-written multi-row-group tables)
    from stackoverflowner_spark.sources.fixtures import splittable_path
    docs = spark.read.parquet(splittable_path(spark, args.docs))
    t0 = time.time()

    def write_curated(curated):
        curated.write.mode("overwrite").partitionBy("split") \
            .parquet(os.path.join(args.out, "curated"))

    # one shared pipeline pass: the write and the stage counts both read the
    # persisted frontiers (the near-dup stage executes once, not twice)
    report = curate_with_report(docs, lang=args.lang,
                                min_quality=args.min_quality,
                                jaccard_threshold=args.jaccard,
                                minhash_impl=args.near_dup,
                                materialize=write_curated)
    report.write.mode("overwrite").parquet(os.path.join(args.out, "report"))
    n = spark.read.parquet(os.path.join(args.out, "curated")).count()
    rep = {r["stage"]: (r["rows_in"], r["rows_out"])
           for r in report.collect()}
    print(json.dumps({"curated": n, "sec": round(time.time() - t0, 2),
                      "stages": rep, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
