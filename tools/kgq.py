#!/usr/bin/env python3
"""Command-line BGP queries over a materialized triples parquet.

The query surface of operators/kgquery.py without writing Python: a
SPARQL-ish WHERE string — patterns separated by ``.``, terms separated
by whitespace, ``?name`` terms are variables — compiled straight to
``bgp_match`` and printed as JSON lines.

    python tools/kgq.py /path/to/triples \\
        "?x instance_of Library . ?x mentioned_in ?d" [--select x,d]
        [--optional "?a alias_of ?x"] [--not-exists "?x flagged_as spam"]
        [--limit 100] [--master local[8]]

Literals containing spaces are not expressible in this mini-syntax (the
Python API takes arbitrary strings); it covers the dominant
entity/predicate/IRI case.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_patterns(s: str):
    pats = []
    for part in s.split("."):
        part = part.strip()
        if not part:
            continue
        terms = part.split()
        if len(terms) != 3:
            raise SystemExit(f"pattern needs 3 terms: {part!r}")
        pats.append(tuple(terms))
    if not pats:
        raise SystemExit("empty pattern string")
    return pats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("triples", help="triples parquet path (subj, pred, obj)")
    ap.add_argument("where", help="BGP: '?s pred ?o . ?s pred2 lit'")
    ap.add_argument("--select", help="comma-separated output variables")
    ap.add_argument("--optional", default=None,
                    help="OPTIONAL block, same mini-syntax")
    ap.add_argument("--not-exists", dest="not_exists", default=None,
                    help="FILTER NOT EXISTS block, same mini-syntax")
    ap.add_argument("--limit", type=int, default=1000)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args(argv)

    from stackoverflowner_spark.operators.kgquery import bgp_match
    from stackoverflowner_spark.session import get_spark

    spark = get_spark(app_name="kgq", master=args.master,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    tri = spark.read.parquet(args.triples)
    out = bgp_match(
        tri, parse_patterns(args.where),
        select=args.select.split(",") if args.select else None,
        optional=parse_patterns(args.optional) if args.optional else None,
        not_exists=(parse_patterns(args.not_exists)
                    if args.not_exists else None))
    rows = out.limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(), sort_keys=True))
    print(json.dumps({"rows": len(rows), "limit": args.limit}),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
