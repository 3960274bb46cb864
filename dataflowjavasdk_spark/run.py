"""CLI runner: execute any registered query against a fixture directory.

    python -m dataflowjavasdk_spark.run q1_pricing_summary
    python -m dataflowjavasdk_spark.run tfidf --sf /root/testdata/sf0.01 -n 5
    python -m dataflowjavasdk_spark.run q3_join_agg --explain
    python -m dataflowjavasdk_spark.run --list

The batch analog of `gcloud dataflow jobs run` for the reference's example
pipelines: every operator in COVERAGE.md is reachable by name from here.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1", help="fixture dir")
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL")
    ap.add_argument("--list", action="store_true", dest="list_all", help="list queries")
    args = ap.parse_args(argv)

    from dataflowjavasdk_spark.queries.registry import all_oracles, all_queries, get

    if args.list_all or not args.query:
        oracles = all_oracles()
        for name in sorted(all_queries()):
            kind = "SQL " if name in oracles else "rows"
            print(f"  [{kind}] {name}")
        return 0

    if args.query not in all_queries():
        print(f"unknown query: {args.query} (try --list)", file=sys.stderr)
        return 2

    if args.oracle:
        sql = all_oracles().get(args.query)
        print(sql or f"-- {args.query} has no SQL oracle (rows-only check)")
        return 0

    from dataflowjavasdk_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.query}")
    df = get(args.query).fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.perf_counter()
    tbl = df.toArrow()
    elapsed = time.perf_counter() - t0
    print(tbl.slice(0, args.rows).to_pandas().to_string(index=False))
    print(f"-- {tbl.num_rows} rows in {elapsed:.3f}s ({args.query} @ {args.sf})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
