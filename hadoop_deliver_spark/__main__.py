"""CLI — the delivery workflow of the reference genre, Spark-first.

The reference's user ran jobs that scan/filter/extract over archive
data and *deliver* merged result sets off-cluster. The equivalent
here:

    python -m hadoop_deliver_spark list
    python -m hadoop_deliver_spark run agg_groupby_basic --sf-dir /root/testdata/sf0.01
    python -m hadoop_deliver_spark deliver filter_like_regex --out /tmp/promo \\
        --format csv --single-file
    python -m hadoop_deliver_spark bench

`deliver` writes any registered query's result as parquet (default),
CSV, or JSON — optionally partitioned by a column (the date-layout
delivery pattern) or merged to a single file (the `getmerge`
pattern; only sensible for small final results).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hadoop_deliver_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list all registered queries")

    rp = sub.add_parser("run", help="run a query and print its result")
    rp.add_argument("name")
    rp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rp.add_argument("--limit", type=int, default=20)

    dp = sub.add_parser("deliver", help="run a query and write the result set")
    dp.add_argument("name")
    dp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    dp.add_argument("--out", required=True)
    dp.add_argument("--format", choices=["parquet", "csv", "json"],
                    default="parquet")
    dp.add_argument("--partition-by", default=None)
    dp.add_argument("--single-file", action="store_true",
                    help="coalesce to one output file (getmerge-style)")

    sub.add_parser("bench", help="run the headline benchmark")

    args = p.parse_args(argv)

    if args.cmd == "bench":
        from bench import main as bench_main

        bench_main()
        return 0

    from hadoop_deliver_spark.registry import load_all

    registry = load_all()

    if args.cmd == "list":
        for name, q in sorted(registry.items()):
            doc = q.doc.split("\n")[0] if q.doc else ""
            mark = " " if q.oracle else "*"
            print(f"{mark} {name:28s} {doc}")
        print(f"\n{len(registry)} queries (* = rows-only, no SQL oracle)")
        return 0

    if args.name not in registry:
        print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
        return 2

    from hadoop_deliver_spark.session import get_spark

    spark = get_spark(f"hds-{args.cmd}-{args.name}")
    df = registry[args.name].fn(spark, args.sf_dir)

    if args.cmd == "run":
        df.show(args.limit, truncate=False)
        return 0

    # deliver
    if args.single_file:
        df = df.coalesce(1)
    writer = df.write.mode("overwrite")
    if args.partition_by:
        writer = writer.partitionBy(args.partition_by)
    if args.format == "csv":
        writer = writer.option("header", True)
    writer.format(args.format).save(args.out)
    print(f"delivered {args.name} -> {args.out} ({args.format})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
