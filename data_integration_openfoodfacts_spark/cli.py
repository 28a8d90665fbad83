"""Command-line entry point — the engine's equivalent of running the
reference notebook top-to-bottom (pipeline_etl.ipynb) plus its SQL
layer, as one command:

    python -m data_integration_openfoodfacts_spark.cli run \
        --csv /path/to/openfoodfacts.tsv --database off \
        [--metrics-dir metrics/] [--partition-fact] [--local1]

    python -m data_integration_openfoodfacts_spark.cli analytics \
        --database off [--query top_brands_by_ab_proportion]
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args: argparse.Namespace):
    from .session import get_spark

    return get_spark(
        "data-integration-openfoodfacts-cli",
        master="local[1]" if getattr(args, "local1", False) else None,
    )


def cmd_run(args: argparse.Namespace) -> int:
    from .plans.pipeline import run_pipeline
    from .sources.csv_source import read_openfoodfacts_csv
    from .sources.sinks import write_metrics_json

    spark = _spark(args)
    bronze = read_openfoodfacts_csv(
        spark, args.csv, multi_line=not args.no_multiline
    )
    result = run_pipeline(
        spark,
        bronze,
        database=args.database,
        partition_fact_by_year=args.partition_fact,
    )
    if args.metrics_dir:
        path = write_metrics_json(result.metrics, args.metrics_dir)
        result.metrics["metrics_path"] = path
    print(json.dumps(result.metrics, default=str))
    return 0


def cmd_analytics(args: argparse.Namespace) -> int:
    from .plans.gold_analytics import GOLD_ANALYTICS

    spark = _spark(args)
    tables = {
        name: spark.table(f"{args.database}_gold.{name}")
        for name in (
            "dim_time",
            "dim_brand",
            "dim_category",
            "dim_country",
            "dim_product",
            "fact_nutrition_snapshot",
        )
    }
    names = [args.query] if args.query else sorted(GOLD_ANALYTICS)
    for name in names:
        if name not in GOLD_ANALYTICS:
            print(
                f"unknown query {name!r}; available: {sorted(GOLD_ANALYTICS)}",
                file=sys.stderr,
            )
            return 2
        print(f"== {name} ==")
        GOLD_ANALYTICS[name](tables).show(args.rows, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data-integration-openfoodfacts-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the Bronze->Silver->Gold pipeline")
    run.add_argument("--csv", required=True, help="input TSV/CSV path")
    run.add_argument("--database", default=None, help="persist tables under <db>_silver/<db>_gold")
    run.add_argument("--metrics-dir", default=None)
    run.add_argument("--partition-fact", action="store_true")
    run.add_argument("--no-multiline", action="store_true", help="splittable scan for newline-free CSVs")
    run.add_argument("--local1", action="store_true")
    run.set_defaults(fn=cmd_run)

    an = sub.add_parser("analytics", help="run the six analytics queries on a gold database")
    an.add_argument("--database", required=True)
    an.add_argument("--query", default=None)
    an.add_argument("--rows", type=int, default=20)
    an.add_argument("--local1", action="store_true")
    an.set_defaults(fn=cmd_analytics)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
