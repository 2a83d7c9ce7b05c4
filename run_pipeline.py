"""spark-submit entry point for the KG-construction pipeline.

Usage (cluster):
  spark-submit --py-files linkedspending_spark.zip run_pipeline.py \
      --input /path/events_or_transcripts --output /path/triples \
      --manifests /path/manifests --buckets 4096

Usage (sandbox):
  python run_pipeline.py --sf-dir /root/testdata/sf0.01 \
      --output /tmp/triples --manifests /tmp/manifests

Resumable: re-running after a crash converts only buckets without a
completed manifest row (see linkedspending_spark/jobs.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts source (conv_id, turn_idx, ...)")
    ap.add_argument(
        "--input-format",
        choices=["parquet", "json", "csv"],
        default="parquet",
        help="format of --input (schema-enforced reader)",
    )
    ap.add_argument(
        "--import-nt",
        help="import a reference-produced N-Triples dump instead of "
        "converting transcripts (datasets recovered from subject URIs)",
    )
    ap.add_argument("--sf-dir", help="testdata dir; derives transcripts from events")
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifests", required=True)
    ap.add_argument(
        "--metrics",
        default=None,
        help="lineage metrics table path (default: <manifests>_metrics)",
    )
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--no-mentions", action="store_true")
    ap.add_argument(
        "--force",
        action="store_true",
        help="re-convert every bucket, ignoring the manifest done-set "
        "(the reference's forceConvert toggle; dynamic partition "
        "overwrite replaces each re-converted bucket)",
    )
    ap.add_argument(
        "--mention-mode",
        choices=["native", "pandas"],
        default="native",
        help="mention detection: broadcast token join (native) or the "
        "Arrow pandas-UDF fuzzy detector (pandas)",
    )
    ap.add_argument(
        "--canonicalize",
        action="store_true",
        help="run phase 2: property-URI canonicalization (broadcast dict "
        "+ connected components) into <output>_canonical",
    )
    ap.add_argument(
        "--full-dictionaries",
        action="store_true",
        help="link mentions against the packaged full ISO-4217/3166 "
        "tables instead of the compact built-ins",
    )
    ap.add_argument(
        "--currency-tsv",
        help="user currency dictionary TSV (code<TAB>uri), overrides built-ins",
    )
    ap.add_argument(
        "--country-tsv",
        help="user country dictionary TSV (code<TAB>uri), overrides built-ins",
    )
    ap.add_argument(
        "--checkpoint-dir",
        help="reliable checkpoint dir (HDFS-compatible) for the "
        "connected-components loop; executor-loss-safe on clusters",
    )
    ap.add_argument(
        "--delete-datasets",
        help="comma-separated dataset names to DELETE from the bucketed "
        "output table (copy-on-write over affected buckets only; "
        "manifest tombstones commit first), then exit",
    )
    ap.add_argument(
        "--delete-all",
        action="store_true",
        help="delete EVERY dataset partition under --output (the "
        "DeleteAllSubGraphs admin surface; requires --yes), then exit",
    )
    ap.add_argument(
        "--yes",
        action="store_true",
        help="confirm --delete-all non-interactively (the reference "
        "script's \"type 'delete'\" prompt)",
    )
    args = ap.parse_args(argv)

    if args.delete_datasets or args.delete_all:
        from linkedspending_spark.session import get_spark
        from linkedspending_spark.sources.io import (
            delete_all_datasets,
            delete_datasets_bucketed,
        )

        spark = get_spark(args.cpus, app_name="ls_delete")
        if args.delete_all:
            if not args.yes:
                print("refusing --delete-all without --yes", file=sys.stderr)
                return 2
            removed = delete_all_datasets(
                args.output, manifest_path=args.manifests, spark=spark
            )
            print(json.dumps({"deleted_partitions": removed}))
            return 0
        names = [n for n in args.delete_datasets.split(",") if n]
        report = delete_datasets_bucketed(
            spark,
            args.output,
            names,
            n_buckets=args.buckets,
            manifest_path=args.manifests,
        )
        print(json.dumps(report))
        return 0

    from linkedspending_spark.jobs import (
        run_canonicalize_job,
        run_import_nt_job,
        run_transcripts_job,
    )
    from linkedspending_spark.session import get_spark
    from linkedspending_spark.transcripts import (
        read_transcripts,
        transcripts_from_events,
    )

    spark = get_spark(args.cpus, app_name="ls_pipeline")
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)

    currencies = countries = None
    if args.full_dictionaries:
        from linkedspending_spark.sources.dictionaries import (
            full_country_df,
            full_currency_df,
        )

        currencies, countries = full_currency_df(spark), full_country_df(spark)
    if args.currency_tsv or args.country_tsv:
        from linkedspending_spark.sources.dictionaries import read_tsv_dictionary

        if args.currency_tsv:
            currencies = read_tsv_dictionary(
                spark, args.currency_tsv, "code string, uri string"
            )
        if args.country_tsv:
            countries = read_tsv_dictionary(
                spark, args.country_tsv, "code string, uri string"
            )

    if args.import_nt:
        report = run_import_nt_job(
            spark,
            args.import_nt,
            out_path=args.output,
            manifest_path=args.manifests,
            n_buckets=args.buckets,
        )
        print(
            json.dumps(
                {
                    "run_id": report.run_id,
                    "state": report.state,
                    "imported_triples": report.converted_triples,
                    "buckets": len(report.pending),
                    "seconds": round(report.seconds, 2),
                }
            )
        )
        return 0 if report.state == "FINISHED" else 1
    if args.sf_dir:
        transcripts = transcripts_from_events(spark, args.sf_dir)
    elif args.input:
        transcripts = read_transcripts(spark, args.input, fmt=args.input_format)
    else:
        ap.error("one of --input / --sf-dir / --import-nt required")

    metrics_path = args.metrics or args.manifests.rstrip("/") + "_metrics"
    report = run_transcripts_job(
        spark,
        transcripts,
        out_path=args.output,
        manifest_path=args.manifests,
        n_buckets=args.buckets,
        with_mentions=not args.no_mentions,
        mention_mode=args.mention_mode,
        metrics_path=metrics_path,
        currencies=currencies,
        countries=countries,
        force=args.force,
    )
    out = {
        "run_id": report.run_id,
        "state": report.state,
        "n_buckets": report.n_buckets,
        "pending_done": len(report.pending),
        "skipped": report.skipped,
        "converted_triples": report.converted_triples,
        "seconds": round(report.seconds, 2),
    }
    if args.canonicalize and report.state == "FINISHED":
        canon = run_canonicalize_job(
            spark,
            triples_path=args.output,
            out_path=args.output + "_canonical",
            manifest_path=args.manifests,
            metrics_path=metrics_path,
        )
        out["canonicalize"] = {
            "state": canon.state,
            "skipped": canon.skipped,
            "triples": canon.converted_triples,
            "seconds": round(canon.seconds, 2),
        }
        if canon.state != "FINISHED":
            out["state"] = canon.state
    print(json.dumps(out))
    return 0 if out["state"] == "FINISHED" else 1


if __name__ == "__main__":
    sys.exit(main())
