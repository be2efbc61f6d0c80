"""CLI — drop-in entry point with the reference's flag surface
(main.py:729-755 argparse contract):

    python -m library_beam_spark.main \
        --input_baseline 'baseline/*.xml.gz' \
        --input_updates  'updates/*.xml.gz' \
        --output_enriched out/enriched \
        --output_splitted out/tables \
        [--vocab_dir vocab/] [--enriched_json]

    # re-entry: split previously enriched output (main.py:789-791)
    python -m library_beam_spark.main \
        --input_enriched out/enriched --output_splitted out/tables

The conditional DAG of the reference (full | re-entry | split-optional)
maps to the same three branches.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import types as T


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="library_beam_spark",
        description="MEDLINE enrichment pipeline (PySpark engine)",
    )
    p.add_argument("--input_baseline", help="glob of baseline MEDLINE XML (.xml/.xml.gz)")
    p.add_argument("--input_updates", help="glob of update MEDLINE XML")
    p.add_argument("--input_enriched", help="re-entry: previously enriched JSON dir")
    p.add_argument("--output_enriched", help="dir for enriched output")
    p.add_argument("--output_splitted", help="base dir for the 4 split tables")
    p.add_argument("--vocab_dir", help="dir of <CATEGORY>__<DB>.json dictionaries")
    p.add_argument(
        "--enriched_json",
        action="store_true",
        help="write enriched as gzip JSON lines (reference parity) instead of parquet",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.input_baseline and not args.input_enriched:
        print("need --input_baseline (full run) or --input_enriched (re-entry)",
              file=sys.stderr)
        return 2
    if args.input_enriched and not args.output_splitted:
        print("--input_enriched requires --output_splitted", file=sys.stderr)
        return 2

    from .io import read_enriched_json, write_json_gz, write_parquet
    from .pipelines import run_enrich, run_load, run_split
    from .session import get_spark
    from .vocab import load_vocabulary_dir

    spark = get_spark("library_beam_spark.main")

    if args.input_enriched:
        # schema-supplied re-entry (S5): enriched rows written by this CLI
        from .schemas import RAW_CITATION, TEXT_MINED_ENTITIES

        schema = T.StructType(
            RAW_CITATION.fields
            + [T.StructField("text_mined_entities", TEXT_MINED_ENTITIES, True)]
        )
        enriched = read_enriched_json(spark, args.input_enriched, schema)
    else:
        vocab = load_vocabulary_dir(args.vocab_dir) if args.vocab_dir else None
        enriched = run_enrich(
            spark, args.input_baseline, args.input_updates, vocab=vocab
        )

    if args.output_enriched:
        if args.enriched_json:
            write_json_gz(enriched, args.output_enriched)
        else:
            write_parquet(enriched, args.output_enriched)

    if args.output_splitted:
        outputs = run_split(enriched, persist=True)
        paths = run_load(outputs, args.output_splitted)
        for name, path in paths.items():
            n = spark.read.parquet(path).count()
            print(f"{name}: {n} rows -> {path}")
    elif args.output_enriched:
        n = spark.read.parquet(args.output_enriched).count() if not args.enriched_json \
            else enriched.count()
        print(f"enriched: {n} rows -> {args.output_enriched}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
