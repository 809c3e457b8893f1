"""Command-line interface.

Reference parity (mini_etl/cli.py:27-252): ``run`` (with ``--dry-run``),
``validate``, ``init`` (sample config generation, config.py:381-416),
``info``, and ``ui`` — the reference's Streamlit dashboard re-expressed as
a dependency-free stdlib HTTP server (mini_etl_spark/ui.py; SURVEY §2.6
scoped the Streamlit dependency out, not the surface). ``run`` boots a
SparkSession and executes the compiled DataFrame pipeline.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import click

from mini_etl_spark import __version__
from mini_etl_spark.config import (
    SAMPLE_CONFIG,
    SINK_TYPES,
    SOURCE_TYPES,
    TRANSFORMER_TYPES,
    ConfigLoader,
)


@click.group()
@click.version_option(version=__version__, prog_name="mini-etl-spark")
def main() -> None:
    """mini-etl-spark: a PySpark-native data pipeline engine."""


@main.command()
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--dry-run", is_flag=True, help="Validate and build, but do not execute.")
@click.option("--explain", is_flag=True, help="Print the optimized physical plan.")
@click.option(
    "--audit",
    is_flag=True,
    help="Print the plan audit (pushed filters, read schemas, join "
    "strategies, exchange/codegen counts) before executing.",
)
@click.option(
    "--stats-json", default=None, help="Write run stats/history to this JSON file."
)
@click.option(
    "--stats-html", default=None, help="Write run stats/history to this HTML file."
)
def run(
    config_path: str,
    dry_run: bool,
    explain: bool,
    audit: bool,
    stats_json: str | None,
    stats_html: str | None,
) -> None:
    """Run a pipeline from a YAML/JSON config file."""
    loader = ConfigLoader()
    config = loader.load(config_path)
    errors = config.validate()
    if errors:
        for e in errors:
            click.echo(f"error: {e}", err=True)
        sys.exit(1)
    click.echo(f"config ok: {config.name}")
    pipeline = loader.build_pipeline(config) if not dry_run or audit else None
    if audit and pipeline is not None:
        from mini_etl_spark import plans

        click.echo(f"audit: {plans.explain_summary(pipeline.dataframe())}")
    if dry_run:
        click.echo("dry run — not executing")
        return
    if explain:
        pipeline.explain("formatted")
    stats = pipeline.run()
    click.echo(
        f"done: {stats['rows']} rows in {stats['duration']:.2f}s "
        f"({stats['rows_per_second']:.0f} rows/s)"
    )
    if stats_json:
        from mini_etl_spark.monitor import history_to_json

        history_to_json(pipeline.history, stats_json)
        click.echo(f"stats json: {stats_json}")
    if stats_html:
        from mini_etl_spark.monitor import history_to_html

        history_to_html(pipeline.history, stats_html, title=config.name)
        click.echo(f"stats html: {stats_html}")


@main.command()
@click.argument("config_path", type=click.Path(exists=True))
def validate(config_path: str) -> None:
    """Validate a pipeline config without running it."""
    config = ConfigLoader().load(config_path)
    errors = config.validate()
    if errors:
        for e in errors:
            click.echo(f"error: {e}", err=True)
        sys.exit(1)
    click.echo(f"valid: {config.name}")


@main.command()
@click.option("--output", "-o", default="pipeline.yaml", help="Output path.")
def init(output: str) -> None:
    """Write a sample pipeline config."""
    path = Path(output)
    if path.exists():
        click.echo(f"error: {path} already exists", err=True)
        sys.exit(1)
    path.write_text(SAMPLE_CONFIG)
    click.echo(f"wrote {path}")


@main.command()
@click.argument("path", type=click.Path(exists=True))
@click.option("--columns", default=None, help="Comma-separated column subset.")
@click.option(
    "--format",
    "fmt",
    default="parquet",
    type=click.Choice(["parquet", "csv", "json", "orc"]),
    help="Input format (csv assumes a header).",
)
def profile(path: str, columns: str | None, fmt: str) -> None:
    """One-pass column profile of a dataset (count/nulls/distincts/min/max
    per column, plus file-layout stats) printed as JSON lines."""
    from mini_etl_spark.maintenance import dataset_stats
    from mini_etl_spark.maintenance import profile as _profile
    from mini_etl_spark.session import get_spark

    spark = get_spark("mini-etl-profile")
    readers = {
        "parquet": spark.read.parquet,
        "orc": spark.read.orc,
        "json": spark.read.json,
        "csv": lambda p: spark.read.option("header", True).csv(p),
    }
    df = readers[fmt](path)
    cols = [c.strip() for c in columns.split(",")] if columns else None
    click.echo(json.dumps({"layout": dataset_stats(spark, path)}))
    for row in _profile(df, cols).collect():
        click.echo(json.dumps(row.asDict()))


@main.command()
@click.argument("path", type=click.Path(exists=True))
@click.option("--name", default=None, help="Dataset name for the card title.")
@click.option("--top-k", default=5, type=int, help="Top values per column.")
@click.option(
    "--out", default=None,
    help="Write the markdown here instead of stdout (e.g. next to the shards).",
)
@click.option(
    "--format", "fmt",
    default="parquet",
    type=click.Choice(["parquet", "csv", "json", "orc"]),
    help="Input format (csv assumes a header).",
)
def card(path: str, name: str | None, top_k: int, out: str | None, fmt: str) -> None:
    """Markdown data card for a dataset (row count, per-column profile,
    top values) — the release-notes artifact to ship with a published
    training set."""
    from mini_etl_spark.maintenance import dataset_card
    from mini_etl_spark.session import get_spark

    spark = get_spark("mini-etl-card")
    readers = {
        "parquet": spark.read.parquet,
        "orc": spark.read.orc,
        "json": spark.read.json,
        "csv": lambda p: spark.read.option("header", True).csv(p),
    }
    df = readers[fmt](path)
    md = dataset_card(df, name=name or path.rstrip("/").rsplit("/", 1)[-1],
                      top_k=top_k)
    if out:
        with open(out, "w", encoding="utf-8") as fh:
            fh.write(md)
        click.echo(f"card written to {out}")
    else:
        click.echo(md)


@main.command()
@click.option(
    "--history",
    default="mini_etl_runs.json",
    help="Run-history JSON file to serve (the --stats-json format); "
    "re-read per request, so concurrent pipeline runs show up live.",
)
@click.option("--host", default="127.0.0.1", help="Bind address.")
@click.option("--port", default=8765, type=int, help="Bind port (0 = ephemeral).")
@click.option(
    "--allow-run",
    is_flag=True,
    help="Enable POST /api/run (executes a submitted pipeline config on "
    "a local SparkSession — opt-in, same trust model as the reference's "
    "run page).",
)
def ui(history: str, host: str, port: int, allow_run: bool) -> None:
    """Serve the live run dashboard (reference parity: mini_etl ui)."""
    from mini_etl_spark.ui import DashboardServer

    server = DashboardServer(
        history, host=host, port=port, allow_run=allow_run
    )
    click.echo(
        json.dumps(
            {
                "url": f"http://{server.host}:{server.port}/",
                "history": history,
                "allow_run": allow_run,
            }
        )
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


@main.command()
@click.argument("path", type=click.Path(exists=True))
@click.option(
    "--target-file-mb", default=128, type=int,
    help="Target output file size for the rewrite.",
)
@click.option(
    "--kind",
    default="dataset",
    type=click.Choice(["dataset", "index"]),
    help="'dataset' = one parquet directory in place; 'index' = an "
    "incremental dedup index root (signatures + band postings + "
    "fingerprints, band partitioning preserved).",
)
@click.option(
    "--partition-by", default=None,
    help="Comma-separated hive partition columns to preserve "
    "(dataset kind only).",
)
def compact(path: str, target_file_mb: int, kind: str,
            partition_by: str | None) -> None:
    """Fold small files from incremental appends back into ~target-size
    files, in place (crash-recovering two-rename swap). Quiesce writers
    for the duration — same serialize contract as the appends that made
    the small files."""
    from mini_etl_spark.maintenance import (
        compact_dataset_inplace,
        compact_minhash_index,
    )
    from mini_etl_spark.session import get_spark

    spark = get_spark("mini-etl-compact")
    if kind == "index":
        stats = compact_minhash_index(spark, path, target_file_mb)
    else:
        cols = (
            [c.strip() for c in partition_by.split(",")]
            if partition_by else None
        )
        stats = compact_dataset_inplace(
            spark, path, target_file_mb, partition_by=cols
        )
    click.echo(json.dumps(stats))


@main.command("index-build")
@click.argument("path", type=click.Path())
@click.option(
    "--kind",
    type=click.Choice(["minhash", "bloom", "ivf", "jaccard"]),
    required=True,
    help="Index to build at PATH: minhash near-dup (signatures + band "
    "postings), bloom decontamination (grams + word bitmask), ivf "
    "(trained centroids + cell-partitioned vectors), or jaccard "
    "(frozen-order prefix postings — EXACT threshold near-dup).",
)
@click.option(
    "--input", "input_path", required=True,
    type=click.Path(exists=True),
    help="Parquet corpus to index (minhash: documents; bloom: the "
    "benchmark suite to screen against; ivf: vectors).",
)
@click.option("--column", default="text",
              help="Text column (minhash/bloom/jaccard kinds).")
@click.option("--id", "id_col", default=None,
              help="Id column. Default: doc_id (minhash/bloom/jaccard), "
              "vec_id (ivf).")
@click.option("--vec-col", default="embedding",
              help="Vector column (ivf kind).")
@click.option("--n", "n_gram", default=None, type=int,
              help="Shingle size (minhash/jaccard default 3, bloom "
              "default 5).")
@click.option("--cells", default=16, type=int,
              help="IVF cell count (k-means k; ivf kind).")
def index_build(path: str, kind: str, input_path: str, column: str,
                id_col: str | None, vec_col: str, n_gram: int | None,
                cells: int) -> None:
    """Build one of the three persisted indexes from the shell — the
    build-once half of the build-once/append-many story `index-append`
    serves. Each index records its own parameters (column names, hash
    config, sizing) so later appends, probes and screens never have to
    be told them again. Overwrites PATH."""
    from mini_etl_spark.session import get_spark

    spark = get_spark("mini-etl-index-build")
    df = spark.read.parquet(input_path)
    n_docs = df.count()
    if kind == "minhash":
        from mini_etl_spark.functions.dedup_index import minhash_index_write

        minhash_index_write(
            df, path, text_col=column, id_col=id_col or "doc_id",
            n=n_gram or 3,
        )
        report: dict = {"kind": kind, "indexed_docs": n_docs}
    elif kind == "bloom":
        from mini_etl_spark.functions.bloom import decontamination_index_write

        params = decontamination_index_write(
            df, path, text_col=column, id_col=id_col or "doc_id",
            n=n_gram or 5,
        )
        report = {"kind": kind, "indexed_docs": n_docs, **params}
    elif kind == "jaccard":
        from mini_etl_spark.functions.jaccard_index import jaccard_index_write

        indexed = jaccard_index_write(
            df, path, text_col=column, id_col=id_col or "doc_id",
            n=n_gram or 3,
        )
        report = {"kind": kind, "indexed_docs": indexed}
    else:
        from mini_etl_spark.functions.similarity import build_ivf_index

        cents = build_ivf_index(
            df, path, k=cells, vec_col=vec_col, id_col=id_col or "vec_id"
        )
        report = {
            "kind": kind,
            "indexed_vectors": n_docs,
            "cells": int(cents.shape[0]),
            "dim": int(cents.shape[1]),
        }
    click.echo(json.dumps(report))


@main.command("index-append")
@click.argument("path", type=click.Path(exists=True))
@click.option(
    "--kind",
    type=click.Choice(["minhash", "bloom", "ivf", "jaccard"]),
    required=True,
    help="Index layout at PATH: minhash_index_write / "
    "decontamination_index_write / build_ivf_index / "
    "jaccard_index_write.",
)
@click.option(
    "--input", "input_path", required=True,
    type=click.Path(exists=True),
    help="Parquet of new documents (minhash: accepted batch; bloom: new "
    "benchmark docs; ivf: new vectors).",
)
@click.option("--column", default="text",
              help="Text column (bloom kind; minhash uses the index's "
              "own recorded columns).")
@click.option("--id", "id_col", default=None,
              help="Id column. Default: the index's own recorded name "
              "(ivf/minhash) or doc_id (bloom).")
@click.option("--vec-col", default=None,
              help="Vector column (ivf kind). Default: the index's "
              "recorded name.")
def index_append(path: str, kind: str, input_path: str, column: str,
                 id_col: str, vec_col: str) -> None:
    """Grow a persisted index in place with a new batch — the
    operational companion of `compact`: all three build-once indexes
    (MinHash near-dup, Bloom decontamination, IVF vectors) append
    instead of rebuilding. Serialize contract: quiesce other writers
    AND in-flight screens/probes for the duration (the bloom append
    overwrites its words table in place; a reader planned over the old
    file listing fails mid-scan)."""
    from mini_etl_spark.session import get_spark

    spark = get_spark("mini-etl-index-append")
    df = spark.read.parquet(input_path)
    if kind == "minhash":
        from mini_etl_spark.functions.dedup_index import minhash_index_append

        report: dict = {
            "kind": kind, "appended_docs": minhash_index_append(df, path),
        }
    elif kind == "jaccard":
        # column/shingle config resolves from the index's _JACCARD.json
        # params marker — parameters are never arguments
        from mini_etl_spark.functions.jaccard_index import jaccard_index_append

        report = {
            "kind": kind, "appended_docs": jaccard_index_append(df, path),
        }
    elif kind == "bloom":
        from mini_etl_spark.functions.bloom import decontamination_index_append

        params = decontamination_index_append(
            df, path, text_col=column, id_col=id_col or "doc_id"
        )
        report = {"kind": kind, **params}
    else:
        # vec/id default to None → ivf_index_append resolves them from
        # the index's own _IVF.json record (r10 shipped this path broken
        # by passing --id's doc_id default into a vec_id-named table)
        from mini_etl_spark.functions.similarity import ivf_index_append

        report = {"kind": kind, **ivf_index_append(
            df, path, vec_col=vec_col, id_col=id_col
        )}
    click.echo(json.dumps(report))


@main.command()
def info() -> None:
    """Show engine / environment info."""
    import pyspark

    payload = {
        "engine": "mini-etl-spark",
        "version": __version__,
        "pyspark": pyspark.__version__,
        "python": sys.version.split()[0],
        "sources": sorted(SOURCE_TYPES),
        "sinks": sorted(SINK_TYPES),
        "transformers": sorted(TRANSFORMER_TYPES),
    }
    click.echo(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
