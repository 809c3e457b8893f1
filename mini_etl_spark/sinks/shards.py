"""Training-shard export: write a corpus as exactly-N deterministic shards.

Training jobs consume data as a fixed set of shard files (WebDataset /
tf.data-style): each worker streams its own subset, resume points are
"shard i, offset j", and re-exports must reproduce the same shard
membership so checkpointed runs stay valid. ``to_training_shards`` gives
that contract on top of the engine's deterministic md5 bucketing:

- shard id = ``hash_bucket(key, seed, num_shards)`` — the same
  engine-portable assignment the split/sample operators use, so a record's
  shard never changes across runs, engines, or corpus growth;
- the frame is hash-repartitioned ON the shard id, so every shard's rows
  land in one task → exactly one data file per non-empty shard, laid out
  hive-style (``shard=K/part-*.json``) and readable back with a plain
  ``spark.read.format(fmt).load(path)`` (the shard id comes back as a
  partition column, and shard-scoped reads prune to one directory);
- a driver-side ``_manifest.json`` records per-shard row counts and the
  assignment parameters (the file a training launcher reads to hand
  shards to workers).

No reference parity: the reference has no sharded-export surface — this is
the training-data-pipeline extension (BASELINE.json north star).

Scale: one column-pruned aggregate for the manifest (key column only) and
one full shuffle on the shard id for the write. ``num_shards`` should be
chosen so a shard fits a training worker's streaming budget (hundreds of
MB to a few GB), NOT one-file-per-executor; at 100 TB that's thousands of
shards, which is exactly what the single hash shuffle handles.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_etl_spark.functions.splits import hash_bucket
from mini_etl_spark.sinks.writers import Sink, _spark_mode

logger = logging.getLogger(__name__)

_FORMATS = {"jsonl": "json", "parquet": "parquet", "csv": "csv"}


def to_training_shards(
    path: str,
    num_shards: int,
    key_col: str = "doc_id",
    fmt: str = "jsonl",
    mode: str = "w",
    seed: int = 42,
    shard_col: str = "shard",
    manifest: bool = True,
    **options,
) -> Sink:
    """Sink: write ``num_shards`` deterministic training shards under
    ``path`` (hive layout ``shard=K/``), one data file per non-empty
    shard, plus ``_manifest.json`` with per-shard row counts.

    ``fmt``: ``jsonl`` (default — one JSON object per line, the common
    LLM-training interchange), ``parquet``, or ``csv`` (header on).
    Extra ``options`` pass through to the writer (e.g. ``compression``).

    The manifest pass aggregates only ``key_col`` (column-pruned scan of
    the input); set ``manifest=False`` to skip it when the input is not
    re-readable (e.g. an exhausted stream of a transient source).
    """
    if num_shards < 1:
        raise ValueError("to_training_shards: num_shards must be >= 1")
    if fmt not in _FORMATS:
        raise ValueError(
            f"to_training_shards: fmt must be one of {sorted(_FORMATS)}, got {fmt!r}"
        )
    spark_fmt = _FORMATS[fmt]
    spark_mode = _spark_mode(mode)

    def _write(df: DataFrame) -> None:
        if df.isStreaming:
            raise ValueError(
                "to_training_shards is batch-only; land the stream first "
                "(to_parquet), then shard the landed table"
            )
        if shard_col in df.columns:
            raise ValueError(
                f"to_training_shards: column {shard_col!r} already exists"
            )
        sharded = df.withColumn(
            shard_col, hash_bucket(key_col, seed=seed, num_buckets=num_shards)
        ).repartition(num_shards, F.col(shard_col))
        writer = sharded.write.mode(spark_mode).partitionBy(shard_col)
        if fmt == "csv":
            writer = writer.option("header", True)
        for k, v in options.items():
            writer = writer.option(k, v)
        writer.format(spark_fmt).save(path)
        if manifest:
            counts = {
                int(r[shard_col]): int(r["__n"])
                for r in df.select(
                    hash_bucket(
                        key_col, seed=seed, num_buckets=num_shards
                    ).alias(shard_col)
                )
                .groupBy(shard_col)
                .agg(F.count(F.lit(1)).alias("__n"))
                .collect()
            }
            doc = {
                "num_shards": num_shards,
                "key_col": key_col,
                "seed": seed,
                "format": fmt,
                "shard_col": shard_col,
                "shards": {str(i): counts.get(i, 0) for i in range(num_shards)},
                "total_rows": sum(counts.values()),
            }
            # driver-local write; the shard data itself goes through the
            # distributed writer above, only this KB-sized summary is local
            Path(path, "_manifest.json").write_text(json.dumps(doc, indent=1))
            logger.info(
                "to_training_shards: %d rows into %d shards at %s",
                doc["total_rows"], num_shards, path,
            )

    return _write


def read_shard_manifest(path: str) -> dict:
    """Load the ``_manifest.json`` written by :func:`to_training_shards`."""
    return json.loads(Path(path, "_manifest.json").read_text())
