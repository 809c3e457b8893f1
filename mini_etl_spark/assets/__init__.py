"""Bundled public-data assets (vocabulary-sized lookup tables).

Assets here are snapshots of PUBLIC datasets small enough to broadcast
(suffix lists, stopword tables). They are code, not I/O: importing an
asset yields plain Python lists, so executors receive them through the
closure/broadcast path with no filesystem dependency at run time.
"""

from mini_etl_spark.assets.public_suffixes import (  # noqa: F401
    load_psl_file,
    public_suffixes,
)

__all__ = ["public_suffixes", "load_psl_file"]
