#!/usr/bin/env python
"""Time every registry query at the driver's oracle scale factor.

The driver samples ~50 of the registry's queries per round and runs each
against its DuckDB oracle at sf0.01. For the sampling rotation to complete
the union across rounds, every query has to stay cheap at that scale —
this sweep runs ALL of them (forced with a noop write) and prints a
sorted timing table so slow outliers are visible before the driver finds
them.

Usage: python scripts/registry_sweep.py [sf_dir] [--budget SECS]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"


def main() -> None:
    import __spark_entry__ as entry
    from mini_etl_spark.session import get_spark

    spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    # mirror the driver: warm the JVM once, then time each query cold —
    # the driver runs each sampled query exactly once, no warm pass.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, SF_DIR)
            if df is not None:
                df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — sweep reports, not raises
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        timings[name] = round(time.monotonic() - t0, 3)
        spark.catalog.clearCache()

    for name, secs in sorted(timings.items(), key=lambda kv: -kv[1]):
        flag = " !!" if secs > 5 else ""
        print(f"{secs:8.2f}  {name}{flag}")
    print(json.dumps({
        "sf_dir": SF_DIR,
        "n": len(timings),
        "total_sec": round(sum(timings.values()), 2),
        "over_5s": [k for k, v in timings.items() if v > 5],
        "errors": errors,
    }))


if __name__ == "__main__":
    main()
