#!/usr/bin/env python
"""Time a subset of registry queries at an sf dir with bench.py's
measurement method (noop sink, first_run + steady best-of-2).

Usage: python tools/bench_subset.py SF_DIR name [name...]
Prints one JSON line {name: {"first": s, "steady": s}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vbb_data_pipeline_spark.queries import all_queries, load_table  # noqa: E402
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    registry = {n: spec.fn for n, spec in all_queries().items()}
    from vbb_data_pipeline_spark.queries import legacy_queries

    registry.update(legacy_queries())
    spark = get_spark("bench-subset")
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = registry[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = {"first": round(first, 3), "steady": round(best, 3)}
        print(f"  {name}: steady {out[name]['steady']}s first {first:.3f}s",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
