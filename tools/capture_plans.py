#!/usr/bin/env python
"""Capture .explain("formatted") output per query for the round's
before/after plan evidence (plans/r<N>/<query>_<suffix>.txt).

Usage:
    python tools/capture_plans.py --out plans/r10 --suffix before [names...]

Names may be registry entries or legacy leg names (bench.py set). With
no names, captures the bench headline set. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale) and, like the
bench, under SPARK_GRAFT_FAST_HASH=1 so the plan matches what the
bench times.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")

    from bench import HEADLINE, OPTIONAL
    from vbb_data_pipeline_spark.plans.explain import formatted
    from vbb_data_pipeline_spark.queries import all_queries, legacy_queries
    from vbb_data_pipeline_spark.session import get_spark

    registry = {n: spec.fn for n, spec in all_queries().items()}
    registry.update(legacy_queries())
    names = args.names or [n for n in HEADLINE + OPTIONAL if n in registry]

    out_dir = Path(__file__).resolve().parent.parent / args.out
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        if name not in registry:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        df = registry[name](spark, args.sf)
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(formatted(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
