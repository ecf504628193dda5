"""Round-14 optimization measurement harness (guide §1).

Times individual declared queries in isolation and captures their
``explain("formatted")`` plans into plans/r14/.

Usage:
    python tools/r14_measure.py [--sf DIR] [--passes N] [--tag before]
                                [--noop] name [name ...]

Timing methodology matches bench.py (warm-up pass, then min-of-N
``collect()``), with an optional ``--noop`` mode that times the noop
sink instead (guide §1.4) so the computation is measured rather than
the driver-collect path.  Side-effecting ops (stream_*/source_*/sink_*)
do their work while building the DataFrame, so for them the build is
included in the timed region either way — identical to bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from pg_archiver_spark.plans.inspect import physical_plan
from pg_archiver_spark.session import get_spark

PLANS_DIR = "/root/repo/plans/r14"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--tag", default=None, help="save plan as <name>_<tag>.txt")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    spark = get_spark("r14_measure")
    queries = entry_mod.queries()
    names = args.names
    if names == ["HEADLINE"]:
        from bench import HEADLINE

        names = list(HEADLINE)
    elif names == ["TPCH"]:
        names = sorted(q for q in queries if q.startswith("composed_q"))

    os.makedirs(PLANS_DIR, exist_ok=True)
    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r14:{name}:warmup")
        df = queries[name](spark, args.sf)
        if args.tag:
            with open(f"{PLANS_DIR}/{name}_{args.tag}.txt", "w") as fh:
                fh.write(physical_plan(df))
        # Warm-up (JIT/codegen), then measured passes.
        df.collect()
        spark.catalog.clearCache()
        xs = []
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"r14:{name}:pass{p}")
            t0 = time.time()
            d = queries[name](spark, args.sf)
            if args.noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.collect()
            xs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        xs_sorted = sorted(xs)
        results[name] = {
            "min": xs_sorted[0],
            "med": xs_sorted[len(xs) // 2],
            "all": xs,
        }
        print(f"{name}: min={xs_sorted[0]} med={xs_sorted[len(xs)//2]} {xs}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
