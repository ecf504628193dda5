"""Round-14 item 3 (VERDICT r13 #3): re-litigate the five eager
localCheckpoint barriers in pipeline_pretraining_e2e on the CURRENT
engine (post InferFiltersFromGenerate exclusion + shingle-family SQL
rewrites — the pathologies they guard were measured before those).

Each variant monkeypatches DataFrame.localCheckpoint by CALL INDEX
(the five barriers fire in deterministic construction order:
1=s3, 2=s4, 3=dec, 4=s5, 5=s6 — verified the op reaches no other
localCheckpoint site) and either skips the barrier (returns self —
semantically identical, lineage kept) or swaps it for .cache()
(caches without truncating lineage). Run each variant in its own
subprocess under a hard timeout: the documented failure mode is
analysis that never terminates.

Usage:
    python tools/r14_e2e_barriers.py VARIANT [--passes N] [--sf DIR]
    VARIANT in: baseline, skip1..skip5, cache1..cache5, skipall
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    # Spark 4: the concrete class (which OVERRIDES localCheckpoint) is
    # the classic subclass — patching pyspark.sql.DataFrame would miss.
    from pyspark.sql.classic.dataframe import DataFrame

    orig = DataFrame.localCheckpoint
    calls = {"n": 0}
    mode, idx = "baseline", None
    if args.variant != "baseline":
        mode = "skip" if args.variant.startswith("skip") else "cache"
        idx = None if args.variant == "skipall" else int(args.variant[-1])

    def patched(self, eager=True):
        calls["n"] += 1
        if mode == "baseline":
            return orig(self, eager=eager)
        if idx is None or calls["n"] == idx:
            return self if mode == "skip" else self.cache()
        return orig(self, eager=eager)

    DataFrame.localCheckpoint = patched

    import __spark_entry__ as entry_mod
    from pg_archiver_spark.session import get_spark

    spark = get_spark("r14_e2e_barriers")
    q = entry_mod.queries()["pipeline_pretraining_e2e"]
    times = []
    rows_repr = None
    for p in range(args.passes):
        calls["n"] = 0
        spark.sparkContext.setJobDescription(
            f"r14:e2e:{args.variant}:pass{p}"
        )
        t0 = time.time()
        rows = q(spark, args.sf).collect()
        times.append(round(time.time() - t0, 3))
        rows_repr = sorted(tuple(r) for r in rows)
        spark.catalog.clearCache()
    import hashlib

    h = hashlib.md5(repr(rows_repr).encode()).hexdigest()[:12]
    print(
        json.dumps(
            {
                "variant": args.variant,
                "min": min(times),
                "times": times,
                "n_ckpt_calls": calls["n"],
                "result_md5": h,
            }
        )
    )


if __name__ == "__main__":
    main()
