#!/usr/bin/env python
"""Same-session alternating A/B of ONE registered query under two
values of an env knob.

Usage: python scripts_dev/ab_env.py <query> <ENV_VAR> <valA> <valB> [blocks] [reps]
"""
import gc
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sortify_spark.all_queries import REGISTRY  # noqa: E402
from sortify_spark.session import get_spark  # noqa: E402


def main() -> None:
    query, var, va, vb = sys.argv[1:5]
    blocks = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    reps = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = REGISTRY[query].fn
    spark = get_spark("ab-env-r14")
    spark.sparkContext.setLogLevel("ERROR")

    def run(val):
        os.environ[var] = val
        try:
            fn(spark, sf).write.format("noop").mode("overwrite").save()
        finally:
            os.environ.pop(var, None)

    for v in (va, vb):
        run(v)  # warm both variants
    res = {va: [], vb: []}
    for _ in range(blocks):
        for v in (va, vb):
            gc.collect()
            ts = []
            for _ in range(reps):
                t0 = time.time()
                run(v)
                ts.append(time.time() - t0)
            res[v].append(round(min(ts), 3))
    for v in (va, vb):
        print(
            f"{query} {var}={v}: blocks={res[v]} "
            f"median={statistics.median(res[v]):.3f}"
        )


if __name__ == "__main__":
    main()
