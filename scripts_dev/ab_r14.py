#!/usr/bin/env python
"""Same-session alternating A/B: HEAD (old) vs working-tree (new)
implementation of one registered query.

Usage: python scripts_dev/ab_r14.py <module> <query> [blocks] [reps]

Loads ``sortify_spark/<module>.py`` from git HEAD, exec's it so its
``@register`` calls momentarily point the registry at the OLD fns,
grabs the old fn, restores the registry, then runs alternating
[old, new] blocks of ``reps`` noop-sink executions in ONE session
(min-of-reps per block, median across blocks) — the drift-immune
protocol VERDICT r13 endorses.
"""
import gc
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sortify_spark.all_queries import REGISTRY  # noqa: E402
from sortify_spark.session import get_spark  # noqa: E402


def main() -> None:
    module, query = sys.argv[1], sys.argv[2]
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new_fn = REGISTRY[query].fn
    snap = dict(REGISTRY)
    ref = os.environ.get("AB_REF", "HEAD")
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{ref}:sortify_spark/{module}.py"],
        text=True,
    )
    g = {"__name__": f"old_{module}"}
    exec(compile(src, f"old_{module}.py", "exec"), g)  # noqa: S102
    old_fn = REGISTRY[query].fn
    REGISTRY.clear()
    REGISTRY.update(snap)
    if old_fn is new_fn:
        print("WARNING: old and new fn identical (module unchanged?)")
    spark = get_spark("ab-r14")
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn):
        fn(spark, sf).write.format("noop").mode("overwrite").save()

    for fn in (old_fn, new_fn):  # warm both variants once
        run(fn)
    res = {"old": [], "new": []}
    for _ in range(blocks):
        for tag, fn in (("old", old_fn), ("new", new_fn)):
            gc.collect()
            ts = []
            for _ in range(reps):
                t0 = time.time()
                run(fn)
                ts.append(time.time() - t0)
            res[tag].append(round(min(ts), 3))
    for tag in ("old", "new"):
        print(
            f"{query} {tag}: blocks={res[tag]} "
            f"median={statistics.median(res[tag]):.3f}"
        )
    print(
        f"{query} speedup old/new = "
        f"{statistics.median(res['old']) / statistics.median(res['new']):.3f}x"
    )


if __name__ == "__main__":
    main()
