"""Micro-bench a subset of declared queries with bench.py's methodology
(plan once, noop-write twice, report the second) — for optimization-round
before/after loops without paying the full 102-query suite.

Usage: python scripts/time_queries.py q149_profile_approx q116_bm25_topk ...
       REPS=3 python scripts/time_queries.py ...   (min over REPS timed runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark_engine import llmops
from pyspark_engine.runtime import build_session


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "1"))
    spark = build_session("time-queries", cpus=cpus, shuffle_partitions=cpus, ui=False)
    qs = entrymod.queries()
    out = {}
    cold = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()  # warm-up (timed too:
        cold[name] = round(time.time() - t0, 3)  # includes persist build/JIT)
        best = None
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        llmops.release_cache()
        print(f"{out[name]:8.3f}  (cold {cold[name]:8.3f})  {name}", flush=True)
    print(json.dumps({"steady": out, "cold": cold}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
