"""Dump ``.explain("formatted")`` for named queries into plans/<tag>/.

Usage: python scripts/dump_plans.py <tag_dir> <query...>
       python scripts/dump_plans.py r13/before q01_pricing_summary q151_jaccard_exact

Writes plans/<tag_dir>/<query>.txt (driver-side plan compilation only — no
jobs run, so it is cheap and safe to run next to a live bench).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark_engine import llmops
from pyspark_engine.runtime import build_session


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-plans", cpus=4, shuffle_partitions=4)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        llmops.release_cache()
        print(f"wrote {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
