"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headliners cover every subsystem: scan+agg (q01), projection (q05), keyed agg
(q16), windowed agg (q25/q26/q28), session windows (q61), sliding agg (q69),
stream-stream interval join (q29/q31), stream-table join (q32), broadcast dim
join (q34), table-table join (q36), as-of join (q62), per-group top-k (q54),
dedup exact/minhash (q42/q43), embedding near-dup (q60), embedding top-k
(q46), text analysis (q48).  Results are fully materialized through the noop
sink (no driver collect); each query runs twice and reports the second
(steady-state) time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspark_engine import llmops
from pyspark_engine.runtime import build_session

HEADLINE = [
    "q01_pricing_summary",
    "q05_stream_map_values",
    "q16_grouped_count",
    "q25_window_tumbling_count",
    "q26_window_hopping_sum",
    "q28_window_grace",
    "q29_ss_join_inner",
    "q31_ss_join_outer",
    "q32_st_join_inner",
    "q34_global_join_inner",
    "q36_tt_join_inner",
    "q42_dedup_exact",
    "q43_dedup_minhash",
    "q46_cosine_topk",
    "q48_text_stats",
    "q54_topk_per_group",
    "q60_embedding_neardup",
    "q61_session_window",
    "q62_asof_join",
    "q69_sliding_agg",
    "q72_composed_pipeline",
    "q73_percentiles",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    spark = build_session("bench", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # steady-state measurement: run once to pay one-time whole-stage
        # codegen/JIT compile (amortized to ~0 in a real long-running job),
        # time the second execution
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        llmops.release_cache()  # drop warm-up persists so the timed run re-caches once
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        llmops.release_cache()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
