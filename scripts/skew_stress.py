"""Skewed-corpus stress leg for the r14 de-skewed doc-frequency family
(r13 verdict item 2 "Done" evidence): on a corpus where ONE token appears in
EVERY document, the r13 `count(*) over (partition by term)` window put all
of that term's tf rows on a single task; the r14 hot/cold attach must keep
per-task row counts bounded (hot keys broadcast — their rows never shuffle;
cold keys are < hot_rows per key by construction).

The measurement is per-task MAX shuffle-read records over every stage of
the query (Spark UI REST taskSummary), plus the stage-level max/median task
time — the straggler signature itself.

Usage: python scripts/skew_stress.py [n_docs]           (default 300000)
Writes one JSON line.  Run from the optimized tree; to capture the window
shape's numbers, copy this script into a worktree of the pre-r14 commit
(the query surface is identical).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pyspark_engine import llmops
from pyspark_engine.runtime import build_session


def _task_extremes(spark) -> dict:
    """Max per-task shuffle-read records and max/median task time across all
    completed stages (REST)."""
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=5
    ) as r:
        stages = json.load(r)
    worst_rows, worst_ratio, worst_stage = 0, 0.0, None
    for s in stages:
        sid, att = s["stageId"], s["attemptId"]
        try:
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.0,0.5,1.0",
                timeout=5,
            ) as r:
                q = json.load(r)
        except Exception:
            continue
        rr = q.get("shuffleReadMetrics", {}).get("readRecords", [0, 0, 0])
        rt = q.get("executorRunTime", [0, 0, 0])
        if rr[-1] > worst_rows:
            worst_rows = rr[-1]
            worst_stage = sid
        if rt[1] > 0:
            worst_ratio = max(worst_ratio, rt[-1] / rt[1])
    return {
        "max_task_shuffle_read_records": int(worst_rows),
        "max_over_median_task_time": round(worst_ratio, 2),
        "worst_stage": worst_stage,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    hot_rows = int(os.environ.get("SKEW_HOT_ROWS", "10000"))
    llmops._HOT_KEY_ROWS = hot_rows  # engage the split well below n_docs
    spark = build_session("skew-stress", cpus=16, shuffle_partitions=16, ui=True)
    # every doc contains the hot token; 3 unique tokens per doc keep the
    # vocabulary corpus-sized so the df table could never broadcast whole
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hotterm u"), F.col("id"), F.lit("a u"), F.col("id"), F.lit("b u"),
            F.col("id"), F.lit("c"),
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet("/tmp/pse-skew/docs.parquet")
    corpus = spark.read.parquet("/tmp/pse-skew/docs.parquet")
    out = llmops.tfidf_topk(corpus, "doc_id", "text", k=2, min_df=1)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    res = {
        "metric": "tfidf_skewed_corpus",
        "n_docs": n_docs,
        "hot_rows_threshold": hot_rows,
        "hot_term_tf_rows": n_docs,
        "wall_sec": wall,
        "plan_has_window_on_term": "windowspecdefinition(term" in plan,
        "plan_has_broadcast_attach": "BroadcastHashJoin" in plan,
        **_task_extremes(spark),
    }
    llmops.release_cache()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
