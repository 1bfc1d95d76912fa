"""Plan-quality audit over EVERY driver-contract query.

For each ``queries()`` entry, compiles the physical plan and records the
scale signals reviews care about: exchange count, cartesian products,
broadcast-nested-loop joins (legitimate only as 1-row scalar joins or
documented brute-force baselines), row-at-a-time Python UDFs (always a
defect — the engine's escape hatches are Arrow-batched), and
whole-stage-codegen coverage.  Writes one JSON line; the allowlist below
documents every intentional exception so a NEW hazard fails loudly in
review instead of hiding among known ones.

Usage: python scripts/plan_audit.py [sf_dir]   (exit 1 on unexplained hazards)
       PLAN_AUDIT_OUT=PLAN_AUDIT.json python scripts/plan_audit.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark_engine import llmops
from pyspark_engine.runtime import build_session

# Intentional exceptions, each with the reason a reviewer needs.
ALLOWED_BNLJ = {
    "q45_ngram_jaccard": "brute-force exactness baseline (documented, not the scale path)",
    "q46_cosine_topk": "bounded query batch broadcast x corpus scan (documented baseline)",
    "q90_dedup_clusters": "brute-force pair-gen correctness baseline feeding the CC oracle",
    "q96_tfidf_topk": "crossJoin(broadcast(1-row N)) scalar join for idf",
    "q97_unigram_xent": "crossJoin(broadcast(1-row total)) scalar join for the LM denominator",
    "q98_inverted_index": "crossJoin(broadcast(1-row N)) scalar join for df pruning",
    "q100_pmi_collocations": "crossJoin(broadcast(1-row totals)) scalar join for PMI denominators",
    "q109_semantic_dedup": "brute-force q90-style pair baseline inside the planted-dup corpus",
    "q110_dsir_weights": "crossJoin(broadcast(1-row totals)) scalar joins for the smoothed denominators",
    "q111_bigram_backoff": "crossJoin(broadcast(1-row T)) scalar join for the unigram denominator",
    "q115_perplexity_buckets": "unigram_logprob's crossJoin(broadcast(1-row total)) scalar join (same as q97)",
    "q137_vocab_drift": "crossJoin(broadcast(1-row totals)) scalar join for the smoothed denominators",
    "q145_hybrid_search": "bm25's 1-row N/avgdl scalar join + the 1-row broadcast query-vector join",
    "q116_bm25_topk": "crossJoin(broadcast(1-row N/avgdl)) scalar join for the BM25 constants",
    "q124_profile_columns": "crossJoin(broadcast(1-row ndv agg)) — r13 split of the exact profile into stats ⊗ multi-distinct (both 1-row)",
    "q149_profile_approx": "crossJoin(broadcast(1-row ndv agg)) — r13 single-join sketch-vs-exact profile audit (both sides 1-row)",
}
ALLOWED_SINGLE_PARTITION_WINDOW = {
    "q92_pack_tokens": "global packing order on a bounded eval set; shard_col is the corpus-scale mode",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("plan_audit", cpus=8, shuffle_partitions=8)
    report: dict[str, dict] = {}
    unexplained: list[str] = []
    for name, fn in entrymod.queries().items():
        llmops.release_cache()
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            unexplained.append(name)
            continue
        row = {
            "exchanges": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
            "cartesian": "CartesianProduct" in plan,
            "bnlj": "BroadcastNestedLoopJoin" in plan,
            "row_python_udf": "BatchEvalPython" in plan,
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "codegen_spans": plan.count("WholeStageCodegen"),
        }
        report[name] = row
        if row["cartesian"] or row["row_python_udf"]:
            unexplained.append(name)
        if row["bnlj"] and name not in ALLOWED_BNLJ:
            unexplained.append(name)
    out = {
        "metric": "plan_audit",
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "unexplained_hazards": sorted(set(unexplained)),
        "allowed_bnlj": ALLOWED_BNLJ,
        "allowed_single_partition_window": ALLOWED_SINGLE_PARTITION_WINDOW,
        "queries": report,
    }
    path = os.environ.get("PLAN_AUDIT_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {path}")
    print(json.dumps({k: out[k] for k in ("metric", "n_queries", "unexplained_hazards")}))
    return 1 if unexplained else 0


if __name__ == "__main__":
    sys.exit(main())
