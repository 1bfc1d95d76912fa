"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
full JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} followed by a compact (~1.6 KB)
summary line {"wall_sec", "n_queries", "queries_sec" (per-query seconds
under short qNN keys, 2 decimals), "slowest_sec", "shuffle_write_mb_total",
"spilled_mb"} so a tail-truncated capture still preserves the headline
numbers AND the per-query comparison table.

Headliners cover every subsystem: scan+agg (q01), projection (q05), keyed agg
(q16), windowed agg (q25/q26/q28), session windows (q61), sliding agg (q69),
stream-stream interval join (q29/q31), stream-table join (q32), broadcast dim
join (q34), table-table join (q36), as-of join (q62), versioned temporal join
(q102), per-group top-k (q54), dedup exact/minhash (q42/q43), embedding
near-dup (q60), embedding top-k (q46), ANN IVF (q71), text analysis (q48),
quality filter (q78), chunking (q80), decontamination (q82), multimodal
frame-sample/resize (q94/q95), corpus stats (q88/q96/q97/q98/q100), sampling
(q99/q101), packing (q92).  Results are fully materialized through the noop
sink (no driver collect); each query runs twice and reports the second
(steady-state) time.

Scale evidence (extra JSON keys, same one-line contract):
  * shuffle_write_mb / spilled_mb per query — deltas of the Spark UI REST
    cumulative stage metrics around the timed run, so a plan that silently
    grows its shuffle (or starts spilling) fails review even while wall
    time looks fine on a warm local cache;
  * scale_points — the suite wall re-run at a second sf (auto-detected
    sibling dir, override $SPARK_GRAFT_SCALE2_DIR) to show how the same
    plans degrade with input size.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

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
    "q71_ann_ivf",
    "q72_composed_pipeline",
    "q73_percentiles",
    "q78_quality_filter",
    "q80_chunk_text",
    "q82_decontaminate",
    "q87_paragraph_dedup",
    "q88_top_ngrams",
    "q89_llm_pipeline",
    "q91_url_stats",
    "q92_pack_tokens",
    "q94_frame_sample",
    "q95_resize_thumbs",
    "q96_tfidf_topk",
    "q97_unigram_xent",
    "q98_inverted_index",
    "q99_sample_mixture",
    "q100_pmi_collocations",
    "q101_sample_quota",
    "q102_versioned_join",
    "q103_avro_wire",
    "q105_sketch_stats",
    "q108_repeated_spans",
    "q110_dsir_weights",
    "q112_char_entropy",
    "q113_classifier_score",
    "q114_warc_roundtrip",
    "q115_perplexity_buckets",
    "q116_bm25_topk",
    "q117_corpus_report",
    "q118_token_budget_mixture",
    "q119_incremental_dedup",
    "q120_corpus_diff",
    "q121_leakage_free_split",
    "q122_sentence_chunks",
    "q123_ngram_novelty",
    "q124_profile_columns",
    "q125_normalize_text",
    "q126_matryoshka",
    "q127_fuzzy_editdist",
    "q128_length_outliers",
    "q129_curation_v2",
    "q130_shuffle_shards",
    "q131_strip_boilerplate",
    "q132_event_sequences",
    "q133_semantic_decontam",
    "q134_minhash_incremental",
    "q135_warc_html_extract",
    "q136_cluster_balanced",
    "q137_vocab_drift",
    "q138_dedup_priority",
    "q139_histogram",
    "q140_fuzzy_keep_best",
    "q141_rate_anomaly",
    "q142_windowed_topk",
    "q143_funnel",
    "q144_cohort_retention",
    "q145_hybrid_search",
    "q146_sessionize",
    "q147_url_dedup",
    "q148_temporal_split",
    "q149_profile_approx",
    "q150_rate_anomaly_time",
    "q151_jaccard_exact",
    "q152_windowed_distinct",
    "q153_domain_blocklist",
    "q154_lsh_summary",
    "q155_wav_decode",
    "q158_ppm_decode",
    "q164_png_decode",
    "q166_pii_scrub_v2",
    "q168_jpeg_roundtrip",
    "q169_jpeg420_roundtrip",
    "q170_image_transcode",
    "q171_jpeg422_roundtrip",
    "q173_wire_serde",
    "q174_gif_roundtrip",
    "q175_wav_ulaw_roundtrip",
    "q176_wav_adpcm_roundtrip",
    "q177_image_sniff",
    "q178_bmp_roundtrip",
    "q179_gif_animation",
]


def _stage_totals(spark) -> tuple[int, int] | None:
    """Cumulative (shuffle write bytes, spilled bytes) over completed stages
    via the UI REST API; None when the UI is unavailable."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete", timeout=5
        ) as r:
            stages = json.load(r)
    except Exception:
        return None
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sp = sum(s.get("diskBytesSpilled", 0) + s.get("memoryBytesSpilled", 0) for s in stages)
    return sw, sp


def _run_suite(spark, qs, sf_dir: str, collect_metrics: bool):
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}
    spill_mb: dict[str, float] = {}
    for name in HEADLINE:
        # steady-state measurement: build the plan ONCE, write twice.  The
        # warm-up write pays one-time whole-stage codegen/JIT compile and
        # populates the pipeline's persisted intermediates (the LSH shingle/
        # bucket tables — a warm production pipeline's standing state); the
        # timed write is the steady-state cost.  Persists are released after
        # each query, so repeated suites never accumulate cache.
        # r14 (warm-persist hygiene, VERDICT r13 item 7): the warm-up write
        # is ALSO timed and reported per query as ``queries_cold_sec`` in
        # the full JSON line, so the cost of building any persisted
        # intermediates (plus codegen/JIT) is visible next to the
        # steady-state number instead of silently excluded.  The primary
        # ``queries`` metric is unchanged (second write).
        df = qs[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        before = _stage_totals(spark) if collect_metrics else None
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        if before is not None:
            after = _stage_totals(spark)
            if after is not None:
                shuffle_mb[name] = round((after[0] - before[0]) / 1e6, 2)
                spill_mb[name] = round((after[1] - before[1]) / 1e6, 2)
        llmops.release_cache()
    return timings, cold, shuffle_mb, spill_mb


def _stream_replay(spark, sf_dir: str, reps: int | None = None) -> dict:
    """Streaming-runtime scale point: replay the events table through the
    Structured Streaming path (file source → keyed count, update-mode state)
    into a memory sink and report end-to-end throughput.  Exercises the
    stateful streaming plan itself — micro-batch planning, state store
    read/write — not just the batch analog of the same query.

    The wall time is noisy (a ~2 s query on a JVM that just ran a 100-query
    suite swung 3.2× between identical-code runs in round 12) AND strongly
    JVM-warmth-dependent (the same drain measures ~17 s in a cold session vs
    ~2.4 s at suite end — JIT, not I/O), so the pin protocol (BASELINE.md
    'Streaming-replay pin protocol') is defined IN-SUITE: the headline run
    takes the MEDIAN of ``BENCH_REPLAY_REPS`` (default 3) back-to-back
    drains, each with a fresh checkpoint, and the pin is that median from an
    idle-box full bench.  ``BENCH_REPLAY_ONLY`` exists for diagnostics but
    measures the cold regime — do not compare it against the pin."""
    from pyspark_engine.dsl import KStream
    from pyspark_engine.runtime import normalize_event_time
    from pyspark_engine.streaming import StreamingBuilder, run_available_now

    if reps is None:
        reps = max(1, int(os.environ.get("BENCH_REPLAY_REPS", "3")))
    runs = []
    final = None
    for _ in range(reps):
        ks = StreamingBuilder(spark).file_stream(
            f"{sf_dir}/events.parquet", key="user_id", ts="ts"
        )
        ks = KStream(normalize_event_time(ks.df, "ts"), ks.key, "ts")
        t0 = time.time()
        final = run_available_now(ks.group_by_key().count(), output_mode="complete")
        runs.append(round(time.time() - t0, 3))
    wall = sorted(runs)[len(runs) // 2]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    out = {
        "wall_sec": wall,
        "input_rows": rows,
        "rows_per_sec": round(rows / wall),
        "state_keys": final.count(),
    }
    if reps > 1:
        out["reps"] = reps
        out["runs_sec"] = runs
    return out


def _sf_of(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(sf)
    except ValueError:
        return sf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if os.environ.get("BENCH_REPLAY_ONLY"):
        # standalone replay measurement for the pin protocol (cold session,
        # no prior suite — the regime the pin is defined in); defaults to
        # median-of-3 here
        spark = build_session("bench-replay", cpus=cpus, shuffle_partitions=cpus, ui=False)
        reps = max(1, int(os.environ.get("BENCH_REPLAY_REPS", "3")))
        print(json.dumps({
            "metric": "streaming_replay",
            "sf": _sf_of(sf_dir),
            "cpus": cpus,
            **_stream_replay(spark, sf_dir, reps=reps),
        }))
        return
    spark = build_session("bench", cpus=cpus, shuffle_partitions=cpus, ui=True)
    qs = entrymod.queries()
    timings, cold, shuffle_mb, spill_mb = _run_suite(spark, qs, sf_dir, collect_metrics=True)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold_sec": cold,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
    }
    if shuffle_mb:
        out["shuffle_write_mb"] = shuffle_mb
        out["shuffle_write_mb_total"] = round(sum(shuffle_mb.values()), 2)
        out["spilled_mb_total"] = round(sum(spill_mb.values()), 2)
    # second scale point: sibling sf dir (or explicit override), totals only
    scale2 = os.environ.get("SPARK_GRAFT_SCALE2_DIR")
    if scale2 is None:
        for cand in ("sf0.01", "sf0.001"):
            p = os.path.join(os.path.dirname(sf_dir.rstrip("/")), cand)
            if os.path.isdir(p) and os.path.abspath(p) != os.path.abspath(sf_dir.rstrip("/")):
                scale2 = p
                break
    if scale2 and os.path.isdir(scale2):
        t2, _, _, _ = _run_suite(spark, qs, scale2, collect_metrics=False)
        out["scale_points"] = [
            {"sf": _sf_of(sf_dir), "wall_sec": total},
            {"sf": _sf_of(scale2), "wall_sec": round(sum(t2.values()), 3)},
        ]
    try:
        out["streaming_replay"] = _stream_replay(spark, sf_dir)
    except Exception as e:  # never let the extra metric break the contract
        out["streaming_replay"] = {"err": str(e)[:200]}
    print(json.dumps(out))
    # truncation-proof tail: harnesses that keep only the last ~2 KB of
    # output still get the headline numbers — a compact second line AFTER
    # the full JSON, so whatever tail survives contains it.  Every key is
    # UNIT-SUFFIXED (r10 advice: a truncated capture of the full line's
    # per-query shuffle-MB dict was misread as seconds — the tail must be
    # self-describing even in isolation).
    # r14 (VERDICT r13 item 1): the final line now carries PER-QUERY seconds
    # under compact qNN keys (2 decimals — ~1.5 KB for 102 queries, inside a
    # 2 KB tail), so the driver's per-query PERF comparison stops starving
    # on a top-5-only tail.  ``slowest_sec`` is kept for compatibility.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    short = {name.split("_", 1)[0]: name for name in timings}
    qsec = (
        {s: round(timings[n], 2) for s, n in short.items()}
        if len(short) == len(timings)  # qNN prefixes unique — always true today
        else {n: round(v, 2) for n, v in timings.items()}
    )
    print(json.dumps({
        "wall_sec": total,
        "n_queries": len(timings),
        "queries_sec": qsec,
        "slowest_sec": {k: v for k, v in slowest},
        "shuffle_write_mb_total": out.get("shuffle_write_mb_total", 0.0),
        "spilled_mb": out.get("spilled_mb_total", 0.0),
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
