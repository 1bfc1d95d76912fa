"""Event-analytics operator tests: integer-exact anomaly rule, windowed
heavy hitters, ordered funnel edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_engine import analytics

HOUR = 3_600_000


def _ts(df):
    return df.select(
        "k", F.timestamp_millis(F.col("tsm")).alias("ts"), *(c for c in df.columns if c not in ("k", "tsm"))
    )


def test_rate_anomaly_integer_rule(spark):
    # key "a": 6 calm windows of 2 events, then a 50-event burst window
    rows = []
    eid = 0
    for wi in range(6):
        for j in range(2):
            rows.append(("a", wi * HOUR + j * 1000))
    for j in range(50):
        rows.append(("a", 6 * HOUR + j * 1000))
    df = _ts(spark.createDataFrame(rows, "k string, tsm long"))
    out = {r.w_start_ms: r for r in analytics.rate_anomaly(df, "ts", "k", HOUR, trail=6, k=3).collect()}
    burst = out[6 * HOUR]
    assert burst.cnt == 50 and burst.n_trail == 6
    assert burst.is_anomaly
    # calm windows never flagged; cold-start windows (n_trail < 6) never flagged
    for w, r in out.items():
        if w != 6 * HOUR:
            assert not r.is_anomaly
    # trailing stats are exact integers: dev = n*cnt - S = 6*50 - 12
    assert burst.dev == 6 * 50 - 12
    assert burst.var_n == 6 * 24 - 12 * 12  # n*Q - S^2, Q = 6 windows * 2^2


def test_windowed_topk_rank_and_ties(spark):
    rows = [("a", 10)] * 3 + [("b", 20)] * 3 + [("c", 30)] * 2 + [("d", 40)] * 2
    df = _ts(spark.createDataFrame([(k, v) for k, v in rows], "k string, tsm long"))
    out = analytics.windowed_topk(df, "ts", "k", HOUR, k=3).collect()
    got = sorted((r.rank, r.k) for r in out)
    # counts: a=3 b=3 c=2 d=2 -> ranks: a(1), b(2), c(3); d cut at k=3
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_funnel_order_and_window(spark):
    rows = [
        # u1: full ordered funnel within window
        (1, 0, "view"), (1, 1000, "click"), (1, 2000, "buy"),
        # u2: clicked BEFORE viewing -> click doesn't count, stops at view
        (2, 5000, "view"), (2, 1000, "click"),
        # u3: full funnel but buy outside the within window
        (3, 0, "view"), (3, 1000, "click"), (3, 500_000, "buy"),
        # u4: never viewed -> absent from output
        (4, 0, "click"), (4, 1000, "buy"),
    ]
    df = spark.createDataFrame(rows, "u long, tsm long, step string").select(
        "u", F.timestamp_millis(F.col("tsm")).alias("ts"), "step"
    )
    out = {r.u: r for r in analytics.funnel(
        df, "ts", "u", "step", ("view", "click", "buy"), within_ms=100_000
    ).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].steps_reached == 3 and out[1].converted
    assert out[1].t_first_ms == 0 and out[1].t_last_ms == 2000
    assert out[2].steps_reached == 1 and not out[2].converted
    assert out[2].t_last_ms == 5000
    assert out[3].steps_reached == 3 and not out[3].converted  # outside window


def test_cohort_retention_triangle(spark):
    WEEK = 604_800_000
    rows = [
        (1, 0), (1, WEEK + 5), (1, 2 * WEEK),       # cohort w0, active w0 w1 w2
        (2, 0), (2, 2 * WEEK),                      # cohort w0, active w0 w2
        (3, WEEK), (3, WEEK + 1),                   # cohort w1, active w1 only (dedup)
    ]
    df = spark.createDataFrame(rows, "u long, tsm long").select(
        "u", F.timestamp_millis(F.col("tsm")).alias("ts")
    )
    out = {(r.cohort_ms, r.k): r.n_users for r in
           analytics.cohort_retention(df, "ts", "u", WEEK).collect()}
    assert out[(0, 0)] == 2 and out[(0, 1)] == 1 and out[(0, 2)] == 2
    assert out[(WEEK, 0)] == 1
    assert (WEEK, 1) not in out


def test_rate_anomaly_streaming_parity(spark, tmp_path):
    """Streaming realization: micro-batches upsert a (key, window) count
    store via foreachBatch (map-side partials summed into the store); the
    anomaly rule then runs over the tiny counts table.  Final result ==
    batch rate_anomaly over the whole stream."""
    HOUR = 3_600_000
    rows = []
    for wi in range(6):
        for j in range(2):
            rows.append(("a", wi * HOUR + j * 1000))
    for j in range(50):
        rows.append(("a", 6 * HOUR + j * 1000))
    df = spark.createDataFrame(rows, "k string, tsm long").select(
        "k", F.timestamp_millis(F.col("tsm")).alias("ts")
    )
    src = str(tmp_path / "src")
    df.repartition(5).write.parquet(src)
    store = str(tmp_path / "counts")
    spark.createDataFrame([], "k string, w_start_ms long, cnt long").write.parquet(store)

    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)

    def upsert(batch_df, batch_id):
        s = batch_df.sparkSession
        part = analytics.windowed_counts(batch_df, "ts", "k", HOUR)
        merged = (
            s.read.parquet(store).unionByName(part)
            .groupBy("k", "w_start_ms")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        merged.localCheckpoint().write.mode("overwrite").parquet(store)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    counts = spark.read.parquet(store)
    # the SAME public rule the batch operator applies after windowed_counts
    cols = ["k", "w_start_ms", "cnt", "is_anomaly"]
    got = analytics.rate_anomaly_over_counts(counts, "k").select(cols)
    want = analytics.rate_anomaly(df, "ts", "k", HOUR).select(cols)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # and the time-based sibling over the same incrementally-built store
    got_t = analytics.rate_anomaly_time_over_counts(counts, "k", HOUR).select(cols)
    want_t = analytics.rate_anomaly_time(df, "ts", "k", HOUR).select(cols)
    assert sorted(map(tuple, got_t.collect())) == sorted(map(tuple, want_t.collect()))


def test_analytics_over_streaming_stores_parity(spark, tmp_path):
    """funnel, cohort_retention, and windowed_topk as CONTINUOUS operations:
    one streaming query's foreachBatch incrementally maintains each
    operator's bounded sufficient-statistic store (windowed counts /
    distinct activity buckets / distinct step-time triples — state bounded
    by keys × windows, users × buckets, users × step-times, never event
    volume), and the SAME public rule applied to the store equals the batch
    operator over all raw events, across a 3-microbatch replay."""
    from pyspark_engine.runtime import normalize_event_time

    sf = "/root/testdata/sf0.001"
    ev = normalize_event_time(spark.read.parquet(f"{sf}/events.parquet"), "ts").select(
        "user_id", "event_type", "ts", "event_id"
    )
    src = str(tmp_path / "ev")
    ev.repartition(3).write.parquet(src)  # 3 files -> 3 microbatches
    ev = spark.read.parquet(src)

    DAY, WEEK = 86_400_000, 604_800_000
    steps = ("view", "click", "purchase")
    counts_store = str(tmp_path / "counts")
    act_store = str(tmp_path / "act")
    steps_store = str(tmp_path / "steps")
    spark.createDataFrame([], "event_type string, w_start_ms long, cnt long").write.parquet(counts_store)
    spark.createDataFrame(
        [], analytics.cohort_activity(ev, "ts", "user_id", WEEK).schema
    ).write.parquet(act_store)
    spark.createDataFrame(
        [], analytics.funnel_step_times(ev, "ts", "user_id", "event_type", steps).schema
    ).write.parquet(steps_store)
    sess_store = str(tmp_path / "sess")
    spark.createDataFrame(
        [], analytics.sessionize_events(ev, "ts", "user_id", "event_id").schema
    ).write.parquet(sess_store)

    def upsert(batch_df, batch_id):
        s = batch_df.sparkSession
        part = analytics.windowed_counts(batch_df, "ts", "event_type", DAY)
        (
            s.read.parquet(counts_store).unionByName(part)
            .groupBy("event_type", "w_start_ms")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint()
            .write.mode("overwrite").parquet(counts_store)
        )
        act = analytics.cohort_activity(batch_df, "ts", "user_id", WEEK)
        (
            s.read.parquet(act_store).unionByName(act).distinct()
            .localCheckpoint().write.mode("overwrite").parquet(act_store)
        )
        stp = analytics.funnel_step_times(batch_df, "ts", "user_id", "event_type", steps)
        (
            s.read.parquet(steps_store).unionByName(stp).distinct()
            .localCheckpoint().write.mode("overwrite").parquet(steps_store)
        )
        sev = analytics.sessionize_events(batch_df, "ts", "user_id", "event_id")
        (
            s.read.parquet(sess_store).unionByName(sev).distinct()
            .localCheckpoint().write.mode("overwrite").parquet(sess_store)
        )

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got_tk = analytics.windowed_topk_over_counts(
        spark.read.parquet(counts_store), "event_type", k=3
    )
    want_tk = analytics.windowed_topk(ev, "ts", "event_type", DAY, k=3)
    cols = ["event_type", "w_start_ms", "cnt", "rank"]
    assert sorted(map(tuple, got_tk.select(cols).collect())) == sorted(
        map(tuple, want_tk.select(cols).collect())
    )

    got_co = analytics.cohort_retention_over_activity(
        spark.read.parquet(act_store), "user_id", WEEK
    )
    want_co = analytics.cohort_retention(ev, "ts", "user_id", WEEK)
    cols = ["cohort_ms", "k", "n_users"]
    assert sorted(map(tuple, got_co.select(cols).collect())) == sorted(
        map(tuple, want_co.select(cols).collect())
    )

    # funnel: the SAME public operator over the store (conditional minimums
    # are insensitive to the distinct projection)
    got_fu = analytics.funnel(
        spark.read.parquet(steps_store), "ts", "user_id", "event_type", steps,
        within_ms=7 * DAY,
    )
    want_fu = analytics.funnel(ev, "ts", "user_id", "event_type", steps, within_ms=7 * DAY)
    cols = ["user_id", "steps_reached", "t_first_ms", "t_last_ms", "converted"]
    assert sorted(map(tuple, got_fu.select(cols).collect())) == sorted(
        map(tuple, want_fu.select(cols).collect())
    )

    # sessionize: the SAME public operator over the distinct-triple store
    # (event_id is unique, so the projection is lossless)
    got_se = analytics.sessionize(
        spark.read.parquet(sess_store), "ts", "user_id", "event_id", 30 * 60_000
    )
    want_se = analytics.sessionize(ev, "ts", "user_id", "event_id", 30 * 60_000)
    cols = ["user_id", "event_id", "t_ms", "session_idx", "pos"]
    assert sorted(map(tuple, got_se.select(cols).collect())) == sorted(
        map(tuple, want_se.select(cols).collect())
    )


def test_sessionize_gaps_and_positions(spark):
    MIN30 = 30 * 60_000
    rows = [
        (1, 100, 0), (1, 101, 1000), (1, 102, MIN30 + 2000),  # gap>30m between 101,102
        (2, 200, 0),
    ]
    df = spark.createDataFrame(rows, "u long, eid long, tsm long").select(
        "u", "eid", F.timestamp_millis(F.col("tsm")).alias("ts")
    )
    out = {r.eid: r for r in analytics.sessionize(df, "ts", "u", "eid", MIN30).collect()}
    assert out[100].session_idx == 1 and out[100].pos == 1
    assert out[101].session_idx == 1 and out[101].pos == 2
    assert out[102].session_idx == 2 and out[102].pos == 1
    assert out[200].session_idx == 1 and out[200].pos == 1


def test_rate_anomaly_time_gap_semantics(spark):
    """The two baseline definitions must diverge exactly where the advice
    says they do: a sparse key with a long calendar gap.  Six busy hours,
    a 13-hour silence, then one window of the SAME busy rate — row-based
    (last 6 non-empty windows) sees an unchanged rate and stays quiet;
    time-based (last 6 wall-clock slots, zeros included) correctly flags
    the resumption as a spike vs the silent recent calendar."""
    rows = []
    for wi in range(6):                      # hours 0-5: 10 events each
        for j in range(10):
            rows.append(("a", wi * HOUR + j * 1000))
    for j in range(10):                      # hour 19 after a 13-hour gap
        rows.append(("a", 19 * HOUR + j * 1000))
    df = _ts(spark.createDataFrame(rows, "k string, tsm long"))

    row_based = {r.w_start_ms: r for r in analytics.rate_anomaly(df, "ts", "k", HOUR, trail=6, k=3).collect()}
    assert not row_based[19 * HOUR].is_anomaly          # same rate as history
    time_based = {r.w_start_ms: r for r in analytics.rate_anomaly_time(df, "ts", "k", HOUR, trail=6, k=3).collect()}
    late = time_based[19 * HOUR]
    assert late.is_anomaly                              # 10 vs 6 silent slots
    assert late.dev == 6 * 10 - 0 and late.var_n == 0
    # cold start: hours 0-5 open less than 6 slots after the key's first
    # window -> never flagged even where dev > 0
    for w in range(0, 6 * HOUR, HOUR):
        assert not time_based[w].is_anomaly


def test_windowed_distinct_sketch_contract(spark):
    """HLL per (key, window): on small exact cardinalities the sketch is
    exact (sparse mode); the structural contract (window flooring, null-ts
    drop, per-window grouping) is pinned precisely."""
    rows = [("a", 10_000 + i, i % 7) for i in range(50)]          # window 0: 7 users
    rows += [("a", HOUR + 5_000 + i, 100 + (i % 3)) for i in range(9)]  # window 1: 3
    rows += [("b", 30_000, 1), ("b", None, 2)]                   # null ts dropped
    df = spark.createDataFrame(rows, "k string, tsm long, uid long").select(
        "k",
        F.when(F.col("tsm").isNotNull(), F.timestamp_millis(F.col("tsm"))).alias("ts"),
        "uid",
    )
    out = {(r.k, r.w_start_ms): r for r in analytics.windowed_distinct(df, "ts", "k", "uid", HOUR).collect()}
    assert out[("a", 0)].n_events == 50 and out[("a", 0)].ids_approx == 7
    assert out[("a", HOUR)].ids_approx == 3
    assert out[("b", 0)].n_events == 1   # the null-ts row is gone


def test_windowed_distinct_store_parity(spark, tmp_path):
    """r10 verdict item 7: the foreachBatch sufficient-statistic-store
    realization of windowed_distinct (q152), mirroring the q141/q146
    pattern — each microbatch folds its (key, window) HLL-sketch partials
    into a parquet store via hll_union_agg (state fixed-size per (key,
    window), never per event), and the finalized store must equal a ONE-
    SHOT sketch run over all events exactly (DataSketches HLL union is
    merge-deterministic); the estimates must also sit within the sketch's
    error bound of the exact distinct counts."""
    from pyspark_engine.runtime import normalize_event_time

    HOUR = 3_600_000
    sf = "/root/testdata/sf0.001"
    ev = normalize_event_time(spark.read.parquet(f"{sf}/events.parquet"), "ts").select(
        "event_type", "ts", "user_id"
    )
    src = str(tmp_path / "ev")
    ev.repartition(3).write.parquet(src)  # 3 files -> 3 microbatches
    ev = spark.read.parquet(src)

    store = str(tmp_path / "sketches")
    spark.createDataFrame(
        [], analytics.windowed_distinct_sketches(ev, "ts", "event_type", "user_id", HOUR).schema
    ).write.parquet(store)

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)

    def upsert(batch_df, batch_id):
        s = batch_df.sparkSession
        part = analytics.windowed_distinct_sketches(batch_df, "ts", "event_type", "user_id", HOUR)
        merged = analytics.merge_distinct_sketches(s.read.parquet(store), part, "event_type")
        merged.localCheckpoint().write.mode("overwrite").parquet(store)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = analytics.windowed_distinct_over_sketches(spark.read.parquet(store))
    want = analytics.windowed_distinct_over_sketches(
        analytics.windowed_distinct_sketches(ev, "ts", "event_type", "user_id", HOUR)
    )
    cols = ["event_type", "w_start_ms", "n_events", "ids_approx"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    # estimates vs exact distinct: within the lg_k=12 sketch's ~3σ bound
    exact = {
        (r["event_type"], r["w_start_ms"]): r["n"]
        for r in ev.filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            (
                (F.unix_millis("ts") - F.pmod(F.unix_millis("ts"), F.lit(HOUR)))
            ).alias("w_start_ms"),
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in got.select(cols).collect():
        n = exact[(r["event_type"], r["w_start_ms"])]
        assert abs(r["ids_approx"] - n) <= max(3, 3 * 0.03 * n), (r, n)


def test_histogram_store_parity(spark, tmp_path):
    """r10 verdict item 7 (q139's half): the histogram's per-bin counts are
    a sum-mergeable sufficient statistic, so a foreachBatch loop folding
    each microbatch's llmops.histogram partials into a (bin, n) store must
    equal the one-shot batch histogram exactly across a 3-microbatch
    replay."""
    from pyspark_engine import llmops

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_extendedprice")
    src = str(tmp_path / "li")
    li.repartition(3).write.parquet(src)
    li = spark.read.parquet(src)

    store = str(tmp_path / "hist")
    hist_schema = llmops.histogram(li, "l_extendedprice", 0.0, 100_000.0, 20).schema
    spark.createDataFrame([], hist_schema).write.parquet(store)
    stream = spark.readStream.schema(li.schema).option("maxFilesPerTrigger", 1).parquet(src)

    def upsert(batch_df, batch_id):
        s = batch_df.sparkSession
        part = llmops.histogram(batch_df, "l_extendedprice", 0.0, 100_000.0, 20)
        merged = (
            s.read.parquet(store)
            .unionByName(part)
            .groupBy("bin", "lo_edge", "hi_edge")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        merged.localCheckpoint().write.mode("overwrite").parquet(store)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    cols = ["bin", "n", "lo_edge", "hi_edge"]
    got = spark.read.parquet(store).select(cols)
    want = llmops.histogram(li, "l_extendedprice", 0.0, 100_000.0, 20).select(cols)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_windowed_distinct_streaming_parity(spark, tmp_path):
    """windowed_distinct is a plain windowed aggregation, so the SAME call
    runs under Structured Streaming (HLL registers are the native streaming
    agg state); multi-microbatch replay must equal the batch sketch exactly
    — HLL merge is deterministic, so even the approx values match."""
    from pyspark_engine.runtime import normalize_event_time
    from pyspark_engine.streaming import StreamingBuilder, run_available_now

    sf = "/root/testdata/sf0.001"
    batch_df = normalize_event_time(
        spark.read.parquet(f"{sf}/events.parquet"), "ts"
    ).select("event_type", "ts", "user_id")
    src = str(tmp_path / "ev")
    batch_df.repartition(3).write.parquet(src)  # 3 files -> 3 microbatches
    batch_df = spark.read.parquet(src)

    ks = StreamingBuilder(spark).file_stream(src, max_files_per_trigger=1)
    got = run_available_now(
        analytics.windowed_distinct(ks.df, "ts", "event_type", "user_id", HOUR),
        output_mode="complete",
    )
    want = analytics.windowed_distinct(batch_df, "ts", "event_type", "user_id", HOUR)
    cols = ["event_type", "w_start_ms", "n_events", "ids_approx"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.select(cols).toPandas().sort_values(cols[:2]).reset_index(drop=True),
        want.select(cols).toPandas().sort_values(cols[:2]).reset_index(drop=True),
    )
