"""Property-based differential tests: random tiny inputs, engine result
compared against an independent pandas implementation of the same semantics
(pandas.merge_asof for as-of joins, groupby idxmax for upserts, per-row scan
for sliding windows).  Bounded example counts keep the Spark round-trips
cheap."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_engine.dsl import KStream

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=int(s))


rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(-100, 100)),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@given(left=rows_strategy, right=rows_strategy)
@SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # unique (key, ts) on the right so the as-of pick is well-defined
    rseen = {}
    for k, s, v in right:
        rseen[(k, s)] = v
    rrows = [(k, _ts(s), float(v)) for (k, s), v in rseen.items()]
    lrows = [(k, _ts(s), i) for i, (k, s, _v) in enumerate(left)]
    ldf = KStream(
        spark.createDataFrame(lrows, "k long, ts timestamp, l_id long"), key=("k",), ts="ts"
    )
    rdf = KStream(
        spark.createDataFrame(rrows, "k long, ts timestamp, rv double"), key=("k",), ts="ts"
    )
    got = (
        ldf.join_asof(rdf, how="left")
        .df.select("l_id", "rv")
        .toPandas()
        .sort_values("l_id")
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(lrows, columns=["k", "ts", "l_id"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts", kind="stable")
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        .sort_values("l_id")
        .reset_index(drop=True)[["l_id", "rv"]]
    )
    pd.testing.assert_frame_equal(got, want)


@given(left=rows_strategy, right=rows_strategy)
@SETTINGS
def test_interval_join_matches_direct_product_filter(spark, left, right):
    """Windowed stream-stream inner join vs brute-force pairs-in-interval."""
    from pyspark_engine import JoinWindowOptions

    before_ms, after_ms = 20_000, 40_000
    lrows = [(k, _ts(s), i) for i, (k, s, _v) in enumerate(left)]
    rrows = [(k, _ts(s), i) for i, (k, s, _v) in enumerate(right)]
    l = KStream(spark.createDataFrame(lrows, "k long, ts timestamp, l_id long"), key=("k",), ts="ts")
    r = KStream(
        spark.createDataFrame(rrows, "rk long, rts timestamp, r_id long"), key=("rk",), ts="rts"
    )
    j = l.join(r, JoinWindowOptions(before_ms=before_ms, after_ms=after_ms), how="inner")
    got = {(row.l_id, row.r_id) for row in j.df.collect()}
    want = {
        (li, ri)
        for lk, lts, li in lrows
        for rk, rts, ri in rrows
        if lk == rk
        and rts >= lts - dt.timedelta(milliseconds=before_ms)
        and rts <= lts + dt.timedelta(milliseconds=after_ms)
    }
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_to_table_matches_pandas_last_per_key(spark, rows):
    data = [(k, _ts(s), i) for i, (k, s, _v) in enumerate(rows)]
    t = KStream(
        spark.createDataFrame(data, "k long, ts timestamp, seq long"), key=("k",), ts="ts"
    ).to_table(order=("ts", "seq"))
    got = {r.k: r.seq for r in t.df.collect()}
    pdf = pd.DataFrame(data, columns=["k", "ts", "seq"]).sort_values(["ts", "seq"], kind="stable")
    want = pdf.drop_duplicates("k", keep="last").set_index("k")["seq"].to_dict()
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_session_windows_match_gap_islands(spark, rows):
    """Session windows vs a direct gap-island computation: sessions break
    only when the gap to the previous event EXCEEDS the session gap (Spark
    merges events exactly gap apart — inclusive boundary)."""
    from pyspark_engine import SessionWindowOptions

    gap_s = 30
    data = [(k, _ts(s)) for k, s, _v in rows]
    t = (
        KStream(spark.createDataFrame(data, "k long, ts timestamp"), key=("k",), ts="ts")
        .group_by_key()
        .windowed_by(SessionWindowOptions.of(gap_s * 1000))
        .count("c")
    )
    got = {(r.k, r.w_start, r.w_end): r.c for r in t.df.collect()}
    want = {}
    by_key: dict[int, list] = {}
    for k, ts in sorted(data, key=lambda x: (x[0], x[1])):
        by_key.setdefault(k, []).append(ts)
    for k, stamps in by_key.items():
        start, last, n = stamps[0], stamps[0], 1
        for ts in stamps[1:]:
            if (ts - last).total_seconds() > gap_s:
                want[(k, start, last + dt.timedelta(seconds=gap_s))] = n
                start, n = ts, 0
            n += 1
            last = ts
        want[(k, start, last + dt.timedelta(seconds=gap_s))] = n
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_sliding_agg_matches_pandas_scan(spark, rows):
    size_ms = 60_000
    data = [(k, _ts(s), float(v), i) for i, (k, s, v) in enumerate(rows)]
    s = KStream(
        spark.createDataFrame(data, "k long, ts timestamp, v double, i long"), key=("k",), ts="ts"
    ).sliding_agg(size_ms, c=F.count(F.lit(1)))
    got = {r.i: r.c for r in s.df.collect()}
    want = {}
    for k, ts, _v, i in data:
        lo = ts - dt.timedelta(milliseconds=size_ms)
        want[i] = sum(1 for k2, ts2, _v2, _i2 in data if k2 == k and lo < ts2 <= ts)
    assert got == want


docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=5),
    min_size=1,
    max_size=10,
)


@given(docs=docs_strategy)
@SETTINGS
def test_paragraph_dedup_matches_reference_fold(spark, docs):
    """paragraph_dedup == a sequential first-occurrence fold over
    (doc_id, pos) order: every distinct paragraph survives exactly once,
    in its earliest position; documents reassemble from survivors only."""
    from pyspark_engine import llmops

    rows = [(i, "\n".join(paras)) for i, paras in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept)
        for r in llmops.paragraph_dedup(df, "doc_id", "text").collect()
    }

    seen: set[str] = set()
    want = {}
    for i, paras in enumerate(docs):
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        if kept:
            want[i] = ("\n".join(kept), len(kept))
    assert got == want


window_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100_000)),  # (key, ts_ms)
    min_size=1,
    max_size=20,
)


@given(rows=window_rows, size_s=st.integers(2, 20), adv_s=st.integers(1, 20))
@SETTINGS
def test_hopping_membership_matches_reference_windows_for(spark, rows, size_s, adv_s):
    """Spark's hopping assignment == the reference's WindowsFor rule
    (core/Stream/TimeWindowOptions.cs:59): a record at ts belongs to every
    window whose start lies in (ts - size, ts], starts aligned to the
    advance from epoch 0.  Verified per (key, window_start) count against a
    direct Python implementation of that rule, including advance == size
    (tumbling degenerate) and non-divisor advances.

    One deliberate divergence at the 1970 epoch boundary: Kafka Streams
    clamps window starts at 0 (no pre-epoch windows), while Spark's
    F.window applies the membership rule unclamped, so a record in the
    first ``size`` ms after epoch also lands in windows with negative
    starts.  The unclamped rule is what windows.py documents; real
    event-time data never sits at 1970, so the clamp is unobservable in
    practice — the reference implementation here is unclamped to pin the
    actual engine semantics."""
    from pyspark_engine import HoppingWindowOptions
    from pyspark_engine.runtime import epoch_ms

    size_ms, adv_ms = size_s * 1000, min(adv_s, size_s) * 1000
    df = spark.createDataFrame(rows, "k long, tsm long").select(
        "k", F.timestamp_millis(F.col("tsm")).alias("ts")
    )
    w = HoppingWindowOptions.of(size_ms, adv_ms)
    got = {
        (r.k, r.ws): r.cnt
        for r in (
            KStream(df, key=("k",), ts="ts")
            .group_by_key()
            .windowed_by(w)
            .count()
            .df.select("k", epoch_ms(F.col("w_start")).alias("ws"), "cnt")
            .collect()
        )
    }

    def windows_for(ts):  # the reference rule, aligned to the advance
        start = (ts // adv_ms) * adv_ms
        out = []
        while start > ts - size_ms:
            out.append(start)  # unclamped: see docstring on the 1970 boundary
            start -= adv_ms
        return out

    want: dict = {}
    for k, ts in rows:
        for s in windows_for(ts):
            want[(k, s)] = want.get((k, s), 0) + 1
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),      # key
            st.integers(0, 100),    # ts seconds (windows of 10s -> boundary-rich)
            st.integers(0, 1),      # arrival partition (the per-task axis)
        ),
        min_size=1,
        max_size=30,
    ),
    grace_s=st.integers(0, 25),
)
@SETTINGS
def test_windowed_grace_matches_reference_processor(spark, rows, grace_s):
    """Differential: our BATCH grace emulation (arrival-ordered stream-time
    replay) against a pure-Python reimplementation of the reference's
    KStreamWindowAggregateProcessor.cs:51-58 — observedStreamTime is a
    per-task running max, closeTime = streamTime − grace, and a record's
    window is admitted iff windowEnd > closeTime STRICTLY.  Random
    boundary-rich inputs (10s windows, second-granularity timestamps, two
    arrival partitions) pin the inequality direction and the per-partition
    stream-time scoping; grace_s=0 degenerates to drop-all-but-window-max
    behavior on out-of-order input, the harshest case."""
    from pyspark_engine import TumblingWindowOptions

    size_ms = 10_000
    grace_ms = grace_s * 1000
    # arrival order = list position within each partition (the offset analog)
    data = [
        (k, _ts(s), part, seq) for seq, (k, s, part) in enumerate(rows)
    ]
    ks = KStream(
        spark.createDataFrame(data, "k long, ts timestamp, part long, seq long"),
        key=("k",),
        ts="ts",
    )
    got = {
        (r.k, r.w_start, r.cnt)
        for r in ks.group_by_key()
        .windowed_by(
            TumblingWindowOptions.of(size_ms, grace_ms=grace_ms),
            arrival_order=(F.col("seq"),),
            arrival_partition=F.col("part"),
        )
        .count()
        .df.collect()
    }

    # reference-processor simulation: per-partition replay in offset order
    stream_time: dict[int, int] = {}
    counts: dict[tuple, int] = {}
    for k, ts, part, _seq in data:
        t_ms = int(ts.timestamp() * 1000)
        stream_time[part] = max(stream_time.get(part, -10**18), t_ms)
        close = stream_time[part] - grace_ms
        w_start = (t_ms // size_ms) * size_ms
        w_end = w_start + size_ms
        if w_end > close:  # KStreamWindowAggregateProcessor.cs:58 STRICT
            counts[(k, w_start)] = counts.get((k, w_start), 0) + 1
    want = {
        (k, dt.datetime.fromtimestamp(ws / 1000), c)
        for (k, ws), c in counts.items()
    }
    assert got == want
