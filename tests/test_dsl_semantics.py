"""Targeted semantics tests on tiny literal inputs — the analog of the
reference's pipe-records-assert-exact-output unit tests
(e.g. KStreamFilterTests.cs, KStreamBranchProcessor first-match rule,
KTableSourceProcessor null-key drop / upsert order)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pyspark_engine.dsl import KStream, StreamBuilder
from pyspark_engine.windows import JoinWindowOptions, TumblingWindowOptions


def _events(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts timestamp")


TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def sec(s):
    return TS + dt.timedelta(seconds=s)


def test_branch_first_match_wins_and_drops_no_match(spark):
    df = spark.createDataFrame([(1, 10), (2, 200), (3, 5)], "k long, v long")
    s = KStream(df, key=("k",))
    b = s.branch(F.col("v") >= 100, F.col("v") >= 10)
    # record (2,200) matches predicate 0 only (first match wins)
    assert [r.k for r in b[0].df.collect()] == [2]
    assert sorted(r.k for r in b[1].df.collect()) == [1]
    # (3,5) matches nothing -> dropped from every branch
    all_keys = {r.k for br in b for r in br.df.collect()}
    assert 3 not in all_keys


def test_to_table_latest_per_key_and_null_key_drop(spark):
    rows = [
        (1, "a", sec(1)),
        (1, "b", sec(5)),  # latest for key 1
        (2, "c", sec(3)),
        (None, "dropped", sec(9)),  # null key dropped (KTableSourceProcessor.cs:37-41)
    ]
    t = KStream(_events(spark, rows), key=("k",), ts="ts").to_table(order=("ts",))
    got = {r.k: r.v for r in t.df.collect()}
    assert got == {1: "b", 2: "c"}


def test_to_table_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10, "x", sec(1)), (1, 20, "y", sec(1))], "k long, off long, v string, ts timestamp"
    )
    t = KStream(df, key=("k",), ts="ts").to_table(order=("ts", "off"))
    assert [r.v for r in t.df.collect()] == ["y"]  # highest offset wins on ts tie


def test_grouped_aggregation_skips_null_keys(spark):
    df = spark.createDataFrame([(1, 1), (None, 1), (1, 2)], "k long, v long")
    t = KStream(df, key=("k",)).group_by_key().count("c")
    assert [(r.k, r.c) for r in t.df.collect()] == [(1, 2)]


def test_ss_join_interval_asymmetry(spark):
    """JoinWindowOptions before/after are asymmetric bounds
    (core/Stream/JoinWindowOptions.cs:8-60): right.ts in [l.ts-before, l.ts+after]."""
    left = KStream(_events(spark, [(1, "L", sec(100))]), key=("k",), ts="ts")
    right_rows = [(1, "early", sec(94)), (1, "in_before", sec(96)), (1, "in_after", sec(109)), (1, "late", sec(111))]
    right = KStream(
        spark.createDataFrame(right_rows, "rk long, rv string, rts timestamp"), key=("rk",), ts="rts"
    )
    w = JoinWindowOptions.of(0).before(5_000).after(10_000)
    j = left.join(right, w, how="inner")
    assert sorted(r.rv for r in j.df.collect()) == ["in_after", "in_before"]


def test_ss_join_output_ts_is_max(spark):
    """Join output timestamp = max(l.ts, r.ts) (KStreamKStreamJoinProcessor.cs:59-61)."""
    left = KStream(_events(spark, [(1, "L", sec(10))]), key=("k",), ts="ts")
    right = KStream(
        spark.createDataFrame([(1, "R", sec(40))], "rk long, rv string, rts timestamp"),
        key=("rk",),
        ts="rts",
    )
    j = left.join(right, JoinWindowOptions.of(60_000), how="inner")
    [row] = j.df.collect()
    assert row[j.ts] == sec(40)


def test_ss_join_drops_null_keys_even_outer(spark):
    left = KStream(
        spark.createDataFrame([(None, "L1", sec(1)), (1, "L2", sec(1))], "k long, v string, ts timestamp"),
        key=("k",),
        ts="ts",
    )
    right = KStream(
        spark.createDataFrame([(2, "R", sec(1))], "rk long, rv string, rts timestamp"), key=("rk",), ts="rts"
    )
    j = left.join(right, JoinWindowOptions.of(60_000), how="full")
    got = sorted(((r.v, r.rv) for r in j.df.collect()), key=str)
    # null-key left record dropped entirely; unmatched sides emit with nulls
    assert got == sorted([("L2", None), (None, "R")], key=str)


def test_stream_table_left_join_keeps_stream_ts(spark):
    stream = KStream(_events(spark, [(1, "s1", sec(7)), (9, "s2", sec(8))]), key=("k",), ts="ts")
    table = KStream(
        spark.createDataFrame([(1, "t1", sec(99))], "tk long, tv string, tts timestamp"),
        key=("tk",),
        ts="tts",
    ).to_table(order=("tts",))
    j = stream.join_table(table, how="left")
    got = {r.v: (r.tv, r.ts) for r in j.df.collect()}
    assert got == {"s1": ("t1", sec(7)), "s2": (None, sec(8))}


def test_table_table_outer_join_coalesced_key(spark):
    a = KStream(_events(spark, [(1, "a1", sec(1))]), key=("k",), ts="ts").to_table(order=("ts",))
    b = KStream(
        spark.createDataFrame([(2, "b2", sec(2))], "k2 long, bv string, ts2 timestamp"), key=("k2",), ts="ts2"
    ).to_table(order=("ts2",))
    j = a.join(b, how="full")
    got = sorted((r.k, r.v, r.bv) for r in j.df.collect())
    assert got == [(1, "a1", None), (2, None, "b2")]


def test_tumbling_window_grace_drops_late_records(spark):
    """Replay order makes record C late: stream-time has advanced past its
    window end + grace (KStreamWindowAggregateProcessor.cs:77-82)."""
    rows = [
        ("k", 1, sec(5)),    # arrival 1, window [0,10)
        ("k", 2, sec(125)),  # arrival 2 -> stream time 125; closes windows ending <= 115
        ("k", 3, sec(7)),    # arrival 3, window [0,10) ends at 10 < 115 -> dropped
        ("k", 4, sec(119)),  # arrival 4, window [110,120) ends 120 >= 115 -> kept
    ]
    df = spark.createDataFrame(rows, "k string, arrival long, ts timestamp")
    t = (
        KStream(df, key=("k",), ts="ts")
        .group_by_key()
        .windowed_by(
            TumblingWindowOptions.of(10_000, grace_ms=10_000),
            arrival_order=("arrival",),
            arrival_partition=F.col("k"),  # per-task stream time (required)
        )
        .count("c")
    )
    got = {(int(r.w_start.timestamp() - TS.timestamp()), r.c) for r in t.df.collect()}
    assert got == {(0, 1), (120, 1), (110, 1)}


def test_merge_unions_streams(spark):
    a = KStream(_events(spark, [(1, "a", sec(1))]), key=("k",), ts="ts")
    b = KStream(_events(spark, [(2, "b", sec(2))]), key=("k",), ts="ts")
    assert sorted(r.v for r in a.merge(b).df.collect()) == ["a", "b"]


def test_global_table_join_is_broadcast(spark):
    """The GlobalKTable analog must broadcast — assert the physical plan."""
    b = StreamBuilder(spark, data_dir="/root/testdata/sf0.001")
    cust = b.stream("customer", key="c_custkey")
    nation = b.global_table("nation", key="n_nationkey", order=("n_nationkey",))
    j = cust.join_global(nation, key_mapper=F.col("c_nationkey"))
    plan = j.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_join_picks_latest_at_or_before(spark):
    """As-of: latest right with r.ts <= l.ts (inclusive); earlier rights
    superseded; no right at/before -> null (left join)."""
    left = KStream(
        spark.createDataFrame(
            [(1, "L1", sec(10)), (1, "L2", sec(30)), (2, "L3", sec(5))],
            "k long, v string, ts timestamp",
        ),
        key=("k",),
        ts="ts",
    )
    right = KStream(
        spark.createDataFrame(
            [(1, 100.0, sec(10)), (1, 200.0, sec(20)), (2, 300.0, sec(7))],
            "k long, rv double, rts timestamp",
        ),
        key=("k",),
        ts="rts",
    )
    j = left.join_asof(right, how="left")
    got = {r.v: r.rv for r in j.df.collect()}
    # L1@10 matches right@10 (inclusive =), L2@30 matches right@20 (latest),
    # L3@5 has no right at or before -> null
    assert got == {"L1": 100.0, "L2": 200.0, "L3": None}


def test_asof_join_tolerance_and_inner(spark):
    left = KStream(
        spark.createDataFrame([(1, "L", sec(100))], "k long, v string, ts timestamp"),
        key=("k",),
        ts="ts",
    )
    right = KStream(
        spark.createDataFrame([(1, 5.0, sec(10))], "k long, rv double, rts timestamp"),
        key=("k",),
        ts="rts",
    )
    # match is 90s old; 60s tolerance voids it
    j = left.join_asof(right, tolerance_ms=60_000, how="left")
    assert [r.rv for r in j.df.collect()] == [None]
    j2 = left.join_asof(right, tolerance_ms=60_000, how="inner")
    assert j2.df.count() == 0
    j3 = left.join_asof(right, tolerance_ms=120_000, how="inner")
    assert [r.rv for r in j3.df.collect()] == [5.0]


def test_top_k_global_and_per_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 30), (3, "a", 20), (4, "b", 5)], "id long, g string, v long"
    )
    s = KStream(df, key=("id",))
    top_global = s.top_k(2, [F.col("v").desc(), F.col("id")])
    assert sorted(r.id for r in top_global.df.collect()) == [2, 3]
    top_grouped = s.top_k(1, [F.col("v").desc(), F.col("id")], by=["g"])
    assert sorted(r.id for r in top_grouped.df.collect()) == [2, 4]


def test_set_ops_distinct_semantics(spark):
    a = KStream(spark.createDataFrame([(1,), (1,), (2,)], "k long"), key=("k",))
    b = KStream(spark.createDataFrame([(2,)], "k long"), key=("k",))
    assert sorted(r.k for r in a.subtract(b).df.collect()) == [1]  # dedup + except
    assert sorted(r.k for r in a.intersect(b).df.collect()) == [2]


def test_sliding_agg_trailing_window(spark):
    rows = [(1, 1.0, sec(0)), (1, 2.0, sec(5)), (1, 4.0, sec(11)), (2, 8.0, sec(5))]
    df = spark.createDataFrame(rows, "k long, v double, ts timestamp")
    s = KStream(df, key=("k",), ts="ts").sliding_agg(10_000, c=F.count(F.lit(1)))
    got = {(r.k, r.v): r.c for r in s.df.collect()}
    # window is (ts-10s, ts]: @5 sees @0; @11 sees @5 but NOT @0 (exclusive lower bound)
    assert got == {(1, 1.0): 1, (1, 2.0): 2, (1, 4.0): 2, (2, 8.0): 1}


def test_minhash_bucket_cap_drops_hot_bucket(spark):
    from pyspark_engine import llmops

    text = "the quick brown fox jumps over the lazy dog again and again " * 8
    rows = [(i, text) for i in range(6)]  # 6 identical docs -> one hot bucket
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = llmops.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5)
    assert uncapped.count() == 15  # all C(6,2) pairs
    capped = llmops.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5, max_bucket_size=3)
    assert capped.count() == 0  # hot bucket dropped entirely


def test_suppress_is_final_state_identity(spark):
    t = KStream(_events(spark, [(1, "a", sec(1)), (1, "b", sec(2))]), key=("k",), ts="ts").to_table(
        order=("ts",)
    )
    assert t.suppress().df.collect() == t.df.collect()


def test_branch_with_default_catches_remainder(spark):
    df = spark.createDataFrame([(1, 10), (2, 200), (3, 5)], "k long, v long")
    s = KStream(df, key=("k",))
    hi, mid, rest = s.branch_with_default(F.col("v") >= 100, F.col("v") >= 10)
    assert [r.k for r in hi.df.collect()] == [2]
    assert [r.k for r in mid.df.collect()] == [1]
    assert [r.k for r in rest.df.collect()] == [3]  # no-match kept, not dropped


def test_timestamp_extractor_expression(spark):
    """ts can be an arbitrary Column expression (ITimestampExtractor analog):
    extract event time from a payload field instead of the stored column."""
    b = StreamBuilder(spark, data_dir="/root/testdata/sf0.001")
    s = b.stream(
        "events",
        key="user_id",
        ts=F.col("ts") + F.expr("INTERVAL 1 HOUR"),
        ts_alias="shifted",
    )
    assert s.ts == "shifted"
    row = s.df.select("ts", "shifted").first()
    assert (row.shifted - row.ts).total_seconds() == 3600


def test_print_sink_writes_rows(spark, capsys):
    s = KStream(spark.createDataFrame([(1, "hello-print")], "k long, v string"), key=("k",))
    s.print_(5)
    assert "hello-print" in capsys.readouterr().out


def test_foreach_terminal_side_effect(spark, tmp_path):
    s = KStream(spark.createDataFrame([(1,), (2,)], "k long"), key=("k",))
    seen = []
    s.for_each_batch(lambda df: seen.append(df.count()))
    assert seen == [2]


def test_to_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "sink")
    s = KStream(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), key=("k",))
    s.to(out)
    assert sorted(r.v for r in spark.read.parquet(out).collect()) == ["a", "b"]


def test_dynamic_destination_sink_partitions(spark, tmp_path):
    out = str(tmp_path / "dyn")
    s = KStream(spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string"), key=("k",))
    s.to_dynamic(F.concat(F.lit("t-"), F.col("v")), out)
    import os

    dests = sorted(d for d in os.listdir(out) if d.startswith("__dest="))
    assert dests == ["__dest=t-x", "__dest=t-y"]


def test_peek_observe_metric(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    s = KStream(df, key=("k",)).peek("peek_test")
    s.df.collect()
    # observation is attached without altering results
    assert s.df.count() == 2


def test_asof_join_null_right_value_does_not_mix_rows(spark):
    """A right row with a NULL value column must not inherit that column from
    an OLDER right row: all matched columns (and matched_ts) come from the
    single as-of row, carried as one struct through last(ignorenulls)."""
    left = KStream(
        spark.createDataFrame([(1, "L", sec(30))], "k long, v string, ts timestamp"),
        key=("k",),
        ts="ts",
    )
    right = KStream(
        spark.createDataFrame(
            [(1, 100.0, "old", sec(10)), (1, None, "new", sec(20))],
            "k long, rv double, tag string, rts timestamp",
        ),
        key=("k",),
        ts="rts",
    )
    j = left.join_asof(right, how="left")
    row = j.df.collect()[0]
    # the as-of match is the @20 row: rv must be NULL (not 100.0 from @10)
    assert row.tag == "new" and row.rv is None
    assert row.matched_ts == sec(20)


def test_branch_with_default_zero_predicates_returns_whole_stream(spark):
    df = spark.createDataFrame([(1, 10), (2, 200)], "k long, v long")
    (only,) = KStream(df, key=("k",)).branch_with_default()
    assert sorted(r.k for r in only.df.collect()) == [1, 2]


def test_batch_grace_requires_arrival_partition(spark):
    """Per-task stream time needs a declared partition in batch replay; a
    silent global fallback would funnel the stream through one task."""
    df = spark.createDataFrame([("k", 1, sec(5))], "k string, arrival long, ts timestamp")
    twk = (
        KStream(df, key=("k",), ts="ts")
        .group_by_key()
        .windowed_by(TumblingWindowOptions.of(10_000, grace_ms=10_000), arrival_order=("arrival",))
    )
    import pytest

    with pytest.raises(ValueError, match="arrival_partition"):
        twk.count("c").df.collect()


def test_split_named_branches(spark):
    """KStream.split(): named first-match-wins branches + named default
    (Kafka Streams 2.8 split/Branched surface; positional branch is the
    reference snapshot's API)."""
    df = spark.createDataFrame([(1, 10), (2, 200), (3, 5)], "k long, v long")
    out = (
        KStream(df, key=("k",))
        .split("t-")
        .branch(F.col("v") >= 100, "big")
        .branch(F.col("v") >= 10, "mid")
        .default_branch("rest")
    )
    assert sorted(out) == ["t-big", "t-mid", "t-rest"]
    assert [r.k for r in out["t-big"].df.collect()] == [2]
    assert [r.k for r in out["t-mid"].df.collect()] == [1]
    assert [r.k for r in out["t-rest"].df.collect()] == [3]
    dropped = KStream(df, key=("k",)).split().branch(F.col("v") >= 100, "big").no_default_branch()
    assert sorted(dropped) == ["big"]
    assert {r.k for r in dropped["big"].df.collect()} == {2}


def test_salted_join_equals_plain_join(spark):
    """join_table_salted must produce exactly join_table's result set (inner
    and left, including unmatched-left nulls) — salting only changes the
    physical key distribution."""
    from pyspark_engine.dsl import KTable

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (9, "e")], "k long, v string"
    )  # key 1 is the hot key; 9 has no match
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (3, "Z")], "k2 long, w string")
    s = KStream(left, key=("k",))
    t = KTable(right, key=("k2",))
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.w) for r in s.join_table_salted(t, n_salt=4, how=how).df.collect()
        )
        want = sorted((r.k, r.v, r.w) for r in s.join_table(t, how=how).df.collect())
        assert got == want, how


def test_cogroup_disjoint_keys_fill_and_shared(spark):
    a = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k long, x long")
    b = spark.createDataFrame([(2, 100), (3, 7)], "k2 long, y long")
    ga = KStream(a, key=("k",)).group_by_key()
    gb = KStream(b, key=("k2",)).group_by_key()
    out = (
        ga.cogroup(a_cnt=F.count(F.lit(1)), a_sum=F.sum("x"))
        .cogroup(gb, b_cnt=F.count(F.lit(1)), b_max=F.max("y"))
        .aggregate(fill={"a_cnt": 0, "b_cnt": 0})
    )
    rows = {r.k: r for r in out.df.collect()}
    # key renamed to the first stream's name; all three keys present
    assert set(rows) == {1, 2, 3}
    assert (rows[1].a_cnt, rows[1].a_sum, rows[1].b_cnt, rows[1].b_max) == (2, 30, 0, None)
    assert (rows[2].a_cnt, rows[2].a_sum, rows[2].b_cnt, rows[2].b_max) == (1, 5, 1, 100)
    assert (rows[3].a_cnt, rows[3].a_sum, rows[3].b_cnt, rows[3].b_max) == (0, None, 1, 7)


def test_cogroup_rejects_duplicate_names_and_key_arity(spark):
    import pytest as _pytest

    a = spark.createDataFrame([(1, 10)], "k long, x long")
    b = spark.createDataFrame([(1, 2, 3)], "k long, k2 long, y long")
    ga = KStream(a, key=("k",)).group_by_key()
    with _pytest.raises(ValueError, match="duplicate aggregate column"):
        ga.cogroup(n=F.count(F.lit(1))).cogroup(
            KStream(a, key=("k",)).group_by_key(), n=F.sum("x")
        ).aggregate()
    with _pytest.raises(ValueError, match="key arity"):
        ga.cogroup(n=F.count(F.lit(1))).cogroup(
            KStream(b, key=("k", "k2")).group_by_key(), m=F.sum("y")
        )


def test_stitch_cogrouped_permuted_and_overlapping_keys(spark):
    """stitch_cogrouped aligns a side's key POSITIONALLY even when its key
    names permute the target key — the sequential-rename implementation
    corrupted this case (renaming b→a duplicates an existing column, then
    a→b hits both); the single aliased select must map (b,a)→(a,b) without
    touching the other side's values."""
    import pytest as _pytest

    from pyspark_engine.dsl import stitch_cogrouped

    t1 = spark.createDataFrame([(1, 2, 10)], "a long, b long, x long")
    # t2's key is named (b, a) but POSITIONALLY means (a, b): row (1, 2, 99)
    t2 = spark.createDataFrame([(1, 2, 99)], "b long, a long, y long")
    out = stitch_cogrouped([(t1, ("a", "b")), (t2, ("b", "a"))], ("a", "b"))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.b, r.x, r.y) == (1, 2, 10, 99)
    # arity mismatch fails fast instead of zip-truncating the key
    with _pytest.raises(ValueError, match="arity"):
        stitch_cogrouped([(t1, ("a", "b")), (t2, ("b",))], ("a", "b"))
    # a NON-key column colliding with the target key is rejected, not shadowed
    t3 = spark.createDataFrame([(3, 4, 7)], "c long, b long, z long")
    with _pytest.raises(ValueError, match="collide"):
        stitch_cogrouped([(t1, ("a", "b")), (t3, ("c", "z"))], ("a", "b"))


def test_describe_topology(spark, sf_dir):
    """Topology.Describe analog (ITopologyDescription): the plan description
    exposes source nodes (scans), processors, and the exchange boundaries
    that play the reference's sub-topology/repartition-topic role."""
    from pyspark_engine import StreamBuilder
    from pyspark.sql import functions as F

    b = StreamBuilder(spark, sf_dir)
    ks = b.stream("events", key="user_id", ts="ts").filter(F.col("value") > 10)
    d = ks.describe()
    assert "Scan parquet" in d and "PushedFilters" in d
    t = ks.group_by_key().count()
    dt = t.describe()
    assert "Exchange" in dt or "AdaptiveSparkPlan" in dt  # the sub-topology split
    assert "Scan parquet" in t.describe(mode="simple")


# ---------------- versioned stream-table temporal join ----------------


def test_versioned_join_planted(spark):
    """join_table_asof picks the latest version with v.ts <= record.ts
    (inclusive), per key; left rows with no version get nulls; inner drops
    them; tolerance nulls out versions older than the bound."""
    chg = spark.createDataFrame(
        [(1, sec(10), "v1"), (1, sec(20), "v2"), (2, sec(15), "w1")],
        "k long, ts timestamp, val string",
    )
    strm = spark.createDataFrame(
        [(100, 1, sec(5)), (101, 1, sec(10)), (102, 1, sec(25)), (103, 2, sec(14))],
        "ev long, k long, ts timestamp",
    )
    b = StreamBuilder(spark)
    vt = b.versioned_table(chg, key="k", ts="ts")
    s = KStream(strm, ("k",), "ts")
    got = {r.ev: r.val for r in s.join_table_asof(vt, how="left").df.collect()}
    assert got == {100: None, 101: "v1", 102: "v2", 103: None}
    inner = {r.ev for r in s.join_table_asof(vt, how="inner").df.collect()}
    assert inner == {101, 102}
    # tolerance: ev 102 (ts=25) vs v2 (ts=20) survives 5s+, dies under 5s
    tol = {r.ev: r.val for r in s.join_table_asof(vt, how="left", tolerance_ms=4_000).df.collect()}
    assert tol[102] is None and tol[101] == "v1"


def test_versioned_join_matches_record_replay(spark, sf_dir):
    """Parity with the reference's per-record lookup semantics
    (KStreamKTableJoinProcessor.cs:38-43): replay stream + changelog in
    event-time order through a dict-state reference implementation (table
    updated record-at-a-time, each stream record reading current state —
    exactly what the processor does when arrival order equals event-time
    order) and require join_table_asof to produce the identical enrichment."""
    from pyspark_engine.runtime import read_table

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    # reference replay: merge both feeds, sort by (ts, table-first, event_id)
    feed = sorted(
        [(r.ts, 0, r.event_id, r.user_id, r.value) for r in purchases.collect()]
        + [(r.ts, 1, r.event_id, r.user_id, None) for r in clicks.collect()]
    )
    state, want = {}, {}
    for ts, side, eid, uid, val in feed:
        if side == 0:
            state[uid] = (val, ts)  # last-writer-wins upsert (offset order = event_id)
        else:
            want[eid] = state.get(uid, (None, None))[0]
    b = StreamBuilder(spark)
    vt = b.versioned_table(
        purchases.withColumnRenamed("event_id", "p_id"),
        key="user_id",
        ts="ts",
        order=("p_id",),  # same last-writer-wins tie rule as the replay
    )
    s = KStream(clicks, ("user_id",), "ts").map_values(c_id=F.col("event_id"))
    got = {r.c_id: r.value for r in s.join_table_asof(vt, how="left").df.collect()}
    assert got == want


def test_sketch_aggregates_error_bounds(spark, sf_dir):
    """The raw-sketch contract BEHIND q105's bound-check oracle: HLL++
    distinct counts within the configured rsd of exact, and high-accuracy
    GK percentiles equal to an actual element no further than a rank
    tolerance from the exact order statistic — tighter numeric assertions
    than the boolean contract columns the driver hashes."""
    import __spark_entry__ as entry
    from pyspark_engine.runtime import read_table

    ev = read_table(spark, sf_dir, "events")
    sk = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("users_hll"),
            F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(10000)).alias("p50_value"),
            F.percentile_approx(F.col("value"), F.lit(0.99), F.lit(10000)).alias("p99_value"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(sk) == set(exact)
    for et, row in sk.items():
        ex = exact[et]
        assert abs(row.users_hll - ex.users) <= max(3, 0.06 * ex.users)  # 3×rsd
        # GK with accuracy 10000 >> n is exact-rank on this data; allow the
        # discrete-vs-interpolated convention gap around the true quantile
        assert abs(row.p50_value - ex.p50) <= 0.05 * (abs(ex.p50) + 1)
        assert row.p99_value <= ev.filter(F.col("event_type") == et).agg(F.max("value")).collect()[0][0]
    # and the driver-gated contract query itself must report all-green
    q = {r.event_type: r for r in entry.queries()["q105_sketch_stats"](spark, sf_dir).collect()}
    assert all(r.users_ok and r.p50_ok and r.p99_ok for r in q.values())


def test_stream_builder_csv_json_sources(spark, tmp_path):
    """Extension-dispatched file sources (the reference's unshipped external
    source connector roadmap item): the same topology runs over CSV, JSON
    lines, and parquet copies of one dataset with identical results."""
    df = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "k long, v string, x double")
    p_csv, p_json, p_parq = str(tmp_path / "d.csv"), str(tmp_path / "d.jsonl"), str(tmp_path / "d.parquet")
    df.coalesce(1).write.option("header", "true").csv(p_csv)
    df.coalesce(1).write.json(p_json)
    df.write.parquet(p_parq)
    b = StreamBuilder(spark)

    def run(path):
        ks = b.stream(path, key="k").filter(F.col("x") > 15)
        return sorted((r.k, r.v, r.x) for r in ks.df.select("k", "v", "x").collect())

    want = [(2, "b", 20.0)]
    assert run(p_csv) == want
    assert run(p_json) == want
    assert run(p_parq) == want


def test_join_null_value_rows_kept(spark):
    """Pins the documented semantics delta vs the reference: the reference
    drops null-VALUE records too (KStreamKStreamJoinProcessor.cs:42-46,
    KStreamKTableJoinProcessor.cs:31-35 — a Kafka value is one opaque
    object); here the value is a multi-column projection, so rows whose
    non-key columns are null still participate — only null KEYS drop."""
    left = KStream(
        spark.createDataFrame(
            [(1, None, sec(1)), (2, "L2", sec(1))], "k long, v string, ts timestamp"
        ),
        key=("k",),
        ts="ts",
    )
    right = KStream(
        spark.createDataFrame(
            [(1, "R1", sec(1)), (2, None, sec(1))], "rk long, rv string, rts timestamp"
        ),
        key=("rk",),
        ts="rts",
    )
    j = left.join(right, JoinWindowOptions.of(60_000), how="inner")
    got = sorted(((r.k, r.v, r.rv) for r in j.df.collect()), key=str)
    # both null-payload rows joined: (1, null value) x (1, "R1"), (2,"L2") x (2, null)
    assert got == sorted([(1, None, "R1"), (2, "L2", None)], key=str)

    table = KStream(
        spark.createDataFrame([(1, None, sec(9))], "tk long, tv string, tts timestamp"),
        key=("tk",),
        ts="tts",
    ).to_table(order=("tts",))
    st = KStream(
        spark.createDataFrame([(1, None, sec(2))], "k long, v string, ts timestamp"),
        key=("k",),
        ts="ts",
    ).join_table(table, how="inner")
    assert [(r.k, r.v, r.tv) for r in st.df.collect()] == [(1, None, None)]


def test_stream_metadata_accessors(spark):
    """StreamizMetadata analog (core/StreamizMetadata.cs:33-130): ambient
    per-record metadata as Column accessors over the include_meta columns —
    real values when the source follows metadata, TYPED NULLS (the
    reference's null-when-not-following contract) when it doesn't, with
    the topology still buildable either way."""
    import datetime as dt

    from pyspark_engine import serdes

    raw = spark.createDataFrame(
        [
            (
                b"7",
                b'{"v": 1.5}',
                dt.datetime(2024, 1, 1, 12, 0, 0),
                "clicks",
                3,
                42,
            )
        ],
        "key binary, value binary, timestamp timestamp, topic string, partition int, offset long",
    )
    df = serdes.decode_kafka(raw, "v double", key_type="bigint", include_meta=True)
    ks = KStream(df, ("key",), "ts")
    m = ks.metadata()
    assert m.is_following()
    [r] = ks.map_values(
        v=F.col("v"),
        top=m.current_topic(),
        part=m.current_partition(),
        off=m.current_offset(),
        ts_ms=m.current_timestamp_ms(),
        hdrs=m.current_headers(),
    ).df.collect()
    assert (r.top, r.part, r.off) == ("clicks", 3, 42)
    assert r.ts_ms == int(dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert r.hdrs is None  # headers not followed -> typed null

    bare = KStream(spark.createDataFrame([("a", 1)], "key string, v int"), ("key",), None)
    m2 = bare.metadata()
    assert not m2.is_following()
    [r2] = bare.map_values(
        v=F.col("v"), part=m2.current_partition(), ts_ms=m2.current_timestamp_ms()
    ).df.collect()
    assert r2.part is None and r2.ts_ms is None


def test_aggregate_cube_all_grouping_sets(spark):
    """aggregate_cube emits every grouping-set combination (GROUP BY CUBE —
    §2.3 extension, the CUBE sibling of aggregate_rollup): (a,b), (a,·),
    (·,b), (·,·), subtotal slots carried as NULL."""
    df = spark.createDataFrame(
        [("x", 1, 10), ("x", 2, 20), ("y", 1, 30)], "a string, b long, v long"
    )
    s = KStream(df, key=("a",))
    out = s.aggregate_cube(["a", "b"], total=F.sum("v"), cnt=F.count(F.lit(1)))
    got = {(r.a, r.b): (r.total, r.cnt) for r in out.df.collect()}
    assert got == {
        ("x", 1): (10, 1),
        ("x", 2): (20, 1),
        ("y", 1): (30, 1),
        ("x", None): (30, 2),
        ("y", None): (30, 1),
        (None, 1): (40, 2),
        (None, 2): (20, 1),
        (None, None): (60, 3),
    }


def test_versioned_retain_snapshot_history(spark):
    """VersionedKTable lifecycle: retain prunes versions older than
    history_ms relative to ``now`` (the KIP-914 historyRetention analog),
    history() exposes the surviving changelog, snapshot() collapses to the
    ordinary latest-per-key KTable."""
    chg = spark.createDataFrame(
        [
            (1, sec(0), "v1"),
            (1, sec(100), "v2"),
            (1, sec(200), "v3"),
            (2, sec(0), "w1"),
        ],
        "k long, ts timestamp, val string",
    )
    b = StreamBuilder(spark)
    vt = b.versioned_table(chg, key="k", ts="ts")
    kept = vt.retain(150_000, F.lit(sec(200)))
    # history(): key 1 keeps ts in {100, 200} (0 aged out); key 2 fully aged
    hist = sorted((r.k, r.val) for r in kept.history().df.collect())
    assert hist == [(1, "v2"), (1, "v3")]
    # snapshot(): latest surviving version per key
    snap = {r.k: r.val for r in kept.snapshot().df.collect()}
    assert snap == {1: "v3"}
    # without retain, snapshot sees every key
    full = {r.k: r.val for r in vt.snapshot().df.collect()}
    assert full == {1: "v3", 2: "w1"}


def test_tt_join_shared_lineage_self_join(spark):
    """KTable⋈KTable where both sides derive from the SAME changelog
    (snapshot ⋈ per-key history counts) — regression for the ambiguous
    self-join rejection fixed by alias-qualified column references in
    KTable.join."""
    chg = spark.createDataFrame(
        [(1, sec(0), "v1"), (1, sec(100), "v2"), (2, sec(50), "w1")],
        "k long, ts timestamp, val string",
    )
    b = StreamBuilder(spark)
    vt = b.versioned_table(chg, key="k", ts="ts")
    snap = vt.snapshot()
    counts = vt.history().group_by_key().count("n")
    j = snap.join(counts, how="inner")
    got = {r.k: (r.val, r.n) for r in j.df.collect()}
    assert got == {1: ("v2", 2), 2: ("w1", 1)}


def test_fk_join_shared_lineage_self_join(spark):
    """KTable.join_fk where both tables derive from the same source (an
    org table fk-joined to itself: employee -> manager) — regression for
    the ambiguous self-join rejection, same alias-qualified fix as
    KTable.join."""
    df = spark.createDataFrame(
        [(1, None, "ceo"), (2, 1, "dev"), (3, 1, "ops")],
        "emp long, mgr long, role string",
    )
    t = KStream(
        df.withColumn("ts", F.lit(sec(0))), ("emp",), "ts"
    ).to_table(order=("emp",))
    mgr = t.map_values(mgr_role=F.col("role"))
    j = t.join_fk(mgr, "mgr", how="left")
    got = {r.emp: r.mgr_role for r in j.df.collect()}
    assert got == {1: None, 2: "ceo", 3: "ceo"}

    # r11 verdict task 5: a Column-valued fk built as an UNQUALIFIED
    # reference while both sides carry "mgr" must WORK (join_fk resolves the
    # expression against the left table ALONE before the join), not hit an
    # error path
    j2 = t.join_fk(mgr, F.col("mgr"), how="left")
    got2 = {r.emp: r.mgr_role for r in j2.df.collect()}
    assert got2 == {1: None, 2: "ceo", 3: "ceo"}

    # the harder lineage: BOTH sides derived from the same AGGREGATE (the
    # case the plain alias fix could not cover — project-engine memory
    # "selfjoin-lineage"); an expression fk (arithmetic over an unqualified
    # ref) must also bind left
    agg = t.group_by(g=F.col("mgr")).count(alias="n")  # keyed by g
    left2 = agg.map_values(gv=F.col("n"))
    right2 = agg.map_values(rn=F.col("n") * 10)
    jj = left2.join_fk(right2, F.col("g"), how="left")
    got3 = {r.g: r.rn for r in jj.df.collect()}
    # null mgr group is dropped by table group_by (KS null-key rule), so the
    # only group is g=1 (emps 2,3) joining itself: n=2 -> rn=20
    assert got3 == {1: 20}


def test_ss_join_shared_lineage_self_join(spark):
    """KStream⋈KStream interval join where both legs fan out of the SAME
    aggregate — regression for the ambiguous self-join rejection, same
    alias-qualified fix as KTable.join."""
    df = spark.createDataFrame(
        [(1, sec(0), 10.0), (1, sec(5), 20.0), (2, sec(3), 30.0)],
        "k long, ts timestamp, v double",
    )
    agg = (
        KStream(df, ("k",), "ts")
        .group_by_key()
        .aggregate(total=F.sum("v"), last_ts=F.max("ts"))
        .to_stream()
    )
    s1 = KStream(
        agg.df.select("k", F.col("last_ts").alias("ts1"), F.col("total").alias("a_total")),
        ("k",),
        "ts1",
    )
    s2 = KStream(
        agg.df.select("k", F.col("last_ts").alias("ts2"), F.col("total").alias("b_total")),
        ("k",),
        "ts2",
    )
    rows = s1.join(s2, JoinWindowOptions.of(10_000), "inner").df.collect()
    assert sorted((r.k, r.a_total, r.b_total) for r in rows) == [
        (1, 30.0, 30.0),
        (2, 30.0, 30.0),
    ]
