"""Plan-regression tests: the scale properties the engine is designed around
must be visible in the physical plan, not just claimed in docstrings —
pushdown, pruning, broadcast for the replicated-dim join, partial (map-side)
aggregation, and top-k without a full sort.  A refactor that silently loses
one of these is a perf bug even while results stay correct."""

from __future__ import annotations

import __spark_entry__ as entry
from pyspark.sql import functions as F

from pyspark_engine.dsl import KStream, StreamBuilder

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_and_pruning(spark):
    df = entry.queries()["q01_pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: the 16-column lineitem scan must read only what q01 uses
    scan = next(l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l)
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_q01_partial_aggregation_before_exchange(spark):
    df = entry.queries()["q01_pricing_summary"](spark, SF)
    plan = _plan(df)
    # map-side combine: partial_sum below the shuffle
    assert "partial_sum" in plan


def test_global_join_broadcasts_not_shuffles_fact(spark):
    df = entry.queries()["q34_global_join_inner"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the fact side (customer) must not hash-exchange for this join
    fact_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning(c_" not in fact_side


def test_global_topn_uses_take_ordered(spark):
    df = entry.queries()["q55_global_topn"](spark, SF)
    assert "TakeOrderedAndProject" in _plan(df)


def test_stateless_chain_is_single_stage(spark):
    """Filters/projections must not introduce a shuffle."""
    b = StreamBuilder(spark, data_dir=SF)
    s = (
        b.stream("events", key="user_id", ts="ts")
        .filter(F.col("value") > 10)
        .with_values(v2=F.col("value") * 2)
        .select_key(F.col("event_type"), "etype")
    )
    assert "Exchange" not in _plan(s.df)


def test_to_table_is_single_shuffle_hash_agg(spark):
    b = StreamBuilder(spark, data_dir=SF)
    t = b.stream("events", key="user_id", ts="ts").to_table(order=("ts", "event_id"))
    plan = _plan(t.df)
    assert plan.count("Exchange hashpartitioning") == 1
    # the point of max_by over row_number: partial aggregation BEFORE the
    # exchange, so one pre-reduced row per key per map task crosses the wire
    # (max_by(struct) lowers to SortAggregate — local sorts are fine; a
    # row_number window would shuffle every raw row instead)
    map_side = plan.split("Exchange hashpartitioning")[1]  # children print below
    assert "partial_max_by" in map_side


def test_transform_py_roundtrip(spark):
    def double_rows(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["v2"] = pdf["value"] * 2
            yield pdf[["event_id", "v2"]]

    b = StreamBuilder(spark, data_dir=SF)
    s = b.stream("events", key="user_id", ts="ts").transform_py(
        double_rows, "event_id long, v2 double", key="event_id"
    )
    row = s.df.orderBy("event_id").first()
    base = b.stream("events", key="user_id").df.orderBy("event_id").first()
    assert row.v2 == base.value * 2


def test_batch_grace_has_no_single_partition_exchange(spark):
    """The grace stream-time window must partition by the declared arrival
    partition — never Exchange SinglePartition (the 100 TB stall)."""
    df = entry.queries()["q28_window_grace"](spark, SF)
    assert "Exchange SinglePartition" not in _plan(df)


def test_versioned_join_two_exchanges_and_pruning(spark):
    """q102 (join_table_asof): exactly TWO exchanges — the map-side-combined
    (key, ts) version dedup and the single key-partitioned window pass.  A
    regression to a join-then-filter formulation would add a join exchange
    and a candidate fan-out; losing column pruning would widen both scans."""
    df = entry.queries()["q102_versioned_join"](spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange") == 2
    assert "partial_max_by" in plan  # dedup combines map-side before its shuffle
    for line in plan.splitlines():
        if "FileScan" in line:
            assert "props" not in line  # unused columns never leave the scan


def test_avro_wire_path_spread_then_no_shuffle(spark):
    """q103: the serde chain is Arrow-batched encode → expressions →
    Arrow-batched decode with NO key shuffle; the only exchange is the ONE
    scale-adaptive round-robin spread in front of it (r13: the single-row-
    group test scan otherwise serializes the whole per-row serde onto one
    task; ensure_min_parallelism is a no-op at corpus scale).  The events
    scan reads only the five encoded columns (user_id is not part of the
    record)."""
    df = entry.queries()["q103_avro_wire"](spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning" in plan  # the spread, not a key shuffle
    assert plan.count("hashpartitioning") == 0
    assert plan.count("ArrowEvalPython") == 2  # encode + decode, both Arrow-batched
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    schema = scan.split("ReadSchema:")[1]
    assert "user_id" not in schema


def test_write_clustered_rowgroup_stats(spark, tmp_path):
    """Cluster-on-write must produce files whose parquet column statistics
    are tight on the leading cluster column: with enough output files per
    distinct value, each file holds exactly one lang (min == max), which is
    what lets a lang-filtered scan prune whole files at 100 TB."""
    import pyarrow.parquet as pq
    from pyspark_engine.runtime import write_clustered

    df = spark.range(2000).selectExpr(
        "id", "CASE WHEN id % 4 = 0 THEN 'de' WHEN id % 4 = 1 THEN 'en' "
        "WHEN id % 4 = 2 THEN 'fr' ELSE 'zh' END AS lang")
    dst = str(tmp_path / "clustered")
    write_clustered(df, dst, ["lang", "id"], n_files=8)
    import glob
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) >= 4
    tight = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        mins, maxs = set(), set()
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)
            mins.add(col.statistics.min)
            maxs.add(col.statistics.max)
        assert len(mins) == 1 and mins == maxs  # one lang per file
        tight += 1
    assert tight >= 4


def test_profile_columns_approx_has_no_expand(spark):
    """profile_columns(approx=True) must plan HLL sketches (fixed-size,
    map-side-combinable registers), NOT the exact multi-distinct path whose
    Expand node replicates every row xN columns before the partial
    aggregate — the difference between a bounded and an O(rows x cols)
    shuffle at 100 TB."""
    from pyspark_engine import llmops
    from pyspark_engine.runtime import read_table

    li = read_table(spark, SF, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_returnflag"]
    exact = _plan(llmops.profile_columns(li, cols))
    approx = _plan(llmops.profile_columns(li, cols, approx=True))
    assert "Expand" in exact            # the exact path really is expand-based
    assert "Expand" not in approx
    assert "approx_count_distinct" in approx
    assert "partial_approx_count_distinct" in approx  # map-side combine


def test_text_family_no_hot_key_window(spark):
    """r14 de-skew pin (r13 verdict item 2): the doc-frequency / vocabulary-
    count attachment in the text-analytics family must NOT plan as an
    aggregate window over a term/digest partition — WindowExec puts every
    row of a key on ONE task, so a stopword term or corpus-wide boilerplate
    digest becomes a single-task sort of ~n_docs rows at 100 TB.  Any
    Window that remains must be keyed by the document id (per-doc top-k —
    vocabulary-bounded partitions) or the declared group column (ntile —
    documented as the threshold-join candidate at scale), never by the
    term/gram/digest key."""
    from pyspark_engine import llmops

    qs = entry.queries()
    for q in (
        "q96_tfidf_topk",
        "q97_unigram_xent",
        "q108_repeated_spans",
        "q116_bm25_topk",
        "q123_ngram_novelty",
        "q131_strip_boilerplate",
    ):
        plan = _plan(qs[q](spark, SF))
        llmops.release_cache()
        import re

        for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
            spec = m.group(1)
            # partition keys print first, each WITHOUT a sort direction;
            # ordering columns carry ASC/DESC — cut there so an order-by
            # tie-break on the term does not false-positive
            part = re.split(r"\b(?:ASC|DESC)\b", spec)[0]
            assert (
                "term#" not in part
                and "__g#" not in part
                and "__h#" not in part
                and "pfp#" not in part
            ), f"{q}: hot-key window survived: {spec[:160]}"
