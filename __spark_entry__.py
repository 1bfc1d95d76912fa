"""Driver contract for the spark-graft builder (PySpark target).

Every query below is built through the ``pyspark_engine`` DSL (the
Streamiz-capability layer re-expressed on DataFrames — see SURVEY.md §2 row
numbers cited per query) and paired with an ANSI-SQL oracle for DuckDB.
Column aliases match exactly between the Spark result and the oracle.

Determinism rules used throughout (so value-hashes match DuckDB):
  * money aggregates go through DECIMAL casts (exact), never double sums;
  * single-op double arithmetic (x*2, x/25, a/b) is IEEE-identical in both
    engines and safe; multi-term double accumulation is not, and is avoided;
  * timestamps are compared as epoch micro/millis (Spark reads the parquet
    TIMESTAMP(NANOS) column truncated to µs exactly like DuckDB — see
    pyspark_engine.runtime.read_table);
  * every tie is broken by a unique column (event_id / doc_id / vec_id).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_engine import analytics, llmops, serdes
from pyspark_engine.dsl import KStream, StreamBuilder
from pyspark_engine.runtime import configure, read_table
from pyspark_engine.windows import (
    CustomWindowOptions,
    HoppingWindowOptions,
    JoinWindowOptions,
    SessionWindowOptions,
    TumblingWindowOptions,
)


def _b(spark: SparkSession, sf_dir: str) -> StreamBuilder:
    return StreamBuilder(configure(spark), data_dir=sf_dir)


def _dec(name: str) -> Column:
    return F.col(name).cast("decimal(18,4)")


# =====================================================================
# flagship
# =====================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship (SURVEY §7.1 slice): events → filter → groupBy(user) → count."""
    b = _b(spark, "/root/testdata/sf0.001")
    return (
        b.stream("events", key="user_id", ts="ts")
        .filter(F.col("event_type") == "purchase")
        .group_by_key()
        .count("purchases")
        .to_stream()
        .df
    )


# =====================================================================
# §2.2 stateless transforms
# =====================================================================

def q02_stream_filter(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
    )
    return s.df.select("event_id", "user_id", "event_type", "value")


def q03_stream_filter_not(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").filter_not(F.col("event_type").isin("click", "view"))
    return s.df.select("event_id", "event_type")


def q04_stream_map(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").map(
        key={"etype": F.col("event_type")},
        values={"event_id": F.col("event_id"), "value_x2": F.col("value") * 2.0},
    )
    return s.df.select("etype", "event_id", "value_x2")


def q05_stream_map_values(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("lineitem", key=("l_orderkey", "l_linenumber")).map_values(
        revenue=(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))).cast(
            "double"
        )
    )
    return s.df.select("l_orderkey", "l_linenumber", "revenue")


def q06_stream_flat_map(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("documents", key="doc_id").filter(F.col("doc_id") % 20 == 0)
    out = s.flat_map(llmops.tokens(F.col("text")), alias="word", new_key="word", keep=("n_chars",))
    return out.df.select("word", "n_chars")


def q07_stream_flat_map_values(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("documents", key="doc_id").filter(F.col("doc_id") % 20 == 0)
    return s.flat_map_values(llmops.tokens(F.col("text")), alias="word").df.select("doc_id", "word")


def q08_stream_select_key(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").select_key(
        F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")), alias="ukey"
    )
    return s.df.select("ukey", "event_id")


def q09_stream_branch(spark, sf_dir):
    b = _b(spark, sf_dir)
    branches = b.stream("events", key="user_id", ts="ts").branch(
        F.col("event_type") == "purchase",
        F.col("value") > 150.0,
    )
    return branches[1].df.select("event_id", "event_type", "value")


def q10_stream_peek(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = (
        b.stream("events", key="user_id", ts="ts")
        .filter(F.col("event_type") == "error")
        .peek("q10_errors")
        .group_by_key()
        .count("cnt")
    )
    return s.df.select("user_id", "cnt")


# =====================================================================
# §2.1/§2.2 table sources & table transforms
# =====================================================================

def _events_table(b: StreamBuilder):
    return b.table("events", key="user_id", ts="ts", order=("ts", "event_id"))


def q11_table_source(spark, sf_dir):
    t = _events_table(_b(spark, sf_dir))
    return t.df.select("user_id", "event_id", "event_type", "value")


def q12_table_filter(spark, sf_dir):
    t = _events_table(_b(spark, sf_dir)).filter(F.col("value") >= 100.0)
    return t.df.select("user_id", "value")


def q13_table_map_values(spark, sf_dir):
    t = _events_table(_b(spark, sf_dir)).map_values(
        vhalf=F.col("value") / 2.0, etype_upper=F.upper(F.col("event_type"))
    )
    return t.df.select("user_id", "vhalf", "etype_upper")


def q14_stream_to_table(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = b.stream("orders", key="o_custkey", ts="o_orderdate").to_table(order=("o_orderdate", "o_orderkey"))
    return t.df.select("o_custkey", "o_orderkey", "o_totalprice")


def q15_table_to_stream(spark, sf_dir):
    s = _events_table(_b(spark, sf_dir)).to_stream().filter(F.col("event_type") == "purchase")
    return s.df.select("user_id", "event_type", "value")


# =====================================================================
# §2.3 grouped aggregations
# =====================================================================

def q16_grouped_count(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = b.stream("events", key="user_id", ts="ts").group_by_key().count("cnt")
    return t.df.select("user_id", "cnt")


def q17_grouped_aggregate(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .aggregate(
            total=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
            n=F.count(F.lit(1)),
        )
    )
    return t.df.select("user_id", "total", "n")


def q18_grouped_reduce(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .reduce(vmax=F.max("value"), vmin=F.min("value"))
    )
    return t.df.select("user_id", "vmax", "vmin")


def q19_grouped_aggregate_py(spark, sf_dir):
    """Arbitrary-Python fold via applyInPandas (SURVEY §2.8 escape hatch)."""

    def fold(pdf):
        import numpy as np
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "folded": [int(np.floor(pdf["value"].to_numpy()).sum() + len(pdf))],
            }
        )

    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .aggregate_py(fold, "user_id long, folded long")
    )
    return t.df.select("user_id", "folded")


def q20_group_by_rekey(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by(day=F.date_trunc("day", F.col("ts")))
        .count("cnt")
    )
    return t.df.select(F.unix_millis(F.col("day")).alias("day_ms"), F.col("cnt"))


def q21_table_group_by_count(spark, sf_dir):
    t = _events_table(_b(spark, sf_dir)).group_by(etype=F.col("event_type")).count("users")
    return t.df.select("etype", "users")


def q22_table_group_by_agg(spark, sf_dir):
    t = (
        _events_table(_b(spark, sf_dir))
        .group_by(etype=F.col("event_type"))
        .aggregate(total=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )
    return t.df.select("etype", "total")


def q23_table_group_by_reduce(spark, sf_dir):
    t = _events_table(_b(spark, sf_dir)).group_by(etype=F.col("event_type")).reduce(vmax=F.max("value"))
    return t.df.select("etype", "vmax")


def q24_agg_null_key_drop(spark, sf_dir):
    """Null grouping keys are skipped (KStreamAggregateProcessor.cs:24-28)."""
    b = _b(spark, sf_dir)
    key = F.when(F.col("user_id") % 7 == 3, F.lit(None).cast("long")).otherwise(F.col("user_id") % 7)
    t = b.stream("events", key="user_id", ts="ts").select_key(key, alias="bucket").group_by_key().count("cnt")
    return t.df.select("bucket", "cnt")


# =====================================================================
# §2.4 windowed aggregations
# =====================================================================

def q25_window_tumbling_count(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="event_type", ts="ts")
        .group_by_key()
        .windowed_by(TumblingWindowOptions.of(900_000))
        .count("cnt")
    )
    return t.df.select(
        "event_type",
        F.unix_millis("w_start").alias("w_start_ms"),
        F.unix_millis("w_end").alias("w_end_ms"),
        "cnt",
    )


def q26_window_hopping_sum(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="event_type", ts="ts")
        .group_by_key()
        .windowed_by(HoppingWindowOptions.of(1_800_000, 600_000))
        .aggregate(total=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
    )
    return t.df.select(
        "event_type",
        F.unix_millis("w_start").alias("w_start_ms"),
        "total",
    )


def q27_window_custom_daily(spark, sf_dir):
    win = CustomWindowOptions(
        assign=lambda ts: (F.date_trunc("day", ts), F.date_trunc("day", ts) + F.expr("INTERVAL 1 DAY"))
    )
    b = _b(spark, sf_dir)
    t = b.stream("events", key="event_type", ts="ts").group_by_key().windowed_by(win).count("cnt")
    return t.df.select(
        "event_type",
        F.unix_millis("w_start").alias("w_start_ms"),
        F.unix_millis("w_end").alias("w_end_ms"),
        "cnt",
    )


def q28_window_grace(spark, sf_dir):
    """Grace/late-data drop parity (KStreamWindowAggregateProcessor.cs:51-58,77-82):
    batch replay in a scrambled deterministic arrival order, per simulated
    input partition; records are dropped once per-partition stream-time - grace
    passes their window end."""
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="event_type", ts="ts")
        .group_by_key()
        .windowed_by(
            TumblingWindowOptions.of(900_000, grace_ms=600_000),
            arrival_order=(F.col("event_id") % 97, F.col("event_id")),
            arrival_partition=F.col("user_id") % 4,
        )
        .count("cnt")
    )
    return t.df.select(
        "event_type",
        F.unix_millis("w_start").alias("w_start_ms"),
        F.unix_millis("w_end").alias("w_end_ms"),
        "cnt",
    )


def q70_window_hopping_grace(spark, sf_dir):
    """Hopping windows + grace: the late-record drop applies per exploded
    (record, member-window) row against per-partition stream time."""
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="event_type", ts="ts")
        .group_by_key()
        .windowed_by(
            HoppingWindowOptions.of(1_800_000, 600_000, grace_ms=600_000),
            arrival_order=(F.col("event_id") % 97, F.col("event_id")),
            arrival_partition=F.col("user_id") % 4,
        )
        .count("cnt")
    )
    return t.df.select(
        "event_type",
        F.unix_millis("w_start").alias("w_start_ms"),
        F.unix_millis("w_end").alias("w_end_ms"),
        "cnt",
    )


# =====================================================================
# §2.5 joins
# =====================================================================

def _clicks_purchases(b: StreamBuilder):
    clicks = (
        b.stream("events", key="user_id", ts="ts")
        .filter(F.col("event_type") == "click")
        .map(key={"user_id": F.col("user_id")}, values={"l_id": F.col("event_id")})
    )
    purchases = (
        b.stream("events", key="user_id", ts="ts")
        .filter(F.col("event_type") == "purchase")
        .map(key={"r_user": F.col("user_id")}, values={"r_id": F.col("event_id")})
        .rename(ts="r_ts")
    )
    return clicks, purchases


def q29_ss_join_inner(spark, sf_dir):
    clicks, purchases = _clicks_purchases(_b(spark, sf_dir))
    j = clicks.join(purchases, JoinWindowOptions.of(1_800_000), how="inner")
    return j.df.select("user_id", "l_id", "r_id", F.unix_micros("ts").alias("ts_us"))


def q30_ss_join_left(spark, sf_dir):
    clicks, purchases = _clicks_purchases(_b(spark, sf_dir))
    j = clicks.join(purchases, JoinWindowOptions.of(1_800_000), how="left")
    return j.df.select("user_id", "l_id", "r_id", F.unix_micros("ts").alias("ts_us"))


def q31_ss_join_outer(spark, sf_dir):
    clicks, purchases = _clicks_purchases(_b(spark, sf_dir))
    j = clicks.join(purchases, JoinWindowOptions.of(1_800_000), how="full")
    return j.df.select("user_id", "l_id", "r_id", F.unix_micros("ts").alias("ts_us"))


def q32_st_join_inner(spark, sf_dir):
    b = _b(spark, sf_dir)
    orders = b.stream("orders", key="o_custkey", ts="o_orderdate")
    cust = b.table("customer", key="c_custkey", order=("c_custkey",))
    j = orders.join_table(cust, how="inner")
    return j.df.select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


def q33_st_join_left(spark, sf_dir):
    b = _b(spark, sf_dir)
    orders = b.stream("orders", key="o_custkey", ts="o_orderdate")
    cust = b.table("customer", key="c_custkey", order=("c_custkey",)).filter(F.col("c_acctbal") > 0)
    j = orders.join_table(cust, how="left")
    return j.df.select("o_orderkey", "o_custkey", "c_name")


def q34_global_join_inner(spark, sf_dir):
    b = _b(spark, sf_dir)
    cust = b.stream("customer", key="c_custkey")
    nation = b.global_table("nation", key="n_nationkey", order=("n_nationkey",))
    j = cust.join_global(nation, key_mapper=F.col("c_nationkey"), how="inner")
    return j.df.select("c_custkey", "c_name", "n_name")


def q35_global_join_left(spark, sf_dir):
    b = _b(spark, sf_dir)
    supp = b.stream("supplier", key="s_suppkey")
    nation = b.global_table("nation", key="n_nationkey", order=("n_nationkey",)).filter(
        F.col("n_regionkey") < 2
    )
    j = supp.join_global(nation, key_mapper=F.col("s_nationkey"), how="left")
    return j.df.select("s_suppkey", "s_name", "n_name")


def _tt_tables(b: StreamBuilder):
    a = _events_table(b).map_values(a_type=F.col("event_type"), a_val=F.col("value"))
    bb = (
        b.stream("orders", key="o_custkey", ts="o_orderdate")
        .to_table(order=("o_orderdate", "o_orderkey"))
        .map_values(b_order=F.col("o_orderkey"), b_total=F.col("o_totalprice"))
    )
    return a, bb


def q36_tt_join_inner(spark, sf_dir):
    a, bb = _tt_tables(_b(spark, sf_dir))
    j = a.join(bb, how="inner", ts_alias="jts")
    return j.df.select("user_id", "a_type", "b_total", F.unix_micros("jts").alias("ts_us"))


def q37_tt_join_left(spark, sf_dir):
    a, bb = _tt_tables(_b(spark, sf_dir))
    j = a.join(bb, how="left", ts_alias="jts")
    return j.df.select("user_id", "a_type", "b_total", F.unix_micros("jts").alias("ts_us"))


def q38_tt_join_outer(spark, sf_dir):
    a, bb = _tt_tables(_b(spark, sf_dir))
    j = a.join(bb, how="full", ts_alias="jts")
    return j.df.select("user_id", "a_type", "b_total", F.unix_micros("jts").alias("ts_us"))


# =====================================================================
# §2.7 interactive queries, §2.8/§1.2 UDF + serde surface
# =====================================================================

def q39_interactive_query(spark, sf_dir):
    b = _b(spark, sf_dir)
    (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .count("cnt")
        .materialize("store_user_counts")
    )
    return spark.table("store_user_counts").filter(F.col("cnt") >= 10).select("user_id", "cnt")


def q40_json_serde(spark, sf_dir):
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").with_values(
        k=F.get_json_object(F.col("props"), "$.k").cast("int")
    ).filter(F.col("k") >= 50)
    return s.df.select("event_id", "k")


def q41_udf_pandas(spark, sf_dir):
    def bucketize(v):
        import numpy as np

        return np.floor(v / 25.0).astype("int64")

    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").map_values_py(
        bucketize, "long", "value", alias="bucket"
    )
    return s.df.select("event_id", "bucket")


# =====================================================================
# q1-style flagship aggregation (bench headline)
# =====================================================================

def q01_pricing_summary(spark, sf_dir):
    b = _b(spark, sf_dir)
    t = (
        b.stream("lineitem", key=("l_returnflag", "l_linestatus"))
        .filter(F.col("l_shipdate") <= F.lit("2024-10-01").cast("timestamp"))
        # prune to the 5 needed columns, then compensate the single-row-group
        # test file (KStream.spread: no-op when the scan has >= cores files)
        # so the decimal partial-aggregate parallelizes instead of
        # serializing on the one real scan task
        .map_values(
            l_quantity=F.col("l_quantity"),
            l_extendedprice=F.col("l_extendedprice"),
            l_discount=F.col("l_discount"),
        )
        .spread()
        .group_by_key()
        .aggregate(
            sum_qty=F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"),
            sum_base_price=F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
            sum_disc_price=F.sum(
                _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
            ).cast("double"),
            count_order=F.count(F.lit(1)),
        )
    )
    return t.df.select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order")


# =====================================================================
# LLM-pipeline operators (beyond the reference — first-class here)
# =====================================================================

def q42_dedup_exact(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.exact_dedup(docs, "doc_id", "text")


def q43_dedup_minhash(spark, sf_dir):
    """Banded MinHash-LSH near-dup pairs with the portable base hash
    (llmops.portable_hash32): the DuckDB oracle recomputes the 64 affine
    minhash signatures and bands EXACTLY (band bucket = tuple equality), so
    the hash check covers LSH candidate generation — the probabilistic
    recall behavior itself — not just the Jaccard verify step."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.4, portable=True)


def q44_dedup_simhash(spark, sf_dir):
    """Pigeonhole SimHash near-dup pairs (portable 32-bit fingerprint): the
    oracle recomputes per-bit votes, fingerprints, the 4×8-bit chunk
    candidate rule, and the hamming verify exactly."""
    docs = read_table(configure(spark), sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return llmops.simhash_pairs(docs, "doc_id", "text", max_hamming=8, portable=True)


def q45_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard on a deterministic sample (brute force — the
    correctness baseline for the banded q43 path)."""
    docs = read_table(configure(spark), sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    toks = llmops.tokens(F.col("text"))
    grams = llmops.word_ngrams(toks, 3)
    d = docs.select(F.col("doc_id"), grams.alias("g"))
    a = d.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    bb = d.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    pairs = a.join(bb, F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(F.array_union("ga", "gb")).cast(
        "double"
    )
    return pairs.withColumn("j", jac).filter(F.col("j") >= 0.05).select("id_a", "id_b")


def q46_cosine_topk(spark, sf_dir):
    emb = read_table(configure(spark), sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 16)
    return llmops.cosine_topk(emb, queries, k=5)


def q47_ann_lsh(spark, sf_dir):
    emb = read_table(configure(spark), sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 16)
    return llmops.ann_lsh_topk(emb, queries, dim=64, k=5, n_planes=8)


def q71_ann_ivf(spark, sf_dir):
    """IVF approximate top-k with the deterministic hash-sample centroid
    init: the DuckDB oracle rebuilds the IDENTICAL index (same centroids,
    same |c|²-2v·c cell argmin, same n_probe probe order, same cosine
    ranking), so the whole approximate pipeline is hash-checked end-to-end —
    the KMeans init stays the default quality path, recall-tested in pytest."""
    emb = read_table(configure(spark), sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 16)
    return llmops.ann_ivf_topk(emb, queries, dim=64, k=5, n_lists=16, n_probe=4, init="hash_sample")


def q48_text_stats(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents")
    out = llmops.text_stats(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_chars_text").cast("long").alias("n_chars_text"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("stop_hits").cast("long").alias("stop_hits"),
        "stop_ratio",
        F.col("punct_count").cast("long").alias("punct_count"),
        "chars_per_token",
    )


def q49_token_count(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents")
    out = llmops.token_count_bpe(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
    )


def q50_language_id(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.language_id(docs, "doc_id", "text")


def q51_fingerprint(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.fingerprint(docs, "doc_id", "text")


def q52_multimodal_meta(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    return llmops.multimodal_meta(docs, "doc_id", "payload", "text/plain").select(
        "doc_id", "media_type", "n_bytes", "sha"
    )


# =====================================================================
# §2.6 extensions (merge, top-k, set ops, analytic fns, sessions) + serde
# roundtrip + embedding near-dup
# =====================================================================

def q53_merge_union(spark, sf_dir):
    """Branch then merge (KStream.merge — stream union)."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts")
    clicks, purchases = s.branch(
        F.col("event_type") == "click", F.col("event_type") == "purchase"
    )
    merged = clicks.merge(purchases)
    return merged.group_by(etype=F.col("event_type")).count("cnt").df.select("etype", "cnt")


def q54_topk_per_group(spark, sf_dir):
    """Per-group top-k (rank window, deterministic total order)."""
    b = _b(spark, sf_dir)
    s = b.stream("orders", key="o_orderkey").top_k(
        3,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        by=["o_orderpriority"],
    )
    return s.df.select("o_orderpriority", "o_orderkey", "o_totalprice")


def q55_global_topn(spark, sf_dir):
    """Global top-n → TakeOrderedAndProject (per-partition heaps, no full sort)."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").top_k(
        20, [F.col("value").desc(), F.col("event_id")]
    )
    return s.df.select("event_id", "user_id", "value")


def q56_set_except(spark, sf_dir):
    """EXCEPT DISTINCT: users who click but never purchase."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id")
    clicks = s.filter((F.col("event_type") == "click") & (F.col("value") > 150)).map_values()
    buys = s.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)).map_values()
    return clicks.subtract(buys).df.select("user_id")


def q57_set_intersect(spark, sf_dir):
    """INTERSECT DISTINCT: users with both clicks and errors."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id")
    clicks = s.filter(F.col("event_type") == "click").map_values()
    errors = s.filter(F.col("event_type") == "error").map_values()
    return clicks.intersect(errors).df.select("user_id")


def q58_analytic_running(spark, sf_dir):
    """Analytic/window functions: per-customer running total + sequence number
    over the order history (Spark-native extension; one shuffle on the key)."""
    from pyspark.sql.window import Window

    b = _b(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    s = b.stream("orders", key="o_custkey").with_values(
        running_total=F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"),
        rn=F.row_number().over(rk).cast("long"),
    )
    return s.df.select("o_orderkey", "o_custkey", "running_total", "rn")


def q59_serde_roundtrip(spark, sf_dir):
    """Serde surface: typed rows → Kafka wire (JSON value, primitive key) →
    decode → aggregate.  Exercises serdes.encode_kafka/decode_kafka in batch;
    the same expressions run at the edges of the streaming Kafka source/sink."""
    df = read_table(configure(spark), sf_dir, "events")
    wire = serdes.encode_kafka(df, "user_id", ["event_id", "event_type", "value"])
    wire = wire.withColumn("timestamp", F.timestamp_micros(F.lit(0)))
    decoded = serdes.decode_kafka(
        wire, "event_id bigint, event_type string, value double", key_type="bigint"
    )
    return (
        decoded.groupBy(F.col("key").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


def q60_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup over a corpus with planted duplicates
    (vec_id+10000 copies): LSH-bucketed candidates + exact cosine ≥ 0.9.
    The oracle brute-forces the same corpus, so this checks both candidate
    recall (identical vectors share buckets by construction) and verify
    precision (natural pairs top out at cosine ≈ 0.48)."""
    emb = read_table(configure(spark), sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    return llmops.embedding_neardup(corpus, dim=64, threshold=0.9)


def q61_session_window(spark, sf_dir):
    """Gap-based session windows (SessionWindowOptions → F.session_window)."""
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .windowed_by(SessionWindowOptions.of(30 * 60 * 1000))
        .count("cnt")
    )
    return t.df.select(
        "user_id",
        F.unix_millis(F.col("w_start")).alias("s_start_ms"),
        F.unix_millis(F.col("w_end")).alias("s_end_ms"),
        "cnt",
    )


def q69_sliding_agg(spark, sf_dir):
    """Per-record sliding window (KIP-450 analog): count + decimal sum of the
    user's events in the 10 minutes up to and including each event."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").sliding_agg(
        600_000,
        w_cnt=F.count(F.lit(1)),
        w_total_dec=F.sum(F.col("value").cast("decimal(18,2)")),
    )
    return s.df.select(
        "event_id", "user_id", "w_cnt", F.col("w_total_dec").cast("double").alias("w_total")
    )


def q68_multimodal_features(spark, sf_dir):
    """Multimodal feature extraction: binary payloads → Arrow-batched
    mapInPandas worker (deterministic fake decoder; real plumbing).  The
    worker's byte-level features ARE SQL-expressible (hex-pair expansion in
    DuckDB), so this is oracle-exact: n_bytes, mean_byte, and the 8-bin byte
    histogram (as a CSV string — array columns don't compare portably)."""
    docs = read_table(configure(spark), sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    out = llmops.multimodal_features(docs, "doc_id", "payload", bins=8)
    return out.select(
        "doc_id",
        "n_bytes",
        "mean_byte",
        F.concat_ws(",", F.col("hist").cast("array<string>")).alias("hist_csv"),
    )


def q62_asof_join(spark, sf_dir):
    """As-of join: each click enriched with the user's latest purchase at or
    before the click time (KStream.join_asof — union + one window pass, no
    candidate fan-out).  Right side deduped to one purchase per (user, ts)
    so the as-of pick is deterministic."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts")
    clicks = s.filter(F.col("event_type") == "click").map_values(l_id=F.col("event_id"))
    purchases = s.filter(F.col("event_type") == "purchase").map_values(
        p_value=F.col("value"), p_id=F.col("event_id")
    )
    # unique (user_id, ts): keep the highest event id on ties
    dedup = (
        KStream(purchases.df, ("user_id", "ts"), None)
        .to_table(order=("p_id",))
        .to_stream()
    )
    purchases = KStream(dedup.df, ("user_id",), "ts")
    j = clicks.join_asof(purchases, how="left")
    return j.df.select(
        "user_id",
        "l_id",
        "p_value",
        F.unix_micros(F.col("matched_ts")).alias("matched_ts_us"),
    )


def q63_rollup(spark, sf_dir):
    """GROUP BY ROLLUP subtotals (aggregate_rollup extension)."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").with_values(
        day_ms=F.unix_millis(F.date_trunc("day", F.col("ts")))
    )
    out = s.aggregate_rollup(
        ["event_type", "day_ms"],
        cnt=F.count(F.lit(1)),
        total=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
    )
    return out.df.select("event_type", "day_ms", "cnt", "total")


def q64_count_distinct(spark, sf_dir):
    """Distinct aggregate (§2.3 "absent" row — expression path, no new op)."""
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by(etype=F.col("event_type"))
        .aggregate(users=F.count_distinct(F.col("user_id")))
    )
    return t.df.select("etype", "users")


def q65_semi_join(spark, sf_dir):
    """Left-semi join: events of well-funded customers (KStream.join_semi)."""
    b = _b(spark, sf_dir)
    rich = b.table("customer", key="c_custkey", order=("c_custkey",)).filter(
        F.col("c_acctbal") > 5000
    )
    s = b.stream("events", key="user_id", ts="ts").join_semi(rich)
    return s.df.select("event_id", "user_id", "event_type")


def q66_anti_join(spark, sf_dir):
    """Left-anti join: events of everyone else (KStream.join_anti)."""
    b = _b(spark, sf_dir)
    rich = b.table("customer", key="c_custkey", order=("c_custkey",)).filter(
        F.col("c_acctbal") > 5000
    )
    s = b.stream("events", key="user_id", ts="ts").join_anti(rich)
    return s.df.select("event_id", "user_id", "event_type")


def q67_fk_table_join(spark, sf_dir):
    """Foreign-key table join (KTable.join_fk): orders table → customer table
    via o_custkey (the Kafka Streams 2.4 FK-join analog)."""
    b = _b(spark, sf_dir)
    orders = b.table("orders", key="o_orderkey", order=("o_orderkey",))
    customers = b.table("customer", key="c_custkey", order=("c_custkey",))
    t = orders.join_fk(customers, "o_custkey")
    return t.df.select("o_orderkey", "o_custkey", "c_name", "c_acctbal")


def q74_minhash_high_threshold(spark, sf_dir):
    """MinHash-LSH at a high threshold, oracle-checked against brute-force
    shingle Jaccard: at j >= 0.9 the 8x8 banding's candidate recall is 100%
    on this corpus (deterministic hashes, deterministic data), so the banded
    path must reproduce the exact brute-force pair set — candidate
    generation correctness, not just verify correctness."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.9)


def q77_named_branches(spark, sf_dir):
    """Named branching (KStream.split, the Kafka Streams 2.8 successor of
    the reference's positional Branch, core/Stream/IKStream.cs:37): route
    events to first-match-wins named branches plus a default, tag each with
    its branch name, and merge back — order-insensitive union the oracle
    reproduces with CASE."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts")
    out = (
        s.split("ev-")
        .branch(F.col("value") >= 180.0, "hot")
        .branch(F.col("event_type") == "purchase", "buy")
        .default_branch("rest")
    )
    tagged = [
        ks.with_values(branch=F.lit(name)) for name, ks in sorted(out.items())
    ]
    merged = tagged[0]
    for t in tagged[1:]:
        merged = merged.merge(t)
    return merged.df.select("event_id", "branch")


def q82_decontaminate(spark, sf_dir):
    """Benchmark decontamination (llmops.decontaminate): flag docs sharing
    any 8-gram with the 'benchmark' subset (doc_id % 10 = 0); md5 digests
    keep the candidate join byte-portable to the oracle."""
    docs = read_table(configure(spark), sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    return llmops.decontaminate(docs, ref, "doc_id", "text", n=8)


def q83_repetition_stats(spark, sf_dir):
    """Within-doc repetition signals (llmops.repetition_stats): bigram
    totals, top-bigram fraction, duplicate-bigram fraction."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.repetition_stats(docs, "doc_id", "text")


def q84_quantize_embeddings(spark, sf_dir):
    """Per-vector int8 quantization (llmops.quantize_embeddings): floor-based
    codes + per-row scale, CSV-rendered codes for portable compare."""
    emb = read_table(configure(spark), sf_dir, "embeddings")
    out = llmops.quantize_embeddings(emb, "vec_id", "embedding")
    return out.select(
        "vec_id", "q_scale", F.concat_ws(",", F.col("q_codes").cast("array<string>")).alias("codes_csv")
    )


def q85_cogroup(spark, sf_dir):
    """Cogroup (KGroupedStream.cogroup → CogroupedKStream.aggregate,
    KIP-150): events grouped by user_id and orders re-keyed to the same key
    space each contribute their own aggregators to ONE shared table; keys
    seen by only one stream keep the other stream's initializer (counts
    fill to 0, sums stay null)."""
    b = _b(spark, sf_dir)
    ev = b.stream("events", key="user_id", ts="ts").group_by_key()
    orders = (
        b.stream("orders", key="o_orderkey", ts="o_orderdate")
        .group_by(user_id=F.col("o_custkey"))
    )
    table = (
        ev.cogroup(
            ev_cnt=F.count(F.lit(1)),
            ev_sum=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
        )
        .cogroup(
            orders,
            ord_cnt=F.count(F.lit(1)),
            ord_total=F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
        )
        .aggregate(fill={"ev_cnt": 0, "ord_cnt": 0})
    )
    return table.df.select("user_id", "ev_cnt", "ev_sum", "ord_cnt", "ord_total")


def q81_salted_join(spark, sf_dir):
    """Skew-salted stream⋈table join (KStream.join_table_salted): stream rows
    carry a deterministic row-hash salt, the table side replicates n_salt×,
    and the join runs on (key, salt) — spreading any hot key over n_salt
    reducers.  The oracle is the PLAIN join: salting must not change the
    result set."""
    b = _b(spark, sf_dir)
    orders = b.stream("orders", key="o_custkey", ts="o_orderdate")
    cust = b.table("customer", key="c_custkey", order=("c_custkey",))
    j = orders.join_table_salted(cust, n_salt=8, how="inner")
    return j.df.select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


def q78_quality_filter(spark, sf_dir):
    """Gopher-style quality filtering (llmops.quality_filter): per-doc
    signals + keep verdict, thresholds tuned to this corpus so both verdicts
    occur; every signal is an integer sum divided once, so the oracle
    matches bitwise."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.quality_filter(
        docs, "doc_id", "text",
        min_words=20, max_words=80,
        min_mean_word_len=3.0, max_mean_word_len=8.0,
        max_symbol_ratio=0.1, min_stop_hits=1,
    )


def q79_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling (llmops.sample_stratified_hash):
    md5-prefix bucket per doc id, per-language mixture weights — the
    reproducible training-mixture draw; strata without a weight drop."""
    docs = read_table(configure(spark), sf_dir, "documents")
    out = llmops.sample_stratified_hash(
        docs, "doc_id", "lang", {"en": 0.5, "fr": 0.25, "zh": 0.1}, salt="mix1:"
    )
    return out.select("doc_id", "lang")


def q80_chunk_text(spark, sf_dir):
    """Token-window chunking (llmops.chunk_text): 32-token windows with
    8-token overlap; chunk starts, tail handling, and the joined chunk text
    are all reproduced by the generate_series/list_slice oracle."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.chunk_text(docs, "doc_id", "text", max_tokens=32, overlap=8)


def q76_kafka_wire_full(spark, sf_dir):
    """FULL Kafka wire-schema roundtrip, offline: typed rows → producer
    record (binary key, JSON binary value, per-record DYNAMIC topic,
    headers) → broker frame (timestamp/partition/offset emulated — the
    spark-sql-kafka connector is absent in this container, no network) →
    source-side decode (typed key, flattened value, header map, record
    metadata) → aggregate per topic.  Exercises the exact column contract
    of Spark's Kafka source/sink (reference wire path:
    core/Kafka/Internal/RecordCollector.cs:82-120 serialize,
    core/Processors/SourceProcessor.cs:16-49 deserialize).  The oracle
    computes the same aggregate from the raw table, so any encode/decode
    loss breaks the hash."""
    df = read_table(configure(spark), sf_dir, "events")
    wire = serdes.encode_kafka(
        df,
        "user_id",
        ["event_id", "value"],
        topic=F.concat(F.lit("events-"), F.col("event_type")),
        headers=F.array(
            F.struct(
                F.lit("etype").alias("key"),
                F.encode(F.col("event_type"), "UTF-8").alias("value"),
            )
        ),
        extra=(
            F.col("ts").alias("timestamp"),  # broker timestamp := event time
            F.pmod(F.col("event_id"), F.lit(8)).cast("int").alias("partition"),
            F.col("event_id").alias("offset"),
        ),
    )
    decoded = serdes.decode_kafka(
        wire,
        "event_id bigint, value double",
        key_type="bigint",
        include_headers=True,
        include_meta=True,
    )
    hdr_etype = F.decode(F.element_at(F.map_from_entries(F.col("headers")), "etype"), "UTF-8")
    return (
        decoded.withColumn("etype_hdr", hdr_etype)
        .groupBy("topic", "etype_hdr")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
            F.max("offset").alias("max_off"),
            F.max(F.unix_micros("ts")).alias("max_ts_us"),
        )
    )


def q75_window_store_fetch(spark, sf_dir):
    """Windowed-store interactive query (QueryableStoreTypes.WindowStore,
    core/State/QueryableStoreTypes.cs:24-41; IWindowStore.Fetch(key, from,
    to)): materialize a windowed KTable as a named store, then range-fetch
    one key's windows by start-time bounds via StoreRegistry.fetch_df — the
    key + time filters push down to the store scan."""
    from pyspark_engine.runtime import StoreRegistry

    b = _b(spark, sf_dir)
    (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .windowed_by(TumblingWindowOptions.of(3_600_000))
        .count("cnt")
        .materialize("q75_window_store")
    )
    df = StoreRegistry(spark).fetch_df(
        "q75_window_store",
        {"user_id": 7},
        t_from_ms=1704412800000,  # 2024-01-05T00:00Z
        t_to_ms=1705276800000,  # 2024-01-15T00:00Z
    )
    return df.select(
        "user_id",
        F.unix_millis("w_start").alias("w_start_ms"),
        F.unix_millis("w_end").alias("w_end_ms"),
        "cnt",
    )


def q73_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (§2.3 "absent" row: the
    reference has no percentile/median aggregate at all; Spark's exact
    `percentile` is a one-shuffle grouped aggregate).  approx_percentile /
    approx_count_distinct slot into the same aggregate() call when a sketch
    is acceptable at scale."""
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="user_id", ts="ts")
        .group_by(etype=F.col("event_type"))
        .aggregate(
            p50=F.expr("percentile(value, 0.5)"),
            p90=F.expr("percentile(value, 0.9)"),
        )
    )
    return t.df.select("etype", "p50", "p90")


def q72_composed_pipeline(spark, sf_dir):
    """End-to-end composition showcase: branch → merge → window → table join
    → per-group top-k, all through the DSL in one topology (the switch-over
    proof: a reference user's full pipeline shape, Spark-first)."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts")
    clicks, purchases, _rest = s.branch_with_default(
        F.col("event_type") == "click", F.col("event_type") == "purchase"
    )
    merged = clicks.merge(purchases)
    windowed = (
        merged.group_by_key()
        .windowed_by(TumblingWindowOptions.of(3_600_000))
        .aggregate(
            n=F.count(F.lit(1)),
            total=F.sum(F.col("value").cast("decimal(18,2)")),
        )
        .to_stream()
    )
    cust = b.table("customer", key="c_custkey", order=("c_custkey",)).map_values(
        c_mktsegment=F.col("c_mktsegment")
    )
    enriched = KStream(windowed.df, ("user_id",), None).join_table(cust, how="inner")
    top = KStream(enriched.df, ("user_id",)).top_k(
        2,
        [F.col("total").desc(), F.col("w_start"), F.col("user_id")],
        by=["c_mktsegment"],
    )
    return top.df.select(
        "c_mktsegment",
        "user_id",
        F.unix_millis("w_start").alias("w_start_ms"),
        "n",
        F.col("total").cast("double").alias("total"),
    )


# =====================================================================
# driver contract
# =====================================================================


def q86_pii_scrub(spark, sf_dir):
    """PII scrub (llmops.pii_scrub): synthesize deterministic PII spans
    (email/phone/SSN/IPv4) around each document, then redact with typed
    placeholders and count pre-redaction hits.  Pure regexp_replace/
    regexp_count projection — no shuffle; patterns are RE2-compatible so
    the oracle runs the identical regexes."""
    docs = read_table(configure(spark), sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@mail.example.com")),
            F.lit("call 555 123 4567 ssn 123-45-6789 ip"),
            F.concat(F.lit("10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
            F.col("text"),
        ).alias("text"),
    )
    out = llmops.pii_scrub(synth, "doc_id", "text")
    return out.select(
        "doc_id",
        "clean_text",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ssn").cast("long").alias("n_ssn"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
    )


def q87_paragraph_dedup(spark, sf_dir):
    """Cross-corpus paragraph-level exact dedup (llmops.paragraph_dedup, the
    C4/RefinedWeb recipe): paragraphs = spans between ' spark ' separators;
    first corpus-wide occurrence (lowest doc_id, pos) survives, documents are
    reassembled from their surviving paragraphs."""
    docs = read_table(configure(spark), sf_dir, "documents")
    out = llmops.paragraph_dedup(docs, "doc_id", "text", sep=" spark ")
    return out.select("doc_id", "clean_text", F.col("n_kept").cast("long").alias("n_kept"))


def q88_top_ngrams(spark, sf_dir):
    """Corpus-wide top-k bigrams (llmops.top_ngrams): map-side partial
    counts + TakeOrderedAndProject; deterministic (cnt desc, ngram asc)."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.top_ngrams(docs, "text", n=2, k=20).select(
        "ngram", F.col("cnt").cast("long").alias("cnt")
    )



def q89_llm_pipeline(spark, sf_dir):
    """Flagship end-to-end training-data pipeline: Gopher quality filter →
    PII scrub → cross-corpus paragraph dedup → token-window chunking — the
    operators a 100 TB curation job chains, composed as ONE logical plan so
    Catalyst sees (and can pipeline) the whole thing.  Every stage's
    semantics are individually oracle-verified (q78/q86/q87/q80); this
    query verifies the composition."""
    docs = read_table(configure(spark), sf_dir, "documents")
    kept = (
        llmops.quality_filter(
            docs, "doc_id", "text",
            min_words=20, max_words=80,
            min_mean_word_len=3.0, max_mean_word_len=8.0,
            max_symbol_ratio=0.1, min_stop_hits=1,
        )
        .filter(F.col("keep"))
        .select("doc_id")
    )
    base = docs.join(kept, "doc_id")
    scrub = llmops.pii_scrub(base, "doc_id", "text")
    dedup = llmops.paragraph_dedup(scrub, "doc_id", "clean_text", sep=" spark ")
    chunks = llmops.chunk_text(dedup, "doc_id", "clean_text", max_tokens=32, overlap=8)
    return chunks



def q90_dedup_clusters(spark, sf_dir):
    """Near-dup clustering (llmops.dedup_clusters): exact 3-gram Jaccard
    pairs over the whole corpus (brute force — the correctness baseline),
    then connected components via min-label propagation so transitive
    near-dups (A≈B≈C) collapse to one canonical id.  The oracle recomputes
    the pairs and closes them with a recursive CTE — an exact, independent
    connected-components implementation."""
    docs = read_table(configure(spark), sf_dir, "documents")
    toks = llmops.tokens(F.col("text"))
    grams = llmops.word_ngrams(toks, 3)
    d = llmops._spread(docs).select(F.col("doc_id"), grams.alias("g"))
    a = d.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    bb = d.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    jac = F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(
        F.array_union("ga", "gb")
    ).cast("double")
    pairs = (
        a.join(bb, F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.02)
        .select("id_a", "id_b")
    )
    out = llmops.dedup_clusters(pairs)
    return out.select(F.col("node").alias("doc_id"), "cluster_id")



def q91_url_stats(spark, sf_dir):
    """URL/domain triage (llmops.url_stats + top_domains): deterministic
    synthetic links appended per doc, then per-doc URL counts + distinct
    hosts, plus the corpus-wide top-10 hosts — one projection + one
    map-side-combined count."""
    docs = read_table(configure(spark), sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://src"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" and https://mirror.example.org")).otherwise(F.lit("")),
        ).alias("text"),
    )
    per_doc = llmops.url_stats(synth, "doc_id", "text").select(
        "doc_id",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_domains").cast("long").alias("n_domains"),
        "domains",
    )
    top = llmops.top_domains(synth, "text", k=10).select(
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("cnt").cast("long").alias("n_urls"),
        F.lit(-1).cast("long").alias("n_domains"),
        F.col("domain").alias("domains"),
    )
    return per_doc.unionByName(top)



def q92_pack_tokens(spark, sf_dir):
    """Sequence packing (llmops.pack_tokens): chunk the corpus (q80
    semantics), then lay chunks end-to-end in (doc_id, chunk_idx) order and
    cut every 512 tokens — each chunk gets its training-context id and
    offset.  One window cumsum; the oracle reproduces it with the same
    running sum."""
    docs = read_table(configure(spark), sf_dir, "documents")
    chunks = llmops.chunk_text(docs, "doc_id", "text", max_tokens=32, overlap=8)
    packed = llmops.pack_tokens(
        chunks.select("doc_id", "chunk_idx", "n_tokens_chunk"),
        "doc_id", "n_tokens_chunk", budget=512,
        order_cols=("doc_id", "chunk_idx"),
    )
    return packed.select(
        "doc_id", "chunk_idx",
        F.col("n_tokens_chunk").cast("long").alias("n_tokens_chunk"),
        "pack_id", "pack_offset",
    )



def q93_session_store_fetch(spark, sf_dir):
    """Session-store range read (StoreRegistry.find_sessions_df): sessions
    for user 7 INTERSECTING [2024-01-05, 2024-01-15] — findSessions
    semantics (end >= earliest AND start <= latest).  The reference's
    session store is an unimplemented stub (IReadOnlySessionStore.cs); this
    query oracle-verifies ours against a gap-island reconstruction."""
    from pyspark_engine.runtime import StoreRegistry

    b = _b(spark, sf_dir)
    (
        b.stream("events", key="user_id", ts="ts")
        .group_by_key()
        .windowed_by(SessionWindowOptions.of(30 * 60 * 1000))
        .count("cnt")
        .materialize("sess_store_q93")
    )
    df = StoreRegistry(spark).find_sessions_df(
        "sess_store_q93",
        {"user_id": 7},
        earliest_end_ms=1704412800000,
        latest_start_ms=1705276800000,
    )
    return df.select(
        "user_id",
        F.unix_millis(F.col("w_start")).alias("s_start_ms"),
        F.unix_millis(F.col("w_end")).alias("s_end_ms"),
        "cnt",
    )



def q94_frame_sample(spark, sf_dir):
    """Frame sampling (llmops.frame_sample): every 2nd 16-byte frame of each
    payload via Arrow-batched mapInPandas (1→N fan-out, no shuffle).  Frames
    surface as hex so the DuckDB oracle (blob substring + hex) compares
    byte-exactly."""
    docs = read_table(configure(spark), sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    out = llmops.frame_sample(docs, "doc_id", "payload", frame_bytes=16, stride=2)
    return out.select("doc_id", "frame_idx", F.hex(F.col("frame")).alias("frame_hex"))


def q95_resize_thumbs(spark, sf_dir):
    """Thumbnail resize (llmops.resize_payloads): mean-pool each payload's
    bytes into a fixed 8-byte thumb via Arrow-batched mapInPandas (1→1, no
    shuffle, constant output row width — the point of resizing early).
    Thumbs surface as hex so the DuckDB oracle (integer bucket edges +
    per-bucket floor-mean) compares byte-exactly."""
    docs = read_table(configure(spark), sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    out = llmops.resize_payloads(docs, "doc_id", "payload", target_bytes=8)
    return out.select("doc_id", F.hex(F.col("thumb")).alias("thumb_hex"), "orig_bytes")


def q96_tfidf_topk(spark, sf_dir):
    """Per-doc top-5 TF-IDF keywords (llmops.tfidf_topk): tf agg → vocab df
    agg → broadcast N → ranked window.  Score floor-quantized so the DuckDB
    ln-based oracle compares integer-exactly."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.tfidf_topk(docs, "doc_id", "text", k=5, min_df=2)


def q97_unigram_xent(spark, sf_dir):
    """Unigram-LM cross-entropy quality proxy (llmops.unigram_logprob):
    corpus-trained p(w), per-doc H = ln(total) − Σtf·ln(cnt)/n, quantized."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.unigram_logprob(docs, "doc_id", "text")


def q98_inverted_index(spark, sf_dir):
    """Bigram-phrase → sorted posting-list index (llmops.inverted_index)
    with min_df/max_df pruning (the stop-phrase cut doubles as the skew
    guard); postings comma-joined for exact comparison."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.inverted_index(docs, "doc_id", "text", min_df=3, max_df_ratio=0.1, n=2)


def q99_sample_mixture(spark, sf_dir):
    """Budget-constrained mixture rebalance (llmops.sample_to_mixture):
    rates = min(1, share·budget/n_domain) derived from per-domain counts
    (en downsamples, small langs clamp at 1.0, es drops), md5-bucket keep
    rule — reproducible across engines."""
    docs = read_table(configure(spark), sf_dir, "documents")
    out = llmops.sample_to_mixture(
        docs, "doc_id", "lang",
        {"en": 0.25, "fr": 0.25, "zh": 0.25, "de": 0.25},
        budget=400, salt="mix2:",
    )
    return out.select("doc_id", "lang")


def q100_pmi_collocations(spark, sf_dir):
    """Top-20 bigram collocations by PMI (llmops.pmi_collocations):
    log-domain score over bigram/unigram counts, floor-quantized; global
    top-k via TakeOrderedAndProject."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.pmi_collocations(docs, "text", min_count=5, k=20)


def q101_sample_quota(spark, sf_dir):
    """Exact per-group quota sample (llmops.sample_per_group_quota): 30 docs
    per language, ranked by (md5-bucket, id) — the deterministic reservoir
    analog for fixed-size eval splits."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.sample_per_group_quota(docs, "doc_id", "lang", quota=30, salt="q:").select(
        "doc_id", "lang"
    )


def q102_versioned_join(spark, sf_dir):
    """Versioned stream⋈table temporal join (StreamBuilder.versioned_table +
    KStream.join_table_asof): each click reads the user's purchase VERSION as
    of the click's own event time, within a 1-hour history-retention bound —
    the event-time-correct batch analog of the reference's per-record table
    lookup (KStreamKTableJoinProcessor.cs:38-43), which join_table's
    final-snapshot semantics (SURVEY §7.3.1) cannot express.  The changelog
    dedups to one version per (user, ts) with last-writer-wins on event id,
    the offset-order rule of a real changelog."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts")
    clicks = s.filter(F.col("event_type") == "click").map_values(c_id=F.col("event_id"))
    purchases = s.filter(F.col("event_type") == "purchase").map_values(
        p_val=F.col("value"), p_id=F.col("event_id")
    )
    vt = b.versioned_table(purchases.df, key="user_id", ts="ts", order=("p_id",)).map_values(
        p_val=F.col("p_val")
    )
    j = clicks.join_table_asof(vt, how="inner", tolerance_ms=3_600_000)
    return j.df.select(
        "user_id",
        "c_id",
        "p_val",
        F.unix_micros(F.col("matched_ts")).alias("matched_ts_us"),
    )


_AVRO_EVENT_SCHEMA = (
    '{"type":"record","name":"event","fields":['
    '{"name":"event_id","type":"long"},'
    '{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},'
    '{"name":"event_type","type":"string"},'
    '{"name":"value","type":["null","double"]},'
    '{"name":"props","type":"string"}]}'
)


def q103_avro_wire(spark, sf_dir):
    """Executable Avro Schema-Registry serde path (serdes.encode_avro_py +
    frame_confluent → unframe_confluent_payload + decode_avro_py; the
    reference's SchemaAvroSerDes, serdes/Streamiz.Kafka.Net.SchemaRegistry.
    SerDes.Avro/SchemaAvroSerDes.cs, run package-free on the public Avro
    binary encoding).  The oracle recomputes both the roundtripped fields
    AND the exact wire byte length from the Avro spec's zigzag/varint rules
    plus the 5-byte Confluent frame — checking the byte layout itself, not
    just encode∘decode = id."""
    reg = serdes.InMemorySchemaRegistry()
    sid = reg.register("events-value", _AVRO_EVENT_SCHEMA)
    # r13: the whole serde chain (encode UDF -> frame -> unframe -> decode
    # UDF) sits downstream of a ONE-row-group scan with no exchange, so it
    # serialized onto a single task; spread it (ensure_min_parallelism —
    # no-op at corpus scale where the scan has >= cores splits; guide §2.5
    # input skew / one huge unsplittable input)
    ev = llmops._spread(read_table(configure(spark), sf_dir, "events"))
    wire = ev.select(
        serdes.frame_confluent(
            serdes.encode_avro_py(
                F.struct("event_id", "ts", "event_type", "value", "props"),
                _AVRO_EVENT_SCHEMA,
            ),
            sid,
        ).alias("w")
    )
    back = wire.select(
        F.length("w").cast("long").alias("wire_len"),
        serdes.decode_avro_py(
            serdes.unframe_confluent_payload(F.col("w")), reg.by_id(sid)
        ).alias("r"),
    )
    return back.select(
        F.col("r.event_id").alias("event_id"),
        F.unix_micros(F.col("r.ts")).alias("ts_us"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.value").alias("value"),
        F.col("r.props").alias("props"),
        "wire_len",
    )


_PB_DOC_MESSAGE = {
    "name": "document",
    "fields": [
        {"num": 1, "name": "doc_id", "type": "int64"},
        {"num": 2, "name": "lang", "type": "string"},
        {"num": 3, "name": "text", "type": "string"},
        {"num": 4, "name": "n_chars", "type": "int64"},
    ],
}


def q104_protobuf_wire(spark, sf_dir):
    """Executable Protobuf serde path (serdes.encode_protobuf_py /
    decode_protobuf_py; the reference's SchemaProtobufSerDes, serdes/
    Streamiz.Kafka.Net.SchemaRegistry.SerDes.Protobuf/SchemaProtobufSerDes.cs,
    run package-free on the public Protobuf wire format).  Oracle recomputes
    the roundtripped fields and the exact wire length from the tag/varint/
    length-delimited rules."""
    docs = read_table(configure(spark), sf_dir, "documents")
    wire = docs.select(
        serdes.encode_protobuf_py(
            F.struct("doc_id", "lang", "text", "n_chars"), _PB_DOC_MESSAGE
        ).alias("w")
    )
    back = wire.select(
        F.length("w").cast("long").alias("wire_len"),
        serdes.decode_protobuf_py(F.col("w"), _PB_DOC_MESSAGE).alias("r"),
    )
    return back.select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.lang").alias("lang"),
        F.col("r.text").alias("text"),
        F.col("r.n_chars").alias("n_chars"),
        "wire_len",
    )


def q105_sketch_stats(spark, sf_dir):
    """Sketch aggregates — the 100 TB path for distinct-count and quantiles
    (SURVEY §2.3 'no approximate aggregates' absent row; Spark-native
    HyperLogLog++ and GK-quantile sketches through the ordinary grouped
    ``aggregate`` surface).  Exact count(DISTINCT) shuffles every distinct
    value; the HLL sketch shuffles a fixed-size register set per group, and
    percentile_approx a bounded GK summary — both map-side combinable.

    Sketch INTERNALS are engine-specific, but the sketch CONTRACT is not —
    so the emitted columns are the exact per-group counts (both engines
    agree on those) plus deterministic bound-check booleans computed Spark-
    side against Spark's own exact values: |hll − exact| ≤ 3·rsd·exact, and
    each approx percentile's exact rank bracket [#lt+1, #le] must intersect
    the target rank ± n/accuracy (the GK guarantee).  The oracle recomputes
    the exact columns and emits literal TRUE for the booleans — hash equal
    iff every sketch honors its documented error bound on this data.  The
    tighter numeric assertion stays in
    tests/test_dsl_semantics.py::test_sketch_aggregates_error_bounds."""
    b = _b(spark, sf_dir)
    t = (
        b.stream("events", key="event_type", ts="ts")
        .group_by_key()
        .aggregate(
            users_hll=F.approx_count_distinct("user_id", rsd=0.02),
            p50_value=F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(10000)),
            p99_value=F.percentile_approx(F.col("value"), F.lit(0.99), F.lit(10000)),
        )
    )
    ev = read_table(configure(spark), sf_dir, "events")
    j = ev.join(F.broadcast(t.df), "event_type")
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("users_exact"),
        F.first("users_hll").alias("__hll"),
        F.first("p50_value").alias("__p50"),
        F.first("p99_value").alias("__p99"),
        F.count("value").cast("long").alias("__nv"),
        F.sum(F.when(F.col("value") < F.col("p50_value"), 1).otherwise(0)).alias("__lt50"),
        F.sum(F.when(F.col("value") <= F.col("p50_value"), 1).otherwise(0)).alias("__le50"),
        F.sum(F.when(F.col("value") < F.col("p99_value"), 1).otherwise(0)).alias("__lt99"),
        F.sum(F.when(F.col("value") <= F.col("p99_value"), 1).otherwise(0)).alias("__le99"),
    )
    tol = F.col("__nv") / F.lit(10000.0) + F.lit(1.0)  # GK rank error + discretization

    def rank_ok(q, lt, le):
        target = F.lit(q) * F.col("__nv")
        return (F.col(le) >= target - tol) & (F.col(lt) <= target + tol)

    return agg.select(
        "event_type",
        "n_events",
        "users_exact",
        (
            F.abs(F.col("__hll") - F.col("users_exact"))
            <= F.greatest(F.lit(3) * F.lit(0.02) * F.col("users_exact"), F.lit(1.0))
        ).alias("users_ok"),
        rank_ok(0.5, "__lt50", "__le50").alias("p50_ok"),
        rank_ok(0.99, "__lt99", "__le99").alias("p99_ok"),
    )


_AVRO_EMB_SCHEMA = (
    '{"type":"record","name":"emb","fields":['
    '{"name":"vec_id","type":"long"},'
    '{"name":"embedding","type":{"type":"array","items":"float"}}]}'
)


def q106_avro_embeddings(spark, sf_dir):
    """Embedding vectors through the Avro wire codec (array<float> as
    spec block encoding: zigzag count + packed little-endian floats +
    terminator) — the serialization path an embedding-producing pipeline
    ships vectors over.  Roundtrip is checked via an order-sensitive
    floor-quantized checksum of the DECODED floats (float32→double cast and
    ×1000 are IEEE-identical in both engines) and the exact wire byte
    length; the oracle recomputes both from the original column."""
    emb = read_table(configure(spark), sf_dir, "embeddings")
    wire = emb.select(
        serdes.encode_avro_py(F.struct("vec_id", "embedding"), _AVRO_EMB_SCHEMA).alias("w")
    )
    back = wire.select(
        F.length("w").cast("long").alias("wire_len"),
        serdes.decode_avro_py(F.col("w"), _AVRO_EMB_SCHEMA).alias("r"),
    )
    chk = F.aggregate(
        F.col("r.embedding"),
        F.lit(0).cast("long"),
        lambda a, x: a + F.floor(x.cast("double") * F.lit(1000.0)).cast("long"),
    )
    return back.select(
        F.col("r.vec_id").alias("vec_id"),
        F.size(F.col("r.embedding")).cast("long").alias("n_dims"),
        chk.alias("checksum"),
        "wire_len",
    )


_PB_EMB_MESSAGE = {
    "name": "embedding",
    "fields": [
        {"num": 1, "name": "vec_id", "type": "int64"},
        {"num": 2, "name": "embedding", "type": "repeated float"},
    ],
}


def q107_protobuf_embeddings(spark, sf_dir):
    """Embedding vectors over the Protobuf wire (proto3 packed repeated
    float: tag + length + packed little-endian items; empty vectors absent
    per proto3).  Same checksum-of-decoded-floats + exact-wire-length oracle
    discipline as q106's Avro twin — the two codecs cross-check each other's
    Spark-side plumbing."""
    emb = read_table(configure(spark), sf_dir, "embeddings")
    wire = emb.select(
        serdes.encode_protobuf_py(F.struct("vec_id", "embedding"), _PB_EMB_MESSAGE).alias("w")
    )
    back = wire.select(
        F.length("w").cast("long").alias("wire_len"),
        serdes.decode_protobuf_py(F.col("w"), _PB_EMB_MESSAGE).alias("r"),
    )
    chk = F.aggregate(
        F.coalesce(F.col("r.embedding"), F.array().cast("array<float>")),
        F.lit(0).cast("long"),
        lambda a, x: a + F.floor(x.cast("double") * F.lit(1000.0)).cast("long"),
    )
    return back.select(
        F.col("r.vec_id").alias("vec_id"),
        F.size(F.coalesce(F.col("r.embedding"), F.array().cast("array<float>")))
        .cast("long")
        .alias("n_dims"),
        chk.alias("checksum"),
        "wire_len",
    )


def q108_repeated_spans(spark, sf_dir):
    """Exact repeated-span detection (llmops.repeated_spans): fraction of
    each document covered by 15-token windows that occur 2+ times
    corpus-wide — the token-granular exact-substring-dedup signal (Lee et
    al.); oracle reconstructs windows, corpus counts, and per-doc fractions
    in SQL."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.repeated_spans(docs, "doc_id", "text", span_tokens=15, min_count=2)


def q109_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (llmops.semantic_dedup): planted
    duplicate embeddings (q60's corpus) collapse to one representative per
    semantic cluster — LSH pair generation → connected components → keep
    min id.  The oracle brute-forces the pairs, closes them with a recursive
    CTE, and drops every non-minimum cluster member."""
    emb = read_table(configure(spark), sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(planted)
    out = llmops.semantic_dedup(corpus, dim=64, threshold=0.9)
    return out.select("vec_id")


def q110_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (llmops.dsir_logweights): score every
    document by hashed-bigram likelihood under the English subset (target
    domain) vs the whole corpus — integer-exact because per-bucket
    log-ratios quantize BEFORE the per-doc sum.  The oracle rebuilds both
    histograms, the smoothed score table, and the integer sums in SQL."""
    docs = read_table(configure(spark), sf_dir, "documents")
    # r13: the target domain is a row-filter of the same corpus — pass the
    # predicate so the target histogram folds out of the one persisted
    # per-doc count frame instead of a second tokenize pass (guide §1.2)
    return llmops.dsir_logweights(
        docs, None, "doc_id", "text", n=2, n_buckets=10_000,
        target_filter=F.col("lang") == "en",
    )


def q111_bigram_backoff(spark, sf_dir):
    """Bigram LM with Stupid Backoff (llmops.bigram_backoff_logprob):
    word-order-aware fluency scoring of EVERY document against a model
    estimated from the English subset only — so non-English text actually
    exercises the backoff branch (unseen bigram → alpha-discounted unigram;
    unseen unigram → null, dropped from the sum).  Per-bigram scores
    floor-quantize before the integer per-doc sum; the backoff constant
    ln(0.4) is embedded as the identical double literal in both engines."""
    docs = read_table(configure(spark), sf_dir, "documents")
    model = docs.filter(F.col("lang") == "en")
    return llmops.bigram_backoff_logprob(docs, "doc_id", "text", model=model)


def q112_char_entropy(spark, sf_dir):
    """Shannon character entropy per document (llmops.char_entropy):
    zero-shuffle HOF histogram, per-class terms floor-quantized before the
    integer sum.  The oracle rebuilds the histogram with DuckDB list
    lambdas — both engines split to the identical per-codepoint character
    list, so counts, class totals, and the quantized entropy agree
    exactly."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.char_entropy(docs, "doc_id", "text")


def q113_classifier_score(spark, sf_dir):
    """FastText-style hashed linear classifier (llmops.classifier_score):
    word uni+bigrams → md5-bucket features → integer weight lookup → sign,
    entirely as a zero-shuffle aggregate HOF.  The pseudo-weight model
    w(b) = portable_hash32('w:'||b) % 2001 − 1000 is derived from the
    bucket id itself, so the oracle recomputes the full model — buckets,
    weights, per-doc integer score, keep decision — in SQL."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.classifier_score(docs, "doc_id", "text", n_features=4096)


def q114_warc_roundtrip(spark, sf_dir):
    """WARC codec round-trip (serdes.encode_warc/decode_warc): synthesize a
    Common-Crawl-style response record per document (URI from source +
    doc_id, Content-Length in octets), parse it back with anchored RE2-safe
    regexes, and verify declared vs parsed octet length.  The oracle
    performs the identical string assembly + regexp_extract in DuckDB, so
    record length, parsed fields, and the ok flag are all exact."""
    docs = read_table(configure(spark), sf_dir, "documents")
    rec = serdes.encode_warc(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id")),
        F.col("text"),
        F.col("doc_id"),
    )
    parsed = docs.select(F.col("doc_id"), rec.alias("__rec")).select(
        F.col("doc_id"),
        F.octet_length(F.col("__rec")).cast("long").alias("rec_len"),
        serdes.decode_warc(F.col("__rec")).alias("__p"),
    )
    return parsed.select(
        "doc_id",
        "rec_len",
        F.col("__p.uri").alias("uri"),
        F.col("__p.content_length").alias("content_length"),
        F.octet_length("__p.payload").cast("long").alias("payload_octets"),
        F.col("__p.ok").alias("ok"),
    )


def q115_perplexity_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity tiles (llmops.perplexity_buckets):
    unigram-LM cross-entropy scores (integer-quantized) tiled into
    head/middle/tail per lang with doc_id tie-breaks, so the ntile
    assignment is total-order exact.  The oracle reruns the scoring CTE of
    q97 and the same ntile window in DuckDB."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.perplexity_buckets(docs, "doc_id", "text", "lang", n_buckets=3)


def q116_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (llmops.bm25_topk) for the query {join, window,
    shuffle} over the documents corpus — Lucene idf, tf saturation, length
    normalization, per-(doc,term) contributions floor-quantized before the
    integer per-doc sum, ranking tie-broken by doc_id.  The oracle recomputes
    document lengths, df, avgdl, and the identical quantized formula."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.bm25_topk(docs, "doc_id", "text", ["join", "window", "shuffle"], k=10)


def q117_corpus_report(spark, sf_dir):
    """Per-(source, lang) corpus dashboard (llmops.corpus_report): doc
    counts, exact-dup counts (same md5 digest as exact_dedup), token/byte
    volume, mean tokens.  Single-pass grouped aggregation; the oracle
    recomputes every column including the HOF token counts."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.corpus_report(docs, "doc_id", "text", "source", "lang")


def q118_token_budget_mixture(spark, sf_dir):
    """Token-budget mixture sampling (llmops.sample_to_token_budget): keep
    rates derive from per-language TOKEN mass (en gets 50% of a 20k-token
    budget, fr 25%, others drop), applied via the deterministic md5-bucket
    rule — the unit training mixes are actually specified in.  The oracle
    recomputes token sums, thresholds, and the bucket filter; the share ×
    budget numerators are exact binary fractions so both engines hold the
    identical double."""
    docs = read_table(configure(spark), sf_dir, "documents")
    out = llmops.sample_to_token_budget(
        docs, "doc_id", "text", "lang", {"en": 0.5, "fr": 0.25}, 20_000, salt="tb:"
    )
    return out.select("doc_id", "lang")


def q119_incremental_dedup(spark, sf_dir):
    """Continuous-ingestion exact dedup (llmops.exact_dedup_incremental):
    history = digests of doc_id < 250; batch = doc_id ≥ 200 plus planted
    in-batch copies of docs 300–309 under shifted ids.  Rows 200–249 fall
    to the history anti-join, the planted copies fall to the in-batch
    min-id rule — both deduplication paths live in one result the oracle
    reproduces with NOT EXISTS + min()."""
    docs = read_table(configure(spark), sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") < 250).select(F.md5("text").alias("fp"))
    base = docs.filter(F.col("doc_id") >= 200).select("doc_id", "text")
    planted = (
        docs.filter(F.col("doc_id").between(300, 309))
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    batch = base.unionByName(planted)
    return llmops.exact_dedup_incremental(batch, seen, "doc_id", "text")


def q120_corpus_diff(spark, sf_dir):
    """Snapshot diff (llmops.corpus_diff): old = docs 0–399 as-is; new =
    docs 100–499 with 150–159's text uppercased — yielding all four
    statuses (0–99 removed, 400–499 added, 150–159 changed, rest
    unchanged).  Digest-only join; the oracle mirrors it with a FULL OUTER
    JOIN over md5 digests."""
    docs = read_table(configure(spark), sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 400).select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") >= 100)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id").between(150, 159), F.upper(F.col("text"))
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    return llmops.corpus_diff(old, new, "doc_id", "text")


def q121_leakage_free_split(spark, sf_dir):
    """Leakage-free split assignment (llmops.leakage_free_split) over the
    corpus plus planted exact duplicates of docs 0–49 under shifted ids:
    the split hash is over the CONTENT digest, so each planted copy must
    land in the same split as its original (checked by the oracle, which
    recomputes the same md5 per-mille bucketing)."""
    docs = read_table(configure(spark), sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    out = llmops.leakage_free_split(corpus, "doc_id", "text", salt="sp:")
    return out.select("doc_id", "split")


def q122_sentence_chunks(spark, sf_dir):
    """Sentence-boundary chunking (llmops.sentence_chunks): the corpus has
    no punctuation, so the query synthesizes a period after every 8th token
    (regexp_replace, like q87 plants paragraph breaks), then chunks whole
    sentences into ≈64-token windows via the integer running-sum rule.  The
    oracle reproduces the sentence split (ordinality via list_transform over
    range), the ROWS-frame cumulative sum, and the ordered string_agg
    reassembly."""
    docs = read_table(configure(spark), sf_dir, "documents")
    sentenced = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"((\S+ ){7}\S+) ", r"$1. ").alias("text"),
    )
    return llmops.sentence_chunks(sentenced, "doc_id", "text", max_tokens=64)


def q123_ngram_novelty(spark, sf_dir):
    """Per-doc bigram novelty (llmops.ngram_novelty): fraction of a doc's
    distinct bigrams with corpus document-frequency 1, floor-quantized from
    integer counts.  The oracle recomputes distinct (doc, gram) pairs, df,
    and the quantized ratio."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.ngram_novelty(docs, "doc_id", "text", n=2)


def q124_profile_columns(spark, sf_dir):
    """One-pass column profiler (llmops.profile_columns) over lineitem:
    non-null/null/distinct counts and string-cast min/max for five mixed-
    type columns, unpivoted to one row per column.  The oracle is a UNION
    ALL of per-column aggregates with the same VARCHAR casts."""
    li = read_table(configure(spark), sf_dir, "lineitem")
    return llmops.profile_columns(
        li, ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"]
    )


def q125_normalize_text(spark, sf_dir):
    """Text normalization (llmops.normalize_text) over documents with
    synthetic damage injected in-query (control chars, tab runs, padded
    newlines, triple blank lines) so every cleaning rule fires; returns the
    cleaned text plus before/after byte lengths and a digest.  The oracle
    applies the identical RE2 replacement chain in DuckDB."""
    docs = read_table(configure(spark), sf_dir, "documents")
    damaged = docs.select(
        "doc_id",
        F.concat(
            F.lit("\x01  \t "),
            F.regexp_replace(F.col("text"), r" (\S+ \S+ \S+) ", " $1 \t\n\n\n "),
            F.lit(" \x02\t"),
        ).alias("text"),
    )
    out = llmops.normalize_text(damaged, "text", out_col="clean")
    return out.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("dirty_bytes"),
        F.octet_length("clean").cast("long").alias("clean_bytes"),
        F.md5("clean").alias("clean_fp"),
    )


def q126_matryoshka(spark, sf_dir):
    """Matryoshka truncate + renormalize (llmops.matryoshka_embeddings) to
    the leading 16 dims, components floor-quantized ×10000 and joined into
    a signature string.  Exactness hinges on the LEFT-FOLD sum of squares
    (0.0-init aggregate ≡ DuckDB list_reduce) making sqrt/divide/floor see
    identical doubles — the oracle mirrors that fold exactly."""
    emb = read_table(configure(spark), sf_dir, "embeddings")
    return llmops.matryoshka_embeddings(emb, "vec_id", "embedding", dims=16)


def q127_fuzzy_editdist(spark, sf_dir):
    """Edit-distance near-dup pairs (llmops.fuzzy_pairs_editdist) over the
    corpus plus planted small-edit copies (docs 0–39 with one marker word
    appended, ids +20000) — shared-prefix bucketing finds each planted
    pair, levenshtein over 256-char probes verifies it.  The oracle
    replays bucket capping (row_number), the capped self-join, and
    DuckDB's identical levenshtein."""
    docs = read_table(configure(spark), sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    return llmops.fuzzy_pairs_editdist(corpus, "doc_id", "text")


def q128_length_outliers(spark, sf_dir):
    """Robust per-language length outliers (llmops.length_outliers):
    median ± 3·MAD over token counts, with planted megadocs (docs 0–4's
    text repeated 30×, ids +30000) that a mean/stddev rule would let mask
    themselves.  The oracle recomputes both interpolated medians and the
    k·MAD comparison."""
    docs = read_table(configure(spark), sf_dir, "documents")
    mega = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 30_000).alias("doc_id"),
        "lang",
        F.concat_ws(" ", F.array_repeat(F.col("text"), 30)).alias("text"),
    )
    corpus = docs.select("doc_id", "lang", "text").unionByName(mega)
    return llmops.length_outliers(corpus, "doc_id", "text", "lang", k=3.0)


def q129_curation_v2(spark, sf_dir):
    """End-to-end curation pipeline v2 — ONE composed plan chaining this
    round's operators: normalize_text (planted double-space copies of docs
    0–29, ids +40000, canonicalize back to their originals) → hashed
    classifier keep-filter → exact dedup (the normalized copies collapse
    onto their originals and drop) → token-window chunking → leakage-free
    split over chunk digests.  The oracle composes the q125/q113/q42/q80/
    q121 SQL stages over the same planted corpus."""
    docs = read_table(configure(spark), sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 40_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), " ", "  ").alias("text"),
    )
    # spread AND persist the single-row-group scan before the expression-
    # heavy stages: without the spread the normalize+classifier chain
    # serializes on one task, and without the persist boundary Catalyst
    # pushes the classifier filter back below the repartition onto that
    # same single task (at corpus scale the scan has thousands of splits
    # and pushdown into it is exactly what you want — this compensates the
    # one-row-group test file only)
    corpus = llmops._persist(llmops._spread(docs.select("doc_id", "text").unionByName(planted)))
    clean = llmops.normalize_text(corpus, "text")
    # inline score expression + min-id-per-digest window: every stage is a
    # narrow map or a single window shuffle, so the whole pipeline is ONE
    # linear plan with no self-joins (the r4 bench showed the join form
    # recomputing the normalize+classifier chain 4x)
    kept = clean.filter(llmops.classifier_score_expr(F.col("text")) >= 0)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.col("doc_id"))
    surv = kept.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    chunks = llmops.chunk_text(surv, "doc_id", "text", max_tokens=32, overlap=8)
    out = llmops.leakage_free_split(chunks, "chunk_idx", "chunk_text", salt="cv2:")
    return out.select("doc_id", "chunk_idx", "n_tokens_chunk", "split")


def q130_shuffle_shards(spark, sf_dir):
    """Deterministic global shuffle into training shards
    (llmops.shuffle_shards): pseudo-random shard in [0,64) plus dense
    in-shard position, both pure functions of (seed, doc_id) via the
    portable md5 key.  The oracle recomputes the identical hash, modulus,
    and per-shard row_number in DuckDB — order itself is checked, not just
    membership."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.shuffle_shards(docs, "doc_id", n_shards=64, seed=42)


def q131_strip_boilerplate(spark, sf_dir):
    """Boilerplate-paragraph removal (llmops.strip_boilerplate): a cookie-
    banner paragraph appended to every third document (df ≈ n/3 ≫ 5) is
    deleted from all of them, while content paragraphs below the df
    threshold survive in order.  The oracle recomputes paragraph document
    frequency and the keep/strip reassembly in DuckDB."""
    docs = read_table(configure(spark), sf_dir, "documents")
    damaged = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" spark BOILER cookie notice accept all")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return llmops.strip_boilerplate(damaged, "doc_id", "text", min_docs=5, sep=" spark ")


def q132_event_sequences(spark, sf_dir):
    """Behavioral sequence packing (llmops.event_sequences): each user's
    time-ordered event history cut into non-overlapping 16-event training
    sequences; the event-id order inside every sequence is serialized to a
    string so the oracle checks the exact ordering, not just membership."""
    ev = read_table(configure(spark), sf_dir, "events")
    seqs = llmops.event_sequences(ev, "user_id", "ts", "event_id", seq_len=16)
    return seqs.select(
        "user_id",
        "seq_idx",
        "n_events",
        F.array_join(F.transform(F.col("vals"), lambda v: v.cast("string")), ",").alias("val_seq"),
        "t_start_ms",
        "t_end_ms",
    )


def q133_semantic_decontam(spark, sf_dir):
    """Embedding-level decontamination (llmops.semantic_decontaminate):
    every 7th corpus vector doubles as a 'benchmark' row (ids +50000);
    train rows identical to a benchmark vector (cosine 1.0 ≥ 0.95) must be
    flagged with that benchmark as best hit.  Natural cross-pairs top out
    near cosine 0.5, so the brute-force DuckDB oracle is exact while the
    Spark side exercises the bucketed-LSH + broadcast-probe path."""
    emb = read_table(configure(spark), sf_dir, "embeddings").select("vec_id", "embedding")
    bench = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding"
    )
    return llmops.semantic_decontaminate(emb, bench, dim=64, threshold=0.95)


def q134_minhash_incremental(spark, sf_dir):
    """Incremental near-dup vs a historical signature store
    (llmops.minhash_signatures + minhash_lsh_incremental): history =
    docs 0–249 reduced to (id, sig) rows; the new batch (docs 250+ plus
    planted +60000 copies of history docs 0–19) compares against the store
    and itself via band collisions, verified with the signature-estimated
    Jaccard.  History text is never re-read — the day-2 continuous-
    ingestion shape.  The oracle recomputes the portable signatures,
    the banded candidate rule, and the exact k/64 estimator."""
    docs = read_table(configure(spark), sf_dir, "documents")
    history = docs.filter(F.col("doc_id") < 250).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 60_000).alias("doc_id"), "text"
    )
    new = docs.filter(F.col("doc_id") >= 250).select("doc_id", "text").unionByName(planted)
    hs = llmops.minhash_signatures(history, "doc_id", "text", portable=True)
    ns = llmops.minhash_signatures(new, "doc_id", "text", portable=True)
    return llmops.minhash_lsh_incremental(hs, ns, "doc_id", threshold=0.9)


def q135_warc_html_extract(spark, sf_dir):
    """Web-ingestion front half as ONE plan: synthesize an HTML page per
    document (head style/script blocks, <h1>, paragraph tags from the
    ' spark ' splits, an entity-laden footer), ship it through the WARC
    codec (serdes.encode_warc → decode_warc, octet-exact), and extract
    plain text with llmops.strip_html.  The oracle rebuilds the identical
    HTML and applies the same RE2 chain; the WARC leg's exactness is
    q114's proven codec, so the oracle reads the page directly."""
    docs = read_table(configure(spark), sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><style>p{margin:0}</style>"
              "<script>tracker(1 < 2)</script></head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit(" spark "), F.lit("</p><p>")),
        F.lit("</p><p>Tom &amp; Jerry &lt;3 &quot;quoted&quot;</p></body></html>"),
    )
    rec = serdes.encode_warc(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id")),
        html,
        F.col("doc_id"),
    )
    parsed = docs.select("doc_id", serdes.decode_warc(rec).alias("__p"))
    plain = llmops.strip_html(
        parsed.select(
            "doc_id", F.col("__p.ok").alias("ok"), F.col("__p.payload").alias("payload")
        ),
        "payload",
        out_col="text_plain",
    )
    return plain.select(
        "doc_id",
        "ok",
        F.octet_length("payload").cast("long").alias("html_octets"),
        F.octet_length("text_plain").cast("long").alias("plain_octets"),
        F.md5("text_plain").alias("plain_fp"),
    )


def q136_cluster_balanced(spark, sf_dir):
    """Cluster-balanced corpus selection (llmops.cluster_balanced_sample):
    Voronoi-assign every embedding to one of 8 hash-sample cells (the
    oracle-portable IVF index build of q71), then keep exactly 20 rows per
    cell by the deterministic md5 rank.  The oracle rebuilds the identical
    centroids, argmin assignment, and ranked quota."""
    emb = read_table(configure(spark), sf_dir, "embeddings").select("vec_id", "embedding")
    out = llmops.cluster_balanced_sample(
        emb, per_cluster=20, n_lists=8, init="hash_sample", salt="cb:"
    )
    return out.select("vec_id", F.col("cluster").cast("long").alias("cluster"))


def q137_vocab_drift(spark, sf_dir):
    """Snapshot vocabulary drift (llmops.vocab_drift): old = docs 0–249,
    new = docs 250+ with a planted ' driftterm driftterm' suffix on every
    even doc — the report's top rows must show driftterm surging (cnt_old
    0, large positive dlog_q).  The oracle recomputes both token counts,
    the smoothed log-ratio, and the volume-ordered top-50."""
    docs = read_table(configure(spark), sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") >= 250).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" driftterm driftterm")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return llmops.vocab_drift(old, new, "text", k=50)


def q138_dedup_priority(spark, sf_dir):
    """Priority-aware exact dedup (llmops.exact_dedup_priority): planted
    copies of docs 0–39 arrive from a higher-priority source (src99), so
    the copy must win its digest group while unique docs keep themselves —
    'keep the best copy', not 'keep the first'.  The oracle replays the
    (priority DESC, id ASC) winner rule per digest."""
    docs = read_table(configure(spark), sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 70_000).alias("doc_id"), "text", F.lit("src99").alias("source")
    )
    corpus = docs.select("doc_id", "text", "source").unionByName(planted)
    pr = corpus.withColumn("priority", F.substring("source", 4, 8).cast("int"))
    return llmops.exact_dedup_priority(pr, "doc_id", "text", "priority")


def q139_histogram(spark, sf_dir):
    """Fixed-width histogram (llmops.histogram) of l_extendedprice over
    [0, 100000) in 20 bins — the top of the price range lands in the
    overflow bin, checking the edge rules; counts and exact double bin
    edges replay in SQL."""
    li = read_table(configure(spark), sf_dir, "lineitem")
    return llmops.histogram(li, "l_extendedprice", lo=0.0, hi=100_000.0, n_bins=20)


def q140_fuzzy_keep_best(spark, sf_dir):
    """Keep-best fuzzy dedup as one composition (llmops.dedup_keep_best):
    edit-distance pairs (q127's planted ' zq' copies, now arriving from
    the higher-priority source src99) → connected components → per-cluster
    winner by (priority DESC, id) — so each planted copy REPLACES its
    original, and untouched docs survive.  The oracle composes the q127
    pair SQL with a recursive-CTE closure and the same winner rule."""
    docs = read_table(configure(spark), sf_dir, "documents")
    planted = docs.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
        F.lit("src99").alias("source"),
    )
    corpus = docs.select("doc_id", "text", "source").unionByName(planted)
    pr = corpus.withColumn("priority", F.substring("source", 4, 8).cast("int"))
    pairs = llmops.fuzzy_pairs_editdist(pr, "doc_id", "text")
    out = llmops.dedup_keep_best(pr, pairs, "doc_id", "priority")
    return out.select("doc_id", "priority")


def q141_rate_anomaly(spark, sf_dir):
    """Per-type rate-spike detection (analytics.rate_anomaly): hourly event
    counts vs the trailing 6-window mean, with a planted 3x click burst in
    the 2024-01-05T00 hour.  The anomaly rule is division- and sqrt-free
    (dev² > k²·var_n over pure integers), so the oracle replays it
    bit-for-bit — no float threshold anywhere."""
    ev = read_table(configure(spark), sf_dir, "events").select("event_id", "ts", "event_type")
    lo = F.lit("2024-01-05 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-05 01:00:00").cast("timestamp")
    in_burst = (F.col("ts") >= lo) & (F.col("ts") < hi) & (F.col("event_type") == "click")
    b1 = ev.filter(in_burst).select((F.col("event_id") + 1_000_000).alias("event_id"), "ts", "event_type")
    b2 = ev.filter(in_burst).select((F.col("event_id") + 2_000_000).alias("event_id"), "ts", "event_type")
    corpus = ev.unionByName(b1).unionByName(b2)
    return analytics.rate_anomaly(corpus, "ts", "event_type", 3_600_000, trail=6, k=3)


def q142_windowed_topk(spark, sf_dir):
    """Windowed heavy hitters (analytics.windowed_topk): top-3 event types
    per tumbling day, rank and counts integer-exact; ties break on the key
    so both engines rank identically."""
    ev = read_table(configure(spark), sf_dir, "events")
    return analytics.windowed_topk(ev, "ts", "event_type", 86_400_000, k=3)


def q143_funnel(spark, sf_dir):
    """Strictly-ordered funnel (analytics.funnel): view → click → purchase
    per user with a 7-day conversion window; sᵢ semantics (earliest step-i
    event at/after sᵢ₋₁) replayed in the oracle via conditional left joins.
    Users whose clicks all precede their first view must stop at step 1 —
    the join-condition (not post-filter) shape under test."""
    ev = read_table(configure(spark), sf_dir, "events")
    return analytics.funnel(
        ev, "ts", "user_id", "event_type",
        ("view", "click", "purchase"), within_ms=7 * 86_400_000,
    )


def q144_cohort_retention(spark, sf_dir):
    """Cohort retention triangle (analytics.cohort_retention): users
    bucketed by the week of their first event, counted per weeks-since-
    cohort — all integer window floors and counts, replayed exactly in
    SQL."""
    ev = read_table(configure(spark), sf_dir, "events")
    return analytics.cohort_retention(ev, "ts", "user_id", 604_800_000)


def q145_hybrid_search(spark, sf_dir):
    """Hybrid lexical→semantic retrieval (llmops.hybrid_topk): BM25 top-50
    candidates for {join, window, shuffle}, reranked by quantized cosine to
    the vec_id=7 embedding (doc ids double as vector ids).  The oracle
    composes the q116 BM25 SQL with the identical cosine rerank and total
    order."""
    docs = read_table(configure(spark), sf_dir, "documents")
    emb = read_table(configure(spark), sf_dir, "embeddings").select("vec_id", "embedding")
    qv = emb.filter(F.col("vec_id") == 7)
    return llmops.hybrid_topk(
        docs, emb, ["join", "window", "shuffle"], qv, k_lexical=50, k=10
    )


def q146_sessionize(spark, sf_dir):
    """Event-level sessionization (analytics.sessionize): every event gets
    its user's 1-based session ordinal (30-min gap rule) and its position
    inside the session — the event-granular dual of the q61 session-window
    aggregate, integer epoch-ms arithmetic throughout."""
    ev = read_table(configure(spark), sf_dir, "events")
    return analytics.sessionize(ev, "ts", "user_id", "event_id", 30 * 60_000)


def q147_url_dedup(spark, sf_dir):
    """URL canonicalization dedup (llmops.url_dedup): five messy variants
    of the same logical URL per document (uppercase host, :443 port,
    fragment, trailing slash, shuffled query order) must collapse to ONE
    canonical row with the lowest id.  The oracle replays the identical
    normalization chain."""
    docs = read_table(configure(spark), sf_dir, "documents")
    base = docs.select("doc_id", "source")
    v = [
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/a/b?x=1&y=2")),
        F.concat(F.lit("HTTPS://"), F.upper(F.col("source")), F.lit(".EXAMPLE.com/a/b?y=2&x=1")),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com:443/a/b/?x=1&y=2")),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/a/b?x=1&y=2#frag")),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/other")),
    ]
    rows = None
    for i, url in enumerate(v):
        part = base.select((F.col("doc_id") * 10 + i).alias("row_id"), url.alias("url"))
        rows = part if rows is None else rows.unionByName(part)
    return llmops.url_dedup(rows, "row_id", "url")


def q148_temporal_split(spark, sf_dir):
    """Temporal train/val/test split (llmops.temporal_split) over the
    events log: train < Jan 20, val < Jan 25, test after — the strictly-
    later evaluation rule, summarized per (event_type, split) so the
    oracle checks the boundary assignment exactly."""
    ev = read_table(configure(spark), sf_dir, "events")
    out = llmops.temporal_split(
        ev,
        "ts",
        val_start_ms=1_705_708_800_000,   # 2024-01-20T00:00:00Z
        test_start_ms=1_706_140_800_000,  # 2024-01-25T00:00:00Z
    )
    return out.groupBy("event_type", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(F.col("event_id")).alias("min_id"),
    )


def q149_profile_approx(spark, sf_dir):
    """Sketch-mode column profiler (llmops.profile_columns approx=True) —
    the 100 TB path: HyperLogLog++ ndv registers instead of the exact
    multi-distinct Expand-×N plan (the absence of the Expand node is pinned
    by tests/test_plans.py::test_profile_columns_approx_has_no_expand).
    Oracle discipline mirrors q105: exact columns are recomputed by both
    engines; ndv_ok = |hll − exact| ≤ 3·rsd·exact is computed Spark-side
    against Spark's own exact profile, TRUE literal in the oracle."""
    li = read_table(configure(spark), sf_dir, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"]
    # r13 optimization: the original ap-join-ex composition scanned lineitem
    # twice and joined two aggregates; profile_ndv_audit computes the same
    # six output columns (bit-identical arithmetic) in ONE aggregation pass
    return llmops.profile_ndv_audit(li, cols, rsd=0.02)


def q150_rate_anomaly_time(spark, sf_dir):
    """Time-based rate-spike detection (analytics.rate_anomaly_time): the
    trailing baseline is 6 WALL-CLOCK hours (empty slots count as zeros via
    the fixed-denominator algebra — no densify explode), vs q141's last-6-
    non-empty-windows rule.  A synthetic sparse key (every 97th event) has
    real calendar gaps, so the two definitions genuinely diverge on this
    data; the RANGE-frame arithmetic is integer-exact and replayed
    bit-for-bit by the oracle."""
    ev = read_table(configure(spark), sf_dir, "events").select("event_id", "ts", "event_type")
    sparse = ev.filter(F.col("event_id") % 97 == 0).select(
        "event_id", "ts", F.lit("sparse_probe").alias("event_type")
    )
    corpus = ev.unionByName(sparse)
    return analytics.rate_anomaly_time(corpus, "ts", "event_type", 3_600_000, trail=6, k=3)


def q151_jaccard_exact(spark, sf_dir):
    """EXACT set-similarity self-join (llmops.jaccard_pairs_exact): every
    document pair with 3-gram Jaccard ≥ 0.4, found via rarity-ordered
    prefix filtering (AllPairs/PPJoin family) — complete by construction,
    the deterministic complement of q43's probabilistic LSH at the same
    threshold.  Integer (inter_n, union_n) outputs; the oracle brute-forces
    all pairs with the identical shingle definition, so any recall loss in
    the prefix filter is a hash mismatch."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.jaccard_pairs_exact(docs, "doc_id", "text", threshold=0.4)


def q152_windowed_distinct(spark, sf_dir):
    """Per-(event_type, hour) distinct users via HLL++ sketches
    (analytics.windowed_distinct) — the canonical streaming cardinality
    metric, sketched because exact per-window count(DISTINCT) shuffles
    every (key, window, user) triple at 100 TB.  q105-style contract
    oracle: exact row/user counts recomputed by both engines, users_ok =
    |sketch − exact| ≤ max(3·rsd·exact, √exact, 1) computed Spark-side,
    TRUE in SQL.  The √exact floor is the small-cardinality term: 3·rsd·n
    is HLL's ASYMPTOTIC bound, while at n≈30 the estimator's error is
    collision-dominated and scales ~√n — the r12 full-sf0.1 sweep caught
    the pure-relative bound failing on 16/3600 windows (|err| ≤ 3 at
    n≈12–51, bound 1.86) that the sf0.01 gate's tinier windows never
    exposed."""
    ev = read_table(configure(spark), sf_dir, "events")
    # r13: the original sketch-groupBy ⋈ exact-groupBy composition scanned
    # events twice and joined; windowed_distinct_audit produces the same
    # numbers (HLL registers are duplicate-insensitive, so the sketch over
    # deduped ids is bit-identical) in one scan with no join
    au = analytics.windowed_distinct_audit(
        ev, "ts", "event_type", "user_id", 3_600_000, rsd=0.02
    )
    return au.select(
        "event_type",
        "w_start_ms",
        "n_events",
        "users_exact",
        (
            F.abs(F.col("ids_approx") - F.col("users_exact"))
            <= F.greatest(
                F.lit(3 * 0.02) * F.col("users_exact"),
                F.sqrt(F.col("users_exact")),
                F.lit(1.0),
            )
        ).alias("users_ok"),
    )


def q153_domain_blocklist(spark, sf_dir):
    """Curation feedback loop (llmops.domain_blocklist over
    classifier_score_expr): per-source mean quality decides a crawl-level
    block decision — sources whose mean hashed-classifier score is negative
    over ≥ 20 docs.  A planted 'spamfarm.example' source (every 5th doc,
    score shifted hard negative) must come back blocked=TRUE; the natural
    sources stay unblocked.  Exact-decimal score sums (no float-order
    wiggle); the oracle recomputes the full classifier model per doc
    (q113's SQL) and the decimal aggregate decision."""
    docs = read_table(configure(spark), sf_dir, "documents")
    score = llmops.classifier_score_expr(F.col("text"), n_features=4096)
    # score ONCE (the expensive text pass), then both union branches read
    # the tiny (id, source, score) projection — not a second corpus scan
    scored_all = llmops._persist(
        docs.select("doc_id", "source", score.alias("score_q"))
    )
    scored = scored_all.select("source", "score_q")
    planted = scored_all.filter(F.col("doc_id") % 5 == 0).select(
        F.lit("spamfarm.example").alias("source"),
        (F.col("score_q") - F.lit(100_000)).alias("score_q"),
    )
    return llmops.domain_blocklist(
        scored.unionByName(planted), "source", "score_q", min_docs=20, max_mean_score=0.0
    )


def q154_lsh_recall_audit(spark, sf_dir):
    """Recall audit of banded MinHash-LSH vs the exact prefix-filter join
    (llmops.lsh_recall_audit) at threshold 0.4 with the portable base hash:
    the oracle recomputes BOTH sides in SQL — brute-force ground truth and
    the full 64-permutation banded LSH simulation — and the same one-row
    summary, so the measured recall number itself is hash-checked."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.lsh_recall_audit(docs, "doc_id", "text", threshold=0.4, portable=True)


def q154_lsh_summary(spark, sf_dir):
    """Production-cost half of q154 (r11 verdict task 6): the SAME one-row
    summary shape at the cost of banded LSH pair generation + verify alone
    (llmops.lsh_recall_audit(audit=False) — truth-dependent fields NULL).
    This is the entry the headline bench measures; the full recall audit
    (q154_lsh_recall_audit) keeps its brute-force ground truth as an
    offline, oracle-exact audit tool — inherently ~2× the production
    cost, like q90's brute-force oracle vs clusters_over_lsh_pairs."""
    docs = read_table(configure(spark), sf_dir, "documents")
    return llmops.lsh_recall_audit(
        docs, "doc_id", "text", threshold=0.4, portable=True, audit=False
    )


def q155_wav_decode(spark, sf_dir):
    """REAL multimodal decode path (uncompressed audio): synthesize genuine
    RIFF/WAVE containers (struct-packed per the WAV spec — 16-bit mono
    integer-PCM ramps parameterized by doc_id, llmops.synth_wav), decode
    them with CPython's INDEPENDENT stdlib `wave` parser inside
    Arrow-batched mapInPandas (llmops.decode_wav_features), and emit
    integer-exact audio features.  The oracle recomputes every feature from
    the synthesis PARAMETERS alone — generate_series ramp algebra for
    peak/Σsample², the 44-byte-header formula for the wire length — so a
    byte-level bug in either the encoder's header math or the decoder's
    parse breaks the hash.  Closes the multimodal-decode gap for audio;
    compressed image/video codecs still gate on absent external libraries
    (llmops.decode_image_batches stub).  Reference has no multimodal surface
    at all (SURVEY: extension)."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(100) + F.col("doc_id") % 50).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
    )
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    return llmops.decode_wav_features(wav, "doc_id", "payload")


def q156_wav_frames(spark, sf_dir):
    """Frame-level audio energy (llmops.wav_frame_energy) over the same
    synthesized-but-real WAV corpus as q155: 64-sample frames, tail frame
    partial, integer-exact peak/Σsample² per frame.  Oracle: the ramp
    algebra grouped by i // 64 — the 1→N fan-out (frame count per doc) and
    every frame's stats are all recomputed from parameters."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(100) + F.col("doc_id") % 50).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
    )
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    return llmops.wav_frame_energy(wav, "doc_id", "payload", frame_len=64)


def q157_wav_trim(spark, sf_dir):
    """Full audio decode → transform → re-encode roundtrip: synthesize WAVs
    with planted leading/trailing silence (zero samples, llmops.synth_wav
    pre/post), endpoint-trim them frame-aligned (llmops.wav_trim_silence,
    16-sample frames, peak threshold 0), then DECODE THE RE-ENCODED payloads
    (llmops.decode_wav_features) — so a bug anywhere in the loop (trim
    bounds, re-pack header math, container parse) breaks the hash.  Oracle:
    the padded ramp, per-frame peaks, active-frame bounds, kept-sample
    count/stats, and the 44-byte-header wire length are all recomputed in
    SQL from the parameters alone."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(80) + F.col("doc_id") % 40).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
        (F.col("doc_id") % 37).alias("pre"),
        (F.col("doc_id") % 23).alias("post"),
    )
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b", pre_col="pre", post_col="post")
    trimmed = llmops.wav_trim_silence(wav, "doc_id", "payload", frame_len=16, max_peak=0)
    return llmops.decode_wav_features(trimmed, "doc_id", "payload")


def q160_wav_downsample(spark, sf_dir):
    """Audio decimation resample roundtrip (llmops.wav_downsample, factor 3
    box filter): the downsampled payloads are decoded again and the oracle
    recomputes the output rate (rate // 3), sample count (n // 3), wire
    length, and every floor-mean output sample's peak/Σ² from the synthesis
    parameters — floor() written explicitly in SQL because numpy's //
    floors while SQL integer division truncates on negative sums."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(100) + F.col("doc_id") % 50).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
    )
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    small = llmops.wav_downsample(wav, "doc_id", "payload", factor=3)
    return llmops.decode_wav_features(small, "doc_id", "payload")


def q161_credit_card_luhn(spark, sf_dir):
    """Payment-card detection with Luhn validation
    (llmops.credit_card_stats): every document gets a planted 16-digit
    number derived from its doc_id — even doc_ids get the CORRECT Luhn
    check digit, odd doc_ids get check+5 (provably invalid) — so
    n_candidates counts the digit-run extraction and n_valid counts only
    checksum-passing numbers.  The oracle re-derives the planted numbers
    AND re-implements the whole Luhn algorithm independently in SQL
    (list_transform over reversed digits with the doubling rule), so a
    checksum bug on either side breaks the hash.  Candidates are maximal
    digit runs filtered to 13–19 digits AFTER normalization, keeping RE2
    and Java regex semantics aligned."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id", "text")
    base = F.lpad(
        ((F.col("doc_id") * 7919 + 123456789) % F.lit(10**15)).cast("string"), 15, "0"
    )
    chk = llmops.luhn_check_digit(base)
    cc = F.concat(
        base,
        F.when(F.col("doc_id") % 2 == 0, chk).otherwise((chk + 5) % 10).cast("string"),
    )
    corpus = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), cc).alias("text")
    )
    return llmops.credit_card_stats(corpus, "doc_id", "text")


def q162_iban_mod97(spark, sf_dir):
    """IBAN detection with mod-97 validation (llmops.iban_stats): each
    document carries a planted German-format IBAN built from its doc_id —
    an 18-digit BBAN plus check digits computed by the ISO rule for even
    doc_ids and shifted by 50 (mod 97, provably invalid) for odd ones.
    The Spark side validates via the per-character fold; the oracle maps
    D→13/E→14 and computes the FULL rearranged 24-digit number modulo 97
    with DuckDB's native HUGEINT — two independent implementations of the
    checksum arithmetic."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    bban = F.lpad(
        ((F.col("doc_id") * 104729 + 987654321) % F.lit(10**18)).cast("string"), 18, "0"
    )
    # correct check: 98 − (bban·10⁶ + 131400) mod 97, via the same fold trick
    chars = F.filter(F.split(F.concat(bban, F.lit("131400")), ""), lambda c: c != F.lit(""))
    m = F.aggregate(chars, F.lit(0).cast("long"), lambda a, c: (a * 10 + (F.ascii(c) - 48)) % 97)
    chk = F.lit(98) - m
    cc = F.when(F.col("doc_id") % 2 == 0, chk).otherwise((chk + 50) % 97)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("invoice IBAN DE"), F.lpad(cc.cast("string"), 2, "0"), bban, F.lit(" due")
        ).alias("text"),
    )
    return llmops.iban_stats(corpus, "doc_id", "text")


def q163_audio_pipeline(spark, sf_dir):
    """Composed audio curation pipeline as ONE plan — the multimodal
    analog of q89/q129: synthesize WAVs with planted endpoint silence,
    trim it (16-sample frames, peak 0), decimate by 2 (floor-mean), and
    decode the final payloads.  Three chained Arrow mapInPandas stages,
    no shuffle anywhere; the oracle recomputes the WHOLE composition —
    padded ramp → frame peaks → trim bounds → kept-sequence positions →
    per-block floor-means → final stats and wire length — from the
    synthesis parameters alone, so any stage breaking the chain breaks
    the hash."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(80) + F.col("doc_id") % 40).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
        (F.col("doc_id") % 37).alias("pre"),
        (F.col("doc_id") % 23).alias("post"),
    )
    wav = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b", pre_col="pre", post_col="post")
    trimmed = llmops.wav_trim_silence(wav, "doc_id", "payload", frame_len=16, max_peak=0)
    small = llmops.wav_downsample(trimmed, "doc_id", "payload", factor=2)
    return llmops.decode_wav_features(small, "doc_id", "payload")


def _ppm_params(spark, sf_dir):
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    return docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.lit(1) + F.col("doc_id") % 5).alias("a"),
        (F.col("doc_id") % 251).alias("b"),
    )


def q158_ppm_decode(spark, sf_dir):
    """REAL image decode for the uncompressed Netpbm container: synthesize
    genuine binary-PPM (P6) images (hand-written header + channel-offset
    pixel ramps, llmops.synth_ppm), parse them back with the independent
    spec parser (llmops.decode_ppm_features — magic, whitespace/comment
    header tokenization, maxval, raw pixel block), and emit integer-exact
    per-channel sums.  The oracle recomputes dimensions, the header-length
    arithmetic (digit counts of w and h!), and every channel sum from the
    synthesis parameters alone.  Image twin of q155; compressed formats
    stay library-gated (llmops.decode_image_batches stub)."""
    wav = llmops.synth_ppm(_ppm_params(spark, sf_dir), "doc_id", "w", "h", "a", "b")
    return llmops.decode_ppm_features(wav, "doc_id", "payload")


def q159_ppm_resize(spark, sf_dir):
    """Image decode → block-mean resize → RE-ENCODE roundtrip
    (llmops.resize_ppm_blockmean, 4×4 integer floor-mean tiles,
    crop-to-multiple): the resized payloads are decoded AGAIN and every
    feature of the small image — dimensions, header length, per-channel
    sums of the floor-means — is recomputed by the oracle from parameters.
    Image twin of the q157 audio trim roundtrip."""
    ppm = llmops.synth_ppm(_ppm_params(spark, sf_dir), "doc_id", "w", "h", "a", "b")
    small = llmops.resize_ppm_blockmean(ppm, "doc_id", "payload", block=4)
    return llmops.decode_ppm_features(small, "doc_id", "payload")


def q164_png_decode(spark, sf_dir):
    """REAL compressed-image decode with ONLY the stdlib: synthesize genuine
    PNGs (the q158 pixel ramp pushed through per-row scanline filters 0-4,
    zlib DEFLATE, CRC32-stamped chunks — llmops.synth_png) and decode them
    back (llmops.decode_png_features: signature, chunk walk with CRC
    verification, multi-IDAT inflate, sequential un-filtering).  Filters
    and DEFLATE are lossless, so the oracle recomputes width/height/depth/
    color-type, the distinct-filter count least(h, 5), and every channel
    sum from the synthesis parameters alone; the zlib stream itself is
    validated by stdlib inflate — an independent implementation of the
    wire format.  Retires the compressed-image gate for PNG; JPEG-class
    codecs stay honestly gated (llmops.decode_image_batches)."""
    png = llmops.synth_png(_ppm_params(spark, sf_dir), "doc_id", "w", "h", "a", "b")
    return llmops.decode_png_features(png, "doc_id", "payload")


def q165_png_resize(spark, sf_dir):
    """PNG decode → block-mean resize → RE-ENCODE → decode-again roundtrip
    (llmops.resize_png_blockmean, 4×4 integer floor-mean tiles): the small
    image passes through a SECOND full filter+DEFLATE+CRC encode/decode
    loop, and the oracle recomputes its dimensions, filter count
    least(h//4, 5), and floor-mean channel sums from parameters — the q159
    roundtrip through a real compressed container."""
    png = llmops.synth_png(_ppm_params(spark, sf_dir), "doc_id", "w", "h", "a", "b")
    small = llmops.resize_png_blockmean(png, "doc_id", "payload", block=4)
    return llmops.decode_png_features(small, "doc_id", "payload")


def q166_pii_scrub_v2(spark, sf_dir):
    """Composed release-gate PII scrub (llmops.pii_scrub_v2): regex PII +
    checksum-validated payment cards (Luhn, q161's planting scheme) +
    checksum-validated IBANs (mod-97, q162's scheme) in ONE projection.
    Every span in the corpus is parameter-planted: a 16-digit card (valid
    check digit on even doc_ids, +5 on odd), a German IBAN (valid check on
    even, +50 mod 97 on odd), and an email.  The oracle re-derives both
    checksums with INDEPENDENT arithmetic (Luhn via list_transform over
    reversed digits, mod-97 via native HUGEINT) and builds the expected
    clean_text from that recomputed validity — so redaction order
    (valid-IBAN → ≥13-digit runs → regex placeholders), the per-maximal-run
    rule, and both checksum implementations all gate the hash.  The
    overlap contract is visible in the expectations: the invalid IBAN's
    digit tail over-redacts to DE<CC>, and both planted numbers also count
    as n_phone (counts are per-signal on the original text)."""
    # r13: the whole scrub (regex family + Luhn + mod-97 HOFs) ran on ONE
    # task (single-row-group documents scan, zero exchanges) — spread it;
    # no-op at corpus scale
    docs = llmops._spread(
        read_table(configure(spark), sf_dir, "documents").select("doc_id")
    )
    base = F.lpad(
        ((F.col("doc_id") * 7919 + 123456789) % F.lit(10**15)).cast("string"), 15, "0"
    )
    chk = llmops.luhn_check_digit(base)
    card = F.concat(
        base,
        F.when(F.col("doc_id") % 2 == 0, chk).otherwise((chk + 5) % 10).cast("string"),
    )
    bban = F.lpad(
        ((F.col("doc_id") * 104729 + 987654321) % F.lit(10**18)).cast("string"), 18, "0"
    )
    ichars = F.filter(F.split(F.concat(bban, F.lit("131400")), ""), lambda c: c != F.lit(""))
    im = F.aggregate(ichars, F.lit(0).cast("long"), lambda a, c: (a * 10 + (F.ascii(c) - 48)) % 97)
    ichk = F.lit(98) - im
    ic = F.when(F.col("doc_id") % 2 == 0, ichk).otherwise((ichk + 50) % 97)
    iban = F.concat(F.lit("DE"), F.lpad(ic.cast("string"), 2, "0"), bban)
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("pay "), card, F.lit(" to "), iban,
            F.lit(" or mail user"), F.col("doc_id").cast("string"),
            F.lit("@ex.com now"),
        ).alias("text"),
    )
    return llmops.pii_scrub_v2(corpus, "doc_id", "text")


def q167_warc_gz_roundtrip(spark, sf_dir):
    """The REAL Common-Crawl container, end to end with the stdlib: per-doc
    WARC records (serdes.encode_warc) are each compressed into their OWN
    gzip member (serdes.gzip_members, the .warc.gz convention), members
    concatenate into one blob per 10-doc 'crawl file' (a pure binary fold),
    and the reader splits the blob back at member boundaries
    (serdes.split_gzip_members — zlib decompressobj walk, CRC32/ISIZE
    verified per member by an independent implementation) before
    decode_warc parses each record.  The oracle recomputes every surviving
    field — ids, file assignment, in-file position, URI, octet lengths —
    from the documents table alone; a corrupt byte anywhere in the
    compress→concat→split chain breaks parsing and the hash.

    Scale: encode+gzip is a narrow Arrow map; the only shuffle groups ~10
    members per file (the write side of a crawl-file compactor); the read
    side is again a narrow map — per-file blobs never exceed member-count ×
    record size, the same bound a real warc.gz reader has."""
    docs = read_table(configure(spark), sf_dir, "documents")
    rec = serdes.encode_warc(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id")),
        F.col("text"),
        F.col("doc_id"),
    )
    members = docs.select(
        F.col("doc_id"),
        F.floor(F.col("doc_id") / 10).cast("long").alias("file_id"),
        serdes.gzip_members(rec).alias("member"),
    )
    files = (
        members.groupBy("file_id")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "member"))).alias("ms"))
        .select(
            "file_id",
            F.size("ms").cast("long").alias("n_members"),
            F.aggregate(
                F.transform("ms", lambda s: s["member"]),
                F.lit(b""),
                lambda acc, m: F.concat(acc, m),
            ).alias("blob"),
        )
    )
    recs = files.select(
        "file_id",
        "n_members",
        F.posexplode(serdes.split_gzip_members(F.col("blob"))).alias("pos", "rec"),
    )
    parsed = recs.select(
        "file_id", "n_members", "pos", serdes.decode_warc(F.col("rec")).alias("p")
    )
    return parsed.select(
        F.col("p.record_id").cast("long").alias("doc_id"),
        F.col("file_id"),
        F.col("n_members"),
        F.col("pos").cast("long").alias("pos_in_file"),
        F.col("p.uri").alias("uri"),
        F.col("p.content_length").alias("content_length"),
        F.octet_length("p.payload").cast("long").alias("payload_octets"),
        F.col("p.ok").alias("ok"),
    )


def q168_jpeg_roundtrip(spark, sf_dir):
    """REAL baseline JPEG with numpy + the stdlib (pyspark_engine.jpeg):
    forward DCT + Annex-K quantization + Huffman entropy coding + byte
    stuffing on the encode side; marker walk, Huffman decode, dequantize,
    IDCT, YCbCr→RGB on the decode side — one Arrow stage end to end
    (llmops.jpeg_fidelity).  JPEG is LOSSY, so this is the contract-oracle
    pattern (q105/q149 style): dimensions, component count, and block
    count are recomputed exactly by the oracle; the reconstruction error
    of the smooth synthesis ramp is bounded (max ≤ 8 per pixel, mean ≤ 2 —
    measured worst case 5 / 1.4 over the parameter space) and the bound
    booleans are TRUE literals in SQL.  The codec pair itself is pinned by
    independent spec-text tests (tests/test_llmops.py jpeg section), not
    only by this roundtrip."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.col("doc_id") % 3).alias("ay"),
        ((F.col("doc_id") / 3).cast("long") % 3).alias("ax"),
        # b + 60 (channel offset) + 2·(h−1) + 2·(w−1) ≤ 255 for every combo:
        # the ramp must NEVER wrap uint8 — a wrap is a cliff, and cliffs ring
        (F.lit(40) + F.col("doc_id") % 76).alias("b"),
    )
    fid = llmops.jpeg_fidelity(params, "doc_id", "w", "h", "ay", "ax", "b")
    return fid.select(
        "doc_id", "width", "height", "n_components", "n_blocks",
        (F.col("max_err") <= 8).alias("max_err_le_8"),
        (F.col("sum_abs_err") <= 2 * 3 * F.col("width") * F.col("height")).alias(
            "mean_err_le_2"
        ),
    )


def q169_jpeg420_roundtrip(spark, sf_dir):
    """The 4:2:0 chroma-subsampled JPEG layout — what cameras and the web
    actually emit: each MCU covers 16x16 pixels as four Y blocks plus
    2x2-mean-downsampled Cb/Cr, interleaved per T.81 A.2.3
    (jpeg.jpeg_encode(subsample=True) / the 4:2:0 decode path with
    nearest-neighbor chroma upsampling).  Same contract oracle as q168:
    exact dimensions/components/blocks, measured reconstruction bounds
    (combo-space worst case 5 / 1.52 — linear chroma subsamples losslessly
    up to quantization) as TRUE literals."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.col("doc_id") % 3).alias("ay"),
        ((F.col("doc_id") / 3).cast("long") % 3).alias("ax"),
        (F.lit(40) + F.col("doc_id") % 76).alias("b"),
    )
    fid = llmops.jpeg_fidelity(params, "doc_id", "w", "h", "ay", "ax", "b", subsample=True)
    return fid.select(
        "doc_id", "width", "height", "n_components", "n_blocks",
        (F.col("max_err") <= 8).alias("max_err_le_8"),
        (F.col("sum_abs_err") <= 2 * 3 * F.col("width") * F.col("height")).alias(
            "mean_err_le_2"
        ),
    )


def q170_image_transcode(spark, sf_dir):
    """Composed image pipeline across BOTH real compressed codecs: synthesize
    genuine PNGs (filters+DEFLATE+CRC, the q164 ramp), TRANSCODE each to a
    real 4:2:0 JPEG in one Arrow stage (llmops.transcode_png_jpeg — the
    normalize-heterogeneous-formats job), and decode the JPEGs back.  The
    oracle pins exact dimensions/components/blocks and recomputes the
    RAMP's channel sums from parameters; the lossy hop is bounded by
    requiring each decoded channel sum within 8·w·h of the exact ramp sum
    (TRUE literals in SQL — contract-oracle; the q164 ramp WRAPS mod 256,
    and lossy DCT rings at every wrap line, so the bound is wider than
    q168's smooth-ramp one: measured worst mean deviation 5.4/pixel over
    the full parameter combo space).  A byte-level fault in either codec or the
    hand-off breaks parsing or the bound."""
    png = llmops.synth_png(_ppm_params(spark, sf_dir), "doc_id", "w", "h", "a", "b")
    jpg = llmops.transcode_png_jpeg(png, "doc_id", "payload", subsample=True)
    feats = llmops.decode_jpeg_features(jpg, "doc_id", "payload")
    p = _ppm_params(spark, sf_dir).select(
        "doc_id",
        F.col("w").alias("pw"), F.col("h").alias("ph"),
        F.col("a").alias("pa"), F.col("b").alias("pb"),
    )
    # params are a narrow projection of the same corpus — broadcast so the
    # decoded-feature side never shuffles (r13, guide §3.1)
    out = feats.join(F.broadcast(p), "doc_id")
    # exact ramp channel sums: Σ_i (a·i + b + 85c) mod 256 is NOT closed-form
    # under mod — recompute with the same aggregate HOF the q164 Spark side
    # trusts its decode against (the ORACLE recomputes it independently in
    # SQL).  r13: ONE aggregate pass accumulating all three channels in a
    # struct instead of three interpreted passes over the same w·h sequence
    # (identical integer arithmetic per channel, guide §1.2 per-task work)
    idx = F.sequence(F.lit(0), F.col("pw") * F.col("ph") - 1)
    zero = F.lit(0).cast("long")
    sums = F.aggregate(
        idx,
        F.struct(zero.alias("r"), zero.alias("g"), zero.alias("b")),
        lambda acc, i: F.struct(
            (acc["r"] + (F.col("pa") * i + F.col("pb")) % 256).alias("r"),
            (acc["g"] + (F.col("pa") * i + F.col("pb") + 85) % 256).alias("g"),
            (acc["b"] + (F.col("pa") * i + F.col("pb") + 170) % 256).alias("b"),
        ),
    )
    wh = F.col("pw") * F.col("ph")
    return out.withColumn("__rs", sums).select(
        "doc_id", "width", "height", "n_components", "n_blocks",
        (F.abs(F.col("sum_r") - F.col("__rs.r")) <= 8 * wh).alias("sum_r_close"),
        (F.abs(F.col("sum_g") - F.col("__rs.g")) <= 8 * wh).alias("sum_g_close"),
        (F.abs(F.col("sum_b") - F.col("__rs.b")) <= 8 * wh).alias("sum_b_close"),
    )


def q171_jpeg422_roundtrip(spark, sf_dir):
    """The 4:2:2 horizontally-subsampled JPEG layout (broadcast / video
    stills): each MCU covers 8x16 pixels as two Y blocks plus
    1x2-mean-downsampled Cb/Cr (jpeg.SAMP_FACTORS["422"], generic MCU walk
    in jpeg_encode/jpeg_decode).  Same contract oracle as q168/q169: exact
    dimensions/components/blocks, measured reconstruction bounds
    (combo-space worst case 5 / 1.52, identical to 4:2:0 — linear chroma
    subsamples losslessly up to quantization) as TRUE literals."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.col("doc_id") % 3).alias("ay"),
        ((F.col("doc_id") / 3).cast("long") % 3).alias("ax"),
        (F.lit(40) + F.col("doc_id") % 76).alias("b"),
    )
    fid = llmops.jpeg_fidelity(params, "doc_id", "w", "h", "ay", "ax", "b", subsample="422")
    return fid.select(
        "doc_id", "width", "height", "n_components", "n_blocks",
        (F.col("max_err") <= 8).alias("max_err_le_8"),
        (F.col("sum_abs_err") <= 2 * 3 * F.col("width") * F.col("height")).alias(
            "mean_err_le_2"
        ),
    )


def q172_jpeg411_roundtrip(spark, sf_dir):
    """The 4:1:1 layout (DV-era: 4x horizontal chroma pooling, MCU = 8x32
    pixels as four Y blocks plus 1x4-mean Cb/Cr,
    jpeg.SAMP_FACTORS["411"]).  Same contract oracle as q168/q169/q171;
    the measured combo-space worst case is again 5 / 1.52 — the ramp's
    linear chroma means the pooled value sits at the tile center, so even
    4x pooling loses nothing beyond quantization."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.col("doc_id") % 3).alias("ay"),
        ((F.col("doc_id") / 3).cast("long") % 3).alias("ax"),
        (F.lit(40) + F.col("doc_id") % 76).alias("b"),
    )
    fid = llmops.jpeg_fidelity(params, "doc_id", "w", "h", "ay", "ax", "b", subsample="411")
    return fid.select(
        "doc_id", "width", "height", "n_components", "n_blocks",
        (F.col("max_err") <= 8).alias("max_err_le_8"),
        (F.col("sum_abs_err") <= 2 * 3 * F.col("width") * F.col("height")).alias(
            "mean_err_le_2"
        ),
    )


def q173_wire_serde(spark, sf_dir):
    """BitConverter wire serdes end-to-end (serdes.encode_wire/decode_wire +
    encode_value_and_timestamp; the reference's Int32SerDes/Int64SerDes
    little-endian layouts, core/SerDes/Int32SerDes.cs:17 (Deserialize) /
    core/SerDes/Int64SerDes.cs:17 (Int64SerDes), and the changelog envelope
    core/SerDes/ValueAndTimestampSerDes.cs:48-62 (Serialize)).  The oracle
    recomputes every wire byte with independent HUGEINT arithmetic —
    two's-complement little-endian hex per byte — so the layout itself is
    checked, not just encode∘decode = id.  Pure Catalyst: hex/unhex/conv
    expression folds, no Python in the plan."""
    # r13: the wide hex/unhex/conv pipeline ran on ONE task (single-row-group
    # orders scan, zero exchanges) — spread it; no-op at corpus scale
    o = llmops._spread(read_table(configure(spark), sf_dir, "orders"))
    signed = (F.col("o_custkey") - F.lit(700)).cast("int")
    ts = (F.col("o_orderkey") * 1000 + 123).cast("bigint")
    # staged projections so each wire value MATERIALIZES once: inlining the
    # encode tree into every consumer (hex + both decode fields) multiplies
    # an already-wide hex/unhex/conv expression ~10x and blows up codegen
    # (measured 12.5s -> sub-second at sf0.1); CollapseProject keeps
    # non-cheap multi-consumer aliases staged, so this stays one narrow
    # zero-shuffle stage with named-column reuse
    enc = o.select(
        "o_orderkey",
        serdes.encode_wire(F.col("o_orderkey"), "bigint").alias("okey_wire"),
        serdes.encode_wire(signed, "int").alias("signed_wire"),
        serdes.encode_value_and_timestamp(
            serdes.encode_wire(F.col("o_orderpriority"), "string"), ts
        ).alias("vat"),
    )
    vt = serdes.decode_value_and_timestamp(F.col("vat"))
    dec = enc.select(
        "o_orderkey",
        F.hex("okey_wire").alias("okey_wire_hex"),
        serdes.decode_wire(F.col("okey_wire"), "bigint").alias("okey_rt"),
        F.hex("signed_wire").alias("signed_wire_hex"),
        serdes.decode_wire(F.col("signed_wire"), "int").alias("signed_rt"),
        F.hex("vat").alias("vat_hex"),
        vt.alias("vt"),
    )
    return dec.select(
        "o_orderkey", "okey_wire_hex", "okey_rt", "signed_wire_hex",
        "signed_rt", "vat_hex",
        F.col("vt.timestamp").alias("vat_ts"),
        serdes.decode_wire(F.col("vt.value"), "string").alias("vat_value"),
    )


def q174_gif_roundtrip(spark, sf_dir):
    """REAL palette-image codec with ONLY the stdlib: synthesize genuine
    GIF89a files (palette ramp + LZW with variable code widths, CLEAR/EOI,
    sub-block framing — llmops.synth_gif) and decode them back
    (llmops.decode_gif_features: header/color-table walk, LZW
    decompression, palette mapping; interop-pinned against wild GIFs from
    real encoders in tests).  LZW is lossless, so the oracle recomputes
    width/height, the power-of-two padded palette size, the minimum code
    size, and every palette-mapped channel sum from the synthesis
    parameters alone.  With PNG (q164) and baseline JPEG (q168/q169/q171/
    q172) this narrows the decode_image_batches gate to
    progressive/arithmetic JPEG, WebP/AVIF and video."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.lit(1) + F.col("doc_id") % 5).alias("a"),
        (F.col("doc_id") % 251).alias("b"),
        (F.lit(4) + F.col("doc_id") % 13).alias("p"),
    )
    gif = llmops.synth_gif(params, "doc_id", "w", "h", "a", "b", "p")
    return llmops.decode_gif_features(gif, "doc_id", "payload")


def q175_wav_ulaw_roundtrip(spark, sf_dir):
    """REAL lossy audio transcode with a FULL-STRENGTH oracle: 16-bit PCM
    WAV → G.711 µ-law WAV (llmops.wav_transcode_ulaw — the telephony
    companding codec, WAVE_FORMAT_MULAW container with fact chunk) →
    parse + expand back (llmops.decode_wav_ulaw_features).  µ-law is lossy
    but CLOSED-FORM per sample, so unlike JPEG's measured-bound contract
    the oracle recomputes every decoded value EXACTLY: the same Sun/CCITT
    integer arithmetic (14-bit truncation via floor(s/4), bias 33, clip
    8159, segment thresholds, mantissa shift, expansion formula) applied in
    SQL to the synthesis ramp.  The codec pair itself is pinned
    byte-for-byte against CPython's C implementation (audioop) over all
    65536 inputs in tests."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(100) + F.col("doc_id") % 50).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
    )
    pcm = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    ulaw = llmops.wav_transcode_ulaw(pcm, "doc_id", "payload")
    return llmops.decode_wav_ulaw_features(ulaw, "doc_id", "payload")


def q176_wav_adpcm_roundtrip(spark, sf_dir):
    """REAL adaptive audio codec: 16-bit PCM → IMA ADPCM (WAV tag 0x11,
    4-bit differential coding with per-block predictor headers,
    llmops.wav_adpcm_fidelity — encode, container parse, decode and
    per-sample compare in ONE Arrow stage).  The quantizer recurrence is
    stateful per sample (not SQL-expressible), so the oracle is the
    JPEG-style contract: exact container structure (sample/block counts,
    samples-per-block from the fmt extension, tag/bits), the EXACT first
    sample (block headers store it verbatim — b − 32768 from the synthesis
    ramp), and measured reconstruction-error bounds (worst over the
    parameter space: max 2, Σ 88 → pinned at ≤4 and ≤2·n).  The recurrence
    itself is pinned nibble-for-nibble against CPython's C implementation
    (audioop) in tests."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(100) + F.col("doc_id") % 50).alias("n"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        (F.lit(1) + F.col("doc_id") % 7).alias("a"),
        (F.col("doc_id") % 997).alias("b"),
    )
    pcm = llmops.synth_wav(params, "doc_id", "n", "rate", "a", "b")
    fid = llmops.wav_adpcm_fidelity(pcm, "doc_id", "payload")
    return fid.select(
        "doc_id", "n_samples", "n_blocks", "samples_per_block", "fmt_tag",
        "bits", "first_sample",
        (F.col("max_abs_err") <= 4).alias("max_err_le_4"),
        (F.col("sum_abs_err") <= 2 * F.col("n_samples")).alias("sum_err_le_2n"),
    )


def q177_image_sniff(spark, sf_dir):
    """Heterogeneous-corpus normalization: a MIXED binary column (PPM for
    doc_id%3=0, PNG for 1, GIF for 2 — three real synthesized containers)
    decoded to uniform features in ONE Arrow stage by magic-byte dispatch
    (llmops.decode_any_image_features; the routing predicate itself is the
    pure-Catalyst llmops.sniff_image_format).  This is the actual shape of
    a crawl-derived multimodal ingest job: payloads carry no trustworthy
    extension, the bytes decide.  All three containers are lossless here,
    so the oracle recomputes every channel sum per format branch — the
    direct ramp algebra for PPM/PNG, the palette indirection for GIF —
    plus the format label from doc_id arithmetic."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 9).alias("w"),
        (F.lit(12) + F.col("doc_id") % 7).alias("h"),
        (F.lit(1) + F.col("doc_id") % 5).alias("a"),
        (F.col("doc_id") % 251).alias("b"),
        (F.lit(4) + F.col("doc_id") % 13).alias("p"),
    )
    # r13: the three filtered synth branches + union paid three corpus scans
    # and four Python stages; synth_image_mixed dispatches per row inside ONE
    # Arrow stage (identical bytes per doc), and decode_any_image_features
    # fuses onto it — one scan, one JVM↔Python crossing (guide §1.2, §4.1)
    mixed = llmops.synth_image_mixed(
        params.withColumn("fmt", F.col("doc_id") % 3),
        "doc_id", "w", "h", "a", "b", "p", "fmt",
    )
    return llmops.decode_any_image_features(mixed, "doc_id", "payload")


def q178_bmp_roundtrip(spark, sf_dir):
    """REAL BMP codec, stdlib only: the q158 pixel ramp packed through the
    canonical 24-bpp BI_RGB container (llmops.synth_bmp — BGR order,
    bottom-up rows padded to 4 bytes) and decoded back
    (llmops.decode_bmp_features; the decoder also handles 32-bpp
    BI_BITFIELDS and top-down rows, pinned on CPython's own test-corpus V5
    BMP in tests).  Widths 16-24 include non-multiple-of-4 strides, so the
    padding math gates the hash.  Lossless → the oracle recomputes every
    channel sum from parameters."""
    bmp = llmops.synth_bmp(_ppm_params(spark, sf_dir), "doc_id", "w", "h", "a", "b")
    return llmops.decode_bmp_features(bmp, "doc_id", "payload")


def q179_gif_animation(spark, sf_dir):
    """REAL animated-GIF codec, stdlib only: synthesize genuine multi-frame
    GIF89a files (llmops.synth_gif_animation — NETSCAPE loop block, per
    frame a Graphic Control Extension with disposal/delay, alternating
    half-screen rects with offsets, genuine LZW) and decode them through
    the full animation walk (llmops.decode_gif_animation: GCE parse,
    per-frame LZW, GIF89a compositing — disposal/transparency semantics
    pinned against a hand-checked scenario in tests).  LZW is lossless and
    compositing is alternating-halves algebra, so the oracle recomputes
    every per-frame AND composited-canvas channel sum from the synthesis
    parameters alone — a compositor bug on either side breaks the hash.
    1->N frame fan-out, zero shuffle."""
    docs = read_table(configure(spark), sf_dir, "documents").select("doc_id")
    params = docs.select(
        "doc_id",
        (F.lit(8) + (F.col("doc_id") % 5) * 2).alias("w"),
        (F.lit(6) + F.col("doc_id") % 5).alias("h"),
        (F.lit(2) + F.col("doc_id") % 3).alias("n"),
        (F.lit(1) + F.col("doc_id") % 5).alias("a"),
        (F.col("doc_id") % 251).alias("b"),
        (F.lit(4) + F.col("doc_id") % 13).alias("p"),
    )
    gif = llmops.synth_gif_animation(params, "doc_id", "w", "h", "n", "a", "b", "p")
    return llmops.decode_gif_animation(gif, "doc_id", "payload")


def q180_cube(spark, sf_dir):
    """GROUP BY CUBE over (event_type, day) — all grouping-set combinations
    (KStream.aggregate_cube; §2.3 "absent" row, the CUBE sibling of
    q63's ROLLUP).  One Expand+partial-agg pass, a single shuffle — the
    same shape Catalyst gives a plain groupBy, ×4 grouping sets."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts").with_values(
        day_ms=F.unix_millis(F.date_trunc("day", F.col("ts")))
    )
    out = s.aggregate_cube(
        ["event_type", "day_ms"],
        cnt=F.count(F.lit(1)),
        total=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
    )
    return out.df.select("event_type", "day_ms", "cnt", "total")


def q181_versioned_retain(spark, sf_dir):
    """Versioned-table history lifecycle (VersionedKTable.retain / snapshot /
    history — the KIP-914 historyRetention analog, SURVEY §2.7 extension):
    per user, keep only purchase VERSIONS within 7 days of that user's
    newest version, then report the retained-version count (via history()'s
    changelog view) next to the latest value (via snapshot()'s
    latest-per-key collapse).  ``retain`` is the scale lever — history is
    pruned BEFORE anything shuffles it downstream.

    The per-user "now" rides in as a value column (window max over the
    user's partition), exercising retain's Column-expression contract;
    the changelog dedups ties on (user, ts) by event id, last writer wins
    (the offset-order rule, cf. KTableSourceProcessor.cs:37-41)."""
    b = _b(spark, sf_dir)
    s = b.stream("events", key="user_id", ts="ts")
    purchases = s.filter(F.col("event_type") == "purchase").map_values(
        p_val=F.col("value"), p_id=F.col("event_id")
    )
    vt = b.versioned_table(
        purchases.df, key="user_id", ts="ts", order=("p_id",)
    ).map_values(
        p_val=F.col("p_val"),
        u_now=F.max(F.col("ts")).over(Window.partitionBy("user_id")),
    )
    kept = vt.retain(7 * 86_400_000, F.col("u_now"))
    snap = kept.snapshot()
    counts = kept.history().group_by_key().count("n_versions")
    j = snap.join(counts, how="inner")
    return j.df.select(
        "user_id",
        F.col("p_val").alias("latest_val"),
        F.unix_micros(F.col("ts")).alias("latest_ts_us"),
        "n_versions",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_stream_filter": q02_stream_filter,
        "q03_stream_filter_not": q03_stream_filter_not,
        "q04_stream_map": q04_stream_map,
        "q05_stream_map_values": q05_stream_map_values,
        "q06_stream_flat_map": q06_stream_flat_map,
        "q07_stream_flat_map_values": q07_stream_flat_map_values,
        "q08_stream_select_key": q08_stream_select_key,
        "q09_stream_branch": q09_stream_branch,
        "q10_stream_peek": q10_stream_peek,
        "q11_table_source": q11_table_source,
        "q12_table_filter": q12_table_filter,
        "q13_table_map_values": q13_table_map_values,
        "q14_stream_to_table": q14_stream_to_table,
        "q15_table_to_stream": q15_table_to_stream,
        "q16_grouped_count": q16_grouped_count,
        "q17_grouped_aggregate": q17_grouped_aggregate,
        "q18_grouped_reduce": q18_grouped_reduce,
        "q19_grouped_aggregate_py": q19_grouped_aggregate_py,
        "q20_group_by_rekey": q20_group_by_rekey,
        "q21_table_group_by_count": q21_table_group_by_count,
        "q22_table_group_by_agg": q22_table_group_by_agg,
        "q23_table_group_by_reduce": q23_table_group_by_reduce,
        "q24_agg_null_key_drop": q24_agg_null_key_drop,
        "q25_window_tumbling_count": q25_window_tumbling_count,
        "q26_window_hopping_sum": q26_window_hopping_sum,
        "q27_window_custom_daily": q27_window_custom_daily,
        "q28_window_grace": q28_window_grace,
        "q29_ss_join_inner": q29_ss_join_inner,
        "q30_ss_join_left": q30_ss_join_left,
        "q31_ss_join_outer": q31_ss_join_outer,
        "q32_st_join_inner": q32_st_join_inner,
        "q33_st_join_left": q33_st_join_left,
        "q34_global_join_inner": q34_global_join_inner,
        "q35_global_join_left": q35_global_join_left,
        "q36_tt_join_inner": q36_tt_join_inner,
        "q37_tt_join_left": q37_tt_join_left,
        "q38_tt_join_outer": q38_tt_join_outer,
        "q39_interactive_query": q39_interactive_query,
        "q40_json_serde": q40_json_serde,
        "q41_udf_pandas": q41_udf_pandas,
        "q42_dedup_exact": q42_dedup_exact,
        "q43_dedup_minhash": q43_dedup_minhash,
        "q44_dedup_simhash": q44_dedup_simhash,
        "q45_ngram_jaccard": q45_ngram_jaccard,
        "q46_cosine_topk": q46_cosine_topk,
        "q47_ann_lsh": q47_ann_lsh,
        "q48_text_stats": q48_text_stats,
        "q49_token_count": q49_token_count,
        "q50_language_id": q50_language_id,
        "q51_fingerprint": q51_fingerprint,
        "q52_multimodal_meta": q52_multimodal_meta,
        "q53_merge_union": q53_merge_union,
        "q54_topk_per_group": q54_topk_per_group,
        "q55_global_topn": q55_global_topn,
        "q56_set_except": q56_set_except,
        "q57_set_intersect": q57_set_intersect,
        "q58_analytic_running": q58_analytic_running,
        "q59_serde_roundtrip": q59_serde_roundtrip,
        "q60_embedding_neardup": q60_embedding_neardup,
        "q61_session_window": q61_session_window,
        "q62_asof_join": q62_asof_join,
        "q63_rollup": q63_rollup,
        "q64_count_distinct": q64_count_distinct,
        "q65_semi_join": q65_semi_join,
        "q66_anti_join": q66_anti_join,
        "q67_fk_table_join": q67_fk_table_join,
        "q68_multimodal_features": q68_multimodal_features,
        "q69_sliding_agg": q69_sliding_agg,
        "q70_window_hopping_grace": q70_window_hopping_grace,
        "q71_ann_ivf": q71_ann_ivf,
        "q72_composed_pipeline": q72_composed_pipeline,
        "q73_percentiles": q73_percentiles,
        "q74_minhash_high_threshold": q74_minhash_high_threshold,
        "q75_window_store_fetch": q75_window_store_fetch,
        "q76_kafka_wire_full": q76_kafka_wire_full,
        "q77_named_branches": q77_named_branches,
        "q78_quality_filter": q78_quality_filter,
        "q79_sample_stratified": q79_sample_stratified,
        "q80_chunk_text": q80_chunk_text,
        "q81_salted_join": q81_salted_join,
        "q82_decontaminate": q82_decontaminate,
        "q83_repetition_stats": q83_repetition_stats,
        "q84_quantize_embeddings": q84_quantize_embeddings,
        "q85_cogroup": q85_cogroup,
        "q86_pii_scrub": q86_pii_scrub,
        "q87_paragraph_dedup": q87_paragraph_dedup,
        "q88_top_ngrams": q88_top_ngrams,
        "q89_llm_pipeline": q89_llm_pipeline,
        "q90_dedup_clusters": q90_dedup_clusters,
        "q91_url_stats": q91_url_stats,
        "q92_pack_tokens": q92_pack_tokens,
        "q93_session_store_fetch": q93_session_store_fetch,
        "q94_frame_sample": q94_frame_sample,
        "q95_resize_thumbs": q95_resize_thumbs,
        "q96_tfidf_topk": q96_tfidf_topk,
        "q97_unigram_xent": q97_unigram_xent,
        "q98_inverted_index": q98_inverted_index,
        "q99_sample_mixture": q99_sample_mixture,
        "q100_pmi_collocations": q100_pmi_collocations,
        "q101_sample_quota": q101_sample_quota,
        "q102_versioned_join": q102_versioned_join,
        "q103_avro_wire": q103_avro_wire,
        "q104_protobuf_wire": q104_protobuf_wire,
        "q105_sketch_stats": q105_sketch_stats,
        "q106_avro_embeddings": q106_avro_embeddings,
        "q107_protobuf_embeddings": q107_protobuf_embeddings,
        "q108_repeated_spans": q108_repeated_spans,
        "q109_semantic_dedup": q109_semantic_dedup,
        "q110_dsir_weights": q110_dsir_weights,
        "q111_bigram_backoff": q111_bigram_backoff,
        "q112_char_entropy": q112_char_entropy,
        "q113_classifier_score": q113_classifier_score,
        "q114_warc_roundtrip": q114_warc_roundtrip,
        "q115_perplexity_buckets": q115_perplexity_buckets,
        "q116_bm25_topk": q116_bm25_topk,
        "q117_corpus_report": q117_corpus_report,
        "q118_token_budget_mixture": q118_token_budget_mixture,
        "q119_incremental_dedup": q119_incremental_dedup,
        "q120_corpus_diff": q120_corpus_diff,
        "q121_leakage_free_split": q121_leakage_free_split,
        "q122_sentence_chunks": q122_sentence_chunks,
        "q123_ngram_novelty": q123_ngram_novelty,
        "q124_profile_columns": q124_profile_columns,
        "q125_normalize_text": q125_normalize_text,
        "q126_matryoshka": q126_matryoshka,
        "q127_fuzzy_editdist": q127_fuzzy_editdist,
        "q128_length_outliers": q128_length_outliers,
        "q129_curation_v2": q129_curation_v2,
        "q130_shuffle_shards": q130_shuffle_shards,
        "q131_strip_boilerplate": q131_strip_boilerplate,
        "q132_event_sequences": q132_event_sequences,
        "q133_semantic_decontam": q133_semantic_decontam,
        "q134_minhash_incremental": q134_minhash_incremental,
        "q135_warc_html_extract": q135_warc_html_extract,
        "q136_cluster_balanced": q136_cluster_balanced,
        "q137_vocab_drift": q137_vocab_drift,
        "q138_dedup_priority": q138_dedup_priority,
        "q139_histogram": q139_histogram,
        "q140_fuzzy_keep_best": q140_fuzzy_keep_best,
        "q141_rate_anomaly": q141_rate_anomaly,
        "q142_windowed_topk": q142_windowed_topk,
        "q143_funnel": q143_funnel,
        "q144_cohort_retention": q144_cohort_retention,
        "q145_hybrid_search": q145_hybrid_search,
        "q146_sessionize": q146_sessionize,
        "q147_url_dedup": q147_url_dedup,
        "q148_temporal_split": q148_temporal_split,
        "q149_profile_approx": q149_profile_approx,
        "q150_rate_anomaly_time": q150_rate_anomaly_time,
        "q151_jaccard_exact": q151_jaccard_exact,
        "q152_windowed_distinct": q152_windowed_distinct,
        "q153_domain_blocklist": q153_domain_blocklist,
        "q154_lsh_recall_audit": q154_lsh_recall_audit,
        "q154_lsh_summary": q154_lsh_summary,
        "q155_wav_decode": q155_wav_decode,
        "q156_wav_frames": q156_wav_frames,
        "q157_wav_trim": q157_wav_trim,
        "q158_ppm_decode": q158_ppm_decode,
        "q159_ppm_resize": q159_ppm_resize,
        "q160_wav_downsample": q160_wav_downsample,
        "q161_credit_card_luhn": q161_credit_card_luhn,
        "q162_iban_mod97": q162_iban_mod97,
        "q163_audio_pipeline": q163_audio_pipeline,
        "q164_png_decode": q164_png_decode,
        "q165_png_resize": q165_png_resize,
        "q166_pii_scrub_v2": q166_pii_scrub_v2,
        "q167_warc_gz_roundtrip": q167_warc_gz_roundtrip,
        "q168_jpeg_roundtrip": q168_jpeg_roundtrip,
        "q169_jpeg420_roundtrip": q169_jpeg420_roundtrip,
        "q170_image_transcode": q170_image_transcode,
        "q171_jpeg422_roundtrip": q171_jpeg422_roundtrip,
        "q172_jpeg411_roundtrip": q172_jpeg411_roundtrip,
        "q173_wire_serde": q173_wire_serde,
        "q174_gif_roundtrip": q174_gif_roundtrip,
        "q175_wav_ulaw_roundtrip": q175_wav_ulaw_roundtrip,
        "q176_wav_adpcm_roundtrip": q176_wav_adpcm_roundtrip,
        "q177_image_sniff": q177_image_sniff,
        "q178_bmp_roundtrip": q178_bmp_roundtrip,
        "q179_gif_animation": q179_gif_animation,
        "q180_cube": q180_cube,
        "q181_versioned_retain": q181_versioned_retain,
    }


_LATEST_EVENTS = """
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS __rn
        FROM events
    ) WHERE __rn = 1
"""

_LATEST_ORDERS = """
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS __rn
        FROM orders
    ) WHERE __rn = 1
"""


def _minhash_oracle_sql(threshold: float, num_hashes: int = 64, bands: int = 8) -> str:
    """Full DuckDB simulation of llmops.minhash_lsh_pairs(portable=True):
    identical 32-bit md5-prefix base hash, identical affine permutations
    (same _affine_coeffs), band membership expressed as minhash-tuple
    equality (≡ the band-hash bucket join, minus ~2^-64 xxhash collisions),
    then the exact distinct-shingle Jaccard verify.  The SQL is generated,
    not handwritten, so the permutation constants can't drift."""
    from pyspark_engine.llmops import _affine_coeffs

    p = 2147483647
    rows = num_hashes // bands
    mins = ",\n                   ".join(
        f"min((h * {a}::BIGINT + {b}) % {p}) AS mh{j}"
        for j, (a, b) in enumerate(_affine_coeffs(num_hashes))
    )
    band_eq = "\n                 OR ".join(
        "(" + " AND ".join(f"a.mh{j} = b.mh{j}" for j in range(bd * rows, (bd + 1) * rows)) + ")"
        for bd in range(bands)
    )
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                                i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
            FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
                  FROM documents)
            WHERE len(toks) >= 3
        ),
        gr AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {p} AS h
            FROM (SELECT doc_id, unnest(g) AS s FROM d)
        ),
        sig AS (
            SELECT doc_id,
                   {mins}
            FROM gr GROUP BY doc_id
        ),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE {band_eq}
        )
        SELECT id_a, id_b
        FROM cand
        JOIN d da ON da.doc_id = cand.id_a
        JOIN d db ON db.doc_id = cand.id_b
        WHERE CAST(len(list_intersect(da.g, db.g)) AS DOUBLE)
              / len(list_distinct(da.g || db.g)) >= {threshold}
    """


def _recall_audit_oracle_sql(
    threshold: float, num_hashes: int = 64, bands: int = 8, audit: bool = True
) -> str:
    """Combined DuckDB simulation for q154: brute-force ground-truth pairs
    (the q151 oracle's shape) FULL JOIN the full portable banded-LSH
    simulation (the q43 oracle's shape), reduced to the one-row audit
    summary (n_lsh_only surfaces truth-side completeness bugs).  Generated, not handwritten, so the permutation constants and
    the threshold can't drift from the engine.  ``audit=False`` simulates
    the production mode of llmops.lsh_recall_audit instead: the LSH CTEs
    only, truth-dependent fields NULL — the q154_lsh_summary oracle."""
    from pyspark_engine.llmops import _affine_coeffs

    p = 2147483647
    rows = num_hashes // bands
    mins = ",\n                   ".join(
        f"min((h * {a}::BIGINT + {b}) % {p}) AS mh{j}"
        for j, (a, b) in enumerate(_affine_coeffs(num_hashes))
    )
    band_eq = "\n                 OR ".join(
        "(" + " AND ".join(f"a.mh{j} = b.mh{j}" for j in range(bd * rows, (bd + 1) * rows)) + ")"
        for bd in range(bands)
    )
    truth_cte = f"""
        truth AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                  / len(list_distinct(a.g || b.g)) >= {threshold}
        ),"""
    if audit:
        final = """
        j AS (SELECT coalesce(t.tr, 0) AS tr, coalesce(l.hit, 0) AS hit
              FROM (SELECT id_a, id_b, 1 AS tr FROM truth) t
              FULL JOIN lsh l USING (id_a, id_b))
        SELECT CAST(coalesce(sum(tr), 0) AS BIGINT) AS n_true_pairs,
               CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_lsh_pairs,
               CAST(coalesce(sum(tr * (1 - hit)), 0) AS BIGINT) AS n_missed,
               CAST(coalesce(sum((1 - tr) * hit), 0) AS BIGINT) AS n_lsh_only,
               CAST(coalesce(floor(1000.0 * sum(tr * hit) / sum(tr)), 1000) AS BIGINT)
                   AS recall_permille
        FROM j
    """
    else:
        truth_cte = ""
        final = """
        j AS (SELECT hit FROM lsh)
        SELECT CAST(NULL AS BIGINT) AS n_true_pairs,
               CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_lsh_pairs,
               CAST(NULL AS BIGINT) AS n_missed,
               CAST(NULL AS BIGINT) AS n_lsh_only,
               CAST(NULL AS BIGINT) AS recall_permille
        FROM j
    """
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                                i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
            FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
                  FROM documents)
            WHERE len(toks) >= 3
        ),{truth_cte}
        gr AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {p} AS h
            FROM (SELECT doc_id, unnest(g) AS s FROM d)
        ),
        sig AS (
            SELECT doc_id,
                   {mins}
            FROM gr GROUP BY doc_id
        ),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE {band_eq}
        ),
        lsh AS (
            SELECT id_a, id_b, 1 AS hit
            FROM cand
            JOIN d da ON da.doc_id = cand.id_a
            JOIN d db ON db.doc_id = cand.id_b
            WHERE CAST(len(list_intersect(da.g, db.g)) AS DOUBLE)
                  / len(list_distinct(da.g || db.g)) >= {threshold}
        ),{final}"""


def _minhash_incremental_oracle_sql(threshold: float, num_hashes: int = 64, bands: int = 8) -> str:
    """DuckDB simulation of minhash_signatures(portable=True) +
    minhash_lsh_incremental over the q134 history/new split: identical
    portable signatures for the whole corpus (history = doc_id < 250, new =
    doc_id ≥ 250 incl. planted +60000 copies of history docs 0–19), band
    membership as minhash-tuple equality restricted to new-involved pairs,
    and the exact k/num_hashes signature-estimated Jaccard."""
    from pyspark_engine.llmops import _affine_coeffs

    p = 2147483647
    rows = num_hashes // bands
    mins = ",\n                   ".join(
        f"min((h * {a}::BIGINT + {b}) % {p}) AS mh{j}"
        for j, (a, b) in enumerate(_affine_coeffs(num_hashes))
    )
    band_eq = "\n                 OR ".join(
        "(" + " AND ".join(f"a.mh{j} = b.mh{j}" for j in range(bd * rows, (bd + 1) * rows)) + ")"
        for bd in range(bands)
    )
    ksum = "\n                 + ".join(
        f"CAST(a.mh{j} = b.mh{j} AS INT)" for j in range(num_hashes)
    )
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 60000, text FROM documents WHERE doc_id < 20
        ),
        d AS (
            SELECT doc_id,
                   list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                                i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
            FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
                  FROM corpus)
            WHERE len(toks) >= 3
        ),
        gr AS (
            SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT % {p} AS h
            FROM (SELECT doc_id, unnest(g) AS s FROM d)
        ),
        sig AS (
            SELECT doc_id,
                   {mins}
            FROM gr GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ({ksum}) / {num_hashes}.0 AS sim_est
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id
         AND (a.doc_id >= 250 OR b.doc_id >= 250)
         AND ({band_eq})
        WHERE ({ksum}) / {num_hashes}.0 >= {threshold}
    """


def _simhash_oracle_sql(max_hamming: int, nbits: int = 32, chunk_bits: int = 8) -> str:
    """Full DuckDB simulation of llmops.simhash_pairs(portable=True):
    identical 32-bit token hash, per-bit vote sums, fingerprint collapse,
    the 4-chunk pigeonhole candidate rule, and the hamming verify."""
    votes = ",\n                   ".join(
        f"sum(CASE WHEN ((th >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(nbits)
    )
    fp = "\n                 + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)" for i in range(nbits)
    )
    mask = (1 << chunk_bits) - 1
    chunk_eq = " OR ".join(
        f"((a.f >> {k * chunk_bits}) & {mask}) = ((b.f >> {k * chunk_bits}) & {mask})"
        for k in range(nbits // chunk_bits)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents WHERE doc_id % 10 = 0
        ),
        h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS th FROM t),
        v AS (SELECT doc_id,
                   {votes}
              FROM h GROUP BY doc_id),
        fp AS (SELECT doc_id,
                   {fp} AS f
               FROM v),
        cand AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.f AS fa, b.f AS fb
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id AND ({chunk_eq})
        )
        SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(fa, fb)) <= {max_hamming}
    """


def _ann_ivf_oracle_sql(n_lists: int = 16, n_probe: int = 4, k: int = 5, n_queries: int = 16) -> str:
    """Full DuckDB simulation of llmops.ann_ivf_topk(init='hash_sample'):
    identical centroid selection (n_lists smallest md5(vec_id)), identical
    cell argmin (|c|² - 2v·c with (d, i) tie order), identical n_probe probe
    list, identical cosine ranking — the whole IVF index build + search is
    reproduced, not just the verify step."""
    return f"""
        WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cent AS (
            SELECT i - 1 AS i, cv FROM (
                SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS i, v AS cv
                FROM c0
            ) WHERE i <= {n_lists}
        ),
        asg AS (
            SELECT c0.vec_id, c0.v, cent.i,
                   list_dot_product(cent.cv, cent.cv) - 2.0 * list_dot_product(c0.v, cent.cv) AS d,
                   cent.cv AS ccv
            FROM c0 CROSS JOIN cent
        ),
        cells AS (
            SELECT vec_id AS n_id, v AS cv, sqrt(list_dot_product(v, v)) AS cn, i AS cell
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn FROM asg)
            WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn, i AS cell
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
                  FROM asg WHERE vec_id < {n_queries})
            WHERE rn <= {n_probe}
        )
        SELECT q_id, n_id FROM (
            SELECT p.q_id, c.n_id,
                   row_number() OVER (PARTITION BY p.q_id
                                      ORDER BY list_dot_product(p.qv, c.cv) / (p.qn * c.cn) DESC,
                                               c.n_id) AS rk
            FROM probes p JOIN cells c ON p.cell = c.cell AND p.q_id != c.n_id
        ) WHERE rk <= {k}
    """


def _multimodal_oracle_sql(bins: int = 8) -> str:
    """Full DuckDB simulation of llmops.multimodal_features' deterministic
    fake decoder (byte histogram over the UTF-8 payload): the blob is expanded
    byte-by-byte via hex pairs, then n_bytes / mean_byte / per-bin counts are
    plain aggregates.  mean_byte compares bitwise because both sides sum
    integers exactly in double before one division."""
    width = 256 // bins
    hist = ",\n                     ".join(
        f"count(*) FILTER (byte // {width} = {b})" for b in range(bins)
    )
    return f"""
        WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
        h AS (SELECT doc_id, lower(hex(p)) AS hx, octet_length(p) AS n FROM b),
        e AS (SELECT doc_id, ('0x' || substr(hx, 2*i-1, 2))::BIGINT AS byte
              FROM h, unnest(generate_series(1, n)) AS t(i))
        SELECT doc_id, count(*) AS n_bytes, avg(byte) AS mean_byte,
               concat_ws(',',
                     {hist}) AS hist_csv
        FROM e GROUP BY doc_id
    """


def _ann_lsh_oracle_sql(dim: int = 64, n_planes: int = 8, k: int = 5, n_queries: int = 16) -> str:
    """Full DuckDB simulation of llmops.ann_lsh_topk: the hyperplanes are
    deterministic driver-side constants (llmops._hyperplanes), embedded here
    as the SAME double literals Spark broadcasts, so bucket assignment,
    multiprobe fan-out (own bucket + every hamming-1 neighbor), candidate
    join, and cosine ranking are reproduced exactly."""
    from pyspark_engine.llmops import _hyperplanes

    bucket_terms = "\n                 + ".join(
        "(CASE WHEN list_dot_product(cv, ["
        + ", ".join(repr(v) for v in plane)
        + f"]) > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i, plane in enumerate(_hyperplanes(dim, n_planes))
    )
    probe_vals = ", ".join(f"({i})" for i in range(-1, n_planes))
    return f"""
        WITH c0 AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        c AS (
            SELECT n_id, cv, sqrt(list_dot_product(cv, cv)) AS cn,
                   {bucket_terms} AS bkt
            FROM c0
        ),
        q AS (SELECT n_id AS q_id, cv AS qv, cn AS qn, bkt AS b0 FROM c WHERE n_id < {n_queries}),
        probes AS (
            SELECT q_id, qv, qn,
                   CASE WHEN i < 0 THEN b0 ELSE xor(b0, (1::BIGINT << i)) END AS bkt
            FROM q CROSS JOIN (VALUES {probe_vals}) AS pr(i)
        )
        SELECT q_id, n_id FROM (
            SELECT p.q_id, c.n_id,
                   row_number() OVER (PARTITION BY p.q_id
                                      ORDER BY list_dot_product(p.qv, c.cv) / (p.qn * c.cn) DESC,
                                               c.n_id) AS rk
            FROM probes p JOIN c ON p.bkt = c.bkt AND p.q_id != c.n_id
        ) WHERE rk <= {k}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            -- decimal sums leave DuckDB via VARCHAR: its direct
            -- decimal->double cast divides the scaled int128 by 10^scale in
            -- double arithmetic, which is 1 ulp off nearest once the scaled
            -- integer passes 2^53 (found by the r12 full-sf0.1 sweep on
            -- sum_disc_price, scale 8 ~ 5e17); string->double is correctly
            -- rounded and matches Spark's BigDecimal.doubleValue exactly
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-10-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_stream_filter": """
            SELECT event_id, user_id, event_type, value
            FROM events WHERE event_type = 'purchase' AND value > 100.0
        """,
        "q03_stream_filter_not": """
            SELECT event_id, event_type
            FROM events WHERE NOT (event_type IN ('click', 'view'))
        """,
        "q04_stream_map": """
            SELECT event_type AS etype, event_id, value * 2.0 AS value_x2 FROM events
        """,
        "q05_stream_map_values": """
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
        """,
        "q06_stream_flat_map": r"""
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word, n_chars
            FROM documents WHERE doc_id % 20 = 0
        """,
        "q07_stream_flat_map_values": r"""
            SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
            FROM documents WHERE doc_id % 20 = 0
        """,
        "q08_stream_select_key": """
            SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS ukey, event_id FROM events
        """,
        "q09_stream_branch": """
            SELECT event_id, event_type, value
            FROM events WHERE value > 150.0 AND NOT (event_type = 'purchase')
        """,
        "q10_stream_peek": """
            SELECT user_id, count(*) AS cnt FROM events WHERE event_type = 'error' GROUP BY user_id
        """,
        "q11_table_source": f"""
            SELECT user_id, event_id, event_type, value FROM ({_LATEST_EVENTS})
        """,
        "q12_table_filter": f"""
            SELECT user_id, value FROM ({_LATEST_EVENTS}) WHERE value >= 100.0
        """,
        "q13_table_map_values": f"""
            SELECT user_id, value / 2.0 AS vhalf, upper(event_type) AS etype_upper FROM ({_LATEST_EVENTS})
        """,
        "q14_stream_to_table": f"""
            SELECT o_custkey, o_orderkey, o_totalprice FROM ({_LATEST_ORDERS})
        """,
        "q15_table_to_stream": f"""
            SELECT user_id, event_type, value FROM ({_LATEST_EVENTS}) WHERE event_type = 'purchase'
        """,
        "q16_grouped_count": """
            SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
        """,
        "q17_grouped_aggregate": """
            SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                   count(*) AS n
            FROM events GROUP BY user_id
        """,
        "q18_grouped_reduce": """
            SELECT user_id, max(value) AS vmax, min(value) AS vmin FROM events GROUP BY user_id
        """,
        "q19_grouped_aggregate_py": """
            SELECT user_id, CAST(sum(floor(value)) + count(*) AS BIGINT) AS folded
            FROM events GROUP BY user_id
        """,
        "q20_group_by_rekey": """
            SELECT epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day_ms, count(*) AS cnt
            FROM events GROUP BY 1
        """,
        "q21_table_group_by_count": f"""
            SELECT event_type AS etype, count(*) AS users FROM ({_LATEST_EVENTS}) GROUP BY event_type
        """,
        "q22_table_group_by_agg": f"""
            SELECT event_type AS etype,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM ({_LATEST_EVENTS}) GROUP BY event_type
        """,
        "q23_table_group_by_reduce": f"""
            SELECT event_type AS etype, max(value) AS vmax FROM ({_LATEST_EVENTS}) GROUP BY event_type
        """,
        "q24_agg_null_key_drop": """
            SELECT user_id % 7 AS bucket, count(*) AS cnt
            FROM events WHERE user_id % 7 != 3 GROUP BY 1
        """,
        "q25_window_tumbling_count": """
            SELECT event_type,
                   (epoch_ms(ts) // 900000) * 900000 AS w_start_ms,
                   (epoch_ms(ts) // 900000) * 900000 + 900000 AS w_end_ms,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2, 3
        """,
        "q26_window_hopping_sum": """
            SELECT event_type,
                   ((epoch_ms(ts) // 600000) - k) * 600000 AS w_start_ms,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events CROSS JOIN (VALUES (0), (1), (2)) AS hop(k)
            GROUP BY 1, 2
        """,
        "q27_window_custom_daily": """
            SELECT event_type,
                   epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS w_start_ms,
                   epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY) AS w_end_ms,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2, 3
        """,
        "q28_window_grace": """
            WITH arr AS (
                SELECT event_type, ts,
                       (epoch_ms(ts) // 900000) * 900000 AS w_start_ms,
                       max(ts) OVER (PARTITION BY user_id % 4 ORDER BY event_id % 97, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stream_time
                FROM events
            )
            SELECT event_type, w_start_ms, w_start_ms + 900000 AS w_end_ms, count(*) AS cnt
            FROM arr
            WHERE make_timestamp((w_start_ms + 900000) * 1000) > stream_time - INTERVAL 10 MINUTE
            GROUP BY 1, 2, 3
        """,
        "q29_ss_join_inner": """
            WITH a AS (SELECT user_id, event_id AS l_id, ts FROM events WHERE event_type = 'click'),
                 b AS (SELECT user_id AS r_user, event_id AS r_id, ts AS r_ts FROM events WHERE event_type = 'purchase')
            SELECT a.user_id, a.l_id, b.r_id, epoch_us(greatest(a.ts, b.r_ts)) AS ts_us
            FROM a JOIN b ON a.user_id = b.r_user
               AND b.r_ts >= a.ts - INTERVAL 30 MINUTE AND b.r_ts <= a.ts + INTERVAL 30 MINUTE
        """,
        "q30_ss_join_left": """
            WITH a AS (SELECT user_id, event_id AS l_id, ts FROM events WHERE event_type = 'click'),
                 b AS (SELECT user_id AS r_user, event_id AS r_id, ts AS r_ts FROM events WHERE event_type = 'purchase')
            SELECT a.user_id, a.l_id, b.r_id, epoch_us(greatest(a.ts, b.r_ts)) AS ts_us
            FROM a LEFT JOIN b ON a.user_id = b.r_user
               AND b.r_ts >= a.ts - INTERVAL 30 MINUTE AND b.r_ts <= a.ts + INTERVAL 30 MINUTE
        """,
        "q31_ss_join_outer": """
            WITH a AS (SELECT user_id, event_id AS l_id, ts FROM events WHERE event_type = 'click'),
                 b AS (SELECT user_id AS r_user, event_id AS r_id, ts AS r_ts FROM events WHERE event_type = 'purchase')
            SELECT coalesce(a.user_id, b.r_user) AS user_id, a.l_id, b.r_id,
                   epoch_us(greatest(a.ts, b.r_ts)) AS ts_us
            FROM a FULL JOIN b ON a.user_id = b.r_user
               AND b.r_ts >= a.ts - INTERVAL 30 MINUTE AND b.r_ts <= a.ts + INTERVAL 30 MINUTE
        """,
        "q32_st_join_inner": """
            SELECT o_orderkey, o_custkey, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "q33_st_join_left": """
            SELECT o_orderkey, o_custkey, c_name
            FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c ON o_custkey = c.c_custkey
        """,
        "q34_global_join_inner": """
            SELECT c_custkey, c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
        "q35_global_join_left": """
            SELECT s_suppkey, s_name, n_name
            FROM supplier LEFT JOIN (SELECT * FROM nation WHERE n_regionkey < 2) n ON s_nationkey = n.n_nationkey
        """,
        "q36_tt_join_inner": f"""
            WITH a AS (SELECT user_id, event_type AS a_type, ts FROM ({_LATEST_EVENTS})),
                 b AS (SELECT o_custkey, o_totalprice AS b_total, o_orderdate FROM ({_LATEST_ORDERS}))
            SELECT a.user_id, a.a_type, b.b_total, epoch_us(greatest(a.ts, b.o_orderdate)) AS ts_us
            FROM a JOIN b ON a.user_id = b.o_custkey
        """,
        "q37_tt_join_left": f"""
            WITH a AS (SELECT user_id, event_type AS a_type, ts FROM ({_LATEST_EVENTS})),
                 b AS (SELECT o_custkey, o_totalprice AS b_total, o_orderdate FROM ({_LATEST_ORDERS}))
            SELECT a.user_id, a.a_type, b.b_total, epoch_us(greatest(a.ts, b.o_orderdate)) AS ts_us
            FROM a LEFT JOIN b ON a.user_id = b.o_custkey
        """,
        "q38_tt_join_outer": f"""
            WITH a AS (SELECT user_id, event_type AS a_type, ts FROM ({_LATEST_EVENTS})),
                 b AS (SELECT o_custkey, o_totalprice AS b_total, o_orderdate FROM ({_LATEST_ORDERS}))
            SELECT coalesce(a.user_id, b.o_custkey) AS user_id, a.a_type, b.b_total,
                   epoch_us(greatest(a.ts, b.o_orderdate)) AS ts_us
            FROM a FULL JOIN b ON a.user_id = b.o_custkey
        """,
        "q39_interactive_query": """
            SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id HAVING count(*) >= 10
        """,
        "q40_json_serde": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
        """,
        "q41_udf_pandas": """
            SELECT event_id, CAST(floor(value / 25.0) AS BIGINT) AS bucket FROM events
        """,
        "q42_dedup_exact": """
            SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        """,
        # q43/q44/q47 use the portable (md5-prefix) hash so the generated SQL
        # below simulates the full LSH pipelines — banding / pigeonhole
        # candidate generation included — not just the verify step.
        "q43_dedup_minhash": _minhash_oracle_sql(threshold=0.4),
        "q154_lsh_recall_audit": _recall_audit_oracle_sql(threshold=0.4),
        "q154_lsh_summary": _recall_audit_oracle_sql(threshold=0.4, audit=False),
        "q155_wav_decode": """
            WITH p AS (
                SELECT doc_id,
                       100 + doc_id % 50 AS n,
                       CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
                       1 + doc_id % 7 AS a,
                       doc_id % 997 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, n, rate,
                       unnest(generate_series(0, n - 1)) AS i, a, b
                FROM p
            ),
            v AS (
                SELECT doc_id, n, rate, ((a * i + b) % 65536) - 32768 AS val
                FROM s
            )
            SELECT doc_id,
                   CAST(any_value(rate) AS BIGINT) AS sample_rate,
                   CAST(1 AS BIGINT) AS n_channels,
                   CAST(16 AS BIGINT) AS bits,
                   CAST(any_value(n) AS BIGINT) AS n_samples,
                   CAST(44 + 2 * any_value(n) AS BIGINT) AS wire_len,
                   CAST(max(abs(val)) AS BIGINT) AS peak_abs,
                   CAST(sum(val * val) AS BIGINT) AS sumsq
            FROM v
            GROUP BY doc_id
        """,
        "q156_wav_frames": """
            WITH p AS (
                SELECT doc_id,
                       100 + doc_id % 50 AS n,
                       1 + doc_id % 7 AS a,
                       doc_id % 997 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, unnest(generate_series(0, n - 1)) AS i, a, b
                FROM p
            ),
            v AS (
                SELECT doc_id, i // 64 AS frame_idx,
                       ((a * i + b) % 65536) - 32768 AS val
                FROM s
            )
            SELECT doc_id,
                   CAST(frame_idx AS BIGINT) AS frame_idx,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   CAST(max(abs(val)) AS BIGINT) AS peak_abs,
                   CAST(sum(val * val) AS BIGINT) AS sumsq
            FROM v
            GROUP BY doc_id, frame_idx
        """,
        "q157_wav_trim": """
            WITH p AS (
                SELECT doc_id,
                       80 + doc_id % 40 AS n,
                       CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
                       1 + doc_id % 7 AS a,
                       doc_id % 997 AS b,
                       doc_id % 37 AS pre,
                       doc_id % 23 AS post
                FROM documents
            ),
            s AS (
                SELECT doc_id, rate, pre, n, pre + n + post AS total,
                       unnest(generate_series(0, pre + n + post - 1)) AS i, a, b
                FROM p
            ),
            v AS (
                SELECT doc_id, rate, total, i, i // 16 AS f,
                       CASE WHEN i < pre OR i >= pre + n THEN 0
                            ELSE ((a * (i - pre) + b) % 65536) - 32768 END AS val
                FROM s
            ),
            fr AS (
                SELECT doc_id, f, max(abs(val)) AS fpeak FROM v GROUP BY doc_id, f
            ),
            bounds AS (
                SELECT doc_id, min(f) AS fa, max(f) AS fb
                FROM fr WHERE fpeak > 0 GROUP BY doc_id
            ),
            kept AS (
                SELECT v.doc_id, v.rate, v.val
                FROM v JOIN bounds b ON v.doc_id = b.doc_id
                WHERE v.i >= b.fa * 16 AND v.i < least((b.fb + 1) * 16, v.total)
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_out, max(abs(val)) AS peak,
                       sum(val * val) AS sq
                FROM kept GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.rate AS BIGINT) AS sample_rate,
                   CAST(1 AS BIGINT) AS n_channels,
                   CAST(16 AS BIGINT) AS bits,
                   CAST(coalesce(agg.n_out, 0) AS BIGINT) AS n_samples,
                   CAST(44 + 2 * coalesce(agg.n_out, 0) AS BIGINT) AS wire_len,
                   CAST(coalesce(agg.peak, 0) AS BIGINT) AS peak_abs,
                   CAST(coalesce(agg.sq, 0) AS BIGINT) AS sumsq
            FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q161_credit_card_luhn": """
            WITH b AS (
                SELECT doc_id, text,
                       lpad(CAST((doc_id * 7919 + 123456789) % 1000000000000000
                                 AS VARCHAR), 15, '0') AS base
                FROM documents
            ),
            k AS (
                SELECT doc_id, text, base,
                       (10 - list_sum(list_transform(generate_series(1, 15), j ->
                           CASE WHEN j % 2 = 0
                                THEN CAST(substr(reverse(base), j, 1) AS INT)
                                ELSE CASE WHEN CAST(substr(reverse(base), j, 1) AS INT) * 2 > 9
                                          THEN CAST(substr(reverse(base), j, 1) AS INT) * 2 - 9
                                          ELSE CAST(substr(reverse(base), j, 1) AS INT) * 2 END
                           END)) % 10) % 10 AS chk
                FROM b
            ),
            c AS (
                SELECT doc_id,
                       text || ' ' || base ||
                       CAST(CASE WHEN doc_id % 2 = 0 THEN chk
                                 ELSE (chk + 5) % 10 END AS VARCHAR) AS text
                FROM k
            ),
            cand AS (
                SELECT doc_id, regexp_replace(m, '[ -]', '', 'g') AS d
                FROM (SELECT doc_id,
                             unnest(regexp_extract_all(text, '\\d(?:[ -]?\\d)+')) AS m
                      FROM c)
            ),
            n AS (SELECT doc_id, d FROM cand WHERE length(d) BETWEEN 13 AND 19),
            v AS (
                SELECT doc_id,
                       CASE WHEN list_sum(list_transform(generate_series(1, length(d)), i ->
                           CASE WHEN i % 2 = 1
                                THEN CAST(substr(reverse(d), i, 1) AS INT)
                                ELSE CASE WHEN CAST(substr(reverse(d), i, 1) AS INT) * 2 > 9
                                          THEN CAST(substr(reverse(d), i, 1) AS INT) * 2 - 9
                                          ELSE CAST(substr(reverse(d), i, 1) AS INT) * 2 END
                           END)) % 10 = 0 THEN 1 ELSE 0 END AS ok
                FROM n
            ),
            agg AS (SELECT doc_id, count(*) AS nc, sum(ok) AS nv FROM v GROUP BY doc_id)
            SELECT c.doc_id,
                   CAST(coalesce(agg.nc, 0) AS BIGINT) AS n_candidates,
                   CAST(coalesce(agg.nv, 0) AS BIGINT) AS n_valid
            FROM c LEFT JOIN agg ON c.doc_id = agg.doc_id
        """,
        "q171_jpeg422_roundtrip": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS BIGINT) AS width,
                   CAST(12 + doc_id % 7 AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS n_components,
                   CAST(((16 + doc_id % 9 + 7) // 8) * ((12 + doc_id % 7 + 7) // 8)
                        AS BIGINT) AS n_blocks,
                   TRUE AS max_err_le_8,
                   TRUE AS mean_err_le_2
            FROM documents
        """,
        "q172_jpeg411_roundtrip": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS BIGINT) AS width,
                   CAST(12 + doc_id % 7 AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS n_components,
                   CAST(((16 + doc_id % 9 + 7) // 8) * ((12 + doc_id % 7 + 7) // 8)
                        AS BIGINT) AS n_blocks,
                   TRUE AS max_err_le_8,
                   TRUE AS mean_err_le_2
            FROM documents
        """,
        "q174_gif_roundtrip": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b,
                       4 + doc_id % 13 AS pp
                FROM documents
            ),
            bits AS (
                SELECT *, CASE WHEN pp <= 4 THEN 2 WHEN pp <= 8 THEN 3
                               ELSE 4 END AS nb
                FROM p
            ),
            s AS (
                SELECT doc_id, w, h, a, b, pp,
                       unnest(generate_series(0, w * h - 1)) AS i
                FROM bits
            ),
            agg AS (
                SELECT doc_id,
                       sum((a * ((a * i + b) % pp) + b) % 256) AS sr,
                       sum((a * ((a * i + b) % pp) + b + 85) % 256) AS sg,
                       sum((a * ((a * i + b) % pp) + b + 170) % 256) AS sb
                FROM s GROUP BY doc_id
            )
            SELECT bits.doc_id,
                   CAST(bits.w AS BIGINT) AS width,
                   CAST(bits.h AS BIGINT) AS height,
                   CAST(CASE WHEN bits.nb = 2 THEN 4 WHEN bits.nb = 3 THEN 8
                             ELSE 16 END AS BIGINT) AS palette_size,
                   CAST(bits.nb AS BIGINT) AS lzw_min_code_size,
                   FALSE AS interlaced,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b,
                   TRUE AS lzw_ok
            FROM bits JOIN agg ON bits.doc_id = agg.doc_id
        """,
        # the Sun/CCITT mu-law encode + expansion, re-derived in pure SQL
        # integer arithmetic over the synthesis ramp (floor() not //: DuckDB
        # // truncates toward zero on negatives, the codec floors)
        "q175_wav_ulaw_roundtrip": """
            WITH p AS (
                SELECT doc_id, 100 + doc_id % 50 AS n,
                       CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
                       1 + doc_id % 7 AS a, doc_id % 997 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, n, rate,
                       (a * unnest(generate_series(0, n - 1)) + b) % 65536
                           - 32768 AS sv
                FROM p
            ),
            q AS (
                SELECT doc_id, n, rate, sv,
                       least(CASE WHEN sv < 0
                                  THEN -CAST(floor(sv / 4.0) AS BIGINT)
                                  ELSE CAST(floor(sv / 4.0) AS BIGINT) END,
                             8159) + 33 AS qc
                FROM s
            ),
            seg AS (
                SELECT doc_id, n, rate, sv, qc,
                       (qc > 63)::INT + (qc > 127)::INT + (qc > 255)::INT
                       + (qc > 511)::INT + (qc > 1023)::INT + (qc > 2047)::INT
                       + (qc > 4095)::INT + (qc > 8191)::INT AS sg
                FROM q
            ),
            dec AS (
                SELECT doc_id, n, rate,
                       CASE WHEN sv < 0 THEN -1 ELSE 1 END
                       * (CASE WHEN sg >= 8
                               THEN (15 * 8 + 132) * 128 - 132
                               ELSE ((qc // (1 << (sg + 1))) % 16 * 8 + 132)
                                    * (1 << sg) - 132 END) AS dv
                FROM seg
            )
            SELECT doc_id,
                   CAST(n AS BIGINT) AS n_samples,
                   CAST(7 AS BIGINT) AS fmt_tag,
                   CAST(8 AS BIGINT) AS bits,
                   CAST(rate AS BIGINT) AS sample_rate,
                   CAST(sum(dv) AS BIGINT) AS sum_decoded,
                   CAST(sum(abs(dv)) AS BIGINT) AS sum_abs_decoded,
                   CAST(max(abs(dv)) AS BIGINT) AS max_abs_decoded
            FROM dec
            GROUP BY doc_id, n, rate
        """,
        "q176_wav_adpcm_roundtrip": """
            SELECT doc_id,
                   CAST(100 + doc_id % 50 AS BIGINT) AS n_samples,
                   CAST((100 + doc_id % 50 + 64) // 65 AS BIGINT) AS n_blocks,
                   CAST(65 AS BIGINT) AS samples_per_block,
                   CAST(17 AS BIGINT) AS fmt_tag,
                   CAST(4 AS BIGINT) AS bits,
                   CAST(doc_id % 997 - 32768 AS BIGINT) AS first_sample,
                   TRUE AS max_err_le_4,
                   TRUE AS sum_err_le_2n
            FROM documents
        """,
        "q177_image_sniff": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b,
                       4 + doc_id % 13 AS pp, doc_id % 3 AS f
                FROM documents
            ),
            s AS (
                SELECT doc_id, w, h, a, b, pp, f,
                       unnest(generate_series(0, w * h - 1)) AS i
                FROM p
            ),
            agg AS (
                SELECT doc_id,
                       sum(CASE WHEN f = 2
                                THEN (a * ((a * i + b) % pp) + b) % 256
                                ELSE (a * i + b) % 256 END) AS sr,
                       sum(CASE WHEN f = 2
                                THEN (a * ((a * i + b) % pp) + b + 85) % 256
                                ELSE (a * i + b + 85) % 256 END) AS sg,
                       sum(CASE WHEN f = 2
                                THEN (a * ((a * i + b) % pp) + b + 170) % 256
                                ELSE (a * i + b + 170) % 256 END) AS sb
                FROM s GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CASE p.f WHEN 0 THEN 'ppm' WHEN 1 THEN 'png'
                            ELSE 'gif' END AS format,
                   CAST(p.w AS BIGINT) AS width,
                   CAST(p.h AS BIGINT) AS height,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q178_bmp_roundtrip": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, unnest(generate_series(0, w * h - 1)) AS i,
                       a, b
                FROM p
            ),
            agg AS (
                SELECT doc_id,
                       sum((a * i + b) % 256) AS sr,
                       sum((a * i + b + 85) % 256) AS sg,
                       sum((a * i + b + 170) % 256) AS sb
                FROM s GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.w AS BIGINT) AS width,
                   CAST(p.h AS BIGINT) AS height,
                   CAST(24 AS BIGINT) AS bpp,
                   CAST(0 AS BIGINT) AS compression,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        # independent recomputation of the BitConverter little-endian wire
        # layouts: per-byte two's-complement arithmetic (no hex/byte
        # builtins shared with the Spark side); all 64-bit inputs are
        # positive by construction, the 32-bit path exercises negatives
        # via the +2^32 unsigned view
        "q173_wire_serde": """
            WITH u AS (
                SELECT o_orderkey,
                       (o_custkey - 700)::INT AS sv,
                       o_orderkey * 1000 + 123 AS ts,
                       o_orderpriority,
                       CASE WHEN o_custkey - 700 < 0
                            THEN o_custkey - 700 + 4294967296
                            ELSE o_custkey - 700 END AS u32,
                       octet_length(encode(o_orderpriority)) AS vlen
                FROM orders
            )
            SELECT o_orderkey,
                   printf('%02X%02X%02X%02X%02X%02X%02X%02X',
                          (o_orderkey % 256)::INT,
                          ((o_orderkey // 256) % 256)::INT,
                          ((o_orderkey // 65536) % 256)::INT,
                          ((o_orderkey // 16777216) % 256)::INT,
                          ((o_orderkey // 4294967296) % 256)::INT,
                          ((o_orderkey // 1099511627776) % 256)::INT,
                          ((o_orderkey // 281474976710656) % 256)::INT,
                          ((o_orderkey // 72057594037927936) % 256)::INT
                   ) AS okey_wire_hex,
                   o_orderkey AS okey_rt,
                   printf('%02X%02X%02X%02X',
                          (u32 % 256)::INT, ((u32 // 256) % 256)::INT,
                          ((u32 // 65536) % 256)::INT,
                          ((u32 // 16777216) % 256)::INT) AS signed_wire_hex,
                   sv AS signed_rt,
                   printf('%02X%02X%02X%02X%02X%02X%02X%02X',
                          (ts % 256)::INT, ((ts // 256) % 256)::INT,
                          ((ts // 65536) % 256)::INT,
                          ((ts // 16777216) % 256)::INT,
                          ((ts // 4294967296) % 256)::INT,
                          ((ts // 1099511627776) % 256)::INT,
                          ((ts // 281474976710656) % 256)::INT,
                          ((ts // 72057594037927936) % 256)::INT)
                   || printf('%02X%02X%02X%02X',
                          (vlen % 256)::INT, ((vlen // 256) % 256)::INT,
                          ((vlen // 65536) % 256)::INT,
                          ((vlen // 16777216) % 256)::INT)
                   || hex(encode(o_orderpriority)) AS vat_hex,
                   ts AS vat_ts,
                   o_orderpriority AS vat_value
            FROM u
        """,
        "q169_jpeg420_roundtrip": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS BIGINT) AS width,
                   CAST(12 + doc_id % 7 AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS n_components,
                   CAST(((16 + doc_id % 9 + 7) // 8) * ((12 + doc_id % 7 + 7) // 8)
                        AS BIGINT) AS n_blocks,
                   TRUE AS max_err_le_8,
                   TRUE AS mean_err_le_2
            FROM documents
        """,
        "q168_jpeg_roundtrip": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS BIGINT) AS width,
                   CAST(12 + doc_id % 7 AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS n_components,
                   CAST(((16 + doc_id % 9 + 7) // 8) * ((12 + doc_id % 7 + 7) // 8)
                        AS BIGINT) AS n_blocks,
                   TRUE AS max_err_le_8,
                   TRUE AS mean_err_le_2
            FROM documents
        """,
        "q167_warc_gz_roundtrip": """
            WITH r AS (
                SELECT doc_id, doc_id // 10 AS file_id,
                       'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS uri,
                       octet_length(encode(text)) AS plen
                FROM documents
            )
            SELECT doc_id,
                   CAST(file_id AS BIGINT) AS file_id,
                   CAST(count(*) OVER (PARTITION BY file_id) AS BIGINT) AS n_members,
                   CAST(row_number() OVER (PARTITION BY file_id ORDER BY doc_id) - 1
                        AS BIGINT) AS pos_in_file,
                   uri,
                   CAST(plen AS BIGINT) AS content_length,
                   CAST(plen AS BIGINT) AS payload_octets,
                   TRUE AS ok
            FROM r
        """,
        "q166_pii_scrub_v2": """
            WITH b AS (
                SELECT doc_id,
                       lpad(CAST((doc_id * 7919 + 123456789) % 1000000000000000
                                 AS VARCHAR), 15, '0') AS base,
                       lpad(CAST((doc_id * 104729 + 987654321) % 1000000000000000000
                                 AS VARCHAR), 18, '0') AS bban
                FROM documents
            ),
            k AS (
                SELECT doc_id, base, bban,
                       (10 - list_sum(list_transform(generate_series(1, 15), j ->
                           CASE WHEN j % 2 = 0
                                THEN CAST(substr(reverse(base), j, 1) AS INT)
                                ELSE CASE WHEN CAST(substr(reverse(base), j, 1) AS INT) * 2 > 9
                                          THEN CAST(substr(reverse(base), j, 1) AS INT) * 2 - 9
                                          ELSE CAST(substr(reverse(base), j, 1) AS INT) * 2 END
                           END)) % 10) % 10 AS cchk,
                       98 - CAST(CAST(bban || '131400' AS HUGEINT) % 97 AS INT) AS ichk
                FROM b
            ),
            c AS (
                SELECT doc_id,
                       base || CAST(CASE WHEN doc_id % 2 = 0 THEN cchk
                                         ELSE (cchk + 5) % 10 END AS VARCHAR) AS card,
                       'DE' || lpad(CAST(CASE WHEN doc_id % 2 = 0 THEN ichk
                                              ELSE (ichk + 50) % 97 END AS VARCHAR), 2, '0')
                            || bban AS iban
                FROM k
            ),
            v AS (
                -- INDEPENDENT re-validation of the planted numbers (not the
                -- parity that planted them): Luhn over the full 16-digit
                -- card, native HUGEINT mod-97 over the rearranged IBAN
                SELECT doc_id,
                       CASE WHEN list_sum(list_transform(generate_series(1, 16), i ->
                           CASE WHEN i % 2 = 1
                                THEN CAST(substr(reverse(card), i, 1) AS INT)
                                ELSE CASE WHEN CAST(substr(reverse(card), i, 1) AS INT) * 2 > 9
                                          THEN CAST(substr(reverse(card), i, 1) AS INT) * 2 - 9
                                          ELSE CAST(substr(reverse(card), i, 1) AS INT) * 2 END
                           END)) % 10 = 0 THEN 1 ELSE 0 END AS card_ok,
                       CASE WHEN CAST(substr(iban, 5) || '1314' || substr(iban, 3, 2)
                                      AS HUGEINT) % 97 = 1
                            THEN 1 ELSE 0 END AS iban_ok
                FROM c
            )
            SELECT doc_id,
                   'pay <CC> to ' ||
                   CASE WHEN iban_ok = 1 THEN '<IBAN>' ELSE 'DE<CC>' END ||
                   ' or mail <EMAIL> now' AS clean_text,
                   CAST(1 AS BIGINT) AS n_email,
                   CAST(0 AS BIGINT) AS n_ssn,
                   CAST(2 AS BIGINT) AS n_phone,
                   CAST(0 AS BIGINT) AS n_ipv4,
                   CAST(1 AS BIGINT) AS n_card_candidates,
                   CAST(card_ok AS BIGINT) AS n_card_valid,
                   CAST(1 AS BIGINT) AS n_iban_candidates,
                   CAST(iban_ok AS BIGINT) AS n_iban_valid
            FROM v
        """,
        "q162_iban_mod97": """
            WITH p AS (
                SELECT doc_id,
                       lpad(CAST((doc_id * 104729 + 987654321) % 1000000000000000000
                                 AS VARCHAR), 18, '0') AS bban
                FROM documents
            ),
            k AS (
                SELECT doc_id, bban,
                       98 - CAST(CAST(bban || '131400' AS HUGEINT) % 97 AS INT) AS chk
                FROM p
            ),
            c AS (
                SELECT doc_id,
                       'invoice IBAN DE' ||
                       lpad(CAST(CASE WHEN doc_id % 2 = 0 THEN chk
                                      ELSE (chk + 50) % 97 END AS VARCHAR), 2, '0') ||
                       bban || ' due' AS text
                FROM k
            ),
            cand AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text,
                           '\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b')) AS m
                FROM c
            ),
            v AS (
                -- this corpus only plants DE IBANs, so the letter map is
                -- D->13 E->14; the rearranged 24-digit number fits HUGEINT
                SELECT doc_id,
                       CASE WHEN CAST(substr(m, 5) || '1314' || substr(m, 3, 2)
                                      AS HUGEINT) % 97 = 1
                            THEN 1 ELSE 0 END AS ok
                FROM cand
            ),
            agg AS (SELECT doc_id, count(*) AS nc, sum(ok) AS nv FROM v GROUP BY doc_id)
            SELECT c.doc_id,
                   CAST(coalesce(agg.nc, 0) AS BIGINT) AS n_candidates,
                   CAST(coalesce(agg.nv, 0) AS BIGINT) AS n_valid
            FROM c LEFT JOIN agg ON c.doc_id = agg.doc_id
        """,
        "q170_image_transcode": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS BIGINT) AS width,
                   CAST(12 + doc_id % 7 AS BIGINT) AS height,
                   CAST(3 AS BIGINT) AS n_components,
                   CAST(((16 + doc_id % 9 + 7) // 8) * ((12 + doc_id % 7 + 7) // 8)
                        AS BIGINT) AS n_blocks,
                   TRUE AS sum_r_close,
                   TRUE AS sum_g_close,
                   TRUE AS sum_b_close
            FROM documents
        """,
        "q164_png_decode": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, w, h, a, b,
                       unnest(generate_series(0, w * h - 1)) AS i
                FROM p
            ),
            agg AS (
                SELECT doc_id,
                       sum((a * i + b) % 256) AS sr,
                       sum((a * i + b + 85) % 256) AS sg,
                       sum((a * i + b + 170) % 256) AS sb
                FROM s GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.w AS BIGINT) AS width,
                   CAST(p.h AS BIGINT) AS height,
                   CAST(8 AS BIGINT) AS bit_depth,
                   CAST(2 AS BIGINT) AS color_type,
                   CAST(least(p.h, 5) AS BIGINT) AS n_filter_types,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b,
                   TRUE AS crc_ok
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q165_png_resize": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, w, h, a, b,
                       unnest(generate_series(0, w * h - 1)) AS i
                FROM p
            ),
            v AS (
                SELECT doc_id, w, h, i % w AS x, i // w AS y,
                       (a * i + b) % 256 AS r,
                       (a * i + b + 85) % 256 AS g,
                       (a * i + b + 170) % 256 AS bl
                FROM s
            ),
            m AS (
                SELECT doc_id, y // 4 AS by, x // 4 AS bx,
                       sum(r) // 16 AS mr, sum(g) // 16 AS mg, sum(bl) // 16 AS mb
                FROM v
                WHERE x < (w // 4) * 4 AND y < (h // 4) * 4
                GROUP BY doc_id, y // 4, x // 4
            ),
            agg AS (
                SELECT doc_id, sum(mr) AS sr, sum(mg) AS sg, sum(mb) AS sb
                FROM m GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.w // 4 AS BIGINT) AS width,
                   CAST(p.h // 4 AS BIGINT) AS height,
                   CAST(8 AS BIGINT) AS bit_depth,
                   CAST(2 AS BIGINT) AS color_type,
                   CAST(least(p.h // 4, 5) AS BIGINT) AS n_filter_types,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b,
                   TRUE AS crc_ok
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q163_audio_pipeline": """
            WITH p AS (
                SELECT doc_id,
                       80 + doc_id % 40 AS n,
                       CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
                       1 + doc_id % 7 AS a,
                       doc_id % 997 AS b,
                       doc_id % 37 AS pre,
                       doc_id % 23 AS post
                FROM documents
            ),
            s AS (
                SELECT doc_id, pre, n, pre + n + post AS total,
                       unnest(generate_series(0, pre + n + post - 1)) AS i, a, b
                FROM p
            ),
            v AS (
                SELECT doc_id, total, i, i // 16 AS f,
                       CASE WHEN i < pre OR i >= pre + n THEN 0
                            ELSE ((a * (i - pre) + b) % 65536) - 32768 END AS val
                FROM s
            ),
            fr AS (SELECT doc_id, f, max(abs(val)) AS fpeak FROM v GROUP BY doc_id, f),
            bounds AS (
                SELECT doc_id, min(f) AS fa, max(f) AS fb
                FROM fr WHERE fpeak > 0 GROUP BY doc_id
            ),
            kept AS (
                SELECT v.doc_id, v.val, v.i - b.fa * 16 AS pos,
                       least((b.fb + 1) * 16, v.total) - b.fa * 16 AS klen
                FROM v JOIN bounds b ON v.doc_id = b.doc_id
                WHERE v.i >= b.fa * 16 AND v.i < least((b.fb + 1) * 16, v.total)
            ),
            ds AS (
                SELECT doc_id, pos // 2 AS blk, val
                FROM kept WHERE pos < (klen // 2) * 2
            ),
            o AS (
                SELECT doc_id, blk, CAST(floor(sum(val) / 2.0) AS BIGINT) AS oval
                FROM ds GROUP BY doc_id, blk
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_out, max(abs(oval)) AS peak,
                       sum(oval * oval) AS sq
                FROM o GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.rate // 2 AS BIGINT) AS sample_rate,
                   CAST(1 AS BIGINT) AS n_channels,
                   CAST(16 AS BIGINT) AS bits,
                   CAST(coalesce(agg.n_out, 0) AS BIGINT) AS n_samples,
                   CAST(44 + 2 * coalesce(agg.n_out, 0) AS BIGINT) AS wire_len,
                   CAST(coalesce(agg.peak, 0) AS BIGINT) AS peak_abs,
                   CAST(coalesce(agg.sq, 0) AS BIGINT) AS sumsq
            FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q158_ppm_decode": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, w, h, a, b,
                       unnest(generate_series(0, w * h - 1)) AS i
                FROM p
            ),
            agg AS (
                SELECT doc_id,
                       sum((a * i + b) % 256) AS sr,
                       sum((a * i + b + 85) % 256) AS sg,
                       sum((a * i + b + 170) % 256) AS sb
                FROM s GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.w AS BIGINT) AS width,
                   CAST(p.h AS BIGINT) AS height,
                   CAST(255 AS BIGINT) AS maxval,
                   CAST(9 + length(CAST(p.w AS VARCHAR)) + length(CAST(p.h AS VARCHAR))
                        + 3 * p.w * p.h AS BIGINT) AS wire_len,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q160_wav_downsample": """
            WITH p AS (
                SELECT doc_id,
                       100 + doc_id % 50 AS n,
                       CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate,
                       1 + doc_id % 7 AS a,
                       doc_id % 997 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, n, rate,
                       unnest(generate_series(0, n - 1)) AS i, a, b
                FROM p
            ),
            v AS (
                SELECT doc_id, i // 3 AS blk,
                       ((a * i + b) % 65536) - 32768 AS val
                FROM s WHERE i < (n // 3) * 3
            ),
            o AS (
                SELECT doc_id, blk,
                       CAST(floor(sum(val) / 3.0) AS BIGINT) AS oval
                FROM v GROUP BY doc_id, blk
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_out, max(abs(oval)) AS peak,
                       sum(oval * oval) AS sq
                FROM o GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.rate // 3 AS BIGINT) AS sample_rate,
                   CAST(1 AS BIGINT) AS n_channels,
                   CAST(16 AS BIGINT) AS bits,
                   CAST(agg.n_out AS BIGINT) AS n_samples,
                   CAST(44 + 2 * agg.n_out AS BIGINT) AS wire_len,
                   CAST(agg.peak AS BIGINT) AS peak_abs,
                   CAST(agg.sq AS BIGINT) AS sumsq
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q159_ppm_resize": """
            WITH p AS (
                SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 7 AS h,
                       1 + doc_id % 5 AS a, doc_id % 251 AS b
                FROM documents
            ),
            s AS (
                SELECT doc_id, w, h, a, b,
                       unnest(generate_series(0, w * h - 1)) AS i
                FROM p
            ),
            v AS (
                SELECT doc_id, w, h, i % w AS x, i // w AS y,
                       (a * i + b) % 256 AS r,
                       (a * i + b + 85) % 256 AS g,
                       (a * i + b + 170) % 256 AS bl
                FROM s
            ),
            m AS (
                SELECT doc_id, y // 4 AS by, x // 4 AS bx,
                       sum(r) // 16 AS mr, sum(g) // 16 AS mg, sum(bl) // 16 AS mb
                FROM v
                WHERE x < (w // 4) * 4 AND y < (h // 4) * 4
                GROUP BY doc_id, y // 4, x // 4
            ),
            agg AS (
                SELECT doc_id, sum(mr) AS sr, sum(mg) AS sg, sum(mb) AS sb
                FROM m GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(p.w // 4 AS BIGINT) AS width,
                   CAST(p.h // 4 AS BIGINT) AS height,
                   CAST(255 AS BIGINT) AS maxval,
                   CAST(9 + length(CAST(p.w // 4 AS VARCHAR)) + length(CAST(p.h // 4 AS VARCHAR))
                        + 3 * (p.w // 4) * (p.h // 4) AS BIGINT) AS wire_len,
                   CAST(agg.sr AS BIGINT) AS sum_r,
                   CAST(agg.sg AS BIGINT) AS sum_g,
                   CAST(agg.sb AS BIGINT) AS sum_b
            FROM p JOIN agg ON p.doc_id = agg.doc_id
        """,
        "q44_dedup_simhash": _simhash_oracle_sql(max_hamming=8),
        "q134_minhash_incremental": _minhash_incremental_oracle_sql(0.9),
        "q148_temporal_split": r"""
            WITH s AS (SELECT event_id, event_type,
                              CASE WHEN epoch_ms(ts) < 1705708800000 THEN 'train'
                                   WHEN epoch_ms(ts) < 1706140800000 THEN 'val'
                                   ELSE 'test' END AS split
                       FROM events)
            SELECT event_type, split,
                   CAST(count(*) AS BIGINT) AS n,
                   min(event_id) AS min_id
            FROM s GROUP BY 1, 2
        """,
        "q147_url_dedup": r"""
            WITH base AS (SELECT doc_id, source FROM documents),
                 rows_ AS (
                   SELECT doc_id * 10 + 0 AS row_id,
                          'https://' || source || '.example.com/a/b?x=1&y=2' AS url FROM base
                   UNION ALL
                   SELECT doc_id * 10 + 1,
                          'HTTPS://' || upper(source) || '.EXAMPLE.com/a/b?y=2&x=1' FROM base
                   UNION ALL
                   SELECT doc_id * 10 + 2,
                          'https://' || source || '.example.com:443/a/b/?x=1&y=2' FROM base
                   UNION ALL
                   SELECT doc_id * 10 + 3,
                          'https://' || source || '.example.com/a/b?x=1&y=2#frag' FROM base
                   UNION ALL
                   SELECT doc_id * 10 + 4,
                          'https://' || source || '.example.com/other' FROM base),
                 n AS (
                   SELECT row_id,
                          regexp_replace(trim(url), '#.*$', '') AS u
                   FROM rows_),
                 parts0 AS (
                   SELECT row_id,
                          lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                          lower(regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                                               '^([^/?]+)', 1)) AS rawhost,
                          regexp_replace(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                                         '^[^/?]+', '') AS pathq
                   FROM n),
                 parts AS (
                   SELECT row_id, scheme,
                          CASE WHEN scheme = 'http'  THEN regexp_replace(rawhost, ':80$', '')
                               WHEN scheme = 'https' THEN regexp_replace(rawhost, ':443$', '')
                               ELSE rawhost END AS host,
                          pathq
                   FROM parts0),
                 pq AS (
                   SELECT row_id, scheme, host,
                          CASE WHEN regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') = ''
                               THEN '/'
                               ELSE regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '')
                          END AS path,
                          array_to_string(
                              list_sort(list_filter(string_split(regexp_extract(pathq, '\?(.*)$', 1), '&'),
                                                    p -> p <> '')), '&') AS qsorted
                   FROM parts),
                 canon AS (
                   SELECT row_id,
                          scheme || '://' || host || path ||
                          CASE WHEN qsorted <> '' THEN '?' || qsorted ELSE '' END AS canon_url
                   FROM pq)
            SELECT canon_url, min(row_id) AS row_id FROM canon GROUP BY canon_url
        """,
        "q146_sessionize": r"""
            WITH base AS (SELECT user_id, event_id, epoch_ms(ts) AS t_ms FROM events
                          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
                 fl AS (SELECT user_id, event_id, t_ms,
                               CASE WHEN lag(t_ms) OVER uw IS NULL
                                         OR t_ms - lag(t_ms) OVER uw > 1800000
                                    THEN 1 ELSE 0 END AS brk
                        FROM base
                        WINDOW uw AS (PARTITION BY user_id ORDER BY t_ms, event_id)),
                 s AS (SELECT user_id, event_id, t_ms,
                              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t_ms, event_id
                                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                   AS BIGINT) AS session_idx
                       FROM fl)
            SELECT user_id, event_id, t_ms, session_idx,
                   CAST(row_number() OVER (PARTITION BY user_id, session_idx
                                           ORDER BY t_ms, event_id) AS BIGINT) AS pos
            FROM s
        """,
        "q144_cohort_retention": r"""
            WITH base AS (SELECT user_id, ts FROM events
                          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
                 b AS (SELECT user_id,
                              epoch_ms(ts) - (epoch_ms(ts) % 604800000) AS bk
                       FROM base),
                 fs AS (SELECT user_id, min(bk) AS cohort FROM b GROUP BY 1),
                 act AS (SELECT DISTINCT user_id, bk FROM b)
            SELECT cohort AS cohort_ms,
                   CAST((bk - cohort) / 604800000 AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM act JOIN fs USING (user_id)
            GROUP BY 1, 2
        """,
        "q145_hybrid_search": r"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                             t -> t <> '') AS t
                          FROM documents),
                 lens AS (SELECT doc_id, len(t) AS dl FROM toks),
                 tot AS (SELECT CAST(count(*) AS DOUBLE) AS N,
                                avg(CAST(dl AS DOUBLE)) AS avgdl
                         FROM lens),
                 occ AS (SELECT doc_id, unnest(t) AS term FROM toks),
                 tf AS (SELECT doc_id, term, count(*) AS tf
                        FROM occ WHERE term IN ('join', 'window', 'shuffle')
                        GROUP BY doc_id, term),
                 dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
                 c AS (SELECT tf.doc_id,
                              CAST(floor(1000.0
                                   * ln(1.0 + (tot.N - CAST(dfreq.df AS DOUBLE) + 0.5)
                                              / (CAST(dfreq.df AS DOUBLE) + 0.5))
                                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                                   / (CAST(tf.tf AS DOUBLE)
                                      + 1.2 * (0.25 + 0.75 * CAST(lens.dl AS DOUBLE)
                                                      / tot.avgdl)))
                                   AS BIGINT) AS c_q
                       FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id), tot),
                 sc AS (SELECT doc_id,
                               CAST(count(*) AS BIGINT) AS n_terms_hit,
                               CAST(sum(c_q) AS BIGINT) AS score_q
                        FROM c GROUP BY doc_id),
                 cand AS (SELECT doc_id, score_q FROM sc
                          ORDER BY score_q DESC, doc_id LIMIT 50),
                 ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 qv AS (SELECT v AS q, sqrt(list_dot_product(v, v)) AS qn
                        FROM ev WHERE vec_id = 7),
                 rr AS (SELECT cand.doc_id, cand.score_q,
                               CAST(floor(10000.0 * list_dot_product(qv.q, ev.v)
                                          / (qv.qn * sqrt(list_dot_product(ev.v, ev.v))))
                                    AS BIGINT) AS cos_q
                        FROM cand JOIN ev ON ev.vec_id = cand.doc_id, qv),
                 rk AS (SELECT doc_id, score_q, cos_q,
                               CAST(row_number() OVER (ORDER BY cos_q DESC, score_q DESC,
                                                       doc_id) AS BIGINT) AS rank
                        FROM rr)
            SELECT doc_id, score_q, cos_q, rank FROM rk WHERE rank <= 10
        """,
        "q152_windowed_distinct": r"""
            SELECT event_type,
                   epoch_ms(ts) - (epoch_ms(ts) % 3600000) AS w_start_ms,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
                   TRUE AS users_ok
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        """,
        "q153_domain_blocklist": r"""
            WITH g AS (SELECT source, doc_id,
                              list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                          t -> t <> '') AS tk
                       FROM documents),
                 gr AS (SELECT source, doc_id,
                               list_concat(tk,
                                   CASE WHEN len(tk) >= 2
                                        THEN list_transform(range(1, len(tk)),
                                                            i -> tk[i] || ' ' || tk[i + 1])
                                        ELSE [] END) AS gs
                        FROM g),
                 sc0 AS (SELECT source, doc_id,
                               CAST(coalesce(list_sum(list_transform(gs,
                                   w -> ('0x' || substr(md5('w:' || CAST(
                                             ('0x' || substr(md5('f:' || w), 1, 8))::BIGINT % 4096
                                         AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000)), 0)
                                    AS BIGINT) AS score_q
                        FROM gr),
                 sc AS (SELECT source, score_q FROM sc0
                        UNION ALL
                        SELECT 'spamfarm.example', score_q - 100000
                        FROM sc0 WHERE doc_id % 5 = 0)
            SELECT source AS domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CAST(score_q AS DECIMAL(18,6))) AS DOUBLE) AS sum_score,
                   sum(CAST(score_q AS DECIMAL(18,6)))
                       < CAST(0.0 AS DECIMAL(18,6)) * count(*) AS blocked
            FROM sc GROUP BY source HAVING count(*) >= 20
        """,
        "q151_jaccard_exact": r"""
            -- brute force over all pairs: the exact ground truth the
            -- prefix-filter join must reproduce completely
            WITH d AS (SELECT doc_id,
                              regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                       FROM documents),
                 g AS (SELECT doc_id,
                              list_distinct(list_transform(range(1, len(toks) - 1),
                                            i -> array_to_string(toks[i:i+2], ' '))) AS grams
                       FROM d WHERE len(toks) >= 3),
                 p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              len(list_intersect(a.grams, b.grams)) AS i_n,
                              len(a.grams) AS na, len(b.grams) AS nb
                       FROM g a JOIN g b ON a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   CAST(i_n AS BIGINT) AS inter_n,
                   CAST(na + nb - i_n AS BIGINT) AS union_n
            FROM p
            WHERE CAST(i_n AS DOUBLE) / (na + nb - i_n) >= 0.4
        """,
        "q150_rate_anomaly_time": r"""
            WITH sel AS (SELECT event_id, ts, event_type FROM events),
                 corpus AS (SELECT * FROM sel
                            UNION ALL
                            SELECT event_id, ts, 'sparse_probe' FROM sel
                            WHERE event_id % 97 = 0),
                 c AS (SELECT event_type,
                              epoch_ms(ts) - (epoch_ms(ts) % 3600000) AS w_start_ms,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM corpus WHERE ts IS NOT NULL
                       GROUP BY 1, 2),
                 t AS (SELECT event_type, w_start_ms, cnt,
                              CAST(coalesce(sum(cnt) OVER tw, 0) AS BIGINT) AS s,
                              CAST(coalesce(sum(cnt * cnt) OVER tw, 0) AS BIGINT) AS q,
                              min(w_start_ms) OVER (PARTITION BY event_type) AS first_w
                       FROM c
                       WINDOW tw AS (PARTITION BY event_type ORDER BY w_start_ms
                                     RANGE BETWEEN 21600000 PRECEDING
                                           AND 3600000 PRECEDING))
            SELECT event_type, w_start_ms, cnt,
                   CAST(6 * cnt - s AS BIGINT) AS dev,
                   CAST(6 * q - s * s AS BIGINT) AS var_n,
                   (w_start_ms - first_w >= 21600000
                    AND (6 * cnt - s) > 0
                    AND (6 * cnt - s) * (6 * cnt - s) > 9 * (6 * q - s * s)) AS is_anomaly
            FROM t
        """,
        "q141_rate_anomaly": r"""
            WITH sel AS (SELECT event_id, ts, event_type FROM events),
                 burst AS (SELECT * FROM sel
                           WHERE event_type = 'click'
                             AND ts >= TIMESTAMP '2024-01-05 00:00:00'
                             AND ts <  TIMESTAMP '2024-01-05 01:00:00'),
                 corpus AS (SELECT * FROM sel
                            UNION ALL SELECT event_id + 1000000, ts, event_type FROM burst
                            UNION ALL SELECT event_id + 2000000, ts, event_type FROM burst),
                 c AS (SELECT event_type,
                              epoch_ms(ts) - (epoch_ms(ts) % 3600000) AS w_start_ms,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM corpus WHERE ts IS NOT NULL
                       GROUP BY 1, 2),
                 t AS (SELECT event_type, w_start_ms, cnt,
                              CAST(count(*) OVER tw AS BIGINT) AS n_trail,
                              CAST(coalesce(sum(cnt) OVER tw, 0) AS BIGINT) AS s,
                              CAST(coalesce(sum(cnt * cnt) OVER tw, 0) AS BIGINT) AS q
                       FROM c
                       WINDOW tw AS (PARTITION BY event_type ORDER BY w_start_ms
                                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
            SELECT event_type, w_start_ms, cnt, n_trail,
                   CAST(n_trail * cnt - s AS BIGINT) AS dev,
                   CAST(n_trail * q - s * s AS BIGINT) AS var_n,
                   (n_trail = 6 AND (n_trail * cnt - s) > 0
                    AND (n_trail * cnt - s) * (n_trail * cnt - s) > 9 * (n_trail * q - s * s))
                       AS is_anomaly
            FROM t
        """,
        "q142_windowed_topk": r"""
            WITH c AS (SELECT event_type,
                              epoch_ms(ts) - (epoch_ms(ts) % 86400000) AS w_start_ms,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM events WHERE ts IS NOT NULL
                       GROUP BY 1, 2),
                 r AS (SELECT event_type, w_start_ms, cnt,
                              CAST(row_number() OVER (PARTITION BY w_start_ms
                                                      ORDER BY cnt DESC, event_type) AS BIGINT)
                                  AS rank
                       FROM c)
            SELECT event_type, w_start_ms, cnt, rank FROM r WHERE rank <= 3
        """,
        "q143_funnel": r"""
            WITH base AS (SELECT user_id, ts, event_type FROM events
                          WHERE user_id IS NOT NULL),
                 s1 AS (SELECT user_id, min(ts) AS s1 FROM base
                        WHERE event_type = 'view' GROUP BY 1),
                 s2 AS (SELECT s1.user_id, s1.s1, min(b.ts) AS s2
                        FROM s1 LEFT JOIN base b
                          ON b.user_id = s1.user_id AND b.event_type = 'click'
                             AND b.ts >= s1.s1
                        GROUP BY 1, 2),
                 s3 AS (SELECT s2.user_id, s2.s1, s2.s2, min(b.ts) AS s3
                        FROM s2 LEFT JOIN base b
                          ON b.user_id = s2.user_id AND b.event_type = 'purchase'
                             AND b.ts >= s2.s2
                        GROUP BY 1, 2, 3)
            SELECT user_id,
                   CAST(1 + CAST(s2 IS NOT NULL AS INT) + CAST(s3 IS NOT NULL AS INT)
                        AS BIGINT) AS steps_reached,
                   epoch_ms(s1) AS t_first_ms,
                   epoch_ms(coalesce(s3, s2, s1)) AS t_last_ms,
                   (s3 IS NOT NULL AND epoch_ms(s3) - epoch_ms(s1) <= 604800000)
                       AS converted
            FROM s3
        """,
        "q140_fuzzy_keep_best": r"""
            WITH RECURSIVE corpus AS (
                SELECT doc_id, text, source FROM documents
                UNION ALL
                SELECT doc_id + 20000, text || ' zq', 'src99' FROM documents
                WHERE doc_id < 40),
            base AS (SELECT doc_id,
                            substr(lower(trim(text)), 1, 24) AS b,
                            substr(lower(trim(text)), 1, 256) AS p
                     FROM corpus),
            capped AS (SELECT * FROM (
                           SELECT doc_id, b, p,
                                  row_number() OVER (PARTITION BY b ORDER BY doc_id) AS rn
                           FROM base)
                       WHERE rn <= 50),
            pairs AS (SELECT a.doc_id AS id_a, c.doc_id AS id_b
                      FROM capped a JOIN capped c USING (b)
                      WHERE a.doc_id < c.doc_id AND levenshtein(a.p, c.p) <= 8),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION
                      SELECT id_b AS src, id_a AS dst FROM pairs),
            reach(node, label) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
            comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
            pr AS (SELECT doc_id, CAST(substr(source, 4) AS INT) AS priority FROM corpus),
            members AS (SELECT c.node AS doc_id, c.cluster_id, p.priority
                        FROM comp c JOIN pr p ON p.doc_id = c.node),
            losers AS (SELECT doc_id FROM (
                           SELECT doc_id,
                                  row_number() OVER (PARTITION BY cluster_id
                                                     ORDER BY priority DESC, doc_id) AS rn
                           FROM members)
                       WHERE rn > 1)
            SELECT doc_id, priority FROM pr
            WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        """,
        "q138_dedup_priority": r"""
            WITH corpus AS (
                SELECT doc_id, text, source FROM documents
                UNION ALL
                SELECT doc_id + 70000, text, 'src99' FROM documents WHERE doc_id < 40),
                 pr AS (SELECT doc_id, md5(text) AS fp,
                               CAST(substr(source, 4) AS INT) AS priority
                        FROM corpus),
                 r AS (SELECT fp, doc_id, priority,
                              row_number() OVER (PARTITION BY fp
                                                 ORDER BY priority DESC, doc_id ASC) AS rn
                       FROM pr)
            SELECT fp, doc_id, priority FROM r WHERE rn = 1
        """,
        "q139_histogram": r"""
            WITH b AS (
              SELECT CASE WHEN x < 0.0 THEN -1
                          WHEN x >= 100000.0 THEN 20
                          ELSE CAST(floor((x - 0.0) / 5000.0) AS INT) END AS bin
              FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem)
              WHERE x IS NOT NULL)
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   0.0 + bin * 5000.0 AS lo_edge,
                   0.0 + (bin + 1) * 5000.0 AS hi_edge
            FROM b GROUP BY bin
        """,
        "q137_vocab_drift": r"""
            WITH oldd AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
                 newd AS (SELECT doc_id,
                                 CASE WHEN doc_id % 2 = 0 THEN text || ' driftterm driftterm'
                                      ELSE text END AS text
                          FROM documents WHERE doc_id >= 250),
                 co AS (SELECT tok AS token, count(*) AS cnt_old
                        FROM (SELECT unnest(list_filter(
                                  string_split_regex(lower(trim(text)), '\s+'),
                                  t -> t <> '')) AS tok FROM oldd)
                        GROUP BY 1),
                 cn AS (SELECT tok AS token, count(*) AS cnt_new
                        FROM (SELECT unnest(list_filter(
                                  string_split_regex(lower(trim(text)), '\s+'),
                                  t -> t <> '')) AS tok FROM newd)
                        GROUP BY 1),
                 j AS (SELECT coalesce(co.token, cn.token) AS token,
                              CAST(coalesce(cnt_old, 0) AS BIGINT) AS cnt_old,
                              CAST(coalesce(cnt_new, 0) AS BIGINT) AS cnt_new
                       FROM co FULL OUTER JOIN cn ON co.token = cn.token),
                 t AS (SELECT sum(cnt_old) AS t_old, sum(cnt_new) AS t_new,
                              count(*) AS vsz FROM j)
            SELECT token, cnt_old, cnt_new,
                   CAST(floor(1000.0 * (
                       ln(CAST(cnt_new + 1 AS DOUBLE) / CAST(t.t_new + t.vsz AS DOUBLE))
                     - ln(CAST(cnt_old + 1 AS DOUBLE) / CAST(t.t_old + t.vsz AS DOUBLE))
                   )) AS BIGINT) AS dlog_q
            FROM j CROSS JOIN t
            ORDER BY cnt_old + cnt_new DESC, token
            LIMIT 50
        """,
        "q136_cluster_balanced": r"""
            WITH c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 cent AS (
                   SELECT i - 1 AS i, cv FROM (
                     SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS i,
                            v AS cv
                     FROM c0
                   ) WHERE i <= 8
                 ),
                 asg AS (
                   SELECT c0.vec_id, cent.i,
                          list_dot_product(cent.cv, cent.cv)
                              - 2.0 * list_dot_product(c0.v, cent.cv) AS d
                   FROM c0 CROSS JOIN cent
                 ),
                 cells AS (
                   SELECT vec_id, i AS cluster
                   FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
                         FROM asg)
                   WHERE rn = 1
                 ),
                 r AS (
                   SELECT vec_id, cluster,
                          row_number() OVER (
                            PARTITION BY cluster
                            ORDER BY ('0x' || substr(md5('cb:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
                                         % 1000000,
                                     vec_id) AS rn
                   FROM cells)
            SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM r WHERE rn <= 20
        """,
        "q135_warc_html_extract": r"""
            WITH h AS (
              SELECT doc_id,
                     '<html><head><style>p{margin:0}</style>' ||
                     '<script>tracker(1 < 2)</script></head><body><h1>Doc ' ||
                     CAST(doc_id AS VARCHAR) || '</h1><p>' ||
                     replace(text, ' spark ', '</p><p>') ||
                     '</p><p>Tom &amp; Jerry &lt;3 &quot;quoted&quot;</p></body></html>'
                         AS html
              FROM documents),
            p AS (
              SELECT doc_id, html,
                     trim(regexp_replace(regexp_replace(regexp_replace(
                          replace(replace(replace(replace(replace(replace(
                          regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                              '(?is)<script[^>]*>.*?</script>', '', 'g'),
                              '(?is)<style[^>]*>.*?</style>', '', 'g'),
                              '(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote)>|<br[ /]*>',
                              chr(10), 'g'),
                              '<[^>]*>', '', 'g'),
                          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                          '&#39;', chr(39)), '&amp;', '&'),
                          '[ \t]+', ' ', 'g'),
                          ' ?\n ?', chr(10), 'g'),
                          '\n{3,}', chr(10) || chr(10), 'g')) AS plain
              FROM h)
            SELECT doc_id, TRUE AS ok,
                   CAST(octet_length(encode(html)) AS BIGINT) AS html_octets,
                   CAST(octet_length(encode(plain)) AS BIGINT) AS plain_octets,
                   md5(plain) AS plain_fp
            FROM p
        """,
        "q47_ann_lsh": _ann_lsh_oracle_sql(),
        "q45_ngram_jaccard": r"""
            WITH d AS (
                SELECT doc_id,
                       list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
                FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                      FROM documents WHERE doc_id % 7 = 0)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) >= 0.05
        """,
        "q46_cosine_topk": """
            WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 16),
                 c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
            SELECT q_id, n_id FROM (
                SELECT q.q_id, c.n_id,
                       row_number() OVER (PARTITION BY q.q_id
                                          ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.n_id) AS rk
                FROM q JOIN c ON q.q_id != c.n_id
            ) WHERE rk <= 5
        """,
        "q48_text_stats": r"""
            WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_text,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS BIGINT) AS stop_hits,
                   CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
                   CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS punct_count,
                   CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS chars_per_token
            FROM t
        """,
        "q49_token_count": r"""
            SELECT doc_id,
                   CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS bpe_tokens
            FROM documents
        """,
        "q50_language_id": r"""
            WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
            SELECT doc_id,
                   CASE WHEN len(list_filter(toks, t -> list_contains(['the','and','of','is','a'], t))) >= 3 THEN 'en'
                        WHEN len(toks) < 5 THEN 'und'
                        ELSE 'other' END AS guessed_lang
            FROM t
        """,
        "q51_fingerprint": r"""
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents
        """,
        "q53_merge_union": """
            SELECT etype, count(*) AS cnt FROM (
                SELECT event_type AS etype FROM events WHERE event_type = 'click'
                UNION ALL
                SELECT event_type AS etype FROM events WHERE event_type = 'purchase'
            ) GROUP BY etype
        """,
        "q54_topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders
            ) WHERE rk <= 3
        """,
        "q55_global_topn": """
            SELECT event_id, user_id, value FROM events
            ORDER BY value DESC, event_id LIMIT 20
        """,
        "q56_set_except": """
            SELECT user_id FROM events WHERE event_type = 'click' AND value > 150
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
        """,
        "q57_set_intersect": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
        """,
        "q58_analytic_running": """
            SELECT o_orderkey, o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
                   row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders
        """,
        "q59_serde_roundtrip": """
            SELECT user_id, count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events GROUP BY user_id
        """,
        "q60_embedding_neardup": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 u AS (SELECT vec_id, v FROM e
                       UNION ALL
                       SELECT vec_id + 10000 AS vec_id, v FROM e WHERE vec_id % 5 = 0)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM u a JOIN u b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.9
        """,
        "q61_session_window": """
            WITH e AS (SELECT user_id, ts FROM events WHERE user_id IS NOT NULL),
                 m AS (SELECT user_id, ts,
                              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS brk
                       FROM e),
                 s AS (SELECT user_id, ts,
                              sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                       FROM m)
            SELECT user_id,
                   epoch_ms(min(ts)) AS s_start_ms,
                   epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS s_end_ms,
                   count(*) AS cnt
            FROM s GROUP BY user_id, sid
        """,
        "q70_window_hopping_grace": """
            WITH arr AS (
                SELECT event_type, ts,
                       max(ts) OVER (PARTITION BY user_id % 4 ORDER BY event_id % 97, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stream_time
                FROM events
            ),
            hopped AS (
                SELECT event_type, ts, stream_time,
                       ((epoch_ms(ts) // 600000) - k) * 600000 AS w_start_ms
                FROM arr CROSS JOIN (VALUES (0), (1), (2)) AS hop(k)
            )
            SELECT event_type, w_start_ms, w_start_ms + 1800000 AS w_end_ms, count(*) AS cnt
            FROM hopped
            WHERE make_timestamp((w_start_ms + 1800000) * 1000) > stream_time - INTERVAL 10 MINUTE
            GROUP BY 1, 2, 3
        """,
        "q69_sliding_agg": """
            SELECT event_id, user_id,
                   count(*) OVER w AS w_cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS w_total
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW)
        """,
        "q62_asof_join": """
            WITH c AS (SELECT user_id, ts, event_id AS l_id FROM events WHERE event_type = 'click'),
                 p0 AS (SELECT user_id, ts, value AS p_value, event_id AS p_id
                        FROM events WHERE event_type = 'purchase'),
                 p AS (SELECT user_id, ts, p_value FROM (
                         SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY p_id DESC) AS rn
                         FROM p0) WHERE rn = 1)
            SELECT c.user_id, c.l_id, p.p_value, epoch_us(p.ts) AS matched_ts_us
            FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "q63_rollup": """
            SELECT event_type,
                   epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day_ms,
                   count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events
            GROUP BY ROLLUP(event_type, day_ms)
        """,
        "q64_count_distinct": """
            SELECT event_type AS etype, count(DISTINCT user_id) AS users
            FROM events GROUP BY event_type
        """,
        "q65_semi_join": """
            SELECT event_id, user_id, event_type FROM events
            WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        """,
        "q66_anti_join": """
            SELECT event_id, user_id, event_type FROM events e
            WHERE user_id IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer
                              WHERE c_custkey = e.user_id AND c_acctbal > 5000)
        """,
        "q67_fk_table_join": """
            SELECT o_orderkey, o_custkey, c_name, c_acctbal
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "q68_multimodal_features": _multimodal_oracle_sql(bins=8),
        "q77_named_branches": """
            SELECT event_id,
                   CASE WHEN value >= 180.0 THEN 'ev-hot'
                        WHEN event_type = 'purchase' THEN 'ev-buy'
                        ELSE 'ev-rest' END AS branch
            FROM events
        """,
        "q81_salted_join": """
            SELECT o_orderkey, o_custkey, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "q82_decontaminate": r"""
            WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
                                                      i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS gs
                  FROM toks),
            d AS (SELECT doc_id, md5(gg) AS dg FROM (SELECT doc_id, unnest(gs) AS gg FROM g)),
            r AS (SELECT DISTINCT md5(gg) AS dg
                  FROM (SELECT unnest(gs) AS gg FROM g WHERE doc_id % 10 = 0)),
            h AS (SELECT doc_id, count(*) AS n FROM d JOIN r USING (dg) GROUP BY doc_id)
            SELECT b.doc_id,
                   CAST(COALESCE(h.n, 0) AS BIGINT) AS n_shared_ngrams,
                   COALESCE(h.n, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents) b LEFT JOIN h USING (doc_id)
        """,
        "q83_repetition_stats": r"""
            WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
            e AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                                       i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
                  FROM toks),
            pg AS (SELECT doc_id, g, count(*) AS c FROM e GROUP BY doc_id, g)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_bigrams,
                   CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac,
                   1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_bigram_frac
            FROM pg GROUP BY doc_id
        """,
        "q86_pii_scrub": r"""
            WITH synth AS (
              SELECT doc_id,
                     'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' || ' ' ||
                     'call 555 123 4567 ssn 123-45-6789 ip' || ' ' ||
                     '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' || ' ' || text AS text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                       '\+?\d[\d \-]{7,}\d', '<PHONE>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
                   CAST(len(regexp_extract_all(text, '\+?\d[\d \-]{7,}\d')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4
            FROM synth
        """,
        "q87_paragraph_dedup": r"""
            WITH parts AS (
              SELECT doc_id,
                     unnest(string_split(text, ' spark ')) AS para,
                     unnest(range(0, len(string_split(text, ' spark ')))) AS pos
              FROM documents
            ),
            ranked AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
              FROM parts
            )
            SELECT doc_id,
                   string_agg(para, ' spark ' ORDER BY pos) AS clean_text,
                   CAST(count(*) AS BIGINT) AS n_kept
            FROM ranked WHERE rn = 1
            GROUP BY doc_id
        """,
        "q88_top_ngrams": r"""
            WITH toks AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
            grams AS (
              SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS ngram
              FROM toks
            )
            SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
            FROM grams GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20
        """,
        "q89_llm_pipeline": r"""
            WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS toks
                       FROM documents),
            sig AS (
                SELECT doc_id, text,
                       CAST(len(toks) AS BIGINT) AS n_words,
                       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE) AS mean_word_len,
                       CAST(len(regexp_extract_all(text, '[#@*^]')) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
                       CAST(len(list_filter(toks, t -> list_contains(
                           ['the','be','to','of','and','that','have','with'], t))) AS BIGINT) AS stop_hits
                FROM t
            ),
            scrub AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                           '\+?\d[\d \-]{7,}\d', '<PHONE>', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean_text
                FROM sig
                WHERE (n_words BETWEEN 20 AND 80)
                  AND (mean_word_len BETWEEN 3.0 AND 8.0)
                  AND (symbol_ratio <= 0.1)
                  AND (stop_hits >= 1)
            ),
            parts AS (
                SELECT doc_id,
                       unnest(string_split(clean_text, ' spark ')) AS para,
                       unnest(range(0, len(string_split(clean_text, ' spark ')))) AS pos
                FROM scrub
            ),
            ranked AS (
                SELECT doc_id, pos, para,
                       row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
                FROM parts
            ),
            dedup AS (
                SELECT doc_id, string_agg(para, ' spark ' ORDER BY pos) AS clean_text
                FROM ranked WHERE rn = 1 GROUP BY doc_id
            ),
            t2 AS (SELECT doc_id, string_split_regex(lower(trim(clean_text)), '\s+') AS toks
                   FROM dedup),
            s2 AS (SELECT doc_id, toks,
                          unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS st
                   FROM t2)
            SELECT doc_id,
                   CAST((st - 1) // 24 AS BIGINT) AS chunk_idx,
                   CAST(len(list_slice(toks, st, st + 31)) AS BIGINT) AS n_tokens_chunk,
                   array_to_string(list_slice(toks, st, st + 31), ' ') AS chunk_text
            FROM s2
        """,
        "q90_dedup_clusters": r"""
            WITH RECURSIVE d AS (
                SELECT doc_id,
                       list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
                FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                      FROM documents)
            ),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM d a JOIN d b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                      / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) >= 0.02
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach(node, label) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            )
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM reach GROUP BY node
        """,
        "q91_url_stats": r"""
            WITH synth AS (
                SELECT doc_id,
                       text || ' see https://src' || CAST(doc_id % 20 AS VARCHAR) ||
                       '.example.com/p/' || CAST(doc_id AS VARCHAR) ||
                       CASE WHEN doc_id % 3 = 0 THEN ' and https://mirror.example.org' ELSE '' END AS text
                FROM documents
            ),
            per_doc AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(?:/[^\s]*)?')) AS BIGINT) AS n_urls,
                       CAST(len(list_distinct(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1))) AS BIGINT) AS n_domains,
                       array_to_string(list_sort(list_distinct(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1))), ',') AS domains
                FROM synth
            ),
            top AS (
                SELECT CAST(-1 AS BIGINT) AS doc_id,
                       CAST(cnt AS BIGINT) AS n_urls,
                       CAST(-1 AS BIGINT) AS n_domains,
                       domain AS domains
                FROM (
                    SELECT domain, count(*) AS cnt
                    FROM (SELECT unnest(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain FROM synth)
                    GROUP BY domain ORDER BY cnt DESC, domain LIMIT 10
                )
            )
            SELECT * FROM per_doc UNION ALL SELECT * FROM top
        """,
        "q92_pack_tokens": r"""
            WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                       FROM documents),
            s AS (SELECT doc_id, toks,
                         unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS st
                  FROM t),
            chunks AS (
                SELECT doc_id,
                       CAST((st - 1) // 24 AS BIGINT) AS chunk_idx,
                       CAST(len(list_slice(toks, st, st + 31)) AS BIGINT) AS n_tokens_chunk
                FROM s
            ),
            cum AS (
                SELECT doc_id, chunk_idx, n_tokens_chunk,
                       sum(n_tokens_chunk) OVER (ORDER BY doc_id, chunk_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens_chunk AS before
                FROM chunks
            )
            SELECT doc_id, chunk_idx, n_tokens_chunk,
                   CAST(before // 512 AS BIGINT) AS pack_id,
                   CAST(before % 512 AS BIGINT) AS pack_offset
            FROM cum
        """,
        "q93_session_store_fetch": """
            WITH e AS (SELECT user_id, ts FROM events WHERE user_id = 7),
                 m AS (SELECT user_id, ts,
                              CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                        OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS brk
                       FROM e),
                 s AS (SELECT user_id, ts,
                              sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                       FROM m)
            SELECT user_id,
                   epoch_ms(min(ts)) AS s_start_ms,
                   epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS s_end_ms,
                   count(*) AS cnt
            FROM s GROUP BY user_id, sid
            HAVING epoch_ms(max(ts) + INTERVAL 30 MINUTE) >= 1704412800000
               AND epoch_ms(min(ts)) <= 1705276800000
        """,
        "q94_frame_sample": """
            WITH p AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
                 f AS (SELECT doc_id, h, unnest(range(0, length(h) // 32, 2)) AS j FROM p)
            SELECT doc_id,
                   CAST(j AS INT) AS frame_idx,
                   substring(h, CAST(j * 32 + 1 AS INT), 32) AS frame_hex
            FROM f
        """,
        "q96_tfidf_topk": r"""
            WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
                       FROM documents),
                 tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                        FROM t WHERE term <> '' GROUP BY doc_id, term),
                 dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df_count FROM tf GROUP BY term),
                 n AS (SELECT count(*) AS n_docs FROM documents),
                 s AS (SELECT tf.doc_id, tf.term, tf.tf, dfc.df_count,
                              CAST(floor(tf.tf * ln((n.n_docs + 1.0) / (dfc.df_count + 1.0)) * 1000)
                                   AS BIGINT) AS score_q
                       FROM tf JOIN dfc USING (term) CROSS JOIN n
                       WHERE dfc.df_count >= 2),
                 r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, term)
                              AS rnk FROM s)
            SELECT doc_id, term, tf, df_count, score_q, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 5
        """,
        "q97_unigram_xent": r"""
            WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
                       FROM documents),
                 tf AS (SELECT doc_id, term, count(*) AS tf
                        FROM t WHERE term <> '' GROUP BY doc_id, term),
                 v AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
                 tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v),
                 d AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
                              sum(tf.tf * ln(CAST(v.cnt AS DOUBLE))) AS s
                       FROM tf JOIN v USING (term) GROUP BY tf.doc_id)
            SELECT doc_id, n_tokens,
                   CAST(floor((ln(tot.total) - d.s / d.n_tokens) * 1000) AS BIGINT) AS xent_q
            FROM d CROSS JOIN tot
        """,
        "q98_inverted_index": r"""
            WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
                 raw AS (SELECT doc_id,
                                unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
                                    AS term
                         FROM toks),
                 p AS (SELECT DISTINCT doc_id, term FROM raw WHERE term <> ''),
                 n AS (SELECT count(*) AS n_docs FROM documents),
                 g AS (SELECT term, CAST(count(*) AS BIGINT) AS df_count,
                              string_agg(CAST(doc_id AS VARCHAR), ','
                                         ORDER BY CAST(doc_id AS VARCHAR)) AS postings
                       FROM p GROUP BY term)
            SELECT term, df_count, postings FROM g CROSS JOIN n
            WHERE df_count >= 3 AND df_count <= n.n_docs * 0.1
        """,
        "q99_sample_mixture": """
            WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
                 r AS (SELECT lang,
                              CAST(floor(least(1000000.0,
                                   CASE lang WHEN 'en' THEN 100000000.0 WHEN 'fr' THEN 100000000.0
                                             WHEN 'zh' THEN 100000000.0 WHEN 'de' THEN 100000000.0
                                             ELSE 0.0 END / n)) AS BIGINT) AS thr
                       FROM c)
            SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
            WHERE ('0x' || substr(md5('mix2:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
                  < r.thr
        """,
        "q100_pmi_collocations": r"""
            WITH toks AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
                 uni AS (SELECT w, count(*) AS c
                         FROM (SELECT unnest(t) AS w FROM toks) WHERE w <> '' GROUP BY w),
                 big AS (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
                                AS xy FROM toks),
                 bc AS (SELECT xy, count(*) AS c_xy FROM big GROUP BY xy HAVING count(*) >= 5),
                 t1 AS (SELECT CAST(sum(c) AS DOUBLE) AS t1 FROM uni),
                 t2 AS (SELECT CAST(count(*) AS DOUBLE) AS t2 FROM big),
                 s AS (SELECT split_part(xy, ' ', 1) AS x, split_part(xy, ' ', 2) AS y, c_xy FROM bc),
                 j AS (SELECT s.x, s.y, s.c_xy, ux.c AS c_x, uy.c AS c_y
                       FROM s JOIN uni ux ON s.x = ux.w JOIN uni uy ON s.y = uy.w)
            SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy,
                   CAST(c_x AS BIGINT) AS c_x, CAST(c_y AS BIGINT) AS c_y,
                   CAST(floor((ln(CAST(c_xy AS DOUBLE)) - ln(t2.t2)
                               - ln(CAST(c_x AS DOUBLE)) - ln(CAST(c_y AS DOUBLE))
                               + 2.0 * ln(t1.t1)) * 1000) AS BIGINT) AS pmi_q
            FROM j CROSS JOIN t1 CROSS JOIN t2
            ORDER BY pmi_q DESC, x, y LIMIT 20
        """,
        "q102_versioned_join": """
            WITH c AS (SELECT user_id, ts, event_id AS c_id FROM events
                       WHERE event_type = 'click' AND user_id IS NOT NULL),
                 p0 AS (SELECT user_id, ts, value AS p_val, event_id AS p_id
                        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
                 p AS (SELECT user_id, ts, p_val FROM (
                         SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY p_id DESC) AS rn
                         FROM p0) WHERE rn = 1)
            SELECT c.user_id, c.c_id, p.p_val, epoch_us(p.ts) AS matched_ts_us
            FROM c JOIN p ON c.user_id = p.user_id
                         AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR
            QUALIFY row_number() OVER (PARTITION BY c.c_id ORDER BY p.ts DESC) = 1
        """,
        "q103_avro_wire": """
            WITH m AS (SELECT event_id, event_type, value, props,
                              epoch_us(ts) AS ts_us,
                              2 * event_id AS ze,
                              2 * epoch_us(ts) AS zt2,
                              octet_length(encode(event_type)) AS lt,
                              octet_length(encode(props)) AS lp
                       FROM events)
            SELECT event_id, ts_us, event_type, value, props,
                   (5  -- Confluent frame: magic byte + 4-byte schema id
                    + CASE WHEN ze < 128 THEN 1 WHEN ze < 16384 THEN 2
                           WHEN ze < 2097152 THEN 3 WHEN ze < 268435456 THEN 4
                           ELSE 5 END            -- zigzag varint(event_id)
                    + CASE WHEN zt2 < 128 THEN 1 WHEN zt2 < 16384 THEN 2
                           WHEN zt2 < 2097152 THEN 3 WHEN zt2 < 268435456 THEN 4
                           WHEN zt2 < 34359738368 THEN 5
                           WHEN zt2 < 4398046511104 THEN 6
                           WHEN zt2 < 562949953421312 THEN 7
                           WHEN zt2 < 72057594037927936 THEN 8
                           ELSE 9 END            -- zigzag varint(epoch µs ts)
                    + CASE WHEN 2*lt < 128 THEN 1 WHEN 2*lt < 16384 THEN 2 ELSE 3 END
                    + lt                          -- string: zigzag varint(len) + utf8
                    + 1                           -- union branch index
                    + CASE WHEN value IS NULL THEN 0 ELSE 8 END
                    + CASE WHEN 2*lp < 128 THEN 1 WHEN 2*lp < 16384 THEN 2 ELSE 3 END
                    + lp) AS wire_len
            FROM m
        """,
        "q105_sketch_stats": """
            -- exact columns recomputed; booleans are the sketch CONTRACT:
            -- Spark computes them against its own exact values, so they are
            -- TRUE literals here iff HLL(rsd=2%) lands within 3 sigma and each
            -- approx percentile within the GK rank-error guarantee.
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS users_exact,
                   TRUE AS users_ok,
                   TRUE AS p50_ok,
                   TRUE AS p99_ok
            FROM events GROUP BY event_type
        """,
        "q106_avro_embeddings": """
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS n_dims,
                   CAST(coalesce(list_sum(list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))), 0)
                        AS BIGINT) AS checksum,
                   (CASE WHEN 2*vec_id < 128 THEN 1 WHEN 2*vec_id < 16384 THEN 2
                         WHEN 2*vec_id < 2097152 THEN 3 ELSE 4 END
                    + CASE WHEN len(embedding) = 0 THEN 1
                           ELSE CASE WHEN 2*len(embedding) < 128 THEN 1
                                     WHEN 2*len(embedding) < 16384 THEN 2
                                     ELSE 3 END
                                + 4 * len(embedding) + 1 END) AS wire_len
            FROM embeddings
        """,
        "q107_protobuf_embeddings": """
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS n_dims,
                   CAST(coalesce(list_sum(list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))), 0)
                        AS BIGINT) AS checksum,
                   (1 + CASE WHEN vec_id < 128 THEN 1 WHEN vec_id < 16384 THEN 2
                             WHEN vec_id < 2097152 THEN 3 ELSE 4 END
                    + CASE WHEN len(embedding) = 0 THEN 0
                           ELSE 1 + CASE WHEN 4*len(embedding) < 128 THEN 1
                                         WHEN 4*len(embedding) < 16384 THEN 2
                                         ELSE 3 END
                                + 4 * len(embedding) END) AS wire_len
            FROM embeddings
        """,
        "q108_repeated_spans": r"""
            WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
            w AS (SELECT doc_id,
                         unnest(CASE WHEN len(t) >= 15
                                     THEN list_transform(range(1, len(t) - 13),
                                          i -> array_to_string(list_slice(t, i, i + 14), ' '))
                                     ELSE [] END) AS span
                  FROM toks),
            c AS (SELECT span, count(*) AS cnt FROM w GROUP BY span),
            d AS (SELECT w.doc_id,
                         CAST(count(*) AS BIGINT) AS n_windows,
                         CAST(count(*) FILTER (WHERE c.cnt >= 2) AS BIGINT) AS n_dup_windows
                  FROM w JOIN c USING (span)
                  GROUP BY w.doc_id)
            SELECT doc_id,
                   coalesce(n_windows, 0) AS n_windows,
                   coalesce(n_dup_windows, 0) AS n_dup_windows,
                   CASE WHEN coalesce(n_windows, 0) > 0
                        THEN CAST(n_dup_windows AS DOUBLE) / CAST(n_windows AS DOUBLE)
                        ELSE 0.0 END AS dup_frac
            FROM documents LEFT JOIN d USING (doc_id)
        """,
        "q109_semantic_dedup": """
            WITH RECURSIVE
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            u AS (SELECT vec_id, v FROM e
                  UNION ALL
                  SELECT vec_id + 10000 AS vec_id, v FROM e WHERE vec_id % 5 = 0),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM u a JOIN u b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.v, b.v) >= 0.9
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach(node, label) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
            ),
            lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
            SELECT vec_id FROM u
            WHERE vec_id NOT IN (SELECT node FROM lab WHERE cluster_id <> node)
        """,
        "q110_dsir_weights": r"""
            WITH toks AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
            g AS (SELECT doc_id, lang,
                         unnest(CASE WHEN len(t) >= 2
                                     THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                                     ELSE [] END) AS gram
                  FROM toks),
            b AS (SELECT doc_id, lang,
                         ('0x' || substr(md5(gram), 1, 8))::BIGINT % 10000 AS bk
                  FROM g),
            r_hist AS (SELECT bk, count(*) AS cr FROM b GROUP BY bk),
            t_hist AS (SELECT bk, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bk),
            tot AS (SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM r_hist) AS tr,
                           (SELECT CAST(sum(ct) AS DOUBLE) FROM t_hist) AS tt),
            scores AS (
                SELECT r_hist.bk,
                       CAST(floor(1000.0 * (
                           ln(CAST(coalesce(t_hist.ct, 0) AS DOUBLE) + 1.0)
                           - ln(tot.tt + 10000.0)
                           - ln(CAST(r_hist.cr AS DOUBLE) + 1.0)
                           + ln(tot.tr + 10000.0))) AS BIGINT) AS score_q
                FROM r_hist LEFT JOIN t_hist USING (bk), tot
            ),
            per_doc AS (
                SELECT b.doc_id,
                       CAST(count(*) AS BIGINT) AS n_grams,
                       CAST(sum(scores.score_q) AS BIGINT) AS logw_q
                FROM b JOIN scores ON b.bk = scores.bk
                GROUP BY b.doc_id
            )
            SELECT d.doc_id,
                   coalesce(per_doc.n_grams, 0) AS n_grams,
                   coalesce(per_doc.logw_q, 0) AS logw_q
            FROM documents d LEFT JOIN per_doc USING (doc_id)
        """,
        "q111_bigram_backoff": r"""
            WITH toks AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
            uni AS (SELECT w, count(*) AS c_w FROM (
                        SELECT unnest(t) AS w FROM toks WHERE lang = 'en') WHERE w <> '' GROUP BY w),
            tot AS (SELECT CAST(sum(c_w) AS DOUBLE) AS T FROM uni),
            big AS (SELECT xy, count(*) AS c_xy FROM (
                        SELECT unnest(CASE WHEN len(t) >= 2
                                           THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                                           ELSE [] END) AS xy
                        FROM toks WHERE lang = 'en') GROUP BY xy),
            occ AS (SELECT doc_id,
                           unnest(CASE WHEN len(t) >= 2
                                       THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
                                       ELSE [] END) AS xy
                    FROM toks),
            scored AS (
                SELECT occ.doc_id,
                       CAST(floor(1000.0 * (CASE
                           WHEN big.c_xy IS NOT NULL
                           THEN ln(CAST(big.c_xy AS DOUBLE)) - ln(CAST(ux.c_w AS DOUBLE))
                           ELSE -0.916290731874155
                                + ln(CAST(uy.c_w AS DOUBLE)) - ln(tot.T)
                       END)) AS BIGINT) AS s_q
                FROM occ
                LEFT JOIN big USING (xy)
                LEFT JOIN uni ux ON split_part(occ.xy, ' ', 1) = ux.w
                LEFT JOIN uni uy ON split_part(occ.xy, ' ', 2) = uy.w, tot
            ),
            per_doc AS (SELECT doc_id,
                               CAST(count(*) AS BIGINT) AS n_bigrams,
                               CAST(sum(s_q) AS BIGINT) AS logp_q
                        FROM scored GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(per_doc.n_bigrams, 0) AS n_bigrams,
                   coalesce(per_doc.logp_q, 0) AS logp_q
            FROM documents d LEFT JOIN per_doc USING (doc_id)
        """,
        "q112_char_entropy": """
            WITH c AS (SELECT doc_id,
                              list_filter(string_split(text, ''), x -> x <> '') AS ch
                       FROM documents),
                 m AS (SELECT doc_id, ch, list_distinct(ch) AS d FROM c),
                 s AS (SELECT doc_id,
                              len(ch) AS n_chars,
                              len(d) AS n_classes,
                              coalesce(list_sum(list_transform(d,
                                  g -> CAST(floor(1000.0
                                            * len(list_filter(ch, x -> x = g))
                                            * ln(CAST(len(list_filter(ch, x -> x = g)) AS DOUBLE)))
                                        AS BIGINT))), 0) AS s_q
                       FROM m)
            SELECT doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(n_classes AS BIGINT) AS n_classes,
                   CASE WHEN n_chars > 0
                        THEN CAST(floor(1000.0 * ln(CAST(n_chars AS DOUBLE))
                                        - CAST(s_q AS DOUBLE) / CAST(n_chars AS DOUBLE))
                                  AS BIGINT)
                        ELSE 0 END AS entropy_q
            FROM s
        """,
        "q113_classifier_score": r"""
            WITH g AS (SELECT doc_id,
                              list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                          t -> t <> '') AS tk
                       FROM documents),
                 gr AS (SELECT doc_id,
                               list_concat(tk,
                                   CASE WHEN len(tk) >= 2
                                        THEN list_transform(range(1, len(tk)),
                                                            i -> tk[i] || ' ' || tk[i + 1])
                                        ELSE [] END) AS gs
                        FROM g),
                 sc AS (SELECT doc_id,
                               CAST(len(gs) AS BIGINT) AS n_grams,
                               CAST(coalesce(list_sum(list_transform(gs,
                                   w -> ('0x' || substr(md5('w:' || CAST(
                                             ('0x' || substr(md5('f:' || w), 1, 8))::BIGINT % 4096
                                         AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000)), 0)
                                    AS BIGINT) AS score_q
                        FROM gr)
            SELECT doc_id, n_grams, score_q, score_q >= 0 AS keep FROM sc
        """,
        "q114_warc_roundtrip": r"""
            WITH p AS (SELECT doc_id,
                              'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS uri,
                              text
                       FROM documents),
                 r AS (SELECT doc_id,
                              'WARC/1.0' || chr(13) || chr(10)
                              || 'WARC-Type: response' || chr(13) || chr(10)
                              || 'WARC-Record-ID: <urn:uuid:' || CAST(doc_id AS VARCHAR) || '>'
                              || chr(13) || chr(10)
                              || 'WARC-Target-URI: ' || uri || chr(13) || chr(10)
                              || 'Content-Length: '
                              || CAST(octet_length(encode(text)) AS VARCHAR)
                              || chr(13) || chr(10) || chr(13) || chr(10)
                              || text || chr(13) || chr(10) || chr(13) || chr(10) AS rec
                       FROM p),
                 d AS (SELECT doc_id,
                              rec,
                              regexp_extract(rec, '(?s)\r\n\r\n(.*)\r\n\r\n$', 1) AS payload
                       FROM r)
            SELECT doc_id,
                   CAST(octet_length(encode(rec)) AS BIGINT) AS rec_len,
                   regexp_extract(rec, 'WARC-Target-URI: ([^\r\n]*)', 1) AS uri,
                   CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT)
                       AS content_length,
                   CAST(octet_length(encode(payload)) AS BIGINT) AS payload_octets,
                   octet_length(encode(payload))
                       = CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT) AS ok
            FROM d
        """,
        "q115_perplexity_buckets": r"""
            WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
                       FROM documents),
                 tf AS (SELECT doc_id, term, count(*) AS tf
                        FROM t WHERE term <> '' GROUP BY doc_id, term),
                 v AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
                 tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v),
                 d AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
                              sum(tf.tf * ln(CAST(v.cnt AS DOUBLE))) AS s
                       FROM tf JOIN v USING (term) GROUP BY tf.doc_id),
                 sc AS (SELECT doc_id,
                               CAST(floor((ln(tot.total) - d.s / d.n_tokens) * 1000) AS BIGINT)
                                   AS xent_q
                        FROM d CROSS JOIN tot)
            SELECT doc.doc_id, doc.lang, sc.xent_q,
                   CAST(ntile(3) OVER (PARTITION BY doc.lang
                                       ORDER BY sc.xent_q, doc.doc_id) AS INTEGER) AS bucket
            FROM documents doc JOIN sc USING (doc_id)
        """,
        "q116_bm25_topk": r"""
            WITH toks AS (SELECT doc_id,
                                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                             t -> t <> '') AS t
                          FROM documents),
                 lens AS (SELECT doc_id, len(t) AS dl FROM toks),
                 tot AS (SELECT CAST(count(*) AS DOUBLE) AS N,
                                avg(CAST(dl AS DOUBLE)) AS avgdl
                         FROM lens),
                 occ AS (SELECT doc_id, unnest(t) AS term FROM toks),
                 tf AS (SELECT doc_id, term, count(*) AS tf
                        FROM occ WHERE term IN ('join', 'window', 'shuffle')
                        GROUP BY doc_id, term),
                 dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
                 c AS (SELECT tf.doc_id,
                              CAST(floor(1000.0
                                   * ln(1.0 + (tot.N - CAST(dfreq.df AS DOUBLE) + 0.5)
                                              / (CAST(dfreq.df AS DOUBLE) + 0.5))
                                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                                   / (CAST(tf.tf AS DOUBLE)
                                      + 1.2 * (0.25 + 0.75 * CAST(lens.dl AS DOUBLE)
                                                      / tot.avgdl)))
                                   AS BIGINT) AS c_q
                       FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id), tot),
                 sc AS (SELECT doc_id,
                               CAST(count(*) AS BIGINT) AS n_terms_hit,
                               CAST(sum(c_q) AS BIGINT) AS score_q
                        FROM c GROUP BY doc_id)
            SELECT doc_id, n_terms_hit, score_q FROM sc
            ORDER BY score_q DESC, doc_id LIMIT 10
        """,
        "q117_corpus_report": r"""
            WITH m AS (SELECT source, lang, md5(text) AS fp,
                              len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                              t -> t <> '')) AS ntok,
                              octet_length(encode(text)) AS nbytes
                       FROM documents)
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup,
                   CAST(sum(ntok) AS BIGINT) AS total_tokens,
                   CAST(sum(nbytes) AS BIGINT) AS total_bytes,
                   CAST(sum(ntok) AS DOUBLE) / count(*) AS mean_tokens
            FROM m GROUP BY source, lang
        """,
        "q118_token_budget_mixture": r"""
            WITH n AS (SELECT doc_id, lang,
                              len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                              t -> t <> '')) AS ntok
                       FROM documents),
                 c AS (SELECT lang, CAST(sum(ntok) AS DOUBLE) AS toks FROM n GROUP BY lang),
                 r AS (SELECT lang,
                              CAST(floor(least(1000000.0,
                                   (CASE WHEN lang = 'fr' THEN 5000000000.0
                                         WHEN lang = 'en' THEN 10000000000.0
                                         ELSE 0.0 END) / toks)) AS BIGINT) AS thr
                       FROM c)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN r USING (lang)
            WHERE ('0x' || substr(md5('tb:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 1000000 < r.thr
        """,
        "q119_incremental_dedup": """
            WITH seen AS (SELECT md5(text) AS fp FROM documents WHERE doc_id < 250),
                 b AS (SELECT doc_id, text FROM documents WHERE doc_id >= 200
                       UNION ALL
                       SELECT doc_id + 10000, text FROM documents
                       WHERE doc_id BETWEEN 300 AND 309),
                 f AS (SELECT md5(b.text) AS fp, b.doc_id FROM b
                       WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp = md5(b.text)))
            SELECT fp, CAST(min(doc_id) AS BIGINT) AS doc_id FROM f GROUP BY fp
        """,
        "q120_corpus_diff": """
            WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents WHERE doc_id < 400),
                 n AS (SELECT doc_id,
                              md5(CASE WHEN doc_id BETWEEN 150 AND 159
                                       THEN upper(text) ELSE text END) AS new_fp
                       FROM documents WHERE doc_id >= 100)
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.old_fp IS NULL THEN 'added'
                        WHEN n.new_fp IS NULL THEN 'removed'
                        WHEN o.old_fp <> n.new_fp THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        """,
        "q121_leakage_free_split": """
            WITH corpus AS (SELECT doc_id, text FROM documents
                            UNION ALL
                            SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50),
                 b AS (SELECT doc_id,
                              ('0x' || substr(md5('sp:' || md5(text)), 1, 8))::BIGINT % 1000
                                  AS bucket
                       FROM corpus)
            SELECT doc_id,
                   CASE WHEN bucket < 50 THEN 'test'
                        WHEN bucket < 100 THEN 'val'
                        ELSE 'train' END AS split
            FROM b
        """,
        "q122_sentence_chunks": r"""
            WITH t AS (SELECT doc_id,
                              regexp_replace(text, '((\S+ ){7}\S+) ', '\1. ', 'g') AS tx
                       FROM documents),
                 lst AS (SELECT doc_id, string_split_regex(tx, '\. ') AS l FROM t),
                 s0 AS (SELECT doc_id,
                               unnest(list_transform(range(1, len(l) + 1),
                                      i -> struct_pack(idx := i - 1, sent := l[i]))) AS u
                        FROM lst),
                 s AS (SELECT doc_id, u.idx AS idx, u.sent AS sent,
                              len(list_filter(string_split_regex(lower(trim(u.sent)), '\s+'),
                                              x -> x <> '')) AS ntok
                       FROM s0),
                 c AS (SELECT doc_id, idx, sent, ntok,
                              coalesce(sum(ntok) OVER (PARTITION BY doc_id ORDER BY idx
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                       0) AS cum
                       FROM s WHERE ntok > 0),
                 g AS (SELECT doc_id, CAST(floor(cum / 64) AS BIGINT) AS chunk_id,
                              idx, sent, ntok
                       FROM c)
            SELECT doc_id, chunk_id,
                   CAST(count(*) AS BIGINT) AS n_sentences,
                   CAST(sum(ntok) AS BIGINT) AS n_tokens,
                   string_agg(sent, '. ' ORDER BY idx) AS chunk_text
            FROM g GROUP BY doc_id, chunk_id
        """,
        "q123_ngram_novelty": r"""
            WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                          FROM documents),
                 raw AS (SELECT DISTINCT doc_id,
                                unnest(CASE WHEN len(t) >= 2
                                            THEN list_transform(range(1, len(t)),
                                                                i -> t[i] || ' ' || t[i + 1])
                                            ELSE [] END) AS g
                         FROM toks),
                 p AS (SELECT doc_id, g FROM raw WHERE g <> ''),
                 dfq AS (SELECT g, count(*) AS df FROM p GROUP BY g),
                 per AS (SELECT p.doc_id,
                                CAST(count(*) AS BIGINT) AS n_grams_distinct,
                                CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                    AS n_novel
                         FROM p JOIN dfq USING (g) GROUP BY p.doc_id)
            SELECT d.doc_id,
                   coalesce(per.n_grams_distinct, 0) AS n_grams_distinct,
                   coalesce(per.n_novel, 0) AS n_novel,
                   CASE WHEN coalesce(per.n_grams_distinct, 0) > 0
                        THEN CAST(floor(1000000.0 * CAST(per.n_novel AS DOUBLE)
                                        / CAST(per.n_grams_distinct AS DOUBLE)) AS BIGINT)
                        ELSE 0 END AS novelty_q
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "q149_profile_approx": """
            -- q105-style contract oracle: exact stats recomputed; ndv_ok is
            -- TRUE iff Spark's HLL(rsd=2%) ndv landed within 3 sigma of exact.
            WITH p AS (
              SELECT 'l_orderkey' AS "column",
                     CAST(count(l_orderkey) AS BIGINT) AS n_nonnull,
                     CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
                     CAST(min(l_orderkey) AS VARCHAR) AS min_str,
                     CAST(max(l_orderkey) AS VARCHAR) AS max_str
              FROM lineitem
              UNION ALL
              SELECT 'l_quantity', CAST(count(l_quantity) AS BIGINT),
                     CAST(count(*) - count(l_quantity) AS BIGINT),
                     CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
                     CAST(count(*) - count(l_extendedprice) AS BIGINT),
                     CAST(min(l_extendedprice) AS VARCHAR), CAST(max(l_extendedprice) AS VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'l_returnflag', CAST(count(l_returnflag) AS BIGINT),
                     CAST(count(*) - count(l_returnflag) AS BIGINT),
                     CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'l_shipdate', CAST(count(l_shipdate) AS BIGINT),
                     CAST(count(*) - count(l_shipdate) AS BIGINT),
                     CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
              FROM lineitem)
            SELECT "column", n_nonnull, n_null, TRUE AS ndv_ok, min_str, max_str
            FROM p
        """,
        "q124_profile_columns": """
            SELECT 'l_orderkey' AS "column",
                   CAST(count(l_orderkey) AS BIGINT) AS n_nonnull,
                   CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
                   CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
                   CAST(min(l_orderkey) AS VARCHAR) AS min_str,
                   CAST(max(l_orderkey) AS VARCHAR) AS max_str
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity', CAST(count(l_quantity) AS BIGINT),
                   CAST(count(*) - count(l_quantity) AS BIGINT),
                   CAST(count(DISTINCT l_quantity) AS BIGINT),
                   CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
                   CAST(count(*) - count(l_extendedprice) AS BIGINT),
                   CAST(count(DISTINCT l_extendedprice) AS BIGINT),
                   CAST(min(l_extendedprice) AS VARCHAR), CAST(max(l_extendedprice) AS VARCHAR)
            FROM lineitem
            UNION ALL
            SELECT 'l_returnflag', CAST(count(l_returnflag) AS BIGINT),
                   CAST(count(*) - count(l_returnflag) AS BIGINT),
                   CAST(count(DISTINCT l_returnflag) AS BIGINT),
                   CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
            FROM lineitem
            UNION ALL
            SELECT 'l_shipdate', CAST(count(l_shipdate) AS BIGINT),
                   CAST(count(*) - count(l_shipdate) AS BIGINT),
                   CAST(count(DISTINCT l_shipdate) AS BIGINT),
                   CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
            FROM lineitem
        """,
        "q125_normalize_text": r"""
            WITH dmg AS (SELECT doc_id,
                                chr(1) || '  ' || chr(9) || ' '
                                || regexp_replace(text, ' (\S+ \S+ \S+) ',
                                                  ' \1 ' || chr(9) || chr(10) || chr(10)
                                                  || chr(10) || ' ', 'g')
                                || ' ' || chr(2) || chr(9) AS t
                         FROM documents),
                 cl AS (SELECT doc_id, t,
                               trim(
                                 regexp_replace(
                                   regexp_replace(
                                     regexp_replace(
                                       regexp_replace(t,
                                           '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                                       '[ \t]+', ' ', 'g'),
                                     ' ?\n ?', chr(10), 'g'),
                                   '\n{3,}', chr(10) || chr(10), 'g')) AS clean
                        FROM dmg)
            SELECT doc_id,
                   CAST(octet_length(encode(t)) AS BIGINT) AS dirty_bytes,
                   CAST(octet_length(encode(clean)) AS BIGINT) AS clean_bytes,
                   md5(clean) AS clean_fp
            FROM cl
        """,
        "q126_matryoshka": """
            WITH m AS (SELECT vec_id, embedding[1:16] AS v FROM embeddings),
                 s AS (SELECT vec_id, v,
                              list_reduce(list_transform(v, y -> CAST(y AS DOUBLE) * y),
                                          (a, b) -> a + b) AS ss
                       FROM m)
            SELECT vec_id,
                   CAST(len(v) AS BIGINT) AS n_dims,
                   CASE WHEN ss > 0
                        THEN array_to_string(list_transform(v,
                                 x -> CAST(CAST(floor(10000.0 * CAST(x AS DOUBLE) / sqrt(ss))
                                           AS BIGINT) AS VARCHAR)), ',')
                        ELSE '' END AS sig
            FROM s
        """,
        "q127_fuzzy_editdist": """
            WITH corpus AS (SELECT doc_id, text FROM documents
                            UNION ALL
                            SELECT doc_id + 20000, text || ' zq' FROM documents
                            WHERE doc_id < 40),
                 base AS (SELECT doc_id,
                                 substr(lower(trim(text)), 1, 24) AS b,
                                 substr(lower(trim(text)), 1, 256) AS p
                          FROM corpus),
                 capped AS (SELECT * FROM (
                                SELECT doc_id, b, p,
                                       row_number() OVER (PARTITION BY b ORDER BY doc_id)
                                           AS rn
                                FROM base)
                            WHERE rn <= 50)
            SELECT a.doc_id AS id_a, c.doc_id AS id_b,
                   CAST(levenshtein(a.p, c.p) AS BIGINT) AS dist
            FROM capped a JOIN capped c USING (b)
            WHERE a.doc_id < c.doc_id AND levenshtein(a.p, c.p) <= 8
        """,
        "q128_length_outliers": r"""
            WITH corpus AS (SELECT doc_id, lang, text FROM documents
                            UNION ALL
                            SELECT doc_id + 30000, lang,
                                   array_to_string(list_transform(range(30), i -> text), ' ')
                            FROM documents WHERE doc_id < 5),
                 n AS (SELECT doc_id, lang,
                              CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                                   t -> t <> '')) AS BIGINT) AS ntok
                       FROM corpus),
                 m AS (SELECT lang, CAST(median(ntok) AS DOUBLE) AS med FROM n GROUP BY lang),
                 d AS (SELECT n.doc_id, n.lang, n.ntok, m.med,
                              abs(n.ntok - m.med) AS absdev
                       FROM n JOIN m USING (lang)),
                 md AS (SELECT lang, CAST(median(absdev) AS DOUBLE) AS mad
                        FROM d GROUP BY lang)
            SELECT d.doc_id, d.lang, d.ntok AS n_tokens, d.med, md.mad,
                   d.absdev > 3.0 * md.mad AS is_outlier
            FROM d JOIN md USING (lang)
        """,
        "q129_curation_v2": r"""
            WITH corpus AS (SELECT doc_id, text FROM documents
                            UNION ALL
                            SELECT doc_id + 40000, regexp_replace(text, ' ', '  ', 'g')
                            FROM documents WHERE doc_id < 30),
                 clean AS (SELECT doc_id,
                                  trim(regexp_replace(regexp_replace(regexp_replace(
                                      regexp_replace(text,
                                          '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                                      '[ \t]+', ' ', 'g'),
                                      ' ?\n ?', chr(10), 'g'),
                                      '\n{3,}', chr(10) || chr(10), 'g')) AS text
                           FROM corpus),
                 tk AS (SELECT doc_id, text,
                               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                           t -> t <> '') AS tkl
                        FROM clean),
                 gr AS (SELECT doc_id, text,
                               list_concat(tkl,
                                   CASE WHEN len(tkl) >= 2
                                        THEN list_transform(range(1, len(tkl)),
                                                            i -> tkl[i] || ' ' || tkl[i + 1])
                                        ELSE [] END) AS gs
                        FROM tk),
                 sc AS (SELECT doc_id, text,
                               coalesce(list_sum(list_transform(gs,
                                   w -> ('0x' || substr(md5('w:' || CAST(
                                             ('0x' || substr(md5('f:' || w), 1, 8))::BIGINT % 4096
                                         AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000)), 0) AS score
                        FROM gr),
                 kept AS (SELECT doc_id, text FROM sc WHERE score >= 0),
                 uniq AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
                 surv AS (SELECT kept.doc_id, kept.text FROM kept JOIN uniq USING (doc_id)),
                 t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                       FROM surv),
                 s AS (SELECT doc_id, toks,
                              unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS st
                       FROM t),
                 ch AS (SELECT doc_id,
                               CAST((st - 1) // 24 AS BIGINT) AS chunk_idx,
                               CAST(len(list_slice(toks, st, st + 31)) AS BIGINT)
                                   AS n_tokens_chunk,
                               array_to_string(list_slice(toks, st, st + 31), ' ') AS chunk_text
                        FROM s)
            SELECT doc_id, chunk_idx, n_tokens_chunk,
                   CASE WHEN ('0x' || substr(md5('cv2:' || md5(chunk_text)), 1, 8))::BIGINT
                                 % 1000 < 50 THEN 'test'
                        WHEN ('0x' || substr(md5('cv2:' || md5(chunk_text)), 1, 8))::BIGINT
                                 % 1000 < 100 THEN 'val'
                        ELSE 'train' END AS split
            FROM ch
        """,
        "q130_shuffle_shards": r"""
            WITH h AS (SELECT *, md5('shuffle:42:' || CAST(doc_id AS VARCHAR)) AS hk
                       FROM documents),
                 s AS (SELECT *, CAST(('0x' || substr(hk, 1, 8))::BIGINT % 64 AS INT) AS shard
                       FROM h)
            SELECT doc_id, shard,
                   CAST(row_number() OVER (PARTITION BY shard ORDER BY hk, doc_id) AS BIGINT)
                       AS pos
            FROM s
        """,
        "q131_strip_boilerplate": r"""
            WITH docs AS (SELECT doc_id,
                                 CASE WHEN doc_id % 3 = 0
                                      THEN text || ' spark BOILER cookie notice accept all'
                                      ELSE text END AS text
                          FROM documents),
                 parts AS (SELECT doc_id,
                                  unnest(string_split(text, ' spark ')) AS para,
                                  unnest(range(0, len(string_split(text, ' spark ')))) AS pos
                           FROM docs),
                 df AS (SELECT md5(para) AS pfp, count(DISTINCT doc_id) AS pdf
                        FROM parts GROUP BY 1),
                 fl AS (SELECT p.doc_id, p.pos, p.para, (d.pdf < 5) AS keep
                        FROM parts p JOIN df d ON md5(p.para) = d.pfp)
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN keep THEN para END, ' spark ' ORDER BY pos),
                            '') AS clean_text,
                   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
            FROM fl GROUP BY doc_id
        """,
        "q132_event_sequences": r"""
            WITH r AS (SELECT user_id, ts, event_id,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id NULLS LAST) AS rn
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
                 s AS (SELECT user_id, CAST(floor((rn - 1) / 16) AS BIGINT) AS seq_idx,
                              ts, event_id, rn
                       FROM r)
            SELECT user_id, seq_idx,
                   CAST(count(*) AS BIGINT) AS n_events,
                   string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rn) AS val_seq,
                   epoch_ms(min(ts)) AS t_start_ms,
                   epoch_ms(max(ts)) AS t_end_ms
            FROM s GROUP BY user_id, seq_idx
        """,
        "q133_semantic_decontam": r"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
                 bench AS (SELECT vec_id + 50000 AS b_id, v FROM e WHERE vec_id % 7 = 0),
                 hits AS (SELECT t.vec_id, b.b_id,
                                 list_cosine_similarity(t.v, b.v) AS sim
                          FROM e t JOIN bench b ON list_cosine_similarity(t.v, b.v) >= 0.95),
                 rk AS (SELECT vec_id, b_id,
                               row_number() OVER (PARTITION BY vec_id
                                                  ORDER BY sim DESC, b_id) AS r
                        FROM hits)
            SELECT vec_id,
                   CAST(count(DISTINCT b_id) AS BIGINT) AS n_bench_hits,
                   min(CASE WHEN r = 1 THEN b_id END) AS best_bench_id
            FROM rk GROUP BY vec_id
        """,
        "q104_protobuf_wire": """
            WITH m AS (SELECT doc_id, lang, text, n_chars,
                              octet_length(encode(lang)) AS ll,
                              octet_length(encode(text)) AS lx
                       FROM documents)
            SELECT doc_id, lang, text, n_chars,
                   (1 + CASE WHEN doc_id < 128 THEN 1 WHEN doc_id < 16384 THEN 2
                             WHEN doc_id < 2097152 THEN 3 WHEN doc_id < 268435456 THEN 4
                             ELSE 5 END          -- tag + varint(doc_id)
                    + 1 + CASE WHEN ll < 128 THEN 1 WHEN ll < 16384 THEN 2 ELSE 3 END + ll
                    + 1 + CASE WHEN lx < 128 THEN 1 WHEN lx < 16384 THEN 2 ELSE 3 END + lx
                    + 1 + CASE WHEN n_chars < 128 THEN 1 WHEN n_chars < 16384 THEN 2
                              WHEN n_chars < 2097152 THEN 3 ELSE 4 END) AS wire_len
            FROM m
        """,
        "q101_sample_quota": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang ORDER BY
                           ('0x' || substr(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                               % 1000000,
                           doc_id) AS rn
                FROM documents
            ) WHERE rn <= 30
        """,
        "q95_resize_thumbs": """
            WITH p AS (SELECT doc_id, hex(encode(text)) AS h,
                              octet_length(encode(text)) AS n FROM documents),
                 b AS (SELECT doc_id, n, h, unnest(range(0, n)) AS i FROM p),
                 v AS (SELECT doc_id,
                              CASE WHEN n >= 8 THEN ((i + 1) * 8 + n - 1) // n - 1
                                   ELSE i END AS j,
                              CAST('0x' || substring(h, CAST(i * 2 + 1 AS INT), 2) AS INT) AS byte
                       FROM b),
                 agg AS (SELECT doc_id, j, sum(byte) // count(*) AS tb
                         FROM v GROUP BY doc_id, j),
                 grid AS (SELECT doc_id, n, unnest(range(0, 8)) AS j FROM p)
            SELECT g.doc_id,
                   string_agg(printf('%02X', CAST(coalesce(a.tb, 0) AS INT)), ''
                              ORDER BY g.j) AS thumb_hex,
                   CAST(max(g.n) AS BIGINT) AS orig_bytes
            FROM grid g LEFT JOIN agg a ON g.doc_id = a.doc_id AND g.j = a.j
            GROUP BY g.doc_id
        """,
        "q85_cogroup": """
            WITH e AS (
                SELECT user_id, count(*) AS ev_cnt,
                       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ev_sum
                FROM events WHERE user_id IS NOT NULL GROUP BY user_id
            ),
            o AS (
                SELECT o_custkey AS user_id, count(*) AS ord_cnt,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ord_total
                FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
            )
            SELECT coalesce(e.user_id, o.user_id) AS user_id,
                   coalesce(e.ev_cnt, 0) AS ev_cnt, e.ev_sum,
                   coalesce(o.ord_cnt, 0) AS ord_cnt, o.ord_total
            FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
        """,
        "q84_quantize_embeddings": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
            s AS (SELECT vec_id, v, CASE WHEN ma > 0 THEN 127.0 / ma ELSE 0.0 END AS sc FROM m)
            SELECT vec_id, sc AS q_scale,
                   array_to_string(list_transform(v,
                       x -> CAST(greatest(-127, least(127, floor(x * sc))) AS INT)), ',') AS codes_csv
            FROM s
        """,
        "q78_quality_filter": r"""
            WITH t AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS toks
                       FROM documents),
            s AS (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_words,
                       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE) AS mean_word_len,
                       CAST(len(regexp_extract_all(text, '[#@*^]')) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
                       CAST(len(list_filter(toks, t -> list_contains(
                           ['the','be','to','of','and','that','have','with'], t))) AS BIGINT) AS stop_hits
                FROM t
            )
            SELECT doc_id, n_words, mean_word_len, symbol_ratio, stop_hits,
                   (n_words BETWEEN 20 AND 80)
                   AND (mean_word_len BETWEEN 3.0 AND 8.0)
                   AND (symbol_ratio <= 0.1)
                   AND (stop_hits >= 1) AS keep
            FROM s
        """,
        "q79_sample_stratified": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
                  < CASE lang WHEN 'en' THEN 500000 WHEN 'fr' THEN 250000
                              WHEN 'zh' THEN 100000 ELSE 0 END
        """,
        "q80_chunk_text": r"""
            WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                       FROM documents),
            s AS (SELECT doc_id, toks,
                         unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS st
                  FROM t)
            SELECT doc_id,
                   CAST((st - 1) // 24 AS BIGINT) AS chunk_idx,
                   CAST(len(list_slice(toks, st, st + 31)) AS BIGINT) AS n_tokens_chunk,
                   array_to_string(list_slice(toks, st, st + 31), ' ') AS chunk_text
            FROM s
        """,
        "q71_ann_ivf": _ann_ivf_oracle_sql(),
        "q74_minhash_high_threshold": r"""
            WITH d AS (
                SELECT doc_id,
                       list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                                    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS g
                FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                      FROM documents)
                WHERE len(toks) >= 3
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM d a JOIN d b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(a.g || b.g)) >= 0.9
        """,
        "q73_percentiles": """
            SELECT event_type AS etype,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        """,
        "q75_window_store_fetch": """
            SELECT user_id, w_start_ms, w_start_ms + 3600000 AS w_end_ms, cnt FROM (
                SELECT user_id, (epoch_ms(ts) // 3600000) * 3600000 AS w_start_ms, count(*) AS cnt
                FROM events WHERE user_id = 7 GROUP BY 1, 2
            ) WHERE w_start_ms BETWEEN 1704412800000 AND 1705276800000
        """,
        "q76_kafka_wire_full": """
            SELECT 'events-' || event_type AS topic, event_type AS etype_hdr,
                   count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
                   max(event_id) AS max_off,
                   max(epoch_us(ts)) AS max_ts_us
            FROM events GROUP BY event_type
        """,
        "q72_composed_pipeline": """
            WITH merged AS (
                SELECT user_id, ts, value FROM events
                WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL
            ),
            win AS (
                SELECT user_id,
                       (epoch_ms(ts) // 3600000) * 3600000 AS w_start_ms,
                       count(*) AS n,
                       sum(CAST(value AS DECIMAL(18,2))) AS total
                FROM merged GROUP BY 1, 2
            ),
            joined AS (
                SELECT w.user_id, w.w_start_ms, w.n, w.total, c.c_mktsegment
                FROM win w JOIN customer c ON w.user_id = c.c_custkey
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                             ORDER BY total DESC, w_start_ms, user_id) AS rk
                FROM joined
            )
            SELECT c_mktsegment, user_id, w_start_ms, n, CAST(total AS DOUBLE) AS total
            FROM ranked WHERE rk <= 2
        """,
        "q52_multimodal_meta": """
            SELECT doc_id, 'text/plain' AS media_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha
            FROM documents
        """,
        # animated-GIF compositor algebra: frame f covers the alternating
        # half-screen rect, so canvas(f) = frame(f) + frame(f-1) [the other
        # half; background for f=0] + background * the odd-height strip
        # neither half ever draws.  Palette size reports the power-of-two
        # padded GCT (GIF stores 2^bits entries).
        "q179_gif_animation": """
            WITH p AS (
                SELECT doc_id,
                       8 + (doc_id % 5) * 2 AS w,
                       6 + doc_id % 5 AS h,
                       2 + doc_id % 3 AS n,
                       1 + doc_id % 5 AS a,
                       doc_id % 251 AS b,
                       4 + doc_id % 13 AS pp
                FROM documents
            ),
            fr AS (
                SELECT doc_id, w, h, n, a, b, pp, h // 2 AS fh,
                       unnest(generate_series(0, n - 1)) AS f
                FROM p
            ),
            px AS (
                SELECT doc_id, a, b, pp, f, fh, w,
                       unnest(generate_series(0, w * fh - 1)) AS i
                FROM fr
            ),
            fs AS (
                SELECT doc_id, f,
                       sum((a * ((a * i + b + f) % pp) + b) % 256) AS fr_,
                       sum((a * ((a * i + b + f) % pp) + b + 85) % 256) AS fg_,
                       sum((a * ((a * i + b + f) % pp) + b + 170) % 256) AS fb_
                FROM px GROUP BY doc_id, f
            ),
            cv AS (
                SELECT fr.doc_id, fr.f, fr.n, fr.w, fr.h, fr.fh, fr.b, fr.pp,
                       fs.fr_, fs.fg_, fs.fb_,
                       COALESCE(lag(fs.fr_) OVER win, (fr.b % 256) * fr.fh * fr.w) AS pr_,
                       COALESCE(lag(fs.fg_) OVER win, ((fr.b + 85) % 256) * fr.fh * fr.w) AS pg_,
                       COALESCE(lag(fs.fb_) OVER win, ((fr.b + 170) % 256) * fr.fh * fr.w) AS pb_
                FROM fr JOIN fs ON fr.doc_id = fs.doc_id AND fr.f = fs.f
                WINDOW win AS (PARTITION BY fr.doc_id ORDER BY fr.f)
            )
            SELECT doc_id,
                   CAST(f AS INT) AS frame_idx,
                   CAST(n AS INT) AS n_frames,
                   CAST(0 AS INT) AS "left",
                   CAST((f % 2) * fh AS INT) AS top,
                   CAST(w AS INT) AS width,
                   CAST(fh AS INT) AS height,
                   CAST(CASE WHEN pp <= 4 THEN 4 WHEN pp <= 8 THEN 8
                             ELSE 16 END AS INT) AS palette_size,
                   CAST(1 AS INT) AS disposal,
                   CAST(f + 1 AS INT) AS delay_cs,
                   CAST(-1 AS INT) AS transparent,
                   CAST(fr_ AS BIGINT) AS frame_r,
                   CAST(fg_ AS BIGINT) AS frame_g,
                   CAST(fb_ AS BIGINT) AS frame_b,
                   CAST(fr_ + pr_ + (b % 256) * (h - 2 * fh) * w AS BIGINT) AS canvas_r,
                   CAST(fg_ + pg_ + ((b + 85) % 256) * (h - 2 * fh) * w AS BIGINT) AS canvas_g,
                   CAST(fb_ + pb_ + ((b + 170) % 256) * (h - 2 * fh) * w AS BIGINT) AS canvas_b
            FROM cv
        """,
        "q180_cube": """
            SELECT event_type,
                   epoch_ms(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS day_ms,
                   count(*) AS cnt,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events
            GROUP BY CUBE(event_type, day_ms)
        """,
        "q181_versioned_retain": """
            WITH p0 AS (
                SELECT user_id, ts, value AS p_val, event_id AS p_id
                FROM events
                WHERE event_type = 'purchase' AND user_id IS NOT NULL
            ),
            p1 AS (  -- one version per (user, ts): highest event id wins
                SELECT user_id, ts, p_val FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id, ts ORDER BY p_id DESC) AS rn
                    FROM p0) WHERE rn = 1
            ),
            p2 AS (
                SELECT *, max(ts) OVER (PARTITION BY user_id) AS u_now FROM p1
            ),
            kept AS (
                SELECT * FROM p2 WHERE ts >= u_now - INTERVAL 7 DAY
            ),
            snap AS (
                SELECT user_id, p_val, ts FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id ORDER BY ts DESC) AS rn
                    FROM kept) WHERE rn = 1
            ),
            cnt AS (
                SELECT user_id, count(*) AS n_versions FROM kept GROUP BY user_id
            )
            SELECT s.user_id, s.p_val AS latest_val,
                   epoch_us(s.ts) AS latest_ts_us, c.n_versions
            FROM snap s JOIN cnt c USING (user_id)
        """,
    }
