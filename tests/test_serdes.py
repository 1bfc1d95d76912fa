"""Serde + config surface tests: wire-format roundtrips, the
DeserializationExceptionHandler analog, and StreamConfig mapping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_engine import serdes
from pyspark_engine.runtime import StreamConfig


def test_json_roundtrip(spark):
    df = spark.createDataFrame([(1, "a", 2.5)], "k long, s string, v double")
    wire = serdes.encode_kafka(df, "k", ["s", "v"])
    assert dict(wire.dtypes) == {"key": "binary", "value": "binary"}
    wire = wire.withColumn("timestamp", F.timestamp_micros(F.lit(0)))
    back = serdes.decode_kafka(wire, "s string, v double", key_type="bigint")
    [row] = back.collect()
    assert (row.key, row.s, row.v) == (1, "a", 2.5)


def test_decode_json_continue_yields_nulls(spark):
    """CONTINUE handler analog: poison records decode to null fields instead
    of killing the task (DeserializationExceptionHandler.cs CONTINUE)."""
    df = spark.createDataFrame([("not json{",), ('{"a": 7}',)], "raw string")
    out = df.select(serdes.decode_json(F.col("raw"), "a int").alias("v")).select("v.a")
    got = sorted((r.a is None, r.a) for r in out.collect())
    assert got == [(False, 7), (True, None)]


def test_decode_json_fail_raises(spark):
    df = spark.createDataFrame([("not json{",)], "raw string")
    out = df.select(serdes.decode_json(F.col("raw"), "a int", on_error="fail").alias("v"))
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        out.collect()


def test_decode_kafka_headers_passthrough(spark):
    df = spark.createDataFrame(
        [(b"1", b'{"a": 5}', None, [("h1", b"x")])],
        "key binary, value binary, timestamp timestamp, headers array<struct<key:string,value:binary>>",
    )
    back = serdes.decode_kafka(df, "a int", key_type="bigint", include_headers=True)
    [row] = back.collect()
    assert row.a == 5 and row.headers[0].key == "h1"


def test_dynamic_topic_column(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    wire = serdes.encode_kafka(df, "k", ["s"], topic=F.concat(F.lit("out-"), F.col("s")))
    topics = sorted(r.topic for r in wire.collect())
    assert topics == ["out-x", "out-y"]


def test_stream_config_mapping(tmp_path):
    cfg = StreamConfig(
        "my-app",
        bootstrap="broker:9092",
        guarantee="exactly_once",
        commit_interval_ms=500,
        state_dir=str(tmp_path),
        max_records_per_batch=1000,
    )
    assert cfg.checkpoint("q1") == f"{tmp_path}/my-app/q1"
    assert cfg.source_options() == {"maxOffsetsPerTrigger": "1000"}
    assert cfg.writer_options("q1")["checkpointLocation"].endswith("my-app/q1")
    assert cfg.trigger_kwargs() == {"processingTime": "500 milliseconds"}
    with pytest.raises(ValueError):
        StreamConfig("x", guarantee="exactly_twice")


def test_encode_headers_and_decode_meta_roundtrip(spark):
    """Full wire-schema shape: producer headers column + broker metadata
    (topic/partition/offset) surfaced by decode (IRecordContext analog)."""
    df = spark.createDataFrame([(7, "click", 1.5)], "k long, et string, v double")
    wire = serdes.encode_kafka(
        df,
        "k",
        ["v"],
        topic=F.concat(F.lit("t-"), F.col("et")),
        headers=F.array(F.struct(F.lit("etype").alias("key"), F.encode("et", "UTF-8").alias("value"))),
        extra=(
            F.lit(None).cast("timestamp").alias("timestamp"),
            F.lit(3).alias("partition"),
            F.lit(42).alias("offset"),
        ),
    )
    back = serdes.decode_kafka(wire, "v double", key_type="bigint", include_headers=True, include_meta=True)
    [row] = back.collect()
    assert row.key == 7 and row.v == 1.5
    assert row.topic == "t-click" and row.partition == 3 and row.offset == 42
    assert bytes(row.headers[0].value) == b"click"


def test_decode_kafka_rejects_colliding_value_fields(spark):
    df = spark.createDataFrame([(b"1", b'{"key": 2}', None)], "key binary, value binary, timestamp timestamp")
    with pytest.raises(ValueError, match="collide"):
        serdes.decode_kafka(df, "key bigint", key_type="bigint")
    with pytest.raises(ValueError, match="collide"):
        serdes.decode_kafka(df, "ts string", key_type="bigint")


def test_protobuf_serde_gated(spark):
    """Protobuf serdes mirror the Avro gating (reference ships protobuf in a
    satellite package): the plan builds, and execution raises cleanly when
    the spark-protobuf package is absent from the classpath."""
    df = spark.createDataFrame([(b"\x08\x01",)], "value binary")
    try:
        expr = serdes.decode_protobuf(F.col("value"), "TestMsg", binary_descriptor=b"\x00")
        df.select(expr.alias("m")).collect()
    except NotImplementedError:
        return  # python-side gate (module missing entirely)
    except Exception:
        return  # JVM-side gate: protobuf jar absent (or descriptor invalid) — raised at use
    raise AssertionError("expected protobuf decode to be gated without the package")


def test_encode_max_bytes_continue_drops_oversized(spark):
    """ProductionExceptionHandler CONTINUE analog (RecordCollector.cs:142-152):
    oversized records are skipped, processing continues."""
    df = spark.createDataFrame([(1, "x" * 10), (2, "y")], "k long, s string")
    wire = serdes.encode_kafka(df, "k", ["s"], max_bytes=16, on_error="continue")
    rows = wire.collect()
    assert len(rows) == 1 and bytes(rows[0].key) == b"2"


def test_encode_max_bytes_fail_raises(spark):
    """FAIL response (the reference default, StreamConfig.cs:1908)."""
    df = spark.createDataFrame([(1, "x" * 100)], "k long, s string")
    wire = serdes.encode_kafka(df, "k", ["s"], max_bytes=16, on_error="fail")
    with pytest.raises(Exception, match="max_bytes"):
        wire.collect()


def test_decode_poison_key_continue_vs_fail(spark):
    """DeserializationExceptionHandler on the key: CONTINUE nulls the poison
    key (downstream null-key semantics skip the record); FAIL errors."""
    df = spark.createDataFrame(
        [(b"not-a-number", b'{"a": 1}', None), (b"7", b'{"a": 2}', None)],
        "key binary, value binary, timestamp timestamp",
    )
    ok = serdes.decode_kafka(df, "a int", key_type="bigint", on_error="continue")
    got = {r.a: r.key for r in ok.collect()}
    assert got == {1: None, 2: 7}
    with pytest.raises(Exception):
        serdes.decode_kafka(df, "a int", key_type="bigint", on_error="fail").collect()
