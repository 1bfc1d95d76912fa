"""KafkaStream lifecycle analog tests (core/KafkaStream.cs state machine +
listener + Store contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_engine.app import State, StreamApp
from pyspark_engine.streaming import StreamingBuilder

SF = "/root/testdata/sf0.001"


def _starter(spark, name):
    def go():
        ks = StreamingBuilder(spark).file_stream(f"{SF}/events.parquet", key="user_id")
        return (
            ks.df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    return go


def test_full_lifecycle_and_listener(spark):
    """CREATED → REBALANCING → RUNNING → PENDING_SHUTDOWN → NOT_RUNNING with
    the StateChanged listener observing every hop (KafkaStream.cs:375-459)."""
    seen = []
    app = StreamApp(spark, [_starter(spark, "app_t1")])
    app.on_state_change(lambda old, new: seen.append((old.name, new.name)))
    assert app.state == State.CREATED
    app.start()
    assert app.state == State.RUNNING
    assert app.state.is_running()
    app.close()
    assert app.state == State.NOT_RUNNING
    assert seen == [
        ("CREATED", "REBALANCING"),
        ("REBALANCING", "RUNNING"),
        ("RUNNING", "PENDING_SHUTDOWN"),
        ("PENDING_SHUTDOWN", "NOT_RUNNING"),
    ]


def test_close_is_idempotent_and_start_after_close_rejected(spark):
    app = StreamApp(spark, [])
    app.start()
    app.close()
    app.close()  # second close: PENDING_SHUTDOWN not reachable from NOT_RUNNING -> no-op
    assert app.state == State.NOT_RUNNING
    with pytest.raises(RuntimeError):
        app.start()  # NOT_RUNNING has no valid transitions (KafkaStream.cs:134)


def test_close_before_start_from_created(spark):
    """The reference allows closing a created-but-never-started instance
    (CREATED lists ordinal 3 in its transition set, KafkaStream.cs:118)."""
    app = StreamApp(spark, [_starter(spark, "app_t2")])
    app.close()
    assert app.state == State.NOT_RUNNING
    assert app.queries == []


def test_failing_starter_flips_to_error(spark):
    def boom():
        raise ValueError("no broker")

    app = StreamApp(spark, [boom])
    with pytest.raises(ValueError):
        app.start()
    assert app.state == State.ERROR
    app.close()  # ERROR -> PENDING_SHUTDOWN is the one legal exit (cs:138)
    assert app.state == State.NOT_RUNNING


def test_store_access_gated_on_running(spark):
    """Store() only while running (KafkaStream.cs:474-479)."""
    app = StreamApp(spark, [_starter(spark, "app_t3")])
    with pytest.raises(RuntimeError):
        app.store("anything")
    with app:
        spark.range(3).withColumn("v", F.col("id") * 2).createOrReplaceTempView("app_store_x")
        assert app.store("app_store_x").count() == 3
    assert app.state == State.NOT_RUNNING


def test_memory_sink_rows_visible_after_run(spark):
    with StreamApp(spark, [_starter(spark, "app_t4")]) as app:
        app.queries[0].awaitTermination(60)
        assert spark.table("app_t4").count() > 0
