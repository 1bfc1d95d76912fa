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


def _poison_starter(spark, src_dir, out_dir, ckpt, poison_path):
    """availableNow drain whose foreachBatch raises while the poison marker
    exists — a TRANSIENT processing failure (the restart consumes the
    marker, so the checkpoint-resumed replay of the same batch succeeds).
    The source must be a STABLE directory: a restart re-creates the reader,
    and the checkpoint pins the source path."""
    import os

    def go():
        ks = StreamingBuilder(spark).file_stream(src_dir, key="r_regionkey")

        def apply(batch, batch_id):
            if os.path.exists(poison_path):
                os.remove(poison_path)
                raise RuntimeError("poison microbatch (transient)")
            batch.write.mode("append").parquet(out_dir)

        return (
            ks.df.writeStream.foreachBatch(apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    return go


def test_inner_exception_handler_continue_restarts(spark, tmp_path):
    """InnerExceptionHandler analog (core/StreamConfig.cs:130,2140; default
    FAIL at :1907): CONTINUE on a poisoned microbatch supervises a restart
    from the same checkpoint — RUNNING -> REBALANCING -> RUNNING — and the
    replayed batch lands exactly once; the handler saw the real exception."""
    import os

    poison = str(tmp_path / "POISON")
    open(poison, "w").write("x")
    seen = []

    def handler(exc):
        seen.append(str(exc))
        return "CONTINUE"

    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF}/region.parquet", src)
    transitions = []
    app = StreamApp(
        spark,
        [_poison_starter(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"), poison)],
        inner_exception_handler=handler,
    )
    app.on_state_change(lambda old, new: transitions.append((old.name, new.name)))
    with app:
        app.supervise(poll_s=0.1, max_wait_s=120)
        assert app.state == State.RUNNING
    assert seen and "poison" in seen[0]
    assert ("RUNNING", "REBALANCING") in transitions  # the supervised restart
    assert not os.path.exists(poison)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == spark.read.parquet(f"{SF}/region.parquet").count()


def test_inner_exception_handler_fail_is_error(spark, tmp_path):
    """Default policy (no handler == FAIL, StreamConfig.cs:1907): the
    query's exception propagates out of supervise() and the app lands in
    ERROR — close() remains the one legal exit."""
    import os
    import shutil

    poison = str(tmp_path / "POISON")
    open(poison, "w").write("x")
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF}/region.parquet", src)
    app = StreamApp(
        spark,
        [_poison_starter(spark, src, str(tmp_path / "out"), str(tmp_path / "ck"), poison)],
    )
    app.start()
    with pytest.raises(Exception, match="poison|STREAM"):
        app.supervise(poll_s=0.1, max_wait_s=120)
    assert app.state == State.ERROR
    app.close()
    assert app.state == State.NOT_RUNNING


def test_inner_exception_handler_restart_budget(spark, tmp_path):
    """A permanently poisoned batch must not hot-loop: CONTINUE with an
    exhausted max_restarts budget still lands in ERROR."""

    import os
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{SF}/region.parquet", src)

    def bad_starter():
        ks = StreamingBuilder(spark).file_stream(src, key="r_regionkey")

        def apply(batch, batch_id):
            raise RuntimeError("permanent poison")

        return (
            ks.df.writeStream.foreachBatch(apply)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )

    app = StreamApp(
        spark, [bad_starter], inner_exception_handler=lambda e: "CONTINUE", max_restarts=1
    )
    app.start()
    with pytest.raises(Exception, match="poison|STREAM"):
        app.supervise(poll_s=0.1, max_wait_s=180)
    assert app.state == State.ERROR
    app.close()
