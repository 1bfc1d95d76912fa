"""transformWithState engine family + the vendored minimal protobuf runtime.

The live engine behavior (parity with keyed/exact, crash-replay, resume,
type matrix) is covered by the engine-parametrized suites in
test_streaming.py; this file pins what is UNIQUE to the tws path:

* the clean-room ``vendor/google/protobuf`` runtime's wire format, against
  hand-computed byte vectors (the live peer is the JVM protobuf runtime,
  so any divergence the vectors miss would also fail the live suites);
* engine guards: tws state dirs refuse the pandas/exact engines and vice
  versa;
* the container-column refusal (PySpark's value-state client scrambles
  nested containers — upstream, observed on 4.1.2);
* NaN semantics: tws and exact PRESERVE float NaN where the pandas keyed
  engines coerce it to null (documented at _clean_state_value; this is the
  r11-advice pin).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import pytest

# the shim; a real protobuf wheel wins if present (checkout-relative, not
# hardcoded — a wrong path would silently importorskip the wire vectors)
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")
)


@pytest.fixture(scope="module")
def sm():
    pytest.importorskip("google.protobuf")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as stateMessage

    return stateMessage


# ------------------------------------------------------- shim wire vectors


def test_shim_serializes_handle_state_vector(sm):
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    # field2(LEN){ field1(LEN){ field1(VARINT)=2 } } — hand-computed
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_shim_nested_assignment_marks_presence(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "myState"
    cmd.schema = "s"
    cmd.ttl.durationMs = 5000
    data = cmd.SerializeToString()
    # 5000 = varint 0x88 0x27 inside ttl (field 4)
    assert data == bytes.fromhex("0a076d795374617465120173") + bytes.fromhex("2203088827")
    back = sm.StateCallCommand()
    back.ParseFromString(data)
    assert (back.stateName, back.schema, back.ttl.durationMs) == ("myState", "s", 5000)


def test_shim_vivified_submessage_not_serialized(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    _ = cmd.ttl  # read-only access must NOT mark ttl present
    assert cmd.SerializeToString() == bytes.fromhex("0a0178")


def test_shim_empty_oneof_member_serialized(sm):
    # an empty message that IS the active oneof member must hit the wire
    # (tag + len 0) — the JVM dispatches on the oneof case
    r = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert r.SerializeToString() == bytes.fromhex("22021200")
    back = sm.StateRequest()
    back.ParseFromString(bytes.fromhex("22021200"))
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert back.implicitGroupingKeyRequest.WhichOneof("method") == "removeImplicitKey"


def test_shim_oneof_switch_clears_previous(sm):
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert call.WhichOneof("method") == "get"
    call2 = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    assert call2.WhichOneof("method") == "exists"


def test_shim_parses_all_default_response_from_empty_bytes(sm):
    resp = sm.StateResponse()
    resp.ParseFromString(b"")  # proto3 omits default fields entirely
    assert (resp.statusCode, resp.errorMessage, resp.value) == (0, "", b"")


def test_shim_negative_int64_roundtrip(sm):
    m = sm.RegisterTimer(expiryTimestampMs=-1)
    data = m.SerializeToString()
    # -1 encodes as ten 0xff..0x01 bytes (two's-complement 64-bit varint)
    assert data == bytes([0x08]) + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_shim_repeated_message_and_optional_bytes(sm):
    tr = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(timestampMs=123, key=b"kk"), sm.TimerInfo(timestampMs=7)],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(tr.SerializeToString())
    got = [(t.timestampMs, t.key, t.HasField("key")) for t in back.timer]
    assert got == [(123, b"kk", True), (7, b"", False)]
    assert back.requireNextFetch is True


def test_shim_repeated_bytes_roundtrip(sm):
    m = sm.StateResponseWithListGet(statusCode=0, value=[b"a", b"", b"ccc"])
    back = sm.StateResponseWithListGet()
    back.ParseFromString(m.SerializeToString())
    assert list(back.value) == [b"a", b"", b"ccc"]


def test_shim_skips_unknown_fields(sm):
    # field 15 (unknown to RegisterTimer) varint + field 1 = known
    payload = bytes([0x78, 0x05, 0x08, 0x2A])
    m = sm.RegisterTimer()
    m.ParseFromString(payload)
    assert m.expiryTimestampMs == 42


def test_shim_bigint_past_2_53_exact(sm):
    v = (1 << 60) + 7
    m = sm.RegisterTimer(expiryTimestampMs=v)
    back = sm.RegisterTimer()
    back.ParseFromString(m.SerializeToString())
    assert back.expiryTimestampMs == v


def test_shim_descriptor_parser_handles_full_state_message_file(sm):
    # the generated module loaded through the shim exposes every message the
    # state clients reference, with enum constants at module level
    for name in (
        "StateRequest",
        "StateResponse",
        "StateResponseWithLongTypeVal",
        "StateResponseWithStringTypeVal",
        "StateResponseWithListGet",
        "StateResponseWithMapKeysOrValues",
        "StateResponseWithMapIterator",
        "StateResponseWithTimer",
        "KeyAndValuePair",
        "TimerInfo",
        "StatefulProcessorCall",
        "StateVariableRequest",
        "ImplicitGroupingKeyRequest",
        "TimerRequest",
        "UtilsRequest",
        "StateCallCommand",
        "TimerStateCallCommand",
        "ValueStateCall",
        "ListStateCall",
        "MapStateCall",
    ):
        assert hasattr(sm, name), name
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.CLOSED) == (0, 1, 2, 5)
    assert sm.HandleState.DATA_PROCESSED == 3


# ------------------------------------------------------------ engine guards


def _mk_stream(spark, tmp_path, name, schema, rows, key, ts=None):
    from pyspark_engine.streaming import StreamingBuilder

    d = str(tmp_path / name)
    spark.createDataFrame(rows, schema).write.parquet(d)
    return StreamingBuilder(spark).file_stream(d, key=key, ts=ts)


def test_tws_state_dir_refused_by_keyed_engine_and_vice_versa(spark, tmp_path):
    """A dir stamped by one engine family must be refused descriptively by
    the other (fabricated markers — no drain needed)."""
    import os

    from pyspark_engine.streaming import join_tables_streaming

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    l1 = _mk_stream(spark, tmp_path, "l1", "k int, lv int, lts timestamp", [(1, 1, t(0))], "k", "lts")
    r1 = _mk_stream(spark, tmp_path, "r1", "rk int, rv int, rts timestamp", [(1, 1, t(0))], "rk", "rts")

    # fabricate a pandas-keyed dir → tws must refuse
    keyed_dir = tmp_path / "keyed_dir"
    keyed_dir.mkdir()
    (keyed_dir / "_PSE_TTJOIN_V").write_text("1")
    with pytest.raises(ValueError, match="pandas keyed tt-join"):
        join_tables_streaming(l1, r1, engine="tws", state_dir=str(keyed_dir))

    # fabricate an exact ping-pong dir → tws must refuse
    exact_dir = tmp_path / "exact_dir"
    exact_dir.mkdir()
    (exact_dir / "_GEN").write_text("1")
    with pytest.raises(ValueError, match="exact ping-pong"):
        join_tables_streaming(l1, r1, engine="tws", state_dir=str(exact_dir))

    # fabricate a tws dir WITH emissions → the pandas keyed engine must
    # refuse descriptively (the bind gate fires first on a fabricated dir;
    # on a real one whose bind matches, the version gate fires — either way
    # the populated foreign dir never drains under the wrong engine)
    tws_dir = tmp_path / "tws_dir"
    (tws_dir / "out" / "sink_batch=0").mkdir(parents=True)
    (tws_dir / "out" / "sink_batch=0" / "part-0.parquet").write_bytes(b"")
    (tws_dir / "_PSE_TWS_TTJOIN_V").write_text("1")
    os.makedirs(tws_dir / "ck")
    with pytest.raises(ValueError, match="state dir"):
        join_tables_streaming(
            l1, r1, engine="keyed", state_dir=str(tws_dir), checkpoint=str(tws_dir / "ck")
        )


def test_tws_container_value_columns_ride_binary_tunnel(spark, tmp_path):
    """r12 verdict task 2: container-typed VALUE columns work on the tws
    engines — they ride the value state as pickled binary (_enc_c) and are
    decoded before emission, so the re-emission-from-state path returns the
    NATIVE container.  Container ORDER columns (a position the tunnel
    cannot cover) still refuse with a pointer at engine='exact'."""
    from pyspark_engine.streaming import StreamingBuilder, join_tables_streaming
    from pyspark_engine.testing import stage_generation_file

    # two batches: the left container is stored in batch 0 and re-emitted
    # FROM STATE when the right side arrives in batch 1 — the round-trip
    # the upstream bug breaks without the tunnel
    ld, rd = str(tmp_path / "lt"), str(tmp_path / "rt")
    stage_generation_file(
        spark.createDataFrame(
            [(1, [1.5, float("nan"), None], 1), (2, None, 1), (3, [], 1)],
            "k int, lv array<double>, lo int",
        ),
        ld,
        0,
    )
    stage_generation_file(
        spark.createDataFrame([(1, 10, 1), (2, 20, 1), (3, 30, 1)], "rk int, rv int, ro int"),
        rd,
        0,
    )
    sb = StreamingBuilder(spark)
    snap = join_tables_streaming(
        sb.file_stream(ld, key="k"),
        sb.file_stream(rd, key="rk"),
        how="inner",
        l_order=("lo",),
        r_order=("ro",),
        engine="tws",
    )
    got = {r["k"]: r["lv"] for r in snap.collect()}
    assert got[1][0] == 1.5 and math.isnan(got[1][1]) and got[1][2] is None
    assert got[2] is None and got[3] == []

    # container ORDER column: hard position, still refused
    lo = _mk_stream(
        spark, tmp_path, "lo2", "k int, lv int, lord array<int>", [(1, 1, [1])], "k"
    )
    ro = _mk_stream(spark, tmp_path, "ro2", "rk int, rv int, ro int", [(1, 1, 1)], "rk")
    with pytest.raises(ValueError, match="key/order/fk position"):
        join_tables_streaming(
            lo, ro, how="inner", l_order=("lord",), r_order=("ro",), engine="tws"
        )


# ------------------------------------------------------------ NaN semantics


def test_tws_pins_session_timezone_utc_for_drain(spark, tmp_path):
    """r12 advice: ``_norm``'s UTC contract is enforced by scoping
    ``spark.sql.session.timeZone=UTC`` around every tws drain
    (_rocksdb_provider).  On a non-UTC session, value-state timestamps
    round-trip as session-tz-naive while fresh input rows normalize to
    UTC-naive — the order comparison between them skews by the zone offset
    and a strictly OLDER update arriving in a later batch wrongly replaces
    the stored row.  Same two-batch drain under a New-York session: tws
    must agree with the exact engine (keep 'old'), and the caller's tz must
    be restored afterwards."""
    from pyspark_engine.streaming import StreamingBuilder, join_tables_streaming
    from pyspark_engine.testing import stage_generation_file

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    try:
        results = {}
        for engine in ("tws", "exact"):
            ld, rd = str(tmp_path / f"l_{engine}"), str(tmp_path / f"r_{engine}")
            stage_generation_file(
                spark.createDataFrame([(1, "old", t(12))], "k int, lv string, lo timestamp"),
                ld,
                0,
            )
            # strictly older order value in a LATER batch: must NOT replace
            stage_generation_file(
                spark.createDataFrame([(1, "new", t(9))], "k int, lv string, lo timestamp"),
                ld,
                1,
            )
            stage_generation_file(
                spark.createDataFrame([(1, 10, t(0))], "rk int, rv int, ro timestamp"), rd, 0
            )
            # StreamingBuilder's configure() pins UTC itself — flip the tz
            # AFTER building, so the drain genuinely starts on a non-UTC
            # session (the external-session case the advice targets)
            sb = StreamingBuilder(spark)
            lstream = sb.file_stream(ld, key="k", max_files_per_trigger=1)
            rstream = sb.file_stream(rd, key="rk")
            spark.conf.set(tz_key, "America/New_York")
            snap = join_tables_streaming(
                lstream,
                rstream,
                how="inner",
                l_order=("lo",),
                r_order=("ro",),
                engine=engine,
            )
            results[engine] = {r["k"]: r["lv"] for r in snap.collect()}
            assert spark.conf.get(tz_key) == "America/New_York"  # restored after drain
            spark.conf.set(tz_key, prev)
        assert results["tws"] == results["exact"] == {1: "old"}
    finally:
        spark.conf.set(tz_key, prev)


def test_nan_double_semantics_across_join_engines(spark, tmp_path):
    """r11 advice pin: a genuine float NaN in a double value column is
    PRESERVED by the exact loop and the tws engine, and coerced to null by
    the pandas keyed engine (Arrow float64 slices cannot distinguish NaN
    from union null-padding — documented at _clean_state_value)."""
    from pyspark_engine.streaming import join_tables_streaming

    l1 = _mk_stream(
        spark, tmp_path, "ln", "k int, lv double, lo int", [(1, float("nan"), 1), (2, 2.5, 1)], "k"
    )
    r1 = _mk_stream(spark, tmp_path, "rn", "rk int, rv int, ro int", [(1, 10, 1), (2, 20, 1)], "rk")

    def run(engine):
        snap = join_tables_streaming(
            l1, r1, how="inner", l_order=("lo",), r_order=("ro",), engine=engine
        )
        return {r["k"]: r["lv"] for r in snap.collect()}

    exact = run("exact")
    assert math.isnan(exact[1]) and exact[2] == 2.5
    tws = run("tws")
    assert math.isnan(tws[1]) and tws[2] == 2.5
    keyed = run("keyed")
    assert keyed[1] is None and keyed[2] == 2.5


@pytest.mark.xfail(
    strict=True,
    reason="upstream PySpark 4.1.2: a nested container (array<struct>) in "
    "VALUE state cannot round-trip — under the shim runtime the worker dies "
    "in cloudpickle ('cannot pickle generator object') during the update; "
    "with the wheel the value came back scrambled.  This is exactly why the "
    "tws engines refuse container-typed user value columns (tws.py module "
    "docstring / _refuse_containers).  A strict XPASS means a Spark upgrade "
    "fixed the round-trip: lift the tws container refusal.",
)
def test_upstream_nested_container_value_state_roundtrip(spark, tmp_path):
    """Minimal repro, independent of the engines: store [{a:1,b:'x'},
    {a:2,b:'y'}] in a value state in batch 1, read it back in batch 2."""
    import json

    from pyspark.sql import Row as _Row
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from pyspark_engine.testing import stage_generation_file
    from pyspark_engine.tws import (
        _import_stateful_processor,
        _rocksdb_provider,
        require_tws,
    )

    require_tws(spark)
    StatefulProcessor = _import_stateful_processor()
    elem = StructType([StructField("a", IntegerType()), StructField("b", StringType())])
    state_schema = StructType([StructField("arr", ArrayType(elem))])
    stored = [_Row(a=1, b="x"), _Row(a=2, b="y")]

    class Echo(StatefulProcessor):
        def init(self, handle):
            self.st = handle.getValueState("v", state_schema)

        def close(self):
            pass

        def handleInputRows(self, key, rows, timerValues):
            list(rows)  # drain the iterator
            prev = self.st.get()
            if prev is None:
                seen = "none"
            else:
                seen = json.dumps([[e["a"], e["b"]] for e in prev[0]])
            self.st.update((stored,))
            yield _Row(k=key[0], prev=seen)

    src = str(tmp_path / "src")
    stage_generation_file(spark.createDataFrame([(1, 1)], "k int, v int"), src, 0)
    stage_generation_file(spark.createDataFrame([(1, 2)], "k int, v int"), src, 1)
    sdf = (
        spark.readStream.schema("k int, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _rocksdb_provider(spark):
        res = sdf.groupBy("k").transformWithState(Echo(), "k int, prev string", "Update", "None")
        q = (
            res.writeStream.format("memory")
            .queryName("xfail_container_state")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {r["prev"] for r in spark.sql("select * from xfail_container_state").collect()}
    assert 'none' in got
    assert json.dumps([[1, "x"], [2, "y"]]) in got  # scrambled today (upstream)


def test_asof_tws_engine_guards_and_resume(spark, tmp_path):
    """r12 verdict task 4 companions: a dir written by one as-of engine is
    refused by the other (layout/marker guards); a RESUMED tws drain with
    new stream files returns the accumulated result and only per-batch work
    (the staged history is consumed once — list state retains it)."""
    import os

    from pyspark_engine import StreamBuilder as BatchBuilder
    from pyspark_engine.streaming import StreamingBuilder, join_table_asof_streaming
    from pyspark_engine.testing import stage_generation_file

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    b = BatchBuilder(spark)
    hist = spark.createDataFrame(
        [(1, t(0), 100), (1, t(10), 110), (2, t(5), 200)], "k long, ts timestamp, pv long"
    )
    vt = b.versioned_table(hist, key="k", ts="ts", order=("pv",))
    src = str(tmp_path / "s")
    stage_generation_file(
        spark.createDataFrame([(1, t(5), 0)], "k long, ts timestamp, sid long"), src, 0
    )
    sb = StreamingBuilder(spark)

    def ks():
        return sb.file_stream(src, key="k", ts="ts", max_files_per_trigger=1)

    root, ck = str(tmp_path / "asof"), str(tmp_path / "ck")
    got1 = join_table_asof_streaming(ks(), vt, how="left", out_dir=root, checkpoint=ck, engine="tws")
    assert {(r["k"], r["sid"], r["pv"]) for r in got1.collect()} == {(1, 0, 100)}
    assert os.path.exists(os.path.join(root, "_PSE_TWS_ASOF_V"))

    # exact engine refuses the tws layout
    with pytest.raises(ValueError, match="tws as-of engine"):
        join_table_asof_streaming(ks(), vt, out_dir=root, checkpoint=ck, engine="exact")

    # resume: a new stream file joins against the RETAINED list-state
    # history; result accumulates (engine=None re-selects tws from the marker)
    stage_generation_file(
        spark.createDataFrame([(1, t(20), 1), (2, t(4), 2)], "k long, ts timestamp, sid long"),
        src,
        1,
    )
    got2 = join_table_asof_streaming(ks(), vt, how="left", out_dir=root, checkpoint=ck)
    assert {(r["k"], r["sid"], r["pv"]) for r in got2.collect()} == {
        (1, 0, 100),
        (1, 1, 110),
        (2, 2, None),
    }

    # tws refuses an exact-layout dir
    root2, ck2 = str(tmp_path / "asof2"), str(tmp_path / "ck2")
    join_table_asof_streaming(ks(), vt, how="left", out_dir=root2, checkpoint=ck2, engine="exact")
    with pytest.raises(ValueError, match="exact as-of engine"):
        join_table_asof_streaming(ks(), vt, out_dir=root2, checkpoint=ck2, engine="tws")
