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


# ---------------- package-free Avro/Protobuf codecs + SR framing ----------------

AVRO_SCHEMA = (
    '{"type":"record","name":"ev","fields":['
    '{"name":"a","type":"long"},'
    '{"name":"s","type":"string"},'
    '{"name":"v","type":["null","double"]},'
    '{"name":"b","type":"boolean"},'
    '{"name":"raw","type":"bytes"}]}'
)


def test_avro_py_known_vectors():
    """Byte-exact against the Avro spec's own examples: zigzag long 1→0x02,
    -1→0x01, string "foo"→0x06+utf8."""
    from pyspark_engine.serdes import _avro_decode_row, _avro_encode_row, _avro_fields

    sch = '{"type":"record","name":"t","fields":[{"name":"a","type":"long"},{"name":"s","type":"string"}]}'
    f = _avro_fields(sch)
    assert _avro_encode_row([1, "foo"], f) == bytes([0x02, 0x06]) + b"foo"
    assert _avro_encode_row([-1, ""], f) == bytes([0x01, 0x00])
    assert _avro_decode_row(_avro_encode_row([12345, "héllo"], f), f) == [12345, "héllo"]


def test_avro_py_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "foo", 2.5, True, b"\x01\x02"), (-99, "", None, False, b"")],
        "a long, s string, v double, b boolean, raw binary",
    )
    wire = df.select(serdes.encode_avro_py(F.struct("a", "s", "v", "b", "raw"), AVRO_SCHEMA).alias("w"))
    back = wire.select(serdes.decode_avro_py(F.col("w"), AVRO_SCHEMA).alias("r")).select("r.*")
    got = sorted([tuple(r) for r in back.collect()])
    want = sorted([(1, "foo", 2.5, True, bytearray(b"\x01\x02")), (-99, "", None, False, bytearray(b""))])
    assert got == want


def test_protobuf_py_known_vectors():
    """Byte-exact against the Protobuf encoding docs example: field 1
    varint 150 → 08 96 01; field 2 string "testing" → 12 07 + ascii."""
    from pyspark_engine.serdes import _pb_encode_row, _pb_fields

    msg = {"name": "T", "fields": [{"num": 1, "name": "a", "type": "int64"},
                                   {"num": 2, "name": "b", "type": "string"}]}
    pf = _pb_fields(msg)
    assert _pb_encode_row([150, None], pf) == bytes.fromhex("089601")
    assert _pb_encode_row([None, "testing"], pf) == bytes.fromhex("120774657374696e67")


def test_protobuf_py_spark_roundtrip(spark):
    msg = {"name": "D", "fields": [
        {"num": 1, "name": "doc_id", "type": "int64"},
        {"num": 2, "name": "lang", "type": "string"},
        {"num": 3, "name": "score", "type": "double"},
        {"num": 4, "name": "flag", "type": "bool"},
    ]}
    df = spark.createDataFrame(
        [(7, "en", 0.5, True), (-3, None, None, False)],
        "doc_id long, lang string, score double, flag boolean",
    )
    wire = df.select(serdes.encode_protobuf_py(F.struct("doc_id", "lang", "score", "flag"), msg).alias("w"))
    back = wire.select(serdes.decode_protobuf_py(F.col("w"), msg).alias("r")).select("r.*")
    got = sorted([tuple(r) for r in back.collect()])
    # absent fields decode to null (presence semantics); False bool is encoded
    assert got == sorted([(7, "en", 0.5, True), (-3, None, None, False)])


def test_protobuf_py_skips_unknown_fields(spark):
    """Forward compatibility: bytes produced with a superset message decode
    under the older message, unknown fields skipped by wire type."""
    from pyspark_engine.serdes import _pb_decode_row, _pb_encode_row, _pb_fields

    new_msg = _pb_fields({"name": "N", "fields": [
        {"num": 1, "name": "a", "type": "int64"},
        {"num": 2, "name": "x", "type": "double"},
        {"num": 3, "name": "y", "type": "string"},
        {"num": 4, "name": "z", "type": "float"}]})
    old = {1: ("a", "int64")}
    buf = _pb_encode_row([5, 1.5, "gone", 2.0], new_msg)
    assert _pb_decode_row(buf, old) == {"a": 5}


def test_confluent_framing_expressions(spark):
    """Magic byte + 4-byte big-endian schema id, built and unpacked by pure
    Catalyst expressions."""
    df = spark.createDataFrame([(b"payload",)], "p binary")
    framed = df.select(serdes.frame_confluent(F.col("p"), 0x01020304).alias("w"))
    row = framed.select(
        serdes.unframe_confluent_id(F.col("w")).alias("sid"),
        serdes.unframe_confluent_payload(F.col("w")).alias("pay"),
        F.substring("w", 1, 1).alias("magic"),
    ).collect()[0]
    assert row.sid == 0x01020304
    assert bytes(row.pay) == b"payload"
    assert bytes(row.magic) == b"\x00"


def test_schema_registry_analog():
    from pyspark_engine.serdes import InMemorySchemaRegistry

    reg = InMemorySchemaRegistry()
    s1 = '{"type":"record","name":"a","fields":[]}'
    s2 = '{"type":"record","name":"b","fields":[]}'
    id1 = reg.register("topic-value", s1)
    assert reg.register("topic-value", s1) == id1          # idempotent
    id2 = reg.register("topic-value", s2)                  # new version
    assert id2 != id1
    assert reg.by_id(id1) == s1
    assert reg.latest("topic-value") == (id2, s2)
    assert reg.register("other-value", s1) == id1          # same schema, same id


def test_avro_confluent_end_to_end(spark):
    """The SchemaAvroSerDes composition: register schema, frame the Avro
    payload, then unframe + decode — the full Schema-Registry wire path
    offline (reference SchemaAvroSerDes.cs Serialize/Deserialize)."""
    from pyspark_engine.serdes import InMemorySchemaRegistry

    reg = InMemorySchemaRegistry()
    sch = '{"type":"record","name":"t","fields":[{"name":"a","type":"long"}]}'
    sid = reg.register("events-value", sch)
    df = spark.createDataFrame([(4,), (5,)], "a long")
    wire = df.select(
        serdes.frame_confluent(serdes.encode_avro_py(F.struct("a"), sch), sid).alias("w")
    )
    ids = {r.sid for r in wire.select(serdes.unframe_confluent_id(F.col("w")).alias("sid")).collect()}
    assert ids == {sid}
    back = wire.select(
        serdes.decode_avro_py(
            serdes.unframe_confluent_payload(F.col("w")), reg.by_id(sid)
        ).alias("r")
    ).select("r.*")
    assert sorted(r.a for r in back.collect()) == [4, 5]


# ---------------- property-based codec fuzz (pure-Python layer) ----------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    _finite_f64 = st.floats(allow_nan=False, allow_infinity=False, width=64)

    @settings(max_examples=200, deadline=None)
    @given(
        a=_i64,
        s=st.text(max_size=80),
        v=st.one_of(st.none(), _finite_f64),
        b=st.booleans(),
        raw=st.binary(max_size=64),
    )
    def test_avro_row_roundtrip_property(a, s, v, b, raw):
        """decode(encode(x)) == x for every value the flat-record codec
        accepts — arbitrary int64s, unicode, NaN-free doubles, bytes."""
        from pyspark_engine.serdes import _avro_decode_row, _avro_encode_row, _avro_fields

        f = _avro_fields(AVRO_SCHEMA)
        assert _avro_decode_row(_avro_encode_row([a, s, v, b, raw], f), f) == [a, s, v, b, raw]

    @settings(max_examples=200, deadline=None)
    @given(
        x=st.one_of(st.none(), _i64),
        y=st.one_of(st.none(), _finite_f64),
        z=st.one_of(st.none(), st.booleans()),
        w=st.one_of(st.none(), st.binary(max_size=64)),
        q=st.one_of(st.none(), st.text(max_size=80)),
        sz=st.one_of(st.none(), _i64),
    )
    def test_protobuf_row_roundtrip_property(x, y, z, w, q, sz):
        """Protobuf wire roundtrip incl. presence: absent (None) fields stay
        absent, int64 full range (negatives = 10-byte varints), sint64 zigzag."""
        from pyspark_engine.serdes import _pb_decode_row, _pb_encode_row, _pb_fields

        msg = {"name": "P", "fields": [
            {"num": 1, "name": "x", "type": "int64"},
            {"num": 2, "name": "y", "type": "double"},
            {"num": 3, "name": "z", "type": "bool"},
            {"num": 4, "name": "w", "type": "bytes"},
            {"num": 5, "name": "q", "type": "string"},
            {"num": 6, "name": "sz", "type": "sint64"},
        ]}
        pf = _pb_fields(msg)
        by_num = {n: (nm, t) for n, nm, t in pf}
        got = _pb_decode_row(_pb_encode_row([x, y, z, w, q, sz], pf), by_num)
        want = {k: v for k, v in zip(["x", "y", "z", "w", "q", "sz"], [x, y, z, w, q, sz]) if v is not None}
        assert got == want


def test_avro_py_timestamp_micros_roundtrip(spark):
    """timestamp-micros logical type: event time travels through the codec
    (long µs on the wire, TIMESTAMP in the frame) — zigzag-encoded epoch."""
    sch = (
        '{"type":"record","name":"e","fields":['
        '{"name":"a","type":"long"},'
        '{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}'
    )
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    df = spark.createDataFrame([(1, t0)], "a long, ts timestamp")
    wire = df.select(serdes.encode_avro_py(F.struct("a", "ts"), sch).alias("w"))
    back = wire.select(serdes.decode_avro_py(F.col("w"), sch).alias("r")).select("r.*")
    row = back.collect()[0]
    assert row.a == 1 and row.ts == t0
    assert dict(back.dtypes)["ts"] == "timestamp"


def test_avro_py_float_array_roundtrip(spark):
    """array<float> block encoding: exact float32 roundtrip incl. the empty
    array (bare terminator byte) and negative values."""
    sch = (
        '{"type":"record","name":"e","fields":['
        '{"name":"vec_id","type":"long"},'
        '{"name":"embedding","type":{"type":"array","items":"float"}}]}'
    )
    rows = [(1, [1.5, -2.25, 0.0]), (2, []), (3, [3.14159])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    wire = df.select(serdes.encode_avro_py(F.struct("vec_id", "embedding"), sch).alias("w"))
    back = wire.select(serdes.decode_avro_py(F.col("w"), sch).alias("r")).select("r.*")
    got = {r.vec_id: list(r.embedding) for r in back.collect()}
    import struct as _s

    want = {k: [_s.unpack("<f", _s.pack("<f", x))[0] for x in v] for k, v in rows}
    assert got == want


def test_protobuf_py_packed_repeated(spark):
    """proto3 packed repeated scalars: docs example bytes (`220603 8e02
    9ea705` for [3,270,86942]) plus float-vector Spark roundtrip; empty
    repeated field is absent on the wire and decodes to null."""
    from pyspark_engine.serdes import _pb_encode_row, _pb_fields

    m = _pb_fields({"name": "T", "fields": [{"num": 4, "name": "d", "type": "repeated int64"}]})
    assert _pb_encode_row([[3, 270, 86942]], m) == bytes.fromhex("2206038e029ea705")

    msg = {"name": "V", "fields": [
        {"num": 1, "name": "vec_id", "type": "int64"},
        {"num": 2, "name": "vec", "type": "repeated float"},
    ]}
    df = spark.createDataFrame(
        [(1, [1.5, -2.25]), (2, [])], "vec_id long, vec array<float>"
    )
    wire = df.select(serdes.encode_protobuf_py(F.struct("vec_id", "vec"), msg).alias("w"))
    back = wire.select(serdes.decode_protobuf_py(F.col("w"), msg).alias("r")).select("r.*")
    got = {r.vec_id: (list(r.vec) if r.vec is not None else None) for r in back.collect()}
    assert got == {1: [1.5, -2.25], 2: None}


def test_warc_roundtrip_and_truncation(spark):
    """WARC record synth + parse: multi-byte payload with an INTERIOR blank
    line survives the round trip (greedy payload regex), Content-Length is
    octets not chars, and a truncated record fails the ok check instead of
    mis-parsing."""
    payload = "héllo wörld\r\n\r\nsecond block"
    df = spark.createDataFrame([(7, "web.example", payload)],
                               "doc_id long, source string, text string")
    rec = serdes.encode_warc(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id")),
        F.col("text"), F.col("doc_id"))
    out = df.select(rec.alias("rec")).select(serdes.decode_warc(F.col("rec")).alias("p"))
    row = out.select("p.*").collect()[0]
    assert row.uri == "https://web.example/doc/7"
    assert row.record_id == "7"
    assert row.payload == payload
    assert row.content_length == len(payload.encode()) and row.ok

    cut = df.select(F.substring(rec, 1, 40).alias("rec"))
    bad = cut.select(serdes.decode_warc(F.col("rec")).alias("p")).select("p.*").collect()[0]
    assert not bad.ok


def test_warc_gz_members_split_and_truncation(spark):
    """The .warc.gz member layer: per-record gzip members concatenate into
    one blob and split back intact (multi-byte payloads, member order
    preserved); gzip bytes are deterministic (mtime=0); a truncated
    trailing member RAISES (zlib CRC/stream verification) instead of
    yielding a silent partial record."""
    import gzip

    import pytest as _pytest
    from pyspark.sql.utils import PythonException

    rows = [(i, f"record-{i} héllo") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    members = df.select(
        "doc_id", serdes.gzip_members(F.col("text")).alias("m")
    ).orderBy("doc_id")
    got = members.collect()
    # independent stdlib decode of each member + determinism pin
    for r in got:
        assert gzip.decompress(bytes(r.m)).decode() == f"record-{r.doc_id} héllo"
        assert bytes(r.m) == gzip.compress(f"record-{r.doc_id} héllo".encode(), mtime=0)

    blob = b"".join(bytes(r.m) for r in got)
    bdf = spark.createDataFrame([(bytearray(blob),)], "blob binary")
    back = bdf.select(serdes.split_gzip_members(F.col("blob")).alias("ms")).collect()[0].ms
    assert back == [f"record-{i} héllo" for i in range(3)]

    cut = spark.createDataFrame([(bytearray(blob[:-5]),)], "blob binary")
    with _pytest.raises(PythonException, match="truncated gzip member"):
        cut.select(serdes.split_gzip_members(F.col("blob")).alias("ms")).collect()


def _mock_registry_server():
    """Minimal Confluent Schema-Registry REST mock (stdlib http.server):
    POST /subjects/{s}/versions registers, POST /subjects/{s} looks up,
    GET /schemas/ids/{id} and /subjects/{s}/versions/latest read.  Counts
    hits per path so the client's id cache is observable."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    state = {"by_id": {}, "ids": {}, "subjects": {}, "hits": [], "auth": []}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self):
            want = state.get("require_auth")
            if want and self.headers.get("Authorization") != want:
                self._send(401, {"error_code": 401, "message": "Unauthorized"})
                return False
            return True

        def do_GET(self):
            state["hits"].append(("GET", self.path))
            if not self._authorized():
                return
            if self.path.startswith("/schemas/ids/"):
                sid = int(self.path.rsplit("/", 1)[1])
                if sid not in state["by_id"]:
                    return self._send(404, {"error_code": 40403, "message": "Schema not found"})
                return self._send(200, {"schema": state["by_id"][sid]})
            if self.path.endswith("/versions/latest"):
                subject = self.path.split("/")[2]
                versions = state["subjects"].get(subject)
                if not versions:
                    return self._send(404, {"error_code": 40401, "message": "Subject not found"})
                sid = versions[-1]
                return self._send(
                    200,
                    {"subject": subject, "version": len(versions), "id": sid,
                     "schema": state["by_id"][sid]},
                )
            return self._send(404, {"error_code": 404, "message": "unknown path"})

        def do_POST(self):
            state["hits"].append(("POST", self.path))
            state["auth"].append(self.headers.get("Authorization"))
            if not self._authorized():
                return
            n = int(self.headers.get("Content-Length", 0))
            schema = json.loads(self.rfile.read(n).decode())["schema"]
            parts = self.path.strip("/").split("/")
            subject = parts[1]
            if len(parts) == 3 and parts[2] == "versions":  # register
                sid = state["ids"].get(schema)
                if sid is None:
                    sid = len(state["by_id"]) + 1
                    state["ids"][schema] = sid
                    state["by_id"][sid] = schema
                state["subjects"].setdefault(subject, [])
                if sid not in state["subjects"][subject]:
                    state["subjects"][subject].append(sid)
                return self._send(200, {"id": sid})
            # lookup (auto_register=False path)
            sid = state["ids"].get(schema)
            if sid is None or sid not in state["subjects"].get(subject, []):
                return self._send(404, {"error_code": 40403, "message": "Schema not found"})
            return self._send(200, {"subject": subject, "id": sid, "version": 1, "schema": schema})

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, state


def test_http_schema_registry_client(spark):
    """HttpSchemaRegistry against a mock Confluent REST server: register/
    by_id/latest with TopicNameStrategy subjects, the id cache (a second
    register/by_id never re-hits the server — CachedSchemaRegistryClient
    behavior), dead-endpoint failover, basic-auth header, the
    auto_register=False lookup mode, and 404 surfaced as ConnectionError.
    The Confluent wire framing (q103) is registry-id-driven and unchanged."""
    import pytest as _pytest

    from pyspark_engine.serdes import HttpSchemaRegistry, subject_name

    srv, state = _mock_registry_server()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        avro = '{"type":"record","name":"E","fields":[{"name":"x","type":"long"}]}'

        # TopicNameStrategy (SchemaRegistryConfig.cs:8-28)
        assert subject_name("events", is_key=False) == "events-value"
        assert subject_name("events", is_key=True) == "events-key"
        assert subject_name("events", record_name="com.x.E", strategy="record") == "com.x.E"
        assert subject_name("events", record_name="com.x.E", strategy="topic_record") == "events-com.x.E"

        # failover: dead endpoint first, live second; basic auth forwarded
        reg = HttpSchemaRegistry(
            f"http://127.0.0.1:1,{url}", timeout_ms=3000, basic_auth="user:secret"
        )
        sid = reg.register(subject_name("events"), avro)
        assert sid == 1
        assert state["auth"][-1].startswith("Basic ")
        # id cache: re-register and by_id never re-hit the server
        hits = len(state["hits"])
        assert reg.register(subject_name("events"), avro) == sid
        assert reg.by_id(sid) == avro
        assert len(state["hits"]) == hits
        # latest always consults the registry (mutable server-side)
        assert reg.latest("events-value") == (sid, avro)
        assert len(state["hits"]) == hits + 1
        # a second schema version under the same subject
        avro2 = avro.replace('"E"', '"E2"')
        sid2 = reg.register("events-value", avro2)
        assert sid2 == 2 and reg.latest("events-value")[0] == sid2

        # auto_register=False: lookup-only; unknown schema -> ConnectionError(404)
        ro = HttpSchemaRegistry(url, auto_register=False)
        assert ro.register("events-value", avro) == sid
        with _pytest.raises(ConnectionError, match="40403|Schema not found|HTTP 404"):
            ro.register("events-value", avro.replace('"E"', '"Nope"'))

        # unknown id -> ConnectionError, not KeyError-silence
        with _pytest.raises(ConnectionError, match="HTTP 404"):
            reg.by_id(99)

        # all endpoints dead -> ConnectionError naming the config analog
        dead = HttpSchemaRegistry("http://127.0.0.1:1", timeout_ms=500)
        with _pytest.raises(ConnectionError, match="SchemaRegistryUrl"):
            dead.by_id(1)

        # q103 framing unchanged: registry ids drive the SAME wire frame
        df = spark.createDataFrame([(b"payload",)], "v binary")
        framed = df.select(
            serdes.frame_confluent(F.col("v"), sid).alias("w")
        ).select(
            serdes.unframe_confluent_id(F.col("w")).alias("sid"),
            serdes.unframe_confluent_payload(F.col("w")).alias("p"),
        ).collect()[0]
        assert framed.sid == sid and bytes(framed.p) == b"payload"
        assert reg.by_id(framed.sid) == avro  # the decode-side schema fetch
    finally:
        srv.shutdown()


def test_http_schema_registry_eviction_auth_and_tls():
    """Registry-client hardening (r8 verdict item 8): (1) the schema caches
    stay BOUNDED under subject churn — max_cached_schemas is a bound, not
    an oracle, so an evicted id transparently re-fetches from the server;
    (2) an auth failure (HTTP 401 from a reachable endpoint) surfaces as a
    descriptive ConnectionError without failover; (3) the Ssl* pass-through
    (StreamConfig.cs:611 analogs) builds a real SSLContext — CA pinning,
    CERT_NONE when verification is disabled, and bad client-cert paths
    fail loudly."""
    import base64
    import ssl

    import pytest as _pytest

    from pyspark_engine.serdes import HttpSchemaRegistry

    srv, state = _mock_registry_server()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # (1) cache-bound eviction under churn
        reg = HttpSchemaRegistry(url, max_cached_schemas=3)
        ids = {}
        for i in range(8):
            schema = '{"type":"record","name":"R%d","fields":[]}' % i
            ids[i] = reg.register(f"churn-{i}-value", schema)
        assert len(reg._ids) <= 3 and len(reg._by_id) <= 3
        # id 1 was evicted: by_id must re-fetch (server hit count grows)
        before = len(state["hits"])
        assert "R0" in reg.by_id(ids[0])
        assert len(state["hits"]) == before + 1
        # and the refetched entry is cached again (no second hit)
        reg.by_id(ids[0])
        assert len(state["hits"]) == before + 1

        # (2) auth failure: reachable endpoint, wrong credentials -> 401
        # surfaced as ConnectionError, no retry storm against other URLs
        tok = base64.b64encode(b"user:right").decode()
        state["require_auth"] = f"Basic {tok}"
        ok = HttpSchemaRegistry(url, basic_auth="user:right")
        assert ok.register("authed-value", '{"type":"string"}') >= 1
        bad = HttpSchemaRegistry(url, basic_auth="user:wrong")
        with _pytest.raises(ConnectionError, match="401"):
            bad.register("authed-value", '{"type":"string"}')
        state["require_auth"] = None
    finally:
        srv.shutdown()

    # (3) TLS context wiring (no HTTPS server on the box: assert the
    # context itself, which is what urlopen receives for https:// URLs)
    plain = HttpSchemaRegistry(
        "https://registry.example:8081", enable_ssl_certificate_verification=False
    )
    ctx = plain._ssl_context()
    assert ctx.verify_mode == ssl.CERT_NONE and not ctx.check_hostname
    assert plain._ssl_context() is ctx  # built once
    strict = HttpSchemaRegistry("https://registry.example:8081")
    assert strict._ssl_context().verify_mode == ssl.CERT_REQUIRED
    with _pytest.raises((OSError, ssl.SSLError)):
        HttpSchemaRegistry(
            "https://registry.example:8081",
            ssl_certificate_location="/nonexistent/client.pem",
            ssl_key_location="/nonexistent/client.key",
        )._ssl_context()


def test_avro_decode_batch_fast_matches_reference():
    """r14 vectorized whole-batch Avro decode: value-identical to the
    per-row reference decoder on adversarial values — int64 extremes,
    zigzag edges, NaN-in-value-branch vs null-branch, unicode/empty/long
    strings, float widening, empty batches, null input rows (fallback)."""
    import math

    import numpy as np
    import pandas as pd

    from pyspark_engine.serdes import (
        _avro_decode_batch_fast,
        _avro_decode_row,
        _avro_encode_row,
        _avro_fields,
    )

    schema = (
        '{"type":"record","name":"t","fields":['
        '{"name":"a","type":"long"},'
        '{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},'
        '{"name":"s","type":"string"},'
        '{"name":"v","type":["null","double"]},'
        '{"name":"f","type":"float"},'
        '{"name":"nb","type":["null","boolean"]},'
        '{"name":"ns","type":["null","string"]},'
        '{"name":"raw","type":"bytes"},'
        '{"name":"b","type":"boolean"}]}'
    )
    fields = _avro_fields(schema)
    rows = [
        [0, pd.Timestamp(0), "", None, 1.5, None, None, b"", True],
        [-1, pd.Timestamp(1, unit="us"), "héllo🦄", 3.14, -0.0, True, "zz", b"\x00\xff", False],
        [2**62, pd.Timestamp("2024-01-05 13:00:00"), "a\x00b", float("nan"), float("inf"), False, "", b"abc", True],
        [-(2**63), pd.Timestamp(-1, unit="us"), "x" * 500, -1e308, 3.4e38, None, "ü", bytes(range(10)), False],
    ]
    wires = [_avro_encode_row(r, fields) for r in rows]
    fast = _avro_decode_batch_fast(pd.Series(wires, dtype=object), fields)
    slow = pd.DataFrame(
        [_avro_decode_row(b, fields) for b in wires], columns=[f[0] for f in fields], dtype=object
    )

    def norm(v):
        if v is None or v is pd.NaT:
            return None
        if isinstance(v, (np.floating, float)):
            return "NaN" if math.isnan(v) else float(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.bool_):
            return bool(v)
        if isinstance(v, pd.Timestamp):
            return ("ts", v.value)
        return v

    for col in slow.columns:
        for i in range(len(rows)):
            assert norm(fast[col].iloc[i]) == norm(slow[col].iloc[i]), (col, i)
    # NaN in the VALUE branch stays NaN; the null branch is None.  The
    # encoder maps nullable-field NaN to the null branch (documented
    # caveat), so craft the value-branch-NaN wire by hand: union index 1
    # (zigzag 0x02) + IEEE NaN little-endian.
    import struct

    nan_fields = _avro_fields(
        '{"type":"record","name":"n","fields":[{"name":"v","type":["null","double"]}]}'
    )
    nan_wire = b"\x02" + struct.pack("<d", float("nan"))
    fast_nan = _avro_decode_batch_fast(pd.Series([nan_wire, b"\x00"], dtype=object), nan_fields)
    slow_nan = [_avro_decode_row(w, nan_fields)[0] for w in (nan_wire, b"\x00")]
    assert math.isnan(fast_nan["v"].iloc[0]) and math.isnan(slow_nan[0])
    assert fast_nan["v"].iloc[1] is None and slow_nan[1] is None
    assert fast["v"].iloc[0] is None
    # arrays and null input rows take the per-row fallback
    arr_fields = _avro_fields(
        '{"type":"record","name":"x","fields":[{"name":"e","type":{"type":"array","items":"float"}}]}'
    )
    assert _avro_decode_batch_fast(pd.Series([b"\x00"], dtype=object), arr_fields) is None
    assert _avro_decode_batch_fast(pd.Series([None], dtype=object), fields) is None
    assert _avro_decode_batch_fast(pd.Series([], dtype=object), fields).shape == (0, 9)


if _HAS_HYPOTHESIS:

    @settings(max_examples=150, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                _i64,
                st.text(max_size=60),
                st.one_of(st.none(), _finite_f64),
                st.booleans(),
                st.binary(max_size=40),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_avro_decode_batch_fast_property(rows):
        """Whole-batch fast decode == per-row reference decode on arbitrary
        valid wire bytes (the fast path is a pre-filterable batch rewrite,
        never a semantic change)."""
        import pandas as pd

        from pyspark_engine.serdes import (
            _avro_decode_batch_fast,
            _avro_decode_row,
            _avro_encode_row,
            _avro_fields,
        )

        f = _avro_fields(AVRO_SCHEMA)
        wires = [_avro_encode_row(list(r), f) for r in rows]
        fast = _avro_decode_batch_fast(pd.Series(wires, dtype=object), f)
        assert fast is not None
        for i, r in enumerate(rows):
            slow = _avro_decode_row(wires[i], f)
            got = [fast[c].iloc[i] for c in fast.columns]
            for g, w in zip(got, slow):
                if w is None:
                    assert g is None
                elif isinstance(w, float):
                    gv = float(g)
                    assert gv == w or (gv != gv and w != w)
                elif isinstance(w, bool):
                    assert bool(g) == w
                elif isinstance(w, int):
                    assert int(g) == w
                else:
                    assert g == w
