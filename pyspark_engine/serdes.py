"""Serde adapters: the analog of the reference's ISerDes surface
(core/SerDes/*.cs — StringSerDes, Int64SerDes, JsonSerDes/SchemaSerDes,
AbstractSerDes byte contracts).

The reference deserializes Kafka key/value byte arrays into typed objects at
the source and serializes back at the sink (core/Processors/SourceProcessor.cs:16-49,
core/Kafka/Internal/RecordCollector.cs:82-120).  In Spark the typed record IS
the row, so serdes collapse to column expressions applied at the edges:

  * decode: ``from_json`` / ``from_csv`` / ``from_avro`` / primitive casts on
    the Kafka ``key``/``value`` binary columns;
  * encode: ``to_json`` / ``to_csv`` / ``to_avro`` / casts building the
    ``key``/``value`` binary columns the Kafka sink expects.

JSON/CSV/primitive serdes are JVM-side Catalyst expressions — no Python in
the serde path.  Avro/Protobuf have two routes: the JVM functions need the
external spark-avro / spark-protobuf packages (gated behind lazy imports;
parity with the reference's separate Streamiz.Kafka.Net.SchemaRegistry.
SerDes.Avro/.Protobuf satellite packages), and the package-free
``encode_avro_py``/``decode_avro_py``/``encode_protobuf_py``/
``decode_protobuf_py`` codecs implement the public wire formats directly
over Arrow-batched pandas UDFs.  ``frame_confluent``/``unframe_confluent_*``
add the Schema-Registry wire framing as pure expressions, and
``InMemorySchemaRegistry`` is the client analog.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decode_json",
    "encode_json",
    "decode_csv",
    "encode_csv",
    "decode_avro",
    "encode_avro",
    "decode_avro_py",
    "encode_avro_py",
    "decode_protobuf",
    "encode_protobuf",
    "decode_protobuf_py",
    "encode_protobuf_py",
    "decode_primitive",
    "encode_primitive",
    "encode_wire",
    "decode_wire",
    "encode_value_and_timestamp",
    "decode_value_and_timestamp",
    "encode_windowed_key",
    "decode_windowed_key",
    "decode_kafka",
    "encode_kafka",
    "frame_confluent",
    "unframe_confluent_id",
    "unframe_confluent_payload",
    "InMemorySchemaRegistry",
    "HttpSchemaRegistry",
    "subject_name",
]


def decode_json(col: Column, schema: str, on_error: str = "continue") -> Column:
    """JSON bytes/string → struct (JsonSerDes analog).  ``schema`` is a DDL
    string like ``"a INT, b STRING"``.

    ``on_error`` is the DeserializationExceptionHandler analog
    (reference core/Errors/DeserializationExceptionHandler.cs: CONTINUE
    skips the poison record, FAIL stops the task): ``continue`` → malformed
    input decodes to null fields (PERMISSIVE), ``fail`` → the task errors
    (FAILFAST)."""
    modes = {"continue": "PERMISSIVE", "fail": "FAILFAST"}
    if on_error not in modes:
        raise ValueError("on_error must be continue|fail")
    return F.from_json(col.cast("string"), schema, {"mode": modes[on_error]})


def encode_json(*cols: Column) -> Column:
    """struct/columns → JSON string (single col: pass a struct)."""
    c = cols[0] if len(cols) == 1 else F.struct(*cols)
    return F.to_json(c)


def decode_csv(col: Column, schema: str) -> Column:
    return F.from_csv(col.cast("string"), F.lit(schema))


def encode_csv(col: Column) -> Column:
    return F.to_csv(col)


def decode_avro(col: Column, json_schema: str) -> Column:
    """Avro bytes → struct.  Requires the spark-avro package on the cluster
    classpath (org.apache.spark:spark-avro); raises if absent."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-avro package not on classpath") from e
    return from_avro(col, json_schema)


def encode_avro(col: Column, json_schema: str | None = None) -> Column:
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-avro package not on classpath") from e
    return to_avro(col, json_schema) if json_schema else to_avro(col)


def decode_protobuf(col: Column, message_name: str, desc_file_path: str | None = None, binary_descriptor: bytes | None = None) -> Column:
    """Protobuf bytes → struct (SchemaProtobufSerDes analog, reference
    serdes/Streamiz.Kafka.Net.SchemaRegistry.SerDes.Protobuf/
    SchemaProtobufSerDes.cs).  Requires the spark-protobuf package on the
    cluster classpath (org.apache.spark:spark-protobuf); like Avro, the
    plan is built lazily and raises only when the package is absent —
    parity with the reference shipping protobuf in a satellite package."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-protobuf package not on classpath") from e
    if binary_descriptor is not None:
        return from_protobuf(col, message_name, binaryDescriptorSet=binary_descriptor)
    return from_protobuf(col, message_name, descFilePath=desc_file_path)


def encode_protobuf(col: Column, message_name: str, desc_file_path: str | None = None, binary_descriptor: bytes | None = None) -> Column:
    try:
        from pyspark.sql.protobuf.functions import to_protobuf
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("spark-protobuf package not on classpath") from e
    if binary_descriptor is not None:
        return to_protobuf(col, message_name, binaryDescriptorSet=binary_descriptor)
    return to_protobuf(col, message_name, descFilePath=desc_file_path)


_PRIMITIVES = {"string", "bigint", "int", "long", "double", "float", "boolean"}


def decode_primitive(col: Column, dtype: str, on_error: str = "fail") -> Column:
    """UTF-8 primitive serdes (StringSerDes/Int64SerDes/... analogs): the
    Kafka wire value is the textual form of the primitive.

    ``on_error`` is the DeserializationExceptionHandler analog for the KEY
    side (core/Errors/DeserializationException.cs): ``continue`` decodes a
    poison key to NULL via try_cast — downstream null-key semantics (table
    upsert drop, grouped-agg skip, join drop) then skip the record exactly
    like the reference's CONTINUE response; ``fail`` keeps the strict ANSI
    cast, so a poison record fails the task (FAIL response)."""
    if dtype not in _PRIMITIVES:
        raise ValueError(f"unsupported primitive serde: {dtype}")
    if on_error == "continue":
        return col.cast("string").try_cast(dtype)
    return col.cast("string").cast(dtype)


def encode_primitive(col: Column) -> Column:
    return col.cast("string").cast("binary")


# --- BitConverter wire serdes ---------------------------------------------
# The reference's numeric serdes are NOT textual: Int32SerDes / Int64SerDes /
# FloatSerDes / DoubleSerDes / CharSerDes serialize via BitConverter
# (core/SerDes/Int32SerDes.cs:17 (Deserialize), core/SerDes/Int64SerDes.cs:17
# (Int64SerDes), core/SerDes/CharSerDes.cs:9 (CharSerDes)), i.e.
# little-endian fixed width (char = one UTF-16LE code unit, 2 bytes).  The
# reference's own vectors pin the layout: 100 -> {100,0,0,0}
# (test/Streamiz.Kafka.Net.Tests/Private/SerDes/Int32SerDesTests.cs:12-18),
# 'b' -> {98,0} (CharSerDesTests.cs:12-18).  int/bigint/char/string/binary
# are pure Catalyst (per-byte hex of shifted values -> unhex; UTF-16LE via
# encode/decode); float/double have no Catalyst bit-cast, so they ride an
# Arrow-batched pandas UDF (one numpy view per batch) — edge-of-plan only.
# Nulls propagate to null bytes / null values in every direction, matching
# AbstractSerDes null contracts (StringSerDesTests.cs SerializeNullData).

_WIRE_INT_WIDTH = {"int": 4, "bigint": 8}


def _wire_le_hex(v: Column, width: int) -> Column:
    """Hex string of the little-endian two's-complement layout of ``v``."""
    return F.concat(*[
        F.lpad(F.hex(F.shiftright(v, 8 * i).bitwiseAND(F.lit(255))), 2, "0")
        for i in range(width)
    ])


def encode_wire(col: Column, dtype: str) -> Column:
    """Typed column → the reference's BitConverter byte layout."""
    dtype = {"long": "bigint", "integer": "int"}.get(dtype, dtype)
    if dtype == "string":
        return col.cast("binary")
    if dtype == "binary":  # ByteArraySerDes: identity
        return col.cast("binary")
    if dtype == "char":  # BMP code unit, UTF-16LE == BitConverter.GetBytes(char)
        return F.encode(col, "UTF-16LE")
    if dtype in _WIRE_INT_WIDTH:
        return F.unhex(_wire_le_hex(col.cast("bigint"), _WIRE_INT_WIDTH[dtype]))
    if dtype in ("float", "double"):
        import numpy as np

        np_t = np.float32 if dtype == "float" else np.float64

        @F.pandas_udf("binary")
        def _enc(s: pd.Series) -> pd.Series:
            # NaN is a VALUE here (BitConverter.GetBytes(double.NaN) yields
            # real bytes; C# doubles are non-nullable so the reference has no
            # null case).  Spark NULL and NaN are indistinguishable in the
            # Arrow float lane (both arrive as NaN), so NULL coerces to NaN
            # bytes rather than NaN silently collapsing to a NULL record.
            # The REVERSE lane has the mirror limit: a pandas UDF returning
            # NaN surfaces as NULL (pyarrow from_pandas treats NaN as null),
            # so decode_wire maps NaN bytes to NULL — the NaN/NULL
            # equivalence class is the Arrow float lane's floor, and both
            # directions are pinned in the conformance test.
            arr = s.to_numpy(dtype=np_t)
            raw, w = arr.tobytes(), arr.itemsize
            return pd.Series([raw[i * w : (i + 1) * w] for i in range(len(arr))])

        return _enc(col.cast(dtype))
    raise ValueError(f"unsupported wire serde: {dtype}")


def decode_wire(col: Column, dtype: str) -> Column:
    """BitConverter bytes → typed column (inverse of :func:`encode_wire`)."""
    dtype = {"long": "bigint", "integer": "int"}.get(dtype, dtype)
    if dtype == "string":
        return col.cast("string")
    if dtype == "binary":
        return col
    if dtype == "char":
        return F.decode(col, "UTF-16LE")
    if dtype in _WIRE_INT_WIDTH:
        w = _WIRE_INT_WIDTH[dtype]
        h = F.hex(col)
        be = F.concat(*[F.substring(h, 2 * i + 1, 2) for i in reversed(range(w))])
        if dtype == "bigint":
            # negative toBase = signed 64-bit two's-complement interpretation
            return F.conv(be, 16, -10).cast("bigint")
        u = F.conv(be, 16, 10).cast("bigint")
        return F.when(u >= F.lit(1 << 31), u - F.lit(1 << 32)).otherwise(u).cast("int")
    if dtype in ("float", "double"):
        import numpy as np

        np_t = np.float32 if dtype == "float" else np.float64

        @F.pandas_udf(dtype)
        def _dec(s: pd.Series) -> pd.Series:
            return pd.Series([
                None if b is None else float(np.frombuffer(b, dtype=np_t)[0])
                for b in s
            ])

        return _dec(col)
    raise ValueError(f"unsupported wire serde: {dtype}")


def encode_value_and_timestamp(value: Column, ts: Column) -> Column:
    """Changelog envelope: LE int64 timestamp + LE int32 length + value bytes
    (core/SerDes/ValueAndTimestampSerDes.cs:48-62 (Serialize) — BinaryWriter
    is little-endian).  Null value → null record
    (ValueAndTimestampSerdesTests.cs SerializeNullData)."""
    return F.when(value.isNull(), F.lit(None).cast("binary")).otherwise(F.concat(
        encode_wire(ts, "bigint"),
        encode_wire(F.length(value), "int"),
        value,
    ))


def decode_value_and_timestamp(col: Column) -> Column:
    """Inverse of :func:`encode_value_and_timestamp`: struct(timestamp, value)
    (core/SerDes/ValueAndTimestampSerDes.cs:12-21 (Extract))."""
    ts = decode_wire(col.substr(F.lit(1), F.lit(8)), "bigint")
    ln = decode_wire(col.substr(F.lit(9), F.lit(4)), "int")
    val = col.substr(F.lit(13), ln)
    return F.when(col.isNull(), F.lit(None).cast("struct<timestamp:bigint,value:binary>")).otherwise(
        F.struct(ts.alias("timestamp"), val.alias("value")))


def encode_windowed_key(key: Column, window_start_ms: Column, seqnum: Column | int = 0) -> Column:
    """Windowed store/changelog key: inner key bytes + LE int64 window
    start + LE int32 seqnum (core/State/Helper/WindowKeyHelper.cs:67-77
    (ToStoreKeyBinary); TimeWindowedSerDes serializes with seqnum 0,
    core/SerDes/TimeWindowedSerDes.cs:33-41 (Serialize))."""
    seq = F.lit(seqnum) if isinstance(seqnum, int) else seqnum
    return F.concat(
        key,
        encode_wire(window_start_ms.cast("bigint"), "bigint"),
        encode_wire(seq.cast("int"), "int"),
    )


def decode_windowed_key(col: Column, window_size_ms: int) -> Column:
    """Inverse of :func:`encode_windowed_key` → struct(key binary,
    window_start, window_end, seqnum).  The end is start + size with the
    reference's overflow clamp to Long.MaxValue
    (core/State/Helper/WindowKeyHelper.cs:18-28 (TimeWindowForSize));
    try_add realizes the wrap-check under ANSI mode."""
    klen = F.length(col) - F.lit(12)
    start = decode_wire(col.substr(klen + 1, F.lit(8)), "bigint")
    end = F.coalesce(
        F.try_add(start, F.lit(int(window_size_ms)).cast("bigint")),
        F.lit((1 << 63) - 1).cast("bigint"),
    )
    end = F.when(end < F.lit(0), F.lit((1 << 63) - 1).cast("bigint")).otherwise(end)
    return F.struct(
        col.substr(F.lit(1), klen).alias("key"),
        start.alias("window_start"),
        end.alias("window_end"),
        decode_wire(col.substr(klen + 9, F.lit(4)), "int").alias("seqnum"),
    )


def decode_kafka(
    df: DataFrame,
    value_schema: str,
    key_type: str = "string",
    value_format: str = "json",
    ts_alias: str = "ts",
    on_error: str = "continue",
    include_headers: bool = False,
    include_meta: bool = False,
) -> DataFrame:
    """Kafka wire record → typed row: the SourceProcessor deserialize step.

    Input columns (Spark's Kafka source schema): ``key``/``value`` binary,
    ``timestamp``, ``topic``, ``partition``, ``offset``.  Output: ``key``
    (typed), the value struct's fields flattened, and the record timestamp
    (the reference's default FailOnInvalidTimestamp extractor just reads the
    broker timestamp — core/Processors/Internal/DefaultTimestampExtractor).
    ``include_meta`` keeps topic/partition/offset — the IRecordContext
    surface (core/Processors/IRecordContext.cs)."""
    if value_format in ("json", "csv"):
        # the value struct is flattened next to the decoded 'key'/ts columns —
        # a value field named like either would silently produce duplicate/
        # ambiguous columns downstream, so reject it up front
        from pyspark.sql.types import StructType

        reserved = {"key", ts_alias} | ({"headers"} if include_headers else set())
        clash = reserved.intersection(f.name for f in StructType.fromDDL(value_schema))
        if clash:
            raise ValueError(
                f"value schema field(s) {sorted(clash)} collide with the decoded "
                f"key/timestamp column names; rename the field or change ts_alias"
            )
    if value_format == "json":
        value = decode_json(F.col("value"), value_schema, on_error=on_error)
    elif value_format == "csv":
        value = decode_csv(F.col("value"), value_schema)
    elif value_format == "avro":
        value = decode_avro(F.col("value"), value_schema)
    else:
        raise ValueError(f"unsupported value format: {value_format}")
    cols = [
        decode_primitive(F.col("key"), key_type, on_error=on_error).alias("key"),
        F.col("timestamp").alias(ts_alias),
        value.alias("__v"),
    ]
    out = ["key", ts_alias, "__v.*"]
    if include_headers:
        # Kafka record headers (IRecordContext.Headers analog); requires
        # .option("includeHeaders", "true") on the Kafka source
        cols.append(F.col("headers"))
        out.append("headers")
    if include_meta:
        for m in ("topic", "partition", "offset"):
            cols.append(F.col(m))
            out.append(m)
    return df.select(*cols).select(*out)


def encode_kafka(
    df: DataFrame,
    key_col: str | Column,
    value_cols: list | None = None,
    value_format: str = "json",
    topic: str | Column | None = None,
    headers: Column | None = None,
    extra: tuple = (),
    max_bytes: int | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Typed row → Kafka wire record: the SinkProcessor serialize step
    (core/Processors/SinkProcessor.cs:34-53).

    ``topic`` may be a literal name or a per-record Column — the dynamic
    topic-name-extractor analog (IKStream.cs:90-137); Spark's Kafka sink
    honors a ``topic`` column.  ``headers`` is an optional
    ``array<struct<key string, value binary>>`` Column (the sink's headers
    column; IRecordContext.Headers analog).  ``extra`` columns are appended
    verbatim — NOT part of the producer record; used to emulate
    broker-assigned fields (timestamp/partition/offset) when driving the
    wire schema offline (the connectorless test path).

    ``max_bytes``/``on_error`` are the ProductionExceptionHandler analog
    (core/Kafka/Internal/RecordCollector.cs:122-157: a per-record produce
    error such as MsgSizeTooLarge goes to the handler, which chooses FAIL —
    stop processing — or CONTINUE — skip the record;
    core/StreamConfig.cs:1908 defaults to FAIL).  Here the broker's
    message.max.bytes check is applied at encode time against
    len(key)+len(value): ``fail`` raises on the first oversized record,
    ``continue`` drops oversized records and keeps going.  Serialization
    failures themselves (invalid casts) stay fatal under ANSI — parity with
    the reference treating Local_KeySerialization/Local_ValueSerialization
    as fatal (RecordCollector.cs:88-101)."""
    if on_error not in ("fail", "continue"):
        raise ValueError("on_error must be fail|continue")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    vals = [F.col(c) for c in value_cols] if value_cols else [F.col(c) for c in df.columns]
    if value_format == "json":
        # always a struct: a bare single column isn't a valid to_json input
        value = encode_json(F.struct(*vals)).cast("binary")
    elif value_format == "avro":
        value = encode_avro(F.struct(*vals))
    else:
        raise ValueError(f"unsupported value format: {value_format}")
    out = [encode_primitive(key).alias("key"), value.alias("value")]
    if topic is not None:
        out.append((F.lit(topic) if isinstance(topic, str) else topic).alias("topic"))
    if headers is not None:
        out.append(headers.alias("headers"))
    out.extend(extra)
    wire = df.select(*out)
    if max_bytes is not None:
        size = F.coalesce(F.length("key"), F.lit(0)) + F.coalesce(F.length("value"), F.lit(0))
        if on_error == "continue":
            wire = wire.filter(size <= max_bytes)
        else:
            err = F.concat(
                F.lit(f"record exceeds max_bytes={max_bytes} (ProductionException analog): "),
                size.cast("string"),
                F.lit(" bytes"),
            )
            wire = wire.withColumn(
                "value",
                F.when(size <= max_bytes, F.col("value")).otherwise(F.raise_error(err).cast("binary")),
            )
    return wire


# =====================================================================
# Package-free Avro/Protobuf binary codecs (*_py escape hatches)
# =====================================================================
#
# The JVM paths above (decode_avro/encode_avro, decode_protobuf/
# encode_protobuf) need external Spark packages that a connectorless
# environment cannot resolve; the reference has the same split (serdes live
# in satellite packages: serdes/Streamiz.Kafka.Net.SchemaRegistry.SerDes.
# Avro/SchemaAvroSerDes.cs, …SerDes.Protobuf/SchemaProtobufSerDes.cs).  The
# *_py codecs below implement the WIRE FORMATS themselves — Avro binary
# encoding and Protobuf wire format, both public specifications — in pure
# Python over Arrow-batched pandas UDFs, so the full serialize path is
# executable and oracle-checkable with zero external dependencies.  On a
# cluster with the Spark packages installed the JVM paths are the fast
# production route; the byte output is identical.
#
# Caveats (documented, inherent to the pandas bridge): a NULL in a nullable
# long field makes pandas hold the batch column as float64, so nullable
# longs beyond 2^53 should use the JVM path; NaN in a nullable float/double
# field is indistinguishable from null.


_AVRO_PRIMS = {"boolean", "int", "long", "float", "double", "string", "bytes",
               "timestamp-micros"}
_AVRO_ARRAY_ITEMS = {"int", "long", "float", "double"}
_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "timestamp-micros": "timestamp",
    "array:int": "array<int>",
    "array:long": "array<bigint>",
    "array:float": "array<float>",
    "array:double": "array<double>",
}


def _avro_fields(json_schema: str) -> list:
    """Parse a flat Avro record schema → [(name, prim_type, nullable)].
    Unions are restricted to ["null", T] (the nullable-field idiom).  The
    ``timestamp-micros`` logical type (a long on the wire, Avro spec logical
    types) maps to Spark TIMESTAMP — event time travels through the codec."""
    import json

    sch = json.loads(json_schema)
    if sch.get("type") != "record" or "fields" not in sch:
        raise ValueError("avro_py codecs support flat record schemas")
    out = []
    for f in sch["fields"]:
        t, nullable = f["type"], False
        if isinstance(t, list):
            if "null" not in t or len(t) != 2:
                raise ValueError(f"field {f['name']}: only [\"null\", T] unions supported")
            t = next(x for x in t if x != "null")
            nullable = True
        if isinstance(t, dict) and t.get("logicalType") == "timestamp-micros":
            t = "timestamp-micros"
        elif isinstance(t, dict) and t.get("type") == "array":
            items = t.get("items")
            if items not in _AVRO_ARRAY_ITEMS:
                raise ValueError(f"field {f['name']}: unsupported avro array items {items!r}")
            t = f"array:{items}"
        if t not in _AVRO_PRIMS and not t.startswith("array:"):
            raise ValueError(f"field {f['name']}: unsupported avro type {t!r}")
        out.append((f["name"], t, nullable))
    return out


def _varint(n: int) -> bytes:
    """Base-128 little-endian varint of a non-negative int (Avro/Protobuf
    share this primitive)."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf, i: int):
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _is_null(v) -> bool:
    import math

    return v is None or (isinstance(v, float) and math.isnan(v))


def _avro_encode_val(t: str, v) -> bytes:
    import struct

    if t in ("int", "long"):
        return _varint(_zigzag(int(v)))
    if t == "timestamp-micros":
        # pd.Timestamp (tz-naive, session-UTC) → epoch µs long on the wire
        return _varint(_zigzag(int(v.value) // 1000))
    if t.startswith("array:"):
        # Avro array: one block (zigzag count + items) + 0x00 terminator
        item_t = t.split(":", 1)[1]
        vals = list(v)
        out = bytearray(_varint(_zigzag(len(vals)))) if vals else bytearray()
        for item in vals:
            out += _avro_encode_val(item_t, item)
        out += b"\x00"
        return bytes(out)
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        bs = str(v).encode("utf-8")
        return _varint(_zigzag(len(bs))) + bs
    bs = bytes(v)  # bytes
    return _varint(_zigzag(len(bs))) + bs  # avro lengths are zigzag longs


def _avro_encode_row(vals, fields) -> bytes:
    out = bytearray()
    for v, (name, t, nullable) in zip(vals, fields):
        if nullable:
            # union index as zigzag varint: 0 = null branch, 1 = value branch
            if _is_null(v):
                out += b"\x00"
                continue
            out += b"\x02"
        elif _is_null(v):
            raise ValueError(f"null in non-nullable avro field {name!r}")
        out += _avro_encode_val(t, v)
    return bytes(out)


def _avro_decode_val(t: str, buf, i: int):
    """Decode one value of type ``t`` at offset ``i``; returns (value, i')."""
    import struct

    if t in ("int", "long"):
        n, i = _read_varint(buf, i)
        return _unzigzag(n), i
    if t == "timestamp-micros":
        n, i = _read_varint(buf, i)
        return pd.Timestamp(_unzigzag(n), unit="us"), i
    if t.startswith("array:"):
        item_t = t.split(":", 1)[1]
        arr = []
        while True:
            n, i = _read_varint(buf, i)
            count = _unzigzag(n)
            if count == 0:
                return arr, i
            if count < 0:  # spec: negative count is followed by the block byte size
                count = -count
                _, i = _read_varint(buf, i)
            for _ in range(count):
                item, i = _avro_decode_val(item_t, buf, i)
                arr.append(item)
    if t == "boolean":
        return buf[i] == 1, i + 1
    if t == "float":
        return struct.unpack("<f", bytes(buf[i : i + 4]))[0], i + 4
    if t == "double":
        return struct.unpack("<d", bytes(buf[i : i + 8]))[0], i + 8
    n, i = _read_varint(buf, i)
    ln = _unzigzag(n)
    raw = bytes(buf[i : i + ln])
    i += ln
    return (raw.decode("utf-8") if t == "string" else raw), i


def _avro_decode_row(buf, fields) -> list:
    vals, i = [], 0
    for name, t, nullable in fields:
        if nullable:
            idx, i = _read_varint(buf, i)
            if _unzigzag(idx) == 0:
                vals.append(None)
                continue
        v, i = _avro_decode_val(t, buf, i)
        vals.append(v)
    return vals


def _read_varint_vec(flat, pos, active):
    """Vectorized ``_read_varint`` across a whole batch: ``flat`` is the
    concatenated uint8 buffer, ``pos`` the per-row cursor, ``active`` the
    rows that have a varint at their cursor.  Returns (uint64 values,
    advanced cursors); inactive rows are untouched.  At most 10 gather
    passes (a 64-bit zigzag varint is ≤ 10 bytes), each ~4 numpy ops."""
    import numpy as np

    out = np.zeros(len(pos), dtype=np.uint64)
    pos = pos.copy()
    busy = active.copy()
    shift = np.uint64(0)
    for _ in range(10):
        if not busy.any():
            break
        b = flat[np.where(busy, pos, 0)].astype(np.uint64)
        out = np.where(busy, out | ((b & np.uint64(0x7F)) << shift), out)
        pos = np.where(busy, pos + 1, pos)
        busy = busy & ((b & np.uint64(0x80)) != np.uint64(0))
        shift += np.uint64(7)
    return out, pos


def _unzigzag_vec(z):
    """Vectorized ``_unzigzag``: uint64 zigzag values → int64."""
    import numpy as np

    return (z >> np.uint64(1)).astype(np.int64) ^ -(z & np.uint64(1)).astype(np.int64)


def _avro_decode_batch_fast(s: "pd.Series", fields) -> "pd.DataFrame | None":
    """Vectorized whole-batch Avro decode (guide §4.2) — the inverse of
    ``_avro_encode_batch_fast``.  All rows parse in lockstep, one field at a
    time: varints via ``_read_varint_vec`` (≤ 10 gather passes), fixed-width
    floats via one 2-D gather + ``view``, strings/bytes as slices of ONE
    contiguous buffer.  Nullable fields carry a per-row validity mask so
    null rows skip the value bytes exactly like ``_avro_decode_row``.
    Returns None when a field type has no vectorized path (arrays) or any
    input row is null — the caller falls back to the per-row reference
    decoder.  Value-identical to ``_avro_decode_row`` case by case (the
    roundtrip/wire tests pin both paths)."""
    import numpy as np

    for _, t, _ in fields:
        if t.startswith("array:"):
            return None
    if s.isna().any():
        return None
    bufs = s.tolist()
    n = len(bufs)
    # one pad byte so inactive-lane gathers at the very end stay in range
    flat = np.frombuffer(b"".join(bufs) + b"\x00", dtype=np.uint8)
    raw = flat.tobytes()
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    pos = np.zeros(n, dtype=np.int64)
    pos[1:] = np.cumsum(lens)[:-1]
    active_all = np.ones(n, dtype=bool)
    cols: dict[str, object] = {}
    for name, t, nullable in fields:
        if nullable:
            idx, pos = _read_varint_vec(flat, pos, active_all)
            valid = _unzigzag_vec(idx) != 0
        else:
            valid = active_all
        if t in ("int", "long", "timestamp-micros"):
            z, pos = _read_varint_vec(flat, pos, valid)
            vals = _unzigzag_vec(z)
            if t == "timestamp-micros":
                ts = pd.Series(pd.to_datetime(np.where(valid, vals, 0), unit="us"))
                cols[name] = ts.mask(~pd.Series(valid), pd.NaT) if nullable else ts
            elif nullable:
                obj = vals.astype(object)
                obj[~valid] = None
                cols[name] = pd.Series(obj, dtype=object)
            else:
                cols[name] = pd.Series(vals)
        elif t in ("double", "float"):
            k = 8 if t == "double" else 4
            idx2 = np.where(valid[:, None], pos[:, None] + np.arange(k), 0)
            fl = flat[idx2].copy().view("<f8" if t == "double" else "<f4").ravel()
            fl = fl.astype(np.float64)  # float widens like struct.unpack
            pos = pos + np.where(valid, k, 0)
            if nullable:
                # object column: a VALUE-branch NaN must stay NaN while the
                # null branch becomes None, exactly like the per-row path
                obj = fl.astype(object)
                obj[~valid] = None
                cols[name] = pd.Series(obj, dtype=object)
            else:
                cols[name] = pd.Series(fl)
        elif t == "boolean":
            b = flat[np.where(valid, pos, 0)] == 1
            pos = pos + np.where(valid, 1, 0)
            if nullable:
                obj = b.astype(object)
                obj[~valid] = None
                cols[name] = pd.Series(obj, dtype=object)
            else:
                cols[name] = pd.Series(b)
        else:  # string / bytes: length varint + one slice per row
            z, pos = _read_varint_vec(flat, pos, valid)
            ln = np.where(valid, _unzigzag_vec(z), 0)
            end = pos + ln
            if t == "string":
                vals_l = [
                    raw[a:b].decode("utf-8") if ok else None
                    for a, b, ok in zip(pos.tolist(), end.tolist(), valid.tolist())
                ]
            else:
                vals_l = [
                    raw[a:b] if ok else None
                    for a, b, ok in zip(pos.tolist(), end.tolist(), valid.tolist())
                ]
            pos = end
            cols[name] = pd.Series(vals_l, dtype=object)
    return pd.DataFrame(cols)


def _varint_zigzag_list(vals) -> list:
    """Vectorized zigzag+varint: int64 ndarray → list of per-value encoded
    bytes.  The byte MATRIX (n×10) is computed with ~25 numpy ops —
    identical output to ``_varint(_zigzag(v))`` per value (pinned by the
    serdes roundtrip/wire-length tests)."""
    import numpy as np

    v = vals.astype(np.int64, copy=False)
    z = ((v << 1) ^ (v >> 63)).view(np.uint64)
    lens = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        lens += (z >= np.uint64(1 << (7 * k))).astype(np.int64)
    mat = np.zeros((len(v), 10), dtype=np.uint64)
    for j in range(10):
        byte = (z >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = np.where(j < lens - 1, np.uint64(0x80), np.uint64(0))
        mat[:, j] = np.where(j < lens, byte | cont, 0)
    buf = mat.astype(np.uint8).tobytes()
    return [buf[i * 10 : i * 10 + int(lens[i])] for i in range(len(v))]


def _avro_encode_batch_fast(s: "pd.DataFrame", fields) -> "pd.Series | None":
    """Vectorized whole-batch Avro encode (guide §4.2): per field, a LIST of
    per-row byte pieces built with numpy; rows assemble with one
    ``b"".join`` per row.  Returns None when a field type has no vectorized
    path (caller falls back to the per-row reference encoder) — arrays and
    raw bytes stay on the slow path.  Byte-identical to _avro_encode_row:
    the per-type wire rules below mirror _avro_encode_val case by case."""
    import numpy as np

    n = len(s)
    piece_lists: list[list] = []
    for name, t, nullable in fields:
        col = s[name]
        if t in ("int", "long", "timestamp-micros"):
            if t == "timestamp-micros":
                arr = col.to_numpy()
                if arr.dtype.kind != "M":
                    return None
                # match int(pd.Timestamp.value) // 1000: epoch µs on the wire
                micros = arr.astype("datetime64[ns]").view(np.int64) // 1000
                isnull = np.array([v is None or v != v for v in col], dtype=bool) if nullable else None
                ints = micros
            else:
                if nullable:
                    isnull = col.isna().to_numpy()
                    ints = col.fillna(0).to_numpy(dtype=np.int64)
                else:
                    isnull = None
                    try:
                        ints = col.to_numpy(dtype=np.int64)
                    except (TypeError, ValueError):
                        return None
            payload = _varint_zigzag_list(ints)
        elif t == "double":
            fl = col.to_numpy(dtype=np.float64)
            isnull = col.isna().to_numpy() if nullable else None
            buf = fl.astype("<f8").tobytes()
            payload = [buf[i * 8 : i * 8 + 8] for i in range(n)]
        elif t == "float":
            fl = col.to_numpy(dtype=np.float64)
            isnull = col.isna().to_numpy() if nullable else None
            buf = fl.astype("<f4").tobytes()
            payload = [buf[i * 4 : i * 4 + 4] for i in range(n)]
        elif t == "boolean":
            isnull = col.isna().to_numpy() if nullable else None
            payload = [
                (b"\x00" if _is_null(v) or not v else b"\x01") for v in col
            ]
        elif t == "string":
            vals = list(col)
            isnull = None
            if nullable:
                isnull = np.array([_is_null(v) for v in vals], dtype=bool)
                raws = [b"" if null else str(v).encode("utf-8") for v, null in zip(vals, isnull)]
            else:
                raws = [str(v).encode("utf-8") for v in vals]
            prefixes = _varint_zigzag_list(
                np.array([len(r) for r in raws], dtype=np.int64)
            )
            payload = [p + r for p, r in zip(prefixes, raws)]
        else:  # arrays / bytes: no vectorized path
            return None
        if nullable:
            piece_lists.append(
                [b"\x00" if null else b"\x02" + p for p, null in zip(payload, isnull)]
            )
        else:
            if col.isna().any():
                # non-nullable null → same error as the reference encoder
                raise ValueError(f"null in non-nullable avro field {name!r}")
            piece_lists.append(payload)
    return pd.Series([b"".join(t) for t in zip(*piece_lists)], dtype=object)


def encode_avro_py(col: Column, json_schema: str) -> Column:
    """struct column → Avro binary (package-free; see module note above).
    Arrow-batched pandas UDF.  r13: batches whose field types all have a
    vectorized path (ints/longs/timestamps/doubles/strings/booleans,
    nullable or not) encode via numpy whole-batch (guide §4.2, measured
    ~2.5× on q103's encode side); other schemas take the original per-row
    reference encoder.  Both paths emit identical wire bytes."""
    from pyspark.sql.functions import pandas_udf

    fields = _avro_fields(json_schema)
    names = [f[0] for f in fields]

    @pandas_udf("binary")
    def enc(s: pd.DataFrame) -> pd.Series:
        fast = _avro_encode_batch_fast(s, fields)
        if fast is not None:
            return fast
        cols = [s[n] for n in names]
        return pd.Series(
            [_avro_encode_row(vals, fields) for vals in zip(*cols)],
            dtype=object,
        )

    return enc(col)


def decode_avro_py(col: Column, json_schema: str) -> Column:
    """Avro binary → struct column (package-free inverse of encode_avro_py).
    r14: batches whose field types all have a vectorized path decode via
    numpy whole-batch (guide §4.2 — the per-row reference decoder walked
    every varint byte-by-byte in Python and built one pd.Timestamp object
    per row; measured 6.2 s → see OPTIMIZATION_r14.md q103); arrays or
    null input rows take the original per-row decoder.  Both paths produce
    identical values."""
    from pyspark.sql.functions import pandas_udf

    fields = _avro_fields(json_schema)
    names = [f[0] for f in fields]
    ddl = ", ".join(f"{n} {_AVRO_TO_SPARK[t]}" for n, t, _ in fields)

    @pandas_udf(ddl)
    def dec(s: pd.Series) -> pd.DataFrame:
        fast = _avro_decode_batch_fast(s, fields)
        if fast is not None:
            return fast
        rows = [
            [None] * len(fields) if _is_null(b) else _avro_decode_row(b, fields)
            for b in s
        ]
        return pd.DataFrame(rows, columns=names, dtype=object)

    return dec(col)


# ---------------- Protobuf wire format ----------------

_PB_WIRE = {
    "int64": 0,
    "sint64": 0,
    "bool": 0,
    "double": 1,
    "string": 2,
    "bytes": 2,
    "float": 5,
}
# repeated scalar fields use proto3 packed encoding (wire type 2)
_PB_PACKED_ITEMS = {"int64", "sint64", "float", "double"}
_PB_TO_SPARK = {
    "repeated int64": "array<bigint>",
    "repeated sint64": "array<bigint>",
    "repeated float": "array<float>",
    "repeated double": "array<double>",
    "int64": "bigint",
    "sint64": "bigint",
    "bool": "boolean",
    "double": "double",
    "string": "string",
    "bytes": "binary",
    "float": "float",
}


def _pb_fields(message: dict) -> list:
    """Validate a descriptor-free message spec:
    {"name": ..., "fields": [{"num": 1, "name": "a", "type": "int64"}, ...]}
    (the binary-descriptor analog for the *_py path — field numbers, names,
    scalar types; all fields presence-tracked like proto3 ``optional``)."""
    out = []
    for f in message["fields"]:
        t = f["type"]
        if t.startswith("repeated "):
            if t.split(" ", 1)[1] not in _PB_PACKED_ITEMS:
                raise ValueError(f"field {f['name']}: unsupported repeated type {t!r}")
        elif t not in _PB_WIRE:
            raise ValueError(f"field {f['name']}: unsupported protobuf type {t!r}")
        out.append((int(f["num"]), f["name"], t))
    return sorted(out)


def _pb_encode_row(vals, fields) -> bytes:
    import struct

    out = bytearray()
    for v, (num, name, t) in zip(vals, fields):
        if _is_null(v):
            continue  # absent field (proto3 optional presence)
        if t.startswith("repeated "):
            items = list(v)
            if not items:
                continue  # proto3: empty repeated field is absent on the wire
            item_t = t.split(" ", 1)[1]
            payload = bytearray()
            for item in items:
                if item_t == "int64":
                    payload += _varint(int(item) & 0xFFFFFFFFFFFFFFFF)
                elif item_t == "sint64":
                    payload += _varint(_zigzag(int(item)))
                elif item_t == "double":
                    payload += struct.pack("<d", float(item))
                else:
                    payload += struct.pack("<f", float(item))
            out += _varint((num << 3) | 2) + _varint(len(payload)) + payload
            continue
        out += _varint((num << 3) | _PB_WIRE[t])
        if t == "int64":
            out += _varint(int(v) & 0xFFFFFFFFFFFFFFFF)
        elif t == "sint64":
            out += _varint(_zigzag(int(v)))
        elif t == "bool":
            out += b"\x01" if v else b"\x00"
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        else:
            bs = str(v).encode("utf-8") if t == "string" else bytes(v)
            out += _varint(len(bs)) + bs
    return bytes(out)


def _pb_decode_row(buf, by_num) -> dict:
    import struct

    vals, i = {}, 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wt = tag >> 3, tag & 7
        spec = by_num.get(num)
        if spec is None:  # unknown field: skip by wire type
            if wt == 0:
                _, i = _read_varint(buf, i)
            elif wt == 1:
                i += 8
            elif wt == 5:
                i += 4
            elif wt == 2:
                ln, i = _read_varint(buf, i)
                i += ln
            else:
                raise ValueError(f"unsupported wire type {wt}")
            continue
        name, t = spec
        if t.startswith("repeated "):
            item_t = t.split(" ", 1)[1]
            ln, i = _read_varint(buf, i)
            end = i + ln
            arr = []
            while i < end:
                if item_t == "int64":
                    n, i = _read_varint(buf, i)
                    arr.append(n - (1 << 64) if n >= 1 << 63 else n)
                elif item_t == "sint64":
                    n, i = _read_varint(buf, i)
                    arr.append(_unzigzag(n))
                elif item_t == "double":
                    arr.append(struct.unpack("<d", bytes(buf[i : i + 8]))[0])
                    i += 8
                else:
                    arr.append(struct.unpack("<f", bytes(buf[i : i + 4]))[0])
                    i += 4
            # spec: a packed field may arrive in several chunks — concatenate
            vals[name] = vals.get(name, []) + arr
            continue
        if t == "int64":
            n, i = _read_varint(buf, i)
            vals[name] = n - (1 << 64) if n >= 1 << 63 else n
        elif t == "sint64":
            n, i = _read_varint(buf, i)
            vals[name] = _unzigzag(n)
        elif t == "bool":
            n, i = _read_varint(buf, i)
            vals[name] = bool(n)
        elif t == "double":
            vals[name] = struct.unpack("<d", bytes(buf[i : i + 8]))[0]
            i += 8
        elif t == "float":
            vals[name] = struct.unpack("<f", bytes(buf[i : i + 4]))[0]
            i += 4
        else:
            ln, i = _read_varint(buf, i)
            raw = bytes(buf[i : i + ln])
            i += ln
            vals[name] = raw.decode("utf-8") if t == "string" else raw
    return vals


def encode_protobuf_py(col: Column, message: dict) -> Column:
    """struct column → Protobuf wire bytes (package-free; fields emitted in
    field-number order, nulls omitted = proto3 optional absence)."""
    from pyspark.sql.functions import pandas_udf

    fields = _pb_fields(message)
    names = [f[1] for f in fields]

    @pandas_udf("binary")
    def enc(s: pd.DataFrame) -> pd.Series:
        cols = [s[n] for n in names]
        return pd.Series(
            [_pb_encode_row(vals, fields) for vals in zip(*cols)],
            dtype=object,
        )

    return enc(col)


def decode_protobuf_py(col: Column, message: dict) -> Column:
    """Protobuf wire bytes → struct column; unknown fields skipped (forward
    compatibility), absent fields decode to null."""
    from pyspark.sql.functions import pandas_udf

    fields = _pb_fields(message)
    names = [f[1] for f in fields]
    by_num = {num: (name, t) for num, name, t in fields}
    ddl = ", ".join(f"{name} {_PB_TO_SPARK[t]}" for _, name, t in fields)

    @pandas_udf(ddl)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            vals = {} if _is_null(b) else _pb_decode_row(b, by_num)
            rows.append([vals.get(n) for n in names])
        return pd.DataFrame(rows, columns=names, dtype=object)

    return dec(col)


# ---------------- Confluent Schema-Registry wire framing ----------------


def frame_confluent(payload: Column, schema_id: int) -> Column:
    """Prepend the Confluent wire-format frame: magic byte 0x00 + 4-byte
    big-endian schema id (the framing every Schema-Registry serde writes —
    reference SchemaAvroSerDes serializes through Confluent.SchemaRegistry.
    Serdes, which produces exactly this frame).  Pure Catalyst concat."""
    header = bytes([0]) + int(schema_id).to_bytes(4, "big")
    return F.concat(F.lit(header), payload)


def unframe_confluent_id(col: Column) -> Column:
    """Schema id (int) from a Confluent-framed record — expression-only
    (hex of bytes 2-5, base-16 → base-10)."""
    return F.conv(F.hex(F.substring(col, 2, 4)), 16, 10).cast("int")


def unframe_confluent_payload(col: Column) -> Column:
    """Payload bytes after the 5-byte Confluent frame — expression-only."""
    return F.substring(col, 6, F.length(col) - F.lit(5))


class InMemorySchemaRegistry:
    """Schema-registry client analog (the reference serializes through
    Confluent's CachedSchemaRegistryClient; serdes/Streamiz.Kafka.Net.
    SchemaRegistry.SerDes.Avro/SchemaAvroSerDes.cs): subject → versions,
    canonical schema → stable id, id → schema.  In-memory and deterministic
    — the test/offline stand-in with the same register/lookup surface; a
    networked client drops in without touching the serde call sites."""

    def __init__(self):
        self._by_id: dict[int, str] = {}
        self._ids: dict[str, int] = {}
        self._subjects: dict[str, list[int]] = {}

    def register(self, subject: str, schema: str) -> int:
        sid = self._ids.get(schema)
        if sid is None:
            sid = len(self._by_id) + 1
            self._ids[schema] = sid
            self._by_id[sid] = schema
        versions = self._subjects.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid

    def by_id(self, schema_id: int) -> str:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, str]:
        sid = self._subjects[subject][-1]
        return sid, self._by_id[sid]


def subject_name(topic: str, is_key: bool = False, record_name: str | None = None, strategy: str = "topic") -> str:
    """Subject-name strategy (core/SchemaRegistryConfig.cs:8-28
    SubjectNameStrategy): ``topic`` (default) → <topic>-key|-value;
    ``record`` → the fully-qualified record name; ``topic_record`` →
    <topic>-<record>."""
    if strategy == "topic":
        return f"{topic}-key" if is_key else f"{topic}-value"
    if record_name is None:
        raise ValueError(f"subject strategy '{strategy}' needs record_name")
    if strategy == "record":
        return record_name
    if strategy == "topic_record":
        return f"{topic}-{record_name}"
    raise ValueError("strategy must be topic|record|topic_record")


class HttpSchemaRegistry:
    """Confluent Schema-Registry REST client, stdlib-only (urllib) — the
    networked realization of the reference's satellite-package serdes,
    which serialize through Confluent's CachedSchemaRegistryClient
    (serdes/Streamiz.Kafka.Net.SchemaRegistry.SerDes.Avro/
    SchemaAvroSerDes.cs; configured by core/SchemaRegistryConfig.cs:36-74
    ISchemaRegistryConfig).  Same register/by_id/latest surface as
    InMemorySchemaRegistry, so it drops into the serde call sites
    unchanged; ids and schemas are cached locally (the Cached… behavior —
    an id is immutable server-side, so a cache hit never re-fetches),
    bounded by ``max_cached_schemas`` (SchemaRegistryMaxCachedSchemas
    analog, default 1000).

    Config analogs: ``urls`` = SchemaRegistryUrl (comma list, tried in
    order per request — failover); ``timeout_ms`` =
    SchemaRegistryRequestTimeoutMs; ``auto_register`` =
    AutoRegisterSchemas (False turns ``register`` into a lookup via
    POST /subjects/{subject} and raises when the schema is unknown);
    ``basic_auth`` = BasicAuthUserInfo ("user:pass").  TLS pass-through
    mirrors the reference's client Ssl* surface (core/StreamConfig.cs:611
    SslCaLocation and siblings SslCertificateLocation/SslKeyLocation/
    SslKeyPassword/EnableSslCertificateVerification, which Confluent's
    registry client shares): ``ssl_ca_location`` pins the trust bundle,
    certificate+key configure mutual TLS, and
    ``enable_ssl_certificate_verification=False`` maps to CERT_NONE — the
    context is built once and only handed to HTTPS endpoints.  Offline use
    is the in-memory registry; a dead endpoint raises ConnectionError with
    the failing URL rather than an opaque socket trace."""

    def __init__(
        self,
        urls: str,
        timeout_ms: int = 30_000,
        max_cached_schemas: int = 1000,
        auto_register: bool = True,
        basic_auth: str | None = None,
        schema_type: str = "AVRO",
        ssl_ca_location: str | None = None,
        ssl_certificate_location: str | None = None,
        ssl_key_location: str | None = None,
        ssl_key_password: str | None = None,
        enable_ssl_certificate_verification: bool = True,
    ):
        self._urls = [u.strip().rstrip("/") for u in urls.split(",") if u.strip()]
        if not self._urls:
            raise ValueError("SchemaRegistryUrl must name at least one endpoint")
        self._timeout = timeout_ms / 1000.0
        self._max = int(max_cached_schemas)
        self._auto = bool(auto_register)
        self._auth = basic_auth
        self._type = schema_type
        self._ssl = {
            "ca": ssl_ca_location,
            "cert": ssl_certificate_location,
            "key": ssl_key_location,
            "key_password": ssl_key_password,
            "verify": bool(enable_ssl_certificate_verification),
        }
        self._ssl_ctx = None
        self._by_id: dict[int, str] = {}
        self._ids: dict[tuple[str, str], int] = {}  # (subject, schema) -> id

    def _ssl_context(self):
        """ssl.SSLContext from the Ssl* analogs — built once, HTTPS only."""
        import ssl

        if self._ssl_ctx is None:
            ctx = ssl.create_default_context(cafile=self._ssl["ca"])
            if not self._ssl["verify"]:
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            if self._ssl["cert"]:
                ctx.load_cert_chain(
                    self._ssl["cert"], self._ssl["key"], self._ssl["key_password"]
                )
            self._ssl_ctx = ctx
        return self._ssl_ctx

    # ---- transport ----

    def _request(self, method: str, path: str, body: dict | None = None) -> dict:
        import base64
        import json
        import urllib.error
        import urllib.request

        data = json.dumps(body).encode() if body is not None else None
        last: Exception | None = None
        for base in self._urls:
            req = urllib.request.Request(base + path, data=data, method=method)
            req.add_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            if self._auth:
                tok = base64.b64encode(self._auth.encode()).decode()
                req.add_header("Authorization", f"Basic {tok}")
            kw = {"timeout": self._timeout}
            if base.startswith("https://"):
                kw["context"] = self._ssl_context()
            try:
                with urllib.request.urlopen(req, **kw) as resp:
                    return json.loads(resp.read().decode())
            except urllib.error.HTTPError as e:  # registry answered: no failover
                detail = e.read().decode(errors="replace")[:200]
                raise ConnectionError(
                    f"schema registry {base}{path} -> HTTP {e.code}: {detail}"
                ) from None
            except Exception as e:  # unreachable endpoint: try the next URL
                last = e
        raise ConnectionError(
            f"no schema-registry endpoint reachable among {self._urls} "
            f"(SchemaRegistryUrl analog): {last}"
        ) from last

    # ---- InMemorySchemaRegistry surface ----

    def _bound(self, cache: dict) -> None:
        while len(cache) > self._max:  # FIFO eviction, the cache is a bound not an oracle
            cache.pop(next(iter(cache)))

    def register(self, subject: str, schema: str) -> int:
        key = (subject, schema)
        sid = self._ids.get(key)
        if sid is not None:
            return sid
        path = f"/subjects/{subject}" + ("/versions" if self._auto else "")
        out = self._request("POST", path, {"schema": schema, "schemaType": self._type})
        sid = int(out["id"])
        self._ids[key] = sid
        self._by_id.setdefault(sid, out.get("schema", schema))
        self._bound(self._ids)
        self._bound(self._by_id)
        return sid

    def by_id(self, schema_id: int) -> str:
        hit = self._by_id.get(schema_id)
        if hit is not None:
            return hit
        out = self._request("GET", f"/schemas/ids/{int(schema_id)}")
        schema = out["schema"]
        self._by_id[schema_id] = schema
        self._bound(self._by_id)
        return schema

    def latest(self, subject: str) -> tuple[int, str]:
        out = self._request("GET", f"/subjects/{subject}/versions/latest")
        sid, schema = int(out["id"]), out["schema"]
        self._by_id.setdefault(sid, schema)
        self._bound(self._by_id)
        return sid, schema


# ---------------------------------------------------------------- WARC codec

def encode_warc(uri: Column, payload: Column, record_id: Column) -> Column:
    """Build a WARC/1.0-style response record (the Common Crawl container
    format — the canonical 100 TB LLM-pretraining input) as one string
    column: version line, headers (WARC-Type, WARC-Record-ID,
    WARC-Target-URI, Content-Length in OCTETS of the payload), blank line,
    payload, record terminator.  Pure Catalyst concat — the writer side of
    a crawl-ingest pipeline, and the synthesis side of the round-trip
    oracle (like encode_avro_py / encode_protobuf_py)."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:"),
        record_id.cast("string"),
        F.lit(">\r\nWARC-Target-URI: "),
        uri,
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )


def decode_warc(rec: Column) -> Column:
    """Parse a WARC-style record into struct(record_id, uri, content_length,
    payload, ok) with pure expressions: header fields by anchored
    regexp_extract, payload as everything between the first blank line and
    the record terminator ((?s) DOTALL — greedy, so interior blank lines
    stay inside the payload), ``ok`` = declared Content-Length matches the
    parsed payload's octet length (the standard ingest sanity filter —
    truncated records fail it and are dropped, not crashed on).

    Scale: a narrow map over the scan — each record parses independently,
    no shuffle; RE2-safe patterns (no backtracking blowup on adversarial
    crawl bytes)."""
    payload = F.regexp_extract(rec, r"(?s)\r\n\r\n(.*)\r\n\r\n$", 1)
    length = F.nullif(F.regexp_extract(rec, r"Content-Length: ([0-9]+)", 1), F.lit("")).cast(
        "long"
    )
    return F.struct(
        F.regexp_extract(rec, r"WARC-Record-ID: <urn:uuid:([^>]*)>", 1).alias("record_id"),
        F.regexp_extract(rec, r"WARC-Target-URI: ([^\r\n]*)", 1).alias("uri"),
        length.alias("content_length"),
        payload.alias("payload"),
        (F.octet_length(payload) == length).alias("ok"),
    )


def gzip_members(col: Column) -> Column:
    """string → one complete gzip MEMBER per record, stdlib only.  This is
    the ``.warc.gz`` convention (the format Common Crawl actually ships):
    every WARC record is compressed as its OWN gzip member and the members
    are simply concatenated, so a reader can split a crawl file at member
    boundaries without decompressing the whole thing.  ``mtime=0`` keeps
    the member bytes deterministic (the gzip header embeds a timestamp).
    Arrow-batched pandas UDF; per-record DEFLATE has no Catalyst
    expression, same honest floor as the PNG IDAT."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gz(s: pd.Series) -> pd.Series:
        import gzip

        return pd.Series(
            [
                gzip.compress(v.encode() if isinstance(v, str) else bytes(v), mtime=0)
                for v in s
            ],
            dtype=object,
        )

    return gz(col)


def split_gzip_members(col: Column) -> Column:
    """Multi-member gzip blob → array<string> of decompressed members — the
    reader half of the ``.warc.gz`` convention: walk the blob with
    ``zlib.decompressobj(wbits=31)``, one member per iteration via
    ``unused_data``.  Each member's CRC32 and ISIZE trailer are verified by
    zlib itself (an independent implementation of the wire format), and a
    truncated trailing member raises rather than yielding a silent partial
    record."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def split(s: pd.Series) -> pd.Series:
        import zlib

        out = []
        for blob in s:
            rest = bytes(blob)
            members = []
            while rest:
                d = zlib.decompressobj(wbits=31)
                data = d.decompress(rest)
                if not d.eof:
                    raise ValueError("truncated gzip member in .warc.gz blob")
                members.append(data.decode())
                rest = d.unused_data
            out.append(members)
        return pd.Series(out, dtype=object)

    return split(col)
