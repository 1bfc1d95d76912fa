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

All of it is JVM-side Catalyst expressions — no Python in the serde path.
Avro needs the external spark-avro package, so it is gated behind a lazy
import (not bundled with pyspark; parity with the reference's separate
Streamiz.Kafka.Net.SchemaRegistry.SerDes.Avro package).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "decode_json",
    "encode_json",
    "decode_csv",
    "encode_csv",
    "decode_avro",
    "encode_avro",
    "decode_protobuf",
    "encode_protobuf",
    "decode_primitive",
    "encode_primitive",
    "decode_kafka",
    "encode_kafka",
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
