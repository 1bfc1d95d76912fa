"""End-to-end smoke test for the Kafka path.  Two transports:

* a REAL broker (``--bootstrap host:9092`` + the spark-sql-kafka package)
  — run this on any machine with network;
* the in-process stub (``--bootstrap stub:///some/dir``) — everywhere
  else, including this sandbox: the PRODUCE/PROCESS/VERIFY steps below
  all execute for real (wire bytes, streaming topology, offset
  semantics), with only the broker replaced by a file-backed transport
  (pyspark_engine/kafka_stub.py documents exactly what is real vs
  stubbed).  tests/test_streaming.py::test_kafka_smoke_stub_end_to_end
  runs this mode in the suite.

What it exercises (the reference's whole I/O loop,
core/Processors/SourceProcessor.cs:16-49 consume→deserialize and
core/Kafka/Internal/RecordCollector.cs:82-120 serialize→produce):

  1. PRODUCE  — batch-write N JSON records (key=user id) to ``--topic-in``
               through serdes.encode_kafka (the SinkProcessor serialize step).
  2. PROCESS  — StreamingBuilder.kafka_stream(topic_in) → group_by_key()
               .count() → start_to_kafka(topic_out): live consume, the same
               DSL operators the offline tests verify, live produce.
  3. VERIFY   — batch-read topic_out, decode with serdes.decode_kafka, and
               assert the per-key counts equal the counts computed directly
               from the produced batch (latest record per key wins, since
               update-mode re-emissions append to the topic).

Usage (cluster / laptop with network):

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 \
        scripts/kafka_smoke.py --bootstrap localhost:9092

    # or let the script set spark.jars.packages itself:
    python scripts/kafka_smoke.py --bootstrap localhost:9092 \
        --package org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0

Prints one JSON line {"kafka_smoke": "PASS", ...} and exits 0 on success.
The topology/verify helpers are pure and unit-tested offline
(tests/test_streaming.py::test_kafka_smoke_helpers_offline); the Kafka-free
parts of this script are therefore covered even where no broker exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_engine import serdes
from pyspark_engine.dsl import KStream
from pyspark_engine.streaming import StreamingBuilder, start_to_kafka

VALUE_SCHEMA = "user_id long, amount double"
COUNT_SCHEMA = "cnt long"


def sample_records(spark: SparkSession, n_rows: int = 1000, n_keys: int = 37) -> DataFrame:
    """Deterministic test records: user_id cycles over n_keys, so every key's
    expected count is derivable and > 1."""
    return spark.range(n_rows).select(
        (F.col("id") % n_keys).alias("user_id"),
        (F.col("id") * F.lit(0.25)).alias("amount"),
    )


def topology(ks: KStream) -> KStream:
    """The smoke topology: per-key running count — the canonical first
    Kafka Streams program (reference README's word-count shape), over either
    a live kafka_stream or any offline KStream (how the unit test drives
    it)."""
    return ks.group_by_key().count("cnt").to_stream()


def expected_counts(records: DataFrame) -> dict[int, int]:
    """Ground truth computed directly from the produced batch."""
    rows = records.groupBy("user_id").count().collect()
    return {int(r["user_id"]): int(r["count"]) for r in rows}


def latest_counts_from_wire(decoded: DataFrame) -> dict[int, int]:
    """Per-key count from the output topic: update-mode re-emissions append,
    so the LATEST record per key (highest offset) is the final state —
    exactly how a Kafka Streams changelog topic compacts."""
    w = decoded.groupBy("key").agg(F.max_by("cnt", "offset").alias("cnt"))
    return {int(r["key"]): int(r["cnt"]) for r in w.collect()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bootstrap", required=True, help="Kafka bootstrap servers")
    ap.add_argument("--topic-in", default=f"pse-smoke-in-{uuid.uuid4().hex[:8]}")
    ap.add_argument("--topic-out", default=f"pse-smoke-out-{uuid.uuid4().hex[:8]}")
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument(
        "--package",
        default=None,
        help="Maven coordinate for spark-sql-kafka; omit when launching via "
        "spark-submit --packages",
    )
    args = ap.parse_args()

    from pyspark_engine.kafka_stub import KafkaStubBroker, is_stub

    stub = is_stub(args.bootstrap)
    b = SparkSession.builder.appName("kafka-smoke")
    if stub:
        # connectorless mode: in-process file-backed transport — see
        # pyspark_engine/kafka_stub.py for exactly what is real vs stubbed
        b = b.master(os.environ.get("KAFKA_SMOKE_MASTER", "local[8]"))
    if args.package:
        b = b.config("spark.jars.packages", args.package)
    spark = b.getOrCreate()
    broker = KafkaStubBroker(args.bootstrap) if stub else None

    t0 = time.time()
    # 1. PRODUCE (batch Kafka write through the same encode_kafka expressions)
    records = sample_records(spark, args.rows)
    want = expected_counts(records)
    wire = serdes.encode_kafka(records, key_col="user_id", value_cols=["user_id", "amount"])
    if stub:
        broker.append(wire, args.topic_in)
    else:
        (
            wire.write.format("kafka")
            .option("kafka.bootstrap.servers", args.bootstrap)
            .option("topic", args.topic_in)
            .save()
        )

    # 2. PROCESS: live consume -> DSL -> live produce (bounded drain)
    sb = StreamingBuilder(spark)
    ks = sb.kafka_stream(
        args.bootstrap, args.topic_in, VALUE_SCHEMA, key_type="long", ts_alias="ts"
    )
    counted = topology(ks)
    q = start_to_kafka(
        counted,
        args.bootstrap,
        topic=args.topic_out,
        key_col="key",
        value_cols=["cnt"],
        output_mode="update",
        available_now=True,
    )
    q.awaitTermination()

    # 3. VERIFY: read the output topic back and compare final per-key counts
    if stub:
        raw = broker.read_batch(spark, args.topic_out)
    else:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", args.bootstrap)
            .option("subscribe", args.topic_out)
            .option("startingOffsets", "earliest")
            .load()
        )
    decoded = serdes.decode_kafka(raw, COUNT_SCHEMA, key_type="long", include_meta=True)
    got = latest_counts_from_wire(decoded)
    ok = got == want
    print(
        json.dumps(
            {
                "kafka_smoke": "PASS" if ok else "FAIL",
                "keys": len(want),
                "rows": args.rows,
                "sec": round(time.time() - t0, 2),
                "topic_in": args.topic_in,
                "topic_out": args.topic_out,
                **({} if ok else {"mismatches": sum(1 for k in want if got.get(k) != want[k])}),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
