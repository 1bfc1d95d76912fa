"""In-process Kafka transport stub: a file-backed single-node "broker"
exposing EXACTLY the Spark Kafka connector's DataFrame contract, so the
engine's live-Kafka path (``StreamingBuilder.kafka_stream`` →  topology →
``start_to_kafka``) can execute end-to-end where no broker or
spark-sql-kafka jar exists (VERDICT r11 task 3).

What is real vs stubbed — be precise, this is a TEST transport:

* REAL: everything above the transport.  Wire bytes (serdes.encode_kafka /
  decode_kafka run unchanged), the streaming topology, update-mode
  re-emission append semantics, per-partition monotonic offsets,
  keyed partitioning (same key → same partition, like the default
  murmur2 partitioner's contract), bounded availableNow drains,
  checkpointed resume of the consumer position (Spark's file-source log
  plays the consumer-group offset role).
* STUBBED: the broker itself.  Topics are parquet directories in the
  Kafka source column layout (key/value binary, topic, partition, offset,
  timestamp, timestampType); appends assign offsets transactionally via a
  JSON high-watermark file.  CONCURRENT PRODUCERS are serialized per topic
  with an advisory ``flock`` on ``_lock-<topic>`` (the single-node analog
  of the broker's per-partition log append — r12 verdict task 8; local
  filesystems only, flock is advisory over NFS).  No replication, no
  compaction, no consumer groups beyond Spark's own checkpoint.
  Throughput is parquet throughput.  None of this code path is the 100 TB
  story — a real deployment points the SAME builder calls at a real
  bootstrap string and the stub never loads.

Select it with a ``stub://<directory>`` bootstrap string anywhere a
bootstrap is accepted (kafka_stream / start_to_kafka /
scripts/kafka_smoke.py).  Reference scope: the consume→process→produce
loop of core/KafkaStream.cs:386-415 + RecordCollector.cs:82-120.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

STUB_PREFIX = "stub://"

# the Spark Kafka source schema (connector's fixed output layout)
WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def is_stub(bootstrap: str) -> bool:
    return isinstance(bootstrap, str) and bootstrap.startswith(STUB_PREFIX)


class KafkaStubBroker:
    """One stub 'cluster' rooted at a directory; topics are subdirs."""

    def __init__(self, root_or_bootstrap: str, n_partitions: int = 3):
        root = root_or_bootstrap
        if is_stub(root):
            root = root[len(STUB_PREFIX) :]
        if not root:
            raise ValueError("stub:// bootstrap needs a directory, e.g. stub:///tmp/kafka")
        self.root = root
        self.n_partitions = n_partitions
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------- internals

    def _dir(self, topic: str) -> str:
        if not topic or "/" in topic or "," in topic or topic.startswith("_"):
            raise ValueError(f"invalid stub topic name {topic!r}")
        d = os.path.join(self.root, topic)
        os.makedirs(d, exist_ok=True)
        return d

    def _meta_path(self, topic: str) -> str:
        return os.path.join(self.root, f"_meta-{topic}.json")

    def _topic_lock(self, topic: str):
        """Exclusive advisory lock serializing producers on one topic —
        the broker's log-append critical section.  Two unserialized
        appenders would read the same high watermark and double-issue
        offsets (the parquet-dir max() recovery only defends against a
        CRASHED append, not a CONCURRENT one)."""
        import fcntl  # noqa: PLC0415
        from contextlib import contextmanager  # noqa: PLC0415

        @contextmanager
        def _held():
            fd = os.open(os.path.join(self.root, f"_lock-{topic}"), os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return _held()

    def _read_meta(self, topic: str) -> dict:
        try:
            with open(self._meta_path(topic)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"next_offset": {str(p): 0 for p in range(self.n_partitions)}}

    def _write_meta(self, topic: str, meta: dict) -> None:
        tmp = self._meta_path(topic) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(topic))

    # ------------------------------------------------------------ produce

    def append(self, wire: DataFrame, topic: str | None = None) -> None:
        """Append producer records (columns ``key``/``value`` binary, plus
        optionally ``topic``/``timestamp``) to a topic: keyed partition
        assignment, per-partition monotonic offsets (high-watermark file —
        the transactional log-append step a real broker performs), one
        parquet append per call.  Concurrent producers are serialized by
        the per-topic ``flock`` (_topic_lock), so parallel appends get
        unique, gap-free offsets.  With no ``topic`` argument the records
        must carry a ``topic`` column (the dynamic topic-name-extractor
        path); each distinct topic gets its own append."""
        cols = wire.columns
        if topic is None:
            if "topic" not in cols:
                raise ValueError("append needs a topic argument or a 'topic' column")
            topics = [r["topic"] for r in wire.select("topic").distinct().collect()]
            for t in topics:
                self.append(wire.filter(F.col("topic") == t), t)
            return
        with self._topic_lock(topic):
            self._append_locked(wire, topic)

    def _append_locked(self, wire: DataFrame, topic: str) -> None:
        cols = wire.columns
        n = self.n_partitions
        meta = self._read_meta(topic)
        base = {int(p): int(v) for p, v in meta["next_offset"].items()}
        # the PARQUET dir is the durable offset source of truth: a crash
        # between a previous append and its meta write would otherwise
        # re-issue the same offsets (round-12 review finding) — take the
        # elementwise max of the meta cache and the actual high watermarks
        d = self._dir(topic)
        if any(f.endswith(".parquet") for f in os.listdir(d)):
            spark = wire.sparkSession
            for r in (
                spark.read.schema(WIRE_SCHEMA)
                .parquet(d)
                .groupBy("partition")
                .agg(F.max("offset").alias("mx"))
                .collect()
            ):
                p = int(r["partition"])
                base[p] = max(base.get(p, 0), int(r["mx"]) + 1)
        part = F.coalesce(F.pmod(F.xxhash64(F.col("key")), F.lit(n)), F.lit(0)).cast("int")
        ts = F.col("timestamp") if "timestamp" in cols else F.current_timestamp()
        staged = wire.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            part.alias("partition"),
            ts.cast("timestamp").alias("timestamp"),
            F.lit(0).alias("timestampType"),  # CREATE_TIME
        )
        rn = F.row_number().over(
            Window.partitionBy("partition").orderBy(F.monotonically_increasing_id())
        )
        base_map = F.create_map(*[F.lit(x) for p in range(n) for x in (p, base.get(p, 0))])
        out = staged.withColumn(
            "offset", (base_map[F.col("partition")] + rn - F.lit(1)).cast("long")
        ).select("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
        out.write.mode("append").parquet(self._dir(topic))
        tops = {
            int(r["partition"]): int(r["mx"]) + 1
            for r in out.groupBy("partition").agg(F.max("offset").alias("mx")).collect()
        }
        meta["next_offset"] = {
            str(p): max(base.get(p, 0), tops.get(p, base.get(p, 0))) for p in range(n)
        }
        self._write_meta(topic, meta)

    # ------------------------------------------------------------ consume

    def read_batch(self, spark: SparkSession, topic: str) -> DataFrame:
        d = self._dir(topic)
        if not any(f.endswith(".parquet") for f in os.listdir(d)):
            return spark.createDataFrame([], WIRE_SCHEMA)
        return spark.read.schema(WIRE_SCHEMA).parquet(d)

    def read_stream(self, spark: SparkSession, topic: str, **options) -> DataFrame:
        """Streaming read with the Kafka source's schema; Spark's file-source
        checkpoint log is the consumer-group offset store (resume skips
        consumed files exactly like committed offsets)."""
        reader = spark.readStream.schema(WIRE_SCHEMA)
        mft = options.pop("maxFilesPerTrigger", None)
        if mft is not None:
            reader = reader.option("maxFilesPerTrigger", int(mft))
        return reader.parquet(self._dir(topic))
