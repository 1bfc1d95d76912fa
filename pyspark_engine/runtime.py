"""Session/runtime helpers: configuration for scale, table loading, and the
interactive-query (materialized store) surface.

The reference's runtime (threads, tasks, rebalance, changelogs —
core/KafkaStream.cs, core/Processors/StreamThread.cs) is replaced wholesale by
Spark's scheduler/shuffle/checkpointing (SURVEY §3.2, §4.2).  What remains is
configuration policy, centralized here so every entry point (driver contract,
tests, bench) runs with the same scale-oriented settings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def configure(spark: SparkSession) -> SparkSession:
    """Runtime conf applied defensively on sessions we didn't create.

    - UTC session time zone: deterministic timestamp semantics vs the oracle.
    - AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
      the 100 TB posture; harmless locally.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # split small file scans to at least the session parallelism: a single
    # parquet file must not serialize expression-heavy stages onto one task
    # (at cluster scale scans have many splits anyway, so this is a no-op)
    spark.conf.set("spark.sql.files.minPartitionNum", str(spark.sparkContext.defaultParallelism))
    # the driver testdata stores events.ts as parquet TIMESTAMP(NANOS), which
    # Spark only reads via the nanos-as-long legacy path (converted back to a
    # microsecond timestamp in read_table, truncating exactly like DuckDB)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def build_session(
    app: str = "pyspark_engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """Local session factory for tests/bench; on a real cluster the session
    comes from the environment and only ``configure`` applies.  ``ui=True``
    enables the Spark UI so its REST API can report per-query shuffle/spill
    bytes (bench.py's scale evidence)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        .getOrCreate()
    )
    return configure(spark)



def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition to session parallelism IF the plan scans
    fewer files than cores.  Parquet splits are row-group granular: a
    single-row-group file is one real task no matter how many byte-range
    splits `files.minPartitionNum` cuts, so every expression downstream of
    such a scan serializes.  The probe is ``inputFiles()`` — driver-side
    file listing on the analyzed plan, no physical planning.  At cluster
    scale a table has >> parallelism files and this is a no-op; non-file
    inputs (memory frames, post-shuffle plans) are left untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if files and len(files) < target:
        return df.repartition(target)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (µs precision, session tz
    pinned UTC by ``configure``) across every physical representation the
    testdata has shipped with:

    - parquet TIMESTAMP(NANOS) + ``nanosAsLong`` → int64 nanos: integer-divide
      (``div``, exact on int64 — a double division would lose precision above
      2^53) to microseconds and rebuild the timestamp.  DuckDB performs the
      same ns→µs truncation, so both engines see identical values.
    - parquet timestamp[us] without tz (Spark 4 reads as TIMESTAMP_NTZ): cast
      to TIMESTAMP.  With the session tz at UTC the wall-clock field values
      are reinterpreted as the same UTC instant, so this is value-preserving
      and the DuckDB oracle (which reads the same file as naive TIMESTAMP)
      agrees bit-for-bit.
    - TIMESTAMP already: no-op.

    The reference's event time is an epoch long from ITimestampExtractor
    (core/Processors/ITimestampExtractor.cs:10-29) — physical-encoding
    agnostic by construction; this helper gives the engine the same
    robustness.  Works on batch and streaming DataFrames alike."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_ms(col) -> "F.Column":
    """Epoch milliseconds of a timestamp column, NTZ-safe: ``unix_millis``
    requires TIMESTAMP, so cast first (no-op on TIMESTAMP inputs, UTC-session
    reinterpretation on TIMESTAMP_NTZ — see normalize_event_time)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def epoch_us(col) -> "F.Column":
    """Epoch microseconds of a timestamp column, NTZ-safe (see epoch_ms)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver testdata table, normalizing timestamp representation so
    downstream epoch conversions always see TIMESTAMP (see
    normalize_event_time for the three physical encodings handled)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c, dtype in df.dtypes:
        if dtype in ("bigint", "timestamp_ntz") and (c == "ts" or dtype == "timestamp_ntz"):
            df = normalize_event_time(df, c)
    return df


_STATE_STORE_PROVIDERS = {
    "memory": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


class StreamConfig:
    """The reference's StreamConfig surface (core/StreamConfig.cs) mapped to
    Spark runtime choices, so a Streamiz user's configuration carries over.

    | Reference key                    | Here                               |
    |----------------------------------|------------------------------------|
    | ApplicationId                    | app_id → appName / checkpoint root |
    | BootstrapServers                 | bootstrap → Kafka source/sink opt  |
    | ProcessingGuarantee AT_LEAST_ONCE| checkpointing (default)            |
    | ProcessingGuarantee EXACTLY_ONCE | checkpointing + idempotent sink    |
    | CommitIntervalMs (:169,1904)     | trigger processing-time interval   |
    | NumStreamThreads (:1897)         | shuffle partitions / local cores   |
    | StateDir                         | checkpoint_dir root                |
    | MaxPollRecords / BufferedRecords | maxOffsetsPerTrigger               |
    | RocksDbConfigHandler (in-mem vs  | state_store memory|rocksdb →       |
    |   RocksDB stores, core/State/    |   stateStore.providerClass         |
    |   RocksDb/RocksDbKeyValueStore)  |                                    |
    | Changelog topics (core/State/    | rocksdb_changelog → RocksDB        |
    |   Logging/*)                     |   changelog checkpointing          |
    """

    def __init__(
        self,
        app_id: str,
        bootstrap: str | None = None,
        guarantee: str = "at_least_once",
        commit_interval_ms: int | None = None,
        num_threads: int | None = None,
        state_dir: str | None = None,
        max_records_per_batch: int | None = None,
        state_store: str = "memory",
        rocksdb_changelog: bool = False,
    ):
        if guarantee not in ("at_least_once", "exactly_once"):
            raise ValueError("guarantee must be at_least_once|exactly_once")
        if state_store not in _STATE_STORE_PROVIDERS:
            raise ValueError(f"state_store must be one of {sorted(_STATE_STORE_PROVIDERS)}")
        self.app_id = app_id
        self.bootstrap = bootstrap
        self.guarantee = guarantee
        self.commit_interval_ms = commit_interval_ms
        self.num_threads = num_threads
        self.state_dir = state_dir
        self.max_records_per_batch = max_records_per_batch
        self.state_store = state_store
        self.rocksdb_changelog = rocksdb_changelog

    def apply_state_store(self, spark: SparkSession) -> SparkSession:
        """Select the streaming state-store backend, the reference's
        in-memory-vs-RocksDB store choice (core/State/Stores.cs suppliers;
        RocksDbKeyValueStore for large state).  Spark ships a RocksDB
        provider; at 100 TB state must spill off-heap, so ``rocksdb`` is the
        production posture while ``memory`` (HDFS-backed heap provider) is
        the small-state default.  ``rocksdb_changelog=True`` additionally
        enables changelog checkpointing — incremental per-batch deltas, the
        direct analog of the reference's changelog topics (core/State/
        Logging/ChangeLoggingTimestampedKeyValueBytesStore.cs) vs full
        snapshot uploads.  Providers are read from session conf when a query
        STARTS, so call this before start_* (queries already running keep
        their backend)."""
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            _STATE_STORE_PROVIDERS[self.state_store],
        )
        if self.state_store == "rocksdb":
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
                "true" if self.rocksdb_changelog else "false",
            )
        return spark

    def checkpoint(self, query_name: str) -> str:
        root = self.state_dir or "/tmp/pyspark-engine-state"
        return f"{root}/{self.app_id}/{query_name}"

    def source_options(self) -> dict[str, str]:
        opts: dict[str, str] = {}
        if self.max_records_per_batch is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_records_per_batch)
        return opts

    def writer_options(self, query_name: str) -> dict[str, str]:
        # exactly-once = checkpointed offsets + idempotent/transactional sink;
        # Spark's checkpoint covers the source side for both guarantees
        return {"checkpointLocation": self.checkpoint(query_name)}

    def trigger_kwargs(self) -> dict:
        if self.commit_interval_ms is None:
            return {}
        return {"processingTime": f"{self.commit_interval_ms} milliseconds"}

    def session(self) -> SparkSession:
        return build_session(self.app_id, cpus=self.num_threads)


class StoreRegistry:
    """Interactive-query facade: the analog of ``KafkaStream.Store(...)``
    (core/KafkaStream.cs:474-479).  Materialized KTables register temp views
    (KTable.materialize); this class is the read side."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def store(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def get(self, name: str, **key_values) -> list:
        df = self.store(name)
        for k, v in key_values.items():
            df = df.filter(df[k] == v)
        return df.collect()  # point lookup on a materialized store — driver-side by design

    def fetch_df(
        self,
        name: str,
        key_values: dict | None = None,
        t_from_ms: int | None = None,
        t_to_ms: int | None = None,
        start_col: str = "w_start",
    ) -> DataFrame:
        """Windowed-store key + time-range fetch as a DataFrame — the analog
        of ``QueryableStoreTypes.WindowStore`` range reads
        (core/State/QueryableStoreTypes.cs:24-41; IWindowStore.Fetch(key,
        from, to) returns the windows whose START time falls in [from, to]).
        Bounds are epoch millis, matching the reference's long timestamps.

        Stays a DataFrame so the range read composes (and pushes the key +
        time filters down to the materialized store's scan); ``fetch`` is
        the collect()ing convenience twin."""
        df = self.store(name)
        for k, v in (key_values or {}).items():
            df = df.filter(df[k] == v)
        start_ms = epoch_ms(start_col)
        if t_from_ms is not None:
            df = df.filter(start_ms >= F.lit(int(t_from_ms)))
        if t_to_ms is not None:
            df = df.filter(start_ms <= F.lit(int(t_to_ms)))
        return df

    def fetch(
        self,
        name: str,
        key_values: dict | None = None,
        t_from_ms: int | None = None,
        t_to_ms: int | None = None,
        start_col: str = "w_start",
    ) -> list:
        """IWindowStore.Fetch analog: windows for the key in the time range,
        ordered by window start (WindowStoreEnumerator order)."""
        return (
            self.fetch_df(name, key_values, t_from_ms, t_to_ms, start_col)
            .orderBy(F.col(start_col))
            .collect()
        )

    def find_sessions_df(
        self,
        name: str,
        key_values: dict | None = None,
        earliest_end_ms: int | None = None,
        latest_start_ms: int | None = None,
        start_col: str = "w_start",
        end_col: str = "w_end",
    ) -> DataFrame:
        """Session-store range read as a DataFrame — the Kafka Streams
        ``findSessions`` contract (sessions whose [start, end] INTERSECTS
        the query range: end >= earliest AND start <= latest).  The
        reference stubs its session store
        (core/State/IReadOnlySessionStore.cs: "NOT IMPLEMENTED FOR MOMENT");
        here session windows are first-class, so the read side is too."""
        df = self.store(name)
        for k, v in (key_values or {}).items():
            df = df.filter(df[k] == v)
        if earliest_end_ms is not None:
            df = df.filter(epoch_ms(end_col) >= F.lit(int(earliest_end_ms)))
        if latest_start_ms is not None:
            df = df.filter(epoch_ms(start_col) <= F.lit(int(latest_start_ms)))
        return df

    def find_sessions(
        self,
        name: str,
        key_values: dict | None = None,
        earliest_end_ms: int | None = None,
        latest_start_ms: int | None = None,
        start_col: str = "w_start",
        end_col: str = "w_end",
    ) -> list:
        """Collecting twin of find_sessions_df, ordered by session start."""
        return (
            self.find_sessions_df(
                name, key_values, earliest_end_ms, latest_start_ms, start_col, end_col
            )
            .orderBy(F.col(start_col))
            .collect()
        )


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: int = 256,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of (typically streaming-
    produced) small files into ~``target_mb`` output files; returns the
    output file count.  The operational cousin of the streaming sinks — a
    micro-batch file sink emits one file per trigger per partition, and at
    100 TB the resulting millions of small files dominate scan planning
    time.  Sizing is driver-side file listing only; the rewrite is one
    round-robin shuffle.  Writes to ``dst_path`` (non-destructive — callers
    swap directories after validating)."""
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(conf)
    total = fs.getContentSummary(path).getLength()
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_path)
    df.repartition(n_out).write.format(fmt).mode("overwrite").save(dst_path)
    return n_out


def write_clustered(
    df: DataFrame,
    dst_path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Cluster-on-write for scan pruning: range-partition by
    ``cluster_cols`` and sort within each output file on the same keys, so
    every parquet row group carries tight min/max statistics on those
    columns.  At 100 TB this is what turns `WHERE lang = 'en' AND source =
    'x'` from a full scan into a handful of row groups — the same effect a
    lakehouse's OPTIMIZE ZORDER targets, achieved with one range shuffle.
    Linear-order clustering (not Z-order interleaving): perfect pruning on
    the leading column(s), prefix-only on the rest — choose the column
    order by filter selectivity.  ``n_files`` defaults to the session
    parallelism; size it so files land near the row-group target."""
    if n_files is None:
        n_files = df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.format(fmt)
        .mode("overwrite")
        .save(dst_path)
    )


def write_training_shards(
    df: DataFrame,
    dst_path: str,
    id_col: str,
    n_shards: int = 1024,
    seed: int = 42,
    payload_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Materialize a deterministically shuffled training corpus as one
    ordered file per shard: llmops.shuffle_shards assigns (shard, pos),
    then each shard's rows are written in pos order under
    ``dst_path/shard=N/``.  A training job reads shards in any order and
    rows within a shard in file order — the standard sharded-dataset
    layout (WebDataset/TFRecord-style) produced with ONE shuffle.

    Hive-style ``partitionBy(shard)`` keeps shard pruning free for
    readers; ``repartition(n_shards, shard)`` + in-partition sort makes
    each output file internally ordered by pos."""
    from .llmops import shuffle_shards

    out = shuffle_shards(df, id_col, n_shards=n_shards, seed=seed,
                         payload_cols=tuple(payload_cols or ()))
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy("shard")
        .save(dst_path)
    )


def _shard_stats(df: DataFrame) -> DataFrame:
    """Per-shard (n_rows, content_sum64): order-insensitive content digest
    = Σ per-row xxhash64 over all non-shard columns, summed in decimal(38)
    space (an int64 sum overflows under ANSI) and reduced mod 2⁶¹−1."""
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.pmod(
            F.sum(
                F.xxhash64(*[c for c in df.columns if c != "shard"]).cast("decimal(38,0)")
            ),
            F.lit(2305843009213693951).cast("decimal(38,0)"),
        ).cast("long").alias("content_sum64"),
    )


def _shard_bytes(shards_path: str) -> dict[int, int]:
    """Per-shard on-disk bytes (data files only), keyed by shard id.
    Filesystem-walk based, so local/NFS paths only — on an object store the
    equivalent is a listing API call; the manifest schema is unchanged."""
    import os as _os

    sizes: dict[int, int] = {}
    for entry in _os.listdir(shards_path):
        if entry.startswith("shard="):
            sid = int(entry.split("=", 1)[1])
            d = _os.path.join(shards_path, entry)
            sizes[sid] = sum(
                _os.path.getsize(_os.path.join(d, f))
                for f in _os.listdir(d)
                if not f.startswith(("_", "."))
            )
    return sizes


def write_shard_manifest(spark, shards_path: str, fmt: str = "parquet") -> "DataFrame":
    """Write ``_MANIFEST.json`` next to a sharded dataset: one record per
    shard with row count, byte size, and an order-insensitive content
    digest (xor-free: sum of per-row xxhash64 over all columns, stable
    against file-internal ordering differences across engines/readers).

    This is the artifact a 100 TB training job validates BEFORE consuming a
    corpus copy: counts/bytes catch truncated transfers, the digest catches
    silent row corruption or a stale partial overwrite — the same role as
    a WebDataset length file or a Delta transaction log's stats, for plain
    sharded parquet.  All statistics are computed DISTRIBUTED (one scan,
    one small aggregate keyed by shard); only the n_shards summary rows
    reach the driver for the JSON write.  Returns the manifest DataFrame.
    """
    import json as _json
    import os as _os

    df = spark.read.format(fmt).load(shards_path)
    stats = _shard_stats(df).orderBy("shard")
    rows = [r.asDict() for r in stats.collect()]  # n_shards rows — bounded
    # per-shard on-disk bytes from the filesystem (catches truncated copies)
    sizes = _shard_bytes(shards_path)
    for r in rows:
        r["n_bytes"] = sizes.get(r["shard"], 0)
    manifest = {
        "n_shards": len(rows),
        "total_rows": sum(r["n_rows"] for r in rows),
        "total_bytes": sum(r["n_bytes"] for r in rows),
        "shards": rows,
    }
    with open(_os.path.join(shards_path, "_MANIFEST.json"), "w") as f:
        _json.dump(manifest, f)
    return stats


def verify_shard_manifest(spark, shards_path: str, fmt: str = "parquet") -> list[str]:
    """Re-derive the manifest statistics from the CURRENT data and return a
    list of human-readable discrepancies (empty = corpus verified).  The
    consumer-side half of write_shard_manifest — run after any copy/move."""
    import json as _json
    import os as _os

    with open(_os.path.join(shards_path, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    want = {int(r["shard"]): r for r in manifest["shards"]}
    # recompute the distributed statistics without rewriting the manifest
    df = spark.read.format(fmt).load(shards_path)
    got = {int(r.shard): r for r in _shard_stats(df).collect()}
    sizes = _shard_bytes(shards_path)
    problems: list[str] = []
    for sid, w in want.items():
        g = got.get(sid)
        if g is None:
            problems.append(f"shard {sid}: missing entirely")
            continue
        if g.n_rows != w["n_rows"]:
            problems.append(f"shard {sid}: rows {g.n_rows} != manifest {w['n_rows']}")
        if sizes.get(sid, 0) != w.get("n_bytes", sizes.get(sid, 0)):
            problems.append(
                f"shard {sid}: bytes {sizes.get(sid, 0)} != manifest {w['n_bytes']}"
            )
        if g.content_sum64 != w["content_sum64"]:
            problems.append(f"shard {sid}: content digest mismatch")
    for sid in got:
        if sid not in want:
            problems.append(f"shard {sid}: not in manifest")
    return problems
