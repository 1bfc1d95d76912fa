"""pyspark_engine — a PySpark-native engine with the query/data-processing
capabilities of Streamiz (LGouellec/kafka-stream-net).

The reference is a record-at-a-time Kafka Streams DSL in C#; this package
re-expresses its operator semantics (SURVEY.md §2) on the Spark DataFrame API
so Catalyst/Tungsten pick the physical strategy.  Batch mode (parquet sources)
is the deterministic correctness surface; streaming mode wires the same
logical operators to Structured Streaming.

Layout:
    windows.py   Tumbling/Hopping/Custom window options + JoinWindowOptions
    dsl.py       StreamBuilder, KStream, KTable, GlobalKTable, grouped/windowed
    llmops.py    LLM-data-pipeline operators (dedup, similarity, text analysis)
    runtime.py   session helpers, materialized-store registry (interactive queries)
    streaming.py Structured Streaming wiring (Kafka/file sources, parity helpers)
    testing.py   TopologyTestDriver analog (in-memory topics, no broker)
    app.py       KafkaStream lifecycle analog (state machine, listeners)
"""

from .app import State, StreamApp
from .dsl import (
    GlobalKTable,
    KGroupedStream,
    KGroupedTable,
    KStream,
    KTable,
    StreamBuilder,
    TimeWindowedKStream,
    VersionedKTable,
)
from .testing import TopologyTestDriver
from .windows import (
    CustomWindowOptions,
    HoppingWindowOptions,
    JoinWindowOptions,
    SessionWindowOptions,
    TumblingWindowOptions,
)

__all__ = [
    "StreamBuilder",
    "KStream",
    "KTable",
    "GlobalKTable",
    "VersionedKTable",
    "KGroupedStream",
    "KGroupedTable",
    "TimeWindowedKStream",
    "TumblingWindowOptions",
    "HoppingWindowOptions",
    "CustomWindowOptions",
    "SessionWindowOptions",
    "JoinWindowOptions",
    "StreamApp",
    "State",
    "TopologyTestDriver",
]
