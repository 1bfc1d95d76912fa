"""Timestamp physical-type axis (round-3 regression guard).

The driver's testdata has shipped ``events.ts`` as parquet TIMESTAMP(NANOS)
(read via nanosAsLong as int64 nanos) and later as ``timestamp[us]`` without
tz (Spark 4 reads TIMESTAMP_NTZ); a µs UTC encoding is the third plausible
representation.  Round 3 broke on the NANOS→µs-NTZ shift: every
``unix_millis``/``unix_micros`` projection rejected NTZ.  This test
materializes the SAME events rows in all three physical encodings and
requires one windowed oracle-style query to return IDENTICAL results on
each — so the next environment/testdata representation shift fails one test
loudly instead of sixteen queries silently.  It is red if read_table's
normalization (runtime.normalize_event_time) is reverted: NTZ throws on
``unix_millis``, and bigint-nanos throws inside ``F.window``.

Reference semantics: event time is an epoch long from ITimestampExtractor
(core/Processors/ITimestampExtractor.cs:10-29) — physical-encoding agnostic
by construction.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyspark_engine import StreamBuilder, TumblingWindowOptions
from pyspark_engine.runtime import epoch_ms, epoch_us, normalize_event_time, read_table

ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "us_ntz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}

BASE = pd.Timestamp("2024-01-01 00:00:00")
BASE_EPOCH_MS = 1_704_067_200_000


def _events_pdf() -> pd.DataFrame:
    rows = [
        {
            "event_id": i,
            # µs-aligned so all three encodings hold the exact same instant
            "ts": BASE + pd.Timedelta(minutes=2 * i, microseconds=137 * i),
            "user_id": i % 3,
            "event_type": "click" if i % 2 == 0 else "view",
            "value": float(i),
            "props": "{}",
        }
        for i in range(24)
    ]
    return pd.DataFrame(rows)


def _write_events(dirpath, ts_type) -> str:
    pdf = _events_pdf()
    if ts_type.tz is not None:
        pdf = pdf.assign(ts=pdf["ts"].dt.tz_localize("UTC"))
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", ts_type),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    path = str(dirpath / "events.parquet")
    pq.write_table(table, path)
    return path


def _windowed_result(spark, sf_dir: str) -> pd.DataFrame:
    t = (
        StreamBuilder(spark, sf_dir)
        .stream("events", key="event_type", ts="ts")
        .group_by_key()
        .windowed_by(TumblingWindowOptions.of(900_000))
        .count("cnt")
    )
    out = t.df.select(
        "event_type",
        F.unix_millis("w_start").alias("w_start_ms"),
        "cnt",
    )
    return (
        out.toPandas()
        .sort_values(["event_type", "w_start_ms"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_windowed_query_per_encoding(spark, tmp_path, enc):
    """Each physical encoding runs the windowed pipeline and lands on the
    same absolute epoch grid (15-min windows from the known base instant)."""
    d = tmp_path / enc
    d.mkdir()
    _write_events(d, ENCODINGS[enc])
    got = _windowed_result(spark, str(d))
    # 24 events over 46 min → 4 windows; both types present in each window
    assert got["cnt"].sum() == 24
    assert set(got["w_start_ms"]) == {BASE_EPOCH_MS + k * 900_000 for k in range(4)}


def test_all_encodings_identical(spark, tmp_path):
    results = {}
    for enc, ts_type in ENCODINGS.items():
        d = tmp_path / enc
        d.mkdir()
        _write_events(d, ts_type)
        results[enc] = _windowed_result(spark, str(d))
    pd.testing.assert_frame_equal(results["nanos"], results["us_ntz"])
    pd.testing.assert_frame_equal(results["nanos"], results["us_utc"])


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_read_table_normalizes_to_timestamp(spark, tmp_path, enc):
    d = tmp_path / enc
    d.mkdir()
    _write_events(d, ENCODINGS[enc])
    df = read_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    first = df.orderBy("event_id").limit(1).select(
        epoch_ms("ts").alias("ms"), epoch_us("ts").alias("us")
    ).collect()[0]
    assert first["ms"] == BASE_EPOCH_MS
    assert first["us"] == BASE_EPOCH_MS * 1000


def test_epoch_helpers_accept_ntz(spark):
    """epoch_ms/epoch_us work directly on a raw NTZ column (the StoreRegistry
    / sliding_agg path does not go through read_table)."""
    df = spark.createDataFrame([(BASE.to_pydatetime(),)], "t timestamp_ntz")
    row = df.select(epoch_ms("t").alias("ms"), epoch_us(F.col("t")).alias("us")).collect()[0]
    assert row["ms"] == BASE_EPOCH_MS
    assert row["us"] == BASE_EPOCH_MS * 1000


def test_normalize_event_time_bigint_nanos(spark):
    """The legacy nanosAsLong path: int64 nanos → µs timestamp, truncating."""
    ns = BASE_EPOCH_MS * 1_000_000 + 1_999  # 1.999 µs of sub-µs noise
    df = normalize_event_time(spark.createDataFrame([(ns,)], "ts bigint"), "ts")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.select(epoch_us("ts").alias("us")).collect()[0]["us"] == BASE_EPOCH_MS * 1000 + 1
