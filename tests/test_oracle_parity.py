"""Per-operator exact-output tests, mirroring the reference's per-operator
test pattern (test/Streamiz.Kafka.Net.Tests/Processors/*.cs) with the DuckDB
oracle as the assertion — every queries() entry with an oracle must match on
row count, columns, and exact values at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from scripts.check_correctness import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract (non-SQL-expressible op)
        return
    ddf = duck.execute(ORACLES[name]).df()
    issues = [i for i in compare(name, sdf, ddf) if not i.startswith("dtype")]
    assert not issues, f"{name}: {issues}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "purchases"}
