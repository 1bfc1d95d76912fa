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

# q90's DuckDB oracle closes the pair graph with a recursive CTE — ~6.5 min
# of DuckDB (not Spark) work at sf0.001, by far the slowest single test.
# The default tier checks q90 against an independent driver-side union-find
# instead (below); the CTE parity stays in the slow tier and in every
# check_correctness gate.
_SLOW_PARITY = {"q90_dedup_clusters"}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in sorted(QUERIES)
    ],
)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract (non-SQL-expressible op)
        return
    ddf = duck.execute(ORACLES[name]).df()
    issues = [i for i in compare(name, sdf, ddf) if not i.startswith("dtype")]
    assert not issues, f"{name}: {issues}"


def test_q90_dedup_clusters_matches_union_find(spark, duck, sf_dir):
    """Default-tier q90 reference: brute-force the 3-gram Jaccard pairs in
    plain Python (same shingle definition as the other brute-force tests:
    lowercase whitespace tokens, distinct shingles, float division) and
    close them with a union-find — independent of both Spark's min-label
    propagation and the slow-tier recursive-CTE oracle, at seconds instead
    of minutes."""
    import itertools

    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    grams = {}
    for doc_id, text in docs:
        t = text.lower().split()
        grams[doc_id] = frozenset(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )
    edges = []
    for a, b in itertools.combinations(sorted(grams), 2):
        inter = len(grams[a] & grams[b])
        union = len(grams[a] | grams[b])
        if union and inter / union >= 0.02:
            edges.append((a, b))
    nodes = {n for e in edges for n in e}  # dedup_clusters covers pair nodes only
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id per component (q90's contract)
    want = sorted((n, find(n)) for n in nodes)
    got = sorted(
        (r.doc_id, r.cluster_id)
        for r in QUERIES["q90_dedup_clusters"](spark, sf_dir).collect()
    )
    assert got == want


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "purchases"}
