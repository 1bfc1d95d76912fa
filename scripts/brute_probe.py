"""Scale-dependent correctness probe for the brute-oracle query family
(r12 verdict task 7).

The 13 queries whose DuckDB oracles are O(n^2)/recursive
(q43/q44/q45/q74/q90/q108/q109/q127/q134/q140/q151/q154*) are excluded from
the rotating sf0.1 sample (close_round.SF01_SAMPLE_EXCLUDE) because their
ORACLES are intractable at 5000 docs — but q01/q152 proved scale-dependent
engine bugs exist, and this family was only ever oracle-checked at sf0.01
(500 docs).  This probe closes the gap: it hash-samples the sf0.1 corpus
down to a ~sf0.03-equivalent sub-corpus (documents: hash(doc_id)%10<3 ≈
1500 docs of the REAL sf0.1 content distribution — longer texts, the full
31-token vocabulary, the real shingle density; embeddings likewise) and
runs the full rowcount+schema+hash oracle gate on exactly this family.

The sampled corpus is NOT a synthetic mini-corpus: every sampled row is a
verbatim sf0.1 row, so content-scale effects (docs 2x longer than sf0.01,
denser buckets, bigger bands) are exercised; only the PAIR COUNT is capped
so the brute oracles stay tractable (~3x sf0.01 rows → ~9x oracle pairs).

Usage: python scripts/brute_probe.py            # writes CORRECTNESS_SF01_BRUTE.json
       BRUTE_KEEP=3 BRUTE_MOD=10 python scripts/brute_probe.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("BRUTE_SRC", "/root/testdata/sf0.1")
DEST = os.environ.get("BRUTE_DIR", "/tmp/pse-sf01-brute-corpus")
PREFIXES = [
    "q43", "q44", "q45", "q74", "q90", "q108", "q109", "q127", "q134",
    "q140", "q151", "q154",
]
SAMPLED = {"documents": "doc_id", "embeddings": "vec_id"}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_corpus() -> None:
    keep = int(os.environ.get("BRUTE_KEEP", "3"))
    mod = int(os.environ.get("BRUTE_MOD", "10"))
    shutil.rmtree(DEST, ignore_errors=True)
    os.makedirs(DEST)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        dst = f"{DEST}/{t}.parquet"
        if t in SAMPLED:
            # deterministic hash sample — stable across runs, no RNG seed to
            # disagree about between Spark and DuckDB (both read the FILE)
            con.execute(
                f"COPY (SELECT * FROM '{src}' WHERE hash({SAMPLED[t]}) % {mod} < {keep} "
                f"ORDER BY {SAMPLED[t]}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(src, dst)
    for t, k in SAMPLED.items():
        n_src = con.execute(f"SELECT count(*) FROM '{SRC}/{t}.parquet'").fetchone()[0]
        n = con.execute(f"SELECT count(*) FROM '{DEST}/{t}.parquet'").fetchone()[0]
        print(f"sampled {t}: {n_src} -> {n} rows (hash({k}) % {mod} < {keep})")


def main() -> int:
    build_corpus()
    env = dict(os.environ)
    env["CHECK_JSON_OUT"] = os.path.join(REPO, "CORRECTNESS_SF01_BRUTE.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_correctness.py"), DEST, *PREFIXES],
        cwd=REPO,
        env=env,
    )
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
