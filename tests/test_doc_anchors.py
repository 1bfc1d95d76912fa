"""Doc-anchor integrity: every `file.py:N (Symbol.path)` citation in the
docs must point at the symbol's ACTUAL definition line at HEAD.  The symbol
in parentheses is the source of truth (resolved via ast, class-qualified so
`KTable.filter` vs `KStream.filter` are unambiguous); the line number is a
rendered convenience that rots when code moves — this test fails on any
drift, and `python scripts/refresh_anchors.py` repairs it mechanically.

No Spark session needed — pure text + ast."""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "refresh_anchors", os.path.join(REPO, "scripts", "refresh_anchors.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_all_doc_anchors_current():
    m = _mod()
    stale = []
    scanned = 0
    for doc in m.DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.isfile(p):
            continue
        text = open(p).read()
        for match in m.ANCHOR.finditer(text):
            scanned += 1
            file_rel, line, sym = match.group(1), int(match.group(2)), match.group(3)
            try:
                actual = m.resolve(file_rel, sym)
            except LookupError as e:
                stale.append(f"{doc}: {match.group(0)} UNRESOLVED ({e})")
                continue
            if actual != line:
                stale.append(f"{doc}: {match.group(0)} -> actual :{actual}")
    assert scanned >= 40, f"anchor scan found only {scanned} anchors — grammar regression?"
    assert not stale, (
        "stale doc anchors (run `python scripts/refresh_anchors.py`):\n" + "\n".join(stale)
    )


def test_resolver_rejects_missing_symbols():
    m = _mod()
    import pytest

    with pytest.raises(LookupError):
        m.resolve("dsl.py", "KStream.no_such_method")
    with pytest.raises(LookupError):
        m.resolve("nope_missing.py", "anything")
    # sanity: a known method resolves to a plausible def line
    assert m.resolve("dsl.py", "KTable.suppress") > 1

def test_coverage_claim_counts_match_artifacts():
    """r10 verdict item 2: numeric CLAIM-COUNTS in COVERAGE.md rot silently
    (the anchor test checks file:line pointers, not counts — r10 shipped
    with '112/117 async' and 'PLAN_AUDIT.json: 154 queries' long after both
    were wrong).  Derive every such count from its source of truth:

      * 'PLAN_AUDIT.json: N queries'       → the artifact's n_queries field
      * 'N conformance tests' / 'N/M ...'  → test functions actually defined
        in tests/test_reference_conformance.py (per mode)
      * 'SKIP-FREE' / skip-count claims    → the module's ASYNC_SKIP dict
    """
    import ast
    import json

    cov = open(os.path.join(REPO, "COVERAGE.md")).read()

    audit = json.load(open(os.path.join(REPO, "PLAN_AUDIT.json")))
    n_audit = int(audit["n_queries"])
    for m in re.finditer(r"PLAN_AUDIT\.json: (\d+) queries", cov):
        assert int(m.group(1)) == n_audit, (
            f"COVERAGE.md claims PLAN_AUDIT.json holds {m.group(1)} queries; "
            f"the artifact says {n_audit}"
        )

    conf_path = os.path.join(REPO, "tests", "test_reference_conformance.py")
    tree = ast.parse(open(conf_path).read())
    n_conf = sum(
        isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)) and n.name.startswith("test_")
        for n in ast.walk(tree)
    )
    async_skip = {}
    for n in ast.walk(tree):
        if isinstance(n, ast.AnnAssign) and getattr(n.target, "id", None) == "ASYNC_SKIP":
            async_skip = ast.literal_eval(n.value)
        elif isinstance(n, ast.Assign) and any(
            getattr(t, "id", None) == "ASYNC_SKIP" for t in n.targets
        ):
            async_skip = ast.literal_eval(n.value)

    for line in cov.splitlines():
        if "conformance" not in line.lower():
            continue
        for m in re.finditer(r"(\d+) conformance tests", line):
            assert int(m.group(1)) == n_conf, (
                f"COVERAGE.md claims {m.group(1)} conformance tests; the module "
                f"defines {n_conf}: {line[:120]}"
            )
        for m in re.finditer(r"(\d+)/(\d+) green", line):
            want = n_conf - len(async_skip)
            assert (int(m.group(1)), int(m.group(2))) == (want, n_conf), (
                f"COVERAGE.md claims {m.group(0)} on a conformance row; the module "
                f"defines {n_conf} tests with {len(async_skip)} skips: {line[:120]}"
            )
        if "SKIP-FREE" in line:
            assert async_skip == {}, (
                f"COVERAGE.md claims the conformance suite is SKIP-FREE but "
                f"ASYNC_SKIP holds {sorted(async_skip)}"
            )
