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
