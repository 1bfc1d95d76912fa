"""Doc-anchor integrity: resolve and refresh `file.py:N (Symbol.path)` code
citations in the repo docs.

Anchor grammar (inside backticks, COVERAGE.md etc.):

    `dsl.py:109 (StreamBuilder.stream)`
    `llmops.py:84 (exact_dedup)`

The symbol in parentheses is the source of truth; the line number is a
rendered convenience.  This script re-resolves every symbol against HEAD via
``ast`` (module → class → method walk, so overloaded method names like
``KTable.filter`` vs ``KStream.filter`` resolve unambiguously) and rewrites
the line numbers in place.  ``--check`` verifies without writing and exits 1
on any drift — tests/test_doc_anchors.py runs that mode, so a code move that
stales the docs fails CI until this script is re-run.

Usage:
    python scripts/refresh_anchors.py            # rewrite docs in place
    python scripts/refresh_anchors.py --check    # verify only (exit 1 on rot)
"""

from __future__ import annotations

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["COVERAGE.md", "README.md", "RECIPES.md"]
# where a bare filename in an anchor may live, in search order
SEARCH_DIRS = ["pyspark_engine", "", "scripts", "tests"]

ANCHOR = re.compile(r"`([\w/]+\.py):(\d+) \(([\w.]+)\)`")


def resolve(file_rel: str, dotted: str) -> int:
    """Line number of ``dotted`` (Class.method / function / module var) in
    ``file_rel``; raises LookupError when absent."""
    path = None
    for d in SEARCH_DIRS:
        cand = os.path.join(REPO, d, file_rel)
        if os.path.isfile(cand):
            path = cand
            break
    if path is None:
        raise LookupError(f"file not found: {file_rel}")
    with open(path) as f:
        tree = ast.parse(f.read())
    body = tree.body
    node = None
    for part in dotted.split("."):
        node = None
        for child in body:
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if child.name == part:
                    node = child
                    break
            elif isinstance(child, ast.Assign):
                if any(isinstance(t, ast.Name) and t.id == part for t in child.targets):
                    node = child
                    break
        if node is None:
            raise LookupError(f"{dotted}: `{part}` not found in {file_rel}")
        body = node.body if isinstance(node, ast.ClassDef) else []
    return node.lineno


def process(check: bool) -> int:
    drift = 0
    unresolved = 0
    total = 0
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if not os.path.isfile(p):
            continue
        with open(p) as f:
            text = f.read()

        def sub(m: re.Match) -> str:
            nonlocal drift, unresolved, total
            total += 1
            file_rel, old, sym = m.group(1), int(m.group(2)), m.group(3)
            try:
                line = resolve(file_rel, sym)
            except LookupError as e:
                unresolved += 1
                print(f"UNRESOLVED  {doc}: {m.group(0)} — {e}")
                return m.group(0)
            if line != old:
                drift += 1
                print(f"{'STALE' if check else 'FIXED'}  {doc}: {file_rel}:{old} ({sym}) -> :{line}")
            return f"`{file_rel}:{line} ({sym})`"

        new = ANCHOR.sub(sub, text)
        if not check and new != text:
            with open(p, "w") as f:
                f.write(new)
    print(
        f"{total} anchors scanned, {drift} {'stale' if check else 'refreshed'}, "
        f"{unresolved} unresolved"
    )
    # unresolved anchors (renamed/deleted symbols) are a failure in BOTH
    # modes — a rewrite run must not report success while leaving them broken
    return 1 if (unresolved or (check and drift)) else 0


if __name__ == "__main__":
    sys.exit(process(check="--check" in sys.argv))
