"""Repo lint gates that pytest can enforce without external tools.

Round-4 verdict found a silently-shadowed test: two ``def
test_kafka_stale_offset_clamp`` in one module, where the second definition
replaces the first at import time, so the first can never run (pyflakes
F811). pyflakes isn't installed in this sandbox, so this is an AST-based
equivalent: any same-scope redefinition of a function or class in the repo's
Python files fails loudly here.
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCAN_DIRS = ["kasper_spark", "tests", "examples", "tools", "ci"]
SCAN_FILES = ["__spark_entry__.py", "bench.py"]


def _iter_py_files():
    for d in SCAN_DIRS:
        yield from sorted((REPO / d).rglob("*.py"))
    for f in SCAN_FILES:
        p = REPO / f
        if p.exists():
            yield p


def _redefinitions(tree: ast.AST, path: Path) -> list[str]:
    """Find duplicate def/class names within one lexical scope.

    Scopes considered: module body, class body, function body. Names bound
    by defs inside *different* branches of an if/try (conditional fallback
    definitions) are legitimate, so branches are treated as separate
    scopes — only straight-line duplicates (the F811 shadowing bug class)
    are flagged.
    """
    problems: list[str] = []

    def scan_body(body: list[ast.stmt], scope: str) -> None:
        seen: dict[str, int] = {}
        # Module-level UPPER_CASE constant reassignment is the same bug
        # class for data, not code: a later `_FOO = 2` silently overrides an
        # earlier `_FOO = 4` that intervening definitions captured at import
        # time while call-time readers see the new value (this exact split
        # shipped a wrong nprobe between ann_ivf_topk's oracle and its
        # Spark body before this gate caught it).
        if scope == "module":
            const_seen: dict[str, int] = {}
            for node in body:
                if isinstance(node, ast.Assign) and len(node.targets) == 1:
                    t = node.targets[0]
                    if isinstance(t, ast.Name) and t.id.upper() == t.id and len(t.id) > 1:
                        if t.id in const_seen:
                            problems.append(
                                f"{path.relative_to(REPO)}:{node.lineno}: "
                                f"module constant `{t.id}` reassigned "
                                f"(first at line {const_seen[t.id]}) — import-time "
                                f"captures and call-time reads now disagree"
                            )
                        else:
                            const_seen[t.id] = node.lineno
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                # decorated re-binds (e.g. @overload, @prop.setter) are valid
                decos = {
                    d.id if isinstance(d, ast.Name) else getattr(d, "attr", "")
                    for d in node.decorator_list
                }
                if decos & {"overload", "setter", "deleter", "getter", "register"}:
                    continue
                if node.name in seen:
                    problems.append(
                        f"{path.relative_to(REPO)}:{node.lineno}: "
                        f"`{node.name}` redefined in {scope} "
                        f"(first at line {seen[node.name]}) — earlier def can never run"
                    )
                else:
                    seen[node.name] = node.lineno
            # recurse into nested scopes / branches
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                scan_body(node.body, f"function {node.name}")
            elif isinstance(node, ast.ClassDef):
                scan_body(node.body, f"class {node.name}")
            elif isinstance(node, (ast.If, ast.Try, ast.While, ast.For, ast.With)):
                for branch in (
                    [node.body]
                    + [h.body for h in getattr(node, "handlers", [])]
                    + [getattr(node, "orelse", [])]
                    + [getattr(node, "finalbody", [])]
                ):
                    if branch:
                        scan_body(branch, scope)

    scan_body(tree.body, "module")  # type: ignore[attr-defined]
    return problems


def test_no_shadowed_definitions():
    all_problems: list[str] = []
    for path in _iter_py_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        all_problems.extend(_redefinitions(tree, path))
    assert not all_problems, "shadowed definitions (F811):\n" + "\n".join(all_problems)


def test_no_pinned_persist_in_engine_source():
    """Cache-discipline gate (VERDICT r05 #4): a pinned ``.persist()`` /
    ``.cache()`` with no ``unpersist()`` stays in the CacheManager until
    session end, so one query's intermediates bleed memory pressure into
    the next across a 169-query sweep. The engine uses eager
    ``localCheckpoint()`` instead: same materialization + reuse, but the
    blocks are released by the ContextCleaner once the result goes out of
    scope, and the lineage is actually cut. Any new pinned persist must
    come with an unpersist in the same function — or better, use
    localCheckpoint and stay off this lint's radar entirely."""
    problems: list[str] = []
    for path in sorted((REPO / "kasper_spark").rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            calls = [
                n.func.attr
                for n in ast.walk(node)
                if isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
            ]
            pinned = sum(1 for c in calls if c in ("persist", "cache"))
            released = sum(1 for c in calls if c == "unpersist")
            if pinned > released:
                problems.append(
                    f"{path.relative_to(REPO)}: function `{node.name}` pins "
                    f"{pinned} cache(s) but releases {released} — use "
                    "localCheckpoint() or pair with unpersist()"
                )
    assert not problems, "\n".join(problems)
