#!/usr/bin/env bash
# Lint + typecheck + test entry point (reference parity: ruff/mypy policy in
# pyproject.toml). Uses ruff/mypy when installed; otherwise falls back to the
# in-repo AST linter and a bytecode compile pass.
set -uo pipefail
cd "$(dirname "$0")/.."

rc=0

if command -v ruff >/dev/null 2>&1; then
  echo "== ruff =="
  ruff check parcels_tpu tests scripts bench.py __graft_entry__.py || rc=1
else
  echo "== lint_ast (ruff not installed) =="
  python scripts/lint_ast.py || rc=1
fi

echo "== compileall =="
python -m compileall -q parcels_tpu tests scripts bench.py __graft_entry__.py || rc=1

if command -v mypy >/dev/null 2>&1; then
  echo "== mypy =="
  mypy || rc=1
else
  echo "== mypy skipped (not installed; config in pyproject [tool.mypy]) =="
fi

if [ "${1:-}" != "--no-tests" ]; then
  echo "== pytest =="
  python -m pytest tests/ -q || rc=1
fi

exit $rc
