#!/usr/bin/env bash
# Lint/type gate, mirroring the reference's lintrunner checks
# (/root/reference/.lintrunner.toml:41,70,100). Prefers ruff+mypy (config in
# pyproject.toml); falls back to the stdlib checker where they're missing.
set -euo pipefail
cd "$(dirname "$0")/.."

rc=0
if command -v ruff >/dev/null 2>&1; then
  ruff check . || rc=1
else
  echo "ruff not installed -> stdlib fallback"
  python -m mirror_tpu.tools.lint_fallback || rc=1
fi

if command -v mypy >/dev/null 2>&1; then
  mypy mirror_tpu || rc=1
else
  echo "mypy not installed -> skipping type check (config ready in pyproject.toml)"
fi

exit $rc
