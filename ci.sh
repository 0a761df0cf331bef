#!/usr/bin/env bash
# The local CI gate (run by .github/workflows/ci.yml and by hand before a
# round snapshot).  Mirrors the reference's lint+build+test gate
# (reference .github/workflows/node.yml:13-31).  Must be run SOLO - two
# concurrent JAX processes sharing a compilation-cache dir can crash in
# the cache writer (tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")"

echo "== syntax/bytecode check"
python -m compileall -q zkecdsa_tpu tests tools bench.py bench_components.py \
  __graft_entry__.py examples

echo "== lint (ruff when available)"
if command -v ruff >/dev/null 2>&1; then
  ruff check zkecdsa_tpu tests tools bench.py bench_components.py
else
  echo "ruff not installed; skipping lint (baked-in env has no linter)"
fi

echo "== security static analysis (reference parity: node.yml:32-50/semgrep.yml)"
python tools/seccheck.py
if command -v bandit >/dev/null 2>&1; then
  bandit -q -r zkecdsa_tpu -ll
else
  echo "bandit not installed; AST gate above is the in-env scanner"
fi

echo "== native runtime builds from source (packaging gate)"
python setup.py -q build_ext --inplace >/dev/null
python - <<'PYEOF'
from zkecdsa_tpu.runtime import native
assert native.available(), "libzkruntime failed to build/load"
print("native runtime ok")
PYEOF

echo "== e2e walkthrough (host scalar path)"
PYTHONPATH=. timeout 600 python examples/usage.py >/dev/null

echo "== test suite (virtual 8-device CPU mesh)"
python -m pytest tests/ -q

echo "CI gate green"
