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

echo "== test suite (virtual 8-device CPU mesh, two process groups)"
# Two pytest processes, protocol-heavy modules separate from the rest:
# XLA:CPU can segfault deserializing a cached executable late in one
# long process holding many big compiled programs (the round-4 crash
# class, reproduced round 5 at tests/test_curve_ops after the batch
# modules; every module passes in a young process).  Sequential
# processes share the cache dir safely.
python -m pytest -q \
  tests/test_batch_gk.py tests/test_batch_prove.py \
  tests/test_batch_verify.py tests/test_mesh.py tests/test_mesh_ring.py \
  tests/test_pipeline_gate.py tests/test_msm_bucket.py \
  tests/test_hardened.py tests/test_golden_vectors.py
python -m pytest -q \
  --ignore=tests/test_batch_gk.py --ignore=tests/test_batch_prove.py \
  --ignore=tests/test_batch_verify.py --ignore=tests/test_mesh.py \
  --ignore=tests/test_mesh_ring.py --ignore=tests/test_pipeline_gate.py \
  --ignore=tests/test_msm_bucket.py --ignore=tests/test_hardened.py \
  --ignore=tests/test_golden_vectors.py tests/

echo "CI gate green"
