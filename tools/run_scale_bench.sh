#!/usr/bin/env bash
# Round-4 scale ladder on the chip (run SOLO - one chip job at a time,
# see PARITY.md "tunnel" notes): config-2/3 shape, then config-4 shape
# on one chip, then the per-component suite.  Logs land in /tmp.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== $name : $* ==="
  "$@" > "/tmp/scale_$name.out" 2>&1
  echo "rc=$?"
  grep -v WARNING "/tmp/scale_$name.out" | tail -25
}

run n64_r1024  env BENCH_BATCH=64  BENCH_RING=1024 BENCH_STAGES=1 \
    timeout 3000 python bench.py
run n256_r4096 env BENCH_BATCH=256 BENCH_RING=4096 BENCH_STAGES=1 \
    timeout 5400 python bench.py
run components env CB_RINGS=8,1024,4096 CB_DEVICE_BATCH=4096 \
    timeout 5400 python bench_components.py
