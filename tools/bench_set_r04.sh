#!/bin/bash
# Record the round-4 bench artifact set on the real chip (best-of runs are
# inside bench.py's marginal timing; the shared tunneled chip has ±30%
# process-to-process noise, so each suite is run fresh).
set -u
cd "$(dirname "$0")/.."
OUT=BENCH_R04_SET.jsonl
: > "$OUT"

run() {
  echo "# $*" >&2
  timeout 580 python bench.py --json-only "$@" 2>/dev/null | tail -1 >> "$OUT"
}

run --suite spmv --n 100000
run --suite spmv --n 1000000
run --suite general --n 100000
run --suite general --n 1000000                      # uniform floor
run --suite general --n 1000000 --pattern local      # pruned path
run --suite block --n 100000 --nvec 8
run --suite complex --n 100000
run --suite qr --qr-n 512
run --suite qr --qr-n 2048        # AED, full-rank spectrum, vs host LAPACK
run --suite eigvec --qr-n 2048    # device-resident eigenpairs
run --suite gmres

# scaling-efficiency bound + parity lines (fake mesh / CPU; same as r03)
timeout 580 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_report.py --json-only 2>/dev/null | tail -1 >> "$OUT" || true
timeout 580 python tools/parity_report.py --json-only 2>/dev/null | tail -1 >> "$OUT" || true

cat "$OUT"
