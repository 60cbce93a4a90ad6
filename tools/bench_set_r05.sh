#!/bin/bash
# Record the round-5 bench artifact set on the real chip (best-of runs are
# inside bench.py's marginal timing; the shared tunneled chip has ±30%
# process-to-process noise, so each suite is run fresh).
set -u
cd "$(dirname "$0")/.."
OUT=BENCH_R05_SET.jsonl
: > "$OUT"

run() {
  local t=$1; shift
  echo "# $*" >&2
  timeout "$t" python bench.py --json-only "$@" 2>/dev/null | tail -1 >> "$OUT"
}

run 580 --suite spmv --n 100000
run 580 --suite spmv --n 1000000
run 580 --suite general --n 100000
run 580 --suite general --n 1000000                      # uniform floor
run 580 --suite general --n 1000000 --pattern local      # pruned path
run 580 --suite block --n 100000 --nvec 8
run 580 --suite complex --n 100000
run 580 --suite auto --n 100000    # layout dispatch + RCM probe (round 5)
run 580 --suite ds64 --n 100000    # f64-class on-chip accuracy (round 5)
run 580 --suite qr --qr-n 512
run 580 --suite qr --qr-n 2048     # AED + megakernel rounds, vs host LAPACK
run 1000 --suite qr --qr-n 8192 --watchdog 950   # round-5 headline
# n=16384 measured out-of-band (full run ~45 min exceeds the set windows):
# 383 s warm on-chip vs 1118 s host LAPACK = 2.92x, err 8.3e-5 (PERF_NOTES round 5)
run 900 --suite qr_c64 --qr-n 2048 --watchdog 850  # embedded complex path
run 1100 --suite qr_c64 --qr-n 4096 --watchdog 1050  # complex 4096 (new in r5)
run 900 --suite eigvec --qr-n 4096 --watchdog 850  # device eigenpairs
run 1100 --suite eigvec --qr-n 2048 --complex --watchdog 1050  # complex eigenpairs (new in r5)
run 2800 --suite eigvec --qr-n 4096 --complex --watchdog 2700  # complex eigenpairs 4096 (r5 final)
run 1100 --suite gmres --n 4096 --watchdog 1050  # interior-shift GMRES at scale

# scaling-efficiency bound + parity lines (fake mesh / CPU)
timeout 580 env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/scaling_report.py --json-only 2>/dev/null | tail -1 >> "$OUT" || true
timeout 580 python tools/parity_report.py --out PARITY_r05.json 2>/dev/null >&2 || true
python -c "import json;d=json.load(open('PARITY_r05.json'));print(json.dumps({'metric':'parity_cases_within_reference_tolerance','value':d['within_tolerance'],'unit':'cases','vs_baseline':d['within_tolerance']/d['total']}))" >> "$OUT" || true

cat "$OUT"
