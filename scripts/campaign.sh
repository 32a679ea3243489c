#!/bin/bash
# Measurement campaign for the real chip — run the moment the tunnel is alive.
# Sequential (one TPU job at a time through the relay), each step under its
# own timeout, output captured to /tmp/campaign/. Safe to re-run; steps that
# already have an .ok marker are skipped.
set -u
cd "$(dirname "$0")/.."
OUT=${CAMPAIGN_OUT:-/tmp/campaign}
mkdir -p "$OUT"

step() { # name timeout_s command...
  local name=$1 tmo=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name (timeout ${tmo}s): $*"
  if timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"; then
    touch "$OUT/$name.ok"; echo "   ok"; tail -3 "$OUT/$name.err"
  else
    echo "   FAILED rc=$? — see $OUT/$name.{out,err}"; tail -5 "$OUT/$name.err"
  fi
}

step probe       180  python scripts/probe_tpu.py
# step() never fails the script (it records per-step status); the probe is
# the exception — a dead tunnel must abort before the long bench steps
[ -f "$OUT/probe.ok" ] || { echo "tunnel dead — aborting campaign"; exit 1; }

# headline MSM/NTT at increasing scale (bench.py prints the JSON metric line)
step bench_14    1800 python bench.py
step bench_16    2400 env BPT_BENCH_MSM_LOG2=16 python bench.py
step bench_20    4800 env BPT_BENCH_MSM_LOG2=20 BPT_BENCH_NTT_LOG2=20 BPT_BENCH_ITERS=2 python bench.py

# end-to-end prove (cold + warm) — BASELINE.md headline metric
step prove_12    3600 python scripts/bench_prove.py 12 --twice
step prove_16    5400 python scripts/bench_prove.py 16 --twice
step prove_20    9000 python scripts/bench_prove.py 20

# if 2^20 with fixed-base tables OOMs, fall back to bit-serial commits
if [ ! -f "$OUT/prove_20.ok" ]; then
  step prove_20_nofixed 9000 env BPT_MSM_FIXED=0 python scripts/bench_prove.py 20
fi

echo "== campaign done; results in $OUT"
grep -h '"metric"' "$OUT"/*.out 2>/dev/null
