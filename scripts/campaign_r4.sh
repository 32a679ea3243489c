#!/bin/bash
# Round-4 measurement campaign — one TPU job at a time through the relay.
# Same skeleton as campaign.sh: per-step timeout, .ok markers, resumable.
set -u
cd "$(dirname "$0")/.."
OUT=${CAMPAIGN_OUT:-/tmp/campaign_r4}
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
[ -f "$OUT/probe.ok" ] || { echo "tunnel dead — aborting campaign"; exit 1; }

# 1. end-to-end prove (VERDICT ask #1, two rounds overdue) — warm (--twice)
step prove_16    10800 python scripts/bench_prove.py 16 --twice
step prove_20    14400 python scripts/bench_prove.py 20 --twice

# 2. verify < 1s at 2^12 with the batched vpi (ask #5); also warm prove 2^12
step prove_12    3600  python scripts/bench_prove.py 12 --twice

# 3. MSM table-lookup A/B (ask #3a): gather2 vs gather1 vs onehot
step msm_lookup  3600  python scripts/bench_msm_lookup.py

# 4. Pallas fixed-base MSM via Mosaic on chip (ask #3b)
step msm_pallas  3600  env BPT_MSM=pallas-fixed python scripts/bench_msm_lookup.py gather2

# 5. Pallas sub-NTT at m=1024 A/B (ask #4)
step ntt_sub     5400  python scripts/bench_ntt_sub.py 20

# 6. headline bench + BENCH_last_tpu.json stash (ask #2)
step bench_14    3600  python bench.py

echo "== campaign_r4 done; results in $OUT"
grep -h '"metric"' "$OUT"/*.out 2>/dev/null
