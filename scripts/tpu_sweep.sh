#!/bin/bash
# One-shot real-TPU measurement sweep (run when the tunnel is up).
# Each step is independently logged; compilation cache persists across
# steps.  Usage: bash scripts/tpu_sweep.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_sweep}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/tmp/tpurt_jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/sweep.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? $(date +%H:%M:%S)" | tee -a "$OUT/sweep.log"
  tail -20 "$OUT/$name.log" >> "$OUT/sweep.log"
}

# 0. parity tier first (fast, validates kernels on real silicon)
run verify 3600 python bench.py --verify

# 1. headline + per-config forward/fwdbwd
run bench_c3_fwdbwd 3600 python bench.py --config 3 --res 1080x1920 --mode fwdbwd
run bench_c4_fwd    3600 python bench.py --config 4 --res 1024x1024 --mode fwd
run bench_c5_fwd    5400 python bench.py --config 5 --res 1080x1920 --mode fwd
run bench_c4_fwdbwd 3600 python bench.py --config 4 --res 1024x1024 --mode fwdbwd
run bench_c5_fwdbwd 5400 python bench.py --config 5 --res 1080x1920 --mode fwdbwd

# 2. cone-cull A/B (flag read at trace time; separate processes).
#    Default is now OFF (measured loser at production res, 2026-08-19);
#    the A/B keeps checking the ON side in case scene shapes change.
TPURT_CONE_CULL=1 run bench_c4_fwd_cone 3600 python bench.py --config 4 --res 1024x1024 --mode fwd
TPURT_CONE_CULL=1 run bench_c5_fwd_cone 5400 python bench.py --config 5 --res 1080x1920 --mode fwd

# 3. backward decomposition (scatter costs)
run ablate_bwd_c5 5400 python scripts/ablate_bwd.py --config 5
run ablate_bwd_c4 3600 python scripts/ablate_bwd.py --config 4

# 4. material / texel segsum A/Bs
TPURT_MAT_SEGSUM=0 run ablate_bwd_c5_nomatseg 5400 python scripts/ablate_bwd.py --config 5
TPURT_TEX_SEGSUM=1 run ablate_bwd_c5_texseg 5400 python scripts/ablate_bwd.py --config 5

echo "SWEEP DONE $(date)" | tee -a "$OUT/sweep.log"
