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

# 0. parity tier first (fast, validates kernels on real silicon; 13 cases
#    incl. four kernel-equivalence checks and two central-FD anchors)
run verify 3600 python bench.py --verify

# 1. headline + per-config forward/fwdbwd (fwdbwd also reports
#    gradient-rays/s and the fwd-alone split)
run bench_c3_fwdbwd 3600 python bench.py --config 3 --res 1080x1920 --mode fwdbwd
run bench_c4_fwd    3600 python bench.py --config 4 --res 1024x1024 --mode fwd
run bench_c5_fwd    5400 python bench.py --config 5 --res 1080x1920 --mode fwd
run bench_c4_fwdbwd 3600 python bench.py --config 4 --res 1024x1024 --mode fwdbwd
run bench_c5_fwdbwd 5400 python bench.py --config 5 --res 1080x1920 --mode fwdbwd
run bench_c3_fwd    3600 python bench.py --config 3 --res 1080x1920 --mode fwd
run bench_c2_fwdbwd 3600 python bench.py --config 2 --res 512x512 --mode fwdbwd
# ring n=1 smoke: the >HBM path on silicon (overhead vs replicated row)
run bench_c4_ring1  3600 python bench.py --config 4 --res 1024x1024 --mode fwd --scene-shard 1

# 2. decompositions (real records / per-stage)
run ablate_c4        3600 python scripts/ablate_c4.py
run ablate_c5        5400 python scripts/ablate_c5.py
run ablate_shadow    5400 python scripts/ablate_shadow.py
run ablate_bwd_real_c5 5400 python scripts/ablate_bwd_real.py --config 5
run ablate_p1        3600 python scripts/ablate_p1.py
run roofline_c4      3600 python scripts/roofline_report.py

# 3. A/B flags worth re-checking when scene shapes change (all measured
#    neutral-or-worse at the current defaults — see docs/design.md):
#    TPURT_RAYS (1024*/2048/4096), TPURT_NCH, TPURT_NCH_SHADOW,
#    TPURT_SHADE_COMPACT (auto*), TPURT_SHADE_CHUNKS (32*),
#    TPURT_PACK_DIRECT (auto*), TPURT_CONE_CULL (0*), TPURT_NBLK (8*),
#    TPURT_P1_RAYS / TPURT_P1_RAYS_BWD, TPURT_SHADOW_REBIN_MIN_CLUSTERS,
#    and the r5 set: TPURT_P1_HAND (1*), TPURT_P1_HAND_SKIP (1*),
#    TPURT_VTAB_SEGSUM (auto*), TPURT_MAT_SEGSUM/TPURT_TEX_SEGSUM (1*),
#    TPURT_SPAN (1*), TPURT_PRESTACK (0*), TPURT_SHADOW_UNROLL (0*),
#    TPURT_SHADE_REMAT (see design.md for each flag's measured history).
TPURT_SHADE_COMPACT=0 run bench_c5_fwdbwd_nocompact 5400 python bench.py --config 5 --res 1080x1920 --mode fwdbwd
TPURT_CONE_CULL=1 run bench_c5_fwd_cone 5400 python bench.py --config 5 --res 1080x1920 --mode fwd

echo "SWEEP DONE $(date)" | tee -a "$OUT/sweep.log"
