"""Streaming cluster-traversal megakernel: the scalable-scene hit-finder.

TPU-native replacement for the reference's per-thread BVH traversal
(SURVEY.md §2 row R4, §7 "divergent BVH traversal on a vector machine"):
instead of per-lane stacks and pointer chasing, each 1024-ray tile

1. CULLS clusters with a conservative interval slab test — the tile's ray
   bundle is reduced to per-axis origin/direction intervals (cross-lane min/
   max), and all cluster AABBs are tested at once, vectorized with clusters
   in lanes.  False positives cost bandwidth, never correctness
   (tests/test_accel.py pins the correctness condition).
2. COMPACTS the survivor mask into an SMEM index list with a scalar loop
   (the mask vector is DMA'd VMEM→SMEM first; Mosaic cannot read vector
   lanes at dynamic indices).
3. STREAMS only surviving cluster blocks HBM→VMEM with double-buffered
   async DMA, intersecting each on the MXU (pack.py Baldwin–Weber forms)
   and folding per-ray bests — masked vector work, no divergence anywhere.

The kernel outputs only integer topology — winning primitive id per bounce
and a shadow-occlusion bitmask — consumed by the differentiable deferred
shading pass (tpurt/shading/deferred.py).  Whitted recursion (reflection
rays) runs inside the kernel so each bounce's ray set exists only in
registers/VMEM.

VMEM: per-tile live set ≈ 4 MB (dominated by the (768, R) form product);
SMEM: survivor list + mask ≈ 8 KB per 1024 clusters.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt import constants as C
from tpurt.kernels import pack as PK
from tpurt.kernels import packc as PC
from tpurt.kernels.megakernel import (
    _add3,
    _dot3,
    _neg3,
    _normalize3,
    _reflect3,
    _scale3,
    _sub3,
    _where3,
)
from tpurt.kernels.packc import LANES, TROWS, PackedClusters

#: rays per kernel tile (A/B constant, read at import).  The r2 roofline
#: re-read (docs/design.md) showed the kernel LATENCY-bound at ~27 µs/tile
#: of pass setup + DMA issue + scalar compaction — essentially ALL of the
#: b0 time at 3.5 survivors/tile — so fatter tiles amortize the fixed cost
#: near-linearly as long as the wider frustum doesn't blow up survivors
#: (measure via traversal_stats before trusting a new size).
RAYS = int(os.environ.get("TPURT_RAYS", "1024"))
assert RAYS in (1024, 2048, 4096), RAYS
#: rays per compute sub-chunk: surviving clusters are intersected per chunk,
#: gated by the chunk's own cull bit — sub-tile culling w/o extra DMA.
#: Chunk GRANULARITY is held at 256 rays as RAYS scales (the measured
#: optimum at 1024: NCH=8 i.e. 128-ray chunks was SLOWER for pixel/bounce
#: tiles — cfg4 26.9→23.1, cfg5 6.9→6.8 — because sub-cones of a coherent
#: tile still cull the same clusters; see docs/design.md).  The SHADOW
#: kernel (mode 2) holds 128-ray chunks (NCH_SHADOW=8 at 1024): its chunks
#: are disjoint Morton sub-cells, whose light cones genuinely differ, so
#: finer bits thin the streamed compute.  Both capped at 16 chunk bits
#: (int32 bit ops in the saturation mask).
NCH = int(os.environ.get("TPURT_NCH", str(min(RAYS // 256, 16))))
#: SHADOW-pass tile width (mode 2 only): smaller Morton cells make
#: tighter light cones (fewer streamed survivors per pass) at the price
#: of more passes (~9 µs launch floor each).  Must divide RAYS (the
#: wavefront driver pads hit buffers to RAYS multiples).  A/B knob —
#: 1024 (= RAYS) is the measured default.
RAYS_SHADOW = int(os.environ.get("TPURT_RAYS_SHADOW", str(RAYS)))
assert RAYS % RAYS_SHADOW == 0 and RAYS_SHADOW >= 256, RAYS_SHADOW
NCH_SHADOW = int(os.environ.get("TPURT_NCH_SHADOW",
                                str(min(RAYS_SHADOW // 128, 16))))
assert RAYS % NCH == 0 and RAYS_SHADOW % NCH_SHADOW == 0
assert NCH <= 16 and NCH_SHADOW <= 16  # int32 bit ops in saturation masks
#: cluster count above which the wavefront path traces shadows in the
#: re-binned shadow kernel (measured crossover — see _wavefront_records)
SHADOW_REBIN_MIN_CLUSTERS = int(
    os.environ.get("TPURT_SHADOW_REBIN_MIN_CLUSTERS", "2048"))
#: shadow-pass survivor emission order: True streams far-from-light (=
#: near-the-surface) clusters first — contact geometry is the likeliest
#: occluder, so per-chunk saturation exits earlier (A/B constant)
SHADOW_NEAR_FIRST = True
#: square pixel-tile geometry: RAYS = TILE_H × TILE_W.  Square tiles keep
#: each tile's ray bundle a narrow frustum, which is what makes the
#: conservative interval cull selective — a full-image-width row of rays
#: fans across the whole horizontal FOV and culls almost nothing (measured:
#: 28.5 s/frame row-tiled vs sub-second square-tiled on config 4).
TILE_H = {1024: 32, 2048: 32, 4096: 64}[RAYS]
TILE_W = RAYS // TILE_H
#: survivor-list capacity (SMEM); overflowing tiles fall back to streaming
#: every cluster (correct, slow) — see `sovf`.  4096 retires the fallback
#: for config 5's 8k clusters (35 of 2040 tiles overflowed at 2048, each
#: degrading to a full 8194-cluster stream)
MAXS = 4096
#: survivor-stream DMA pipeline depth (slots of wscr/ascr scratch).  4 was
#: neutral-vs-2 when per-cluster compute was ~1.9 µs (r2); after the r4
#: bf16x6 matmul cut compute to ~0.5 µs/cluster the wait is partially
#: exposed (profiler stream stage: 0.53 µs/survivor) — A/B knob
DMA_DEPTH = int(os.environ.get("TPURT_DMA_DEPTH", "4"))
#: front-to-back entry-distance buckets for the closest pass: survivors are
#: emitted bucket-major (nearest first) and a whole bucket is skipped once
#: every live ray's best hit is nearer than the bucket's entry threshold
KB = 4
#: bounding-cone refinement of the interval cull (A/B constant, read at
#: trace time): AND a conservative sphere-vs-cone test into every cull —
#: the slab test's per-axis interval relaxation admits corner directions
#: no real ray points at; the cone trims them for point-apex bundles
#: (primary tiles, reversed shadow culls).  Default OFF: measured on the
#: chip at production res it is dead-even on config 4 (146.16 vs
#: 146.34 ms) and 1.5% SLOWER on config 5 (515.96 vs 508.28 ms) — the
#: extra per-cluster VPU work outweighs the interval-mixing slack it
#: trims (docs/design.md geometry note predicted exactly this)
CONE_CULL = os.environ.get("TPURT_CONE_CULL", "0") != "0"
#: division-free any-hit epilogue — MEASUREMENT flag only (rounding
#: differs from the division-based oracle at knife edges; see tri_hit)
FAST_ANYHIT = os.environ.get("TPURT_FAST_ANYHIT", "0") != "0"
#: in-kernel STAGE PROFILER (TPURT_PROF; measurement only — every value
#: other than "" produces WRONG outputs).  Each stage re-enables one more
#: pipeline piece, so per-pass fixed cost and per-survivor streaming cost
#: decompose by differencing on-chip timings (scripts/prof_traversal.py):
#:   "launch"  ray-gen + shading/record skeleton; closest/occluded return
#:             immediately after best-init (grid + per-tile floor)
#:   "cull"    + the conservative interval cull (result consumed, unused)
#:   "scan"    + bucketing, word-pack matmuls, mask DMA, scalar survivor
#:             compaction, resident-sphere fold
#:   "stream"  + survivor DMA pipeline, per-chunk scalar bit reads, and
#:             (any-hit) the saturation machinery — chunk COMPUTE skipped
#:   "mmraw"   + the HIGHEST-precision intersection matmul (epilogue
#:             reduced to one min-reduce)
#:   "mm"      + the full t/u/v epilogue (closest pass skips the fold)
#:   ""        full kernel (default)
#: Stage variants never take the early exits (bests/occ stay unset), so
#: they stream the FULL survivor list: normalize per-survivor deltas by
#: each variant's own s_strm/s_chnk stats (traversal_stats).
PROF = os.environ.get("TPURT_PROF", "")
#: stream-stage DMA byte-scaling probe (see dmas() in the kernel): 0 = off
PROF_DMA_ROWS = int(os.environ.get("TPURT_PROF_DMA_ROWS", "0"))
#: survivor-ADJACENCY measurement (decides span-coalesced DMA, VERDICT r4
#: item 3a): under TPURT_RUN_STATS=1 + TPURT_PROF=scan, s_chnk counts RUNS
#: of consecutive survivor ids instead of chunk visits (the stream loop
#: never runs under PROF=scan, so the row is unaliased); mean run length =
#: s_surv / s_chnk.  Measurement-only flag.
RUN_STATS = os.environ.get("TPURT_RUN_STATS", "0") != "0"
#: SPAN-COALESCED survivor streaming (r5, VERDICT r4 item 3a): emitted
#: survivor ids are runs of CONSECUTIVE clusters (measured mean run ~4.1
#: on config 5 shadow cells: 158974 survivors / 38330 runs, TPURT_RUN_STATS
#: probe), so the compaction scan can emit (start, len≤SPAN) RUNS packed
#: as (start << 3) | (len-1) and the streaming loops issue ONE span DMA
#: per run.  MEASURED NEGATIVE at SPAN=4, default OFF: c5 fwd 265.5 →
#: 304.5 ms, c4 fwd 76 → 104 ms — the fixed-size span DMA OVER-fetches
#: short runs (total bytes × SPAN/mean-run), the per-slot `j2 < len`
#: guards add scalar work per cluster, and the run-building emission adds
#: ~4 scalar ops per survivor to the scan; together they exceed the saved
#: DMA issues.  Records are bit-identical either way (tested) — the flag
#: and the probe stay for other scene shapes.
SPAN = int(os.environ.get("TPURT_SPAN", "1"))
#: statically unroll the shadow stream's per-block inner loop (NBLK steps
#: with `i < seg` guards instead of a dynamic fori_loop) — A/B flag for
#: the sequencing-bound survivor stream
SHADOW_UNROLL = os.environ.get("TPURT_SHADOW_UNROLL", "0") != "0"
if SPAN < 1:
    SPAN = 1
assert SPAN <= 8, SPAN  # 3 len bits in the packed entry; packc pads 8
assert PROF in ("", "launch", "cull", "scan", "stream", "mmraw", "mm"), PROF
#: intersection-matmul precision (TPURT_MM_PREC = highest | bf16x3 |
#: default).  The r4 stage profiler (scripts/prof_traversal.py) measured
#: the K=8 Baldwin–Weber dot_generals as ~72% of the b0 kernel and ~91% of
#: the shadow kernel at config 5; f32 HIGHEST lowers to SIX bf16 MXU
#: passes, and the per-dot cost is ~60% fixed operand staging (mmraw
#: default-vs-highest differencing), so three SEPARATE bf16 passes
#: (Precision.HIGH — unimplemented by Mosaic anyway) would win nothing.
#: `bf16x3` instead K-CONCATENATES the three product groups of the 2-way
#: bf16 split into ONE K=24 bf16 dot — [whi;whi;wlo]·[Xhi;Xlo;Xhi] =
#: whi·Xhi + whi·Xlo + wlo·Xhi — which the MXU pads to K=128 regardless,
#: i.e. single-pass cost with ~2^-16-relative accuracy (the dropped
#: wlo·Xlo term is ≤2^-16).  `default` (raw 1-pass bf16) is a recorded
#: NEGATIVE result end to end: ~2^-8 t values break exact t-termination /
#: saturation and the kernel streams more than the matmul saves.
#: Applies to the triangle candidate matmuls only (tri_math / tri_hit);
#: spheres and the fold's one-hot selection matmul stay HIGHEST — the
#: fold transports attribute VALUES exactly and is off the critical path.
#: `bf16x6` K-concatenates the SIX product groups of the 3-way bf16 split
#: (8+8+8 mantissa bits decompose f32 exactly): K=48, still ONE MXU pass,
#: and the terms kept/dropped are exactly XLA HIGHEST's — accuracy equals
#: HIGHEST at ~single-pass cost (the default since r4; c4-grid's bf16x3
#: knife-edge flips vanish).
_MM_PREC_STR = os.environ.get("TPURT_MM_PREC", "bf16x6")
MM3X = _MM_PREC_STR in ("bf16x3", "bf16x6")
_MM_PREC = {
    "highest": lax.Precision.HIGHEST,
    "bf16x3": lax.Precision.HIGHEST,   # non-tri dots keep full precision
    "bf16x6": lax.Precision.HIGHEST,
    "default": lax.Precision.DEFAULT,
}[_MM_PREC_STR]
_BIG = 3.0e37

# product-group pairs of the split-bf16 K-concat, in decreasing magnitude
# (i+j order): bf16x3 keeps terms to 2^-16, bf16x6 to 2^-24 — the exact
# set XLA's own HIGHEST (6-pass) lowering computes (module-level so the
# XLA-side prestack below and the in-kernel stacks agree bit for bit)
if _MM_PREC_STR == "bf16x6":
    _MM_PAIRS = [(0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1)]
    _MM_TERMS = 3
else:
    _MM_PAIRS = [(0, 0), (0, 1), (1, 0)]
    _MM_TERMS = 2
_MM_SROWS = 8 * len(_MM_PAIRS)     # sublanes of a stacked (·, 768) operand


def _bf16_split(x, n):
    """f32 → n bf16 terms with x ≈ Σ terms; each subtraction is exact
    (the rounded head is within an ulp ⇒ Sterbenz), so 3 terms carry
    8+8+8 = 24 mantissa bits — the full f32 significand."""
    terms = []
    for _ in range(n - 1):
        h = x.astype(jnp.bfloat16)
        x = x - h.astype(jnp.float32)
        terms.append(h)
    terms.append(x.astype(jnp.bfloat16))
    return terms


#: PRESTACKED split-bf16 triangle forms: build the per-cluster
#: (SROWS, 768) bf16 stack ONCE per frame at XLA level instead of once per
#: STREAMED SURVIVOR on the VPU (in-kernel stack_w measured ~0.24 µs/
#: cluster).  MEASURED NEGATIVE r5, default OFF: config 5 fwd 263 → 537 ms
#: — the 73.7 KB/cluster DMA (3× the f32 forms) swamps the 2-deep pipeline,
#: i.e. the survivor stream is DMA-TRANSFER-bound at cluster granularity,
#: not VPU-bound; also the XLA-side split is NOT bit-equal to the
#: in-kernel one under --xla_allow_excess_precision (traced-ray count
#: shifted 2.68M → 2.61M).  Flag kept for re-measurement if DMA behavior
#: changes.
PRESTACK = os.environ.get("TPURT_PRESTACK", "0") != "0"
if PRESTACK:
    SPAN = 1  # the prestack A/B path keeps the singleton stream layout


def prestack_wtri(wtri_c):
    """(C, 8, 6, LANES) f32 cluster forms → (C, SROWS, 6·LANES) bf16
    prestacked lhs operands (the exact layout stack_w builds in-kernel)."""
    Cc = wtri_c.shape[0]
    w = wtri_c.reshape(Cc, 8, 6 * LANES)
    t = _bf16_split(w, _MM_TERMS)
    return jnp.concatenate([t[i] for i, _ in _MM_PAIRS], axis=1)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _trav_kernel(
    # inputs, outputs, scratch — layout depends on statics[-1] (rays_in):
    #   gen mode:  off, glob, wsph, sattr, aabb, wtri, attr | outs | scratch
    #   rays mode: nlive, glob, wsph, sattr, aabb, ox..dz, alive, wtri, attr
    # (see trace_records / trace_bounce wrappers)
    *refs, statics,
):
    # per-tile stats (SMEM rows, one lane per tile): survivors summed over
    # passes / number of passes / overflow events — traversal observability
    # (SURVEY.md §5 metrics), surfaced by traversal_stats()
    # mode: 0 = in-kernel ray-gen over pixel tiles, 1 = explicit (binned)
    # ray set per bounce, 2 = shadow-only over binned hit points
    (H, W, max_depth, shadows, Ccount, nb_s, n_lights, T_total, R, ntx,
     mode) = statics
    if mode == 1:
        (off_ref, glob_ref, wsph_ref, sattr_ref, aabb_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, al_ref,
         wtri_hbm, attr_hbm,
         id_ref, occ_ref, t_ref, s_surv, s_pass, s_ovf, s_strm, s_chnk,
         maskv, masks, slist, scnt, sovf, wscr, ascr, tb, ab, ub, vb, occb,
         sems, ssem, bstart, keyv, keys_s, ksem) = refs
    elif mode == 2:
        # shadow mode: px.. = hit points p (the oracle measures the light
        # distance from p), qx.. = offset origins p_off = p + eps·n
        (off_ref, glob_ref, wsph_ref, sattr_ref, aabb_ref,
         px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref, al_ref,
         wtri_hbm, attr_hbm,
         occ_ref, s_surv, s_pass, s_ovf, s_strm, s_chnk,
         maskv, masks, slist, scnt, sovf, wscr, ascr, tb, ab, ub, vb, occb,
         sems, ssem, bstart, keyv, keys_s, ksem) = refs
    else:
        (off_ref, glob_ref, wsph_ref, sattr_ref, aabb_ref, wtri_hbm, attr_hbm,
         id_ref, occ_ref, t_ref, s_surv, s_pass, s_ovf, s_strm, s_chnk,
         maskv, masks, slist, scnt, sovf, wscr, ascr, tb, ab, ub, vb, occb,
         sems, ssem, bstart, keyv, keys_s, ksem) = refs
    tile_id = pl.program_id(0)
    s_surv[0, tile_id] = 0
    s_pass[0, tile_id] = 0
    s_ovf[0, tile_id] = 0
    s_strm[0, tile_id] = 0
    s_chnk[0, tile_id] = 0
    f32 = jnp.float32
    C_pad = aabb_ref.shape[1]
    # chunk granularity + mask-row layout are mode-dependent (NCH_SHADOW)
    nch = NCH_SHADOW if mode == 2 else NCH
    RCH = R // nch
    mrow = KB + nch  # first meta row (rows: KB buckets, nch chunk bits)
    THR_ROW = mrow + KB  # bucket-threshold keys ride the mask DMA's last row

    glob = glob_ref[...]
    aabb = aabb_ref[...]
    # scene root box: reduce cluster bounds (pad clusters are empty boxes at
    # ±BIG, so they never win the min/max)
    root_lo = [jnp.min(aabb[k : k + 1, :]) for k in range(3)]
    root_hi = [jnp.max(aabb[3 + k : 4 + k, :]) for k in range(3)]
    lane_g = lax.broadcasted_iota(jnp.int32, glob.shape, 1)

    def fkey(x):
        """Order-preserving float32 → int32 key (total order, no NaNs in
        inputs): negative floats get their magnitude bits flipped."""
        b = lax.bitcast_convert_type(x, jnp.int32)
        return b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))

    def _consume(*vals):
        """(1, 1)-ish f32 that is always 0.0 but data-depends on `vals`:
        stage-profiler variants add it into live scratch so the stage under
        measurement cannot be dead-code-eliminated.  Inputs are bounded by
        ±_BIG (cull entries, wtri forms, attrs), so the sum of full-reduce
        mins stays finite and the threshold test never fires."""
        acc = jnp.zeros((), f32)
        for v in vals:
            acc = acc + jnp.min(v.astype(f32))
        return jnp.where(acc > 2.0 * _BIG, 1.0, 0.0)

    def root_hit(o3, d3):
        """(1, R) bool: can this ray possibly enter the scene root box?
        Rays that miss it (sky) are dropped from the live set — correct
        (they can hit nothing) and essential for t-termination: one sky
        lane would otherwise hold every tile at tmax = ∞."""
        t_lo = jnp.full_like(o3[0], -_BIG)
        t_hi = jnp.full_like(o3[0], _BIG)
        for k in range(3):
            dk = d3[k]
            par = jnp.abs(dk) < 1e-12
            safe = jnp.where(par, jnp.where(dk >= 0, 1e-12, -1e-12), dk)
            ta = (root_lo[k] - o3[k]) / safe
            tb_ = (root_hi[k] - o3[k]) / safe
            near = jnp.minimum(ta, tb_)
            far = jnp.maximum(ta, tb_)
            inside = (o3[k] >= root_lo[k]) & (o3[k] <= root_hi[k])
            near = jnp.where(par, jnp.where(inside, -_BIG, _BIG), near)
            far = jnp.where(par, jnp.where(inside, _BIG, -_BIG), far)
            t_lo = jnp.maximum(t_lo, near)
            t_hi = jnp.minimum(t_hi, far)
        return (t_lo <= t_hi) & (t_hi > 0.0)

    def g(k):
        return jnp.sum(jnp.where(lane_g == k, glob, 0.0), axis=1, keepdims=True)

    def g3(k):
        return (g(k), g(k + 1), g(k + 2))

    if mode == 1:
        # wavefront bounce: rays arrive binned (Morton-of-hit-point order,
        # see render_rows_clustered) — each tile is a coherent bundle, which
        # is what keeps the interval cull selective for secondary rays
        o = (ox_ref[...], oy_ref[...], oz_ref[...])
        d = (dx_ref[...], dy_ref[...], dz_ref[...])
        alive0 = al_ref[...] != 0
    elif mode == 2:
        o = d = None  # shadow rays are built per light below
        alive0 = al_ref[...] != 0
    else:
        # ---- ray-gen over a TILE_H × TILE_W pixel block -------------------
        t = pl.program_id(0)
        bi = t // ntx
        bj = t % ntx
        k = lax.broadcasted_iota(jnp.int32, (1, R), 1)
        row0 = off_ref[0, 0]
        row = (row0 + bi * TILE_H + k // TILE_W).astype(f32)
        colm = (bj * TILE_W + k % TILE_W).astype(f32)
        aspect = W / H
        sx = (2.0 * (colm + 0.5) / W - 1.0) * aspect
        sy = 1.0 - 2.0 * (row + 0.5) / H
        eye, fwd = g3(0), g3(3)
        right_h, up_h = g3(6), g3(9)
        d = _normalize3(
            _add3(fwd, _add3(_scale3(right_h, sx), _scale3(up_h, sy)))
        )
        o = tuple(jnp.broadcast_to(e, (1, R)) for e in eye)
        alive0 = (row < float(H)) & (colm < float(W))

    iota_sub = lax.broadcasted_iota(jnp.int32, (LANES, R), 0)
    rows8 = lax.broadcasted_iota(jnp.int32, (8, R), 0)

    # bit-pack weights for the compaction matmul (built once per tile):
    # wpack[c, g] = 2^(c % 16) iff c // 16 == g.  Sums of ≤16 distinct
    # powers of two stay < 2^16, exact in f32.  The matrix is built per
    # PCHUNK lanes and reused across chunks — a single (C_pad, C_pad/16)
    # matrix is O(C²) and hits 16 MB at 8k clusters.
    NW = C_pad // 16
    PCHUNK = min(C_pad, 2048)
    NWC = PCHUNK // 16
    cidx = lax.broadcasted_iota(jnp.int32, (PCHUNK, NWC), 0)
    gidx = lax.broadcasted_iota(jnp.int32, (PCHUNK, NWC), 1)
    # powers of two via integer shifts, NOT exp2: transcendental exp2(15)
    # evaluates a hair below 32768 and the int cast truncates, corrupting
    # every bit of the word
    wpack = jnp.where(
        (cidx // 16) == gidx,
        jnp.left_shift(1, cidx % 16).astype(f32),
        0.0,
    )
    lanes_nw = lax.broadcasted_iota(jnp.int32, (1, NW), 1)
    # meta level: one bit per 16-word group ("any survivor in these 256
    # clusters?") so the scalar compaction scan can skip 16 words at a
    # time — the scan is the C_pad-linear serial cost of every pass
    # (KB × C_pad/16 word visits; 2048 at 8k clusters ≈ 70 µs/tile-pass
    # measured, the dominant fixed cost at config-5 scale)
    NW2 = -(-NW // 16)
    c2 = lax.broadcasted_iota(jnp.int32, (NW, NW2), 0)
    g2 = lax.broadcasted_iota(jnp.int32, (NW, NW2), 1)
    wpack2 = jnp.where(
        (c2 // 16) == g2, jnp.left_shift(1, c2 % 16).astype(f32), 0.0
    )

    def build_X(o3, d3):
        m = lambda k, v: jnp.where(rows8 == k, v, 0.0)        # noqa: E731
        return (
            m(0, o3[0]) + m(1, o3[1]) + m(2, o3[2]) + m(3, 1.0)
            + m(4, d3[0]) + m(5, d3[1]) + m(6, d3[2])
        )

    def stack_w(w):
        """(8, M) f32 triangle forms → (8·len(pairs), M) bf16 stack — the
        LHS of the single-pass split dot (hoisted once per streamed
        cluster; chunk-invariant)."""
        t = _bf16_split(w, _MM_TERMS)
        return jnp.concatenate([t[i] for i, _ in _MM_PAIRS], axis=0)

    def stack_x(X):
        """(8, R) f32 ray forms → (8·len(pairs), R) bf16 stack (once per
        pass)."""
        t = _bf16_split(X, _MM_TERMS)
        return jnp.concatenate([t[j] for _, j in _MM_PAIRS], axis=0)

    def _mm(wop, Xop):
        """The candidate-generation dot: operands are either the (8, ·)
        f32 forms (highest/default) or the (24, ·) bf16 stacks (bf16x3 —
        one MXU pass computes the 3-term split product sum; K pads to 128
        on the MXU either way)."""
        return lax.dot_general(
            wop, Xop, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.DEFAULT if MM3X else _MM_PREC,
        )

    # ---- conservative interval cull (clusters in lanes) -------------------
    # Every row tests one RCH-ray sub-chunk; the DMA survivor list is the
    # UNION of the chunk rows (r3) — strictly tighter than the historical
    # whole-tile interval test (each chunk's frustum is narrow; the whole
    # bundle's per-axis intervals mix across the tile), which is what made
    # fatter tiles blow up survivors (RAYS=2048/4096 measured 1.4× slower
    # with the whole-tile list; see design.md).  All rows ride in sublanes,
    # so the cull stays nearly free on the VPU.
    GRPS = nch

    grow = lax.broadcasted_iota(jnp.int32, (GRPS, 1), 0)

    def gcol(vals):
        """List of GRPS scalars → (GRPS, 1) column (no small concats)."""
        out = jnp.zeros((GRPS, 1), f32)
        for k, v in enumerate(vals):
            out = jnp.where(grow == k, v, out)
        return out

    def _interval_ok(o3, d3, alive, tmax=None):
        """Conservative interval cull of the current ray set vs all cluster
        AABBs → (ok (GRPS, C_pad) bool, entry (GRPS, C_pad) f32).
        Conservative: a cluster any LIVE ray might hit always survives.
        The alive mask is essential, not an optimization nicety: dead lanes
        carry garbage origins (p = o + T_NONE·d ≈ ±1e30), and without
        masking one sky pixel per tile blows the interval bounds open and
        the cull admits every cluster (measured: 16 s/frame unmasked →
        ~1 s masked, config 4).  `tmax` (1, R), if given, additionally
        rejects clusters whose conservative entry lies beyond every live
        lane's ray range — for shadow rays this culls geometry behind the
        light."""

        def bounds(x, lo):
            """Per-chunk masked min/max of a (1, R) row → GRPS scalars."""
            vals = []
            for g in range(GRPS):
                sl = slice(g * RCH, (g + 1) * RCH)
                xm = jnp.where(alive[:, sl], x[:, sl], _BIG if lo else -_BIG)
                vals.append(jnp.min(xm) if lo else jnp.max(xm))
            return vals

        entry = jnp.full((GRPS, C_pad), -_BIG, f32)
        exit_ = jnp.full((GRPS, C_pad), _BIG, f32)
        any_alive = []
        for g in range(GRPS):
            sl = slice(g * RCH, (g + 1) * RCH)
            any_alive.append(jnp.any(alive[:, sl]).astype(f32))
        any_col = gcol(any_alive) > 0.5

        o_los, o_his, d_los, d_his = [], [], [], []
        for k in range(3):
            o_lo = gcol(bounds(o3[k], True))
            o_hi = gcol(bounds(o3[k], False))
            d_lo = gcol(bounds(d3[k], True))
            d_hi = gcol(bounds(d3[k], False))
            o_los.append(o_lo)
            o_his.append(o_hi)
            d_los.append(d_lo)
            d_his.append(d_hi)
            crosses = (d_lo < 1e-12) & (d_hi > -1e-12)        # (GRPS, 1)
            lo_r = aabb[k : k + 1, :]
            hi_r = aabb[3 + k : 4 + k, :]
            k_lo = jnp.full((GRPS, C_pad), _BIG, f32)
            k_hi = jnp.full((GRPS, C_pad), -_BIG, f32)
            for B in (lo_r, hi_r):
                for on in (o_lo, o_hi):
                    num = B - on                              # (GRPS, C_pad)
                    for dn in (d_lo, d_hi):
                        safe = jnp.where(
                            jnp.abs(dn) < 1e-12,
                            jnp.where(dn >= 0, 1e-12, -1e-12),
                            dn,
                        )
                        t = num / safe
                        k_lo = jnp.minimum(k_lo, t)
                        k_hi = jnp.maximum(k_hi, t)
            k_lo = jnp.where(crosses, -_BIG, k_lo)
            k_hi = jnp.where(crosses, _BIG, k_hi)
            entry = jnp.maximum(entry, k_lo)
            exit_ = jnp.minimum(exit_, k_hi)
        ok = (entry <= exit_) & (exit_ > 0.0) & any_col
        ok = ok & (lax.broadcasted_iota(jnp.int32, (GRPS, C_pad), 1) < Ccount)
        if tmax is not None:
            t_hi = gcol(bounds(tmax, False))          # per-group max range
            ok = ok & (entry <= t_hi)

        if not CONE_CULL:
            return ok, entry

        # ---- bounding-cone refinement ---------------------------------
        # The slab test relaxes the ray set to independent per-axis
        # intervals; its corner directions need not lie near any real
        # ray.  Tighten with a conservative sphere-vs-cone test: apex at
        # the group's origin-box center, axis = normalized direction-box
        # midpoint, half-angle from the minimum corner cosine of the
        # direction box, and cluster bounding spheres INFLATED by the
        # origin-box half-diagonal (Minkowski) so spread origins stay
        # conservative.  Exact-apex cases — primary rays (camera point)
        # and reversed shadow culls (light point) — get the full benefit;
        # wide bounce bundles disable themselves via the cos guard.
        mid = [0.5 * (d_los[k] + d_his[k]) for k in range(3)]
        m2 = mid[0] * mid[0] + mid[1] * mid[1] + mid[2] * mid[2]
        inv_m = lax.rsqrt(jnp.maximum(m2, 1e-24))
        ax = [mid[k] * inv_m for k in range(3)]               # (GRPS, 1)
        cos_min = jnp.full((GRPS, 1), 1.0, f32)
        for sx in (0, 1):
            for sy in (0, 1):
                for sz in (0, 1):
                    ck = (
                        d_his[0] if sx else d_los[0],
                        d_his[1] if sy else d_los[1],
                        d_his[2] if sz else d_los[2],
                    )
                    n2 = ck[0] * ck[0] + ck[1] * ck[1] + ck[2] * ck[2]
                    dot = ax[0] * ck[0] + ax[1] * ck[1] + ax[2] * ck[2]
                    cos_min = jnp.minimum(
                        cos_min, dot * lax.rsqrt(jnp.maximum(n2, 1e-24))
                    )
        valid = (m2 > 1e-12) & (cos_min > 0.05)
        cth = jnp.clip(cos_min, 1e-3, 1.0)
        sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
        ro2 = jnp.zeros((GRPS, 1), f32)
        for k in range(3):
            h = 0.5 * (o_his[k] - o_los[k])
            ro2 = ro2 + h * h
        ro = jnp.sqrt(ro2)
        rc2 = jnp.zeros((1, C_pad), f32)
        vv = jnp.zeros((GRPS, C_pad), f32)
        p_ax = jnp.zeros((GRPS, C_pad), f32)
        for k in range(3):
            half = 0.5 * (aabb[3 + k : 4 + k, :] - aabb[k : k + 1, :])
            rc2 = rc2 + half * half
            vk = (
                0.5 * (aabb[k : k + 1, :] + aabb[3 + k : 4 + k, :])
                - 0.5 * (o_los[k] + o_his[k])
            )                                         # (GRPS, C_pad)
            vv = vv + vk * vk
            p_ax = p_ax + ax[k] * vk
        re = jnp.sqrt(rc2) + ro                       # (GRPS, C_pad)
        q2 = vv - p_ax * p_ax
        rhs = jnp.maximum(p_ax, 0.0) * sth + re
        cone_ok = (q2 * (cth * cth) <= rhs * rhs) & (p_ax >= -re)
        ok = ok & (cone_ok | ~valid)
        return ok, entry

    def cull_to_smem(ok0, entry0, chunk_rows, reverse=False, want_keys=True):
        """Emit cull results to SMEM: bucket the whole-tile survivor row
        `ok0` (1, C_pad) front-to-back by conservative entry `entry0`
        (1, C_pad), pack bucket + per-chunk mask rows into 16-bit words,
        DMA to SMEM, and compact a bucket-major survivor index list.
        `chunk_rows`: list of (nch, C_pad) bool rows (one set per shadow
        light, or the single closest-pass set) packed after the KB bucket
        rows — the streaming loop's per-chunk compute-skip bits.

        `want_keys=False` (any-hit passes): skip the bucket-threshold
        computation — only the closest pass's t-termination reads them.
        Thresholds ride in the LAST ROW of the mask DMA (one SMEM copy +
        wait per pass instead of two: each small VMEM→SMEM DMA costs
        multiple µs of hard serialization, and the per-pass fixed cost IS
        the wall — config 4 measures 45 µs/shadow-pass at 6.6 survivors).
        """

        # ---- front-to-back bucketing of whole-tile survivors --------------
        # Quantize each surviving cluster's conservative entry distance into
        # KB buckets between the nearest and farthest survivor (entries < 0
        # mean "origin inside the box" → bucket 0).  Survivors are emitted
        # bucket-major so the streaming loop visits near geometry first and
        # can stop once every live ray's best hit precedes a bucket.
        entry0 = jnp.maximum(entry0, 0.0)
        emin = jnp.min(jnp.where(ok0, entry0, _BIG))
        emax = jnp.max(jnp.where(ok0, entry0, -_BIG))
        span = jnp.maximum(emax - emin, 1e-30)
        buck = jnp.clip(
            ((entry0 - emin) * (KB / span)).astype(jnp.int32), 0, KB - 1
        )                                             # (1, C_pad)
        brow = lax.broadcasted_iota(jnp.int32, (KB, C_pad), 0)
        okb = (brow == buck) & ok0                    # (KB, C_pad)
        # bucket entry thresholds as order-preserving int keys → lanes
        # 0..KB of the mask block's LAST row.  The threshold must be a
        # LOWER bound on every member's entry for the t-termination skip
        # to be exact; the arithmetic form emin + k·(span/KB) is NOT one
        # (the multiply-truncate bucket assignment and the threshold
        # recompute round differently, so a boundary cluster can land in
        # bucket k with entry an ulp below the recomputed threshold).  Use
        # the masked per-bucket MIN of the actual entries — exact by
        # construction and tighter (gates fire earlier).  Empty buckets
        # get _BIG (skipped; their index range is empty anyway).
        if want_keys:
            lane_i = lax.broadcasted_iota(jnp.int32, (1, NW), 1)
            thr = jnp.full((1, NW), _BIG, f32)
            for k in range(KB):
                mk = jnp.min(jnp.where(okb[k : k + 1, :], entry0, _BIG))
                thr = jnp.where(lane_i == k, mk, thr)
            maskv[THR_ROW : THR_ROW + 1, :] = fkey(thr)

        # word-packed compaction: a serial scan of all C_pad lanes on the
        # scalar core costs ~100 µs/pass; instead pack the masks into 16-bit
        # words with MXU matmuls and let the scalar loop skip zero words
        # (typical tiles survive a handful of clusters).
        def pack_words(okf):
            # bf16 inputs, f32 accumulation: every product is 0 or 2^k,
            # both exact in bf16, and the f32 accumulator sums ≤16 distinct
            # powers of two < 2^16 exactly — so ONE native MXU pass gives
            # the exact integers that f32 HIGHEST (6 emulation passes) gave,
            # at ~6× less MXU time.  This matmul is ~1/3 of the fixed
            # per-pass cost at 8k clusters.
            rows = okf.shape[0]
            words = jnp.zeros((rows, NW), jnp.int32)
            for ch in range(C_pad // PCHUNK):
                wf = lax.dot_general(
                    okf[:, ch * PCHUNK : (ch + 1) * PCHUNK].astype(
                        jnp.bfloat16),
                    wpack.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )                                      # (rows, NWC) exact ints
                wi = jnp.round(wf).astype(jnp.int32)
                in_ch = (lanes_nw >= ch * NWC) & (lanes_nw < (ch + 1) * NWC)
                shifted = jnp.pad(wi, ((0, 0), (ch * NWC, NW - (ch + 1) * NWC)))
                words = jnp.where(in_ch, shifted, words)
            return words

        bwords = pack_words(okb.astype(f32))
        maskv[0:KB, :] = bwords
        for i, rows in enumerate(chunk_rows):
            maskv[KB + i * nch : KB + (i + 1) * nch, :] = pack_words(
                rows.astype(f32))
        # per-bucket meta words: bit g of meta[kb, mw] = "bucket kb has a
        # survivor among clusters [(mw*16+g)*16, +16)"
        meta = jnp.round(
            lax.dot_general(
                (bwords != 0).astype(jnp.bfloat16),
                wpack2.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        ).astype(jnp.int32)                            # (KB, NW2)
        lanes_m = lax.broadcasted_iota(jnp.int32, (KB, NW), 1)
        maskv[mrow : mrow + KB, :] = jnp.where(
            lanes_m < NW2, jnp.pad(meta, ((0, 0), (0, NW - NW2))), 0
        )
        cp = pltpu.make_async_copy(maskv, masks, ssem)
        cp.start()
        cp.wait()
        scnt[0] = 0
        sovf[0] = 0
        if RUN_STATS:
            keys_s[0, 1] = -2  # previous emitted id (run-stats probe)
        if SPAN > 1:
            # run-emission state rides spare keys_s SMEM lanes (the tmax
            # key DMA only overwrites them DURING streaming, after the
            # scan): [1] run start, [2] run length, [3] cluster count
            keys_s[0, 1] = -100
            keys_s[0, 2] = 0
            keys_s[0, 3] = 0

        def flush_run():
            """Emit the open (start, len) run as (start << 3) | (len-1)."""
            ln = keys_s[0, 2]

            @pl.when(ln > 0)
            def _():
                k = scnt[0]

                @pl.when(k < MAXS)
                def _():
                    slist[k] = (keys_s[0, 1] << 3) | (ln - 1)

                @pl.when(k >= MAXS)
                def _():
                    sovf[0] = 1
                scnt[0] = k + 1
                keys_s[0, 2] = 0

        # emission order: closest pass needs near-first (its t-termination
        # reads bstart per bucket); the any-hit shadow pass streams the
        # whole list in order, so `reverse` emits far-from-light first =
        # NEAR-THE-SURFACE first — contact geometry is the likeliest
        # occluder, so per-chunk saturation fires after fewer clusters
        order = range(KB - 1, -1, -1) if reverse else range(KB)
        for pos, kb in enumerate(order):
            def outer(mw, _, kb=kb):
                m = masks[mrow + kb, mw]

                @pl.when(m != 0)
                def _():
                    def midbit(g, _):
                        @pl.when(((m >> g) & 1) != 0)
                        def _():
                            gword = mw * 16 + g
                            w = masks[kb, gword]

                            def inner(b, _):
                                @pl.when(((w >> b) & 1) != 0)
                                def _():
                                    if SPAN > 1:
                                        cid = gword * 16 + b
                                        cont = (
                                            (cid == keys_s[0, 1]
                                             + keys_s[0, 2])
                                            & (keys_s[0, 2] < SPAN))

                                        @pl.when(cont)
                                        def _():
                                            keys_s[0, 2] = keys_s[0, 2] + 1

                                        @pl.when(jnp.logical_not(cont))
                                        def _():
                                            flush_run()
                                            keys_s[0, 1] = cid
                                            keys_s[0, 2] = 1
                                        keys_s[0, 3] = keys_s[0, 3] + 1
                                        return
                                    k = scnt[0]

                                    @pl.when(k < MAXS)
                                    def _():
                                        slist[k] = gword * 16 + b
                                    if RUN_STATS:
                                        cid = gword * 16 + b

                                        @pl.when(cid != keys_s[0, 1] + 1)
                                        def _():
                                            s_chnk[0, tile_id] = (
                                                s_chnk[0, tile_id] + 1)
                                        keys_s[0, 1] = cid

                                    @pl.when(k >= MAXS)
                                    def _():
                                        sovf[0] = 1
                                    scnt[0] = k + 1
                                return 0

                            lax.fori_loop(0, 16, inner, 0, unroll=False)
                        return 0

                    lax.fori_loop(0, 16, midbit, 0, unroll=False)
                return 0

            lax.fori_loop(0, NW2, outer, 0, unroll=False)
            if SPAN > 1:
                flush_run()  # runs never straddle bucket boundaries
            # by POSITION in emission order (== by bucket iff not reverse;
            # the reverse consumer never reads bstart)
            bstart[pos + 1] = jnp.minimum(scnt[0], MAXS)
        bstart[0] = 0
        s_surv[0, tile_id] = s_surv[0, tile_id] + (
            keys_s[0, 3] if SPAN > 1 else scnt[0])
        s_pass[0, tile_id] = s_pass[0, tile_id] + 1
        s_ovf[0, tile_id] = s_ovf[0, tile_id] + sovf[0]

    # ---- primitive-block math (same forms as megakernel.py) ---------------
    def tri_math(wblk, X, t_hi, nsub=LANES):
        """Triangle forms (8, 6·nsub) × ray form X (8, chunk) → candidate
        t/u/v, each (nsub, chunk).  Under bf16x3 both operands arrive
        PRE-STACKED ((24, ·) bf16, see stack_w/stack_x).  nsub > LANES
        batches several clusters' 128-lane blocks into ONE matmul (the
        occlusion pass streams NBO clusters per dot — small K leaves the
        MXU mostly idle, so per-matmul overhead, not MACs, is the
        per-cluster cost)."""
        out = _mm(wblk, X).reshape(6, nsub, X.shape[1])
        no_, ndd, uo, ud, vo, vd = (out[i] for i in range(6))
        good = jnp.abs(ndd) >= C.MT_DET_EPS
        safe_nd = jnp.where(good, ndd, 1.0)
        t = -no_ / safe_nd
        u = uo + t * ud
        v = vo + t * vd
        hit = good & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        hit = hit & (t > C.T_MIN) & (t < t_hi)
        return jnp.where(hit, t, C.T_NONE), u, v

    def tri_hit(wblk, X, t_hi, nsub):
        """Lean any-hit variant: → hit (nsub, chunk) bool.  Skips the
        where(hit, t, T_NONE) select and the second t-vs-tmax compare the
        fold path pays (t_hi here IS the occlusion band end).

        TPURT_FAST_ANYHIT (measurement flag, default OFF): the same
        predicate DIVISION-FREE — multiply every condition through by nd²
        (u ≥ 0 ⇔ (uo·nd − no·ud)·nd ≥ 0 etc.; nd² ≥ MT_DET_EPS² stays
        normal in f32).  Algebraically identical, fp-rounding DIFFERENT:
        knife-edge occlusion bits can flip vs the division-based oracle,
        so this cannot ship without changing geom.any_hit to the same form
        and regolding (see CLAUDE.md backlog) — the flag exists to price
        the win first."""
        out = _mm(wblk, X).reshape(6, nsub, X.shape[1])
        no_, ndd, uo, ud, vo, vd = (out[i] for i in range(6))
        good = jnp.abs(ndd) >= C.MT_DET_EPS
        if FAST_ANYHIT:
            nd2 = ndd * ndd
            tn = -(no_ * ndd)                      # t·nd²
            un = (uo * ndd - no_ * ud) * ndd       # u·nd²
            vn = (vo * ndd - no_ * vd) * ndd       # v·nd²
            hit = good & (un >= 0.0) & (vn >= 0.0) & (un + vn <= nd2)
            return hit & (tn > C.T_MIN * nd2) & (tn < t_hi * nd2)
        t = -no_ / jnp.where(good, ndd, 1.0)
        u = uo + t * ud
        v = vo + t * vd
        hit = good & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        return hit & (t > C.T_MIN) & (t < t_hi)

    def sph_math(b, X, oo, od, t_hi):
        wb = wsph_ref[:, b * 2 * LANES : (b + 1) * 2 * LANES]
        out = lax.dot_general(
            wb, X, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=_MM_PREC,
        ).reshape(2, LANES, R)
        ct, cd = out[0], out[1]
        b_half = od - cd
        disc = b_half * b_half - (oo + ct)
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        t0 = -b_half - sq
        t1 = -b_half + sq
        t0_ok = has & (t0 > C.T_MIN) & (t0 < t_hi)
        t1_ok = has & (t1 > C.T_MIN) & (t1 < t_hi)
        return jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, C.T_NONE))

    iota_ch = lax.broadcasted_iota(jnp.int32, (LANES, RCH), 0)

    def fold(tm, u, v, attr_blk, sl=slice(None), iota=None):
        """Fold (128, chunk) candidates into the chunk slice of the bests.

        Tie-breaking on exact-equal t: across blocks/clusters the candidate
        with the SMALLER global primitive id wins (oracle argmin-first
        convention; spheres carry gid >= n_tris so triangles beat spheres).
        Within one 128-lane block, ties resolve by lane position — only
        exactly-coincident triangles in the same cluster can differ, and
        those shade identically unless their materials differ."""
        iota = iota_sub if iota is None else iota
        bt = jnp.min(tm, axis=0, keepdims=True)
        bidx = jnp.min(jnp.where(tm == bt, iota, LANES), axis=0, keepdims=True)
        onehot = (iota == bidx).astype(f32)
        cand = lax.dot_general(
            attr_blk, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )  # (TROWS, chunk)
        cu = jnp.sum(onehot * u, axis=0, keepdims=True)
        cv = jnp.sum(onehot * v, axis=0, keepdims=True)
        cand_gid = cand[PC.R_GID : PC.R_GID + 1]
        cur_gid = ab[PC.R_GID : PC.R_GID + 1, sl]
        tie = (bt == tb[:, sl]) & (bt < C.T_NONE) & (cand_gid < cur_gid)
        imp = (bt < tb[:, sl]) | tie
        tb[:, sl] = jnp.where(imp, bt, tb[:, sl])
        ab[:, sl] = jnp.where(imp, cand, ab[:, sl])
        ub[:, sl] = jnp.where(imp, cu, ub[:, sl])
        vb[:, sl] = jnp.where(imp, cv, vb[:, sl])

    def dmas(slot, c, with_attrs):
        # `c` is a CLUSTER id (SPAN == 1) or a packed run entry (SPAN > 1:
        # start = c >> 3; the whole SPAN-cluster window is fetched in ONE
        # copy per array — runs shorter than SPAN over-fetch into packc's
        # zero pad, never processed).
        if SPAN > 1:
            start = c >> 3
            ops = [pltpu.make_async_copy(
                wtri_hbm.at[pl.ds(start, SPAN)], wscr.at[slot],
                sems.at[slot, 0])]
            if with_attrs:
                ops.append(pltpu.make_async_copy(
                    attr_hbm.at[pl.ds(start, SPAN)], ascr.at[slot],
                    sems.at[slot, 1]))
            return ops
        # TPURT_PROF_DMA_ROWS (stream-stage probe only): fetch that many of
        # the 8 form rows — values are garbage-but-finite (only _consume'd),
        # the BYTES scale proportionally.  Differencing stream-stage times
        # at 8 vs 2 rows separates DMA-transfer cost from scalar sequencing
        # (the r5 prestack negative suggested the stream is transfer-bound).
        if PROF == "stream" and PROF_DMA_ROWS:
            ops = [pltpu.make_async_copy(
                wtri_hbm.at[c, 0:PROF_DMA_ROWS], wscr.at[slot, 0:PROF_DMA_ROWS],
                sems.at[slot, 0])]
        else:
            ops = [pltpu.make_async_copy(wtri_hbm.at[c], wscr.at[slot],
                                         sems.at[slot, 0])]
        if with_attrs:
            ops.append(
                pltpu.make_async_copy(attr_hbm.at[c], ascr.at[slot], sems.at[slot, 1])
            )
        return ops

    def survivors():
        """Effective survivor count + id lookup; a tile that overflowed the
        SMEM list degrades to streaming every cluster (correct, slower).
        Under SPAN entries are packed (start << 3) | (len-1) runs; the
        overflow fallback iterates every cluster as a length-1 run."""
        ovf = sovf[0] == 1
        n = jnp.where(ovf, Ccount, jnp.minimum(scnt[0], MAXS))

        def sid(j):
            ent = slist[jnp.minimum(j, MAXS - 1)]
            if SPAN > 1:
                return jnp.where(ovf, j << 3, ent)
            return jnp.where(ovf, j, ent)

        return n, sid

    def cluster_range(X, j0, j1, sid, with_attrs):
        """Stream survivor-list entries [j0, j1) with a DEPTH-deep DMA
        pipeline: per-cluster compute (~0.7 µs) is shorter than HBM DMA
        latency, so a 2-deep pipeline stalls on the wait; issuing several
        clusters ahead keeps the DMA engine saturated."""
        DEPTH = DMA_DEPTH
        n_seg = j1 - j0

        @pl.when(n_seg > 0)
        def _():
            # clusters actually streamed (vs emitted): quantifies what the
            # front-to-back termination saved — surfaced by traversal_stats
            s_strm[0, tile_id] = s_strm[0, tile_id] + n_seg
            for ahead in range(DEPTH - 1):
                @pl.when(ahead < n_seg)
                def _(ahead=ahead):
                    for op in dmas(ahead % DEPTH, sid(j0 + ahead), with_attrs):
                        op.start()

            def one_cluster(c, wsub, asub, ch_gate=None):
                """Per-cluster chunk loop (shared by the singleton and
                span paths); wsub/asub are this cluster's scratch views."""
                cw = c // 16
                cb = c % 16
                if MM3X and PRESTACK:
                    wblk = wsub.reshape(_MM_SROWS, 6 * LANES)
                else:
                    wblk = wsub.reshape(8, 6 * LANES)
                    if MM3X:
                        wblk = stack_w(wblk)
                for ch in range(nch):
                    bit = (masks[KB + ch, cw] >> cb) & 1

                    @pl.when(bit != 0)
                    def _(ch=ch):
                        s_chnk[0, tile_id] = s_chnk[0, tile_id] + 1
                        sl = slice(ch * RCH, (ch + 1) * RCH)
                        if PROF == "stream":
                            tb[:, sl] = tb[:, sl] + _consume(wblk, asub)
                        elif PROF == "mmraw":
                            out = _mm(wblk, X[:, sl])
                            tb[:, sl] = tb[:, sl] + _consume(out, asub)
                        elif PROF == "mm":
                            tm, u, v = tri_math(wblk, X[:, sl], C.T_MAX)
                            tb[:, sl] = tb[:, sl] + _consume(
                                tm, u, v, asub)
                        else:
                            tm, u, v = tri_math(wblk, X[:, sl], C.T_MAX)
                            fold(tm, u, v, asub, sl, iota_ch)

            def body(i, _):
                slot = i % DEPTH
                c = sid(j0 + i)

                @pl.when(i + DEPTH - 1 < n_seg)
                def _():
                    for op in dmas(
                        (i + DEPTH - 1) % DEPTH, sid(j0 + i + DEPTH - 1),
                        with_attrs,
                    ):
                        op.start()

                for op in dmas(slot, c, with_attrs):
                    op.wait()
                if SPAN > 1:
                    start = c >> 3
                    ln = (c & 7) + 1
                    for j2 in range(SPAN):
                        @pl.when(j2 < ln)
                        def _(j2=j2):
                            one_cluster(start + j2, wscr[slot, j2],
                                        ascr[slot, j2])
                else:
                    one_cluster(c, wscr[slot], ascr[slot])
                return 0

            lax.fori_loop(0, n_seg, body, 0, unroll=False)

    def update_tmax_key(alive_t):
        """DMA the int key of max-over-live-lanes best t into SMEM so the
        scalar core can gate the next bucket (vector→scalar goes through
        memory on this machine; ~200 B per update, KB-1 updates per pass)."""
        tmaxv = jnp.max(jnp.where(alive_t, tb[...], -_BIG), axis=1,
                        keepdims=True)
        # bitcast AFTER broadcasting: tpu.bitcast lowers only for vectors
        keyv[0:1, :] = fkey(jnp.broadcast_to(tmaxv, (1, LANES)))
        cp = pltpu.make_async_copy(keyv.at[0], keys_s.at[0], ksem)
        cp.start()
        cp.wait()

    def closest(o3, d3, alive):
        """Best hit → (t, attrs (TROWS,R), u, v) via scratch refs.

        Order: resident spheres first (cheap, tightens bests), then cluster
        buckets front to back; bucket k > 0 is skipped entirely once every
        live ray's best hit is nearer than the bucket's entry threshold —
        the t-termination that makes occluder-dense scenes cheap.  Skips
        are exact, never approximate: a skipped cluster's conservative
        entry exceeds the farthest current best, so none of its hits could
        win (ties impossible: entry > tmax is strict)."""
        X = build_X(o3, d3)
        tb[...] = jnp.full((1, R), C.T_NONE, f32)
        ab[...] = jnp.zeros((TROWS, R), f32)
        ub[...] = jnp.zeros((1, R), f32)
        vb[...] = jnp.zeros((1, R), f32)
        if PROF == "launch":
            return tb[...], ab[...], ub[...], vb[...]
        alive_t = alive & root_hit(o3, d3)
        ok, entry = _interval_ok(o3, d3, alive_t)
        if PROF == "cull":
            tb[...] = tb[...] + _consume(entry, ok)
            return tb[...], ab[...], ub[...], vb[...]
        # DMA list = union of the chunk culls (tighter than a whole-tile
        # interval test); chunk bits gate the per-chunk epilogues
        ok_u = jnp.any(ok, axis=0, keepdims=True)
        entry_u = jnp.min(jnp.where(ok, entry, _BIG), axis=0, keepdims=True)
        cull_to_smem(ok_u, entry_u, [ok])
        oo = _dot3(o3, o3)
        od = _dot3(o3, d3)
        for b in range(nb_s):
            tm = sph_math(b, X, oo, od, C.T_MAX)
            zero = jnp.zeros_like(tm)
            fold(tm, zero, zero, sattr_ref[:, b * LANES : (b + 1) * LANES])
        if PROF == "scan":
            return tb[...], ab[...], ub[...], vb[...]
        if MM3X:
            X = stack_x(X)  # (24, R) bf16 — once per pass
        n, sid = survivors()
        ovf = sovf[0] == 1
        for kb in range(KB):
            if kb == 0:
                j1 = jnp.where(ovf, n, jnp.minimum(bstart[1], n))
                cluster_range(X, jnp.int32(0), j1, sid, True)
            else:
                j0 = jnp.where(ovf, n, jnp.minimum(bstart[kb], n))
                j1 = jnp.where(ovf, n, jnp.minimum(bstart[kb + 1], n))
                if kb == 1:
                    # ONE tmax snapshot after the nearest bucket instead of
                    # one vector→scalar DMA round trip per bucket: nearly
                    # all tightening comes from bucket 0 (near geometry
                    # wins), and a STALE (larger) tmax only weakens the
                    # gate, never breaks the exact-skip invariant — each
                    # DMA wait is µs-scale hard serialization and the
                    # per-pass fixed cost is the measured wall
                    update_tmax_key(alive_t)

                @pl.when(masks[THR_ROW, kb] <= keys_s[0, 0])
                def _(j0=j0, j1=j1):
                    cluster_range(X, j0, j1, sid, True)
        return tb[...], ab[...], ub[...], vb[...]

    def occluded(o3, d3, tmax, alive, cull_ray=None):
        """Any-hit within (T_MIN, tmax) along the ray (o3, d3) → (1, R) bool.

        Intersection math runs on (o3, d3) with the oracle's exact band
        (T_MIN, tmax) — bit-compatible with `geom.any_hit` — but the
        CULL may use a different parametrization of the same segment:
        `cull_ray = (o_c, d_c, tmax_c)`.  The shadow pass passes the ray
        reversed, FROM the light TOWARD the surface: the segment covers
        the same geometry (so the cull stays conservative for the forward
        intersection) but the cull ray-set's origin interval collapses to
        a point, keeping the per-tile frustum a thin cone even when the
        tile's hit points straddle a depth discontinuity — the case that
        made surface-origin shadow culls admit most of the scene.

        Intersecting along the reversed ray directly is a recorded
        negative result: the originating surface sits at
        t = dist − eps·(n·l̂), i.e. exactly AT the tmax = dist − eps
        boundary whenever the normal points straight at the light, so
        every directly-lit point becomes an ulp-noise knife edge (1-bit
        occ flips between the wavefront and multibounce paths, which
        compute p_off in different float op orders).

        Early exit: shadow rays saturate (a corridor of geometry occludes
        every live lane) far before the survivor list is exhausted; the
        while_loop stops once no live lane remains unoccluded.  The next
        DMA is started BEFORE the current cluster's compute (overlap), and
        only when the pre-compute state says we will continue — so at most
        one extra cluster runs after saturation and no semaphore is left
        signaled for the next pass.

        Fusing all lights into one pass (shared cull + DMA stream) was
        tried twice and is a recorded negative result both times — see
        docs/design.md: the union survivor list runs until EVERY light
        saturates, which costs more than it saves even with per-light
        batch gating (r2: +40% on config 5's b0 shadow pass)."""
        X = build_X(o3, d3)
        occb[...] = jnp.zeros((1, R), jnp.int32)
        if PROF == "launch":
            return occb[...] > 0
        alive_t = alive & root_hit(o3, d3)
        alive_i = alive_t.astype(jnp.int32)
        o_c, d_c, tmax_c = cull_ray if cull_ray is not None else (o3, d3, tmax)
        ok, entry = _interval_ok(o_c, d_c, alive_t, tmax=tmax_c)
        if PROF == "cull":
            tb[...] = tb[...] + _consume(entry, ok)
            return occb[...] > 0
        # union-of-chunks DMA list (cull chunks align 1:1 with forward-ray
        # chunks: the reversed parametrization covers the same segments)
        ok_u = jnp.any(ok, axis=0, keepdims=True)
        entry_u = jnp.min(jnp.where(ok, entry, _BIG), axis=0, keepdims=True)
        # any-hit never reads the bucket thresholds (no t-termination)
        cull_to_smem(ok_u, entry_u, [ok], reverse=SHADOW_NEAR_FIRST,
                     want_keys=False)

        # resident spheres first: saturation may exit before any DMA
        oo = _dot3(o3, o3)
        od = _dot3(o3, d3)
        for b in range(nb_s):
            tm = sph_math(b, X, oo, od, C.T_MAX)
            occb[...] = occb[...] | jnp.any(
                tm < tmax, axis=0, keepdims=True
            ).astype(jnp.int32)
        if PROF == "scan":
            return occb[...] > 0
        if MM3X:
            X = stack_x(X)  # (24, R) bf16 — once per pass

        n, sid = survivors()

        # Stream per cluster in blocks of NBLK: within a block the DMA
        # pipeline runs DEPTH-deep with no data-dependent control (like
        # cluster_range), and the saturation check — a vector→scalar reduce
        # that serializes against the VPU — happens ONCE per block.
        # Batching NBO clusters into one matmul was tried and reverted:
        # the per-survivor cost is ~60% VPU epilogue, and gating chunks by
        # the UNION of the block's cull bits added more epilogue work than
        # the amortized matmul dispatch saved (config4 26.9 → 23.8, config5
        # flat).  Per-cluster chunk bits keep the epilogue minimal.
        NBLK = int(os.environ.get("TPURT_NBLK", "8"))
        DEPTH = DMA_DEPTH

        # ---- per-chunk saturation bits -----------------------------------
        # live_bits: bit ch set ⇔ chunk ch still has an alive, unoccluded
        # lane.  Refreshed once per NBLK block (monotone: bits only clear),
        # it (a) gates each survivor×chunk epilogue — a saturated chunk
        # skips ALL remaining compute, not just the whole-tile exit — and
        # (b) subsumes the tile-level early exit (live_bits == 0).  The
        # per-chunk reduce rides the MXU: unocc (1, R) × chunk-selector
        # (R, LANES) → per-chunk counts (exact small ints in bf16×bf16→f32),
        # then ONE vector→scalar reduce (sum of distinct powers of two = OR)
        # — the same serialization count as the old jnp.any check.
        sel_rows = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        sel_cols = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        chunk_sel = ((sel_rows // RCH) == sel_cols).astype(jnp.bfloat16)
        lane_128 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        pow2_lane = jnp.where(lane_128 < nch, jnp.left_shift(1, lane_128), 0)

        def live_chunk_bits():
            unocc = ((alive_i - occb[...]) > 0).astype(jnp.bfloat16)
            counts = lax.dot_general(
                unocc, chunk_sel, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )                                          # (1, LANES)
            return jnp.sum(jnp.where(counts > 0.0, pow2_lane, 0))

        @pl.when(n > 0)
        def _():
            nb = (n + NBLK - 1) // NBLK

            def cond(carry):
                return carry[1] != 0

            def body(carry):
                jb, live_bits = carry
                j0 = jb * NBLK
                seg = jnp.minimum(j0 + NBLK, n) - j0
                for ahead in range(DEPTH - 1):
                    @pl.when(ahead < seg)
                    def _(ahead=ahead):
                        for op in dmas(ahead % DEPTH, sid(j0 + ahead), False):
                            op.start()

                def one_cluster_ah(c, wsub, live_bits):
                    cw = c // 16
                    cb = c % 16
                    if MM3X and PRESTACK:
                        wblk = wsub.reshape(_MM_SROWS, 6 * LANES)
                    else:
                        wblk = wsub.reshape(8, 6 * LANES)
                        if MM3X:
                            wblk = stack_w(wblk)
                    for ch in range(nch):
                        bit = (masks[KB + ch, cw] >> cb) & 1

                        @pl.when((bit & (live_bits >> ch)) != 0)
                        def _(ch=ch):
                            s_chnk[0, tile_id] = s_chnk[0, tile_id] + 1
                            sl = slice(ch * RCH, (ch + 1) * RCH)
                            if PROF == "stream":
                                occb[:, sl] = occb[:, sl] | (
                                    _consume(wblk) > 0.5
                                ).astype(jnp.int32)
                            elif PROF == "mmraw":
                                out = _mm(wblk, X[:, sl])
                                occb[:, sl] = occb[:, sl] | (
                                    _consume(out) > 0.5
                                ).astype(jnp.int32)
                            else:  # "mm" ≡ full for any-hit (no fold)
                                hit = tri_hit(
                                    wblk, X[:, sl], tmax[:, sl], LANES,
                                )
                                occb[:, sl] = occb[:, sl] | jnp.any(
                                    hit, axis=0, keepdims=True
                                ).astype(jnp.int32)

                def inner(i, _):
                    slot = i % DEPTH
                    c = sid(j0 + i)

                    @pl.when(i + DEPTH - 1 < seg)
                    def _():
                        for op in dmas(
                            (i + DEPTH - 1) % DEPTH,
                            sid(j0 + i + DEPTH - 1), False,
                        ):
                            op.start()

                    for op in dmas(slot, c, False):
                        op.wait()
                    if SPAN > 1:
                        start = c >> 3
                        ln = (c & 7) + 1
                        for j2 in range(SPAN):
                            @pl.when(j2 < ln)
                            def _(j2=j2):
                                one_cluster_ah(start + j2, wscr[slot, j2],
                                               live_bits)
                    else:
                        one_cluster_ah(c, wscr[slot], live_bits)
                    return 0

                if SHADOW_UNROLL:
                    # statically-unrolled NBLK steps with guards: removes
                    # per-iteration loop control from the scalar core (the
                    # stream is sequencing-bound; A/B flag)
                    for i in range(NBLK):
                        @pl.when(i < seg)
                        def _(i=i):
                            inner(i, 0)
                else:
                    lax.fori_loop(0, seg, inner, 0, unroll=False)
                nxt = live_chunk_bits()
                return (jb + 1, jnp.where(jb + 1 < nb, nxt, 0))

            blocks, _ = lax.while_loop(cond, body, (0, live_chunk_bits()))
            s_strm[0, tile_id] = s_strm[0, tile_id] + jnp.minimum(
                blocks * NBLK, n
            )

        return occb[...] > 0

    # ---- Whitted record loop ---------------------------------------------
    # alive: in-image lanes that are still on a live reflection path; dead
    # lanes keep computing (SIMD) but never influence the cull
    def whitted_loop(alive, o, d):
      for depth in range(max_depth + 1):
        t, a, u, v = closest(o, d, alive)
        hit = (t < C.T_MAX) & alive

        def a1(k):
            return a[k : k + 1]

        def a3(k):
            return (a1(k), a1(k + 1), a1(k + 2))

        gid = a1(PC.R_GID)
        is_sph = gid >= float(T_total)
        p = _add3(o, _scale3(d, t))
        w_bar = 1.0 - u - v
        n_int = _normalize3(
            _add3(
                _scale3(a3(PC.R_N0), w_bar),
                _add3(_scale3(a3(PC.R_N1), u), _scale3(a3(PC.R_N2), v)),
            )
        )
        n_tri = _where3(_dot3(n_int, d) > 0.0, _neg3(n_int), n_int)
        n_sph = _normalize3(_sub3(p, a3(PC.R_CENTER)))
        n = _where3(is_sph, n_sph, n_tri)
        p_off = _add3(p, _scale3(n, C.RAY_OFFSET_EPS))

        # round before the int cast: gid arrives through a HIGHEST-precision
        # one-hot matmul (exact in principle), but any sub-ulp error would
        # truncate to the wrong id — same bug class as the exp2 word-pack
        # truncation above
        id_ref[depth : depth + 1, :] = jnp.where(
            hit, jnp.round(gid), -1.0
        ).astype(jnp.int32)
        # best-t record: lets scene-sharded ring rendering merge per-shard
        # partial hits by (t, gid) at XLA level (tpurt/dist/scene_shard.py)
        t_ref[depth : depth + 1, :] = jnp.where(hit, t, C.T_NONE)

        occ_bits = jnp.zeros((1, R), jnp.int32)
        if shadows:
            for li in range(n_lights):
                # intersection ray: surface → light, exactly the oracle's
                # convention (geom.any_hit, ref/oracle.py:142).  cull ray:
                # the SAME segment reversed, light → surface — its origin
                # interval is a single point, so the per-tile cull frustum
                # stays a thin cone even when the tile's hit points span a
                # depth discontinuity (the case that made surface-origin
                # shadow culls admit most of the scene).  tmax_c = dist
                # covers the forward band (T_MIN, dist − eps) with slack —
                # the cull is conservative, the eps bands don't matter.
                lpos = g3(PK.NGLOB_BASE + 3 * li)
                to_l = _sub3(lpos, p)   # dist from p, NOT p_off — oracle's
                dist = jnp.sqrt(_dot3(to_l, to_l))  # exact convention
                ldir = _scale3(to_l, 1.0 / jnp.maximum(dist, 1e-20))
                o_l = tuple(jnp.broadcast_to(c, (1, R)) for c in lpos)
                occ = occluded(
                    p_off, ldir, dist - C.RAY_OFFSET_EPS, hit,
                    cull_ray=(o_l, _neg3(ldir), dist))
                # mask by hit: dead lanes compute garbage rays (SIMD) and
                # may report occlusion; records keep them at exactly 0
                occ_bits = occ_bits | jnp.where(occ & hit, 1 << li, 0)
        occ_ref[depth : depth + 1, :] = occ_bits

        o = p_off
        d = _reflect3(d, n)
        # a path survives only while its throughput is nonzero: hits on
        # non-reflective material (reflectivity == 0) terminate the path.
        # Record convention: dead lanes get id -1 / occ 0 from the next
        # depth on (records_oracle matches); deferred shading ignores them
        # (throughput is already zero).  For scenes with no reflective
        # materials this makes every bounce > 0 near-free.
        alive = hit & (a1(PC.R_REFL) > 0.0)

    if mode == 1:
        # wavefront mode: tiles past the live-ray count are skipped whole —
        # off_ref carries n_live_tiles; their outputs stay at the defaults
        D = max_depth + 1
        id_ref[...] = jnp.full((D, R), -1, jnp.int32)
        occ_ref[...] = jnp.zeros((D, R), jnp.int32)
        t_ref[...] = jnp.full((D, R), C.T_NONE, jnp.float32)

        @pl.when(tile_id < off_ref[0, 0])
        def _():
            whitted_loop(alive0, o, d)
    elif mode == 2:
        # shadow-only mode over re-binned hit points: each tile is a
        # compact 3D cell of surface points (Morton order), so the
        # reversed light→cell cull cone is as thin as the geometry allows
        # — unlike pixel tiles, where one silhouette straddling the tile
        # fans the cone across the whole depth range.  Ray construction
        # and the occlusion band are EXACTLY whitted_loop's (origin p_off,
        # direction toward the light normalized from p, band
        # (T_MIN, dist − eps) with dist measured from p).
        occ_ref[...] = jnp.zeros((1, R), jnp.int32)
        p3 = (px_ref[...], py_ref[...], pz_ref[...])
        q3 = (qx_ref[...], qy_ref[...], qz_ref[...])

        @pl.when(tile_id < off_ref[0, 0])
        def _():
            bits = jnp.zeros((1, R), jnp.int32)
            for li in range(n_lights):
                lpos = g3(PK.NGLOB_BASE + 3 * li)
                to_l = _sub3(lpos, p3)
                dist = jnp.sqrt(_dot3(to_l, to_l))
                ldir = _scale3(to_l, 1.0 / jnp.maximum(dist, 1e-20))
                o_l = tuple(jnp.broadcast_to(c, (1, R)) for c in lpos)
                occ = occluded(
                    q3, ldir, dist - C.RAY_OFFSET_EPS, alive0,
                    cull_ray=(o_l, _neg3(ldir), dist))
                bits = bits | jnp.where(occ & alive0, 1 << li, 0)
            occ_ref[...] = bits
    else:
        # pixel-tile mode: write default records first, then skip EVERY
        # pass when no ray of the tile can enter the scene root box — an
        # all-sky tile otherwise pays the full per-pass fixed cost
        # (cull + pack + DMA + scan) for the closest pass AND each
        # in-kernel shadow pass, streaming nothing (config 4 measures
        # ~45 µs/pass at 6.6 survivors; open frames are 25-35% sky tiles).
        # Default records bit-match what whitted_loop writes for all-miss
        # tiles (id -1, occ 0, t T_NONE).
        D = max_depth + 1
        id_ref[...] = jnp.full((D, R), -1, jnp.int32)
        occ_ref[...] = jnp.zeros((D, R), jnp.int32)
        t_ref[...] = jnp.full((D, R), C.T_NONE, jnp.float32)
        rh = alive0 & root_hit(o, d)
        # vector→scalar goes through memory on this machine: ship the
        # live count via the (1, LANES) key row (rewritten later by
        # update_tmax_key — this use strictly precedes it)
        keyv[0:1, :] = jnp.broadcast_to(
            jnp.sum(rh.astype(jnp.int32), axis=1, keepdims=True),
            (1, LANES))
        cp = pltpu.make_async_copy(keyv.at[0], keys_s.at[0], ksem)
        cp.start()
        cp.wait()

        @pl.when(keys_s[0, 0] > 0)
        def _():
            whitted_loop(alive0, o, d)


# ---------------------------------------------------------------------------
# pallas_call wrapper + public clustered render path
# ---------------------------------------------------------------------------
def _scratch_shapes(C_pad, nch=NCH, rays=RAYS):
    mrows = KB + nch + KB + 1  # +1: bucket-threshold key row
    return [
        pltpu.VMEM((mrows, C_pad // 16), jnp.int32),  # maskv (packed+meta)
        pltpu.SMEM((mrows, C_pad // 16), jnp.int32),  # masks (packed+meta)
        pltpu.SMEM((min(C_pad, MAXS),), jnp.int32),   # slist
        pltpu.SMEM((1,), jnp.int32),              # scnt
        pltpu.SMEM((1,), jnp.int32),              # sovf (list overflow)
        (pltpu.VMEM((DMA_DEPTH, _MM_SROWS, 6 * LANES), jnp.bfloat16)
         if (MM3X and PRESTACK)
         else (pltpu.VMEM((DMA_DEPTH, SPAN, 8, 6, LANES), jnp.float32)
               if SPAN > 1
               else pltpu.VMEM((DMA_DEPTH, 8, 6, LANES),
                               jnp.float32))),                # wscr
        (pltpu.VMEM((DMA_DEPTH, SPAN, TROWS, LANES), jnp.float32)
         if SPAN > 1
         else pltpu.VMEM((DMA_DEPTH, TROWS, LANES),
                         jnp.float32)),                       # ascr
        pltpu.VMEM((1, rays), jnp.float32),       # tb
        pltpu.VMEM((TROWS, rays), jnp.float32),   # ab
        pltpu.VMEM((1, rays), jnp.float32),       # ub
        pltpu.VMEM((1, rays), jnp.float32),       # vb
        pltpu.VMEM((1, rays), jnp.int32),         # occb
        pltpu.SemaphoreType.DMA((DMA_DEPTH, 2)),  # sems[slot, stream]
        pltpu.SemaphoreType.DMA(()),              # ssem (mask copy)
        pltpu.SMEM((KB + 1,), jnp.int32),         # bstart (bucket bounds)
        pltpu.VMEM((1, LANES), jnp.int32),        # keyv [tmax key]
        pltpu.SMEM((1, LANES), jnp.int32),        # keys_s
        pltpu.SemaphoreType.DMA(()),              # ksem (key copies)
    ]


def _glob_pad(packed):
    glob = packed.globals
    gpad = -(-glob.shape[1] // LANES) * LANES
    return jnp.pad(glob, ((0, 0), (0, gpad - glob.shape[1])))


def _wtri_op(packed):
    """The streamed triangle-form operand: prestacked (C, SROWS, 768) bf16
    when PRESTACK (built once per frame at XLA level, CSE'd across the
    frame's passes), else the raw (C, 8, 6, LANES) f32 forms."""
    if MM3X and PRESTACK:
        return prestack_wtri(packed.wtri_c)
    return packed.wtri_c


def trace_records(packed: PackedClusters, config, row0, nrows: int,
                  max_depth: int | None = None,
                  shadows: bool | None = None):
    """Run the traversal kernel → (ids, occ) each (D, ntiles·RAYS) int32,
    tile-major (reassembled into image order by render_rows_clustered).

    ids: global primitive id per bounce (-1 miss; >= n_tris ⇒ sphere).
    Inputs are stop_gradient'ed: topology is non-differentiable by design
    (gradients flow through deferred shading instead).  `max_depth`
    overrides config.max_depth (the wavefront driver traces depth 0 here
    and later bounces via trace_bounce)."""
    packed = jax.lax.stop_gradient(packed)
    md = config.max_depth if max_depth is None else max_depth
    sh = config.shadows if shadows is None else shadows
    D = md + 1
    W = config.width
    nty = -(-nrows // TILE_H)
    ntx = -(-W // TILE_W)
    ntiles = nty * ntx
    C_pad = packed.aabb.shape[1]
    glob = _glob_pad(packed)
    statics = (
        config.height, config.width, md, sh,
        packed.n_clusters, packed.n_sph_blocks, packed.n_lights,
        packed.n_tris, RAYS, ntx, 0,
    )
    off = jnp.asarray(row0, jnp.int32).reshape(1, 1)
    ids, occ, tbest, s_surv, s_pass, s_ovf, s_strm, s_chnk = pl.pallas_call(
        functools.partial(_trav_kernel, statics=statics),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((D, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, ntiles * RAYS), jnp.int32),
            jax.ShapeDtypeStruct((D, ntiles * RAYS), jnp.int32),
            jax.ShapeDtypeStruct((D, ntiles * RAYS), jnp.float32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
        ],
        scratch_shapes=_scratch_shapes(C_pad),
        interpret=_interpret(),
    )(off, glob, packed.wsph, packed.sattr, packed.aabb,
      _wtri_op(packed), packed.attr_c)
    return (ids, occ, tbest,
            jnp.concatenate([s_surv, s_pass, s_ovf, s_strm, s_chnk],
                            axis=0))


def trace_bounce(packed: PackedClusters, config, o, d, alive, n_live,
                 shadows: bool | None = None):
    """One wavefront bounce over an explicit (binned) ray set.

    o, d: (N, 3) f32 unit rays, N a multiple of RAYS; alive (N,) bool;
    n_live: traced int32 count of live rays (live rays must be sorted to the
    front — tiles past ceil(n_live/RAYS) are skipped inside the kernel).
    Returns (ids (N,), occ (N,), stats (3, ntiles)) in the SAME ray order.
    """
    packed = jax.lax.stop_gradient(packed)
    sg = jax.lax.stop_gradient
    o, d = sg(o), sg(d)
    N = o.shape[0]
    assert N % RAYS == 0, N
    ntiles = N // RAYS
    C_pad = packed.aabb.shape[1]
    glob = _glob_pad(packed)
    statics = (
        config.height, config.width, 0,
        config.shadows if shadows is None else shadows,
        packed.n_clusters, packed.n_sph_blocks, packed.n_lights,
        packed.n_tris, RAYS, 1, 1,
    )
    nlive_tiles = ((n_live + RAYS - 1) // RAYS).astype(jnp.int32).reshape(1, 1)
    row = lambda x: x.reshape(1, N)                          # noqa: E731
    ray_spec = pl.BlockSpec((1, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM)
    ids, occ, tbest, s_surv, s_pass, s_ovf, s_strm, s_chnk = pl.pallas_call(
        functools.partial(_trav_kernel, statics=statics),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
        ],
        scratch_shapes=_scratch_shapes(C_pad),
        interpret=_interpret(),
    )(nlive_tiles, glob, packed.wsph, packed.sattr, packed.aabb,
      row(o[:, 0]), row(o[:, 1]), row(o[:, 2]),
      row(d[:, 0]), row(d[:, 1]), row(d[:, 2]),
      row(alive.astype(jnp.int32)),
      _wtri_op(packed), packed.attr_c)
    return (ids[0], occ[0], tbest[0],
            jnp.concatenate([s_surv, s_pass, s_ovf, s_strm, s_chnk],
                            axis=0))


def trace_shadows(packed: PackedClusters, config, p, p_off, alive, n_live):
    """Occlusion bits for ALL lights over an explicit (binned) set of hit
    points — the shadow-wavefront pass (SURVEY.md §7 step 5 applied to
    shadow rays).

    p, p_off: (N, 3) f32 hit points / eps-offset origins, N a multiple of
    RAYS, live points sorted to the front (Morton order of p); alive (N,)
    bool; n_live traced int32.  Returns occ (N,) int32 (bit l ⇔ light l
    occluded), same order.  Ray construction and bands match whitted_loop's
    in-kernel shadows exactly (dist measured from p, origin p_off)."""
    packed = jax.lax.stop_gradient(packed)
    sg = jax.lax.stop_gradient
    p, p_off = sg(p), sg(p_off)
    N = p.shape[0]
    RS = RAYS_SHADOW
    assert N % RS == 0, N
    ntiles = N // RS
    C_pad = packed.aabb.shape[1]
    glob = _glob_pad(packed)
    statics = (
        config.height, config.width, 0, True,
        packed.n_clusters, packed.n_sph_blocks, packed.n_lights,
        packed.n_tris, RS, 1, 2,
    )
    nlive_tiles = ((n_live + RS - 1) // RS).astype(jnp.int32).reshape(1, 1)
    row = lambda x: x.reshape(1, N)                          # noqa: E731
    ray_spec = pl.BlockSpec((1, RS), lambda t: (0, t), memory_space=pltpu.VMEM)
    occ, s_surv, s_pass, s_ovf, s_strm, s_chnk = pl.pallas_call(
        functools.partial(_trav_kernel, statics=statics),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, RS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
            jax.ShapeDtypeStruct((1, ntiles), jnp.int32),
        ],
        scratch_shapes=_scratch_shapes(C_pad, NCH_SHADOW, RS),
        interpret=_interpret(),
    )(nlive_tiles, glob, packed.wsph, packed.sattr, packed.aabb,
      row(p[:, 0]), row(p[:, 1]), row(p[:, 2]),
      row(p_off[:, 0]), row(p_off[:, 1]), row(p_off[:, 2]),
      row(alive.astype(jnp.int32)),
      _wtri_op(packed), packed.attr_c)
    return (occ[0],
            jnp.concatenate([s_surv, s_pass, s_ovf, s_strm, s_chnk],
                            axis=0))


def _untile(x, nrows, W):
    """(D, ntiles·RAYS) tile-major → (D, nrows·W) image-major."""
    D = x.shape[0]
    nty = -(-nrows // TILE_H)
    ntx = -(-W // TILE_W)
    x = x.reshape(D, nty, ntx, TILE_H, TILE_W)
    x = x.transpose(0, 1, 3, 2, 4).reshape(D, nty * TILE_H, ntx * TILE_W)
    return x[:, :nrows, :W].reshape(D, nrows * W)


def _part1by2(x):
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _bin_key_pts(p, lo, hi, alive):
    """Morton key of a 3D point (no direction bits): the shadow-wavefront
    pass bins HIT POINTS into compact cells, so each kernel tile's
    light-origin cull cone is as thin as the geometry allows.  Dead lanes
    sort to the end."""
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((p - lo) / ext, 0.0, 1.0)
    cell = (q * 1023.0).astype(jnp.int32)
    m = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    return jnp.where(alive, m, jnp.int32(2**30))


def _bin_key(p, d, lo, hi, alive):
    """Wavefront binning key: direction octant (high bits) then 9-bit-per-
    axis Morton code of the ray origin — groups secondary rays into tiles
    whose origin box AND direction cone are both tight, which is what the
    per-tile interval cull needs to stay selective (BASELINE "wavefront-
    style ray compaction").  Dead rays sort to the end."""
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((p - lo) / ext, 0.0, 1.0)
    cell = (q * 511.0).astype(jnp.int32)
    m = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    octant = (
        ((d[:, 0] < 0).astype(jnp.int32) << 2)
        | ((d[:, 1] < 0).astype(jnp.int32) << 1)
        | (d[:, 2] < 0).astype(jnp.int32)
    )
    key = (octant << 27) | m
    return jnp.where(alive, key, jnp.int32(2**30))


def _continue_rays(scene_sg, o, d, ids, T):
    """Reflection continuation at XLA level from a bounce's records (all on
    stop_gradient values — ray positions are kernel inputs, never a gradient
    path; the differentiable replay lives in tpurt/shading/deferred.py)."""
    from tpurt.shading.deferred import _hit_geometry, _recompute_tuv

    from tpurt.core import vec

    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    t, u, v = _recompute_tuv(scene_sg, o, d, prim, is_tri)
    p, n, mat = _hit_geometry(scene_sg, o, d, t, prim, is_tri, u, v)
    o2 = p + n * C.RAY_OFFSET_EPS
    d2 = vec.reflect(d, n)
    refl = scene_sg.materials.reflectivity[mat]
    alive = (~miss) & (refl > 0.0)
    return o2, d2, alive, p


def _wavefront_records(scene, config, packed, row0, nrows):
    """Per-bounce wavefront tracing: bounce 0 uses in-kernel ray-gen over
    square pixel tiles; each later bounce re-bins its live rays by
    direction-octant + origin-Morton, traces only ceil(n_live/RAYS) tiles,
    and scatters records back to pixel order.  SURVEY.md §7 step 5."""
    from tpurt.core import geom

    sg = jax.lax.stop_gradient
    W = config.width
    n_pix = nrows * W
    T = scene.n_tris
    scene_sg = sg(scene)
    # shadow-wavefront: trace occlusion in a separate kernel pass over hit
    # points re-binned by Morton code instead of inside the pixel-tiled
    # closest pass.  Measured motivation (BASELINE.md): pixel tiles that
    # straddle a silhouette fan the light-origin cull cone across the whole
    # depth range, making shadow passes stream ~20× more clusters than the
    # closest pass (212 vs 10 survivors/tile mean, config 5).  Only pays
    # at scale: the re-bin overhead (hit-geometry recompute + argsort +
    # scatter) beats the cull win above ~2k clusters (config 5 @8k:
    # 8.4 → 10.5 Mrays/s; config 4 @1k: 26.9 → 23.3 — hence the gate).
    rebin = (config.shadows and config.shadow_rebin
             and packed.n_clusters > SHADOW_REBIN_MIN_CLUSTERS)

    with jax.named_scope("tpurt.traversal.b0"):
        ids0, occ0, _, _ = trace_records(
            packed, config, row0, nrows, max_depth=0,
            shadows=config.shadows and not rebin)
    ids_list = [_untile(ids0, nrows, W)[0]]

    # scene bounds for Morton quantization (cluster AABBs; pads are empty
    # boxes at ±BIG and must be excluded)
    Ccount = packed.n_clusters
    lo = jnp.min(packed.aabb[0:3, :Ccount], axis=1)
    hi = jnp.max(packed.aabb[3:6, :Ccount], axis=1)

    o, d = geom.generate_rays(scene.camera, config.height, W, row0, nrows)
    o = sg(o.reshape(-1, 3))
    d = sg(d.reshape(-1, 3))

    N_pad = -(-n_pix // RAYS) * RAYS

    def hit_points(o_cur, d_cur, ids):
        """(p, p_off) for one bounce's hits, recomputed on stop_gradient
        values with the same formulas as the shading replay.  On big
        mostly-miss frames (the compacted-shading regime) the recompute is
        chunked over (miss, pid)-sorted lanes with chunks past the last
        hit cond-skipped — config 5 @1080p: only ~15% of pixels hit, yet
        the full-lane recompute (wide rows gather + t/u/v + normal math at
        2M lanes) measured 122 ms standalone."""
        from tpurt.shading.deferred import (_build_shadepack,
                                            _gather_shaderows,
                                            _hit_geometry, _recompute_tuv,
                                            _shade_compact_on,
                                            SHADE_COMPACT_MIN, SHADE_CHUNKS)

        # same gather table (and hence the same HLO) as the shading
        # replay's forward ops — XLA CSEs the two recomputes
        pack = _build_shadepack(scene_sg)

        def geom_of(idc, oc, dc):
            is_tri = (idc >= 0) & (idc < T)
            prim = jnp.where(idc < 0, -1, jnp.where(is_tri, idc, idc - T))
            rows = _gather_shaderows(scene_sg, jnp.maximum(prim, 0), pack)
            t, u, v = _recompute_tuv(scene_sg, oc, dc, prim, is_tri,
                                     rows=rows)
            p, nrm, _ = _hit_geometry(scene_sg, oc, dc, t, prim, is_tri,
                                      u, v, rows=rows)
            return p, p + nrm * C.RAY_OFFSET_EPS

        N = ids.shape[0]
        if N < SHADE_COMPACT_MIN or not _shade_compact_on(T, N):
            return geom_of(ids, o_cur, d_cur)
        miss0 = ids < 0
        key0 = jnp.where(miss0, jnp.int32(2 ** 30), ids)
        prm = jnp.argsort(key0)
        ipr = jnp.argsort(prm)
        n_hit = jnp.sum((~miss0).astype(jnp.int32))
        NCHK = SHADE_CHUNKS
        B = -(-N // NCHK)
        npad = B * NCHK - N

        def srt(x, fill):
            xs = x[prm]
            if npad:
                xs = jnp.concatenate(
                    [xs, jnp.full((npad,) + x.shape[1:], fill, xs.dtype)])
            return xs.reshape(NCHK, B, *x.shape[1:])

        def body(xs):
            ci, idc, oc, dc = xs
            return lax.cond(
                ci * B < n_hit, lambda _: geom_of(idc, oc, dc),
                lambda _: (jnp.zeros((B, 3), jnp.float32),
                           jnp.zeros((B, 3), jnp.float32)), 0)

        p_s, poff_s = lax.map(
            body, (jnp.arange(NCHK), srt(ids, -1), srt(o_cur, 0.0),
                   srt(d_cur, 0.0)))
        # skipped chunks hold zeros — those lanes are miss (alive False in
        # every consumer), exactly like the garbage-but-finite miss lanes
        # the unchunked recompute produces
        return (p_s.reshape(-1, 3)[ipr], poff_s.reshape(-1, 3)[ipr])

    def shadow_occ(o_cur, d_cur, ids):
        """Occlusion bits for one bounce's hits, via the re-binned shadow
        pass; ray construction matches whitted_loop's in-kernel shadows
        (hit geometry from hit_points above)."""
        p, p_off = hit_points(o_cur, d_cur, ids)
        alive = ids >= 0
        key = _bin_key_pts(p, lo, hi, alive)
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        pb = jnp.pad(p[perm], ((0, N_pad - n_pix), (0, 0)))
        qb = jnp.pad(p_off[perm], ((0, N_pad - n_pix), (0, 0)))
        ab = jnp.pad(alive[perm], (0, N_pad - n_pix))
        n_live = jnp.sum(alive.astype(jnp.int32))
        occ, _ = trace_shadows(packed, config, pb, qb, ab, n_live)
        return jnp.where(alive, occ[:n_pix][inv], 0)

    if rebin:
        with jax.named_scope("tpurt.shadows.b0"):
            occ_list = [shadow_occ(o, d, ids_list[0])]
    else:
        occ_list = [_untile(occ0, nrows, W)[0]]

    def alive_from_ids(ids):
        """Which lanes continue to the next bounce, from ids ALONE — two int
        gathers instead of _continue_rays' full hit-geometry recompute.
        Matches _continue_rays' alive exactly: a path survives iff it hit
        and the hit material reflects."""
        miss = ids < 0
        is_tri = (~miss) & (ids < T)
        tid = jnp.clip(ids, 0, max(T - 1, 0))
        sid = jnp.clip(ids - T, 0, max(scene.n_spheres - 1, 0))
        mat = jnp.where(is_tri, scene_sg.tri_mat[tid], scene_sg.sph_mat[sid])
        return (~miss) & (scene_sg.materials.reflectivity[mat] > 0.0)

    def bounce(o, d, ids, alive, n_live):
        o, d, _, _ = _continue_rays(scene_sg, o, d, ids, T)
        key = _bin_key(o, d, lo, hi, alive)
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        ob = jnp.pad(o[perm], ((0, N_pad - n_pix), (0, 0)))
        db = jnp.pad(d[perm], ((0, N_pad - n_pix), (0, 0)))
        ab = jnp.pad(alive[perm], (0, N_pad - n_pix))
        idsb, occb, _, _ = trace_bounce(
            packed, config, ob, db, ab, n_live,
            shadows=config.shadows and not rebin)
        idsb = idsb[:n_pix][inv]
        occb = occb[:n_pix][inv]
        if rebin:
            occb = shadow_occ(o, d, idsb)
        return idsb, occb, o, d

    def bounce_empty(o, d, ids, alive, n_live):
        # kernel default records for dead lanes: id -1, occ 0.  o/d pass
        # through unchanged — every later bounce is empty too (alive only
        # ever shrinks), so the stale rays are never consumed.
        return (jnp.full((n_pix,), -1, jnp.int32),
                jnp.zeros((n_pix,), jnp.int32), o, d)

    for _depth in range(1, config.max_depth + 1):
        alive = alive_from_ids(ids_list[-1])
        n_live = jnp.sum(alive.astype(jnp.int32))
        with jax.named_scope(f"tpurt.traversal.b{_depth}"):
            # cond skips EVERYTHING — the hit-geometry recompute inside
            # _continue_rays, the 1M-ray argsort re-bin, the trace, and the
            # scatter-back — when no ray survived the previous depth (every
            # benchmark config: no reflective materials at depth 1).  Only
            # the two-gather alive mask above is paid unconditionally.
            idsb, occb, o, d = jax.lax.cond(
                n_live > 0, bounce, bounce_empty, o, d, ids_list[-1],
                alive, n_live)
        ids_list.append(idsb)
        occ_list.append(occb)

    return jnp.stack(ids_list), jnp.stack(occ_list)


def render_rows_clustered(scene, config, tri_ids, row0, nrows: int):
    """Cluster-traversal render of rows [row0, row0+nrows): traversal kernel
    finds topology, deferred shading reconstructs the image differentiably.

    config.wavefront selects per-bounce re-binned tracing (default) vs the
    single multi-bounce kernel (secondary rays keep their pixel tiling)."""
    from tpurt.core import geom
    from tpurt.kernels.packc import pack_clusters
    from tpurt.shading.deferred import HitRecords, shade_from_records

    with jax.named_scope("tpurt.pack_clusters"):
        packed = pack_clusters(scene, tri_ids)
    W = config.width
    n_pix = nrows * W
    if config.wavefront and config.max_depth > 0:
        ids, occ = _wavefront_records(scene, config, packed, row0, nrows)
    else:
        with jax.named_scope("tpurt.traversal"):
            ids, occ, _, _stats = trace_records(packed, config, row0, nrows)
        ids = _untile(ids, nrows, W)
        occ = _untile(occ, nrows, W)

    T = scene.n_tris
    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    recs = HitRecords(prim=prim, is_tri=is_tri, occ=occ)

    o, d = geom.generate_rays(scene.camera, config.height, W, row0, nrows)
    with jax.named_scope("tpurt.deferred_shading"):
        colors = shade_from_records(
            scene, o.reshape(-1, 3), d.reshape(-1, 3), recs,
            config.max_depth, config.shadows,
        )
    return colors.reshape(nrows, W, 3)


def traversal_stats(scene, config, tri_ids, row0=0, nrows=None):
    """Per-tile traversal statistics for perf analysis: returns (ntiles, 8)
    int32 — column 0: survivors streamed (summed over passes), column 1:
    passes, column 2: SMEM survivor-list overflow events.  Feed the mean of
    column 0 / column 1 into tpurt.utils.roofline.report()."""
    from tpurt.kernels.packc import pack_clusters

    nrows = config.height if nrows is None else nrows
    packed = pack_clusters(scene, tri_ids)
    _, _, _, stats = trace_records(packed, config, row0, nrows)
    return stats  # (5, ntiles): emitted, passes, overflows, streamed,
    #                  chunk-epilogues computed
