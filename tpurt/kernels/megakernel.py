"""Fused Pallas forward/backward megakernels (single chip).

TPU-native redesign of the reference's per-pixel OpenCL device kernel
(SURVEY.md §1a "Device kernels", §3a Entry 2; provenance BASELINE.json:5):
ray-gen → intersect-all → Phong shade → shadow rays → iterative Whitted
reflection loop, fused into ONE kernel launch per image tile.

Design (see also tpurt/kernels/pack.py):

* Rays ride in LANES: each grid step owns RAYS flat pixels; every per-ray
  quantity is a (k, RAYS) row-stack.  No scalar per-ray control flow exists
  anywhere — misses are masked lanes, exactly the VPU-friendly shape.
* Intersection runs on the MXU: `dot_general(w_block (8, 6·128), X (8, R))`
  evaluates all six Baldwin–Weber linear forms of 128 triangles against all
  rays at once; the VPU epilogue turns forms into (t, u, v, hit) and a
  cross-sublane min picks the winner.  Spheres use the same scheme with two
  columns.  This replaces the reference's per-thread Möller–Trumbore loop
  with batched matmuls — the TPU-idiomatic formulation.
* Winning-primitive attributes are fetched by one-hot MXU matmul
  (`onehot (128, R)ᵀ·attrs (128, ACOLS)`), never by gather.
* Backward is a second Pallas kernel registered via `jax.custom_vjp`: it
  REPLAYS the tile computation (recompute-from-nothing — the tape is empty,
  cheaper than materializing per-pair intermediates in HBM) under `jax.vjp`
  at trace time, then accumulates PackedScene cotangents across the
  sequential grid into single output blocks.  The differentiable host-side
  packing (pack.py) chain-rules those into vertex/normal/material/light/
  camera gradients (BASELINE.json:5).  Backward tiles are narrower
  (RAYS_BWD) to keep the transposed live set inside VMEM.

Phase-1 scope: whole scene resident in VMEM (≲ 4k primitives — configs 1–3
and unit scenes); textures unsupported (render falls back to the oracle).
The cluster-streaming path for 70k–1M tris is tpurt/kernels/clusters.py.
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
from tpurt.kernels.pack import PackedScene, pack_scene

#: forward tile width (flat pixels per grid step).  Phase-1 has no cull
#: selectivity to protect (every primitive is tested by every ray), so
#: fatter tiles only amortize per-grid-step overhead — A/B via env.
RAYS = int(os.environ.get("TPURT_P1_RAYS", "1024"))
RAYS_BWD = 256     # backward tile width (transposed live-set must fit VMEM)
#: route the fused L2 train objective through the HAND-DERIVED adjoint
#: kernel (tpurt/kernels/megabwd.py) instead of the replay-under-jax.vjp
#: kernel — BASELINE.json:5 "hand-derived backward kernels"; also the only
#: path that can dead-tile-skip the backward (the vjp's linearized cond
#: emits vector<i1> residual selects Mosaic cannot lower)
P1_HAND = os.environ.get("TPURT_P1_HAND", "1") != "0"
LANES = PK.LANES

_F32_MAX_PRIMS = 4096  # phase-1 all-in-VMEM limit per primitive type


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# the tile program: pure jnp on values, shared verbatim by fwd and bwd
#
# Vec3s are python TUPLES of (1, R) rows — never (3, R) arrays: Mosaic keeps
# every component in its own zero-offset (sublane, lane) tile, avoiding both
# the 8/3 sublane padding of a (3, R) layout and the unsupported
# small-vector concatenates that stacking would require.
# ---------------------------------------------------------------------------
def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]         # → (1, R)


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _where3(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _normalize3(a):
    s = lax.rsqrt(_dot3(a, a) + C.NORMALIZE_EPS)
    return _scale3(a, s)


def _reflect3(d, n):
    return _sub3(d, _scale3(n, 2.0 * _dot3(d, n)))


def _tile_color(glob, wtri, wsph, attrs, pix0, statics, occ_rec=None,
                skippable=True):
    """Render RAYS_ flat pixels starting at pix0 (traced i32 scalar).

    glob (1, NGLOB) f32; wtri (8, 6·T_pad); wsph (8, 2·S_pad);
    attrs (T_pad + S_pad, ACOLS).  Returns (colors (3, R), occs list of
    (1, R) i32 per depth — bit l ⇔ light l occluded).
    statics: (H, W, max_depth, shadows, nb_t, nb_s, n_lights, R).

    `occ_rec`: per-depth occlusion records from a prior forward.  When
    given, the shadow-ray any-hit passes are SKIPPED and visibility comes
    from the records — occlusion is piecewise-constant (its cotangent is
    exactly zero), so the backward replay at fixed records is the exact
    vjp while deleting n_lights × (nb_t + nb_s) matmul+epilogue passes per
    depth from the replay (the bulk of the r2 bwd kernel's 2× fwd cost).
    """
    H, W, max_depth, shadows, nb_t, nb_s, n_lights, R, TLB, SLB = statics
    f32 = jnp.float32
    t_pad = nb_t * TLB

    # global scalars are extracted by masked lane-reduction, not by lane
    # slicing: a (1,1) slice at lane offset k produces an offset vector
    # layout Mosaic cannot always re-pack ("offset mismatch on non-concat
    # dimension"); the reduction yields a clean zero-offset (1,1) value and
    # keeps the vjp path to `glob` intact.
    lane_g = lax.broadcasted_iota(jnp.int32, glob.shape, 1)

    def g(k):  # (1,1) global scalar — broadcasts against (1,R)
        return jnp.sum(
            jnp.where(lane_g == k, glob, 0.0), axis=1, keepdims=True
        )

    def g3(k):  # vec3 global as a tuple of (1,1) values
        return (g(k), g(k + 1), g(k + 2))

    # ---- ray-gen (constants.py camera conventions) ------------------------
    pix = pix0 + lax.broadcasted_iota(jnp.int32, (1, R), 1)
    row = (pix // W).astype(f32)
    colm = (pix % W).astype(f32)
    aspect = W / H
    sx = (2.0 * (colm + 0.5) / W - 1.0) * aspect   # right already × tan(fov/2)
    sy = 1.0 - 2.0 * (row + 0.5) / H
    eye, fwd = g3(0), g3(3)
    right_h, up_h = g3(6), g3(9)
    ambient = g3(12)
    d = _normalize3(_add3(fwd, _add3(_scale3(right_h, sx), _scale3(up_h, sy))))
    o = tuple(jnp.broadcast_to(e, (1, R)) for e in eye)

    iota_t = lax.broadcasted_iota(jnp.int32, (TLB, R), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (SLB, R), 0)
    rows8 = lax.broadcasted_iota(jnp.int32, (8, R), 0)

    def build_X(o3, d3):
        """(8, R) ray matrix [ox oy oz 1 dx dy dz 0] via iota masking (no
        small-vector concatenates)."""
        m = lambda k, v: jnp.where(rows8 == k, v, 0.0)        # noqa: E731
        return (
            m(0, o3[0]) + m(1, o3[1]) + m(2, o3[2]) + m(3, 1.0)
            + m(4, d3[0]) + m(5, d3[1]) + m(6, d3[2])
        )

    def tri_block(X, b, t_lo, t_hi):
        """(t (128,R), u, v) for triangle block b against rays X."""
        wb = wtri[:, b * 6 * TLB : (b + 1) * 6 * TLB]
        out = lax.dot_general(
            wb, X, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        ).reshape(6, TLB, R)
        no_, ndd, uo, ud, vo, vd = (out[i] for i in range(6))
        good = jnp.abs(ndd) >= C.MT_DET_EPS
        safe_nd = jnp.where(good, ndd, 1.0)
        t = -no_ / safe_nd
        u = uo + t * ud
        v = vo + t * vd
        hit = good & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_lo) & (t < t_hi)
        return jnp.where(hit, t, C.T_NONE), u, v

    def sph_block(X, b, oo, od, t_lo, t_hi):
        """(t (128,R)) for sphere block b (nearest root in range)."""
        wb = wsph[:, b * 2 * SLB : (b + 1) * 2 * SLB]
        out = lax.dot_general(
            wb, X, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        ).reshape(2, SLB, R)
        ct, cd = out[0], out[1]
        b_half = od - cd                       # o·d - c·d
        cterm = oo + ct                        # |o-c|² - r²
        disc = b_half * b_half - cterm
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))  # guarded: grad-safe
        t0 = -b_half - sq
        t1 = -b_half + sq
        t0_ok = has & (t0 > t_lo) & (t0 < t_hi)
        t1_ok = has & (t1 > t_lo) & (t1 < t_hi)
        return jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, C.T_NONE))

    def fold_best(best, tm, u, v, attr_block, iota, blk):
        """Fold one block's (blk,R) candidates into the running per-ray best."""
        t_best, a_best, u_best, v_best = best
        bt = jnp.min(tm, axis=0, keepdims=True)                      # (1,R)
        bidx = jnp.min(
            jnp.where(tm == bt, iota, blk), axis=0, keepdims=True
        )
        onehot = (iota == bidx).astype(f32)                          # (blk,R)
        cand_a = lax.dot_general(
            attr_block, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,  # attrs must survive exactly
        )                                                            # (ACOLS,R)
        cand_u = jnp.sum(onehot * u, axis=0, keepdims=True)
        cand_v = jnp.sum(onehot * v, axis=0, keepdims=True)
        imp = bt < t_best
        return (
            jnp.where(imp, bt, t_best),
            jnp.where(imp, cand_a, a_best),
            jnp.where(imp, cand_u, u_best),
            jnp.where(imp, cand_v, v_best),
        )

    def closest(o3, d3):
        X = build_X(o3, d3)
        oo = _dot3(o3, o3)
        od = _dot3(o3, d3)
        best = (
            jnp.full((1, R), C.T_NONE, f32),
            jnp.zeros((PK.ACOLS, R), f32),
            jnp.zeros((1, R), f32),
            jnp.zeros((1, R), f32),
        )
        for b in range(nb_t):
            tm, u, v = tri_block(X, b, C.T_MIN, C.T_MAX)
            best = fold_best(
                best, tm, u, v, attrs[b * TLB : (b + 1) * TLB], iota_t, TLB
            )
        for b in range(nb_s):
            tm = sph_block(X, b, oo, od, C.T_MIN, C.T_MAX)
            zero = jnp.zeros_like(tm)
            best = fold_best(
                best, tm, zero, zero,
                attrs[t_pad + b * SLB : t_pad + (b + 1) * SLB], iota_s, SLB,
            )
        return best

    def occluded(o3, d3, tmax):
        """Any-hit in (T_MIN, tmax) — shadow rays (SURVEY §2 row R7)."""
        X = build_X(o3, d3)
        oo = _dot3(o3, o3)
        od = _dot3(o3, d3)
        occ = jnp.zeros((1, R), bool)
        for b in range(nb_t):
            tm, _, _ = tri_block(X, b, C.T_MIN, C.T_MAX)
            occ = occ | jnp.any(tm < tmax, axis=0, keepdims=True)
        for b in range(nb_s):
            tm = sph_block(X, b, oo, od, C.T_MIN, C.T_MAX)
            occ = occ | jnp.any(tm < tmax, axis=0, keepdims=True)
        return occ

    # ---- Whitted loop (constants.py conventions; mirrors ref/oracle.py) ---
    bg = tuple(jnp.full((1, R), C.BACKGROUND[c], f32) for c in range(3))
    accum = tuple(jnp.zeros((1, R), f32) for _ in range(3))
    thr = jnp.ones((1, R), f32)
    alive = jnp.ones((1, R), bool)
    occs = []

    def _any(m):  # (1, R) bool → scalar (f32 sum reduce: Mosaic-safe)
        return jnp.sum(m.astype(f32)) > 0.0

    def shade_at(_depth, t, a, u, v, args):
        """Post-closest shading of one depth; the cond-skipped section."""
        o, d, accum, thr, alive = args
        hit = t < C.T_MAX
        p = _add3(o, _scale3(d, t))

        def a1(k):
            return a[k : k + 1]

        def a3(k):
            return (a1(k), a1(k + 1), a1(k + 2))

        w_bar = 1.0 - u - v
        n_int = _normalize3(
            _add3(
                _scale3(a3(PK.A_N0), w_bar),
                _add3(_scale3(a3(PK.A_N1), u), _scale3(a3(PK.A_N2), v)),
            )
        )
        n_tri = _where3(_dot3(n_int, d) > 0.0, _neg3(n_int), n_int)  # two-sided
        n_sph = _normalize3(_sub3(p, a3(PK.A_CENTER)))               # not flipped
        is_sph = a1(PK.A_IS_SPH) > 0.5
        n = _where3(is_sph, n_sph, n_tri)

        ka = a3(PK.A_KA)
        kd = a3(PK.A_KD)
        ks = a3(PK.A_KS)
        shin = a1(PK.A_SHIN)
        refl = a1(PK.A_REFL)

        color = tuple(ka[c] * ambient[c] for c in range(3))
        view = _neg3(d)
        p_off = _add3(p, _scale3(n, C.RAY_OFFSET_EPS))
        occ_bits = jnp.zeros((1, R), jnp.int32)
        for li in range(n_lights):
            lpos = g3(PK.NGLOB_BASE + 3 * li)
            lcol = g3(PK.NGLOB_BASE + 3 * n_lights + 3 * li)
            to_l = _sub3(lpos, p)
            dist = jnp.sqrt(_dot3(to_l, to_l))
            ldir = _scale3(to_l, 1.0 / jnp.maximum(dist, 1e-20))
            ndotl = jnp.maximum(_dot3(n, ldir), 0.0)
            refl_l = _reflect3(_neg3(ldir), n)
            rdotv = jnp.maximum(_dot3(refl_l, view), 0.0)
            safe_rv = jnp.where(rdotv > 0.0, rdotv, 1.0)
            spec = jnp.where((ndotl > 0.0) & (rdotv > 0.0), safe_rv**shin, 0.0)
            if not shadows:
                vis = jnp.ones((1, R), f32)
            elif occ_rec is not None:
                vis = 1.0 - ((occ_rec[_depth] >> li) & 1).astype(f32)
            else:
                occ = occluded(p_off, ldir, dist - C.RAY_OFFSET_EPS)
                occ_bits = occ_bits | jnp.where(occ, 1 << li, 0)
                vis = 1.0 - occ.astype(f32)
            color = tuple(
                color[c] + vis * lcol[c] * (kd[c] * ndotl + ks[c] * spec)
                for c in range(3)
            )

        color = _where3(hit, color, bg)
        live = thr * alive.astype(f32)
        accum = tuple(accum[c] + live * color[c] for c in range(3))
        refl = jnp.where(hit, refl, 0.0)
        thr = thr * refl
        alive = alive & hit & (refl > 0.0)
        return (accum, thr, alive, p_off, _reflect3(d, n), occ_bits)

    def shade_skip(t, a, u, v, args):
        """EXACT equivalent of shade_at on a tile where NO lane hit: every
        lane's color is the background, throughput dies (refl is masked to
        zero on miss), rays/occ are never read again (alive is monotone
        decreasing) — so tiles full of sky skip the Phong + occlusion
        passes entirely."""
        o, d, accum, thr, alive = args
        live = thr * alive.astype(f32)
        accum = tuple(accum[c] + live * bg[c] for c in range(3))
        return (accum, jnp.zeros_like(thr), jnp.zeros_like(alive), o, d,
                jnp.zeros((1, R), jnp.int32))

    # `skippable` gates the dead/sky-tile lax.cond skips: they are exact
    # (see shade_skip) and compile in the plain forward kernel, but under
    # jax.vjp the linearized cond selects over vector<i1> RESIDUALS, which
    # Mosaic cannot lower ("Null layout / non-vector operand", measured on
    # chip r5) — so the vjp-replayed kernels run the straight-line body.
    # The cond itself must also carry no bool vectors (scf.if with
    # vector<i1> results fails to legalize — measured r5): `alive` crosses
    # the boundary as i32.
    def _numeric(fn):
        def f2(args):
            o_, d_, accum_, thr_, ali_ = args
            out = fn((o_, d_, accum_, thr_, ali_ != 0))
            acc2, thr2, alive2, o2, d2, occ2 = out
            return (acc2, thr2, alive2.astype(jnp.int32), o2, d2, occ2)
        return f2

    for _depth in range(max_depth + 1):
        if _depth == 0:
            # depth 0: every lane is alive; closest always runs, the
            # shading + shadow section cond-skips on all-sky tiles
            t, a, u, v = closest(o, d)
            args0 = (o, d, accum, thr, alive)
            if skippable:
                accum, thr, alive_i, o, d, occ_bits = lax.cond(
                    _any(t < C.T_MAX),
                    _numeric(functools.partial(shade_at, _depth, t, a, u, v)),
                    _numeric(functools.partial(shade_skip, t, a, u, v)),
                    (o, d, accum, thr, alive.astype(jnp.int32)),
                )
                alive = alive_i != 0
            else:
                accum, thr, alive, o, d, occ_bits = shade_at(
                    _depth, t, a, u, v, args0)
        else:
            # deeper bounces: tiles with no live path skip closest AND
            # shading (the phase-1 analogue of the cluster path's
            # dead-tile skip).  The idle branch is exact: live ≡ 0 ⇒
            # accum unchanged; thr/alive already all-dead; o/d unread.
            def full_body(args, _d=_depth):
                o_, d_ = args[0], args[1]
                t_, a_, u_, v_ = closest(o_, d_)
                return shade_at(_d, t_, a_, u_, v_, args)

            def idle(args):
                o_, d_, accum_, thr_, alive_ = args
                return (accum_, thr_, alive_.astype(jnp.int32), o_, d_,
                        jnp.zeros((1, R), jnp.int32))

            if skippable:
                accum, thr, alive_i, o, d, occ_bits = lax.cond(
                    _any(alive), _numeric(full_body), idle,
                    (o, d, accum, thr, alive.astype(jnp.int32)),
                )
                alive = alive_i != 0
            else:
                accum, thr, alive, o, d, occ_bits = full_body(
                    (o, d, accum, thr, alive))
        occs.append(occ_bits)

    return (tuple(jnp.clip(accum[c], C.CLAMP_LO, C.CLAMP_HI)
                  for c in range(3)), occs)


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------
def _fwd_kernel(off_ref, glob_ref, wtri_ref, wsph_ref, attrs_ref, out_ref,
                occ_ref, *, statics):
    R = statics[7]  # rays per tile (statics ends with tlb, slb)
    max_depth = statics[2]
    pix0 = off_ref[0, 0] + pl.program_id(0) * R
    (c0, c1, c2), occs = _tile_color(
        glob_ref[...], wtri_ref[...], wsph_ref[...], attrs_ref[...], pix0, statics
    )
    out_ref[0:1, :] = c0
    out_ref[1:2, :] = c1
    out_ref[2:3, :] = c2
    for depth in range(max_depth + 1):
        occ_ref[depth : depth + 1, :] = occs[depth]


def _bwd_kernel(
    off_ref, glob_ref, wtri_ref, wsph_ref, attrs_ref, occ_ref, g_ref,
    dglob_ref, dwtri_ref, dwsph_ref, dattrs_ref, *, statics,
):
    R = statics[7]  # rays per tile (statics ends with tlb, slb)
    max_depth = statics[2]
    pix0 = off_ref[0, 0] + pl.program_id(0) * R
    # occlusion records from the forward: visibility is piecewise-constant
    # (zero cotangent), so replaying at FIXED records is the exact vjp and
    # the shadow any-hit passes vanish from the replay
    occ_rec = [occ_ref[d : d + 1, :] for d in range(max_depth + 1)]

    def f(gl, wt, ws, at):
        return _tile_color(gl, wt, ws, at, pix0, statics, occ_rec=occ_rec,
                           skippable=False)[0]

    _, vjp = jax.vjp(f, glob_ref[...], wtri_ref[...], wsph_ref[...], attrs_ref[...])
    dgl, dwt, dws, dat = vjp((g_ref[0:1, :], g_ref[1:2, :], g_ref[2:3, :]))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dglob_ref[...] = jnp.zeros_like(dglob_ref)
        dwtri_ref[...] = jnp.zeros_like(dwtri_ref)
        dwsph_ref[...] = jnp.zeros_like(dwsph_ref)
        dattrs_ref[...] = jnp.zeros_like(dattrs_ref)

    dglob_ref[...] += dgl
    dwtri_ref[...] += dwt
    dwsph_ref[...] += dws
    dattrs_ref[...] += dat


def _fused_kernel(off_ref, glob_ref, wtri_ref, wsph_ref, attrs_ref, tgt_ref,
                  sq_ref, dglob_ref, dwtri_ref, dwsph_ref, dattrs_ref, *,
                  statics):
    """ONE pass for the L2 train objective: replay the tile forward under
    jax.vjp (this IS the forward — occlusion and all), derive the loss
    cotangent in-kernel (2·(color − target)), and accumulate scene
    cotangents — the separate forward kernel vanishes from fwd+bwd."""
    H, W, R = statics[0], statics[1], statics[7]
    pix0 = off_ref[0, 0] + pl.program_id(0) * R

    def f(gl, wt, ws, at):
        return _tile_color(gl, wt, ws, at, pix0, statics, skippable=False)[0]

    (c0, c1, c2), vjp = jax.vjp(
        f, glob_ref[...], wtri_ref[...], wsph_ref[...], attrs_ref[...])
    # out-of-image lanes render garbage (the flat-pixel pad); zero their
    # error so neither the loss nor the cotangent sees them
    pix = pix0 + lax.broadcasted_iota(jnp.int32, (1, R), 1)
    valid = (pix < H * W).astype(jnp.float32)
    e0 = (c0 - tgt_ref[0:1, :]) * valid
    e1 = (c1 - tgt_ref[1:2, :]) * valid
    e2 = (c2 - tgt_ref[2:3, :]) * valid
    sq_ref[0:1, :] = e0 * e0 + e1 * e1 + e2 * e2
    dgl, dwt, dws, dat = vjp((2.0 * e0, 2.0 * e1, 2.0 * e2))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dglob_ref[...] = jnp.zeros_like(dglob_ref)
        dwtri_ref[...] = jnp.zeros_like(dwtri_ref)
        dwsph_ref[...] = jnp.zeros_like(dwsph_ref)
        dattrs_ref[...] = jnp.zeros_like(dattrs_ref)

    dglob_ref[...] += dgl
    dwtri_ref[...] += dwt
    dwsph_ref[...] += dws
    dattrs_ref[...] += dat


def l2_loss_and_grad(scene, target, config):
    """Fused phase-1 train objective: ``sum((render(scene) − target)²)``
    and its gradients w.r.t. every float scene leaf, in ONE Pallas pass.

    The generic path (``jax.grad`` of ``render``) runs the forward kernel
    for the image AND a backward kernel that replays the forward; for the
    L2 objective the loss cotangent is derivable in-kernel, so the
    backward replay IS the forward and the separate forward kernel
    disappears — the production train-step shape (gradients identical to
    the generic path up to summation order; tested).  `target` is
    (H, W, 3)."""
    if not supports(scene, config):
        raise ValueError("l2_loss_and_grad is the phase-1 fast path; "
                         "use render_and_grad for clustered scenes")
    packed, pack_vjp = jax.vjp(pack_scene, scene)
    H, W = config.height, config.width
    n_pix = H * W
    statics = _statics_for(packed, config, n_pix)
    (H_, W_, max_depth, shadows, nb_t, nb_s, n_lights, _, tlb, slb) = statics
    sublanes = nb_t * tlb + nb_s * slb
    rays = max(RAYS_BWD,
               min(RAYS, 2 ** (15 - max(sublanes, 1).bit_length())))
    rays = int(os.environ.get("TPURT_P1_RAYS_BWD", str(rays)))
    ntiles = -(-n_pix // rays)
    n_pad = ntiles * rays
    tile_statics = (H_, W_, max_depth, shadows, nb_t, nb_s, n_lights, rays,
                    tlb, slb)
    glob = _glob_padded(packed)
    off = jnp.zeros((1, 1), jnp.int32)
    tgt = jnp.transpose(target.reshape(n_pix, 3))
    tgt = jnp.pad(tgt, ((0, 0), (0, n_pad - n_pix)))
    if P1_HAND:
        from tpurt.kernels import megabwd

        sq, dglob, dwtri, dwsph, dattrs = megabwd.hand_l2_pallas(
            packed, tgt, off, tile_statics, rays, ntiles, glob
        )(off, glob, packed.wtri, packed.wsph, packed.attrs, tgt)
        return _l2_unpack(packed, pack_vjp, sq, dglob, dwtri, dwsph, dattrs)
    sq, dglob, dwtri, dwsph, dattrs = pl.pallas_call(
        functools.partial(_fused_kernel, statics=tile_statics),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rays), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rays), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(glob.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.wtri.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.wsph.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.attrs.shape, lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct(glob.shape, jnp.float32),
            jax.ShapeDtypeStruct(packed.wtri.shape, jnp.float32),
            jax.ShapeDtypeStruct(packed.wsph.shape, jnp.float32),
            jax.ShapeDtypeStruct(packed.attrs.shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(off, glob, packed.wtri, packed.wsph, packed.attrs, tgt)
    return _l2_unpack(packed, pack_vjp, sq, dglob, dwtri, dwsph, dattrs)


def _l2_unpack(packed, pack_vjp, sq, dglob, dwtri, dwsph, dattrs):
    d_packed = PackedScene(
        wtri=dwtri,
        wsph=dwsph,
        attrs=dattrs,
        globals=dglob[:, : packed.globals.shape[1]],
        n_tri_blocks=packed.n_tri_blocks,
        n_sph_blocks=packed.n_sph_blocks,
        n_lights=packed.n_lights,
        smooth=packed.smooth,
        tlb=packed.tlb,
        slb=packed.slb,
    )
    (d_scene,) = pack_vjp(d_packed)
    return jnp.sum(sq), d_scene


def _statics_for(packed: PackedScene, config, rays: int):
    return (
        config.height,
        config.width,
        config.max_depth,
        config.shadows,
        packed.n_tri_blocks,
        packed.n_sph_blocks,
        packed.n_lights,
        rays,
        packed.tlb,
        packed.slb,
    )


def _glob_padded(packed):
    gpad = -(-packed.globals.shape[1] // LANES) * LANES
    return jnp.pad(packed.globals, ((0, 0), (0, gpad - packed.globals.shape[1])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_core(statics, packed: PackedScene, off_i):
    return _render_core_fwd(statics, packed, off_i)[0]


def _render_core_fwd(statics, packed, off_i):
    (H, W, max_depth, shadows, nb_t, nb_s, n_lights, n_pix, tlb, slb) = statics
    ntiles = -(-n_pix // RAYS)
    D = max_depth + 1
    tile_statics = (H, W, max_depth, shadows, nb_t, nb_s, n_lights, RAYS, tlb, slb)
    glob = _glob_padded(packed)
    # pixel offset stays int32 end to end: a float32 carry loses odd offsets
    # above 2^24 pixels (4096² images); int custom_vjp args take a float0
    # cotangent in bwd
    off = jnp.asarray(off_i, jnp.int32).reshape(1, 1)
    out, occ = pl.pallas_call(
        functools.partial(_fwd_kernel, statics=tile_statics),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, RAYS), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, ntiles * RAYS), jnp.float32),
            jax.ShapeDtypeStruct((D, ntiles * RAYS), jnp.int32),
        ],
        interpret=_interpret(),
    )(off, glob, packed.wtri, packed.wsph, packed.attrs)
    return out, (packed, off_i, occ)


def _render_core_bwd(statics, res, g):
    packed, off_i, occ = res
    (H, W, max_depth, shadows, nb_t, nb_s, n_lights, n_pix, tlb, slb) = statics
    D = max_depth + 1
    # backward tile width scales inversely with resident primitive sublanes:
    # the vjp replay live set is O(total_sublanes x rays), so small scenes
    # afford full-width tiles (fewer grid steps, less fixed overhead)
    sublanes = nb_t * tlb + nb_s * slb
    rays_bwd = max(RAYS_BWD, min(RAYS, 2 ** (15 - max(sublanes, 1).bit_length())))
    rays_bwd = int(os.environ.get("TPURT_P1_RAYS_BWD", str(rays_bwd)))
    # cotangent arrives in the fwd tiling (a multiple of RAYS, which is a
    # multiple of rays_bwd); out-of-image lanes carry zero cotangent
    ntiles = g.shape[1] // rays_bwd
    tile_statics = (H, W, max_depth, shadows, nb_t, nb_s, n_lights, rays_bwd, tlb, slb)
    glob = _glob_padded(packed)
    off = jnp.asarray(off_i, jnp.int32).reshape(1, 1)
    dglob, dwtri, dwsph, dattrs = pl.pallas_call(
        functools.partial(_bwd_kernel, statics=tile_statics),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, rays_bwd), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, rays_bwd), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(glob.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                packed.wtri.shape, lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                packed.wsph.shape, lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                packed.attrs.shape, lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(glob.shape, jnp.float32),
            jax.ShapeDtypeStruct(packed.wtri.shape, jnp.float32),
            jax.ShapeDtypeStruct(packed.wsph.shape, jnp.float32),
            jax.ShapeDtypeStruct(packed.attrs.shape, jnp.float32),
        ],
        interpret=_interpret(),
    )(off, glob, packed.wtri, packed.wsph, packed.attrs, occ, g)
    d_packed = PackedScene(
        wtri=dwtri,
        wsph=dwsph,
        attrs=dattrs,
        globals=dglob[:, : packed.globals.shape[1]],
        n_tri_blocks=packed.n_tri_blocks,
        n_sph_blocks=packed.n_sph_blocks,
        n_lights=packed.n_lights,
        smooth=packed.smooth,
        tlb=packed.tlb,
        slb=packed.slb,
    )
    import numpy as np

    return d_packed, np.zeros(jnp.shape(off_i), jax.dtypes.float0)


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------
def supports(scene, config) -> bool:
    """Phase-1 kernel applicability: all-VMEM scenes, no textures.
    Uses only static scene properties (shapes + flags) so it is safe to
    call during tracing."""
    return (
        scene.n_tris <= _F32_MAX_PRIMS
        and scene.n_spheres <= _F32_MAX_PRIMS
        and not scene.textured
    )


def render_rows_pallas(scene, config, row0, nrows: int):
    """Render rows [row0, row0+nrows) — the shard_map per-device slab."""
    packed = pack_scene(scene)
    n_pix = nrows * config.width
    statics = _statics_for(packed, config, n_pix)
    off_i = jnp.asarray(row0, jnp.int32) * config.width
    flat = _render_core(statics, packed, off_i)
    img = flat[:, :n_pix].reshape(3, nrows, config.width)
    return jnp.transpose(img, (1, 2, 0))


def render_pallas(scene, config):
    return render_rows_pallas(scene, config, 0, config.height)
