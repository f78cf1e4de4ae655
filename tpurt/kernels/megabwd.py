"""HAND-DERIVED phase-1 fused L2 backward (BASELINE.json:5 "hand-derived
backward kernels").

The r3/r4 fused train kernel (megakernel.py `_fused_kernel`) replays the
tile under `jax.vjp` at trace time — measured at its floor (bwd/fwd kernel
ratio 1.96, design.md).  This module writes the SAME computation with an
EXPLICIT adjoint: one forward sweep per tile that keeps per-depth
residuals live (t, u, v, winner id + its six intersection forms, occlusion
bits, entry rays), then one reverse sweep applying closed-form adjoints of
every stage — Phong/Whitted shading, normal interpolation/normalize,
reflect, the Baldwin–Weber winner transpose (two MXU matmuls per primitive
block), the quadratic sphere root, and camera ray-gen.

Why by hand when the vjp replay was already lean:

* the vjp's linearized `lax.cond` emits selects over vector<i1> RESIDUALS
  that Mosaic cannot lower, so the replay could never skip dead tiles; the
  hand adjoint keeps every cond-crossing value NUMERIC and cond-skips
  whole depths in BOTH sweeps (`_any` tile-liveness, matching the cluster
  path's dead-tile skip — exact: a dead tile's layer contributes zero
  cotangent everywhere);
* winner-select subgradients, occlusion visibility, and spec masks are
  piecewise-constant and the adjoint treats them as fixed integers — no
  bool residual ever materializes;
* the shading adjoint is algebraically fused (e.g. the reflect transpose
  `cot_m = cot − 2n(n·cot)` reuses the forward's dot products) instead of
  op-by-op transposed.

Gradient convention identical to the vjp path: fixed topology, max/clip
subgradients at the jax convention (ties pass to the kept operand).
Validated against `jax.vjp` of `_tile_color` in interpret mode and
against the CPU oracle's autodiff on configs 1-3 (tests/test_kernels.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt import constants as C
from tpurt.kernels import pack as PK
from tpurt.kernels.megakernel import (_add3, _dot3, _neg3, _normalize3,
                                      _reflect3, _scale3, _sub3, _where3)

f32 = jnp.float32

#: cond-skip dead/sky tiles in BOTH sweeps (exact; see module doc).  The
#: flag exists for A/B and for debugging the straight-line adjoint.
import os as _os  # noqa: E402

HAND_SKIP = _os.environ.get("TPURT_P1_HAND_SKIP", "1") != "0"


def _nrm_bwd(v3, cot_n3):
    """Adjoint of _normalize3: n = v·s, s = rsqrt(v·v + eps) ⇒
    cot_v = s·cot_n − s³·v·(v·cot_n)."""
    s = lax.rsqrt(_dot3(v3, v3) + C.NORMALIZE_EPS)
    vc = _dot3(v3, cot_n3)
    s3 = s * s * s
    return tuple(s * cot_n3[k] - s3 * v3[k] * vc for k in range(3))


def _refl_bwd(m3, n3, cot_r3):
    """Adjoint of reflect r = m − 2(m·n)n ⇒
    cot_m = cot_r − 2n(n·cot_r);  cot_n = −2[(m·n)·cot_r + (n·cot_r)·m]."""
    ncr = _dot3(n3, cot_r3)
    mn = _dot3(m3, n3)
    cot_m = tuple(cot_r3[k] - 2.0 * n3[k] * ncr for k in range(3))
    cot_n = tuple(-2.0 * (mn * cot_r3[k] + ncr * m3[k]) for k in range(3))
    return cot_m, cot_n


def _tile_l2_hand(glob, wtri, wsph, attrs, tgt, pix0, statics):
    """One tile of the fused L2 objective with the hand-derived adjoint.

    Returns (sq (1,R), dglob, dwtri, dwsph, dattrs) — the per-tile squared
    error row and the tile's parameter cotangents (summed over lanes).
    Forward math mirrors megakernel._tile_color line for line (same
    constants module, same op order) so images and records agree exactly.
    """
    H, W, max_depth, shadows, nb_t, nb_s, n_lights, R, TLB, SLB = statics
    t_pad = nb_t * TLB
    lane_g = lax.broadcasted_iota(jnp.int32, glob.shape, 1)

    def g(k):
        return jnp.sum(jnp.where(lane_g == k, glob, 0.0), axis=1,
                       keepdims=True)

    def g3(k):
        return (g(k), g(k + 1), g(k + 2))

    # ---- ray-gen (identical to _tile_color) -------------------------------
    pix = pix0 + lax.broadcasted_iota(jnp.int32, (1, R), 1)
    rowv = (pix // W).astype(f32)
    colm = (pix % W).astype(f32)
    aspect = W / H
    sx = (2.0 * (colm + 0.5) / W - 1.0) * aspect
    sy = 1.0 - 2.0 * (rowv + 0.5) / H
    eye, fwd = g3(0), g3(3)
    right_h, up_h = g3(6), g3(9)
    ambient = g3(12)
    graw = _add3(fwd, _add3(_scale3(right_h, sx), _scale3(up_h, sy)))
    d0 = _normalize3(graw)
    o0 = tuple(jnp.broadcast_to(e, (1, R)) for e in eye)

    iota_t = lax.broadcasted_iota(jnp.int32, (TLB, R), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (SLB, R), 0)
    rows8 = lax.broadcasted_iota(jnp.int32, (8, R), 0)

    def build_X(o3, d3):
        m = lambda k, v: jnp.where(rows8 == k, v, 0.0)        # noqa: E731
        return (
            m(0, o3[0]) + m(1, o3[1]) + m(2, o3[2]) + m(3, 1.0)
            + m(4, d3[0]) + m(5, d3[1]) + m(6, d3[2])
        )

    def tri_block_forms(X, b):
        wb = wtri[:, b * 6 * TLB : (b + 1) * 6 * TLB]
        out = lax.dot_general(
            wb, X, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        ).reshape(6, TLB, R)
        return wb, out

    def tri_eval(out, t_lo, t_hi):
        no_, ndd, uo, ud, vo, vd = (out[i] for i in range(6))
        good = jnp.abs(ndd) >= C.MT_DET_EPS
        safe_nd = jnp.where(good, ndd, 1.0)
        t = -no_ / safe_nd
        u = uo + t * ud
        v = vo + t * vd
        hit = (good & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > t_lo) & (t < t_hi))
        return jnp.where(hit, t, C.T_NONE), u, v

    def sph_block_forms(X, b):
        wb = wsph[:, b * 2 * SLB : (b + 1) * 2 * SLB]
        out = lax.dot_general(
            wb, X, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        ).reshape(2, SLB, R)
        return wb, out

    def sph_eval(out, oo, od, t_lo, t_hi):
        ct, cd = out[0], out[1]
        b_half = od - cd
        cterm = oo + ct
        disc = b_half * b_half - cterm
        has = disc > 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        t0 = -b_half - sq
        t1 = -b_half + sq
        t0_ok = has & (t0 > t_lo) & (t0 < t_hi)
        t1_ok = has & (t1 > t_lo) & (t1 < t_hi)
        return jnp.where(t0_ok, t0, jnp.where(t1_ok, t1, C.T_NONE))

    def closest(o3, d3):
        """Winner fold, mirroring _tile_color's fold_best tie rules, ALSO
        folding the winner's global slot id and its raw six forms (the
        residuals the hand adjoint needs — no re-intersection in bwd)."""
        X = build_X(o3, d3)
        oo = _dot3(o3, o3)
        od = _dot3(o3, d3)
        t_best = jnp.full((1, R), C.T_NONE, f32)
        a_best = jnp.zeros((PK.ACOLS, R), f32)
        u_best = jnp.zeros((1, R), f32)
        v_best = jnp.zeros((1, R), f32)
        win = jnp.full((1, R), -1, jnp.int32)       # global slot id
        six = [jnp.zeros((1, R), f32) for _ in range(6)]

        def fold(tm, u, v, attr_block, iota, blk, base, out_rows):
            nonlocal t_best, a_best, u_best, v_best, win, six
            bt = jnp.min(tm, axis=0, keepdims=True)
            bidx = jnp.min(jnp.where(tm == bt, iota, blk), axis=0,
                           keepdims=True)
            onehot = (iota == bidx).astype(f32)
            cand_a = lax.dot_general(
                attr_block, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
            cand_u = jnp.sum(onehot * u, axis=0, keepdims=True)
            cand_v = jnp.sum(onehot * v, axis=0, keepdims=True)
            imp = bt < t_best
            t_best = jnp.where(imp, bt, t_best)
            a_best = jnp.where(imp, cand_a, a_best)
            u_best = jnp.where(imp, cand_u, u_best)
            v_best = jnp.where(imp, cand_v, v_best)
            win = jnp.where(imp, base + bidx, win)
            for i in range(len(out_rows)):
                cand_i = jnp.sum(onehot * out_rows[i], axis=0, keepdims=True)
                six[i] = jnp.where(imp, cand_i, six[i])

        for b in range(nb_t):
            _, out = tri_block_forms(X, b)
            tm, u, v = tri_eval(out, C.T_MIN, C.T_MAX)
            fold(tm, u, v, attrs[b * TLB : (b + 1) * TLB], iota_t, TLB,
                 b * TLB, [out[i] for i in range(6)])
        for b in range(nb_s):
            _, out = sph_block_forms(X, b)
            tm = sph_eval(out, oo, od, C.T_MIN, C.T_MAX)
            zero = jnp.zeros_like(tm)
            fold(tm, zero, zero,
                 attrs[t_pad + b * SLB : t_pad + (b + 1) * SLB], iota_s,
                 SLB, t_pad + b * SLB, [out[0], out[1]])
        return t_best, a_best, u_best, v_best, win, six

    def occluded(o3, d3, tmax):
        X = build_X(o3, d3)
        oo = _dot3(o3, o3)
        od = _dot3(o3, d3)
        occ = jnp.zeros((1, R), bool)
        for b in range(nb_t):
            _, out = tri_block_forms(X, b)
            tm, _, _ = tri_eval(out, C.T_MIN, C.T_MAX)
            occ = occ | jnp.any(tm < tmax, axis=0, keepdims=True)
        for b in range(nb_s):
            _, out = sph_block_forms(X, b)
            tm = sph_eval(out, oo, od, C.T_MIN, C.T_MAX)
            occ = occ | jnp.any(tm < tmax, axis=0, keepdims=True)
        return occ

    # =======================================================================
    # forward sweep — residuals per depth kept live for the reverse sweep.
    # Dead/sky tiles cond-skip whole depths (HAND_SKIP): every value that
    # crosses a cond boundary is NUMERIC (alive rides as f32 0/1), so the
    # vector<i1>-residual Mosaic limitation that blocks the vjp replay's
    # conds never arises.  Skip branches are EXACT (see megakernel.py
    # shade_skip rationale): an all-miss depth contributes live·bg with
    # dead throughput; an all-dead depth is the identity.
    # =======================================================================
    bg = tuple(jnp.full((1, R), C.BACKGROUND[c], f32) for c in range(3))
    accum = tuple(jnp.zeros((1, R), f32) for _ in range(3))
    thr = jnp.ones((1, R), f32)
    alive_f = jnp.ones((1, R), f32)
    o, d = o0, d0
    res = []

    def a1(a, k):
        return a[k : k + 1]

    def a3(a, k):
        return (a1(a, k), a1(a, k + 1), a1(a, k + 2))

    def _anyrow(x):                   # (1, R) f32 → scalar bool
        return jnp.sum(x) > 0.0

    def shade_sec(t, a, u, v, win, six, args):
        o, d, thr, alive_f, accum = args
        hit = t < C.T_MAX
        p = _add3(o, _scale3(d, t))
        w_bar = 1.0 - u - v
        gsum = _add3(
            _scale3(a3(a, PK.A_N0), w_bar),
            _add3(_scale3(a3(a, PK.A_N1), u), _scale3(a3(a, PK.A_N2), v)),
        )
        n_int = _normalize3(gsum)
        flip = _dot3(n_int, d) > 0.0
        n_tri = _where3(flip, _neg3(n_int), n_int)
        psub = _sub3(p, a3(a, PK.A_CENTER))
        n_sph = _normalize3(psub)
        is_sph = a1(a, PK.A_IS_SPH) > 0.5
        n = _where3(is_sph, n_sph, n_tri)

        ka = a3(a, PK.A_KA)
        kd = a3(a, PK.A_KD)
        ks = a3(a, PK.A_KS)
        shin = a1(a, PK.A_SHIN)
        refl_a = a1(a, PK.A_REFL)

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
            spec = jnp.where((ndotl > 0.0) & (rdotv > 0.0),
                             safe_rv**shin, 0.0)
            if not shadows:
                vis = jnp.ones((1, R), f32)
            else:
                occ = occluded(p_off, ldir, dist - C.RAY_OFFSET_EPS)
                occ_bits = occ_bits | jnp.where(occ, 1 << li, 0)
                vis = 1.0 - occ.astype(f32)
            color = tuple(
                color[c] + vis * lcol[c] * (kd[c] * ndotl + ks[c] * spec)
                for c in range(3)
            )

        color = _where3(hit, color, bg)
        live = thr * alive_f
        accum = tuple(accum[c] + live * color[c] for c in range(3))
        refl_m = jnp.where(hit, refl_a, 0.0)
        thr2 = thr * refl_m
        alive2 = jnp.where(hit & (refl_m > 0.0), alive_f, 0.0)
        return (accum, thr2, alive2, p_off, _reflect3(d, n), occ_bits,
                color)

    def shade_sky(t, a, u, v, win, six, args):
        o, d, thr, alive_f, accum = args
        live = thr * alive_f
        accum = tuple(accum[c] + live * bg[c] for c in range(3))
        return (accum, jnp.zeros_like(thr), jnp.zeros_like(alive_f), o, d,
                jnp.zeros((1, R), jnp.int32), bg)

    def layer_defaults():
        return (jnp.full((1, R), C.T_NONE, f32),
                jnp.zeros((PK.ACOLS, R), f32),
                jnp.zeros((1, R), f32), jnp.zeros((1, R), f32),
                jnp.full((1, R), -1, jnp.int32),
                tuple(jnp.zeros((1, R), f32) for _ in range(6)))

    for _depth in range(max_depth + 1):
        args = (o, d, thr, alive_f, accum)
        if _depth == 0:
            t, a, u, v, win, six = closest(o, d)
            six = tuple(six)
            hit_any = (t < C.T_MAX).astype(f32)
            if HAND_SKIP:
                (accum, thr, alive_f, o, d, occ_bits, color) = lax.cond(
                    _anyrow(hit_any),
                    functools.partial(shade_sec, t, a, u, v, win, six),
                    functools.partial(shade_sky, t, a, u, v, win, six),
                    args)
            else:
                (accum, thr, alive_f, o, d, occ_bits, color) = shade_sec(
                    t, a, u, v, win, six, args)
        else:
            def layer_full(args):
                o_, d_ = args[0], args[1]
                t_, a_, u_, v_, win_, six_ = closest(o_, d_)
                six_ = tuple(six_)
                outs = shade_sec(t_, a_, u_, v_, win_, six_, args)
                return outs + (t_, a_, u_, v_, win_, six_)

            def layer_idle(args):
                o_, d_, thr_, alive_, accum_ = args
                t_, a_, u_, v_, win_, six_ = layer_defaults()
                return ((accum_, thr_, alive_, o_, d_,
                         jnp.zeros((1, R), jnp.int32), bg)
                        + (t_, a_, u_, v_, win_, six_))

            if HAND_SKIP:
                (accum, thr, alive_f, o, d, occ_bits, color, t, a, u, v,
                 win, six) = lax.cond(_anyrow(alive_f), layer_full,
                                      layer_idle, args)
            else:
                (accum, thr, alive_f, o, d, occ_bits, color, t, a, u, v,
                 win, six) = layer_full(args)
        res.append(dict(o=args[0], d=args[1], thr=args[2], alive=args[3],
                        t=t, a=a, u=u, v=v, win=win, six=six, occ=occ_bits,
                        color=color))

    clipped = tuple(jnp.clip(accum[c], C.CLAMP_LO, C.CLAMP_HI)
                    for c in range(3))

    # ---- L2 objective + seed ----------------------------------------------
    valid = (pix < H * W).astype(f32)
    e = tuple((clipped[c] - tgt[c : c + 1, :]) * valid for c in range(3))
    sq = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
    cot_acc = tuple(
        jnp.where((accum[c] >= C.CLAMP_LO) & (accum[c] <= C.CLAMP_HI),
                  2.0 * e[c], 0.0)
        for c in range(3)
    )

    # =======================================================================
    # reverse sweep — one cond-skipped adjoint block per depth; the carry
    # (ray/throughput cotangents + every parameter accumulator) is all-f32
    # =======================================================================
    dglob0 = jnp.zeros_like(glob)
    dwt_b0 = tuple(jnp.zeros((8, 6 * TLB), f32) for _ in range(nb_t))
    dws_b0 = tuple(jnp.zeros((8, 2 * SLB), f32) for _ in range(nb_s))
    dat_b0 = (tuple(jnp.zeros((TLB, PK.ACOLS), f32) for _ in range(nb_t))
              + tuple(jnp.zeros((SLB, PK.ACOLS), f32) for _ in range(nb_s)))

    zero3 = (jnp.zeros((1, R), f32),) * 3
    carry = (zero3, zero3, jnp.zeros((1, R), f32), dglob0, dwt_b0, dws_b0,
             dat_b0)

    def bwd_depth(rd, carry):
        cot_o, cot_d, cot_thr, dglob, dwt_b, dws_b, dat_b = carry
        dwt_b, dws_b, dat_b = list(dwt_b), list(dws_b), list(dat_b)
        o, d, thr, alive_f = rd["o"], rd["d"], rd["thr"], rd["alive"]
        t, a, u, v, win, six = (rd["t"], rd["a"], rd["u"], rd["v"],
                                rd["win"], rd["six"])
        occ_bits, color = rd["occ"], rd["color"]
        hit = t < C.T_MAX
        live = thr * alive_f
        refl_a = a1(a, PK.A_REFL)
        refl_m = jnp.where(hit, refl_a, 0.0)

        def glob_add(dg, k, val):
            sm = jnp.sum(val, axis=1, keepdims=True)
            return dg + jnp.where(lane_g == k, sm, 0.0)

        def glob_add3(dg, k, v3):
            for i in range(3):
                dg = glob_add(dg, k + i, v3[i])
            return dg

        # recompute the (cheap) shading intermediates at fixed residuals
        p = _add3(o, _scale3(d, t))
        w_bar = 1.0 - u - v
        n0r, n1r, n2r = (a3(a, PK.A_N0), a3(a, PK.A_N1), a3(a, PK.A_N2))
        gsum = _add3(_scale3(n0r, w_bar),
                     _add3(_scale3(n1r, u), _scale3(n2r, v)))
        n_int = _normalize3(gsum)
        flip = _dot3(n_int, d) > 0.0
        n_tri = _where3(flip, _neg3(n_int), n_int)
        cen = a3(a, PK.A_CENTER)
        psub = _sub3(p, cen)
        n_sph = _normalize3(psub)
        is_sph = a1(a, PK.A_IS_SPH) > 0.5
        n = _where3(is_sph, n_sph, n_tri)
        ka = a3(a, PK.A_KA)
        kd = a3(a, PK.A_KD)
        ks = a3(a, PK.A_KS)
        shin = a1(a, PK.A_SHIN)
        view = _neg3(d)

        # ---- thr2 = thr·refl_m --------------------------------------------
        cot_refl_m = cot_thr * thr
        cot_thr_in = cot_thr * refl_m
        cot_a = jnp.zeros((PK.ACOLS, R), f32)

        def arow(carr, k, val):
            krow = lax.broadcasted_iota(jnp.int32, carr.shape, 0)
            return carr + jnp.where(krow == k, val, 0.0)

        def arow3(carr, k, v3):
            for i in range(3):
                carr = arow(carr, k + i, v3[i])
            return carr

        cot_a = arow(cot_a, PK.A_REFL, jnp.where(hit, cot_refl_m, 0.0))

        # ---- accum += live·color ------------------------------------------
        cot_live = sum(cot_acc[c] * color[c] for c in range(3))
        cot_thr_in = cot_thr_in + cot_live * alive_f
        cot_color = tuple(cot_acc[c] * live for c in range(3))
        cot_csh = tuple(jnp.where(hit, cot_color[c], 0.0) for c in range(3))

        # ---- lights (adjoint; intermediates recomputed per light) ---------
        cot_n = (jnp.zeros((1, R), f32),) * 3
        cot_p = (jnp.zeros((1, R), f32),) * 3
        cot_view = (jnp.zeros((1, R), f32),) * 3
        cot_u_s = jnp.zeros((1, R), f32)
        cot_v_s = jnp.zeros((1, R), f32)
        for li in range(n_lights):
            lpos = g3(PK.NGLOB_BASE + 3 * li)
            lcol = g3(PK.NGLOB_BASE + 3 * n_lights + 3 * li)
            to_l = _sub3(lpos, p)
            dist2 = _dot3(to_l, to_l)
            dist = jnp.sqrt(dist2)
            minv = jnp.maximum(dist, 1e-20)
            inv = 1.0 / minv
            ldir = _scale3(to_l, inv)
            raw_nl = _dot3(n, ldir)
            ndotl = jnp.maximum(raw_nl, 0.0)
            mneg = _neg3(ldir)
            refl_l = _reflect3(mneg, n)
            raw_rv = _dot3(refl_l, view)
            rdotv = jnp.maximum(raw_rv, 0.0)
            safe_rv = jnp.where(rdotv > 0.0, rdotv, 1.0)
            specmask = (ndotl > 0.0) & (rdotv > 0.0)
            spec = jnp.where(specmask, safe_rv**shin, 0.0)
            if shadows:
                vis = 1.0 - ((occ_bits >> li) & 1).astype(f32)
            else:
                vis = jnp.ones((1, R), f32)

            cot_kd = tuple(vis * lcol[c] * ndotl * cot_csh[c]
                           for c in range(3))
            cot_ks = tuple(vis * lcol[c] * spec * cot_csh[c]
                           for c in range(3))
            cot_ndotl = vis * sum(lcol[c] * kd[c] * cot_csh[c]
                                  for c in range(3))
            cot_spec = vis * sum(lcol[c] * ks[c] * cot_csh[c]
                                 for c in range(3))
            cot_lcol = tuple(
                vis * (kd[c] * ndotl + ks[c] * spec) * cot_csh[c]
                for c in range(3))
            dglob = glob_add3(dglob, PK.NGLOB_BASE + 3 * n_lights + 3 * li,
                              cot_lcol)
            cot_a = arow3(cot_a, PK.A_KD, cot_kd)
            cot_a = arow3(cot_a, PK.A_KS, cot_ks)

            cot_srv = jnp.where(specmask,
                                shin * safe_rv ** (shin - 1.0),
                                0.0) * cot_spec
            cot_shin = jnp.where(specmask, spec * jnp.log(safe_rv),
                                 0.0) * cot_spec
            cot_a = arow(cot_a, PK.A_SHIN, cot_shin)
            cot_rdotv = jnp.where(rdotv > 0.0, cot_srv, 0.0)
            cot_raw_rv = jnp.where(raw_rv > 0.0, cot_rdotv, 0.0)
            cot_refl_l = tuple(view[k] * cot_raw_rv for k in range(3))
            cot_view = tuple(cot_view[k] + refl_l[k] * cot_raw_rv
                             for k in range(3))
            cot_m, cot_n_r = _refl_bwd(mneg, n, cot_refl_l)
            cot_n = tuple(cot_n[k] + cot_n_r[k] for k in range(3))
            cot_ldir = _neg3(cot_m)
            cot_raw_nl = jnp.where(raw_nl > 0.0, cot_ndotl, 0.0)
            cot_n = tuple(cot_n[k] + ldir[k] * cot_raw_nl for k in range(3))
            cot_ldir = tuple(cot_ldir[k] + n[k] * cot_raw_nl
                             for k in range(3))
            cot_to_l = tuple(cot_ldir[k] * inv for k in range(3))
            cot_inv = _dot3(to_l, cot_ldir)
            cot_minv = -(inv * inv) * cot_inv
            cot_dist = jnp.where(dist > 1e-20, cot_minv, 0.0)
            cot_dist2 = jnp.where(dist2 > 0.0, cot_dist / (2.0 * dist), 0.0)
            cot_to_l = tuple(cot_to_l[k] + 2.0 * to_l[k] * cot_dist2
                             for k in range(3))
            dglob = glob_add3(dglob, PK.NGLOB_BASE + 3 * li, cot_to_l)
            cot_p = tuple(cot_p[k] - cot_to_l[k] for k in range(3))

        cot_a = arow3(cot_a, PK.A_KA,
                      tuple(ambient[c] * cot_csh[c] for c in range(3)))
        dglob = glob_add3(dglob, 12,
                          tuple(ka[c] * cot_csh[c] for c in range(3)))

        # ---- next-ray carries: o2 = p_off, d2 = reflect(d, n) -------------
        cot_p = tuple(cot_p[k] + cot_o[k] for k in range(3))
        cot_n = tuple(cot_n[k] + C.RAY_OFFSET_EPS * cot_o[k]
                      for k in range(3))
        cot_d_in, cot_n_r2 = _refl_bwd(d, n, cot_d)
        cot_n = tuple(cot_n[k] + cot_n_r2[k] for k in range(3))
        cot_view_d = _neg3(cot_view)
        cot_d_in = tuple(cot_d_in[k] + cot_view_d[k] for k in range(3))

        # ---- n = where(is_sph, n_sph, n_tri) ------------------------------
        cot_nsph = _where3(is_sph, cot_n, (0.0,) * 3)
        cot_ntri = _where3(is_sph, (0.0,) * 3, cot_n)
        cot_psub = _nrm_bwd(psub, cot_nsph)
        cot_p = tuple(cot_p[k] + cot_psub[k] for k in range(3))
        cot_a = arow3(cot_a, PK.A_CENTER, _neg3(cot_psub))
        cot_nint = _where3(flip, _neg3(cot_ntri), cot_ntri)
        cot_g = _nrm_bwd(gsum, cot_nint)
        cot_a = arow3(cot_a, PK.A_N0,
                      tuple(w_bar * cot_g[k] for k in range(3)))
        cot_a = arow3(cot_a, PK.A_N1, tuple(u * cot_g[k] for k in range(3)))
        cot_a = arow3(cot_a, PK.A_N2, tuple(v * cot_g[k] for k in range(3)))
        cot_u_s = cot_u_s + sum((n1r[k] - n0r[k]) * cot_g[k]
                                for k in range(3))
        cot_v_s = cot_v_s + sum((n2r[k] - n0r[k]) * cot_g[k]
                                for k in range(3))

        # ---- p = o + t·d ---------------------------------------------------
        cot_o_in = cot_p
        cot_t = _dot3(cot_p, d)
        cot_d_in = tuple(cot_d_in[k] + t * cot_p[k] for k in range(3))

        # ---- winner transpose (closest adjoint) ---------------------------
        is_tri_w = hit & (win < t_pad) & (win >= 0)
        is_sph_w = hit & (win >= t_pad)
        cot_u_tot = jnp.where(is_tri_w, cot_u_s, 0.0)
        cot_v_tot = jnp.where(is_tri_w, cot_v_s, 0.0)
        no_w, nd_w = six[0], six[1]
        ud_w, vd_w = six[3], six[5]
        cot_t_tri = jnp.where(
            is_tri_w, cot_t + ud_w * cot_u_tot + vd_w * cot_v_tot, 0.0)
        good_w = jnp.abs(nd_w) >= C.MT_DET_EPS
        safe_nd_w = jnp.where(good_w, nd_w, 1.0)
        t_tri_val = -no_w / safe_nd_w
        cot_no = jnp.where(good_w, -cot_t_tri / safe_nd_w, 0.0)
        cot_nd = jnp.where(good_w, -t_tri_val / safe_nd_w, 0.0) * cot_t_tri
        cot_uo = cot_u_tot
        cot_ud = t_tri_val * cot_u_tot
        cot_vo = cot_v_tot
        cot_vd = t_tri_val * cot_v_tot
        # sphere winner: t from the selected quadratic root
        oo = _dot3(o, o)
        od = _dot3(o, d)
        ct_w, cd_w = six[0], six[1]
        b_half = od - cd_w
        cterm = oo + ct_w
        disc = b_half * b_half - cterm
        has = disc > 0.0
        sqv = jnp.sqrt(jnp.where(has, disc, 1.0))
        t0 = -b_half - sqv
        # the saved t is bit-equal to the recomputed selected root, so
        # exact equality identifies which root won (t = −b_half ± sq)
        sgn = jnp.where(t == t0, -1.0, 1.0)
        cot_t_sph = jnp.where(is_sph_w, cot_t, 0.0)
        cot_bh = -cot_t_sph
        cot_sq = sgn * cot_t_sph
        cot_disc = jnp.where(has, cot_sq / (2.0 * sqv), 0.0)
        cot_bh = cot_bh + 2.0 * b_half * cot_disc
        cot_cterm = -cot_disc
        cot_ct = jnp.where(is_sph_w, cot_cterm, 0.0)
        cot_cd = jnp.where(is_sph_w, -cot_bh, 0.0)
        cot_oo = jnp.where(is_sph_w, cot_cterm, 0.0)
        cot_od = jnp.where(is_sph_w, cot_bh, 0.0)
        cot_o_in = tuple(cot_o_in[k] + 2.0 * o[k] * cot_oo + d[k] * cot_od
                         for k in range(3))
        cot_d_in = tuple(cot_d_in[k] + o[k] * cot_od for k in range(3))

        # per-block form transposes: d_wb = X·d_formsT, d_X += wb·d_forms
        X = build_X(o, d)
        cot_X = jnp.zeros((8, R), f32)
        for b in range(nb_t):
            wb = wtri[:, b * 6 * TLB : (b + 1) * 6 * TLB]
            onehot = ((iota_t == (win - b * TLB)) & is_tri_w).astype(f32)
            rows6 = [cot_no, cot_nd, cot_uo, cot_ud, cot_vo, cot_vd]
            d_forms = jnp.concatenate(
                [onehot * rows6[i] for i in range(6)], axis=0
            ).reshape(6 * TLB, R)
            dwb = lax.dot_general(
                X, d_forms, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
            dwt_b[b] = dwt_b[b] + dwb
            cot_X = cot_X + lax.dot_general(
                wb, d_forms, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
        for b in range(nb_s):
            wb = wsph[:, b * 2 * SLB : (b + 1) * 2 * SLB]
            base = t_pad + b * SLB
            onehot = ((iota_s == (win - base)) & is_sph_w).astype(f32)
            d_forms = jnp.concatenate(
                [onehot * cot_ct, onehot * cot_cd], axis=0
            ).reshape(2 * SLB, R)
            dwb = lax.dot_general(
                X, d_forms, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
            dws_b[b] = dws_b[b] + dwb
            cot_X = cot_X + lax.dot_general(
                wb, d_forms, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
        cot_o_in = tuple(cot_o_in[k] + cot_X[k : k + 1, :] for k in range(3))
        cot_d_in = tuple(cot_d_in[k] + cot_X[4 + k : 5 + k, :]
                         for k in range(3))

        # ---- attrs: scatter cot_a through the winner one-hot --------------
        for b in range(nb_t):
            onehot = ((iota_t == (win - b * TLB)) & hit
                      & (win >= b * TLB) & (win < (b + 1) * TLB)).astype(f32)
            dab = lax.dot_general(
                onehot, cot_a, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
            dat_b[b] = dat_b[b] + dab
        for b in range(nb_s):
            base = t_pad + b * SLB
            onehot = ((iota_s == (win - base)) & hit & (win >= base)
                      & (win < base + SLB)).astype(f32)
            dab = lax.dot_general(
                onehot, cot_a, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.HIGHEST,
            )
            dat_b[nb_t + b] = dat_b[nb_t + b] + dab

        return (cot_o_in, cot_d_in, cot_thr_in, dglob, tuple(dwt_b),
                tuple(dws_b), tuple(dat_b))

    def bwd_sky0(rd, carry):
        """Adjoint of shade_sky (the depth-0 all-miss branch): the layer
        was accum += thr·alive·bg with thr2 = 0, so only cot_thr changes."""
        cot_o, cot_d, cot_thr, dglob, dwt_b, dws_b, dat_b = carry
        cot_thr_new = rd["alive"] * sum(bg[c] * cot_acc[c] for c in range(3))
        return (cot_o, cot_d, cot_thr_new, dglob, dwt_b, dws_b, dat_b)

    for _depth in range(max_depth, -1, -1):
        rd = res[_depth]
        if not HAND_SKIP:
            carry = bwd_depth(rd, carry)
        elif _depth == 0:
            carry = lax.cond(
                _anyrow((rd["t"] < C.T_MAX).astype(f32)),
                functools.partial(bwd_depth, rd),
                functools.partial(bwd_sky0, rd), carry)
        else:
            # a depth whose layer was idle (no live lane) is the identity
            # in the forward, hence the identity on every cotangent
            carry = lax.cond(
                _anyrow(rd["alive"]),
                functools.partial(bwd_depth, rd), lambda cr: cr, carry)

    cot_o, cot_d, cot_thr, dglob, dwt_b, dws_b, dat_b = carry

    # ---- ray-gen adjoint ---------------------------------------------------
    # o0 = eye (broadcast); d0 = normalize(fwd + right·sx + up·sy)
    def glob_fin3(dg, k, v3):
        for i in range(3):
            sm = jnp.sum(v3[i], axis=1, keepdims=True)
            dg = dg + jnp.where(lane_g == k + i, sm, 0.0)
        return dg

    dglob = glob_fin3(dglob, 0, cot_o)
    cot_graw = _nrm_bwd(graw, cot_d)
    dglob = glob_fin3(dglob, 3, cot_graw)
    dglob = glob_fin3(dglob, 6, tuple(sx * cot_graw[k] for k in range(3)))
    dglob = glob_fin3(dglob, 9, tuple(sy * cot_graw[k] for k in range(3)))

    dwtri = (jnp.concatenate(list(dwt_b), axis=1) if nb_t
             else jnp.zeros_like(wtri))
    dwsph = (jnp.concatenate(list(dws_b), axis=1) if nb_s
             else jnp.zeros_like(wsph))
    dattrs = (jnp.concatenate(list(dat_b), axis=0) if dat_b
              else jnp.zeros_like(attrs))
    return sq, dglob, dwtri, dwsph, dattrs


def _hand_kernel(off_ref, glob_ref, wtri_ref, wsph_ref, attrs_ref, tgt_ref,
                 sq_ref, dglob_ref, dwtri_ref, dwsph_ref, dattrs_ref, *,
                 statics):
    R = statics[7]
    pix0 = off_ref[0, 0] + pl.program_id(0) * R
    sq, dgl, dwt, dws, dat = _tile_l2_hand(
        glob_ref[...], wtri_ref[...], wsph_ref[...], attrs_ref[...],
        tgt_ref[...], pix0, statics)
    sq_ref[...] = sq

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


def hand_l2_pallas(packed, tgt, off, statics, rays, ntiles, glob):
    """pallas_call wrapper (same output contract as megakernel's fused
    kernel): → (sq (1, ntiles·rays), dglob, dwtri, dwsph, dattrs)."""
    n_pad = ntiles * rays
    return pl.pallas_call(
        functools.partial(_hand_kernel, statics=statics),
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
        interpret=jax.default_backend() == "cpu",
    )
