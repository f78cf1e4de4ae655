"""Backward-pass decomposition with REAL hit records + scatter micro-benches.

The r2 sorted-scatter negative result (docs/design.md) proved the random-pid
ablation (scripts/ablate_bwd.py) misleads: real records are COHERENT
(neighboring pixels hit the same triangle), and the native scatter already
enjoys run-length locality.  This script measures the backward with the
records the traversal kernel actually produces, plus isolated micro-benches
of every scatter/transpose shape in the bwd graph, so the r3 fix targets
the op that actually dominates (VERDICT r2 "next round" item 1).

Run (real TPU): python scripts/ablate_bwd_real.py [--config 5] [--res HxW]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse

import jax
import jax.numpy as jnp

from tpurt.core import geom
from tpurt.render import cap_depth, prepare, render
from tpurt.scene import configs
from tpurt.shading import deferred as D

ap = argparse.ArgumentParser()
ap.add_argument("--config", type=int, default=5)
ap.add_argument("--res", type=str, default=None)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

if args.res is not None:
    h, w = (int(x) for x in args.res.split("x"))
    if args.config == 5:
        scene, cfg = configs.config5_multimesh(height=h, width=w,
                                               n_blobs=2, subdiv=3)
    else:
        scene, cfg = configs.ALL_CONFIGS[args.config](h, w)
elif args.config == 5:
    scene, cfg = configs.config5_multimesh(height=1080, width=1920)
else:
    scene, cfg = configs.ALL_CONFIGS[args.config](1024, 1024)

plan = prepare(scene, cfg)
assert plan.kind == "clusters", plan.kind
cfgc = cap_depth(cfg, plan)
H, W = cfg.height, cfg.width
N = H * W
T = scene.n_tris
V = scene.vertices.shape[0]
print(f"[ablate_bwd_real] config{args.config} {H}x{W} T={T} V={V} "
      f"depth={cfgc.max_depth}", file=sys.stderr)


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0:1][0])


def bench(name, fn, *a, iters=3):
    fetch(fn(*a))
    fetch(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*a)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms", file=sys.stderr)
    return dt


# ---- REAL records from the actual traversal (device-resident) -------------
@jax.jit
def real_records(s):
    from tpurt.kernels import traversal as TV
    from tpurt.kernels.packc import pack_clusters

    packed = pack_clusters(s, plan.tri_ids)
    if cfgc.wavefront and cfgc.max_depth > 0:
        ids, occ = TV._wavefront_records(s, cfgc, packed, 0, H)
    else:
        ids, occ, _, _ = TV.trace_records(packed, cfgc, 0, H)
        ids = TV._untile(ids, H, W)
        occ = TV._untile(occ, H, W)
    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    return D.HitRecords(prim=prim, is_tri=is_tri, occ=occ)


recs = jax.block_until_ready(real_records(scene))
pid0 = jnp.maximum(recs.prim[0], 0)      # (N,) real, coherent
n_hit = int(jnp.sum(recs.prim[0] >= 0))
print(f"[ablate_bwd_real] hits at depth0: {n_hit}/{N} "
      f"({100.0 * n_hit / N:.0f}%)", file=sys.stderr)


def rays():
    o, d = geom.generate_rays(scene.camera, H, W, 0, H)
    return o.reshape(-1, 3), d.reshape(-1, 3)


# ---- the REAL graphs -------------------------------------------------------
def _fwd_shade(s, r):
    o, d = rays()
    return D.shade_from_records(s, o, d, r, cfgc.max_depth, cfg.shadows)


def _loss_shade(s, r):
    img = _fwd_shade(s, r)
    return jnp.sum(img * img)


def _loss_full(s):
    img = render(s, cfg, plan=plan)
    return jnp.sum(img * img)


t_fwd_full = bench("render_fwd (full path)", jax.jit(_loss_full), scene)
t_fwdbwd_full = bench(
    "render_fwdbwd (full path)",
    jax.jit(jax.grad(_loss_full, allow_int=True)), scene)
t_fwd_shade = bench("shade_fwd (records fixed)", jax.jit(_fwd_shade),
                    scene, recs)
t_bwd_shade = bench(
    "shade_fwdbwd (records fixed)",
    jax.jit(jax.grad(_loss_shade, allow_int=True)), scene, recs)
print(f"[ablate_bwd_real] bwd-extra full={t_fwdbwd_full - t_fwd_full:.1f} ms "
      f"shade-only={t_bwd_shade - t_fwd_shade:.1f} ms", file=sys.stderr)


# ---- leaf-restricted backward of the REAL (production) shade graph ---------
# (the slab-path leaf ablation in ablate_bwd.py measures a different,
# non-compacted graph — r4 discovered its numbers are ~5x the production
# path's and do not locate today's cost)
def _restrict(names):
    sg = jax.lax.stop_gradient

    def f(s, r):
        import dataclasses as DC

        reps = {}
        for fld in ("vertices", "vnormals", "uvs", "textures", "materials",
                    "light_pos", "light_color"):
            if not hasattr(s, fld) or getattr(s, fld) is None:
                continue
            if fld not in names:
                reps[fld] = (sg(getattr(s, fld))
                             if fld != "materials"
                             else jax.tree_util.tree_map(sg, s.materials))
        return _loss_shade(DC.replace(s, **reps), r)

    return jax.jit(jax.grad(f, allow_int=True))


bench("shade_bwd verts-only", _restrict({"vertices", "vnormals"}), scene,
      recs)
if scene.textured:
    bench("shade_bwd tex-only", _restrict({"textures", "uvs"}), scene, recs)
bench("shade_bwd mats+lights-only",
      _restrict({"materials", "light_pos", "light_color"}), scene, recs)
# r5 finer split (VERDICT r4 item 4: "33 ms for gradients into 4 material
# rows + 2 lights is enormous; nobody has asked what it is actually made
# of") — each leaf alone, so shared-recompute shows as sum-minus-parts
bench("shade_bwd lights-only", _restrict({"light_pos", "light_color"}),
      scene, recs)
bench("shade_bwd light_color-only", _restrict({"light_color"}), scene, recs)
bench("shade_bwd materials-only", _restrict({"materials"}), scene, recs)
if scene.textured:
    bench("shade_bwd textures-only(no uv)", _restrict({"textures"}), scene,
          recs)
    bench("shade_bwd uvs-only", _restrict({"uvs"}), scene, recs)
bench("shade_bwd nothing (pure replay)", _restrict(set()), scene, recs)

# ---- scatter micro-benches on the REAL pid distribution --------------------
key = jax.random.PRNGKey(0)
cot25 = jax.random.normal(key, (N, 25), jnp.float32)


@jax.jit
def scat_naive(pid, cot):
    return jnp.zeros((T, 25), jnp.float32).at[pid].add(cot)


@jax.jit
def scat_inbounds(pid, cot):
    return jnp.zeros((T, 25), jnp.float32).at[pid].add(
        cot, mode="promise_in_bounds")


@jax.jit
def scat_sorted(pid, cot):
    order = jnp.argsort(pid)
    return jax.ops.segment_sum(cot[order], pid[order], num_segments=T,
                               indices_are_sorted=True)


@jax.jit
def scat_runcomp(pid, cot):
    # run-compress consecutive equal pids (coherent records → long runs)
    # with a SORTED-by-construction segment id (a cumsum, no argsort), then
    # scatter run sums: non-start rows point at dummy row T with zero update
    newrun = jnp.concatenate(
        [jnp.ones((1,), bool), pid[1:] != pid[:-1]])
    seg = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    runsum = jax.ops.segment_sum(cot, seg, num_segments=N,
                                 indices_are_sorted=True)
    idx = jnp.where(newrun, pid, T)
    upd = jnp.where(newrun[:, None], runsum[seg], 0.0)
    return jnp.zeros((T + 1, 25), jnp.float32).at[idx].add(upd)[:T]


bench("scatter (T,25) naive REAL pids", scat_naive, pid0, cot25)
bench("scatter (T,25) promise_in_bounds", scat_inbounds, pid0, cot25)
bench("scatter (T,25) global-sort segsum", scat_sorted, pid0, cot25)
bench("scatter (T,25) run-compressed", scat_runcomp, pid0, cot25)

# vertex-table transpose: 3 × (V, 8) scatters at T updates (bwd of the
# shadepack build) — T-sized, fixed, should be small
cotT8 = jax.random.normal(key, (T, 8), jnp.float32)
tri = scene.triangles


@jax.jit
def scat_verts(cot):
    out = jnp.zeros((V, 8), jnp.float32)
    for k in range(3):
        out = out.at[tri[:, k]].add(cot)
    return out


bench("scatter 3x(V,8) @T updates", scat_verts, cotT8)

if scene.textured:
    nt, th, tw, _ = scene.textures.shape
    cot12 = jax.random.normal(key, (N, 12), jnp.float32)
    # real texel indices would need the uv replay; approximate coherence
    # with pid-derived indices (same run structure)
    tidx = jnp.mod(pid0, nt * th * tw)

    @jax.jit
    def scat_tex(idx, cot):
        return jnp.zeros((nt * th * tw, 12), jnp.float32).at[idx].add(cot)

    bench("scatter texquad @2M updates", scat_tex, tidx, cot12)

# gather forward for reference (the fwd side of the same op)
pack_host = jax.jit(D._build_shadepack)(scene)


@jax.jit
def gath(pid):
    return pack_host[pid]


bench("gather (N,25) REAL pids", gath, pid0)
