"""Backward-pass cost decomposition for the deferred-shading path.

The fwd+bwd headline (BASELINE.json:2) runs the cluster traversal kernels
(non-differentiable, stop_gradient'ed) once, plus the deferred shading
replay fwd AND its vjp.  The bwd suspects are the gather transposes —
scatter-adds at 2M pixels into (T, 9) shadepack tables, (V, 3) vertices,
and the flat texel array:

  shade_fwd    shade_from_records forward only
  shade_bwd    full vjp to every float scene leaf
  bwd_verts    vjp restricted to vertices/vnormals (zero tangents elsewhere)
  bwd_tex      vjp restricted to textures
  bwd_mats     vjp restricted to material tables + lights
  pack_fwd     pack_clusters forward (runs under fwd+bwd too)

Run: python scripts/ablate_bwd.py [--config N]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse
import dataclasses

import jax
import jax.numpy as jnp

from tpurt.scene import configs
from tpurt.core import geom
from tpurt.shading import deferred as D

ap = argparse.ArgumentParser()
ap.add_argument("--config", type=int, default=5)
ap.add_argument("--res", type=str, default=None,
                help="HxW override (default: the config's production res)")
ap.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
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
H, W = cfg.height, cfg.width
N = H * W
T = scene.n_tris

# Records are passed as JIT ARGUMENTS and rays are generated INSIDE the
# jitted functions, mirroring the real render path.  Closing over (N, 3)
# / (N, 1) host constants embeds them as XLA constant literals, which the
# TPU backend materializes with (8, 128) lane tiling — 42–128× padding,
# ~1 GB each at 1080p; the c5 ablation OOM'd the AOT compiler at 30 GB
# before this restructure (the real path never materializes them: ray-gen
# output fuses straight into the shading consumers).
key = jax.random.PRNGKey(0)
prim = jax.random.randint(key, (1, N), 0, T)
is_tri = jnp.ones((1, N), bool)
occ = jax.random.randint(key, (1, N), 0, 4)
recs = D.HitRecords(prim=prim, is_tri=is_tri, occ=occ)
recs = jax.device_put(recs)


def rays():
    o, d = geom.generate_rays(scene.camera, H, W, 0, H)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0:1][0])


def bench(name, fn, *a):
    fetch(fn(*a))
    fetch(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(3):
        out = fn(*a)
    fetch(out)
    dt = (time.perf_counter() - t0) / 3 * 1e3
    print(f"{name}: {dt:.1f} ms", file=sys.stderr)
    return dt


# The grad functions shade in checkpointed row slabs: the standalone vjp
# at full 1080p compiles to ~22 GB of HLO temps (every (N, 12) residual
# lane-pads 12→128), where the REAL fwd+bwd graph fits — the traversal
# kernel between ray-gen and shading gives XLA's remat/compression pass
# cheap recompute roots the standalone graph lacks.  jax.checkpoint per
# slab restores that property explicitly; the bwd numbers therefore
# include one slab-recompute of the forward (~shade_fwd/8 per slab),
# which is uniform across the leaf-restricted variants being compared.
SLABS = 8
assert H % SLABS == 0
ROWS_SLAB = H // SLABS
NS = ROWS_SLAB * W


def loss(s, r):
    from jax import lax

    @jax.checkpoint
    def slab(k, s):
        o, d = geom.generate_rays(s.camera, H, W, k * ROWS_SLAB, ROWS_SLAB)
        sl = lambda a: lax.dynamic_slice_in_dim(a, k * NS, NS, axis=1)
        rk = D.HitRecords(prim=sl(r.prim), is_tri=sl(r.is_tri), occ=sl(r.occ))
        img = D.shade_from_records(s, o.reshape(-1, 3), d.reshape(-1, 3),
                                   rk, cfg.max_depth, True)
        return jnp.sum(img * img)

    return jnp.sum(lax.map(lambda k: slab(k, s), jnp.arange(SLABS)))


def _fwd(s, r):
    o, d = rays()
    return D.shade_from_records(s, o, d, r, cfg.max_depth, True)


shade_fwd = jax.jit(_fwd)
shade_bwd = jax.jit(jax.grad(loss, allow_int=True))


def restrict(names):
    """grad flowing only to the named leaves (others stop_gradient'ed)."""
    sg = jax.lax.stop_gradient

    def f(s, r):
        kw = {}
        for fld in ("vertices", "vnormals", "uvs", "textures", "light_pos",
                    "light_color"):
            if fld not in names and getattr(s, fld, None) is not None:
                kw[fld] = sg(getattr(s, fld))
        if "materials" not in names:
            kw["materials"] = sg(s.materials)
        return loss(dataclasses.replace(s, **kw), r)

    return jax.jit(jax.grad(f, allow_int=True))


bench("shade_fwd", shade_fwd, scene, recs)
bench("shade_bwd (all leaves)", shade_bwd, scene, recs)
bench("bwd_verts", restrict({"vertices", "vnormals"}), scene, recs)
if scene.textured:
    bench("bwd_tex", restrict({"textures", "uvs"}), scene, recs)
bench("bwd_mats+lights", restrict({"materials", "light_pos", "light_color"}),
      scene, recs)

from tpurt.kernels.packc import pack_clusters
from tpurt.render import prepare

plan = prepare(scene, cfg)
if plan.kind == "clusters":
    pack_j = jax.jit(lambda s: pack_clusters(s, plan.tri_ids))
    bench("pack_fwd", pack_j, scene)
