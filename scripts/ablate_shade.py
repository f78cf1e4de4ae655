"""Deferred-shading cost decomposition at 2M pixels (config 5 @1080p).

Gather-heavy suspects, timed separately on the real chip with synthetic
(but valid) hit records — shading cost is topology-independent:
  tuv      _recompute_tuv        (tri + 3 vertex chained gathers)
  geom     _hit_geometry         (tri + 3 vnormal gathers, sphere rows)
  tex      _hit_uv + _sample_texture (3 uv + 4 texel gathers)
  phong    the per-light shading math (material gathers + VPU)
  full     shade_from_records depth-0 layer end to end
Run: python scripts/ablate_shade.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse

import jax
import jax.numpy as jnp

from tpurt.scene import configs
from tpurt.core import geom
from tpurt.shading import deferred as D

ap = argparse.ArgumentParser()
ap.add_argument("--config", type=int, default=5)
args = ap.parse_args()

if args.config == 5:
    scene, cfg = configs.config5_multimesh(height=1080, width=1920)
else:
    scene, cfg = configs.ALL_CONFIGS[args.config](1024, 1024)
H, W = cfg.height, cfg.width
N = H * W
T = scene.n_tris

o, d = geom.generate_rays(scene.camera, H, W, 0, H)
o = o.reshape(-1, 3)
d = d.reshape(-1, 3)

key = jax.random.PRNGKey(0)
prim = jax.random.randint(key, (1, N), 0, T)
is_tri = jnp.ones((1, N), bool)
occ = jax.random.randint(key, (1, N), 0, 4)
recs = D.HitRecords(prim=prim, is_tri=is_tri, occ=occ)


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


p0 = prim[0]
i0 = is_tri[0]

tuv_j = jax.jit(lambda s: D._recompute_tuv(s, o, d, p0, i0))
t_, u_, v_ = jax.block_until_ready(tuv_j(scene))

geom_j = jax.jit(lambda s: D._hit_geometry(s, o, d, t_, p0, i0, u_, v_))

def tex_fn(s):
    from tpurt.ref.oracle import _sample_texture, _hit_uv
    rd = {"prim": p0, "u": u_, "v": v_, "is_tri": i0}
    return _sample_texture(s, s.tri_mat[p0], _hit_uv(s, rd))

tex_j = jax.jit(tex_fn)
full_j = jax.jit(
    lambda s: D.shade_from_records(s, o, d, recs, cfg.max_depth, True)
)

a = bench("tuv (tri+vertex gathers)", tuv_j, scene)
b = bench("geom (tri+vnormal gathers)", geom_j, scene)
c = bench("tex (uv+texel gathers)", tex_j, scene) if scene.textured else 0.0
f = bench("full shade_from_records", full_j, scene)
print(f"phong+mats residual: {f - a - b - c:.1f} ms", file=sys.stderr)
