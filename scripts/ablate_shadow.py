"""Shadow-wavefront cost decomposition, config 5 @1080p on the real chip:
  A  hit-geometry recompute for shadow origins (chained gathers, pack=None)
  A2 same with the shadepack tables
  B  Morton key + argsort + inverse perm at 2M rays
  C  trace_shadows kernel over binned points (+ survivor stats)
Run: python scripts/ablate_shadow.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from tpurt import constants as C
from tpurt.core import geom
from tpurt.kernels import traversal as TV
from tpurt.kernels.packc import pack_clusters
from tpurt.render import prepare
from tpurt.scene.configs import config5_multimesh
from tpurt.shading.deferred import (_build_shadepack, _gather_shaderows,
                                    _hit_geometry, _recompute_tuv)

scene, cfg = config5_multimesh(height=1080, width=1920)
plan = prepare(scene, cfg)
packed = jax.block_until_ready(jax.jit(
    lambda s: pack_clusters(s, plan.tri_ids))(scene))
H, W = cfg.height, cfg.width
n_pix = H * W
T = scene.n_tris

trace_j = jax.jit(
    lambda pk: TV.trace_records(pk, cfg, 0, H, max_depth=0, shadows=False)[0])
ids0 = jax.block_until_ready(trace_j(packed))
ids = TV._untile(ids0, H, W)[0]
o, d = geom.generate_rays(scene.camera, H, W, 0, H)
o = o.reshape(-1, 3)
d = d.reshape(-1, 3)


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


def hitgeom(s, use_pack):
    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    rows = (_gather_shaderows(s, jnp.maximum(prim, 0), _build_shadepack(s))
            if use_pack else None)
    t, u, v = _recompute_tuv(s, o, d, prim, is_tri, rows=rows)
    p, n, _ = _hit_geometry(s, o, d, t, prim, is_tri, u, v, rows=rows)
    return p, p + n * C.RAY_OFFSET_EPS, ~miss


bench("A  hitgeom (no pack)", jax.jit(lambda s: hitgeom(s, False)), scene)
bench("A2 hitgeom (pack)", jax.jit(lambda s: hitgeom(s, True)), scene)

p, p_off, alive = jax.block_until_ready(
    jax.jit(lambda s: hitgeom(s, True))(scene))

Ccount = packed.n_clusters
lo = jnp.min(packed.aabb[0:3, :Ccount], axis=1)
hi = jnp.max(packed.aabb[3:6, :Ccount], axis=1)
N_pad = -(-n_pix // TV.RAYS) * TV.RAYS


def binkey(p, alive):
    key = TV._bin_key_pts(p, lo, hi, alive)
    perm = jnp.argsort(key)
    return perm, jnp.argsort(perm)


bench("B  morton+argsort+inv", jax.jit(binkey), p, alive)

perm, inv = jax.block_until_ready(jax.jit(binkey)(p, alive))
pb = jnp.pad(p[perm], ((0, N_pad - n_pix), (0, 0)))
qb = jnp.pad(p_off[perm], ((0, N_pad - n_pix), (0, 0)))
ab = jnp.pad(alive[perm], (0, N_pad - n_pix))
n_live = jnp.sum(alive.astype(jnp.int32))

shadow_j = jax.jit(
    lambda pk, pb, qb, ab: TV.trace_shadows(pk, cfg, pb, qb, ab, n_live))
bench("C  trace_shadows kernel", shadow_j, packed, pb, qb, ab)

_, stats = jax.block_until_ready(shadow_j(packed, pb, qb, ab))
surv, pas, ovf, strm, chnk = (np.asarray(stats[i]) for i in range(5))
live_t = int(np.ceil(float(n_live) / TV.RAYS))
sv, st = surv[:live_t], strm[:live_t]
pp = max(int(pas[:live_t].mean()), 1)
print(f"shadow tiles={live_t} passes/tile={pas[:live_t].mean():.1f} "
      f"surv/pass mean={sv.mean()/pp:.0f} p95={np.percentile(sv/pp, 95):.0f} "
      f"strm/pass mean={st.mean()/pp:.0f} ovf={ovf.sum()}", file=sys.stderr)
