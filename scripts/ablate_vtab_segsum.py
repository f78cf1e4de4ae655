"""Focused A/B: the vertex-table backward under scatter vs Pallas segsum.

The full-bench delta (r5: 445.0 → 437.9 ms fwdbwd) is far below the
standalone kernel rates (segsum 8.2 ns/upd vs scatter 36-100); this script
isolates WHERE the in-graph win leaks: it times the verts-only backward of
the REAL shade graph under each setting, plus the raw update-stream ops
in one jit (sort + permute + kernel vs scatter) at per-chunk shapes.

Run (real TPU): python scripts/ablate_vtab_segsum.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import dataclasses as DC

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.core import geom
from tpurt.render import cap_depth, prepare
from tpurt.scene import configs
from tpurt.shading import deferred as D


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0:1][0])


def bench(name, fn, *a, iters=5):
    fetch(fn(*a))
    fetch(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*a)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", file=sys.stderr)
    return dt


scene, cfg = configs.config5_multimesh(1080, 1920)
plan = prepare(scene, cfg)
cfgc = cap_depth(cfg, plan)
H, W = cfg.height, cfg.width
T, V = scene.n_tris, scene.vertices.shape[0]


@jax.jit
def real_records(s):
    from tpurt.kernels import traversal as TV
    from tpurt.kernels.packc import pack_clusters

    packed = pack_clusters(s, plan.tri_ids)
    ids, occ, _, _ = TV.trace_records(packed, cfgc, 0, H)
    ids = TV._untile(ids, H, W)
    occ = TV._untile(occ, H, W)
    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    return D.HitRecords(prim=prim, is_tri=is_tri, occ=occ)


recs = jax.block_until_ready(real_records(scene))


def rays():
    o, d = geom.generate_rays(scene.camera, H, W, 0, H)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _loss(s, r):
    o, d = rays()
    img = D.shade_from_records(s, o, d, r, cfgc.max_depth, cfg.shadows)
    return jnp.sum(img * img)


def verts_only(s, r):
    sg = jax.lax.stop_gradient
    reps = dict(uvs=sg(s.uvs), textures=sg(s.textures),
                light_pos=sg(s.light_pos), light_color=sg(s.light_color),
                materials=jax.tree_util.tree_map(sg, s.materials))
    return _loss(DC.replace(s, **reps), r)


g_vo = jax.jit(jax.grad(verts_only, allow_int=True))
fwd = jax.jit(_loss)

t_f = bench("shade fwd", fwd, scene, recs)
for env, name in (("0", "scatter(K2)"), ("1", "pallas segsum")):
    D._VTAB_SEGSUM_ENV = env
    jax.clear_caches()
    t = bench(f"verts-only bwd [{name}]", g_vo, scene, recs)
    print(f"    bwd-extra {t - t_f:.1f} ms", file=sys.stderr)

# ---- raw stream ops at per-chunk shape, all inside ONE jit ---------------
rng = np.random.default_rng(0)
n_chunk = 65536
pid = np.sort(rng.integers(0, T, n_chunk * 2 // 3))
pid = np.repeat(pid, 2)[:n_chunk]
i3 = np.asarray(scene.triangles)[pid]
idx = jnp.asarray(i3.T.reshape(-1))
upd = jnp.asarray(rng.standard_normal((3 * n_chunk, 8)).astype(np.float32))


@jax.jit
def six_scatter(i, u):
    out = jnp.zeros((V, 8), jnp.float32)
    for k in range(6):  # six live chunks' worth, like the frame
        Vk = -(-V // 2)
        for kk in range(2):
            loc = i - kk * Vk
            m = (loc >= 0) & (loc < Vk)
            out = out.at[jnp.clip(loc, 0, Vk - 1) + 0].add(
                jnp.where(m[:, None], u + k, 0.0))
    return out


@jax.jit
def six_segsum(i, u):
    from tpurt.kernels.segsum import segsum_rows

    out = jnp.zeros((V, 8), jnp.float32)
    for k in range(6):
        out = out + segsum_rows(i, u + k, V)
    return out


@jax.jit
def six_sort_only(i, u):
    out = jnp.zeros((8,), jnp.float32)
    for k in range(6):
        o = jnp.argsort(i + k)
        out = out + (u + k)[o].sum(axis=0)
    return out


bench("6x per-chunk scatter (one jit)", six_scatter, idx, upd)
bench("6x per-chunk segsum (one jit)", six_segsum, idx, upd)
bench("6x per-chunk sort+permute only (one jit)", six_sort_only, idx, upd)
