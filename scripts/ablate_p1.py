"""Phase-1 megakernel fwd/bwd cost split (VERDICT r2 weak #3: config 3
@1080p bwd is ~3x fwd; profile before restructuring — the gap may be replay
cost, not the block-0 accumulation).

Times the forward pallas kernel and the backward pallas kernel in isolation
(dummy cotangent), plus the composed value_and_grad, at the bench shapes.

Run (real TPU): python scripts/ablate_p1.py [--res HxW] [--config N]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse

import jax
import jax.numpy as jnp

from tpurt.kernels import megakernel as MK
from tpurt.scene import configs

ap = argparse.ArgumentParser()
ap.add_argument("--config", type=int, default=3)
ap.add_argument("--res", type=str, default="1080x1920")
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

h, w = (int(x) for x in args.res.split("x"))
scene, cfg = configs.ALL_CONFIGS[args.config](h, w)
n_pix = h * w
print(f"[ablate_p1] config{args.config} {h}x{w}", file=sys.stderr)


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
    print(f"{name}: {dt:.1f} ms", file=sys.stderr)
    return dt


packed = jax.jit(MK.pack_scene)(scene)
statics = MK._statics_for(packed, cfg, n_pix)


@jax.jit
def fwd_only(p):
    return MK._render_core_fwd(statics, p, jnp.int32(0))[0]


@jax.jit
def bwd_only(p, occ, g):
    return MK._render_core_bwd(statics, (p, jnp.int32(0), occ), g)


@jax.jit
def fwdbwd(s):
    def loss(s2):
        img = MK.render_pallas(s2, cfg)
        return jnp.sum(img * img)

    return jax.grad(loss, allow_int=True)(s)


g = jnp.ones((3, -(-n_pix // MK.RAYS) * MK.RAYS), jnp.float32)
occ = jax.block_until_ready(
    jax.jit(lambda p: MK._render_core_fwd(statics, p, jnp.int32(0))[1][2])(
        packed))
t_f = bench("fwd kernel", fwd_only, packed)
t_b = bench("bwd kernel (dummy cot, recorded occ)", bwd_only, packed, occ, g)
t_fb = bench("value_and_grad full", fwdbwd, scene)
print(f"[ablate_p1] bwd/fwd kernel ratio {t_b / max(t_f, 1e-9):.2f}; "
      f"composed-los {t_fb - t_f - t_b:.1f} ms", file=sys.stderr)
