"""Ring-mode (scene sharding) overhead decomposition at n=1.

The first on-silicon ring run (r5: config 4 @1024² fwd 605.8 ms vs 76.1
replicated) measured ~8× overhead.  This script splits it: the ring
closest-hit circuit, the per-light shadow rings, and the ring-fetched
shading — so the next round attacks the right part (or documents it as
the price of the >HBM capability).

Run (real TPU): python scripts/ablate_ring.py [--config 4]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse

import jax
import jax.numpy as jnp

from tpurt.dist import make_mesh, prepare_scene_sharded
from tpurt.dist.scene_shard import render_scene_sharded_prepared
from tpurt.render import prepare, render
from tpurt.scene import configs


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


ap = argparse.ArgumentParser()
ap.add_argument("--config", type=int, default=4)
args = ap.parse_args()

if args.config == 4:
    scene, cfg = configs.config4_bunny(1024, 1024)
else:
    scene, cfg = configs.ALL_CONFIGS[args.config](1080, 1920)

plan = prepare(scene, cfg, accel="bvh")
bench("replicated render (reference)",
      jax.jit(lambda s: render(s, cfg, plan=plan)), scene)

scene2, parts = prepare_scene_sharded(scene, plan.tri_ids, 1)
mesh = make_mesh(1)

bench("ring n=1 full",
      jax.jit(lambda s: render_scene_sharded_prepared(s, cfg, parts, mesh)),
      scene2)
cfg_ns = cfg.replace(shadows=False)
bench("ring n=1 no shadows",
      jax.jit(lambda s: render_scene_sharded_prepared(s, cfg_ns, parts,
                                                      mesh)), scene2)
bench("replicated no shadows",
      jax.jit(lambda s: render(s, cfg_ns, plan=plan)), scene)
