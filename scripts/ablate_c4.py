"""Config-4 forward cost decomposition: pack / closest-pass kernel /
in-kernel shadow passes / deferred shading, plus per-pass survivor stats
with shadows ON (the roofline report times the b0 closest pass only).

Run (real TPU): python scripts/ablate_c4.py [--res HxW]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.kernels import traversal as TV
from tpurt.kernels.packc import pack_clusters
from tpurt.render import cap_depth, prepare, render
from tpurt.scene import configs

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=str, default="1024x1024")
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

h, w = (int(x) for x in args.res.split("x"))
scene, cfg = configs.config4_bunny(h, w)
plan = prepare(scene, cfg)
cfgc = cap_depth(cfg, plan)


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


packed = jax.block_until_ready(
    jax.jit(lambda s: pack_clusters(s, plan.tri_ids))(scene))

t_pack = bench("pack_clusters", jax.jit(
    lambda s: pack_clusters(s, plan.tri_ids)), scene)


def trace(shadows):
    @jax.jit
    def f(pk):
        return TV.trace_records(pk, cfgc, 0, h, max_depth=0,
                                shadows=shadows)[0]
    return f


t_ns = bench("trace b0 no-shadows (prepacked)", trace(False), packed)
t_sh = bench("trace b0 + in-kernel shadows (prepacked)", trace(True), packed)
print(f"shadow passes alone ≈ {t_sh - t_ns:.1f} ms", file=sys.stderr)

t_full = bench("full render", jax.jit(lambda s: render(s, cfg, plan=plan)),
               scene)
print(f"shading residual (full - pack - trace_sh) ≈ "
      f"{t_full - t_pack - t_sh:.1f} ms", file=sys.stderr)

# per-pass stats with shadows on: emitted, passes, overflow, streamed,
# chunk-epilogues (summed over the closest + n_lights shadow passes)
stats = np.asarray(jax.jit(
    lambda pk: TV.trace_records(pk, cfgc, 0, h, max_depth=0,
                                shadows=True)[3])(packed))
passes = stats[1].astype(np.float64)
print(f"stats: passes/tile={passes.mean():.1f} "
      f"emitted/tile={stats[0].mean():.1f} "
      f"streamed/tile={stats[3].mean():.1f} "
      f"(per pass {stats[3].sum() / max(stats[1].sum(), 1):.1f}) "
      f"chunk-epilogues/tile={stats[4].mean():.1f} ovf={stats[2].sum()}",
      file=sys.stderr)
