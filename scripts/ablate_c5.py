"""Ablation timing for clustered configs: where does the frame go?

Times, on the real chip with chained iterations (bench.py fetch convention):
  A. pack_clusters alone (per-frame differentiable packing)
  B. trace_records b0 alone, packing hoisted (the traversal kernel proper)
  C. full render_rows_clustered (pack + trace + deferred shading)
Run: python scripts/ablate_c5.py [--config N] [--shadows]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp

from tpurt.scene import configs
from tpurt.render import prepare
from tpurt.kernels.packc import pack_clusters
from tpurt.kernels.traversal import trace_records, render_rows_clustered

p = argparse.ArgumentParser()
p.add_argument("--config", type=int, default=5)
p.add_argument("--shadows", action="store_true")
p.add_argument("--iters", type=int, default=3)
args = p.parse_args()

if args.config == 5:
    scene, cfg = configs.config5_multimesh(height=1080, width=1920)
else:
    scene, cfg = configs.ALL_CONFIGS[args.config](1024, 1024)
if not args.shadows:
    cfg = cfg.replace(shadows=False)
plan = prepare(scene, cfg)
tri_ids = plan.tri_ids

def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0:1][0])

def bench(name, fn, *a):
    fetch(fn(*a))  # compile + warm, SYNCED (else compile leaks into timing)
    fetch(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = fn(*a)
    fetch(out)
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"{name}: {dt:.1f} ms", file=sys.stderr)
    return dt

pack_j = jax.jit(lambda s: pack_clusters(s, tri_ids))
trace_j = jax.jit(
    lambda pk: trace_records(pk, cfg, 0, cfg.height, max_depth=0)[0]
)
render_j = jax.jit(
    lambda s: render_rows_clustered(s, cfg, tri_ids, 0, cfg.height)
)

a = bench("A pack_clusters", pack_j, scene)
packed = jax.block_until_ready(pack_j(scene))
b = bench("B trace_records b0 (prepacked)", trace_j, packed)
c = bench("C full render (pack+trace+shade)", render_j, scene)
print(f"shading+rebin residual (C-A-B): {c - a - b:.1f} ms", file=sys.stderr)
