"""Scripted roofline-efficiency report for the traversal kernel.

Measures trace_records b0 standalone on the real chip (packing hoisted),
pulls the same frame's traversal_stats counters, and feeds both into the
analytic model (tpurt/utils/roofline.py) — the number VERDICT r1 asked to
track ("traversal roofline efficiency from ~7% to >=30% on config 4").

Run: python scripts/roofline_report.py [--config N] [--res HxW]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.scene import configs
from tpurt.render import prepare
from tpurt.kernels.packc import pack_clusters
from tpurt.kernels.traversal import NCH, trace_records
from tpurt.utils import roofline

p = argparse.ArgumentParser()
p.add_argument("--config", type=int, default=4)
p.add_argument("--res", type=str, default=None)
p.add_argument("--iters", type=int, default=5)
args = p.parse_args()

if args.res is not None:
    h, w = (int(x) for x in args.res.split("x"))
elif args.config == 5:
    h, w = 1080, 1920
else:
    h, w = 1024, 1024
if args.config == 5:
    scene, cfg = configs.config5_multimesh(height=h, width=w)
else:
    scene, cfg = configs.ALL_CONFIGS[args.config](h, w)
cfg = cfg.replace(shadows=False)
plan = prepare(scene, cfg)


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0:1][0])


packed = jax.block_until_ready(jax.jit(
    lambda s: pack_clusters(s, plan.tri_ids))(scene))
trace_j = jax.jit(
    lambda pk: trace_records(pk, cfg, 0, cfg.height, max_depth=0)[0])
fetch(trace_j(packed))
fetch(trace_j(packed))
t0 = time.perf_counter()
out = None
for _ in range(args.iters):
    out = trace_j(packed)
fetch(out)
ms = (time.perf_counter() - t0) / args.iters * 1e3

stats = np.asarray(jax.jit(
    lambda pk: trace_records(pk, cfg, 0, cfg.height, max_depth=0)[3]
)(packed))
# rows: emitted, passes, overflows, streamed, chunk-epilogues
streamed = float(stats[3].sum())
surv = streamed / max(1, int(stats[1].sum()))
chunk_frac = float(stats[4].sum()) / max(1.0, streamed * NCH)

rep = roofline.report(
    ms, height=cfg.height, width=cfg.width, max_depth=0, shadows=False,
    n_lights=scene.n_lights, survivors_per_pass=surv,
    chunks_hit_frac=chunk_frac, nch=NCH)
print(f"[roofline] config={args.config} {cfg.height}x{cfg.width} "
      f"survivors/tile/pass={surv:.1f} chunk_frac={chunk_frac:.2f} "
      f"overflows={int(stats[2].sum())}", file=sys.stderr)
print(rep)
