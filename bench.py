"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2): Mrays/s per chip, forward + backward, at 1080p.
Ray count is the number of rays the algorithm actually traces:
pixels × (max_depth+1) closest-hit rays × (1 + n_lights shadow rays) for the
non-compacted path; the wavefront path will count compacted rays.

`vs_baseline` is null: the reference publishes no numbers
(BASELINE.json:13 "published": {}).

Usage: python bench.py [--config N] [--res HxW] [--mode fwd|fwdbwd]
Extra per-stage detail goes to stderr; stdout carries only the JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# persistent compilation cache: Mosaic compiles of the megakernel take
# 1–6 min via the remote-compile relay; cache them across processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def count_rays(cfg, scene) -> int:
    per_bounce = 1 + (scene.n_lights if cfg.shadows else 0)
    return cfg.height * cfg.width * (cfg.max_depth + 1) * per_bounce


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3)
    ap.add_argument("--res", type=str, default="1080x1920")
    ap.add_argument("--mode", type=str, default="fwdbwd", choices=["fwd", "fwdbwd"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurt.render import render
    from tpurt.scene import configs

    h, w = (int(x) for x in args.res.split("x"))
    build = configs.ALL_CONFIGS[args.config]
    scene, cfg = build(h, w)
    print(
        f"[bench] config={args.config} {h}x{w} mode={args.mode} "
        f"tris={scene.n_tris} spheres={scene.n_spheres} "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )

    from tpurt.render import prepare

    plan = prepare(scene, cfg)
    print(f"[bench] plan={plan.kind}", file=sys.stderr)

    if args.mode == "fwd":
        fn = jax.jit(lambda s: render(s, cfg, plan=plan))
    else:
        def loss(s):
            return jnp.sum(render(s, cfg, plan=plan) ** 2)

        fn = jax.jit(lambda s: jax.grad(loss, allow_int=True)(s))

    import numpy as np

    def fetch(x):
        # force a real device→host sync: over the axon relay,
        # block_until_ready alone has been observed to return early.
        # Slice ONE element on-device first — fetching the full result would
        # time the tunnel, not the chip.
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf[(0,) * leaf.ndim])

    t0 = time.time()
    fetch(fn(scene))
    print(f"[bench] compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    for _ in range(args.warmup - 1):
        fetch(fn(scene))

    # chained iterations, one sync at the end: amortizes host/relay latency
    t0 = time.time()
    out = None
    for _ in range(args.iters):
        out = fn(scene)
    fetch(out)
    dt = (time.time() - t0) / args.iters
    rays = count_rays(cfg, scene)
    mrays = rays / dt / 1e6
    print(f"[bench] {dt*1e3:.2f} ms/frame over {args.iters} chained iters", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"Mrays/s/chip {args.mode} config{args.config} {h}x{w}",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
