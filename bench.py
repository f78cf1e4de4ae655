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
import sys
import time


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

    if args.mode == "fwd":
        fn = jax.jit(lambda s: render(s, cfg))
    else:
        def loss(s):
            return jnp.sum(render(s, cfg) ** 2)

        fn = jax.jit(lambda s: jax.grad(loss, allow_int=True)(s))

    t0 = time.time()
    jax.block_until_ready(fn(scene))
    print(f"[bench] compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    for _ in range(args.warmup - 1):
        jax.block_until_ready(fn(scene))

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        jax.block_until_ready(fn(scene))
        times.append(time.time() - t0)
    dt = min(times)
    rays = count_rays(cfg, scene)
    mrays = rays / dt / 1e6
    print(f"[bench] per-iter times: {[f'{t:.3f}' for t in times]}", file=sys.stderr)

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
