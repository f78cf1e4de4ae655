"""Command-line interface: the app/main layer (SURVEY.md §1a "App / main").

    python -m tpurt.cli render  --config 3 --res 512x512 --out out.png
    python -m tpurt.cli render  --obj mesh.obj --out out.png
    python -m tpurt.cli bench   --config 4 --res 1024x1024 --mode fwd
    python -m tpurt.cli inverse --config 2 --steps 50 --out recon.png
    python -m tpurt.cli multihost-render ...   (jax.distributed, one proc/host)

Add --profile DIR to wrap the work in jax.profiler.trace (SURVEY.md §5
"Tracing/profiling") — open the trace in XProf/Perfetto.
"""
from __future__ import annotations

import argparse
import contextlib
import dataclasses
import json
import sys
import time


def _parse_res(s):
    h, w = s.split("x")
    return int(h), int(w)


@contextlib.contextmanager
def _maybe_profile(dirname):
    import jax

    if dirname:
        with jax.profiler.trace(dirname):
            yield
    else:
        yield


def _build_scene(args):
    from tpurt.scene import configs

    if args.obj:
        from tpurt.scene.obj import scene_from_obj
        from tpurt.core.types import RenderConfig

        scene = scene_from_obj(args.obj)
        h, w = _parse_res(args.res)
        return scene, RenderConfig(height=h, width=w)
    scene, cfg = configs.ALL_CONFIGS[args.config](*_parse_res(args.res))
    return scene, cfg


def cmd_render(args):
    import numpy as np

    from tpurt.render import prepare, render
    from tpurt.utils import save_png

    scene, cfg = _build_scene(args)
    if args.depth is not None:
        cfg = cfg.replace(max_depth=args.depth)
    plan = prepare(scene, cfg, accel=None if args.accel == "auto" else args.accel)
    if args.scene_shard:
        # >HBM path from the CLI: clusters + shading tables + vertex table
        # sharded over an n-device mesh, ring ray exchange (scene_shard v3)
        from tpurt.dist import (make_mesh, prepare_scene_sharded,
                                render_scene_sharded_prepared)

        if plan.kind != "clusters":
            plan = prepare(scene, cfg, accel="bvh")
        scene2, parts = prepare_scene_sharded(scene, plan.tri_ids,
                                              args.scene_shard)
        mesh = make_mesh(args.scene_shard)
        with _maybe_profile(args.profile):
            t0 = time.time()
            img = np.asarray(
                render_scene_sharded_prepared(scene2, cfg, parts, mesh))
            dt = time.time() - t0
        save_png(args.out, img)
        print(json.dumps({"out": args.out, "h": cfg.height, "w": cfg.width,
                          "seconds": round(dt, 3),
                          "plan": f"ring-{args.scene_shard}"}))
        return
    with _maybe_profile(args.profile):
        t0 = time.time()
        img = np.asarray(render(scene, cfg, plan=plan))
        dt = time.time() - t0
    save_png(args.out, img)
    print(json.dumps({"out": args.out, "h": cfg.height, "w": cfg.width,
                      "seconds": round(dt, 3), "plan": plan.kind}))


def cmd_bench(args):
    # reuse the repo-root bench harness for a single source of truth
    sys.argv = ["bench.py", "--config", str(args.config), "--res", args.res,
                "--mode", args.mode, "--iters", str(args.iters)]
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def cmd_inverse(args):
    """Inverse-rendering demo: recover perturbed scene parameters by SGD on
    an image loss — the framework's training loop, with checkpointing."""
    import jax.numpy as jnp
    import numpy as np

    from tpurt.dist import make_mesh, make_train_step
    from tpurt.render import prepare, render
    from tpurt.utils import save_png, save_pytree

    scene, cfg = _build_scene(args)
    plan = prepare(scene, cfg)
    target = render(scene, cfg, plan=plan)

    # perturb: dim the lights and gray the albedo
    import dataclasses as dc

    mats = dc.replace(scene.materials, kd=scene.materials.kd * 0.5 + 0.2)
    start = dc.replace(scene, light_color=scene.light_color * 0.6, materials=mats)

    mesh = make_mesh(args.devices) if args.devices else None
    step = make_train_step(cfg, mesh, plan=plan)
    s = start
    with _maybe_profile(args.profile):
        for i in range(args.steps):
            s, loss = step(s, target, jnp.float32(args.lr))
            if i % 10 == 0 or i == args.steps - 1:
                print(json.dumps({"step": i, "loss": float(loss)}))
    if args.out:
        save_png(args.out, np.asarray(render(s, cfg, plan=plan)))
    if args.ckpt:
        save_pytree(args.ckpt, s)
        print(json.dumps({"checkpoint": args.ckpt}))


def cmd_animate(args):
    """Frame loop (the reference's interactive render loop, SURVEY.md §1a
    "App / main"): orbit the camera, re-render per frame.  The jitted render
    is compiled once; only camera params change per frame."""
    import dataclasses as dc
    import math

    import numpy as np

    from tpurt.render import prepare, render
    from tpurt.scene.scene import Camera
    from tpurt.utils import save_png

    scene, cfg = _build_scene(args)
    plan = prepare(scene, cfg)
    eye0 = np.asarray(scene.camera.eye)
    look = np.asarray(scene.camera.look_at)
    rel = eye0 - look
    radius = float(np.hypot(rel[0], rel[2]))
    phi0 = math.atan2(rel[2], rel[0])
    t0 = time.time()
    with _maybe_profile(args.profile):
        for f in range(args.frames):
            phi = phi0 + math.radians(args.orbit) * f / max(args.frames, 1)
            eye = (look[0] + radius * math.cos(phi), float(eye0[1]),
                   look[2] + radius * math.sin(phi))
            cam = Camera.make(eye, tuple(look), fov_y=float(scene.camera.fov_y))
            s = dc.replace(scene, camera=cam)
            img = np.asarray(render(s, cfg, plan=plan))
            save_png(args.out.format(f), img)
    dt = time.time() - t0
    print(json.dumps({"frames": args.frames, "seconds": round(dt, 2),
                      "fps": round(args.frames / dt, 2)}))


def cmd_multihost_render(args):
    """Multi-host SPMD render: every host runs this same command
    (SURVEY.md §5 "Distributed communication backend")."""
    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    import numpy as np

    from tpurt.dist import make_mesh, render_sharded
    from tpurt.render import prepare
    from tpurt.utils import save_png

    scene, cfg = _build_scene(args)
    plan = prepare(scene, cfg)
    mesh = make_mesh()
    img = render_sharded(scene, cfg, mesh, plan=plan)
    if jax.process_index() == 0:
        save_png(args.out, np.asarray(img))
        print(json.dumps({"out": args.out, "devices": len(jax.devices())}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpurt")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", type=int, default=3, choices=[1, 2, 3, 4, 5])
        sp.add_argument("--obj", type=str, default=None)
        sp.add_argument("--res", type=str, default="512x512")
        sp.add_argument("--profile", type=str, default=None)

    sp = sub.add_parser("render")
    common(sp)
    sp.add_argument("--out", type=str, default="out.png")
    sp.add_argument("--depth", type=int, default=None)
    sp.add_argument("--accel", type=str, default="auto",
                    choices=["auto", "bvh", "grid"])
    sp.add_argument("--scene-shard", type=int, default=0, metavar="N",
                    help="shard the scene (clusters + shading + vertex "
                    "tables) over an N-device mesh with ring ray exchange "
                    "(>HBM scenes; dist/scene_shard.py)")
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("bench")
    common(sp)
    sp.add_argument("--mode", type=str, default="fwd", choices=["fwd", "fwdbwd"])
    sp.add_argument("--iters", type=int, default=10)
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("inverse")
    common(sp)
    sp.add_argument("--steps", type=int, default=50)
    sp.add_argument("--lr", type=float, default=0.5)
    sp.add_argument("--devices", type=int, default=0)
    sp.add_argument("--out", type=str, default=None)
    sp.add_argument("--ckpt", type=str, default=None)
    sp.set_defaults(fn=cmd_inverse)

    sp = sub.add_parser("animate")
    common(sp)
    sp.add_argument("--frames", type=int, default=24)
    sp.add_argument("--orbit", type=float, default=360.0,
                    help="total camera orbit in degrees")
    sp.add_argument("--out", type=str, default="frame_{:03d}.png")
    sp.set_defaults(fn=cmd_animate)

    sp = sub.add_parser("multihost-render")
    common(sp)
    sp.add_argument("--out", type=str, default="out.png")
    sp.add_argument("--coordinator", type=str, default=None)
    sp.add_argument("--num-processes", type=int, default=1)
    sp.add_argument("--process-id", type=int, default=0)
    sp.set_defaults(fn=cmd_multihost_render)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
