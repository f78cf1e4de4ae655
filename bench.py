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
    """Nominal Whitted ray budget: pixels × depths × (1 + shadow rays).

    Fixed convention across rounds so Mrays/s ratios equal frame-time
    ratios.  Since round 2 the kernels kill dead paths (zero-reflectivity
    hits) and skip empty wavefront tiles, so ACTUAL traced rays can be
    fewer — count_rays_traced() measures those; ms/frame (stderr) is the
    ground-truth cost of a frame.
    """
    per_bounce = 1 + (scene.n_lights if cfg.shadows else 0)
    return cfg.height * cfg.width * (cfg.max_depth + 1) * per_bounce


def count_rays_traced(cfg, scene, plan) -> int:
    """Rays the compiled program actually traces (VERDICT r2 item 5).

    Phase-1/oracle paths compute every lane every depth (alive-masked but
    resident), so traced == nominal there.  The clustered wavefront path
    deletes work three ways — static depth cap, per-bounce live-ray
    compaction, shadow rays only from actual hits — so for it we count:
    pixels (bounce-0 closest) + Σ_b live rays entering bounce b + n_lights ×
    Σ_b hits at depth b.  Counts are reduced on-device (never fetch big
    arrays through the tunnel).
    """
    if plan.kind != "clusters":
        return count_rays(cfg, scene)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt.kernels import traversal as TV
    from tpurt.kernels.packc import pack_clusters
    from tpurt.render import cap_depth

    cfgc = cap_depth(cfg, plan)

    @jax.jit
    def counts(s):
        packed = pack_clusters(s, plan.tri_ids)
        if cfgc.wavefront and cfgc.max_depth > 0:
            ids, _ = TV._wavefront_records(s, cfgc, packed, 0, cfgc.height)
        else:
            ids, _, _, _ = TV.trace_records(packed, cfgc, 0, cfgc.height)
            ids = TV._untile(ids, cfgc.height, cfgc.width)
        ids = ids.reshape(cfgc.max_depth + 1, -1)
        hit = ids >= 0
        hits = hit.sum(axis=-1)                      # hits per depth
        T = s.n_tris
        is_tri = hit & (ids < T)
        tid = jnp.clip(ids, 0, max(T - 1, 0))
        sid = jnp.clip(ids - T, 0, max(s.n_spheres - 1, 0))
        mat = jnp.where(is_tri, s.tri_mat[tid], s.sph_mat[sid])
        live = hit & (s.materials.reflectivity[mat] > 0.0)
        return hits, live.sum(axis=-1)               # continuations per depth

    hits, live = (np.asarray(x) for x in counts(scene))
    n_pix = cfg.height * cfg.width
    closest = n_pix + int(live[:-1].sum()) if len(live) > 1 else n_pix
    shadow = int(hits.sum()) * scene.n_lights if cfgc.shadows else 0
    return closest + shadow


def run_verify() -> int:
    """Scripted on-hardware verification tier (SURVEY.md §4 "benchmark
    tier"): render small frames through every KERNEL path on the real
    device, diff images and gradients against the frozen CPU oracle, print
    one JSON line.  Exit code 0 iff every case passes.

    Criteria per case: mean |Δ| < 1e-4 and at most 0.2% of pixels with
    |Δ| > 1e-3 (isolated boundary pixels may legitimately flip when fp
    rounding moves an intersection across a silhouette); gradient leaves
    must be finite and match the oracle's to 1% relative tolerance.
    """
    import jax

    # expose BOTH the accelerator and the CPU backend: the oracle tier runs
    # on CPU in-process (the parity spec is "vs the CPU oracle").  Must land
    # before first backend init; overrides the sitecustomize platform pin.
    try:
        jax.config.update("jax_platforms", "axon,cpu")
        jax.devices()
    except Exception:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tpurt.render import prepare, render, render_and_grad
    from tpurt.scene import configs

    dev = jax.devices()[0]
    cases = [
        # (name, build(), accel, grad_leaves)
        ("c1-phase1", lambda: configs.config1_sphere(64, 64), "auto",
         ("light_color",)),
        ("c2-phase1", lambda: configs.config2_cornell(64, 64), "auto",
         ("light_color",)),
        ("c3-phase1", lambda: configs.config3_spheres(64, 64), "auto",
         ("light_color", "sph_center", "sph_radius")),
        ("c3-clusters-wavefront", lambda: configs.config3_spheres(64, 64),
         "bvh", ("light_color", "sph_center", "sph_radius")),
        ("c4-clusters", lambda: configs.config4_bunny(64, 64, subdiv=4),
         "bvh", ("vertices", "light_color")),
        ("c5-clusters-tex",
         lambda: configs.config5_multimesh(48, 64, n_blobs=2, subdiv=4),
         "bvh", ("light_color", "textures", "vertices")),
        ("c4-grid", lambda: configs.config4_bunny(48, 48, subdiv=4), "grid",
         ("light_color", "vertices")),
    ]
    results = []
    ok_all = True
    for name, build, accel, grad_leaves in cases:
        scene, cfg = build()
        plan = prepare(scene, cfg, accel=accel)

        def loss(img):
            return jnp.sum(img**2)

        t0 = time.time()
        (loss_k, img_k), grads_k = jax.jit(
            lambda s: render_and_grad(s, loss, cfg, plan=plan)
        )(scene)
        img_k = np.asarray(img_k)
        # oracle on the CPU backend of the same process (the frozen spec)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            scene_cpu = jax.device_put(scene, cpu)
            (loss_r, img_r), grads_r = render_and_grad(
                scene_cpu, loss, cfg.replace(backend="oracle"),
                plan=prepare(scene_cpu, cfg, accel="none"),
            )
        img_r = np.asarray(img_r)
        d = np.abs(img_k - img_r)
        mean_d = float(d.mean())
        frac_bad = float((d.max(-1) > 1e-3).mean())
        case_ok = mean_d < 1e-4 and frac_bad < 2e-3
        grad_ok = True
        for leaf in grad_leaves:
            gk = np.asarray(getattr(grads_k, leaf))
            gr = np.asarray(getattr(grads_r, leaf))
            if not np.isfinite(gk).all():
                grad_ok = False
                continue
            scale = np.abs(gr).max() + 1e-8
            if np.abs(gk - gr).max() > 1e-2 * scale:
                grad_ok = False
        case_ok = case_ok and grad_ok
        ok_all = ok_all and case_ok
        results.append(
            {
                "case": name, "plan": plan.kind, "mean_diff": round(mean_d, 8),
                "frac_bad_px": round(frac_bad, 6), "grads_ok": grad_ok,
                "ok": case_ok, "secs": round(time.time() - t0, 1),
            }
        )
        print(f"[verify] {results[-1]}", file=sys.stderr)

    # ---- on-silicon kernel-equivalence cases (VERDICT r2 item 6): the
    # equalities previously proven only in interpret mode.  Records are
    # integers — equality must be EXACT.
    from tpurt.kernels import traversal as TV
    from tpurt.kernels.packc import pack_clusters

    def eq_case(name, fn):
        nonlocal ok_all
        t0 = time.time()
        try:
            mism = int(fn())
            ok = mism == 0
        except Exception as e:  # a failed compile is a failed case
            print(f"[verify] {name} raised: {e}", file=sys.stderr)
            mism, ok = -1, False
        ok_all = ok_all and ok
        results.append({"case": name, "plan": "equivalence",
                        "mismatches": mism, "ok": ok,
                        "secs": round(time.time() - t0, 1)})
        print(f"[verify] {results[-1]}", file=sys.stderr)

    def wavefront_vs_multibounce():
        scene, cfg = configs.config3_spheres(64, 64)
        plan = prepare(scene, cfg, accel="bvh")

        @jax.jit
        def both(s):
            packed = pack_clusters(s, plan.tri_ids)
            ids_w, occ_w = TV._wavefront_records(s, cfg, packed, 0,
                                                 cfg.height)
            ids_m, occ_m, _, _ = TV.trace_records(packed, cfg, 0, cfg.height)
            ids_m = TV._untile(ids_m, cfg.height, cfg.width)
            occ_m = TV._untile(occ_m, cfg.height, cfg.width)
            return (jnp.sum(ids_w != ids_m) + jnp.sum(occ_w != occ_m))

        return np.asarray(both(scene))

    def shadow_rebin_on_off():
        # the Morton shadow-wavefront vs in-kernel shadows, textured scene,
        # both compiled fresh on this device (the gate constant is dropped
        # so the tiny scene takes the re-binned path)
        scene, cfg = configs.config5_multimesh(48, 64, n_blobs=2, subdiv=4)
        plan = prepare(scene, cfg, accel="bvh")
        saved = TV.SHADOW_REBIN_MIN_CLUSTERS
        TV.SHADOW_REBIN_MIN_CLUSTERS = 0
        try:
            @jax.jit
            def occ_of(s):
                packed = pack_clusters(s, plan.tri_ids)
                a = TV._wavefront_records(
                    s, cfg.replace(max_depth=1, shadow_rebin=True), packed,
                    0, cfg.height)[1]
                b = TV._wavefront_records(
                    s, cfg.replace(max_depth=1, shadow_rebin=False), packed,
                    0, cfg.height)[1]
                return jnp.sum(a != b)

            return np.asarray(occ_of(scene))
        finally:
            TV.SHADOW_REBIN_MIN_CLUSTERS = saved

    def compact_vs_plain_shading():
        # hit-compacted chunked shading vs the plain path on silicon:
        # same records, images must agree to fp-fusion noise
        from tpurt.shading import deferred as D

        scene, cfg = configs.config5_multimesh(48, 64, n_blobs=2, subdiv=4)
        plan = prepare(scene, cfg, accel="bvh")
        saved = (D.SHADE_COMPACT, D.SHADE_COMPACT_MIN)
        try:
            D.SHADE_COMPACT, D.SHADE_COMPACT_MIN = True, 1
            img_c = np.asarray(jax.jit(
                lambda s: render(s, cfg, plan=plan))(scene))
            D.SHADE_COMPACT = False
            jax.clear_caches()  # flags are read at trace time
            img_p = np.asarray(jax.jit(
                lambda s: render(s, cfg, plan=plan))(scene))
        finally:
            D.SHADE_COMPACT, D.SHADE_COMPACT_MIN = saved
            jax.clear_caches()
        return (np.abs(img_c - img_p).max(-1) > 1e-4).sum()

    def bf16x6_vs_highest():
        # the r4 single-pass split-bf16 intersection matmul vs f32 HIGHEST
        # ON SILICON (the CPU test only proves interpret mode): integer
        # topology records must agree except at knife-edge silhouettes —
        # budget 0.1% of record entries (design.md item 24)
        scene, cfg = configs.config4_bunny(64, 64, subdiv=4)
        plan = prepare(scene, cfg, accel="bvh")
        saved = (TV.MM3X, TV._MM_PREC_STR, TV._MM_PREC)
        try:
            def records(s):
                packed = pack_clusters(s, plan.tri_ids)
                ids, occ, _, _ = TV.trace_records(packed, cfg, 0, cfg.height)
                return ids, occ
            ids6, occ6 = jax.jit(records)(scene)
            # override _MM_PREC too: if the process was launched with
            # TPURT_MM_PREC=default, flipping only the string would label a
            # DEFAULT-precision trace as the "highest" reference (ADVICE r4)
            TV.MM3X, TV._MM_PREC_STR = False, "highest"
            TV._MM_PREC = jax.lax.Precision.HIGHEST
            jax.clear_caches()  # flags are read at trace time
            idsh, occh = jax.jit(records)(scene)
            mism = int(jnp.sum(ids6 != idsh) + jnp.sum(occ6 != occh))
            budget = max(1, int(2e-3 * ids6.size))
            return 0 if mism <= budget else mism
        finally:
            TV.MM3X, TV._MM_PREC_STR, TV._MM_PREC = saved
            jax.clear_caches()

    eq_case("wavefront-vs-multibounce", wavefront_vs_multibounce)
    eq_case("shadow-rebin-on-off", shadow_rebin_on_off)
    eq_case("shade-compact-vs-plain", compact_vs_plain_shading)
    eq_case("bf16x6-vs-highest", bf16x6_vs_highest)

    # ---- on-silicon central-finite-difference anchors (VERDICT r4 item 6):
    # every gradient check above is oracle-anchored (TPU autodiff vs CPU
    # autodiff); these anchor the TPU gradient to the TPU's own rendered
    # LOSS — catching a wrong-but-consistent autodiff rule.  One scalar
    # leaf per path class; central difference, 2% relative budget (f32
    # loss noise at these resolutions is ~1e-4 relative).
    import dataclasses as _DC

    def fd_case(name, build, accel, leaf_get, leaf_set, h):
        nonlocal ok_all
        t0 = time.time()
        try:
            scene, cfg = build()
            plan = prepare(scene, cfg, accel=accel)

            def loss_fn(s):
                return jnp.sum(render(s, cfg, plan=plan) ** 2)

            loss_j = jax.jit(loss_fn)
            grad_j = jax.jit(jax.grad(loss_fn, allow_int=True))
            g = float(leaf_get(grad_j(scene)))
            v0 = float(leaf_get(scene))
            lp = float(loss_j(leaf_set(scene, v0 + h)))
            lm = float(loss_j(leaf_set(scene, v0 - h)))
            fd = (lp - lm) / (2.0 * h)
            rel = abs(fd - g) / max(abs(g), 1e-3)
            ok = rel < 2e-2
        except Exception as e:  # a failed compile is a failed case
            print(f"[verify] {name} raised: {e}", file=sys.stderr)
            g, fd, rel, ok = float("nan"), float("nan"), -1.0, False
        ok_all = ok_all and ok
        results.append({"case": name, "plan": "finite-diff",
                        "grad": g, "fd": fd, "rel_err": round(rel, 5),
                        "ok": ok, "secs": round(time.time() - t0, 1)})
        print(f"[verify] {results[-1]}", file=sys.stderr)

    fd_case(
        "fd-c5-light-intensity",
        lambda: configs.config5_multimesh(48, 64, n_blobs=2, subdiv=4),
        "bvh",
        lambda s: s.light_color[0, 0],
        lambda s, v: _DC.replace(s, light_color=s.light_color.at[0, 0].set(v)),
        2e-3,
    )
    # NOTE deliberately no FD on geometry leaves (radius/vertices): a true
    # finite difference moves silhouettes, which the fixed-topology
    # gradient convention (docs/design.md) correctly excludes — FD and
    # autodiff would disagree by the silhouette term, not by a bug.
    fd_case(
        "fd-c3-sphere-albedo",
        lambda: configs.config3_spheres(64, 64),
        "auto",
        lambda s: s.materials.kd[1, 0],
        lambda s, v: _DC.replace(
            s, materials=_DC.replace(
                s.materials, kd=s.materials.kd.at[1, 0].set(v))),
        2e-3,
    )
    print(
        json.dumps(
            {
                "metric": "verify-parity-cases-passed",
                "value": sum(r["ok"] for r in results),
                "unit": f"of {len(results)}",
                "vs_baseline": None,
                "device": str(dev),
                "cases": results,
            }
        )
    )
    return 0 if ok_all else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3)
    ap.add_argument("--res", type=str, default="1080x1920")
    ap.add_argument("--mode", type=str, default="fwdbwd", choices=["fwd", "fwdbwd"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--verify", action="store_true",
                    help="run the on-hardware oracle-parity tier instead")
    ap.add_argument("--depth", type=int, default=None,
                    help="override max_depth (pass-cost breakdown)")
    ap.add_argument("--no-shadows", action="store_true")
    ap.add_argument("--no-wavefront", action="store_true")
    ap.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="render tile-parallel over an N-device mesh via "
                    "dist.render_sharded (the multi-chip scaling command, "
                    "BASELINE.json:2; on 1-chip hardware use N=1)")
    ap.add_argument("--scene-shard", type=int, default=None, metavar="N",
                    help="render with clusters + shading tables + vertex "
                    "table sharded over an N-device mesh and ring ray "
                    "exchange (the >HBM scaling command; on 1-chip "
                    "hardware N=1 measures ring overhead vs replicated)")
    args = ap.parse_args()

    if args.verify:
        sys.exit(run_verify())

    import jax
    import jax.numpy as jnp

    from tpurt.render import render
    from tpurt.scene import configs

    h, w = (int(x) for x in args.res.split("x"))
    build = configs.ALL_CONFIGS[args.config]
    scene, cfg = build(h, w)
    if args.depth is not None:
        cfg = cfg.replace(max_depth=args.depth)
    if args.no_shadows:
        cfg = cfg.replace(shadows=False)
    if args.no_wavefront:
        cfg = cfg.replace(wavefront=False)
    print(
        f"[bench] config={args.config} {h}x{w} mode={args.mode} "
        f"tris={scene.n_tris} spheres={scene.n_spheres} "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )

    from tpurt.render import prepare

    plan = prepare(scene, cfg)
    print(f"[bench] plan={plan.kind}", file=sys.stderr)

    if args.scene_shard is not None:
        # >HBM ring path (scene sharding v3): one command produces the
        # scaling table the day multi-chip hardware exists; n=1 on one
        # chip is the ring-overhead-vs-replicated smoke (VERDICT r4 #5)
        from tpurt.dist import (make_mesh, prepare_scene_sharded,
                                render_scene_sharded_prepared)

        n_dev = len(jax.devices())
        if args.scene_shard > n_dev:
            print(f"[bench] --scene-shard {args.scene_shard} > {n_dev} "
                  f"device(s) available", file=sys.stderr)
            sys.exit(2)
        if plan.kind != "clusters":
            plan = prepare(scene, cfg, accel="bvh")
        scene2, parts = prepare_scene_sharded(scene, plan.tri_ids,
                                              args.scene_shard)
        mesh = make_mesh(args.scene_shard)
        print(f"[bench] ring mesh={mesh.shape}", file=sys.stderr)
        if args.mode == "fwd":
            fn = jax.jit(lambda s: render_scene_sharded_prepared(
                s, cfg, parts, mesh))
        else:
            def loss_r(s):
                img = render_scene_sharded_prepared(s, cfg, parts, mesh)
                return jnp.sum(img ** 2)

            fn = jax.jit(lambda s: jax.grad(loss_r, allow_int=True)(s))
        scene = scene2
    elif args.mesh is not None:
        from tpurt.dist.shard import make_mesh, render_sharded

        n_dev = len(jax.devices())
        if args.mesh > n_dev:
            print(f"[bench] --mesh {args.mesh} > {n_dev} device(s) available",
                  file=sys.stderr)
            sys.exit(2)
        mesh = make_mesh(args.mesh)
        print(f"[bench] mesh={mesh.shape}", file=sys.stderr)
        if args.mode == "fwd":
            fn = jax.jit(lambda s: render_sharded(s, cfg, mesh, plan=plan))
        else:
            def loss_m(s):
                return jnp.sum(render_sharded(s, cfg, mesh, plan=plan) ** 2)

            fn = jax.jit(lambda s: jax.grad(loss_m, allow_int=True)(s))
    elif args.mode == "fwd":
        fn = jax.jit(lambda s: render(s, cfg, plan=plan))
    elif plan.kind == "phase1":
        # the benched objective is sum(img²) = L2 vs a zero target: the
        # fused train kernel computes the identical loss+gradients in ONE
        # Pallas pass (no separate forward kernel; equivalence tested in
        # tests/test_kernels.py)
        from tpurt.kernels import megakernel as MK

        tgt0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
        fn = jax.jit(lambda s: MK.l2_loss_and_grad(s, tgt0, cfg))
        print("[bench] fused phase-1 L2 train kernel", file=sys.stderr)
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
    # ring mode renumbers the scene (plan.tri_ids indexes the original
    # order): report nominal rays as traced rather than recount
    traced = (rays if args.scene_shard is not None
              else count_rays_traced(cfg, scene, plan))
    mrays = rays / dt / 1e6
    mrays_traced = traced / dt / 1e6
    print(f"[bench] {dt*1e3:.2f} ms/frame over {args.iters} chained iters; "
          f"rays nominal={rays} traced={traced}", file=sys.stderr)

    # gradient-rays/s as a first-class metric (BASELINE.json:2 names it
    # separately): in fwdbwd mode also time the forward alone and charge
    # the backward with the difference
    grad_extra = {}
    if args.mode == "fwdbwd":
        if args.scene_shard is not None:
            from tpurt.dist import render_scene_sharded_prepared as _rr

            fwd_fn = jax.jit(lambda s: _rr(s, cfg, parts, mesh))
        elif args.mesh is not None:
            from tpurt.dist.shard import render_sharded as _rs

            fwd_fn = jax.jit(lambda s: _rs(s, cfg, mesh, plan=plan))
        else:
            fwd_fn = jax.jit(lambda s: render(s, cfg, plan=plan))
        fetch(fwd_fn(scene))
        t0 = time.time()
        out = None
        for _ in range(args.iters):
            out = fwd_fn(scene)
        fetch(out)
        dt_f = (time.time() - t0) / args.iters
        dt_b = max(dt - dt_f, 1e-9)
        grad_extra = {
            "ms_per_frame_fwd": round(dt_f * 1e3, 2),
            "grad_mrays_traced": round(traced / dt_b / 1e6, 2),
            "grad_mrays_nominal": round(rays / dt_b / 1e6, 2),
        }
        print(f"[bench] fwd alone {dt_f*1e3:.2f} ms → bwd-extra "
              f"{dt_b*1e3:.2f} ms", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"Mrays/s/chip {args.mode} config{args.config} {h}x{w}",
                "value": round(mrays_traced, 2),
                "unit": "Mrays/s (traced rays)",
                "vs_baseline": None,
                "mrays_nominal": round(mrays, 2),
                "rays_nominal": rays,
                "rays_traced": traced,
                "ms_per_frame": round(dt * 1e3, 2),
                "mesh": args.mesh,
                "scene_shard": args.scene_shard,
                **grad_extra,
            }
        )
    )


if __name__ == "__main__":
    main()
