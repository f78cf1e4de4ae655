"""In-kernel stage profiler driver (TPURT_PROF stage ablation).

The traversal kernel has no clock; per-stage cost is recovered by running
STAGE-TRUNCATED kernel variants (traversal.py PROF) and differencing their
on-chip wall times.  Stages nest cumulatively:

    launch < cull < scan < stream < mmraw < mm < "" (full)

so `t[stage_k] - t[stage_{k-1}]` is the cost of the piece stage_k adds.
Caveats (see traversal.py PROF docs): stage variants never take the
early exits, so any-hit variants stream the FULL survivor list — the
mm -> full delta is NEGATIVE (it prices the saturation exit).  Per-chunk
deltas are normalized by each variant's own s_chnk/s_strm stats.

One process per stage (PROF is bound at import).  Run:
    python scripts/prof_traversal.py --all [--config 5 --res 1080x1920]
or a single stage:
    TPURT_PROF=scan python scripts/prof_traversal.py --config 5
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpurt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

STAGES = ["launch", "cull", "scan", "stream", "mmraw", "mm", ""]
SHADOW_CACHE = "/tmp/tpurt_prof_shadow.npz"


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=5)
    p.add_argument("--res", default="1080x1920")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--all", action="store_true",
                   help="run every stage in a subprocess and print the table")
    p.add_argument("--no-shadow", action="store_true")
    return p.parse_args()


def run_all(args):
    rows = []
    # full stage first: it writes the shadow-input cache the others load
    order = [""] + [s for s in STAGES if s]
    for st in order:
        env = dict(os.environ, TPURT_PROF=st)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--config", str(args.config), "--res", args.res,
               "--iters", str(args.iters)]
        if args.no_shadow:
            cmd.append("--no-shadow")
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=3600)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode != 0 or not line.startswith("{"):
            print(f"stage {st or 'full'!r} FAILED rc={r.returncode}\n"
                  f"{r.stderr[-2000:]}", file=sys.stderr)
            continue
        rows.append(json.loads(line))
        print(f"[{st or 'full'}] {line}", file=sys.stderr)
    by = {r["stage"]: r for r in rows}
    print("\nstage       b0_ms   Δb0    sh_ms   Δsh   (chnk: b0/sh per-pass)")
    prev = None
    for st in STAGES:
        r = by.get(st if st else "full")
        if r is None:
            continue
        db = r["b0_ms"] - prev["b0_ms"] if prev else float("nan")
        ds = (r.get("sh_ms", 0) - prev.get("sh_ms", 0)) if prev else float("nan")
        print(f"{st or 'full':<10} {r['b0_ms']:7.1f} {db:6.1f} "
              f"{r.get('sh_ms', float('nan')):7.1f} {ds:6.1f}   "
              f"{r.get('b0_chnk', 0)}/{r.get('sh_chnk', 0)}")
        prev = r
    return


def worker(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurt import constants as C
    from tpurt.core import geom
    from tpurt.kernels import traversal as TV
    from tpurt.kernels.packc import pack_clusters
    from tpurt.render import prepare
    from tpurt.scene import configs

    stage = TV.PROF
    H, W = (int(x) for x in args.res.split("x"))
    if args.config == 5:
        scene, cfg = configs.config5_multimesh(height=H, width=W)
    else:
        scene, cfg = configs.ALL_CONFIGS[args.config](H, W)
    plan = prepare(scene, cfg)
    packed = jax.block_until_ready(
        jax.jit(lambda s: pack_clusters(s, plan.tri_ids))(scene))

    def fetch(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0:1][0])

    def bench(name, fn, *a):
        fetch(fn(*a))
        fetch(fn(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(*a)
        fetch(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name}: {dt:.1f} ms", file=sys.stderr)
        return dt

    out = {"stage": stage or "full", "config": args.config, "res": args.res}

    trace_j = jax.jit(lambda pk: TV.trace_records(
        pk, cfg, 0, H, max_depth=0, shadows=False))
    out["b0_ms"] = bench("b0 closest kernel", trace_j, packed)
    recs = jax.block_until_ready(trace_j(packed))
    stats = recs[-1] if isinstance(recs, tuple) else None
    if stats is not None:
        surv, pas, ovf, strm, chnk = (np.asarray(stats[i]) for i in range(5))
        out["b0_strm"] = int(strm.sum())
        out["b0_chnk"] = int(chnk.sum())
        out["b0_pass"] = int(pas.sum())

    if stage == "":
        # the FULL variant's records are correct: derive + cache the binned
        # shadow inputs every truncated variant reuses (their own records
        # are garbage by construction)
        from tpurt.shading.deferred import (_build_shadepack,
                                            _gather_shaderows, _hit_geometry,
                                            _recompute_tuv)
        ids = TV._untile(recs[0], H, W)[0]
        o, d = geom.generate_rays(scene.camera, H, W, 0, H)
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        T = scene.n_tris

        def hitgeom(s):
            miss = ids < 0
            is_tri = (~miss) & (ids < T)
            prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
            rows = _gather_shaderows(s, jnp.maximum(prim, 0),
                                     _build_shadepack(s))
            t, u, v = _recompute_tuv(s, o, d, prim, is_tri, rows=rows)
            p, n, _ = _hit_geometry(s, o, d, t, prim, is_tri, u, v, rows=rows)
            return p, p + n * C.RAY_OFFSET_EPS, ~miss

        p, p_off, alive = jax.block_until_ready(jax.jit(hitgeom)(scene))
        Ccount = packed.n_clusters
        lo = jnp.min(packed.aabb[0:3, :Ccount], axis=1)
        hi = jnp.max(packed.aabb[3:6, :Ccount], axis=1)
        key = TV._bin_key_pts(p, lo, hi, alive)
        perm = jnp.argsort(key)
        n_pix = H * W
        N_pad = -(-n_pix // TV.RAYS) * TV.RAYS
        pb = jnp.pad(p[perm], ((0, N_pad - n_pix), (0, 0)))
        qb = jnp.pad(p_off[perm], ((0, N_pad - n_pix), (0, 0)))
        ab = jnp.pad(alive[perm], (0, N_pad - n_pix))
        n_live = int(jnp.sum(alive.astype(jnp.int32)))
        np.savez(SHADOW_CACHE, pb=np.asarray(pb), qb=np.asarray(qb),
                 ab=np.asarray(ab), n_live=n_live)

    if not args.no_shadow and os.path.exists(SHADOW_CACHE):
        z = np.load(SHADOW_CACHE)
        pb, qb, ab = (jnp.asarray(z[k]) for k in ("pb", "qb", "ab"))
        n_live = jnp.int32(int(z["n_live"]))
        shadow_j = jax.jit(lambda pk, pb, qb, ab: TV.trace_shadows(
            pk, cfg, pb, qb, ab, n_live))
        out["sh_ms"] = bench("shadow kernel", shadow_j, packed, pb, qb, ab)
        _, sstats = jax.block_until_ready(shadow_j(packed, pb, qb, ab))
        surv, pas, ovf, strm, chnk = (np.asarray(sstats[i]) for i in range(5))
        out["sh_strm"] = int(strm.sum())
        out["sh_chnk"] = int(chnk.sum())
        out["sh_pass"] = int(pas.sum())

    print(json.dumps(out))


if __name__ == "__main__":
    a = parse_args()
    if a.all:
        run_all(a)
    else:
        worker(a)
