"""A/B the bounding-cone cull refinement (TPURT_CONE_CULL) by survivor and
chunk-epilogue counts — machine-independent selectivity metrics, runnable
in interpret mode on CPU.  Each arm runs in a subprocess (the flag is read
at trace time).

Run: python scripts/ablate_cone.py [--config N --res HxW --cpu]
"""
import argparse
import json
import os
import subprocess
import sys

ap = argparse.ArgumentParser()
ap.add_argument("--config", type=int, default=4)
ap.add_argument("--res", default="128x128")
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--blobs", type=int, default=0, help="config5 n_blobs override")
ap.add_argument("--shadow", action="store_true",
                help="A/B the re-binned trace_shadows kernel instead")
args = ap.parse_args()

CHILD = r"""
import json, os, sys
import numpy as np
cpu = os.environ.get("ABL_CPU") == "1"
import jax
if cpu:
    jax.config.update("jax_platforms", "cpu")
cfgn = int(os.environ["ABL_CONFIG"])
H, W = map(int, os.environ["ABL_RES"].split("x"))
blobs = int(os.environ.get("ABL_BLOBS", "0"))
from tpurt.scene import configs
if cfgn == 5 and blobs:
    scene, cfg = configs.config5_multimesh(H, W, n_blobs=blobs, subdiv=3)
else:
    scene, cfg = configs.ALL_CONFIGS[cfgn](H, W)
from tpurt.accel import build_clusters
from tpurt.kernels import traversal as TV
from tpurt.kernels.traversal import traversal_stats
cs = build_clusters(np.asarray(scene.vertices), np.asarray(scene.triangles))
import jax.numpy as jnp
if os.environ.get("ABL_SHADOW") == "1":
    # replicate the wavefront shadow path: closest hits (no shadows), hit
    # geometry, Morton bin, trace_shadows — report ITS stats
    from tpurt import constants as Cst
    from tpurt.core import geom
    from tpurt.kernels.packc import pack_clusters
    from tpurt.shading.deferred import _hit_geometry, _recompute_tuv
    H2, W2 = cfg.height, cfg.width
    packed = pack_clusters(scene, jnp.asarray(cs.tri_ids))
    ids0 = TV.trace_records(packed, cfg, 0, H2, max_depth=0, shadows=False)[0]
    ids = TV._untile(ids0, H2, W2)[0]
    o, d = geom.generate_rays(scene.camera, H2, W2, 0, H2)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    T = scene.n_tris
    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    t, u, v = _recompute_tuv(scene, o, d, prim, is_tri)
    p, n, _ = _hit_geometry(scene, o, d, t, prim, is_tri, u, v)
    p_off = p + n * Cst.RAY_OFFSET_EPS
    alive = ~miss
    lo = jnp.min(packed.aabb[0:3, :packed.n_clusters], axis=1)
    hi = jnp.max(packed.aabb[3:6, :packed.n_clusters], axis=1)
    key = TV._bin_key_pts(p, lo, hi, alive)
    perm = jnp.argsort(key)
    n_pix = H2 * W2
    N_pad = -(-n_pix // TV.RAYS) * TV.RAYS
    pb = jnp.pad(p[perm], ((0, N_pad - n_pix), (0, 0)))
    qb = jnp.pad(p_off[perm], ((0, N_pad - n_pix), (0, 0)))
    ab = jnp.pad(alive[perm], (0, N_pad - n_pix))
    n_live = jnp.sum(alive.astype(jnp.int32))
    _, st = TV.trace_shadows(packed, cfg, pb, qb, ab, n_live)
    stats = np.asarray(st)
    live_t = int(np.ceil(float(n_live) / TV.RAYS))
    stats = stats[:, :live_t]
else:
    stats = np.asarray(traversal_stats(scene, cfg, jnp.asarray(cs.tri_ids)))
emitted, passes, ovf, streamed, chunks = [stats[i].astype(np.int64)
                                          for i in range(5)]
p = np.maximum(passes, 1)
out = {
    "cone": os.environ["TPURT_CONE_CULL"],
    "tiles": int(stats.shape[1]),
    "emitted_total": int(emitted.sum()),
    "streamed_total": int(streamed.sum()),
    "chunk_epilogues_total": int(chunks.sum()),
    "surv_per_pass_mean": float((emitted / p).mean()),
    "surv_per_pass_p95": float(np.percentile(emitted / p, 95)),
    "overflows": int(ovf.sum()),
}
print(json.dumps(out))
"""

for flag in ("1", "0"):
    env = dict(os.environ)
    env.update(
        TPURT_CONE_CULL=flag,
        ABL_CONFIG=str(args.config),
        ABL_RES=args.res,
        ABL_CPU="1" if args.cpu else "0",
        ABL_BLOBS=str(args.blobs),
        ABL_SHADOW="1" if args.shadow else "0",
    )
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout, r.stderr, file=sys.stderr)
        sys.exit(1)
    print(r.stdout.strip().splitlines()[-1])
