"""Scene sharding v1: cluster blocks sharded across the mesh, rays exchanged
around a ring (SURVEY.md §5 scaling axis (b) — "ring-style ray exchange",
the ray tracer's structural analogue of ring attention; BASELINE.json:5
"scene primitives replicated or sharded per-host").

Layout: a 1-D mesh of n devices.  The IMAGE is row-slab sharded (the same
data-parallel axis as tpurt/dist/shard.py) AND the cluster set is sharded:
device i holds row-slab i of the rays and 1/n of the cluster blocks — the
streamed wtri_c/attr_c arrays, which dominate packed-scene memory (~190 MB
of ~250 MB at 1M tris).  Each bounce runs n ring steps: trace resident rays
against local clusters, fold the per-shard best into the carried
(t, id) record by (t, gid) — exactly the oracle's argmin-first tie rule —
then `lax.ppermute` the ray packet to the next device.  After n steps rays
are home with globally-correct topology.  Shadow rays make the same trip
per light; occlusion is `t_hit < dist`.  Shading stays the differentiable
deferred pass (scene pytree replicated in v1; autodiff inserts the psum for
scene-parameter gradients).

Cost model: forward communication is 6 f32 + records per ray per step over
ICI — bandwidth-bound, overlappable; v1 optimizes for correctness and is
validated against replicated rendering on the CPU mesh (tests/test_dist.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpurt import constants as C
from tpurt.core import geom
from tpurt.core.types import RenderConfig
from tpurt.dist.shard import TILE_AXIS, _rows_per_device


def _pad_clusters_to(tri_ids, n: int):
    """Pad the cluster list to a multiple of n with duplicates of cluster 0
    (duplicate clusters are harmless under closest-hit and any-hit)."""
    Ccount = tri_ids.shape[0]
    C_pad = -(-Ccount // n) * n
    if C_pad != Ccount:
        pad = jnp.broadcast_to(tri_ids[:1], (C_pad - Ccount, tri_ids.shape[1]))
        tri_ids = jnp.concatenate([tri_ids, pad], axis=0)
    return tri_ids


def _merge(best_t, best_id, t_new, id_new):
    """Fold a shard's partial hits into the carried record by (t, gid):
    smaller t wins; on exact-t ties the smaller global primitive id wins
    (tpurt/constants.py tie convention, matching the oracle's argmin)."""
    tie = (t_new == best_t) & (t_new < C.T_NONE) & (id_new >= 0)
    tie = tie & ((id_new < best_id) | (best_id < 0))
    imp = (t_new < best_t) | tie
    return jnp.where(imp, t_new, best_t), jnp.where(imp, id_new, best_id)


def _root_entry(lo, hi, o, d):
    """Conservative per-ray entry distance into the RESIDENT shard's root
    box → (entry (N,), hit (N,)) — XLA-level slab test, O(rays)."""
    t_lo = jnp.full(o.shape[:1], -C.T_NONE)
    t_hi = jnp.full(o.shape[:1], C.T_NONE)
    for k in range(3):
        dk = d[:, k]
        par = jnp.abs(dk) < 1e-12
        safe = jnp.where(par, jnp.where(dk >= 0, 1e-12, -1e-12), dk)
        ta = (lo[k] - o[:, k]) / safe
        tb = (hi[k] - o[:, k]) / safe
        near, far = jnp.minimum(ta, tb), jnp.maximum(ta, tb)
        inside = (o[:, k] >= lo[k]) & (o[:, k] <= hi[k])
        near = jnp.where(par, jnp.where(inside, -C.T_NONE, C.T_NONE), near)
        far = jnp.where(par, jnp.where(inside, C.T_NONE, -C.T_NONE), far)
        t_lo = jnp.maximum(t_lo, near)
        t_hi = jnp.minimum(t_hi, far)
    return jnp.maximum(t_lo, 0.0), (t_lo <= t_hi) & (t_hi > 0.0)


def _ring_closest(packed, config, o, d, alive, axis, n, tmax=None):
    """n ring steps of closest-hit: returns (ids, t) global bests for the
    rays that START on this device (they travel the full ring and land back
    home on the last permute).

    Cross-shard early termination (exact): on arrival at each shard, a ray
    skips the trace when (a) it misses the shard's root box, (b) its
    carried best t precedes the shard's conservative entry (non-strict
    keep at equality — an equal-t smaller-id tie could still win), or
    (c) `tmax` is given (shadow rings: the occlusion band end, which
    TRAVELS with the ray) and the carried best already proves occlusion.
    Dead rays still ride the ring (fixed shapes) but thin every kernel
    cull on the remaining shards."""
    from tpurt.kernels.traversal import RAYS, trace_bounce

    N = o.shape[0]
    lo = jnp.min(packed.aabb[0:3, : packed.n_clusters], axis=1)
    hi = jnp.max(packed.aabb[3:6, : packed.n_clusters], axis=1)
    no_tmax = tmax is None
    if no_tmax:
        tmax = jnp.full((N,), C.T_NONE, jnp.float32)
    state = (
        o, d, alive,
        jnp.full((N,), C.T_NONE, jnp.float32),
        jnp.full((N,), -1, jnp.int32),
        tmax,
    )
    perm = [(i, (i + 1) % n) for i in range(n)]
    for _step in range(n):
        o_c, d_c, al_c, bt, bid, tm = state
        ent, hitbox = _root_entry(lo, hi, o_c, d_c)
        keep = hitbox & (ent <= bt)
        if _step == 0 and packed.n_sph_blocks > 0:
            # resident spheres are REPLICATED, not part of any shard's
            # cluster box: fold them once by keeping every ray at step 0
            # (their hits then seed bt for the later shards' skip test)
            keep = jnp.ones_like(keep)
        al_eff = al_c & keep
        if not no_tmax:
            al_eff = al_eff & ~(bt < tm)  # already provably occluded
        # shadows=False: occlusion is traced by DEDICATED shadow rings (one
        # per light) — the kernel's in-kernel per-light occlusion pass is
        # the dominant cost and its result would be discarded here
        ids_s, _occ, t_s, _ = trace_bounce(
            packed, config, o_c, d_c, al_eff,
            jnp.asarray(N, jnp.int32), shadows=False,
        )
        bt, bid = _merge(bt, bid, t_s, ids_s)
        state = lax.ppermute((o_c, d_c, al_c, bt, bid, tm), axis, perm)
    _, _, _, bt, bid, _ = state
    return bid, bt


def _hit_frame(scene_sg, o, d, ids, T):
    """Differentiation-free hit geometry for ray continuation / shadows —
    the single continuation convention lives in traversal._continue_rays."""
    from tpurt.kernels.traversal import _continue_rays

    p_off, refl_dir, alive, p = _continue_rays(scene_sg, o, d, ids, T)
    return p, p_off, refl_dir, alive


def _render_slab_ring(scene, config, tri_ids_loc, row0, nrows, axis, n):
    """Per-device body under shard_map: trace this device's row slab against
    the ring of cluster shards, then shade deferentially."""
    from tpurt.kernels.packc import pack_clusters
    from tpurt.kernels.traversal import RAYS
    from tpurt.shading.deferred import HitRecords, shade_from_records

    sg = jax.lax.stop_gradient
    packed = pack_clusters(scene, tri_ids_loc)
    scene_sg = sg(scene)
    T = scene.n_tris
    W = config.width
    n_pix = nrows * W
    N_pad = -(-n_pix // RAYS) * RAYS

    o, d = geom.generate_rays(scene.camera, config.height, W, row0, nrows)
    o = sg(o.reshape(-1, 3))
    d = sg(d.reshape(-1, 3))

    def padded(x):
        width = [(0, N_pad - n_pix)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, width)

    alive = padded(jnp.ones((n_pix,), bool))
    o_p, d_p = padded(o), padded(d)

    ids_list, occ_list = [], []
    for _depth in range(config.max_depth + 1):
        ids, _t = _ring_closest(packed, config, o_p, d_p, alive, axis, n)
        ids = jnp.where(alive, ids, -1)
        p, p_off, refl_dir, alive_next = _hit_frame(
            scene_sg, o_p, d_p, ids, T
        )
        occ_bits = jnp.zeros((N_pad,), jnp.int32)
        if config.shadows:
            hit = ids >= 0
            for li in range(scene.n_lights):
                to_l = sg(scene.light_pos[li]) - p
                dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=-1))
                ldir = to_l / jnp.maximum(dist, 1e-20)[..., None]
                _ids_s, t_s = _ring_closest(
                    packed, config, p_off, ldir, hit, axis, n,
                    tmax=dist - C.RAY_OFFSET_EPS,
                )
                occ = hit & (t_s < dist - C.RAY_OFFSET_EPS)
                occ_bits = occ_bits | jnp.where(occ, 1 << li, 0)
        ids_list.append(ids[:n_pix])
        occ_list.append(occ_bits[:n_pix])
        o_p, d_p, alive = p_off, refl_dir, alive_next

    ids = jnp.stack(ids_list)
    occ = jnp.stack(occ_list)
    miss = ids < 0
    is_tri = (~miss) & (ids < T)
    prim = jnp.where(miss, -1, jnp.where(is_tri, ids, ids - T))
    recs = HitRecords(prim=prim, is_tri=is_tri, occ=occ)
    colors = shade_from_records(
        scene, o, d, recs, config.max_depth, config.shadows
    )
    return colors.reshape(nrows, W, 3)


@partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def render_scene_sharded(scene, config: RenderConfig, tri_ids, mesh: Mesh,
                         axis: str = TILE_AXIS):
    """Render with BOTH the image and the cluster set sharded over `mesh`.

    tri_ids: the full (C, 128) cluster topology from prepare()/build_clusters
    (host-concrete or already device-resident).  Returns the full image.
    """
    n = mesh.shape[axis]
    nrows = _rows_per_device(config.height, n)
    tri_ids = _pad_clusters_to(jnp.asarray(tri_ids), n)

    def body(s, tids_loc):
        row0 = lax.axis_index(axis) * nrows
        return _render_slab_ring(s, config, tids_loc, row0, nrows, axis, n)

    full = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )(scene, tri_ids)
    return full[: config.height]
