"""Differentiable clustered packing for the streaming traversal kernel.

Large scenes (config 4's ~82k tris, config 5's ~1M — BASELINE.json:10-11)
cannot sit in VMEM; tpurt/accel/clusters.py partitions their triangles into
contiguous ≤128-tri blocks, and this module packs per-cluster kernel data
that lives in HBM and is DMA-streamed by tpurt/kernels/traversal.py:

* ``wtri_c``  (C, 8, 6, 128)  Baldwin–Weber forms per cluster (pack.py math)
* ``attr_c``  (C, TROWS, 128) traversal attributes, transposed so the
  one-hot fetch is dot_general((TROWS,128),(128,R)) — dense sublane=TROWS,
  lane=tris blocks, zero padding waste
* ``aabb``    (8, C_pad) cluster bounds — SMEM-resident, read as scalars by
  the per-cluster cull
* plus the resident sphere forms/attrs and globals shared with pack.py.

AABBs are REFIT from the current vertices inside jit (tri_ids topology is
frozen at build time): inverse-rendering steps that move vertices keep a
valid accel structure without a host rebuild — the TPU-native analogue of
BVH refitting.  Everything except the integer topology is differentiable.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from tpurt import constants as C
from tpurt.core.types import pytree_dataclass
from tpurt.kernels import pack as PK

# traversal attribute rows (TROWS, 128): what continuation + records need
R_N0 = 0        # shading normals at the 3 corners (== face normal if flat)
R_N1 = 3
R_N2 = 6
R_GID = 9       # global primitive id as f32 (tris: tri id; spheres: T + s)
R_CENTER = 10   # sphere center (3) — zero for triangles
R_RADIUS = 13
R_REFL = 14     # material reflectivity (kernel kills dead reflection paths)
TROWS = 16

LANES = PK.LANES


@pytree_dataclass(meta_fields=("n_clusters", "n_sph_blocks", "n_lights", "n_tris"))
class PackedClusters:
    wtri_c: Any     # (C, 8, 6, LANES) f32 — HBM, streamed
    attr_c: Any     # (C, TROWS, LANES) f32 — HBM, streamed
    aabb: Any       # (8, C_pad) f32 rows [lox loy loz hix hiy hiz 0 0] — SMEM
    wsph: Any       # (8, 2*S_pad) f32 — resident
    sattr: Any      # (TROWS, S_pad) f32 — resident
    globals: Any    # (1, NGLOB) f32
    n_clusters: int
    n_sph_blocks: int
    n_lights: int
    n_tris: int     # total triangles (gid >= n_tris ⇒ sphere)


def pack_clusters(scene, tri_ids) -> PackedClusters:
    """Scene + frozen cluster topology (C, LEAF) int32 → PackedClusters."""
    Ccount, leaf = tri_ids.shape
    assert leaf == LANES
    flat = tri_ids.reshape(-1)

    tri = scene.triangles[flat]                   # (C*128, 3)
    # ONE merged [pos | normal?] per-vertex table gathered once per corner:
    # 3 wide gathers instead of 6 narrow ones — pack_clusters runs EVERY
    # frame (in-jit AABB refit) and measured 54 ms at 1M tris, gather-bound
    # (the same lesson as the shading tables, design.md item 13).  Column
    # slices keep every downstream value the same subtraction/order.
    if scene.smooth:
        vtab = jnp.concatenate([scene.vertices, scene.vnormals], axis=-1)
    else:
        vtab = scene.vertices
    g0 = vtab[tri[:, 0]]
    g1 = vtab[tri[:, 1]]
    g2 = vtab[tri[:, 2]]
    v0 = g0[:, 0:3]
    e1, e2 = g1[:, 0:3] - v0, g2[:, 0:3] - v0

    groups = PK.tri_form_groups(v0, e1, e2)       # (8, 6, C*128)
    # kept 4D (C, 8, 6, LANES): the traversal kernel DMA-gathers several
    # clusters into an (8, 6, NB, LANES) scratch (one strided copy per
    # cluster) and matmuls the whole block at once — the form axis must be
    # separable from the lane axis for that destination striding
    wtri_c = groups.reshape(8, 6, Ccount, LANES).transpose(2, 0, 1, 3)

    if scene.smooth:
        n0 = g0[:, 3:6]
        n1 = g1[:, 3:6]
        n2 = g2[:, 3:6]
    else:
        from tpurt.core import vec

        n0 = n1 = n2 = vec.normalize(jnp.cross(e1, e2))
    gid = flat.astype(C.DTYPE)
    zeros = jnp.zeros_like(gid)
    # reflectivity rides along (stop-gradient: the kernel only uses it to
    # decide path liveness, a visibility-like discrete effect; the shading
    # gradient to reflectivity flows through the deferred pass)
    refl_t = jax.lax.stop_gradient(
        scene.materials.reflectivity[scene.tri_mat[flat]]
    )
    attr_rows = jnp.stack(
        [
            n0[:, 0], n0[:, 1], n0[:, 2],
            n1[:, 0], n1[:, 1], n1[:, 2],
            n2[:, 0], n2[:, 1], n2[:, 2],
            gid,
            zeros, zeros, zeros, zeros,           # center / radius unused
            refl_t, zeros,
        ],
        axis=0,
    )                                             # (TROWS, C*128)
    attr_c = (
        attr_rows.reshape(TROWS, Ccount, LANES).transpose(1, 0, 2)
    )                                             # (C, TROWS, 128)

    # 8 zero pad clusters: the span-coalesced streaming loop
    # (traversal.py SPAN) DMAs fixed-size runs of up to 8 clusters from a
    # dynamic start; a run starting at the last real cluster must not read
    # past the array.  Pad rows are never PROCESSED (len guards), only
    # fetched.
    wtri_c = jnp.pad(wtri_c, ((0, 8), (0, 0), (0, 0), (0, 0)))
    attr_c = jnp.pad(attr_c, ((0, 8), (0, 0), (0, 0)))

    # refit AABBs from current vertices (stop-gradient: bounds are not a
    # differentiable quantity, and their motion is a visibility effect)
    v1 = g1[:, 0:3]
    v2 = g2[:, 0:3]
    lo = jnp.minimum(jnp.minimum(v0, v1), v2).reshape(Ccount, LANES, 3)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2).reshape(Ccount, LANES, 3)
    lo = jax.lax.stop_gradient(lo.min(axis=1))    # (C, 3)
    hi = jax.lax.stop_gradient(hi.max(axis=1))
    C_pad = -(-Ccount // LANES) * LANES
    aabb = jnp.zeros((8, C_pad), C.DTYPE)
    # pad clusters get an empty box at +inf so the cull always rejects them
    aabb = aabb.at[0:3, :].set(3.0e37)
    aabb = aabb.at[3:6, :].set(-3.0e37)
    aabb = aabb.at[0:3, :Ccount].set(lo.T)
    aabb = aabb.at[3:6, :Ccount].set(hi.T)

    # resident spheres (forms shared with pack.py; attrs in traversal layout).
    # Scenes with zero REAL spheres (mesh-only: configs 4/5) skip the sphere
    # path entirely — n_sph_blocks = 0 removes one matmul+epilogue from every
    # traversal pass.
    if scene.n_real_spheres == 0:
        return PackedClusters(
            wtri_c=wtri_c,
            attr_c=attr_c,
            aabb=aabb,
            wsph=jnp.zeros((8, 2 * LANES), C.DTYPE),
            sattr=jnp.zeros((TROWS, LANES), C.DTYPE),
            globals=PK.globals_vec(scene),
            n_clusters=Ccount,
            n_sph_blocks=0,
            n_lights=scene.n_lights,
            n_tris=scene.n_tris,
        )
    S = scene.n_spheres
    S_pad = max(LANES, -(-S // LANES) * LANES)
    wsph = PK.block_major(
        PK.sphere_form_groups(scene.sph_center, scene.sph_radius), S_pad
    )
    T_total = scene.n_tris
    sgid = (jnp.arange(S) + T_total).astype(C.DTYPE)
    zs = jnp.zeros_like(sgid)
    refl_s = jax.lax.stop_gradient(
        scene.materials.reflectivity[scene.sph_mat]
    )
    sattr = jnp.stack(
        [
            zs, zs, zs, zs, zs, zs, zs, zs, zs,
            sgid,
            scene.sph_center[:, 0], scene.sph_center[:, 1], scene.sph_center[:, 2],
            scene.sph_radius,
            refl_s, zs,
        ],
        axis=0,
    )                                             # (TROWS, S)
    sattr = jnp.pad(sattr, ((0, 0), (0, S_pad - S)))

    return PackedClusters(
        wtri_c=wtri_c,
        attr_c=attr_c,
        aabb=aabb,
        wsph=wsph,
        sattr=sattr,
        globals=PK.globals_vec(scene),
        n_clusters=Ccount,
        n_sph_blocks=S_pad // LANES,
        n_lights=scene.n_lights,
        n_tris=T_total,
    )

