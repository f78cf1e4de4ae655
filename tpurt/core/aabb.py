"""Axis-aligned bounding box helpers (slab method), used by the BVH/grid
builders (host side, numpy-compatible) and by traversal code (jnp).

Equivalent of the reference's AABB utilities (SURVEY.md §2 row R13,
[ARCHETYPE]).  All functions are dual-use: they work on numpy arrays during
host-side BVH construction and on traced jnp arrays inside kernels.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpurt import constants as C


def ray_aabb(o, inv_d, lo, hi, t_min=C.T_MIN, t_max=C.T_MAX):
    """Slab test.  ``o``/``inv_d``: (...,3) ray origin and 1/direction;
    ``lo``/``hi``: (...,3) box corners (broadcast against rays).

    Returns (hit: bool array, t_near).  Degenerate directions are expected to
    be pre-clamped to +/-inf in inv_d (IEEE inf semantics make the slab test
    correct for axis-parallel rays as long as 0*inf does not appear, which we
    avoid by nan-suppressing with jnp.minimum/maximum pairs).
    """
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tnear = jnp.maximum(jnp.max(tsm, axis=-1), t_min)
    tfar = jnp.minimum(jnp.min(tbg, axis=-1), t_max)
    return tnear <= tfar, tnear


def union(lo_a, hi_a, lo_b, hi_b):
    return jnp.minimum(lo_a, lo_b), jnp.maximum(hi_a, hi_b)


def surface_area(lo, hi):
    d = jnp.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])
