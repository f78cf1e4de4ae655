"""Vector math over trailing-axis-3 jnp arrays.

The reference's float3/float4 helper headers (SURVEY.md §2 row R13,
[ARCHETYPE] — reference unreadable this round) become plain ``jax.numpy``
functions over ``(..., 3)`` arrays: XLA fuses these into surrounding
elementwise work, so there is no benefit to a custom type.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tpurt import constants as C


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the trailing axis (explicit form: cheaper to trace
    than jnp.cross, which routes through moveaxis)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def norm2(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(norm2(a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Unit vector; guarded by NORMALIZE_EPS so zero vectors stay finite and
    the gradient through rsqrt never produces inf/nan."""
    return a * lax.rsqrt(norm2(a) + C.NORMALIZE_EPS)[..., None]


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction ``d`` about unit normal ``n`` (d points *into* the
    surface): r = d - 2 (d·n) n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def where_v(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jnp.where with the mask broadcast over the trailing vector axis."""
    return jnp.where(mask[..., None], a, b)
