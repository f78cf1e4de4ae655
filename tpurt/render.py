"""Public render API: `render`, `render_and_grad`.

TPU-native replacement for the reference's host render loop (SURVEY.md §3a
Entry 2: set kernel args → clEnqueueNDRangeKernel → readback, [ARCHETYPE]):
here the "launch" is one jit-compiled XLA program; buffer management,
fusion and scheduling belong to the compiler.

Backends:
  "oracle" — the brute-force pure-jnp path (tpurt.ref), jitted.  Correct for
             any scene; cost O(pixels × primitives).
  "pallas" — the fused megakernel path (tpurt.kernels), tiled and
             accelerated.  The performance path.
  "auto"   — pallas when available for the scene/config, else oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpurt import constants as C
from tpurt.core import geom
from tpurt.core.types import RenderConfig
from tpurt.ref import oracle


def _resolve_backend(config: RenderConfig, scene=None) -> str:
    backend = config.backend
    if backend == "auto":
        from tpurt.kernels import megakernel

        if scene is None or megakernel.supports(scene, config):
            backend = "pallas"
        else:
            backend = "oracle"
    return backend


@partial(jax.jit, static_argnames=("config",))
def _render_oracle(scene, config: RenderConfig):
    o, d = geom.generate_rays(scene.camera, config.height, config.width)
    colors = oracle.trace_rays(
        scene,
        o.reshape(-1, 3),
        d.reshape(-1, 3),
        max_depth=config.max_depth,
        shadows=config.shadows,
    )
    return colors.reshape(config.height, config.width, 3)


def render(scene, config: RenderConfig | None = None, **overrides):
    """Render `scene` to an (H, W, 3) float32 image in [0, 1].

    `config` defaults to RenderConfig(); keyword overrides are applied on
    top (e.g. ``render(scene, width=1920, height=1080)``).
    """
    config = (config or RenderConfig()).replace(**overrides) if overrides else (
        config or RenderConfig()
    )
    backend = _resolve_backend(config, scene)
    if backend == "pallas":
        from tpurt.kernels import megakernel

        return _render_pallas_jit(scene, config)
    return _render_oracle(scene, config)


@partial(jax.jit, static_argnames=("config",))
def _render_pallas_jit(scene, config: RenderConfig):
    from tpurt.kernels import megakernel

    return megakernel.render_pallas(scene, config)


def render_and_grad(scene, loss_fn, config: RenderConfig | None = None, **overrides):
    """Render and differentiate: returns ((loss, image), grads) where grads
    is a Scene-pytree cotangent (int/index leaves are None).

    `loss_fn(image) -> scalar`.  Gradients flow to every float leaf of the
    scene — vertices, normals, albedo/specular, light params
    (BASELINE.json:5) — at fixed hit topology.
    """
    config = (config or RenderConfig()).replace(**overrides) if overrides else (
        config or RenderConfig()
    )

    def wrapped(s):
        img = render(s, config)
        return loss_fn(img), img

    (loss, img), grads = jax.value_and_grad(wrapped, has_aux=True, allow_int=True)(
        scene
    )
    return (loss, img), grads
