"""tpurt — TPU-native differentiable Whitted ray tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `kotturtech/OpenCLRayTracer` (see SURVEY.md; the reference mount
was empty this round, so rows cite BASELINE.json / SURVEY.md instead of
file:line).  Public API:

    from tpurt import render, render_and_grad, RenderConfig, build_scene
"""
from tpurt.core.types import Rays, RenderConfig, pytree_dataclass
from tpurt.scene.scene import Scene, Camera, Materials, build_scene

__version__ = "0.1.0"

__all__ = [
    "Rays",
    "RenderConfig",
    "pytree_dataclass",
    "Scene",
    "Camera",
    "Materials",
    "build_scene",
    "render",
    "render_and_grad",
]


def __getattr__(name):
    # render API imports lazily to keep `import tpurt` light and to avoid
    # circular imports from kernels.
    if name in ("render", "render_and_grad"):
        from tpurt import render as _render_mod

        return getattr(_render_mod, name)
    raise AttributeError(name)
