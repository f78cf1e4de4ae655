from tpurt.core.types import Rays, RenderConfig, pytree_dataclass
from tpurt.core import vec, aabb

__all__ = ["Rays", "RenderConfig", "pytree_dataclass", "vec", "aabb"]
