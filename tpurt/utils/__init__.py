from tpurt.utils.image import load_png, save_png
from tpurt.utils.checkpoint import load_pytree, save_pytree

__all__ = ["save_png", "load_png", "save_pytree", "load_pytree"]
