from tpurt.dist.scene_shard import render_scene_sharded
from tpurt.dist.shard import make_mesh, render_sharded
from tpurt.dist.train import make_train_step, sgd_update

__all__ = [
    "make_mesh",
    "render_sharded",
    "render_scene_sharded",
    "make_train_step",
    "sgd_update",
]
